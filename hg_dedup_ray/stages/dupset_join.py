"""Distributed dup-set verification via a bucketed hash join — the 100 TB
path that replaces the driver-side text broadcast.

The default (broadcast) path in ``pipelines/sa_dedup.compute_cross_partition``
collects dup-set texts into ONE driver dict and ``ray.put``s it — bounded by
dup density, but at web scale (30-50% duplicated) that dict is TBs. This
module keeps every byte of text inside the object store:

    candidate rows (hot buckets only, key+ids)
      -> groupby(bucket_key).map_groups(bucket_to_members)   [exploded member
         rows with a content-derived group_id; per-bucket Python is fine —
         buckets are pre-filtered to hot keys]
      -> union with (doc_seq, text) doc rows
      -> groupby(seq_bucket)            [BUCKETED HASH JOIN: attach text]
      -> groupby(group_id).map_groups(assemble)  [mini-corpus SA scan for
         winnow groups / chain+rep Jaccard verify for band groups]
      -> spans (url, part, start, end) + cluster edges (url_a, url_b, ...)

Join key is ``doc_seq`` (int64, 1:1 with url), so bucketing is an integer
modulo on both sides — no string hashing, fully vectorized. The doc side
ships its text through ONE bucketed shuffle; when the dup set is small
(``cfg.extra["dupset_filter_limit"]``, default 5M member rows) the doc side
is pre-filtered with a broadcast int64 seq array first so only dup-set
texts enter the shuffle at all. Shuffled text volume is therefore
min(corpus, dup set + filter-miss overhead) and NOTHING text-sized ever
lands on the driver.

Semantics match the broadcast path exactly (same keep-first group scans,
same chain+rep pair verification — reference cpp_engine_dedup.h:215-302 /
717-735 via stages/group_scan.py + stages/pair_verify.py kernels); the only
difference is that a pair colliding in several LSH bands may be verified
once per distinct member set instead of once globally (union-find is
idempotent, so clusters are identical).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.minhash import shingle_hashes
from hg_dedup_ray.stages.candidates import chunk_members

# ---------------------------------------------------------------------------
# member-row schema (the compact rows that flow through both shuffles)

_MEMBER_FIELDS = [
    ("group_id", pa.uint64()),
    ("kind", pa.uint8()),
    ("url", pa.string()),
    ("doc_seq", pa.int64()),
    ("part", pa.int32()),
    ("copy", pa.uint64()),
]


def _empty_members() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in _MEMBER_FIELDS})


def _group_id(kind: int, urls) -> int:
    h = hashlib.blake2b(digest_size=8)
    h.update(bytes([kind]))
    for u in urls:
        h.update(u.encode("utf-8"))
        h.update(b"\xff")
    return int.from_bytes(h.digest(), "little")


def make_bucket_to_members(cfg: DedupConfig):
    """map_groups fn: ONE COARSE GROUP holding many hot buckets ->
    exploded member rows.

    Ray's groupby/map_groups costs one Python call PER GROUP, so grouping
    by the raw ``bucket_key`` (one group per hot shingle/band — easily
    100k+ at GB scale) spends minutes in dispatch overhead. The caller
    instead groups by a COARSE key (``bucket_key % dupset_member_buckets``)
    and this fn segments the coarse group back into buckets with one
    lexsort — the inner per-bucket loop is pure numpy + the same
    membership rules as candidates.make_bucket_to_candidates (>=2
    distinct docs; winnow buckets additionally >1 partition; oversized
    buckets chunked keep-first via chunk_members). Emits flat rows with a
    content-derived ``group_id`` so identical member sets reached through
    different bucket keys collapse in the assembly groupby
    (first-copy-wins via the ``copy`` tag)."""
    max_docs = cfg.max_band_bucket

    def fn(group: pa.Table) -> pa.Table:
        bkeys = group["bucket_key"].to_numpy(zero_copy_only=False)
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        urls = np.asarray(group["url"].to_pylist(), dtype=object)
        seq = group["doc_seq"].to_numpy(zero_copy_only=False)
        part = group["part"].to_numpy(zero_copy_only=False)
        # segment by (kind, bucket_key): one sort for the whole coarse group
        order = np.lexsort((seq, bkeys, kinds))
        bkeys, kinds = bkeys[order], kinds[order]
        urls, seq, part = urls[order], seq[order], part[order]
        bnd = np.flatnonzero(
            np.concatenate(
                ([True], (bkeys[1:] != bkeys[:-1]) | (kinds[1:] != kinds[:-1]))
            )
        )
        ends = np.concatenate((bnd[1:], [bkeys.shape[0]]))
        gids, kinds_o, urls_o, seqs_o, parts_o, copies_o = [], [], [], [], [], []
        for s, e in zip(bnd, ends):
            kind = int(kinds[s])
            u_slice = urls[s:e]
            _, uniq_idx = np.unique(u_slice, return_index=True)
            if uniq_idx.shape[0] < 2:
                continue
            if kind == 1 and np.unique(part[s:e][uniq_idx]).shape[0] < 2:
                continue
            # rows within the bucket are already seq-sorted by the lexsort
            ordered = s + np.sort(uniq_idx)
            bucket_key = int(bkeys[s])
            for c in chunk_members(ordered, max_docs):
                gid = _group_id(kind, urls[c])
                gids.extend([gid] * len(c))
                kinds_o.extend([kind] * len(c))
                urls_o.extend(str(u) for u in urls[c])
                seqs_o.extend(int(x) for x in seq[c])
                parts_o.extend(int(p) for p in part[c])
                copies_o.extend([bucket_key] * len(c))
        if not gids:
            return _empty_members()
        return pa.table(
            {
                "group_id": pa.array(np.array(gids, np.uint64), pa.uint64()),
                "kind": pa.array(kinds_o, pa.uint8()),
                "url": pa.array(urls_o, pa.string()),
                "doc_seq": pa.array(seqs_o, pa.int64()),
                "part": pa.array(parts_o, pa.int32()),
                "copy": pa.array(np.array(copies_o, np.uint64), pa.uint64()),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# bucketed hash join: attach texts to member rows by doc_seq

_JOIN_FIELDS = [
    ("seq_bucket", pa.int64()),
    ("side", pa.uint8()),  # 0 = doc text row, 1 = member row
    ("doc_seq", pa.int64()),
    ("text", pa.string()),
    ("group_id", pa.uint64()),
    ("kind", pa.uint8()),
    ("url", pa.string()),
    ("part", pa.int32()),
    ("copy", pa.uint64()),
]


def _doc_side(num_buckets: int, filter_ref=None):
    """docs (url, doc_seq, ..., text) -> join-schema text rows."""

    def fn(batch: pa.Table) -> pa.Table:
        if filter_ref is not None:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            keep = get_broadcast(filter_ref)  # sorted int64 dup seqs
            s = batch["doc_seq"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keep, s)
            mask = (pos < keep.shape[0]) & (keep[np.minimum(pos, keep.shape[0] - 1)] == s)
            batch = batch.filter(pa.array(mask))
        n = len(batch)
        seq = batch["doc_seq"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "seq_bucket": pa.array(seq % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "doc_seq": batch["doc_seq"],
                "text": batch["text"],
                "group_id": pa.nulls(n, pa.uint64()),
                "kind": pa.nulls(n, pa.uint8()),
                "url": pa.nulls(n, pa.string()),
                "part": pa.nulls(n, pa.int32()),
                "copy": pa.nulls(n, pa.uint64()),
            }
        )

    return fn


def _member_side(num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        seq = batch["doc_seq"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "seq_bucket": pa.array(seq % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "doc_seq": batch["doc_seq"],
                "text": pa.nulls(n, pa.string()),
                "group_id": batch["group_id"],
                "kind": batch["kind"],
                "url": batch["url"],
                "part": batch["part"],
                "copy": batch["copy"],
            }
        )

    return fn


def join_bucket(group: pa.Table) -> pa.Table:
    """One seq_bucket: vectorized seq->text gather onto the member rows."""
    side = group["side"].to_numpy(zero_copy_only=False)
    docs = group.filter(pa.array(side == 0))
    members = group.filter(pa.array(side == 1))
    out_cols = ["group_id", "kind", "url", "doc_seq", "part", "copy", "text"]
    if len(members) == 0 or len(docs) == 0:
        return pa.table(
            {
                "group_id": pa.array([], pa.uint64()),
                "kind": pa.array([], pa.uint8()),
                "url": pa.array([], pa.string()),
                "doc_seq": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
                "copy": pa.array([], pa.uint64()),
                "text": pa.array([], pa.string()),
            }
        )
    dseq = docs["doc_seq"].to_numpy(zero_copy_only=False)
    order = np.argsort(dseq, kind="stable")
    dseq_sorted = dseq[order]
    mseq = members["doc_seq"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(dseq_sorted, mseq)
    ok = (pos < dseq_sorted.shape[0]) & (
        dseq_sorted[np.minimum(pos, dseq_sorted.shape[0] - 1)] == mseq
    )
    if not ok.all():  # member without a doc row: drop (defensive)
        members = members.filter(pa.array(ok))
        pos = pos[ok]
    text = pc.take(docs["text"], pa.array(order[pos], pa.int64()))
    tab = pa.table(
        {
            "group_id": members["group_id"],
            "kind": members["kind"],
            "url": members["url"],
            "doc_seq": members["doc_seq"],
            "part": members["part"],
            "copy": members["copy"],
            "text": text,
        }
    )
    return tab.select(out_cols)


# ---------------------------------------------------------------------------
# group assembly: per-group mini-corpus SA scan / pair verification

_OUT_SCHEMA = {
    "otype": pa.uint8(),  # 0 = span, 1 = cluster edge
    "url": pa.string(),   # span url, or url_a for edges
    "part": pa.int32(),
    "start": pa.int64(),
    "end": pa.int64(),
    "url_b": pa.string(),
    "seq_a": pa.int64(),
    "seq_b": pa.int64(),
}


def _empty_out() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in _OUT_SCHEMA.items()})


def make_assemble(cfg: DedupConfig):
    """map_groups fn over ONE COARSE GROUP of text-attached member rows
    (many ``group_id``s — the caller groups by ``group_id %
    dupset_assemble_buckets`` to avoid Ray's one-Python-call-per-group
    dispatch cost, which dominates at 100k+ dup groups). One lexsort
    segments the coarse group back into groups; each group then runs the
    real per-group kernel:

    kind 1 (winnow group): exact mini-corpus SA scan in doc_seq order —
    the stages/group_scan.GroupScanner kernel — emitting keep-first remove
    spans for non-first members.
    kind 0 (LSH band group): chain + rep candidate pairs over the
    doc_seq-sorted members, exact k-shingle Jaccard per pair — the
    stages/pair_verify.PairVerifier kernel — emitting edges that meet
    cfg.jaccard_threshold."""

    def fn(coarse: pa.Table) -> pa.Table:
        gid_all = coarse["group_id"].to_numpy(zero_copy_only=False)
        if gid_all.shape[0] == 0:
            return _empty_out()
        order = np.argsort(gid_all, kind="stable")
        coarse = coarse.take(pa.array(order, pa.int64()))
        gid_all = gid_all[order]
        bnd = np.flatnonzero(
            np.concatenate(([True], gid_all[1:] != gid_all[:-1]))
        )
        ends = np.concatenate((bnd[1:], [gid_all.shape[0]]))
        outs = [
            _assemble_one(coarse.slice(int(s), int(e - s)), cfg)
            for s, e in zip(bnd, ends)
        ]
        outs = [t for t in outs if len(t)]
        return pa.concat_tables(outs) if outs else _empty_out()

    return fn


def _assemble_one(group: pa.Table, cfg: DedupConfig) -> pa.Table:
    k = cfg.shingle_k
    thr = cfg.jaccard_threshold
    copies = group["copy"].to_numpy(zero_copy_only=False)
    group = group.filter(pa.array(copies == copies.min()))
    seq = group["doc_seq"].to_numpy(zero_copy_only=False)
    order = np.argsort(seq, kind="stable")
    urls = np.asarray(group["url"].to_pylist(), dtype=object)[order]
    seq = seq[order]
    parts = group["part"].to_numpy(zero_copy_only=False)[order]
    texts = [
        t.encode("utf-8")
        for t in pc.take(group["text"], pa.array(order, pa.int64())).to_pylist()
    ]
    kind = int(group["kind"][0].as_py())
    if kind == 1:
        from hg_dedup_ray.stages.group_scan import mini_corpus_scan

        spans = mini_corpus_scan(texts, cfg)
        if not spans:
            return _empty_out()
        doc_ix = np.array([d for d, _, _ in spans], np.int64)
        n = len(spans)
        return pa.table(
            {
                "otype": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "url": pa.array([str(urls[d]) for d in doc_ix], pa.string()),
                "part": pa.array(parts[doc_ix], pa.int32()),
                "start": pa.array([s for _, s, _ in spans], pa.int64()),
                "end": pa.array([e for _, _, e in spans], pa.int64()),
                "url_b": pa.nulls(n, pa.string()),
                "seq_a": pa.nulls(n, pa.int64()),
                "seq_b": pa.nulls(n, pa.int64()),
            }
        )
    # kind 0: chain + rep pairs (candidates.expand_band_pairs order)
    m = len(urls)
    sh = [
        np.unique(shingle_hashes(np.frombuffer(t, np.uint8), k))
        if len(t)
        else np.empty(0, np.uint64)
        for t in texts
    ]
    pairs = [(i - 1, i) for i in range(1, m)] + [(0, i) for i in range(2, m)]
    ea, eb, sa_l, sb_l = [], [], [], []
    for i, j in pairs:
        inter = np.intersect1d(sh[i], sh[j], assume_unique=True).shape[0]
        union = sh[i].shape[0] + sh[j].shape[0] - inter
        jac = inter / union if union else 1.0
        if jac >= thr:
            ea.append(str(urls[i]))
            eb.append(str(urls[j]))
            sa_l.append(int(seq[i]))
            sb_l.append(int(seq[j]))
    n = len(ea)
    return pa.table(
        {
            "otype": pa.array(np.ones(n, np.uint8), pa.uint8()),
            "url": pa.array(ea, pa.string()),
            "part": pa.nulls(n, pa.int32()),
            "start": pa.nulls(n, pa.int64()),
            "end": pa.nulls(n, pa.int64()),
            "url_b": pa.array(eb, pa.string()),
            "seq_a": pa.array(sa_l, pa.int64()),
            "seq_b": pa.array(sb_l, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# orchestration

def dupset_spans_and_edges(docs, members, cfg: DedupConfig):
    """member rows + docs dataset -> (spans_dataset, edges_list).

    spans_dataset: (url, part, start, end) — stays in the object store;
    the caller hands its BLOCK REFS to Writeback (compact: ids + ints).
    edges_list: [(url_a, url_b, seq_a, seq_b)] — compact cluster edges,
    resolved to labels by state/cluster (driver union-find below the
    edge limit, iterated groupby min-label propagation above it)."""
    import ray

    num_buckets = int(
        cfg.extra.get("dupset_buckets", max(cfg.num_partitions, 16))
    )
    members = members.materialize()
    filter_ref = None
    limit = int(cfg.extra.get("dupset_filter_limit", 5_000_000))
    if members.count() <= limit:
        # collect ONLY the int64 seq column (8 B/row) for the doc-side
        # pre-filter; above the limit the join runs unfiltered (full
        # bucketed shuffle) and the driver holds nothing
        seq_blocks = (
            members.map_batches(
                lambda b: pa.table({"doc_seq": b["doc_seq"]}),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        seqs = np.unique(
            np.concatenate(
                [
                    t["doc_seq"].to_numpy(zero_copy_only=False)
                    for t in ray.get(seq_blocks)
                    if len(t)
                ]
                or [np.empty(0, np.int64)]
            )
        )
        filter_ref = ray.put(seqs)

    doc_rows = docs.map_batches(
        _doc_side(num_buckets, filter_ref), batch_format="pyarrow"
    )
    member_rows = members.map_batches(
        _member_side(num_buckets), batch_format="pyarrow"
    )
    joined = (
        doc_rows.union(member_rows)
        .groupby("seq_bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    # COARSE assembly key: one map_groups call per ~(n_groups / G) dup
    # groups, not one per group (per-group dispatch dominates at 100k+
    # groups; see make_assemble)
    n_assemble = int(cfg.extra.get("dupset_assemble_buckets", 128))

    def add_gbucket(b: pa.Table) -> pa.Table:
        g = b["group_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "gbucket",
            pa.array((g % np.uint64(n_assemble)).astype(np.int64), pa.int64()),
        )

    assembled = (
        joined.map_batches(add_gbucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(make_assemble(cfg), batch_format="pyarrow")
        .materialize()
    )
    spans = assembled.map_batches(
        lambda b: b.filter(pc.equal(b["otype"], 0)).select(
            ["url", "part", "start", "end"]
        ),
        batch_format="pyarrow",
    )
    edge_rows = assembled.map_batches(
        lambda b: b.filter(pc.equal(b["otype"], 1)).select(
            ["url", "url_b", "seq_a", "seq_b"]
        ),
        batch_format="pyarrow",
    ).take_all()
    edges = sorted(
        {
            (r["url"], r["url_b"], int(r["seq_a"]), int(r["seq_b"]))
            for r in edge_rows
        }
    )
    return spans, edges
