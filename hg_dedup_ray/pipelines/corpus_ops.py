"""Web-corpus curation reporting and ranking operators, all DuckDB-green.

- ``dup_rate_by_source``: per-source exact-duplicate rates — the
  per-domain dedup report a web-corpus curation run publishes.
- ``tfidf_top_terms``: per-doc top-k tf-idf terms via a bucketed
  token-df join + per-doc vectorized top-k.
- ``prefix_dup_docs``: docs whose text is a proper prefix of another
  doc's text, via the global-sort successor property (substring-dedup
  lite; the sort-neighbor shape generalizes the suffix-array scan's
  "equal windows sort adjacent" argument to whole documents).
- ``minhash_jaccard_estimate_pairs``: estimated Jaccard from MinHash
  signature agreement for every LSH band-candidate pair — the verify
  step a 100 TB near-dup pass runs when exact text comparison is too
  expensive (reference README.md:101-115's minhash filtering stage).

Tokenization matches the DuckDB oracles' ``regexp_split_to_array(
trim(text), '\\s+')``; u64 content/token hashes stand in for string
identity with the same documented ~2^-64 collision assumption as
exact_dedup / dup_ngram_stats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.functions.arrow_utils import string_column_bytes
from hg_dedup_ray.functions.wordgrams import token_hashes
from hg_dedup_ray.stages.textstats import content_hash_u64


def _docs(sf_dir: str, columns=None):
    from hg_dedup_ray.functions.readers import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------- dup rate by source


def dup_rate_by_source(sf_dir: str, num_buckets: int = 64):
    """Per-source (n_docs, n_distinct_texts, n_dup_docs): the dedup-rate
    report grouped by provenance. Only (source, fp:u64) rows shuffle —
    never text; per-batch pre-dedup then one coarse fp%B groupby whose
    group count is fixed regardless of corpus size."""
    from ray.data.aggregate import Sum

    def fp_rows(batch: pa.Table) -> pa.Table:
        h = content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        code, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((fp, inv))
        f, c = fp[order], inv[order]
        keep = np.concatenate(([True], (f[1:] != f[:-1]) | (c[1:] != c[:-1])))
        f, c = f[keep], c[keep]
        return pa.table(
            {
                "cbucket": pa.array((f % num_buckets).astype(np.int64), pa.int64()),
                "fp": pa.array(f, pa.uint64()),
                "source": pa.array([str(code[i]) for i in c], pa.string()),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        src = np.asarray(group["source"].to_pylist(), dtype=object)
        code, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((fp, inv))
        f, c = fp[order], inv[order]
        keep = np.concatenate(([True], (f[1:] != f[:-1]) | (c[1:] != c[:-1])))
        cnt = np.bincount(c[keep], minlength=code.shape[0]).astype(np.int64)
        return pa.table(
            {
                "source": pa.array([str(s) for s in code], pa.string()),
                "partial": pa.array(cnt, pa.int64()),
            }
        )

    distinct = (
        _docs(sf_dir, columns=["doc_id", "source", "text"])
        .map_batches(fp_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("cbucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("partial", alias_name="n_distinct_texts"))
        .take_all()
    )
    totals = (
        _docs(sf_dir, columns=["source"]).groupby("source").count().take_all()
    )
    n_by_src = {r["source"]: int(r["count()"]) for r in totals}
    srcs = sorted(n_by_src)
    d_by_src = {r["source"]: int(r["n_distinct_texts"]) for r in distinct}
    nd = np.array([n_by_src[s] for s in srcs], np.int64)
    dd = np.array([d_by_src.get(s, 0) for s in srcs], np.int64)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array(nd, pa.int64()),
            "n_distinct_texts": pa.array(dd, pa.int64()),
            "n_dup_docs": pa.array(nd - dd, pa.int64()),
        }
    )


# ------------------------------------------------------------ tf-idf top-k


def tfidf_top_terms(sf_dir: str, k: int = 3, num_buckets: int = 64,
                    doc_buckets: int = 32):
    """Per-doc top-k terms by tf-idf (score = tf * ln(N/df); ties broken
    by token asc), fully distributed:

    1. per-batch distinct (doc, token) rows with in-doc tf (one lexsort
       per batch) keyed by token-hash bucket;
    2. per-token-bucket df attach (tokens are bucket-complete, so df is
       exact inside the group — a join with zero extra shuffle);
    3. re-key by doc bucket; per-group vectorized score + segment top-k.

    Two coarse-bucket shuffles total, rows are (ids + token + 2 ints) —
    texts never shuffle. Scores are rounded to 6 dp BEFORE ranking on
    both sides so the order is robust to last-ulp ln() differences."""

    n_total = int(
        _docs(sf_dir, columns=["text"])
        .map_batches(
            lambda b: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                np.sum(
                                    pc.utf8_length(
                                        pc.utf8_trim_whitespace(b["text"])
                                    ).to_numpy(zero_copy_only=False)
                                    > 0
                                )
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .sum("n")
        or 0  # Dataset.sum is None on an empty dataset
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "tbucket": pa.array([], pa.int64()),
                    "th": pa.array([], pa.uint64()),
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        doc_ix = np.repeat(np.arange(len(ids)), counts.astype(np.int64))
        # empty/whitespace-only docs split to a single '' token — drop it
        # (the oracle excludes trim(text)='' docs entirely)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        flat = flat.filter(pa.array(nonempty))
        doc_ix = doc_ix[nonempty]
        if len(flat) == 0:
            return pa.table(
                {
                    "tbucket": pa.array([], pa.int64()),
                    "th": pa.array([], pa.uint64()),
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        th = token_hashes(flat)
        order = np.lexsort((th, doc_ix))
        d_s, h_s = doc_ix[order], th[order]
        new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        run_id = np.cumsum(new) - 1
        tf = np.bincount(run_id).astype(np.int64)
        rep = order[new]  # first occurrence index -> token string
        return pa.table(
            {
                "tbucket": pa.array(
                    (h_s[new] % num_buckets).astype(np.int64), pa.int64()
                ),
                "th": pa.array(h_s[new], pa.uint64()),
                "token": flat.take(pa.array(rep)),
                "doc_id": pa.array(ids[d_s[new]], pa.int64()),
                "tf": pa.array(tf, pa.int64()),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        th = group["th"].to_numpy(zero_copy_only=False)
        order = np.argsort(th, kind="stable")
        h_s = th[order]
        new = np.concatenate(([True], h_s[1:] != h_s[:-1]))
        run_id = np.cumsum(new) - 1
        df = np.bincount(run_id).astype(np.int64)  # rows are per-(doc,token)
        df_row = np.empty(th.shape[0], np.int64)
        df_row[order] = df[run_id]
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dbucket": pa.array((did % doc_buckets).astype(np.int64), pa.int64()),
                "doc_id": group["doc_id"],
                "token": group["token"],
                "tf": group["tf"],
                "df": pa.array(df_row, pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = group["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tok = np.asarray(group["token"].to_pylist(), dtype=object)
        score = np.round(tf * np.log(n_total / df), 6)
        order = np.lexsort((tok, -score, did))
        d_s, s_s, t_s = did[order], score[order], tok[order]
        new = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(d_s.shape[0]) - starts[run_id]
        keep = rank < k
        return pa.table(
            {
                "doc_id": pa.array(d_s[keep], pa.int64()),
                "token": pa.array([str(t) for t in t_s[keep]], pa.string()),
                "score": pa.array(s_s[keep], pa.float64()),
                "term_rank": pa.array(rank[keep].astype(np.int64) + 1, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("tbucket")
        .map_groups(attach_df, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(topk, batch_format="pyarrow")
    )


# -------------------------------------------------------- prefix dup docs


def prefix_dup_docs(sf_dir: str, num_buckets: int = 64):
    """Flag docs whose text is a PROPER prefix of another doc's text.

    The scalable shape is a global sort of the distinct texts: if a is a
    proper prefix of any b, every string between them in sorted order
    also starts with a — so a's immediate sorted successor does, and
    checking each row against its successor (plus one head row exchanged
    per block boundary, O(#blocks) driver state) finds every prefix doc
    in one pass. Adjacent-pair prefix tests are vectorized with a packed
    first-8-byte u64 prefilter; only surviving candidates run the exact
    byte compare. Flagged texts return as u64 fps (answer-sized) and a
    final broadcast pass marks every doc."""

    def distinct_partial(batch: pa.Table) -> pa.Table:
        h = content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp, kind="stable")
        f = fp[order]
        keep_idx = order[np.concatenate(([True], f[1:] != f[:-1]))]
        return pa.table(
            {
                "cbucket": pa.array(
                    (fp[keep_idx] % num_buckets).astype(np.int64), pa.int64()
                ),
                "fp": pa.array(fp[keep_idx], pa.uint64()),
                "text": batch["text"].take(pa.array(keep_idx)),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp, kind="stable")
        f = fp[order]
        keep_idx = order[np.concatenate(([True], f[1:] != f[:-1]))]
        return pa.table(
            {
                "fp": pa.array(fp[keep_idx], pa.uint64()),
                "text": group["text"].take(pa.array(keep_idx)),
            }
        )

    distinct = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(distinct_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("cbucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )
    sorted_ds = distinct.sort("text").materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _head(tab: pa.Table):
        return tab["text"][0].as_py() if len(tab) else None

    heads = ray.get([_head.remote(r) for r in refs])
    # successor text for each block's LAST row = next non-empty block head
    nxt: list[str | None] = [None] * len(refs)
    follow: str | None = None
    for i in range(len(refs) - 1, -1, -1):
        nxt[i] = follow
        if heads[i] is not None:
            follow = heads[i]

    @ray.remote
    def _flag_block(tab: pa.Table, next_head):
        if len(tab) == 0:
            return np.empty(0, np.uint64)
        buf, off = string_column_bytes(tab["text"])
        fp = tab["fp"].to_numpy(zero_copy_only=False)
        n = off.shape[0] - 1
        lens = np.diff(off)
        # packed first-8-bytes prefilter (sorted neighbors rarely share it)
        pad = np.concatenate([buf, np.zeros(8, np.uint8)])
        first8 = np.zeros(n, np.uint64)
        for j in range(8):
            first8 = (first8 << np.uint64(8)) | pad[off[:-1] + j].astype(np.uint64)
        # rows shorter than 8 bytes always go to the exact check
        cand = np.flatnonzero(
            (lens[:-1] < lens[1:])
            & ((first8[:-1] == first8[1:]) | (lens[:-1] < 8))
        )
        mv = memoryview(buf)
        flagged = [
            fp[i]
            for i in cand
            if mv[off[i] : off[i + 1]] == mv[off[i + 1] : off[i + 1] + lens[i]]
        ]
        if next_head is not None and n > 0:
            last = bytes(mv[off[n - 1] : off[n]])
            nh = next_head.encode("utf-8")
            if len(nh) > len(last) and nh[: len(last)] == last:
                flagged.append(fp[n - 1])
        return np.asarray(flagged, np.uint64)

    parts = ray.get(
        [_flag_block.remote(r, nxt[i]) for i, r in enumerate(refs)]
    )
    flagged = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    flag_ref = ray.put(flagged)

    def mark(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        fl = get_broadcast(flag_ref)
        h = content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        if fl.shape[0]:
            pos = np.searchsorted(fl, fp)
            is_p = (pos < fl.shape[0]) & (fl[np.minimum(pos, fl.shape[0] - 1)] == fp)
        else:
            is_p = np.zeros(fp.shape[0], bool)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "is_prefix_dup": pa.array(is_p, pa.bool_()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        mark, batch_format="pyarrow", batch_size=4096
    )


# ---------------------------------------------------- text normalization


def normalize_texts(sf_dir: str):
    """Dedup-preprocessing normalization (the step web pipelines run
    before exact/near dedup so cosmetic variants collapse): lowercase,
    strip every char outside [a-z0-9 ], collapse whitespace runs, trim.
    Pure Arrow kernels (utf8_lower + two RE2 replaces) — zero Python per
    row; emits (doc_id, norm_text, n_norm_chars)."""

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"[^a-z0-9 ]", " ")
        t = pc.replace_substring_regex(t, r" +", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": t,
                "n_norm_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", batch_size=4096
    )


# ----------------------------------------- near-dup removal (keep policies)
#
# Three keep policies over the SAME MinHash-LSH clusters (b=32/r=4
# banding over cell-exact OPH signatures — the minhash_band_clusters
# machinery), sharing one scale shape: cluster labels are dup-bounded
# (only docs in >=1 hot band bucket get a row); any per-member rank
# attribute comes back via ONE broadcast-membership-filtered column
# scan (only member rows return to the driver — the dup-set budget);
# the per-cluster winner is a single lexsort over that bounded set;
# the drop set broadcasts as a sorted int64 array and the kept corpus
# streams through one filter map_batches. The oracles recompute
# signatures, bands, min-label closure AND the keep rule in SQL, so
# the final kept set — not just the cluster labels — is value-checked.


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean membership mask of vals against a SORTED array."""
    if sorted_arr.shape[0] == 0 or vals.shape[0] == 0:
        return np.zeros(vals.shape[0], bool)
    pos = np.searchsorted(sorted_arr, vals)
    return (pos < sorted_arr.shape[0]) & (
        sorted_arr[np.minimum(pos, sorted_arr.shape[0] - 1)] == vals
    )


def _labels_arrays(labels) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, cluster_id) arrays of a cluster-labels Dataset —
    dup-bounded driver state (unclustered docs have no row)."""
    chunks = [
        b
        for b in labels.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        if len(b)
    ]
    if not chunks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    did = np.concatenate(
        [t["doc_id"].to_numpy(zero_copy_only=False) for t in chunks]
    )
    lab = np.concatenate(
        [t["cluster_id"].to_numpy(zero_copy_only=False) for t in chunks]
    )
    return did, lab


def _cluster_labels_arrays(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """_labels_arrays over the full corpus's MinHash-LSH clusters."""
    from hg_dedup_ray.pipelines.queries import minhash_band_clusters

    return _labels_arrays(minhash_band_clusters(sf_dir))


def _member_rank_drop(sf_dir, did, lab, rank_col, rank_fn) -> np.ndarray:
    """Drop set for a keep-best policy: fetch ``rank_col`` for member
    rows via one broadcast-membership-filtered column scan, rank
    members by ``rank_fn(values)`` (LOWER wins, ties by doc_id), keep
    the winner per cluster, return the sorted losers."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    if not did.shape[0]:
        return np.empty(0, np.int64)
    mem_ref = ray.put(np.sort(did))

    def member_rows(batch: pa.Table) -> pa.Table:
        hit = pa.array(
            _in_sorted(
                get_broadcast(mem_ref),
                batch["doc_id"].to_numpy(zero_copy_only=False),
            )
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(hit),
                rank_col: batch[rank_col].filter(hit),
            }
        )

    rows = (
        _docs(sf_dir, columns=["doc_id", rank_col])
        .map_batches(member_rows, batch_format="pyarrow", batch_size=8192)
        .take_all()
    )
    by_id = {r["doc_id"]: r[rank_col] for r in rows}
    rank = rank_fn(np.array([by_id[i] for i in did]))
    order = np.lexsort((did, rank, lab))
    l_s, d_s = lab[order], did[order]
    first = np.concatenate(([True], l_s[1:] != l_s[:-1]))
    return np.sort(d_s[~first])


def _drop_filter_stream(sf_dir, drop: np.ndarray, columns, post=None):
    """Stream the corpus through one sorted-drop-set filter
    map_batches; ``post`` optionally appends computed columns."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = _in_sorted(
            get_broadcast(drop_ref),
            batch["doc_id"].to_numpy(zero_copy_only=False),
        )
        out = batch.filter(pa.array(~dropped))
        return post(out) if post is not None else out

    return _docs(sf_dir, columns=columns).map_batches(
        keep, batch_format="pyarrow", batch_size=4096
    )


def near_dedup_keep_first(sf_dir: str):
    """The near-dup REMOVAL deliverable: keep only the min-doc_id member
    of every MinHash-LSH cluster plus every unclustered doc. No member
    scan needed — cluster_id IS the min member, so the losers are
    exactly the rows where doc_id != cluster_id."""
    did, lab = _cluster_labels_arrays(sf_dir)
    drop = np.sort(did[did != lab]) if did.shape[0] else np.empty(0, np.int64)
    return _drop_filter_stream(
        sf_dir, drop, ["doc_id", "lang", "source", "n_chars"]
    )


def near_dedup_keep_longest(sf_dir: str):
    """Keep-BEST near dedup: within every MinHash-LSH cluster keep the
    member with the MOST characters (tie: smallest doc_id) — among
    near-duplicate crawls the longest copy usually supersets the
    boilerplate-trimmed ones, so "keep longest" preserves more signal
    than "keep first". Unclustered docs always survive."""
    did, lab = _cluster_labels_arrays(sf_dir)
    drop = _member_rank_drop(
        sf_dir, did, lab, "n_chars", lambda v: -v.astype(np.int64)
    )
    return _drop_filter_stream(
        sf_dir, drop, ["doc_id", "lang", "source", "n_chars"]
    )


def _source_tier(source_col, n_tiers: int) -> np.ndarray:
    """Provenance tier of each source name: trailing digits mod
    n_tiers; sources with no digits land in the lowest-priority tier
    (n_tiers - 1). Deterministic and SQL-replicated (regexp_extract +
    try_cast), so the tiered keep rule is value-checkable."""
    ex = pc.extract_regex(source_col, r"(?P<d>[0-9]{1,9})$")
    d = pc.coalesce(
        pc.cast(pc.struct_field(ex, "d"), pa.int64()),
        pa.scalar(n_tiers - 1, pa.int64()),
    )
    return np.mod(d.to_numpy(zero_copy_only=False), n_tiers)


def near_dedup_keep_tiered(sf_dir: str, n_tiers: int = 4):
    """TIERED near dedup — the provenance-priority keep policy of a
    multi-source web corpus: within every MinHash-LSH cluster keep the
    member from the highest-priority source TIER (lowest tier number;
    ties: smallest doc_id), so a curated-tier copy always beats a
    crawl-tier copy of the same near-duplicate content. Unclustered
    docs always survive. Output adds the computed ``tier`` column.
    The tier map is the deterministic _source_tier rule; a production
    run swaps in its own source→tier table (broadcast the same way)."""
    did, lab = _cluster_labels_arrays(sf_dir)
    drop = _member_rank_drop(
        sf_dir,
        did,
        lab,
        "source",
        lambda v: _source_tier(pa.array(v), n_tiers),
    )

    def add_tier(batch: pa.Table) -> pa.Table:
        tier = _source_tier(batch["source"], n_tiers)
        return batch.append_column("tier", pa.array(tier, pa.int64()))

    return _drop_filter_stream(
        sf_dir, drop, ["doc_id", "source", "n_chars"], post=add_tier
    )


def dedup_drop_tiers(sf_dir: str):
    """Per-doc drop provenance of the SEQUENTIAL dedup cascade — the
    explainability report behind dedup_tier_cascade's counts: drop_tier
    1 = removed by exact keep-first text dedup; 2 = an exact SURVIVOR
    removed by MinHash-LSH keep-first near dedup (clusters computed
    over the survivors only, so tier 2 is what tier 1 left behind, not
    an independent flag); 0 = kept. Oracle-checked end to end: the SQL
    chains the exact keeper rule with the OPH/band/min-label closure
    scoped to the survivor CTE.

    Shape: the exact tier reuses _exact_keeper_ids (coarse fp%64
    shuffle, keeper ids broadcast); survivors stream through a
    broadcast semi-join into the standard band machinery; both drop
    sets broadcast sorted and one stateless pass labels every doc."""
    from hg_dedup_ray.functions.readers import read_parquet_sized
    from hg_dedup_ray.pipelines.queries import (
        _exact_keeper_ids,
        _filter_by_ids,
        minhash_band_clusters,
    )
    from hg_dedup_ray.stages.broadcast import get_broadcast

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    keep1 = _exact_keeper_ids(docs)
    keep1_ref = ray.put(keep1)
    survivors = docs.map_batches(
        _filter_by_ids(keep1_ref), batch_format="pyarrow"
    )
    did, lab = _labels_arrays(minhash_band_clusters(sf_dir, docs=survivors))
    drop2 = np.sort(did[did != lab]) if did.shape[0] else np.empty(0, np.int64)
    drop2_ref = ray.put(drop2)

    def tier(batch: pa.Table) -> pa.Table:
        k1 = get_broadcast(keep1_ref)
        d2 = get_broadcast(drop2_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        t1 = ~_in_sorted(k1, d)
        t2 = _in_sorted(d2, d)
        drop_tier = np.where(t1, 1, np.where(t2, 2, 0)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "drop_tier": pa.array(drop_tier, pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        tier, batch_format="pyarrow", batch_size=8192
    )


# -------------------------------------- MinHash Jaccard estimates per pair


def minhash_jaccard_estimate_pairs(
    sf_dir: str, num_bands: int = 32, band_r: int = 4, emit_b1: bool = False
):
    """(doc_id_a, doc_id_b, n_match_perms, est_jaccard) for every LSH
    band-candidate pair at the b=32 / r=4 production banding: estimated
    Jaccard = fraction of the 128 OPH signature cells that agree.

    ``emit_b1=True`` (the ``bbit_minhash_estimate_pairs`` query) adds
    the 1-bit-minhash columns (Li & Koenig 2010): keep only each cell's
    LOW BIT — 64x less signature storage at scale — count bit
    agreements, and debias with E[agree | J=0] = 1/2:
    est = 2*(n_match_bits/128) - 1, clamped at 0. Both estimates are
    dyadic rationals (k/128), bit-exact against the SQL division.

    Shares the signature + band kernels with minhash_band_clusters (the
    oracle recomputes both in SQL). Candidate pairs expand per coarse
    band-key group after a hot-key prefilter; the pair set and the
    candidate docs' signatures are answer-sized, so the final agree-count
    is one vectorized gather over a broadcast-scale matrix."""
    from hg_dedup_ray.functions.minhash import (
        batch_signatures_oph,
        make_band_rows,
    )
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys

    k, num_perm, seed = 16, 128, 42

    empty = pa.table(
        {
            "doc_id_a": pa.array([], pa.int64()),
            "doc_id_b": pa.array([], pa.int64()),
            "n_match_perms": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            make_band_rows(num_bands=num_bands, band_r=band_r),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .materialize()
    )
    hot = hot_u64_keys(rows, "bkey")
    if hot.shape[0] == 0:
        return ray.data.from_arrow(empty)
    hot_ref = ray.put(hot)

    def hot_pairs(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        h = get_broadcast(hot_ref)
        bk = batch["bkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(h, bk)
        mask = (pos < h.shape[0]) & (h[np.minimum(pos, h.shape[0] - 1)] == bk)
        bk = bk[mask]
        did = batch["doc_id"].to_numpy(zero_copy_only=False)[mask]
        return pa.table(
            {
                "cb": pa.array((bk % 64).astype(np.int64), pa.int64()),
                "bkey": pa.array(bk, pa.uint64()),
                "doc_id": pa.array(did, pa.int64()),
            }
        )

    def expand_bucket_pairs(group: pa.Table) -> pa.Table:
        bk = group["bkey"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bk))
        bk, did = bk[order], did[order]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.cumsum(run_len) - run_len
        local = np.arange(did.shape[0]) - run_start[run_id]
        rep = (run_len[run_id] - 1 - local).astype(np.int64)
        tot = int(rep.sum())
        if tot == 0:
            return pa.table(
                {"pb": pa.array([], pa.int64()), "pair": pa.array([], pa.uint64())}
            )
        a_idx = np.repeat(np.arange(did.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        b_idx = a_idx + (np.arange(tot) - seg[a_idx] + 1)
        lo = np.minimum(did[a_idx], did[b_idx]).astype(np.uint64)
        hi = np.maximum(did[a_idx], did[b_idx]).astype(np.uint64)
        pair = np.unique((lo << np.uint64(32)) | hi)
        return pa.table(
            {
                "pb": pa.array((pair % 64).astype(np.int64), pa.int64()),
                "pair": pa.array(pair, pa.uint64()),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        pair = np.unique(group["pair"].to_numpy(zero_copy_only=False))
        return pa.table({"pair": pa.array(pair, pa.uint64())})

    pair_chunks = [
        b["pair"].to_numpy(zero_copy_only=False)
        for b in rows.map_batches(hot_pairs, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(expand_bucket_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        if len(b)
    ]
    if not pair_chunks:
        return ray.data.from_arrow(empty)
    pairs = np.unique(np.concatenate(pair_chunks))
    docs_needed = np.unique(
        np.concatenate(
            [pairs >> np.uint64(32), pairs & np.uint64(0xFFFFFFFF)]
        ).astype(np.int64)
    )
    need_ref = ray.put(docs_needed)

    def cand_sigs(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        need = get_broadcast(need_ref)
        ids0 = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(need, ids0)
        m = (pos < need.shape[0]) & (need[np.minimum(pos, need.shape[0] - 1)] == ids0)
        batch = batch.filter(pa.array(m))
        if len(batch) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sig": pa.array([], pa.binary())}
            )
        buf, off = string_column_bytes(batch["text"])
        sig = batch_signatures_oph(buf, off, k, num_perm, seed)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tobytes() for s in sig], pa.binary()),
            }
        )

    sig_rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(cand_sigs, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    sid = np.array([r["doc_id"] for r in sig_rows], np.int64)
    smat = np.stack(
        [np.frombuffer(r["sig"], np.uint64) for r in sig_rows]
    ) if sig_rows else np.empty((0, num_perm), np.uint64)
    order = np.argsort(sid, kind="stable")
    sid, smat = sid[order], smat[order]
    a = (pairs >> np.uint64(32)).astype(np.int64)
    b = (pairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
    ia = np.searchsorted(sid, a)
    ib = np.searchsorted(sid, b)
    match = (smat[ia] == smat[ib]).sum(axis=1).astype(np.int64)
    cols = {
        "doc_id_a": pa.array(a, pa.int64()),
        "doc_id_b": pa.array(b, pa.int64()),
        "n_match_perms": pa.array(match, pa.int64()),
        # match/128 is a dyadic rational — bit-exact vs the SQL
        # division, no rounding (round-half cases differ between
        # DuckDB half-up and numpy half-even)
        "est_jaccard": pa.array(match / float(num_perm), pa.float64()),
    }
    if emit_b1:
        one = np.uint64(1)
        bits = ((smat[ia] & one) == (smat[ib] & one)).sum(axis=1).astype(
            np.int64
        )
        cols["n_match_bits"] = pa.array(bits, pa.int64())
        cols["est_jaccard_b1"] = pa.array(
            np.maximum(2.0 * bits / float(num_perm) - 1.0, 0.0), pa.float64()
        )
    return ray.data.from_arrow(pa.table(cols))


def bbit_minhash_estimate_pairs(sf_dir: str):
    """1-bit-minhash Jaccard estimation (Li & Koenig 2010) over the LSH
    candidate pairs — see ``minhash_jaccard_estimate_pairs(emit_b1)``."""
    return minhash_jaccard_estimate_pairs(sf_dir, emit_b1=True)


# ----------------------------------------------------- substring counting

# Fixed probe phrases drawn from the fixture vocabulary (TESTDATA.md word
# salad) plus two that never occur — zero rows must still appear.
SUBSTRING_QUERIES = (
    "hash scan",
    "window",
    "batch batch",
    "merge part",
    "order sort",
    "spark",
    "stream",
    "join order",
    "dup",
    "no such phrase",
    "zzqx",
)


def substring_counts(sf_dir: str, queries: tuple[str, ...] = SUBSTRING_QUERIES):
    """Corpus occurrence counts for a fixed set of probe substrings —
    the count(q) primitive the reference's suffix-array index answers
    per-query (infini-gram-style corpus search; reference
    cpp_engine_dedup.h builds exactly the structure that serves this).

    Ray-first shape: no index needed for a STREAMING count — each batch
    answers all queries with Arrow's vectorized non-overlapping
    ``count_substring`` kernel (same left-to-right non-overlapping
    semantics as the oracle's replace()-based count), emitting
    len(queries) partial rows per batch; a native Sum over ~10 groups
    merges them. At 100 TB this is one read-only pass, no shuffle of
    anything text-sized, and the broadcastable query list rides in the
    task closure."""
    from ray.data.aggregate import Sum

    qs = list(queries)

    def partial(batch: pa.Table) -> pa.Table:
        occ = np.empty(len(qs), np.int64)
        nd = np.empty(len(qs), np.int64)
        for i, q in enumerate(qs):
            c = pc.count_substring(batch["text"], q).to_numpy(
                zero_copy_only=False
            )
            occ[i] = int(c.sum())
            nd[i] = int((c > 0).sum())
        return pa.table(
            {
                "query": pa.array(qs, pa.string()),
                "occ": pa.array(occ, pa.int64()),
                "nd": pa.array(nd, pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("query")
        .aggregate(
            Sum("occ", alias_name="n_occurrences"),
            Sum("nd", alias_name="n_docs"),
        )
    )
    return agg


# ---------------------------------------------- next-token distribution

# Prefixes for the ntd probe; alphabet = the fixture's byte vocabulary
# (lowercase words + space). Rows with zero occurrences are kept so the
# output shape is fixed at len(prefixes) * len(alphabet).
NTD_PREFIXES = ("hash ", "window", "the ", "zzqx")
NTD_ALPHABET = " abcdefghijklmnopqrstuvwxyz"


def next_token_distribution(
    sf_dir: str,
    prefixes: tuple[str, ...] = NTD_PREFIXES,
    alphabet: str = NTD_ALPHABET,
):
    """Corpus extension counts n(prefix+c) for each probe prefix and each
    next character c — the next-token-distribution primitive infini-gram
    serves from its suffix array (reference README: ntd / infgram_ntd).

    Like substring_counts, the streaming formulation needs no index: each
    batch answers every (prefix, c) probe with Arrow's vectorized
    non-overlapping count_substring kernel (the same left-to-right
    semantics as the oracle's replace()-based count — documented
    deviation from the SA's overlapping counts), and a native Sum merges
    the ~|prefixes|*|alphabet| partial rows. One read-only pass, nothing
    text-sized shuffles."""
    from ray.data.aggregate import Sum

    probes = [(p, c) for p in prefixes for c in alphabet]
    full = [p + c for p, c in probes]

    def partial(batch: pa.Table) -> pa.Table:
        occ = np.empty(len(full), np.int64)
        for i, f in enumerate(full):
            occ[i] = int(
                pc.sum(pc.count_substring(batch["text"], f)).as_py() or 0
            )
        return pa.table(
            {
                "prefix": pa.array([p for p, _ in probes], pa.string()),
                "next_char": pa.array([c for _, c in probes], pa.string()),
                "occ": pa.array(occ, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby(["prefix", "next_char"])
        .aggregate(Sum("occ", alias_name="n_occurrences"))
    )


# --------------------------------------------------------------- BM25


BM25_K1 = 1.2
BM25_B = 0.75
BM25_NUM_QUERIES = 3     # query texts = documents with doc_id < 3
BM25_TOPK = 10


def bm25_topk(sf_dir: str, k: int = BM25_TOPK):
    """Sparse lexical retrieval: Okapi BM25 top-k docs per query
    (Robertson & Zaragoza 2009), queries = the distinct terms of the
    first BM25_NUM_QUERIES documents — the retrieval-side complement of
    the dense ANN operators.

    Scale shape: the query side is broadcast-class by definition (a few
    dozen distinct terms). One tiny pass collects corpus stats (N,
    avgdl) and the union terms' document frequencies as fixed-width
    per-block partials (one row per block); the scoring pass is then
    embarrassingly parallel — per batch, tf over the sorted union terms
    via searchsorted + bincount, the BM25 tf-normalization elementwise,
    one (n_docs, |U|) x (|U|, n_queries) matmul, per-batch partial
    top-k — followed by the same bounded qbucket merge the ANN
    operators use. Nothing doc-sized ever shuffles.

    Determinism / oracle exactness: N and avgdl come from integer sums
    (bit-identical doubles on both engines); scores are rounded to 6 dp
    BEFORE ranking (the tfidf_top_terms rule) with doc_id tie-break;
    only docs matching >= 1 query term emit rows, mirroring the SQL
    join semantics."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    # --- query side (driver): distinct terms per query doc ------------
    qdocs = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .filter(expr=f"doc_id < {BM25_NUM_QUERIES}")
        .to_pandas()
    )
    empty_out = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if len(qdocs) == 0:
        return ray.data.from_arrow(empty_out)
    qdocs = qdocs.sort_values("doc_id")
    qids = qdocs["doc_id"].to_numpy().astype(np.int64)
    qterms = [sorted(set(t.split())) for t in qdocs["text"]]
    union_strs = sorted({w for ts in qterms for w in ts})
    # sorted u64 hashes stand in for the term strings (module-wide
    # collision assumption); all matching is searchsorted over this
    uh = np.sort(token_hashes(pa.array(union_strs, pa.string())))
    nu = uh.shape[0]
    if nu == 0:
        # all query docs empty/whitespace-only: no term can match, and
        # the partial kernels below index u[...] on an empty array
        return ray.data.from_arrow(empty_out)
    member = np.zeros((nu, qids.shape[0]), np.float64)  # term x query
    for j, ts in enumerate(qterms):
        th = token_hashes(pa.array(ts, pa.string()))
        member[np.searchsorted(uh, th), j] = 1.0
    uref = ray.put(uh)

    # --- pass 1: corpus stats + union-term dfs (one row per block) ----
    def stat_partial(batch: pa.Table) -> pa.Table:
        one = pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "toks": pa.array([0], pa.int64()),
                "df": pa.array([[0] * nu], pa.list_(pa.int64())),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return one
        u = get_broadcast(uref)
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        doc_ix = np.repeat(np.arange(batch.num_rows), counts.astype(np.int64))
        th = token_hashes(flat)[nonempty]
        doc_ix = doc_ix[nonempty]
        dl = np.bincount(doc_ix, minlength=batch.num_rows).astype(np.int64)
        pos = np.searchsorted(u, th)
        ok = (pos < nu) & (u[np.minimum(pos, max(nu - 1, 0))] == th)
        # df: distinct (doc, term) memberships
        key = doc_ix[ok].astype(np.int64) * nu + pos[ok]
        df = np.bincount(
            np.unique(key) % nu, minlength=nu
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([int((dl > 0).sum())], pa.int64()),
                "toks": pa.array([int(dl.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(stat_partial, batch_format="pyarrow", batch_size=8192)
        .take_all()
    )
    n_docs = int(sum(r["n"] for r in parts))
    total_toks = int(sum(r["toks"] for r in parts))
    df = np.zeros(nu, np.int64)
    for r in parts:
        df += np.asarray(r["df"], np.int64)
    if n_docs == 0:
        return ray.data.from_arrow(empty_out)
    avgdl = total_toks / n_docs  # exact: two ints
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)  # (|U|,)
    w_ref = ray.put((idf[:, None] * member, avgdl))  # (|U|, nq) weights

    # --- pass 2: scoring + per-batch partial top-k ---------------------
    def score_partial(batch: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return out_empty
        u = get_broadcast(uref)
        weights, av = get_broadcast(w_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        doc_ix = np.repeat(np.arange(batch.num_rows), counts.astype(np.int64))
        th = token_hashes(flat)[nonempty]
        doc_ix = doc_ix[nonempty]
        dl = np.bincount(doc_ix, minlength=batch.num_rows).astype(np.float64)
        pos = np.searchsorted(u, th)
        ok = (pos < nu) & (u[np.minimum(pos, max(nu - 1, 0))] == th)
        tf = np.zeros((batch.num_rows, nu), np.float64)
        np.add.at(tf, (doc_ix[ok], pos[ok]), 1.0)
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[:, None] / av)
        tfn = np.divide(tf * (BM25_K1 + 1.0), denom, where=denom > 0)
        scores = tfn @ weights  # (n_docs_in_batch, nq)
        hit_d, hit_q = np.nonzero(scores > 0)
        if hit_d.size == 0:
            return out_empty
        # partial top-k per query inside the batch
        rs = np.round(scores[hit_d, hit_q], 6)
        order = np.lexsort((ids[hit_d], -rs, hit_q))
        qv = hit_q[order]
        new = np.concatenate(([True], qv[1:] != qv[:-1]))
        rid = np.cumsum(new) - 1
        run_start = np.cumsum(np.bincount(rid)) - np.bincount(rid)
        local = np.arange(qv.shape[0]) - run_start[rid]
        keep = local < k
        qkeep, sel = qv[keep], order[keep]
        return pa.table(
            {
                "query_id": pa.array(qids[qkeep], pa.int64()),
                "doc_id": pa.array(ids[hit_d[sel]], pa.int64()),
                "score": pa.array(rs[sel], pa.float64()),
            }
        )

    cand = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score_partial, batch_format="pyarrow", batch_size=8192
    )

    from hg_dedup_ray.stages.embed import qbucket_merge_topk

    return qbucket_merge_topk(
        cand, k, id_col="doc_id", score_col="score", emit_score=True
    )


# --------------------------------------------------- source overlap matrix


def source_overlap_matrix(sf_dir: str, num_buckets: int = 64):
    """Pairwise cross-source contamination: for every source pair
    (source_a < source_b, string order) the number of DISTINCT texts
    present in BOTH sources — the report that tells a corpus curator
    which providers are re-crawling each other before any dedup policy
    is chosen. Text identity is the blake2b-8 fp (the standing
    exact_dedup collision assumption; the oracle joins exact strings).

    Scale shape: per-batch distinct (fp, source) rows — text never
    shuffles — then ONE coarse fp%B groupby. fp spaces of different
    buckets are disjoint, so per-bucket pair counts add exactly; within
    a bucket the expansion is a vectorized within-run all-pairs with
    k = sources sharing the text (bounded by the source count, not the
    corpus). The combine is source-pair-bounded and happens on the
    driver, like dup_rate_by_source's totals."""

    def fp_rows(batch: pa.Table) -> pa.Table:
        h = content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        code, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((inv, fp))
        f, c = fp[order], inv[order]
        keep = np.concatenate(([True], (f[1:] != f[:-1]) | (c[1:] != c[:-1])))
        f, c = f[keep], c[keep]
        return pa.table(
            {
                "cbucket": pa.array((f % num_buckets).astype(np.int64), pa.int64()),
                "fp": pa.array(f, pa.uint64()),
                "source": pa.array([str(code[i]) for i in c], pa.string()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "partial": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        fp = group["fp"].to_numpy(zero_copy_only=False)
        src = np.asarray(group["source"].to_pylist(), dtype=object)
        code, inv = np.unique(src, return_inverse=True)
        # sort by (fp, source-code): codes are lexically ordered, so
        # within-run pairs come out source_a < source_b automatically
        order = np.lexsort((inv, fp))
        f, c = fp[order], inv[order]
        keep = np.concatenate(([True], (f[1:] != f[:-1]) | (c[1:] != c[:-1])))
        f, c = f[keep], c[keep]
        new = np.concatenate(([True], f[1:] != f[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.cumsum(run_len) - run_len
        local = np.arange(f.shape[0]) - run_start[run_id]
        rep = (run_len[run_id] - 1 - local).astype(np.int64)
        tot = int(rep.sum())
        if tot == 0:
            return empty
        a_idx = np.repeat(np.arange(f.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        b_idx = a_idx + (np.arange(tot) - seg[a_idx]) + 1
        packed = c[a_idx].astype(np.int64) * code.shape[0] + c[b_idx]
        pu, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "source_a": pa.array(
                    [str(code[i]) for i in pu // code.shape[0]], pa.string()
                ),
                "source_b": pa.array(
                    [str(code[i]) for i in pu % code.shape[0]], pa.string()
                ),
                "partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        _docs(sf_dir, columns=["doc_id", "source", "text"])
        .map_batches(fp_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("cbucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    agg: dict = {}
    for r in rows:
        k = (r["source_a"], r["source_b"])
        agg[k] = agg.get(k, 0) + int(r["partial"])
    keys = sorted(agg)
    return pa.table(
        {
            "source_a": pa.array([k[0] for k in keys], pa.string()),
            "source_b": pa.array([k[1] for k in keys], pa.string()),
            "n_shared_texts": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )
