"""The flagship pipeline: suffix-array substring dedup, Ray-Data-first.

Dataflow (SURVEY.md §7):

    read_parquet (pruned cols)
      -> extract map_batches          (project, n_bytes, contiguous part id)
      -> groupby(part).map_groups     (per-partition SA index + scan)   [shuffle 1]
      -> MinHash map_batches (actors) -> LSH band explode
      -> groupby(band_key)            (candidate buckets)               [shuffle 2]
      -> rep-pairing -> groupby(pair) dedupe                            [shuffle 3, small]
      -> PairVerifier map_batches     (broadcast texts of dup-set only)
      -> driver union-find (small edge set) -> broadcast cluster ids
      -> Writeback map_batches        (merge + clip + annotate/remove)
      -> write_parquet(partition_cols=["part"])                        [resumable layout]

Scale notes:
- Shuffles 2/3 move only (u64 key, url, seq, part) rows — never text.
- Texts are broadcast ONLY for docs appearing in candidate pairs (the dup
  set). If the dup set itself outgrows driver memory, swap the broadcast
  for a bucketed hash join: add bucket=hash(url)%B to pairs and docs,
  groupby(bucket) both, join per bucket — same pattern, no driver state.
- The partition scan holds one partition corpus in task memory; cap it
  with cfg.target_partition_bytes / num_partitions at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.stages.extract import (
    make_extract_fn,
    resolve_num_partitions,
    seq_bounds,
)
from hg_dedup_ray.stages.candidates import (
    CandidateEmitter,
    chunk_members,
    expand_band_pairs,
)
from hg_dedup_ray.stages.group_scan import GroupScanner, bucket_to_group
from hg_dedup_ray.stages.minhash_stage import MinHashBander, bucket_to_pairs
from hg_dedup_ray.stages.winnow_stage import WinnowFingerprinter
from hg_dedup_ray.stages.pair_verify import PairVerifier
from hg_dedup_ray.stages.sa_scan import make_partition_scan
from hg_dedup_ray.stages.writeback import Writeback
from hg_dedup_ray.state.cluster import union_find_clusters


def _pool(cfg: DedupConfig, key: str) -> tuple[int, int]:
    """Actor-pool sizing: autoscale 1..k where k leaves headroom for the
    read/shuffle stages (a pool whose MIN size equals the cluster CPU count
    deadlocks the streaming executor waiting for actors)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    k = cfg.extra.get(key, max(1, cpus - 1))
    return (1, max(1, min(k, cpus - 1)))


def _task_stage(cls, *args):
    """Wrap a callable-class stage as a TASK closure with a per-worker
    singleton instance.

    Rationale: map_batches(Cls, concurrency=N) spawns a dedicated actor
    pool per stage (~2s spin-up each, 4-5 pools per run) — worth it only
    for heavy state. These stages' state is broadcast ObjectRefs + config,
    so tasks on Ray's warm shared workers + a worker-local memo give the
    same once-per-worker setup without any pool cold-start.
    """
    import uuid

    key = f"{cls.__name__}:{uuid.uuid4().hex}"

    def fn(batch):
        from hg_dedup_ray.stages.broadcast import worker_memo

        return worker_memo(key, lambda: cls(*args))(batch)

    fn.__name__ = cls.__name__
    return fn


def extract_docs(ds, cfg: DedupConfig, bounds: tuple[int, int] | None = None):
    """read -> (url, doc_seq, part, text, n_bytes) dataset."""
    mn, mx = bounds if bounds is not None else seq_bounds(ds, cfg)
    return ds.map_batches(
        make_extract_fn(cfg, mn, mx), batch_format="pyarrow", batch_size=cfg.batch_size
    )


def candidate_pairs(docs, cfg: DedupConfig):
    """MinHash/LSH banding -> deduped near-dup DOC pairs (cluster edges).

    Same hot-key prefilter as the fused flagship path: band keys seen
    only once (the overwhelming majority) never reach the per-group
    Python stage."""
    bands = docs.map_batches(
        _task_stage(MinHashBander, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    ).materialize()
    hot = _hot_keys(bands, cfg)
    if hot.shape[0] == 0:
        return ray.data.from_items([])
    hot_ref = ray.put(hot)  # sorted u64 ndarray: searchsorted membership

    def keep_hot(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        return b.filter(
            pa.array(
                _hot_mask(
                    get_broadcast(hot_ref),
                    b["bucket_key"].to_numpy(zero_copy_only=False),
                )
            )
        )

    pairs = (
        bands.map_batches(keep_hot, batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(bucket_to_pairs, batch_format="pyarrow")
    )
    # multi-band duplicates removed vectorized (in-block lexsort distinct
    # + native Min aggregate) — NOT a map_groups per mostly-singleton pair
    from hg_dedup_ray.functions.pair_distinct import distinct_pairs

    return distinct_pairs(
        pairs,
        key_cols=["url_a", "url_b"],
        int_key_cols=("seq_a", "seq_b"),
        carry_cols=["seq_a", "part_a", "seq_b", "part_b"],
    )


def candidate_groups(docs, cfg: DedupConfig):
    """Winnowing fingerprints -> cross-partition candidate GROUPS.

    Any >=minlen shared substring region is guaranteed a common bucket
    (w + k - 1 <= minlen, functions/winnow.py); buckets spanning >1
    partition become doc_seq-sorted groups for mini-corpus SA scans.
    """
    winnows = docs.map_batches(
        WinnowFingerprinter,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(cfg, "winnow_concurrency"),
    )
    return winnows.groupby("bucket_key").map_groups(bucket_to_group, batch_format="pyarrow")


def _hot_keys_driver(cand) -> np.ndarray:
    """Stream ONLY the u64 key column to the driver and np.unique it —
    8 bytes/key, no shuffle. Measured 30-100x faster than a Ray groupby
    at sandbox scale, where the all-to-all's per-row overhead dominates
    the tiny payload."""
    # read the materialized blocks zero-copy from plasma; a
    # select_columns here would launch a whole projection execution
    # (one task per block) just to drop columns we never deserialize
    tabs = ray.get(cand.to_arrow_refs())
    chunks = [
        t["bucket_key"].to_numpy(zero_copy_only=False)
        for t in tabs
        if len(t)
    ]
    allk = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    u, c = np.unique(allk, return_counts=True)
    hot = c >= 2
    return u[hot], int(c[hot].sum())


_HOT_SHARDS = 32


@ray.remote(num_returns=_HOT_SHARDS)
def _shard_block_keys(tab: pa.Table, col: str = "bucket_key"):
    """One block's u64 keys split into _HOT_SHARDS arrays by top bits."""
    k = tab[col].to_numpy(zero_copy_only=False)
    sh = (k >> np.uint64(64 - 5)).astype(np.int64)
    order = np.argsort(sh, kind="stable")
    ks, shs = k[order], sh[order]
    bounds = np.searchsorted(shs, np.arange(_HOT_SHARDS + 1))
    return tuple(ks[bounds[i] : bounds[i + 1]] for i in range(_HOT_SHARDS))


_CAND_SHARDS = _HOT_SHARDS


@ray.remote(num_returns=_CAND_SHARDS)
def _shard_cand_block(tab: pa.Table, hot: np.ndarray):
    """One candidate block -> hot-filtered rows split into
    _CAND_SHARDS sub-tables by bucket_key top bits (the
    _shard_block_keys shape, carrying full rows)."""
    bk = tab["bucket_key"].to_numpy(zero_copy_only=False)
    tab = tab.filter(pa.array(_hot_mask(hot, bk)))
    bk = tab["bucket_key"].to_numpy(zero_copy_only=False)
    sh = (bk >> np.uint64(64 - 5)).astype(np.int64)
    order = np.argsort(sh, kind="stable")
    tab = tab.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sh[order], np.arange(_CAND_SHARDS + 1))
    return tuple(
        tab.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(_CAND_SHARDS)
    )


@ray.remote
def _reduce_cand_shard(max_docs: int, *tabs):
    """One key-range shard: concat its sub-tables and run the
    segmented per-bucket candidate rules; returns answer-bounded
    candidate rows (or None when the shard is empty)."""
    from hg_dedup_ray.stages.candidates import (
        make_coarse_bucket_to_candidates,
    )

    tabs = [t for t in tabs if t is not None and len(t)]
    if not tabs:
        return None
    return make_coarse_bucket_to_candidates(max_docs)(pa.concat_tables(tabs))


@ray.remote
def _reduce_hot_shard(*chunks):
    allk = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    u, c = np.unique(allk, return_counts=True)
    hot = c >= 2
    return u[hot], int(c[hot].sum())


@ray.remote
def _reduce_hot_shard_counts(*chunks):
    """Like _reduce_hot_shard but returns per-key occurrence counts
    (document frequencies) instead of the summed row total."""
    allk = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    u, c = np.unique(allk, return_counts=True)
    hot = c >= 2
    return u[hot], c[hot].astype(np.int64)


def _hot_keys_parallel_counts(cand, col: str = "bucket_key"):
    """(sorted hot keys, per-key counts) via the 32-way shard+reduce.
    Shards split by the TOP key bits, so concatenating reducer outputs
    in shard order yields a globally sorted key array — searchsorted-able
    without a driver-side re-sort."""
    block_refs = cand.to_arrow_refs()
    shard_refs = [_shard_block_keys.remote(r, col) for r in block_refs]
    hot_refs = [
        _reduce_hot_shard_counts.remote(*(row[s] for row in shard_refs))
        for s in range(_HOT_SHARDS)
    ]
    parts = ray.get(hot_refs)
    if not parts:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    keys = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    return keys, cnts


def _hot_keys_parallel(cand, col: str = "bucket_key", return_rows: bool = False):
    """Two-round raw-task shard + reduce: each block's key column splits
    into 32 hash shards (map side), one reducer per shard np.uniques its
    slice. Same result as `_hot_keys_driver` with the O(n log n) sort
    parallelized 32 ways and only the (rare) hot keys returning to the
    driver. Used above ``hot_parallel_limit`` rows (default 2M) — below
    that the single driver pass wins on task overhead."""
    block_refs = cand.to_arrow_refs()
    shard_refs = [_shard_block_keys.remote(r, col) for r in block_refs]
    hot_refs = [
        _reduce_hot_shard.remote(*(row[s] for row in shard_refs))
        for s in range(_HOT_SHARDS)
    ]
    parts = ray.get(hot_refs)
    keys = (
        np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.uint64)
    )
    rows = sum(p[1] for p in parts)
    return (keys, rows) if return_rows else keys


def _hot_keys(cand, cfg: DedupConfig, return_rows: bool = False):
    """Pick the hot-key strategy by candidate volume: driver pass (small),
    raw-task shard+reduce (the default — each of the 32 reducers sorts
    n/32 keys, fine into the billions), Dataset groupby only when even
    per-shard reduces would outgrow a worker (distributed_key_limit,
    default 2e9 rows; a 100 TB run processes per-batch far below that).
    NOTE: driver_key_limit gates the separate BUCKET-BUILD path choice in
    compute_cross_partition, not this counting step — conflating the two
    once cost 26 s of Dataset-groupby counting at 40M rows.

    ``return_rows=True`` additionally returns the TOTAL row count across
    hot buckets (the dup-set member volume) — computed for free inside
    the same np.unique passes; the auto dup-set router keys off it."""
    n = cand.count()
    if n > int(cfg.extra.get("distributed_key_limit", 2_000_000_000)):
        out = _hot_keys_distributed(cand)
    elif n > int(cfg.extra.get("hot_parallel_limit", 2_000_000)):
        out = _hot_keys_parallel(cand, return_rows=True)
    else:
        out = _hot_keys_driver(cand)
    return out if return_rows else out[0]


def _hot_keys_distributed(cand) -> np.ndarray:
    """The 100 TB route: shard keys by their top byte (256 groups) and
    count inside each shard with a vectorized np.unique — one shuffle of
    the key column only, and 256 map_groups calls total instead of one
    per distinct key."""

    def add_shard(b: pa.Table) -> pa.Table:
        k = b["bucket_key"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "key_shard", pa.array((k >> np.uint64(56)).astype(np.uint8), pa.uint8())
        )

    def shard_hot(g: pa.Table) -> pa.Table:
        k = g["bucket_key"].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        hot = c >= 2
        return pa.table(
            {
                "bucket_key": pa.array(u[hot], pa.uint64()),
                "n_rows": pa.array(c[hot].astype(np.int64), pa.int64()),
            }
        )

    rows = (
        cand.select_columns(["bucket_key"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("key_shard")
        .map_groups(shard_hot, batch_format="pyarrow")
        .take_all()
    )
    keys = np.array([r["bucket_key"] for r in rows], dtype=np.uint64)
    return keys, int(sum(r["n_rows"] for r in rows))


def _hot_mask(sorted_hot: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership of ``keys`` in the SORTED hot-key array via
    searchsorted. ``pc.is_in`` rebuilds a hash set from the value_set on
    EVERY call — at tens of millions of hot keys that set-build
    dominated the 10M-doc stress probe's filter stage (r5); the
    searchsorted probe is allocation-free and O(n log m)."""
    if sorted_hot.shape[0] == 0:
        return np.zeros(keys.shape[0], bool)
    pos = np.searchsorted(sorted_hot, keys)
    pos_c = np.minimum(pos, sorted_hot.shape[0] - 1)
    return (pos < sorted_hot.shape[0]) & (sorted_hot[pos_c] == keys)


def _driver_buckets(cand, hot: np.ndarray, max_docs: int = 256) -> list[dict]:
    """Build candidate buckets on the driver: one streaming filter pass
    (rows with hot keys are a vanishing fraction), then vectorized
    grouping. Mirrors stages.candidates.bucket_to_candidates semantics.
    Used below the driver_key_limit; the Ray groupby path handles scale."""
    keys_l, kinds_l, urls_l, seqs_l, parts_l = [], [], [], [], []
    for b in cand.iter_batches(batch_size=1 << 17, batch_format="pyarrow"):
        sub = b.filter(
            pa.array(_hot_mask(hot, b["bucket_key"].to_numpy(zero_copy_only=False)))
        )
        if len(sub) == 0:
            continue
        keys_l.append(sub["bucket_key"].to_numpy(zero_copy_only=False))
        kinds_l.append(sub["kind"].to_numpy(zero_copy_only=False))
        urls_l.append(np.asarray(sub["url"].to_pylist(), dtype=object))
        seqs_l.append(sub["doc_seq"].to_numpy(zero_copy_only=False))
        parts_l.append(sub["part"].to_numpy(zero_copy_only=False))
    if not keys_l:
        return []
    keys = np.concatenate(keys_l)
    kinds = np.concatenate(kinds_l)
    urls = np.concatenate(urls_l)
    seqs = np.concatenate(seqs_l)
    parts = np.concatenate(parts_l)
    order = np.lexsort((seqs, keys))
    keys, kinds, urls, seqs, parts = (
        keys[order], kinds[order], urls[order], seqs[order], parts[order]
    )
    bounds = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
    out = []
    for i, s in enumerate(bounds):
        e = bounds[i + 1] if i + 1 < len(bounds) else keys.shape[0]
        u, first = np.unique(urls[s:e], return_index=True)
        if first.shape[0] < 2:
            continue
        kind = int(kinds[s])
        gi = s + np.sort(first)  # doc_seq order (already seq-sorted)
        if kind == 1 and np.unique(parts[gi]).shape[0] < 2:
            continue
        for c in chunk_members(gi, max_docs):
            out.append(
                {
                    "kind": kind,
                    "urls": [str(x) for x in urls[c]],
                    "seqs": [int(x) for x in seqs[c]],
                    "parts": [int(x) for x in parts[c]],
                }
            )
    return out


def _resolve_clusters(edges, cfg: DedupConfig):
    if len(edges) > int(cfg.extra.get("driver_edge_limit", 1_000_000)):
        from hg_dedup_ray.state.cluster import distributed_min_label

        return distributed_min_label(edges)
    return union_find_clusters(edges)


def compute_cross_partition_bucketed(docs, cfg: DedupConfig, cand=None, hot=None):
    """The distributed dup-set path (stages/dupset_join.py): candidate
    buckets -> exploded member rows -> bucketed hash join on doc_seq to
    attach texts -> per-group assembly (SA scan / pair verify). No text
    ever lands on the driver; select with
    ``cfg.extra["dupset_strategy"] = "bucketed"``.

    Returns ``(("tables", span_block_refs), clusters_dict)`` — Writeback
    resolves the span blocks per worker (compact: url + part + 2 ints)."""
    from hg_dedup_ray.stages.dupset_join import (
        dupset_spans_and_edges,
        make_bucket_to_members,
    )

    if cand is None:
        cand = docs.map_batches(
            _task_stage(CandidateEmitter, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    cand = cand.materialize()
    if hot is None:
        hot = _hot_keys(cand, cfg)
    if hot.shape[0] == 0:
        return ("tables", []), {}
    hot_ref = ray.put(hot)  # sorted u64 ndarray: searchsorted membership

    # COARSE bucket key: one map_groups call per ~(hot_buckets / M)
    # buckets, not one per hot bucket (per-group dispatch dominates at
    # 100k+ hot keys; make_bucket_to_members segments internally)
    n_member_buckets = int(cfg.extra.get("dupset_member_buckets", 128))

    def keep_hot(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        b = b.filter(
            pa.array(
                _hot_mask(
                    get_broadcast(hot_ref),
                    b["bucket_key"].to_numpy(zero_copy_only=False),
                )
            )
        )
        bk = b["bucket_key"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cbucket",
            pa.array(
                (bk % np.uint64(n_member_buckets)).astype(np.int64), pa.int64()
            ),
        )

    members = (
        cand.map_batches(keep_hot, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(make_bucket_to_members(cfg), batch_format="pyarrow")
    )
    spans, edges = dupset_spans_and_edges(docs, members, cfg)
    spans_mat = spans.materialize()
    span_refs = list(spans_mat.to_arrow_refs())
    return ("tables", span_refs), _resolve_clusters(edges, cfg)


def compute_cross_partition(docs, cfg: DedupConfig, cand=None, hot=None):
    """Cross-partition stage: (xranges, clusters) dicts.

    ONE fused pass emits band + fingerprint rows (or, with the pruned
    scan strategy, the rows arrive pre-emitted from inside the scan
    tasks — ``cand``); ONE shuffle buckets them; the driver receives
    compact candidate rows (urls/seqs only), then dup-set texts are
    broadcast once for group scans + pair verify.

    Returns ``(xranges: dict[url, ndarray(R,2)], clusters: dict[url, int])``.
    """
    if cand is None:
        cand = docs.map_batches(
            _task_stage(CandidateEmitter, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    cand = cand.materialize()  # two consumers below; compact key+id rows

    # Nearly every bucket is a singleton (unique shingle/band). map_groups
    # costs one Python call PER GROUP, so first find keys seen >=2 times
    # and only group the tiny survivor set. Below driver_key_limit both
    # the key count and the bucket build run as driver streaming passes
    # (no shuffle at all); above it, both run distributed.
    # driver bucket-build: a streaming pass over the compact candidate
    # rows (~1 s at 40M rows). The Dataset-groupby alternative costs ~10x
    # at that size, so the crossover sits far higher.
    limit = int(cfg.extra.get("driver_key_limit", 200_000_000))
    driver_path = cand.count() <= limit
    if hot is None:
        hot = _hot_keys(cand, cfg)
    if hot.shape[0] == 0:
        return {}, union_find_clusters([])
    if driver_path:
        cand_rows = _driver_buckets(cand, hot, cfg.max_band_bucket)
    else:
        # above-limit scale path: RAW-TASK shard+reduce (the
        # _hot_keys_parallel shape), NOT a Dataset groupby. The 10M-doc
        # stress probe (r5) showed Ray's sort-based shuffle never even
        # started its shuffle tasks on a ~3700-block input — the driver
        # spun for 10+ minutes on all-to-all planning/metadata (its own
        # estimate: 41 GB of driver memory) while workers idled. Here
        # each block fans its hot-filtered rows into 32 key-range
        # shards (one object per shard), one reducer per shard runs the
        # segmented per-bucket candidate rules, and only answer-bounded
        # candidate rows return — metadata is blocks x 32 refs, linear.
        hot_ref = ray.put(hot)  # sorted u64 ndarray
        shard_refs = [
            _shard_cand_block.remote(r, hot_ref)
            for r in cand.to_arrow_refs()
        ]
        out_refs = [
            _reduce_cand_shard.remote(
                cfg.max_band_bucket, *(row[s] for row in shard_refs)
            )
            for s in range(_CAND_SHARDS)
        ]
        cand_rows = []
        for t in ray.get(out_refs):
            if t is not None and len(t):
                cand_rows.extend(t.to_pylist())
    pair_set: set[tuple] = set()
    group_set: set[tuple] = set()
    seqs_needed: set[int] = set()
    for r in cand_rows:
        if not r["urls"]:
            continue
        if r["kind"] == 0:
            pair_set.update(expand_band_pairs(r["urls"], r["seqs"], r["parts"]))
        else:
            group_set.add(tuple(r["urls"]))
            seqs_needed.update(r["seqs"])
    pair_rows = [
        {
            "url_a": a, "seq_a": sa_, "part_a": pa_,
            "url_b": b, "seq_b": sb_, "part_b": pb_,
        }
        for (a, sa_, pa_, b, sb_, pb_) in sorted(pair_set)
    ]
    groups = sorted(group_set)
    urls_needed = {r["url_a"] for r in pair_rows} | {r["url_b"] for r in pair_rows}
    urls_needed.update(u for g in groups for u in g)
    seqs_needed.update(r["seq_a"] for r in pair_rows)
    seqs_needed.update(r["seq_b"] for r in pair_rows)
    xranges: dict[str, np.ndarray] = {}
    edges: list[tuple] = []
    if urls_needed:
        # targeted-block fetch by the dup set's doc_seqs — no full pass
        texts_ref = ray.put(_collect_texts_by_seq(docs, seqs_needed))

        if groups:
            span_rows = (
                ray.data.from_items([{"urls": list(g)} for g in groups])
                .map_batches(
                    _task_stage(GroupScanner, cfg, texts_ref),
                    batch_format="pyarrow",
                    batch_size=64,
                )
                .take_all()
            )
            for r in span_rows:
                rr = np.array([[r["start"], r["end"]]], dtype=np.int64)
                prev = xranges.get(r["url"])
                xranges[r["url"]] = (
                    np.concatenate([prev, rr]) if prev is not None else rr
                )

        if pair_rows:
            verified = (
                ray.data.from_items(pair_rows)
                .map_batches(
                    _task_stage(PairVerifier, cfg, texts_ref),
                    batch_format="pyarrow",
                    batch_size=256,
                )
                .take_all()
            )
            edges = [
                (r["url_a"], r["url_b"], r["seq_a"], r["seq_b"])
                for r in verified
                if r["jaccard"] >= cfg.jaccard_threshold
            ]
    return xranges, _resolve_clusters(edges, cfg)


def dedup_dataset(ds, cfg: DedupConfig):
    """Full dedup: input dataset -> annotated/deduped docs dataset.

    ``cfg.num_partitions == 0`` auto-sizes partitions from the text
    column's bytes / cfg.target_partition_bytes (footer metadata)."""
    if cfg.num_partitions == 0:
        from dataclasses import replace

        cfg = replace(cfg, num_partitions=resolve_num_partitions(ds, cfg))
    bounds = seq_bounds(ds, cfg)
    docs = extract_docs(ds, cfg, bounds)
    if cfg.num_partitions > 1:
        # docs feeds three consumers (scan, banding, dup-set text fetch);
        # pin the pruned projection once instead of re-running the read +
        # extract per consumer. Blocks spill to disk under memory pressure.
        docs = docs.materialize()
    pre_cand = None
    if (
        cfg.extra.get("scan_strategy", "pruned") == "pruned"
        and cfg.num_partitions > 1
    ):
        # DEFAULT: range partitioning of the already-ordered blocks — no
        # sort shuffle, one targeted-block task per partition
        # (range_scan.py). Measured 2-3x faster than the groupby sort
        # path at bench scale (the sort all-to-all ships the full text
        # column); at multi-node scale targeted block fetch is likewise
        # the cheaper pattern. Candidate emission is FUSED into the scan
        # tasks (text already in hand — one read instead of two).
        # ``extra["scan_strategy"]="groupby"`` selects the pure
        # Dataset-API path (equal output, tested).
        from hg_dedup_ray.stages.range_scan import scan_partitions_pruned

        scanned, pre_cand = scan_partitions_pruned(
            docs, cfg, *bounds, emit_candidates=True
        )
    else:
        scanned = docs.groupby("part").map_groups(
            make_partition_scan(
                cfg.minlen, cfg.token_dtype, cfg.tokenizer, cfg.reverse,
                cfg.scan_kernel,
            ),
            batch_format="pyarrow",
        )

    # --- cross-partition candidates (skipped when only one partition:
    # the partition scan is already globally exact) -----------------------
    xranges_ref = None
    clusters_ref = None
    if cfg.num_partitions > 1:
        # dup-set strategy (default "auto"): count the dup-set member rows
        # (free inside the hot-key np.unique passes) and pick
        #   - "broadcast" below dupset_broadcast_limit — the driver holds
        #     ONLY the dup set's texts (targeted-block fetch), cheapest at
        #     interactive scale;
        #   - "bucketed" above it — the stages/dupset_join hash join keeps
        #     every byte of text in the object store; at web-scale dup
        #     density (30-50% duplicated) the broadcast dict would be TBs,
        #     so the out-of-the-box 100 TB run takes this path with no
        #     flags. Explicit "broadcast"/"bucketed" values force a path.
        strategy = cfg.extra.get("dupset_strategy", "auto")
        cand = pre_cand
        if cand is None:
            cand = docs.map_batches(
                _task_stage(CandidateEmitter, cfg),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )
        cand = cand.materialize()
        hot, hot_rows = _hot_keys(cand, cfg, return_rows=True)
        if strategy == "auto":
            limit = int(cfg.extra.get("dupset_broadcast_limit", 100_000))
            strategy = "broadcast" if hot_rows <= limit else "bucketed"
        if strategy == "bucketed":
            xranges_payload, clusters = compute_cross_partition_bucketed(
                docs, cfg, cand=cand, hot=hot
            )
            xranges_ref = ray.put(xranges_payload)  # refs only — no text
        else:
            xranges, clusters = compute_cross_partition(docs, cfg, cand=cand, hot=hot)
            xranges_ref = ray.put(xranges)
        clusters_ref = ray.put(clusters)

    return scanned.map_batches(
        _task_stage(Writeback, cfg, xranges_ref, clusters_ref),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def _collect_texts(docs, urls_needed: set[str]) -> dict[str, str]:
    """Texts of the dup set only, via a filtered streaming pass."""
    import pyarrow.compute as pc

    url_arr = list(urls_needed)

    def pick(batch):
        mask = pc.is_in(batch["url"], value_set=__import__("pyarrow").array(url_arr))
        return batch.filter(mask)

    out: dict[str, str] = {}
    for b in (
        docs.select_columns(["url", "text"])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=4096, batch_format="pyarrow")
    ):
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist()):
            out[u] = t
    return out


@ray.remote
def _pick_from_block(tab: pa.Table, sel: np.ndarray) -> pa.Table:
    s = tab["doc_seq"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(sel, s)
    mask = (pos < sel.shape[0]) & (sel[np.minimum(pos, sel.shape[0] - 1)] == s)
    return tab.select(["url", "text"]).filter(pa.array(mask))


def _collect_texts_by_seq(docs_mat, seqs_needed) -> dict[str, str]:
    """Targeted-block text fetch: the dup set's doc_seqs are known, so
    only blocks whose seq range overlaps them are touched (raw tasks over
    the materialized blocks, same pattern as range_scan) — not a full
    pass over the corpus. The returned dict is bounded by the dup set."""
    from hg_dedup_ray.stages.range_scan import _block_stats

    sel = np.unique(np.asarray(sorted(seqs_needed), dtype=np.int64))
    if sel.shape[0] == 0:
        return {}
    refs = docs_mat.to_arrow_refs()
    stats = ray.get([_block_stats.remote(r) for r in refs])
    picked = []
    for r, (n, smin, smax) in zip(refs, stats):
        if n == 0:
            continue
        lo = np.searchsorted(sel, smin, side="left")
        hi = np.searchsorted(sel, smax, side="right")
        if hi > lo:
            picked.append(_pick_from_block.remote(r, sel[lo:hi]))
    out: dict[str, str] = {}
    for t in ray.get(picked):
        for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            out[u] = x
    return out


def run_dedup(input_paths, output_dir: str, cfg: DedupConfig, columns=None):
    """read_parquet -> dedup -> partitioned parquet (one dir per part)."""
    ds = ray.data.read_parquet(input_paths, columns=columns)
    out = dedup_dataset(ds, cfg)
    out.write_parquet(output_dir, partition_cols=["part"])
    return output_dir
