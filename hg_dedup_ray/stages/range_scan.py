"""Range-partitioned scan without a sort shuffle.

``groupby("part")`` is semantically a RANGE partitioning here: partition
ids are contiguous in doc_seq and the materialized extract blocks are
already doc_seq-ordered runs, so each partition's rows live in a handful
of blocks. This stage exploits that:

1. one cheap parallel pass computes per-block (seq_min, seq_max)
   (zero-copy numpy min/max over plasma blocks);
2. the driver assigns each partition the blocks overlapping its seq
   range (typically 1-3 of them);
3. one raw Ray task per partition fetches ONLY those blocks (zero-copy
   on-node; at multi-node scale this is targeted block fetch, not an
   all-to-all), filters its seq range, and runs the partition scan.

The partition ranges come from the SAME ``partition_boundaries`` (and the
same extract-time seq bounds, threaded in by the caller) that stamped the
``part`` column — never re-derived from block stats, which would disagree
whenever explicit ``cfg.extra['seq_bounds']`` are wider than the data.

Output blocks stay in the object store: the result dataset is built with
``from_arrow_refs`` — the driver never ``ray.get``s a scanned partition
(they carry full text columns).

``emit_candidates=True`` additionally runs the cross-partition candidate
emitter (MinHash bands + winnow fingerprints) INSIDE each scan task — the
partition's text is already concatenated in-hand there, so fusing saves a
full extra pass over the corpus plus one materialize barrier. The
candidate rows come back as a second stream of refs (compact key+id
rows, no text).

This is the documented Dataset-API escape hatch (a sorted input's range
partitioning needs no sort); select the groupby path with
``cfg.extra["scan_strategy"] = "groupby"``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.stages.extract import partition_boundaries


@ray.remote
def _block_stats(tab: pa.Table) -> tuple[int, int, int]:
    if len(tab) == 0:
        return (0, -1, -1)
    s = tab["doc_seq"].to_numpy(zero_copy_only=False)
    return (len(tab), int(s.min()), int(s.max()))


def _partition_group(lo: int, hi: int, tabs) -> pa.Table:
    import pyarrow.compute as pc

    pieces = []
    for t in tabs:
        s = t["doc_seq"]
        mask = pc.and_(
            pc.greater_equal(s, pa.scalar(lo, pa.int64())),
            pc.less(s, pa.scalar(hi, pa.int64())),
        )
        f = t.filter(mask)
        if len(f):
            pieces.append(f)
    return pa.concat_tables(pieces) if pieces else tabs[0].slice(0, 0)


@ray.remote
def _scan_partition(cfg: DedupConfig, lo: int, hi: int, *tabs: pa.Table) -> pa.Table:
    """Filter [lo, hi) doc_seq rows out of the candidate blocks and run
    the partition scan kernel. Always returns a (possibly empty) table so
    the caller can assemble the result dataset from refs alone."""
    from hg_dedup_ray.stages.sa_scan import make_partition_scan

    group = _partition_group(lo, hi, tabs)
    return make_partition_scan(
        cfg.minlen, cfg.token_dtype, cfg.tokenizer, cfg.reverse, cfg.scan_kernel
    )(group)


@ray.remote(num_returns=2)
def _scan_partition_fused(
    cfg: DedupConfig, lo: int, hi: int, *tabs: pa.Table
) -> tuple[pa.Table, pa.Table]:
    """_scan_partition + the candidate emitter over the SAME in-hand rows
    (one text read instead of two). Returns (scan_table, candidate_table)."""
    from hg_dedup_ray.stages.candidates import CandidateEmitter
    from hg_dedup_ray.stages.sa_scan import make_partition_scan

    group = _partition_group(lo, hi, tabs)
    scanned = make_partition_scan(
        cfg.minlen, cfg.token_dtype, cfg.tokenizer, cfg.reverse, cfg.scan_kernel
    )(group)
    if len(group):
        cand = CandidateEmitter(cfg)(group)
    else:
        cand = pa.table(
            {
                "bucket_key": pa.array([], pa.uint64()),
                "kind": pa.array([], pa.uint8()),
                "url": pa.array([], pa.string()),
                "doc_seq": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
    return scanned, cand


def scan_partitions_pruned(
    docs_mat, cfg: DedupConfig, seq_min: int, seq_max: int,
    emit_candidates: bool = False,
):
    """Materialized extract output -> scanned dataset, one raw Ray task
    per partition with block pruning. ``seq_min``/``seq_max`` are the
    extract-time bounds (stages/extract.seq_bounds) so partition ranges
    match the stamped ``part`` column exactly. Returns a Ray Dataset with
    the same schema as the groupby path (plus, with
    ``emit_candidates=True``, a second candidate-rows Dataset); blocks
    never touch the driver."""
    import ray.data as rd

    refs = docs_mat.to_arrow_refs()
    stats = ray.get([_block_stats.remote(r) for r in refs])
    empty = (rd.from_items([]), rd.from_items([])) if emit_candidates else rd.from_items([])
    if not any(n > 0 for n, _, _ in stats):
        return empty
    P = cfg.num_partitions
    boundaries = partition_boundaries(seq_min, seq_max, P)
    out_refs, cand_refs = [], []
    for p in range(P):
        lo, hi = int(boundaries[p]), int(boundaries[p + 1])
        cand = [
            refs[i]
            for i, (n, smin, smax) in enumerate(stats)
            if n > 0 and smin < hi and smax >= lo
        ]
        if not cand:
            continue
        if emit_candidates:
            s_ref, c_ref = _scan_partition_fused.remote(cfg, lo, hi, *cand)
            out_refs.append(s_ref)
            cand_refs.append(c_ref)
        else:
            out_refs.append(_scan_partition.remote(cfg, lo, hi, *cand))
    if not out_refs:
        return empty
    scanned = rd.from_arrow_refs(out_refs)
    if emit_candidates:
        return scanned, rd.from_arrow_refs(cand_refs)
    return scanned
