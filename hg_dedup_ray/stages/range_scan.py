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

This is the documented Dataset-API escape hatch (a sorted input's range
partitioning needs no sort); the ``groupby`` path remains the default —
select with ``cfg.extra["scan_strategy"] = "pruned"``.
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


@ray.remote
def _scan_partition(
    scan_opts: tuple, lo: int, hi: int, *tabs: pa.Table
) -> pa.Table:
    """Filter [lo, hi) doc_seq rows out of the candidate blocks and run
    the partition scan kernel. Always returns a (possibly empty) table so
    the caller can assemble the result dataset from refs alone."""
    import pyarrow.compute as pc

    from hg_dedup_ray.stages.sa_scan import make_partition_scan

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
    group = pa.concat_tables(pieces) if pieces else tabs[0].slice(0, 0)
    return make_partition_scan(*scan_opts)(group)


def scan_partitions_pruned(
    docs_mat, cfg: DedupConfig, seq_min: int, seq_max: int
):
    """Materialized extract output -> scanned dataset, one raw Ray task
    per partition with block pruning. ``seq_min``/``seq_max`` are the
    extract-time bounds (stages/extract.seq_bounds) so partition ranges
    match the stamped ``part`` column exactly. Returns a Ray Dataset with
    the same schema as the groupby path; blocks never touch the driver."""
    import ray.data as rd

    refs = docs_mat.to_arrow_refs()
    stats = ray.get([_block_stats.remote(r) for r in refs])
    if not any(n > 0 for n, _, _ in stats):
        return rd.from_items([])
    P = cfg.num_partitions
    boundaries = partition_boundaries(seq_min, seq_max, P)
    scan_opts = (
        cfg.minlen, cfg.token_dtype, cfg.tokenizer, cfg.reverse, cfg.scan_kernel
    )
    out_refs = []
    for p in range(P):
        lo, hi = int(boundaries[p]), int(boundaries[p + 1])
        cand = [
            refs[i]
            for i, (n, smin, smax) in enumerate(stats)
            if n > 0 and smin < hi and smax >= lo
        ]
        if not cand:
            continue
        out_refs.append(_scan_partition.remote(scan_opts, lo, hi, *cand))
    if not out_refs:
        return rd.from_items([])
    return rd.from_arrow_refs(out_refs)
