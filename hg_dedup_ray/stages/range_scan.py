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

This is the documented Dataset-API escape hatch (a sorted input's range
partitioning needs no sort); the ``groupby`` path remains the default —
select with ``cfg.extra["scan_strategy"] = "pruned"``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from hg_dedup_ray.config import DedupConfig


@ray.remote
def _block_stats(tab: pa.Table) -> tuple[int, int, int]:
    if len(tab) == 0:
        return (0, -1, -1)
    s = tab["doc_seq"].to_numpy(zero_copy_only=False)
    return (len(tab), int(s.min()), int(s.max()))


@ray.remote
def _scan_partition(minlen: int, lo: int, hi: int, *tabs: pa.Table) -> pa.Table:
    """Filter [lo, hi) doc_seq rows out of the candidate blocks and run
    the partition scan kernel."""
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
    if not pieces:
        return None
    group = pa.concat_tables(pieces)
    return make_partition_scan(minlen)(group)


def scan_partitions_pruned(docs_mat, cfg: DedupConfig):
    """Materialized extract output -> scanned dataset, one raw Ray task
    per partition with block pruning. Returns a Ray Dataset with the same
    schema as the groupby path."""
    refs = docs_mat.to_arrow_refs()
    stats = ray.get([_block_stats.remote(r) for r in refs])
    nonempty = [(smin, smax) for n, smin, smax in stats if n > 0]
    if not nonempty:
        import ray.data as rd

        return rd.from_items([])
    # global seq bounds from the block stats (the extracted dataset's
    # order column is always "doc_seq"); partition ranges must mirror
    # stages/extract.make_extract_fn's (seq-mn)*P//span assignment
    mn = min(s for s, _ in nonempty)
    mx = max(e for _, e in nonempty)
    P = cfg.num_partitions
    span = max(mx - mn + 1, 1)
    # partition p covers seqs with (seq-mn)*P//span == p
    # -> [ceil(p*span/P)+mn, ceil((p+1)*span/P)+mn)
    out_refs = []
    for p in range(P):
        lo = -(-p * span // P) + mn
        hi = -(-(p + 1) * span // P) + mn
        cand = [
            refs[i]
            for i, (n, smin, smax) in enumerate(stats)
            if n > 0 and smin < hi and smax >= lo
        ]
        if not cand:
            continue
        out_refs.append(_scan_partition.remote(cfg.minlen, lo, hi, *cand))
    tabs = [t for t in ray.get(out_refs) if t is not None and len(t)]
    if not tabs:
        import ray.data as rd

        return rd.from_items([])
    import ray.data as rd

    return rd.from_arrow(tabs)
