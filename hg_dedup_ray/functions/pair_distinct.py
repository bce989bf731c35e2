"""Vectorized pair-distinct — replaces per-pair-key ``map_groups`` dedupe.

Candidate pairs surface once per colliding LSH band, so the raw pair
stream contains a few duplicates among overwhelmingly-singleton keys.
``groupby(pair).map_groups(take-first)`` costs one Python call PER PAIR
(the anti-pattern CLAUDE.md documents); this module replaces it with:

1. ``local_pair_distinct`` — an O(n log n) numpy lexsort distinct inside
   each block (``map_batches``, fully vectorized). Pairs emitted by the
   same band-bucket task land in the same block, so this removes most
   duplicates before anything shuffles.
2. a native ``groupby(keys).aggregate(Min(...))`` for the rare
   cross-block survivors — built-in aggregates run as sorted block
   combines, not a per-group UDF dispatch. All rows of one pair are
   identical, so Min reproduces the row exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def local_pair_distinct(a_col: str, b_col: str):
    """map_batches fn: drop duplicate (a_col, b_col) rows within a block.
    The key columns must be integers (doc seqs / ids)."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return batch
        a = batch[a_col].to_numpy(zero_copy_only=False)
        b = batch[b_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        keep = np.concatenate(
            ([True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))
        )
        return batch.take(pa.array(order[keep], pa.int64()))

    return fn


def distinct_pairs(ds, key_cols: list[str], int_key_cols: tuple[str, str], carry_cols: list[str]):
    """Globally distinct pair rows.

    ``int_key_cols``: two integer columns that uniquely identify the pair
    (used for the vectorized in-block distinct). ``key_cols``: the groupby
    identity (may be the same ints, or the url strings they map 1:1 to).
    ``carry_cols``: remaining columns, reproduced via Min (rows of one
    pair are identical by construction)."""
    from ray.data.aggregate import Min

    local = ds.map_batches(
        local_pair_distinct(*int_key_cols), batch_format="pyarrow"
    )
    aggs = [Min(c, alias_name=c) for c in carry_cols]
    if not aggs:
        from ray.data.aggregate import Count

        out = local.groupby(key_cols).aggregate(Count(alias_name="__n"))
        return out.map_batches(
            lambda b: b.drop_columns(["__n"]), batch_format="pyarrow"
        )
    return local.groupby(key_cols).aggregate(*aggs)


def hot_u64_keys(mat_ds, col: str, parallel_limit: int = 2_000_000) -> np.ndarray:
    """u64 key values appearing >= 2 times in a MATERIALIZED dataset —
    the prefilter that keeps per-group Python off singleton keys. Below
    ``parallel_limit`` rows this fetches the blocks and np.uniques the
    8-byte key column on the driver (one process-local pass; on a single
    node the block fetch is zero-copy plasma, and multi-node block
    transfer at <2M rows is noise); above it, the two-round raw-task
    shard+reduce (pipelines/sa_dedup._hot_keys_parallel) runs the same
    count 32 ways with only the rare hot keys returning — THAT is the
    path a 100 TB run takes, and it ships the key column only."""
    import ray

    if mat_ds.count() > parallel_limit:
        from hg_dedup_ray.pipelines.sa_dedup import _hot_keys_parallel

        return _hot_keys_parallel(mat_ds, col)
    tabs = ray.get(mat_ds.to_arrow_refs())
    chunks = [t[col].to_numpy(zero_copy_only=False) for t in tabs if len(t)]
    allk = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    u, c = np.unique(allk, return_counts=True)
    return u[c >= 2]


def hot_u64_keys_counts(
    mat_ds, col: str, parallel_limit: int = 2_000_000
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted hot keys, per-key occurrence counts) — same routing as
    hot_u64_keys, but the counts come back too (document frequencies for
    prefix-filter ordering: PPJoin ranks each doc's shingles by global df
    ascending, so the counts ARE the order key)."""
    import ray

    if mat_ds.count() > parallel_limit:
        from hg_dedup_ray.pipelines.sa_dedup import _hot_keys_parallel_counts

        return _hot_keys_parallel_counts(mat_ds, col)
    tabs = ray.get(mat_ds.to_arrow_refs())
    chunks = [t[col].to_numpy(zero_copy_only=False) for t in tabs if len(t)]
    allk = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    u, c = np.unique(allk, return_counts=True)
    hot = c >= 2
    return u[hot], c[hot].astype(np.int64)
