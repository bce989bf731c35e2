"""Extract / project stage — the reference's `parse_line` u8 path
(reference indexing_v6_sharded.py:41-58) as a zero-copy Arrow batch op.

Projects (id, seq, text) out of the input table, computes byte length, and
assigns the order-contiguous partition id. Extracted text is byte-identical
per url to the reference (plain ``utf-8`` encoding, no normalization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hg_dedup_ray.config import DedupConfig


def partition_boundaries(seq_min: int, seq_max: int, P: int) -> np.ndarray:
    """int64[P+1] boundary seqs: partition p covers
    [boundaries[p], boundaries[p+1]). Computed with PYTHON ints —
    the naive ``(seq - mn) * P // span`` form overflows int64 when
    span (e.g. jsonl's ``(file_rank << 32) | linenum`` seq space) times a
    large auto-sized P exceeds 2^63."""
    span = max(seq_max - seq_min + 1, 1)
    return np.array(
        [-(-p * span // P) + seq_min for p in range(P)] + [seq_max + 1],
        dtype=np.int64,
    )


def make_extract_fn(cfg: DedupConfig, seq_min: int, seq_max: int):
    """Returns a map_batches fn: project + n_bytes + partition id.

    Partition assignment MUST be contiguous in the order key so that
    (part, corpus_offset) ordering equals global doc order — the
    keep-first contract (reference cpp_engine_dedup.h:717-724).
    """
    P = cfg.num_partitions
    boundaries = partition_boundaries(seq_min, seq_max, P)

    def extract(batch: pa.Table) -> pa.Table:
        seq = batch[cfg.seq_col].cast(pa.int64())
        seq_np = seq.to_numpy(zero_copy_only=False)
        # overflow-safe, order-preserving assignment (vs multiply-divide)
        part = np.clip(
            np.searchsorted(boundaries, seq_np, side="right") - 1, 0, P - 1
        ).astype(np.int32)
        n_bytes = pc.binary_length(batch[cfg.text_col].cast(pa.binary()))
        return pa.table(
            {
                "url": batch[cfg.id_col].cast(pa.string()),
                "doc_seq": seq,
                "part": pa.array(part, pa.int32()),
                "text": batch[cfg.text_col].cast(pa.string()),
                "n_bytes": n_bytes.cast(pa.int64()),
            }
        )

    return extract


def parquet_column_bounds(paths: list[str], col: str) -> tuple[int, int] | None:
    """(min, max) of an int column from parquet footer statistics only —
    no data read. Returns None if any row group lacks statistics."""
    import pyarrow.parquet as pq

    lo, hi = None, None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        try:
            ci = md.schema.to_arrow_schema().get_field_index(col)
        except Exception:
            return None
        if ci < 0:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return (int(lo), int(hi)) if lo is not None else None


def resolve_num_partitions(ds, cfg: DedupConfig) -> int:
    """num_partitions == 0 means AUTO: derive from the text column's
    uncompressed bytes (parquet footer metadata only — no data read)
    divided by cfg.target_partition_bytes. This is the 100 TB sizing
    knob: a partition corpus must fit one task's heap (SA build is
    ~9 bytes/byte transient), so partition count scales with data."""
    if cfg.num_partitions > 0:
        return cfg.num_partitions
    import pyarrow.parquet as pq

    try:
        paths = ds.input_files()
    except Exception:
        paths = []
    total = 0
    for p in paths:
        if not p.endswith((".parquet", ".pq")):
            total = 0
            break
        md = pq.ParquetFile(p).metadata
        try:
            ci = md.schema.to_arrow_schema().get_field_index(cfg.text_col)
        except Exception:
            ci = -1
        if ci < 0:
            total = 0
            break
        for rg in range(md.num_row_groups):
            total += md.row_group(rg).column(ci).total_uncompressed_size
    if total <= 0:
        # generic fallback: one column-pruned aggregate of text lengths
        def _len_batch(b: pa.Table) -> pa.Table:
            ln = pc.binary_length(b[cfg.text_col].cast(pa.binary()))
            return pa.table(
                {"n": pa.array([pc.sum(ln).as_py() or 0], pa.int64())}
            )

        total = int(
            ds.select_columns([cfg.text_col])
            .map_batches(_len_batch, batch_format="pyarrow")
            .sum("n")
        )
    return max(1, -(-total // cfg.target_partition_bytes))


def seq_bounds(ds, cfg: DedupConfig) -> tuple[int, int]:
    """(min, max) of the order column.

    Preference order: explicit cfg.extra['seq_bounds'] -> parquet footer
    statistics of the dataset's input files (metadata-only, the 100 TB
    path) -> a column-pruned Ray aggregate (generic fallback)."""
    if "seq_bounds" in cfg.extra:
        mn, mx = cfg.extra["seq_bounds"]
        return int(mn), int(mx)
    try:
        paths = ds.input_files()
    except Exception:
        paths = []
    if paths and all(p.endswith((".parquet", ".pq")) for p in paths):
        bounds = parquet_column_bounds(paths, cfg.seq_col)
        if bounds is not None:
            return bounds
    res = ds.select_columns([cfg.seq_col]).aggregate(*_min_max_aggs(cfg.seq_col))
    mn, mx = res[f"min({cfg.seq_col})"], res[f"max({cfg.seq_col})"]
    if mn is None:  # empty dataset: degenerate bounds, every stage no-ops
        return 0, -1
    return int(mn), int(mx)


def _min_max_aggs(col: str):
    from ray.data.aggregate import Max, Min

    return Min(col), Max(col)
