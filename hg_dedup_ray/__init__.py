"""hg_dedup_ray — a Ray-Data-native substring/near-duplicate dedup engine.

A from-scratch rebuild of the capabilities of liujch1998/hg-dedup
(suffix-array substring deduplication of pretraining corpora, reference at
/root/reference) re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
- per-partition suffix-array index + scan inside ``groupby.map_groups``
  actor tasks,
- cross-partition candidate routing via MinHash/LSH banding + explicit
  ``groupby`` shuffle (replacing the reference's in-process SA pseudo-merge,
  reference cpp_engine_dedup.h:502-799),
- writeback emitting ``sa_remove_ranges`` / ``text_deduped`` / ``cluster_id``
  columns to partitioned Parquet.

Layout:
    functions/  pure numpy/pyarrow kernels (suffix array, scan, clip, hashing)
    sources/    input readers + deterministic synthetic fixture generators
    stages/     map_batches / map_groups stage callables (incl. actor classes)
    pipelines/  end-to-end composed pipelines (sa_dedup, minhash, ann, ...)
    state/      checkpoint manifests / resume logic
"""

from hg_dedup_ray.config import DedupConfig

__all__ = [
    "DedupConfig",
    "annotate_dataset",
    "annotate_report",
    "dedup_dataset",
    "run_dedup",
    "run_dedup_resumable",
    "run_jsonl_dedup",
    "write_dup_doc_overlays",
    "write_remove_overlays",
]
__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing ray at package import)."""
    if name == "dedup_dataset" or name == "run_dedup":
        from hg_dedup_ray.pipelines import sa_dedup

        return getattr(sa_dedup, name)
    if name == "annotate_dataset":
        from hg_dedup_ray.pipelines.annotate import annotate_dataset

        return annotate_dataset
    if name == "run_dedup_resumable":
        from hg_dedup_ray.pipelines.resumable import run_dedup_resumable

        return run_dedup_resumable
    if name == "run_jsonl_dedup":
        from hg_dedup_ray.pipelines.jsonl_workflow import run_jsonl_dedup

        return run_jsonl_dedup
    if name in ("annotate_report", "write_dup_doc_overlays", "write_remove_overlays"):
        from hg_dedup_ray.tools import overlay

        return getattr(overlay, name)
    raise AttributeError(name)
