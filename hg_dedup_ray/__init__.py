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

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
