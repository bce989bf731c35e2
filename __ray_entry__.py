"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself BEFORE importing this module; nothing
here (or in hg_dedup_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship suffix-array dedup pipeline over
  /root/testdata/sf0.001/documents.parquet.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  the training-data ops); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible subset
  (107 of 124 queries, incl. MinHash/SimHash sigs+clusters, LSH cascades,
  Bloom dedup, dedup-aware splits and k-means). The 15 rows-only entries
  are the media decode triad, the suffix-array flagship journeys
  (reference-parity-tested against the real compiled engine), cross-doc
  SA diagnostics, and approximate IVF/IVF-PQ (the exhaustive IVF
  variant IS oracle-checked).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (annotate mode)."""
    from hg_dedup_ray.pipelines.queries import sa_dedup_documents

    return sa_dedup_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from hg_dedup_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    return dict(ORACLE_SQL)
