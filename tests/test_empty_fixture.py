"""Boundary-robustness sweep: every registered query must run without
crashing on (a) a fully EMPTY fixture (all ten tables present, zero
rows, real schemas) and (b) a single-row fixture — the degenerate
inputs a 100 TB run's stragglers and filtered partitions actually
produce. No oracle comparison here; the assertion is "returns a result
object with a row count" (the sf0.001/sf0.01 sweeps check values)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Queries whose CONTRACT requires a nonempty corpus (they sample or
# seed from data and say so); they raise a clear error instead.
NEEDS_ROWS = {
    "kmeans_assign",        # seeds centroids from a data sample
    "kmeans_lloyd",
    "semantic_dedup",
    "cluster_balanced_sample",
    "cluster_source_mix",
    "ann_ivf_topk",         # trains IVF cells on a data sample
}


def _rowcount(res):
    import ray

    if isinstance(res, ray.data.Dataset):
        return res.count()
    return len(res)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        full = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(full.slice(0, 1), d / f"{t}.parquet")
    return str(d)


def _sweep(sf_dir, queries):
    failures = []
    for name, fn in queries.items():
        if name in NEEDS_ROWS:
            continue
        try:
            n = _rowcount(fn(sf_dir))
            assert n >= 0
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    return failures


def test_all_queries_survive_empty_fixture(ray_session, empty_dir):
    import __ray_entry__ as m

    failures = _sweep(empty_dir, m.queries())
    assert not failures, "\n".join(failures)


def test_all_queries_survive_single_row_fixture(ray_session, one_row_dir):
    import __ray_entry__ as m

    failures = _sweep(one_row_dir, m.queries())
    assert not failures, "\n".join(failures)
