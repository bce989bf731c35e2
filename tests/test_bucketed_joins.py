"""VERDICT r04 #1: the customer-dim joins' above-limit paths.

With ``broadcast_limit`` forced to 1, ``revenue_by_segment`` and
``orders_per_nation`` must route through their bucketed hash joins (no
customer-table driver materialization) and produce output identical to
the broadcast path AND to the DuckDB oracle. Also covers ADVICE r04
(medium): ``_excise_islands`` must chunk its output string column when
kept bytes exceed the int32 offset bound instead of silently wrapping.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "nation"]:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _df(res):
    import ray

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res.to_pandas()


def _cmp(df, odf, float_cols=()):
    df = df.reindex(sorted(df.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    assert list(df.columns) == list(odf.columns)
    a = df.sort_values(list(df.columns)).reset_index(drop=True)
    b = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        if c in float_cols:
            assert np.allclose(a[c].astype(float), b[c].astype(float))
        else:
            assert (
                a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()
            ).all(), c


def test_revenue_by_segment_bucketed_equals_broadcast(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.relational import revenue_by_segment

    bucketed = _df(revenue_by_segment(SF, broadcast_limit=1))
    broadcast = _df(revenue_by_segment(SF))
    _cmp(bucketed, broadcast, float_cols=("revenue",))
    _cmp(
        bucketed,
        con.sql(ORACLE_SQL["revenue_by_segment"]).df(),
        float_cols=("revenue",),
    )


def test_orders_per_nation_bucketed_equals_broadcast(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.queries import orders_per_nation

    bucketed = _df(orders_per_nation(SF, broadcast_limit=1))
    broadcast = _df(orders_per_nation(SF))
    _cmp(bucketed, broadcast, float_cols=("sum_price",))
    _cmp(
        bucketed,
        con.sql(ORACLE_SQL["orders_per_nation"]).df(),
        float_cols=("sum_price",),
    )


def test_excise_islands_chunks_past_int32_bound(monkeypatch):
    """The chunked output (tiny patched bound) must be value-identical
    to the single-array output and actually multi-chunk."""
    from hg_dedup_ray.pipelines import queries

    rng = np.random.default_rng(7)
    texts = [
        "".join(rng.choice(list("abcdef ü"), rng.integers(0, 120)))
        for _ in range(64)
    ]
    ids = np.arange(64, dtype=np.int64)
    col = pa.chunked_array([pa.array(texts, pa.string())])
    # plant islands on a third of the docs
    isl_row = np.arange(0, 64, 3, dtype=np.int64)
    lens = np.array([len(texts[r].encode()) for r in isl_row], np.int64)
    isl_row = isl_row[lens >= 8]
    lens = lens[lens >= 8]
    isl_s = (lens // 4).astype(np.int64)
    isl_e = (lens // 2).astype(np.int64)

    ref = queries._excise_islands(ids, col, isl_row, isl_s, isl_e)
    assert len(ref["dedup_text"].chunks) == 1
    monkeypatch.setattr(queries, "_STR_CHUNK_BYTES", 100)
    chunked = queries._excise_islands(ids, col, isl_row, isl_s, isl_e)
    assert len(chunked["dedup_text"].chunks) > 1
    assert ref["dedup_text"].to_pylist() == chunked["dedup_text"].to_pylist()
    for c in ("doc_id", "n_removed_ranges", "removed_bytes"):
        assert ref[c].to_pylist() == chunked[c].to_pylist()
