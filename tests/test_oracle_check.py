"""The shipped oracle-compare harness (tools/oracle_check.py) must
reproduce the driver's verdicts: ok on a green query, rows_only on a
non-SQL query, and mismatch when the oracle genuinely disagrees —
including the dtype-only disagreement that burned us once."""

import pandas as pd

from hg_dedup_ray.tools import oracle_check

SF_DIR = "/root/testdata/sf0.001"


def test_ok_rowsonly_and_unknown(ray_session):
    # annotate_documents is rows-only BY NATURE (rebuilt text, no SQL
    # analog); dup_doc_report graduated to oracle-checked in round 4
    rep = oracle_check.check_queries(
        SF_DIR, ["exact_dedup", "annotate_documents"]
    )
    by = {r["name"]: r for r in rep["results"]}
    assert by["exact_dedup"]["status"] == "ok"
    assert by["annotate_documents"]["status"] == "rows_only"
    assert rep["mismatch"] == 0 and rep["error"] == 0
    assert oracle_check.check_query("nope", SF_DIR)["status"] == "error"


def test_detects_value_and_dtype_mismatch(ray_session, monkeypatch):
    from hg_dedup_ray.pipelines import oracles

    # value mismatch: oracle claims one fewer row
    monkeypatch.setitem(
        oracles.ORACLE_SQL,
        "top_docs_by_chars",
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 9",
    )
    r = oracle_check.check_query("top_docs_by_chars", SF_DIR)
    assert r["status"] == "mismatch" and "rows" in r["detail"]

    # dtype mismatch: identical values, n_chars cast to DOUBLE
    monkeypatch.setitem(
        oracles.ORACLE_SQL,
        "top_docs_by_chars",
        "SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 10",
    )
    r = oracle_check.check_query("top_docs_by_chars", SF_DIR)
    assert r["status"] == "mismatch" and "dtypes" in r["detail"]


def test_normalize_matches_driver_contract():
    a = pd.DataFrame({"b": [1.0000004, 2.0], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [2.0, 1.0000001]})
    na, nb = oracle_check._normalize(a), oracle_check._normalize(b)
    assert list(na.columns) == ["a", "b"] == list(nb.columns)
    assert oracle_check._vhash(na) == oracle_check._vhash(nb)
