"""Self-check harness: run a registered query AND its DuckDB oracle
side-by-side over the same parquet tables and compare rows / schema /
dtypes / 6-dp value hash — a faithful mirror of the correctness
driver's compare, shipped so a user can validate any operator on their
own data (reference analogue: verify_zst_alldressed.py's post-hoc
output check, generalized to every registered operator).

Comparison contract (kept identical to the driver and to
tests/test_queries.py):

- columns sorted by name on both sides (the driver sorts before
  hashing, which is why query column names must match the SQL exactly);
- floats rounded to 6 dp on both sides (distributed sums differ from
  DuckDB's in the low bits — summation order);
- dtypes compared RAW, before normalization (a uint64 label vs the
  oracle's BIGINT hash-mismatches at the driver even when values agree);
- rows sorted by all columns, then sha256 over pandas' row hashes.

CLI: ``python -m hg_dedup_ray --data_dir <sf_dir> --save_dir /tmp/x \
--check_query all``  (or a single name; rows-only queries — the
non-SQL-expressible subset — report row counts and are never failures).
"""

from __future__ import annotations

import hashlib
import time

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _vhash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the standard tables registered as views
    (missing parquet files are skipped: a custom corpus dir may carry
    only the tables its queries touch)."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def check_query(name: str, sf_dir: str, con=None) -> dict:
    """Run one registered query; if it has an oracle, compare. Returns a
    plain-JSON-able dict: {name, status, rows, sec, [detail]} where
    status is 'ok' | 'rows_only' | 'mismatch' | 'error'."""
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.queries import QUERIES

    if name not in QUERIES:
        return {"name": name, "status": "error", "detail": "unknown query"}
    t0 = time.perf_counter()
    try:
        got = _to_pandas(QUERIES[name](sf_dir))
    except Exception as e:  # surface, don't raise: this is a report tool
        return {
            "name": name,
            "status": "error",
            "sec": round(time.perf_counter() - t0, 3),
            "detail": f"{type(e).__name__}: {e}",
        }
    sec = round(time.perf_counter() - t0, 3)
    if name not in ORACLE_SQL:
        return {
            "name": name,
            "status": "rows_only",
            "rows": int(len(got)),
            "sec": sec,
        }
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        want = con.execute(ORACLE_SQL[name]).df()
    finally:
        if own_con:
            con.close()
    gd = {c: str(got[c].dtype) for c in got.columns}
    wd = {c: str(want[c].dtype) for c in want.columns}
    if gd != wd:
        return {
            "name": name,
            "status": "mismatch",
            "sec": sec,
            "detail": f"dtypes: query {gd} vs oracle {wd}",
        }
    gn, wn = _normalize(got), _normalize(want)
    if len(gn) != len(wn):
        return {
            "name": name,
            "status": "mismatch",
            "sec": sec,
            "detail": f"rows: query {len(gn)} vs oracle {len(wn)}",
        }
    if _vhash(gn) != _vhash(wn):
        diff = (gn != wn) & ~(gn.isna() & wn.isna())
        bad = diff.any(axis=1)
        return {
            "name": name,
            "status": "mismatch",
            "sec": sec,
            "detail": f"{int(bad.sum())} differing rows of {len(gn)}",
        }
    return {"name": name, "status": "ok", "rows": int(len(gn)), "sec": sec}


def check_queries(sf_dir: str, names=None) -> dict:
    """Check a list of query names (default: every registered query).
    Returns {"results": [...], "ok": n, "rows_only": n, "mismatch": n,
    "error": n} — mismatch+error == 0 means the engine reproduces its
    oracles on this data."""
    from hg_dedup_ray.pipelines.queries import QUERIES

    names = list(names) if names else sorted(QUERIES)
    con = duckdb_connection(sf_dir)
    try:
        results = [check_query(n, sf_dir, con=con) for n in names]
    finally:
        con.close()
    counts = {"ok": 0, "rows_only": 0, "mismatch": 0, "error": 0}
    for r in results:
        counts[r["status"]] += 1
    return {"results": results, **counts}
