"""The generated signature oracles (SimHash, OPH MinHash) must replicate
the numpy kernels bit-for-bit — checked here without Ray so a kernel or
SQL-generator regression is caught offline, not just by the driver."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def test_simhash_oracle_bit_exact(con):
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.stages.simhash import batch_simhash

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    buf, off = string_column_bytes(t["text"])
    sigs = batch_simhash(buf, off, 8)
    exp = dict(zip(t["doc_id"].to_numpy().tolist(), sigs.tolist()))
    df = con.sql(ORACLE_SQL["simhash_sigs"]).df()
    assert len(df) == len(exp)
    for r in df.itertuples():
        assert int(r.simhash) == int(exp[r.doc_id]), r.doc_id
        for b in range(4):
            assert int(getattr(r, f"band{b}")) == (
                int(exp[r.doc_id]) >> (16 * b)
            ) & 0xFFFF


def test_oph_minhash_oracle_cell_exact(con):
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.minhash import batch_signatures_oph
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    buf, off = string_column_bytes(t["text"])
    sig = batch_signatures_oph(buf, off, 16, 128, 42)
    ids = t["doc_id"].to_numpy()
    df = con.sql(ORACLE_SQL["minhash_sig_rows"]).df()
    assert len(df) == sig.size
    got = {(r.doc_id, r.perm): int(r.sig) for r in df.itertuples()}
    rows = {int(d): i for i, d in enumerate(ids)}
    mism = sum(
        1
        for (d, p), v in got.items()
        if v != int(sig[rows[d], p])
    )
    assert mism == 0


def test_simhash_pair_oracle_lsh_guarantee(con):
    """<=3 differing bits can't touch all 4 bands (pigeonhole), so the
    band-join oracle finds every <=3-Hamming pair — verified brute-force
    over all signature pairs."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.stages.simhash import batch_simhash, hamming64

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    buf, off = string_column_bytes(t["text"])
    sigs = batch_simhash(buf, off, 8)
    ids = t["doc_id"].to_numpy()
    ham = hamming64(sigs[:, None], sigs[None, :])
    ai, bi = np.nonzero(np.triu(ham <= 3, k=1))
    exp = {
        (int(ids[a]), int(ids[b])): int(ham[a, b]) for a, b in zip(ai, bi)
    }
    df = con.sql(ORACLE_SQL["simhash_near_dup_pairs"]).df()
    got = {
        (r.doc_id_a, r.doc_id_b): int(r.hamming) for r in df.itertuples()
    }
    assert got == exp
