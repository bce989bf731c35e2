"""Sketch/statistics operators: wordgram kernels, HLL accuracy, heavy
hitters, distinct counts, dup-ngram stats, and the relational joins —
all vs DuckDB / numpy naive oracles on sf0.001."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "part", "documents"]:
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
            assert (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all(), c


# ---------------------------------------------------------------- kernels


def test_token_hashes_identity():
    from hg_dedup_ray.functions.wordgrams import token_hashes

    toks = pa.array(["alpha", "beta", "alpha", "alphaa", "a", "b"])
    h = token_hashes(toks)
    assert h[0] == h[2]
    assert len(set(h.tolist())) == 5


def test_word_gram_boundaries():
    from hg_dedup_ray.functions.wordgrams import doc_tokens, word_gram_hashes

    col = pa.array(["a b c d e f", "a b c d e", "x y", "", "  "])
    th, off = doc_tokens(col)
    assert off.tolist() == [0, 6, 11, 13, 13, 13]
    g, goff = word_gram_hashes(th, off, 5)
    # doc0: 2 grams, doc1: 1 gram (== doc0's first), others: none
    assert goff.tolist() == [0, 2, 3, 3, 3, 3]
    assert g[0] == g[2] and g[0] != g[1]


def test_hll_accuracy_and_merge():
    from hg_dedup_ray.functions import hll

    rng = np.random.default_rng(7)
    for n in [100, 5000, 200_000]:
        vals = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        n_true = np.unique(vals).shape[0]
        a, b = hll.empty_registers(), hll.empty_registers()
        hll.add_hashes(a, vals[: n // 3])
        hll.add_hashes(b, vals[n // 3 :])
        est = hll.estimate(hll.merge(a, b))
        assert abs(est - n_true) / n_true < 0.05
    # idempotent merge
    assert (hll.merge(a, a) == a).all()


# ---------------------------------------------------------------- queries


def test_heavy_hitters(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import heavy_hitter_tokens

    _cmp(
        _df(heavy_hitter_tokens(SF)),
        con.sql(ORACLE_SQL["heavy_hitter_tokens"]).df(),
    )


def test_heavy_hitters_fallback(ray_session, con):
    """Tiny capacity forces the exact-fallback branch; result unchanged."""
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import heavy_hitter_tokens

    _cmp(
        _df(heavy_hitter_tokens(SF, capacity=2)),
        con.sql(ORACLE_SQL["heavy_hitter_tokens"]).df(),
    )


def test_distinct_token_counts(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import distinct_token_counts

    _cmp(
        _df(distinct_token_counts(SF)),
        con.sql(ORACLE_SQL["distinct_token_counts"]).df(),
    )


def test_dup_ngram_stats(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import dup_ngram_stats

    _cmp(
        _df(dup_ngram_stats(SF)),
        con.sql(ORACLE_SQL["dup_ngram_stats"]).df(),
    )


def test_approx_distinct_hll(ray_session, con):
    from hg_dedup_ray.pipelines.sketches import approx_distinct_hll

    est = {
        r["lang"]: r["n_distinct_est"]
        for r in approx_distinct_hll(SF).take_all()
    }
    exact = dict(
        con.sql(
            r"""SELECT lang, count(DISTINCT token) FROM (
                  SELECT lang,
                         unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                  FROM documents WHERE trim(text) <> ''
                ) GROUP BY lang"""
        ).fetchall()
    )
    assert set(est) == set(exact)
    for k, x in exact.items():
        assert abs(est[k] - x) / x < 0.05


def test_revenue_by_segment(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.relational import revenue_by_segment

    _cmp(
        _df(revenue_by_segment(SF)),
        con.sql(ORACLE_SQL["revenue_by_segment"]).df(),
        float_cols=("revenue",),
    )


def test_customers_no_urgent_orders(ray_session, con):
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.relational import customers_no_urgent_orders

    _cmp(
        _df(customers_no_urgent_orders(SF)),
        con.sql(ORACLE_SQL["customers_no_urgent_orders"]).df(),
        float_cols=("c_acctbal",),
    )


# ------------------------------------------------- minhash_band_clusters


def test_minhash_band_clusters_crafted(ray_session, tmp_path):
    """Exact-duplicate texts share all 32 bands -> one cluster labeled by
    the min doc_id; a unique doc forms no cluster row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import minhash_band_clusters

    dup = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different content with no overlap at all " * 8
    tab = pa.table(
        {
            "doc_id": pa.array([10, 3, 7, 99], pa.int64()),
            "text": pa.array([dup, dup, dup, other]),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        minhash_band_clusters(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [3, 7, 10]
    assert got["cluster_id"].tolist() == [3, 3, 3]


def test_kmv_accuracy_large_vocab(ray_session, tmp_path):
    """KMV estimator branch on a vocabulary far above k: estimate within
    the expected ~2/sqrt(k) relative error, and invariant to doc order."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.sketches import approx_distinct_kmv

    rng = np.random.default_rng(7)
    vocab = [f"tok{i:05d}" for i in range(3000)]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, len(vocab), size=60))
        for _ in range(400)
    ]
    true_distinct = len({w for t in texts for w in t.split()})
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(["en"] * len(texts)),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = approx_distinct_kmv(str(tmp_path), k=256).to_pandas()
    est = int(got["n_distinct_est"][0])
    assert abs(est - true_distinct) / true_distinct < 0.2, (est, true_distinct)


def test_kmv_exact_below_k(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.sketches import approx_distinct_kmv

    tab = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": pa.array(["en", "de"]),
            "text": pa.array(["a b c a", "x y"]),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        approx_distinct_kmv(str(tmp_path), k=16)
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    assert got["n_distinct_est"].tolist() == [2, 3]


def test_hll_oracle_parity_linear_branch(ray_session, con):
    """Fixture vocab is tiny -> linear-counting branch; the SQL oracle
    must land on the SAME integer as hll.estimate."""
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import approx_distinct_hll

    _cmp(
        _df(approx_distinct_hll(SF)),
        con.sql(ORACLE_SQL["approx_distinct_hll"]).df(),
    )


def test_hll_oracle_parity_raw_branch(ray_session, tmp_path):
    """~22k distinct tokens pushes raw > 2.5m (m=4096): the harmonic-sum
    branch must also be bit-identical between numpy and DuckDB — this is
    what the order-independent integer S in hll.estimate buys."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import approx_distinct_hll

    rng = np.random.default_rng(11)
    vocab = [f"w{i:05d}" for i in range(30_000)]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, len(vocab), size=100))
        for _ in range(400)
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(["en"] * len(texts)),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    got = _df(approx_distinct_hll(str(tmp_path)))
    want = c.sql(ORACLE_SQL["approx_distinct_hll"]).df()
    n_true = len({w for t in texts for w in t.split()})
    est = int(got["n_distinct_est"][0])
    assert est > 2.5 * 4096, "test must exercise the raw branch"
    assert abs(est - n_true) / n_true < 0.05, (est, n_true)
    _cmp(got, want)


def test_ngram_novelty_order_aware(ray_session, tmp_path):
    """Novelty is KEEP-FIRST: a shared 5-gram is stale only in the LATER
    doc. Doc 0 and doc 3 share one 5-gram -> doc 3 has 1 stale gram,
    doc 0 has 0; a 3-copy group stales in copies 2 and 3 only. Matches
    the DuckDB oracle on the planted fixture."""
    import duckdb
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.sketches import ngram_novelty

    shared = "alpha beta gamma delta epsilon"          # one 5-gram
    tri = "zeta eta theta iota kappa"                  # another
    texts = [
        shared + " tail0 words here",                  # doc 0: first owner
        tri,                                           # doc 1: first of 3
        "totally fresh text one two three four five",  # doc 2: all novel
        "head3 " + shared,                             # doc 3: stale gram
        tri,                                           # doc 4: stale
        tri,                                           # doc 5: stale
        "short gram",                                  # doc 6: <5 tokens, no row
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(["en"] * len(texts)),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = _df(ngram_novelty(str(tmp_path))).set_index("doc_id")
    assert 6 not in got.index                       # too short: no row
    assert int(got.loc[0, "n_stale_ngrams"]) == 0   # first owner
    assert int(got.loc[3, "n_stale_ngrams"]) == 1   # the shared gram
    assert int(got.loc[1, "n_stale_ngrams"]) == 0
    assert int(got.loc[4, "n_stale_ngrams"]) == 1
    assert int(got.loc[5, "n_stale_ngrams"]) == 1
    assert int(got.loc[2, "n_stale_ngrams"]) == 0
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = c.sql(ORACLE_SQL["ngram_novelty"]).df()
    _cmp(got.reset_index(), want)


def test_onion_dedup_keep_first_threshold(ray_session, tmp_path):
    """The original copy is kept (zero stale), a verbatim re-post is
    dropped (100% stale), and a doc reusing under half its grams
    survives the 50% rule."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.sketches import onion_dedup

    rng = np.random.default_rng(3)
    words = [f"o{i:03d}" for i in range(200)]
    orig = " ".join(rng.choice(words, 30))
    fresh = " ".join(rng.choice(words, 26))
    # 30-word doc: first 10 words copied from orig -> 6 stale 5-grams
    # of 26 total, under 50%
    partial = " ".join(orig.split()[:10]) + " " + fresh[: len(fresh)]
    texts = [orig, orig, partial]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = onion_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert bool(got.loc[0, "kept"]) and got.loc[0, "n_stale_ngrams"] == 0
    assert not bool(got.loc[1, "kept"])
    assert got.loc[1, "n_stale_ngrams"] == got.loc[1, "n_ngrams"]
    assert bool(got.loc[2, "kept"])
    assert 0 < got.loc[2, "n_stale_ngrams"] < got.loc[2, "n_ngrams"]


def test_cms_merge_exact_across_many_batches(ray_session, tmp_path):
    """Regression: the driver counter merge must be duplicate-safe
    (np.add.at) — Ray concatenates several batch outputs into one block,
    repeating cell ids, and fancy-index += silently dropped all but the
    last (caught by the sf0.1 oracle sweep). A no-collision vocabulary
    over enough docs to span multiple 4096-doc batches must yield
    estimates equal to TRUE counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.sketches import approx_counts_cms

    rng = np.random.default_rng(9)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [
        " ".join(rng.choice(vocab, 8)) for _ in range(10_000)
    ]  # ~3 internal batches at batch_size=4096
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = approx_counts_cms(str(tmp_path), topk=5).to_pandas()
    from collections import Counter

    true = Counter(w for t in texts for w in t.split())
    for _, r in got.iterrows():
        assert r["est_count"] == true[r["token"]], r["token"]


def test_promo_revenue_share_bucketed_above_limit(ray_session, con):
    """VERDICT r03 #2: with broadcast_limit forced below the part count,
    the bucketed hash-join path must produce bit-identical int64 partial
    sums (hence identical floats) to the broadcast path AND the oracle."""
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.relational import promo_revenue_share

    broad = _df(promo_revenue_share(SF))
    bucketed = _df(promo_revenue_share(SF, broadcast_limit=1))
    for c in ("promo_revenue", "total_revenue", "promo_share"):
        # exact equality: both paths sum the same int64 units
        assert broad[c].to_numpy()[0] == bucketed[c].to_numpy()[0], c
    _cmp(
        bucketed,
        con.sql(ORACLE_SQL["promo_revenue_share"]).df(),
        float_cols=("promo_revenue", "total_revenue", "promo_share"),
    )
