"""corpus_ops operators on crafted fixtures: prefix-dup semantics, tf-idf
ranking vs a naive Python oracle, per-source dup rates, and MinHash
Jaccard estimates on identical docs. (The DuckDB value-hash check of the
same operators runs in test_queries.py's contract sweep.)"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array(
                [r[2] if len(r) > 2 else "s0" for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_prefix_dup_crafted(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.corpus_ops import prefix_dup_docs

    rows = [
        (0, "abcdefghijklmnop"),          # prefix of doc 1
        (1, "abcdefghijklmnopqrstuvwx"),  # prefix of doc 2
        (2, "abcdefghijklmnopqrstuvwxyz extended even further"),
        (3, "abcdefghijklmnop"),          # exact dup of 0 -> also flagged
        (4, "completely different text"),
        (5, "zzz unrelated tail"),
        (6, "ab"),                        # short (<8 bytes) prefix of 0
    ]
    got = (
        prefix_dup_docs(_write_docs(tmp_path, rows))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    texts = {r[0]: r[1] for r in rows}
    want = {
        i: any(
            t != texts[i] and t.startswith(texts[i]) for t in texts.values()
        )
        for i in texts
    }
    assert got["is_prefix_dup"].tolist() == [want[i] for i in sorted(texts)]


def test_tfidf_crafted_vs_naive(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.corpus_ops import tfidf_top_terms

    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana cherry cherry date"),
        (2, "apple elderberry elderberry elderberry"),
        (3, "   "),  # whitespace-only: excluded from N, no output rows
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        tfidf_top_terms(sf, k=2)
        .to_pandas()
        .sort_values(["doc_id", "term_rank"], ignore_index=True)
    )
    docs = {r[0]: r[1].split() for r in rows if r[1].split()}
    n = len(docs)
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    want = []
    for d in sorted(docs):
        scored = sorted(
            (
                (round(docs[d].count(t) * math.log(n / df[t]), 6), t)
                for t in set(docs[d])
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for rank, (s, t) in enumerate(scored, 1):
            want.append((d, t, s, rank))
    assert list(
        got[["doc_id", "token", "score", "term_rank"]].itertuples(index=False)
    ) == want


def test_dup_rate_by_source_crafted(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.corpus_ops import dup_rate_by_source

    rows = [
        (0, "aaa", "web"),
        (1, "aaa", "web"),
        (2, "bbb", "web"),
        (3, "aaa", "books"),  # same text, other source: distinct there
        (4, "ccc", "books"),
        (5, "ccc", "books"),
        (6, "ccc", "books"),
    ]
    got = (
        dup_rate_by_source(_write_docs(tmp_path, rows))
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    assert got["source"].tolist() == ["books", "web"]
    assert got["n_docs"].tolist() == [4, 3]
    assert got["n_distinct_texts"].tolist() == [2, 2]
    assert got["n_dup_docs"].tolist() == [2, 1]


def test_minhash_estimate_identical_docs(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.corpus_ops import minhash_jaccard_estimate_pairs

    dup = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different content with no overlap at all " * 8
    rows = [(1, dup), (5, dup), (9, other)]
    got = (
        minhash_jaccard_estimate_pairs(_write_docs(tmp_path, rows))
        .to_pandas()
        .sort_values(["doc_id_a", "doc_id_b"], ignore_index=True)
    )
    pairs = list(got[["doc_id_a", "doc_id_b"]].itertuples(index=False))
    assert (1, 5) in pairs
    row = got[(got.doc_id_a == 1) & (got.doc_id_b == 5)].iloc[0]
    assert row["n_match_perms"] == 128
    assert row["est_jaccard"] == 1.0
    # the unrelated doc must not pair with anything
    assert 9 not in set(got["doc_id_a"]) | set(got["doc_id_b"])


def test_prefix_dup_empty_corpus_distinct_single(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.corpus_ops import prefix_dup_docs

    got = prefix_dup_docs(_write_docs(tmp_path, [(0, "only doc")])).to_pandas()
    assert got["is_prefix_dup"].tolist() == [False]


def test_near_dedup_keep_first_crafted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.corpus_ops import near_dedup_keep_first

    dup = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different content with no overlap at all " * 8
    tab = pa.table(
        {
            "doc_id": pa.array([10, 3, 7, 99], pa.int64()),
            "text": pa.array([dup, dup, dup, other]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(dup)] * 3 + [len(other)], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        near_dedup_keep_first(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # cluster {3, 7, 10} keeps min member 3; 99 is unclustered
    assert got["doc_id"].tolist() == [3, 99]


def test_source_overlap_matrix_planted(ray_session, tmp_path):
    """A text in sources {a, b, c} yields all three pairs; two shared
    texts between one pair count twice; within-source dups don't count.
    Matches the DuckDB oracle."""
    import duckdb

    from hg_dedup_ray.pipelines.corpus_ops import source_overlap_matrix
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    t1 = "triple shared text body"
    t2 = "pairwise shared text body"
    rows = [
        (0, t1, "a"), (1, t1, "b"), (2, t1, "c"),     # pairs ab, ac, bc
        (3, t2, "a"), (4, t2, "b"),                   # ab again
        (5, "solo text", "a"), (6, "solo text", "a"), # same-source dup: no pair
        (7, "only here", "c"),
    ]
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = source_overlap_matrix(str(tmp_path)).to_pandas()
    exp = {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    assert {
        (r.source_a, r.source_b): int(r.n_shared_texts)
        for r in got.itertuples()
    } == exp
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(ORACLE_SQL["source_overlap_matrix"]).df()
    assert (got.to_numpy() == want.to_numpy()).all()


def test_near_dedup_keep_longest_crafted(ray_session, tmp_path):
    """In a near-dup cluster the LONGEST member wins even when it is not
    the first: docs {3, 7, 10} cluster; 7 has an extra tail -> keep 7,
    drop 3 and 10; unclustered 99 survives. Matches the DuckDB oracle."""
    import duckdb

    from hg_dedup_ray.pipelines.corpus_ops import near_dedup_keep_longest
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    dup = "the quick brown fox jumps over the lazy dog " * 8
    longest = dup + "plus an extra trailing sentence"
    other = "completely different content with no overlap at all " * 8
    texts = {10: dup, 3: dup, 7: longest, 99: other}
    ids = sorted(texts)
    tab = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        near_dedup_keep_longest(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [7, 99]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["near_dedup_keep_longest"])
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    assert (got.to_numpy() == want.to_numpy()).all()


def test_near_dedup_keep_tiered_crafted(ray_session, tmp_path):
    """Within a near-dup cluster the highest-priority source TIER wins
    even when it is neither first nor longest: docs {3, 7, 10} cluster;
    doc 10 comes from src4 (tier 0) while 3 and 7 are src3/src7 (tiers
    3) -> keep 10; a digitless source lands in tier 3; unclustered 99
    survives. Matches the DuckDB oracle including the tier column."""
    import duckdb

    from hg_dedup_ray.pipelines.corpus_ops import near_dedup_keep_tiered
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    dup = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different content with no overlap at all " * 8
    rows = {
        3: (dup, "src3"),
        7: (dup + "tail", "src7"),
        10: (dup, "src4"),
        99: (other, "curated"),
    }
    ids = sorted(rows)
    tab = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i][0] for i in ids]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array([rows[i][1] for i in ids]),
            "n_chars": pa.array([len(rows[i][0]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        near_dedup_keep_tiered(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [10, 99]
    assert got["tier"].tolist() == [0, 3]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["near_dedup_keep_tiered"])
        .df()
        .sort_values("doc_id", ignore_index=True)[got.columns]
    )
    assert (got.to_numpy() == want.to_numpy()).all()


def test_dedup_drop_tiers_planted(ray_session, tmp_path):
    """Cascade provenance: an exact duplicate is tier 1 even though its
    text also near-dups the cluster (tier 1 wins); the near-dup
    survivor with a tail is tier 2; the exact keeper and the unique doc
    are tier 0. Matches the DuckDB oracle."""
    import duckdb

    from hg_dedup_ray.pipelines.corpus_ops import dedup_drop_tiers
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = {
        0: base,                    # exact keeper, near-cluster min
        1: base,                    # exact dup of 0 -> tier 1
        2: base + "extra tail",     # near-dup survivor -> tier 2
        3: "completely different content with no overlap " * 8,  # tier 0
    }
    ids = sorted(texts)
    tab = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        dedup_drop_tiers(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["drop_tier"].tolist() == [0, 1, 2, 0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["dedup_drop_tiers"])
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    assert (got.to_numpy() == want.to_numpy()).all()


def test_bbit_minhash_estimator_properties(ray_session):
    """1-bit estimates: bit agreements >= full-cell agreements (a cell
    match forces a bit match), exact clones estimate 1.0 on both, and
    the debiased b1 estimate stays in [0, 1]."""
    from hg_dedup_ray.pipelines.corpus_ops import bbit_minhash_estimate_pairs

    t = bbit_minhash_estimate_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    assert (t["n_match_bits"] >= t["n_match_perms"]).all()
    assert ((t["est_jaccard_b1"] >= 0) & (t["est_jaccard_b1"] <= 1)).all()
    full = t[t["n_match_perms"] == 128]
    assert len(full) > 0  # the fixture has exact clones
    assert (full["est_jaccard_b1"] == 1.0).all()


def test_bm25_all_query_docs_empty(ray_session, tmp_path):
    """ADVICE r03: whitespace-only query docs -> empty union-term set;
    the stat/score kernels must not index into an empty term array."""
    from hg_dedup_ray.pipelines.corpus_ops import bm25_topk

    rows = [
        (0, "   "),
        (1, ""),
        (2, " \t "),
        (3, "real corpus document with words"),
        (4, "another corpus document"),
    ]
    ds = bm25_topk(_write_docs(tmp_path, rows))
    assert ds.count() == 0
    assert ds.schema().names == ["query_id", "doc_id", "rank", "score"]
