"""Curation operators (pipelines/curation.py): Gopher gate semantics,
entropy extremes, centroid assignment, and SemDeDup drop rules on crafted
fixtures (the DuckDB parity run lives in test_queries.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df), str(sf / "documents.parquet"))
    return str(sf)


def _write_embeddings(tmp_path, mat):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(mat.shape[0], dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
            "label": np.zeros(mat.shape[0], np.int32),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df), str(sf / "embeddings.parquet"))
    return str(sf)


def test_gopher_rules_each_gate(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import gopher_quality_filter

    good = "the " + " ".join(f"word{i}" for i in range(60))  # passes all
    too_short = "the quick brown fox"                         # < 50 words
    long_words = "the " + " ".join("x" * 30 for _ in range(60))  # mean > 10
    no_alpha = "the " + " ".join(str(i) * 4 for i in range(60))  # alpha < 80%
    no_stops = " ".join(f"word{i}" for i in range(60))        # 0 stop types
    sf = _write_docs(tmp_path, [good, too_short, long_words, no_alpha, no_stops])
    out = gopher_quality_filter(sf).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [True, False, False, False, False]
    assert out["n_stop_types"].tolist() == [1, 1, 1, 1, 0]
    assert out.loc[0, "n_words"] == 61


def test_token_entropy_extremes(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import token_entropy

    sf = _write_docs(
        tmp_path, ["spam " * 64, " ".join(f"t{i}" for i in range(32)), "   "]
    )
    out = token_entropy(sf).to_pandas().sort_values("doc_id")
    assert out["entropy"].tolist()[0] == pytest.approx(0.0)      # constant doc
    assert out["entropy"].tolist()[1] == pytest.approx(5.0)      # 32 distinct
    assert out["n_words"].tolist()[2] == 0                        # whitespace
    assert out["entropy"].tolist()[2] == pytest.approx(0.0)


def test_semantic_dedup_drops_planted_dup(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(24, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # vec 20 duplicates vec 9 exactly; vec 21 is a near-copy of vec 9
    base[20] = base[9]
    base[21] = base[9] + rng.normal(scale=0.01, size=16)
    sf = _write_embeddings(tmp_path, base)
    out = semantic_dedup(sf, k=4, cos=0.95).to_pandas().set_index("vec_id")
    assert bool(out.loc[9, "kept"])          # first occurrence kept
    assert not bool(out.loc[20, "kept"])     # exact dup dropped
    assert not bool(out.loc[21, "kept"])     # near-dup dropped
    # same cluster for all three (identical vectors share an argmax)
    assert out.loc[20, "centroid_id"] == out.loc[9, "centroid_id"]


def test_unigram_logprob_uniform_vs_rare(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import unigram_logprob

    # 'common' appears 40x, 'rare' once -> doc 1 scores higher xent
    sf = _write_docs(tmp_path, ["common " * 40, "rare common", ""])
    out = unigram_logprob(sf).to_pandas().sort_values("doc_id")
    tot = 42
    import math

    assert out["xent"].tolist()[0] == pytest.approx(-math.log2(41 / tot))
    assert out["xent"].tolist()[1] == pytest.approx(
        (-math.log2(1 / tot) - math.log2(41 / tot)) / 2
    )
    assert out["xent"].tolist()[1] > out["xent"].tolist()[0]
    assert out["n_words"].tolist()[2] == 0


def test_cluster_balanced_sample_caps_per_cluster(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import cluster_balanced_sample

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(200, 8))
    sf = _write_embeddings(tmp_path, mat)
    out = cluster_balanced_sample(sf, k=4, m=10).to_pandas()
    per = out.groupby("centroid_id").size()
    assert (per <= 10).all() and len(out) <= 40
    # deterministic across runs
    out2 = cluster_balanced_sample(sf, k=4, m=10).to_pandas()
    assert sorted(out["vec_id"]) == sorted(out2["vec_id"])


def test_cluster_source_mix_counts(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import cluster_source_mix

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(30, 8))
    sf = _write_embeddings(tmp_path, mat)
    # documents 0..39: ids 0..29 match the embeddings, 30..39 dangle
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": "t",
            "lang": "en",
            "source": ["s" + str(i % 3) for i in range(40)],
            "n_chars": 1,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "sf" / "documents.parquet"))
    out = cluster_source_mix(sf, k=4).to_pandas()
    assert out["n_docs"].sum() == 30          # only matched ids count
    assert set(out["source"]) <= {"s0", "s1", "s2"}
    assert out.groupby(["centroid_id", "source"]).size().max() == 1


def test_kmeans_lloyd_matches_naive(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import kmeans_lloyd

    rng = np.random.default_rng(21)
    mat = rng.normal(size=(60, 8))
    sf = _write_embeddings(tmp_path, mat)
    k, iters = 4, 3
    out = kmeans_lloyd(sf, k=k, iters=iters).to_pandas().sort_values("vec_id")

    # naive reference: spherical Lloyd, seed = first K rows, ties -> low idx
    m = mat.astype(np.float32).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    c = m[:k].copy()
    for _ in range(iters):
        best = np.argmax(m @ c.T, axis=1)
        new = np.zeros_like(c)
        for j in range(k):
            sel = m[best == j]
            new[j] = sel.mean(axis=0) if len(sel) else c[j]
        c = new / np.linalg.norm(new, axis=1, keepdims=True)
    want = np.argmax(m @ c.T, axis=1)
    assert out["centroid_id"].to_numpy().tolist() == want.tolist()
    assert (out["n_iters"] == iters).all()
    # iterations actually move the assignment off the seed-only answer
    seed_only = np.argmax(m @ (m[:k]).T, axis=1)
    assert want.tolist() != seed_only.tolist()


def test_kmeans_assign_centroids_self(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.curation import kmeans_assign

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(40, 8))
    sf = _write_embeddings(tmp_path, mat)
    out = kmeans_assign(sf, k=8).to_pandas().set_index("vec_id")
    # each centroid assigns to itself (cos(v, v) == 1 is the max)
    for cid in range(8):
        assert out.loc[cid, "centroid_id"] == cid
    assert set(out["centroid_id"]) <= set(range(8))
    assert len(out) == 40


def test_dsir_weights_rank_target_like_docs_higher(ray_session, tmp_path):
    """Docs made of target-LM-favored tokens outrank raw-only docs, and
    the exact Laplace log-ratio matches a naive recomputation."""
    from hg_dedup_ray.pipelines.curation import dsir_importance_weights

    # target set = doc_id % 19 == 0 -> only doc 0 here
    texts = ["aaa aaa bbb", "aaa zzz", "zzz zzz", "   "]
    sf = _write_docs(tmp_path, texts)
    out = (
        dsir_importance_weights(sf).to_pandas().set_index("doc_id").sort_index()
    )
    # naive model: cr over all docs, ct over doc 0 only
    cr = {"aaa": 3, "bbb": 1, "zzz": 3}
    ct = {"aaa": 2, "bbb": 1, "zzz": 0}
    nr, nt, v = sum(cr.values()), sum(ct.values()), len(cr)
    lr = {
        w: np.log2((ct[w] + 1.0) / (nt + v)) - np.log2((cr[w] + 1.0) / (nr + v))
        for w in cr
    }
    want = [
        (2 * lr["aaa"] + lr["bbb"]) / 3,
        (lr["aaa"] + lr["zzz"]) / 2,
        (2 * lr["zzz"]) / 2,
        0.0,
    ]
    assert out["dsir_weight"].to_numpy() == pytest.approx(want)
    assert out["n_words"].tolist() == [3, 2, 2, 0]
    # ordering: the target doc itself > mixed > raw-only
    w = out["dsir_weight"]
    assert w[0] > w[1] > w[2]


def test_segment_dedup_apply_keep_first(ray_session, tmp_path):
    """Planted duplicate 4-word segments: first occurrence (doc, seg) order
    survives, later copies are excised, remaining segments re-join with
    single spaces."""
    from hg_dedup_ray.pipelines.queries import segment_dedup_apply

    blk = "dup1 dup2 dup3 dup4"          # one full 4-word segment
    texts = [
        blk + " a1 a2 a3 a4",            # doc 0: owns blk (seg 0) + unique
        blk + " b1 b2 b3 b4",            # doc 1: seg 0 == blk -> dropped
        "c1 c2 c3 c4 " + blk,            # doc 2: seg 1 == blk -> dropped
        blk,                             # doc 3: only blk -> empty output
    ]
    sf = _write_docs(tmp_path, texts)
    out = (
        segment_dedup_apply(sf, words_per_seg=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "text_deduped"] == blk + " a1 a2 a3 a4"
    assert out.loc[1, "text_deduped"] == "b1 b2 b3 b4"
    assert out.loc[2, "text_deduped"] == "c1 c2 c3 c4"
    assert out.loc[3, "text_deduped"] == ""
    assert out["n_kept_segments"].tolist() == [2, 1, 1, 0]


def test_perplexity_buckets_ntile_edges(ray_session, tmp_path):
    """NTILE(3) parity on crafted langs: a 5-doc lang splits 2/2/1 with
    the lowest-xent docs in bucket 1; a 2-doc lang fills buckets 1 and
    2 only; a 1-doc lang is all bucket 1; an empty-text doc scores
    xent 0.0. Matches the DuckDB oracle row for row."""
    import duckdb

    from hg_dedup_ray.pipelines.curation import perplexity_buckets
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    rows = [
        # lang en: 5 docs with increasingly rare vocabulary
        ("common common common common", "en"),
        ("common common common rare1", "en"),
        ("common common rare2 rare3", "en"),
        ("common rare4 rare5 rare6", "en"),
        ("rare7 rare8 rare9 rare10", "en"),
        # lang fr: 2 docs
        ("chat chat chat", "fr"),
        ("chien unique mot", "fr"),
        # lang de: 1 doc, empty text -> xent 0.0
        ("", "de"),
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(rows), dtype=np.int64),
            "text": [r[0] for r in rows],
            "lang": [r[1] for r in rows],
            "source": "s",
            "n_chars": [len(r[0]) for r in rows],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df), str(sf / "documents.parquet"))
    got = (
        perplexity_buckets(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["bucket"].tolist() == [1, 1, 2, 2, 3, 1, 2, 1]
    assert got.loc[7, "xent"] == 0.0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["perplexity_buckets"])
        .df()
        .sort_values("doc_id", ignore_index=True)[got.columns]
    )
    assert (got.to_numpy() == want.to_numpy()).all()


def test_quality_gate_ablation_brute_force(ray_session, tmp_path):
    """Ablation counts vs a per-doc pure-Python gate evaluation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.curation import (
        GOPHER_ALPHA_DEN,
        GOPHER_ALPHA_NUM,
        GOPHER_MAX_MEAN_WL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WL,
        GOPHER_MIN_STOP_TYPES,
        GOPHER_MIN_WORDS,
        GOPHER_STOPS,
        quality_gate_ablation,
    )

    texts = [
        " ".join(["the cat sat on mats"] * 12),        # passes all
        "the of and to",                               # too few words
        " ".join(["a"] * 60),                          # mean wl too low
        " ".join(["12345 678"] * 30),                  # alpha + no stops
        " ".join(["word"] * 60),                       # no stopwords only
        "",
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        quality_gate_ablation(str(tmp_path))
        .to_pandas()
        .set_index("gate")
        .sort_index()
    )
    import numpy as np

    fails = {g: [] for g in ("word_count", "mean_word_len", "alpha_ratio", "stopwords")}
    for t in texts:
        ws = t.split()
        nw, ch = len(ws), sum(len(w) for w in ws)
        al = sum(1 for w in ws if any(c.isalpha() and c.isascii() for c in w))
        sp = sum(1 for s in GOPHER_STOPS if s in ws)
        ok = {
            "word_count": GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS,
            "mean_word_len": GOPHER_MIN_MEAN_WL * nw <= ch <= GOPHER_MAX_MEAN_WL * nw,
            "alpha_ratio": GOPHER_ALPHA_DEN * al >= GOPHER_ALPHA_NUM * nw,
            "stopwords": sp >= GOPHER_MIN_STOP_TYPES,
        }
        for g in fails:
            fails[g].append(not ok[g])
    for g in fails:
        f = np.array(fails[g])
        others = np.array(
            [all(not fails[h][i] for h in fails if h != g) for i in range(len(texts))]
        )
        assert got.loc[g, "n_fail"] == f.sum(), g
        assert got.loc[g, "n_fail_alone"] == (f & others).sum(), g


def test_tokenizer_fertility_totals(ray_session):
    from hg_dedup_ray.pipelines.queries import tokenizer_fertility

    t = tokenizer_fertility("/root/testdata/sf0.001").to_pandas()
    assert t["n_docs"].sum() == 500
    # fertility sanity: BPE tokens >= whitespace words on every lang
    assert (t["sum_bpe_tokens"] >= t["sum_words"]).all()
    assert (t["sum_chars"] > t["sum_words"]).all()
