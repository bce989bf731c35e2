"""Driver-contract conformance: run every queries() entry at sf0.001 and
compare the SQL-expressible ones against DuckDB the way the driver does
(row count + sorted-column value equality)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _to_pandas(res):
    import pyarrow as pa

    import ray

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            # distributed sums differ from DuckDB's in the low bits
            # (summation order); compare to 6 decimals
            df[c] = df[c].astype("float64").round(6)
    return df


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


def test_all_queries_run_and_sql_matches(contract, duck):
    queries, oracles = contract
    failures = []
    for name, fn in queries.items():
        res = _to_pandas(fn(SF_DIR))
        assert len(res) >= 0, name
        if name in oracles:
            want = duck.execute(oracles[name]).df()
            # dtype-exactness: the driver's value-hash sees dtypes the
            # normalization below hides (uint64 vs int64 burned us once)
            gd = {c: str(res[c].dtype) for c in res.columns}
            wd = {c: str(want[c].dtype) for c in want.columns}
            if gd != wd:
                failures.append(f"{name}: dtypes {gd} vs oracle {wd}")
                continue
            got_n, want_n = _normalize(res.copy()), _normalize(want)
            if got_n.shape != want_n.shape:
                failures.append(f"{name}: shape {got_n.shape} vs {want_n.shape}")
                continue
            if not got_n.equals(want_n):
                diff = (got_n != want_n).any(axis=1)
                failures.append(
                    f"{name}: {int(diff.sum())} differing rows, e.g.\n"
                    f"got:\n{got_n[diff].head(3)}\nwant:\n{want_n[diff].head(3)}"
                )
    assert not failures, "\n".join(failures)


def test_oracle_keys_subset_of_queries(contract):
    queries, oracles = contract
    assert set(oracles) <= set(queries)


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = m.entry()
    df = _to_pandas(res)
    assert len(df) == 500
    assert "cluster_id" in df.columns


def test_kept_middle_lengths_positive(ray_session, tmp_path):
    """Docs with TWO separated duplicate ranges yield gap-length rows."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    import ray
    from hg_dedup_ray.pipelines.queries import kept_middle_lengths

    blk_a = "alpha " + " ".join(f"a{i}" for i in range(20)) + "."
    blk_b = "beta " + " ".join(f"b{i}" for i in range(20)) + "."
    texts = []
    for d in range(8):
        mid = f" gap{d} filler words here " * 2
        if d == 0:
            texts.append(blk_a + " intro " + blk_b)  # keep-first doc
        else:
            texts.append(f"u{d} start " + blk_a + mid + blk_b + f" end u{d}")
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts,
                       "lang": "en", "source": "s", "n_chars": [len(t) for t in texts]})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(__import__("pyarrow").Table.from_pandas(df), str(sf / "documents.parquet"))
    out = kept_middle_lengths(str(sf), minlen=64).to_pandas()
    assert len(out) > 0, "no gap rows"
    assert (out["gap_len"] > 0).all()
    assert out["n"].sum() >= 6  # docs 1..7 each contribute a gap


def test_exact_jaccard_three_verify_paths_agree(ray_session):
    """The bitset, broadcast-lexsort, and bucketed-join verify paths of
    ngram_jaccard_exact_pairs are threshold-selected variants of the same
    exact semantics — force each and compare."""
    from hg_dedup_ray.pipelines.queries import ngram_jaccard_exact_pairs

    def run(**kw):
        return (
            ngram_jaccard_exact_pairs(SF_DIR, **kw)
            .to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )

    bitset = run()
    lexsort = run(bitset_byte_limit=0)
    bucketed = run(verify_broadcast_limit=0)
    assert len(bitset) > 0
    assert lexsort.equals(bitset)
    assert bucketed.equals(bitset)


def test_exact_jaccard_emit_values_three_paths_agree(ray_session):
    """With emit_jaccard=True the three verify paths return identical
    (pair, jaccard) rows, values in [threshold, 1]."""
    from hg_dedup_ray.pipelines.queries import ngram_jaccard_exact_pairs

    def run(**kw):
        return (
            ngram_jaccard_exact_pairs(SF_DIR, emit_jaccard=True, **kw)
            .to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )

    bitset = run()
    assert len(bitset) > 0
    assert ((bitset["jaccard"] >= 0.8) & (bitset["jaccard"] <= 1.0)).all()
    assert run(bitset_byte_limit=0).equals(bitset)
    assert run(verify_broadcast_limit=0).equals(bitset)


def test_dedup_pressure_curve_matches_oracle(ray_session):
    """Counts per threshold match DuckDB bit-for-bit and are monotone
    non-increasing in tau."""
    import duckdb

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.queries import dedup_pressure_curve

    got = dedup_pressure_curve(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(ORACLE_SQL["dedup_pressure_curve"]).df()
    import numpy as np

    assert (got.to_numpy() == want.to_numpy()).all()
    assert (np.diff(got["n_pairs"].to_numpy()) <= 0).all()
    assert (np.diff(got["n_dropped_docs"].to_numpy()) <= 0).all()
    assert int(got["n_pairs"].iloc[0]) > 0  # tau_min must be non-vacuous


def test_lsh_param_sweep_consistent(ray_session):
    """The (32,4) sweep row equals lsh_recall_report's counts (same sigs,
    same fold); candidates grow with num_bands (smaller bands = looser);
    matches the DuckDB oracle."""
    import duckdb
    import numpy as np

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.queries import lsh_param_sweep, lsh_recall_report

    got = lsh_param_sweep(SF_DIR).to_pandas()
    rep = lsh_recall_report(SF_DIR).to_pandas()
    row = got[got["num_bands"] == 32].iloc[0]
    assert int(row["n_exact_pairs"]) == int(rep["n_exact_pairs"][0])
    assert int(row["n_candidate_pairs"]) == int(rep["n_candidate_pairs"][0])
    assert int(row["n_hits"]) == int(rep["n_hits"][0])
    assert (np.diff(got["n_candidate_pairs"].to_numpy()) >= 0).all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(ORACLE_SQL["lsh_param_sweep"]).df()
    assert (got.to_numpy() == want.to_numpy()).all()


def test_containment_three_verify_paths_agree(ray_session):
    """The containment metric must be identical through the bitset,
    broadcast-lexsort, and bucketed-join verify paths too."""
    from hg_dedup_ray.pipelines.queries import ngram_jaccard_exact_pairs

    def run(**kw):
        return (
            ngram_jaccard_exact_pairs(SF_DIR, metric="containment",
                                      threshold=0.6, **kw)
            .to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )

    bitset = run()
    assert len(bitset) > 0
    assert run(bitset_byte_limit=0).equals(bitset)
    assert run(verify_broadcast_limit=0).equals(bitset)


def test_containment_catches_subset_inclusion(ray_session, tmp_path):
    """A short page quoted WHOLE inside a much longer page: containment
    ~1.0 but Jaccard far below threshold — the pair class this metric
    exists for. Brute-force distinct-8-byte-shingle sets pin the values."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import (
        ngram_containment_pairs,
        ngram_jaccard_exact_pairs,
    )

    rng = np.random.default_rng(11)
    words = [f"w{i:03d}" for i in range(400)]
    short = " ".join(rng.choice(words, 12))
    long_host = (
        " ".join(rng.choice(words, 60))
        + " " + short + " "
        + " ".join(rng.choice(words, 60))
    )
    fillers = [" ".join(rng.choice(words, 40)) for _ in range(6)]
    texts = [short, long_host] + fillers
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")

    def shingles(t: str) -> set:
        return {t[i : i + 8] for i in range(len(t) - 7)}

    s0, s1 = shingles(short), shingles(long_host)
    inter = len(s0 & s1)
    assert inter / min(len(s0), len(s1)) >= 0.9  # planted inclusion
    assert inter / len(s0 | s1) < 0.6            # invisible to Jaccard

    cont = ngram_containment_pairs(str(tmp_path), threshold=0.9).to_pandas()
    got = set(zip(cont["doc_id_a"], cont["doc_id_b"]))
    assert (0, 1) in got
    jac = ngram_jaccard_exact_pairs(str(tmp_path), threshold=0.6).to_pandas()
    # an all-empty Ray dataset may drop its column schema in to_pandas
    jac_pairs = (
        set(zip(jac["doc_id_a"], jac["doc_id_b"])) if len(jac) else set()
    )
    assert (0, 1) not in jac_pairs

    # brute-force ALL pairs at the query default threshold
    expect = set()
    sh = [shingles(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter_ij = len(sh[i] & sh[j])
            if inter_ij and inter_ij / min(len(sh[i]), len(sh[j])) >= 0.6:
                expect.add((i, j))
    got06 = ngram_containment_pairs(str(tmp_path)).to_pandas()
    assert set(zip(got06["doc_id_a"], got06["doc_id_b"])) == expect


def test_normalized_exact_dedup_collapses_cosmetic_variants(
    ray_session, tmp_path
):
    """Case / punctuation / spacing variants (invisible to plain exact
    dedup) must collapse to the min-doc_id representative; genuinely
    different texts must survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import (
        exact_dedup,
        normalized_exact_dedup,
    )

    texts = [
        "Hello, World!",          # keeper of the variant group
        "hello world",            # same after normalization
        "HELLO   WORLD.",         # same after normalization
        "a different page",
        "a DIFFERENT page",       # variant of doc 3
        "something else entirely",
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    kept = sorted(
        normalized_exact_dedup(str(tmp_path)).to_pandas()["doc_id"]
    )
    assert kept == [0, 3, 5]
    # plain exact dedup keeps everything — the variants are invisible
    assert len(exact_dedup(str(tmp_path)).to_pandas()) == len(texts)


def test_containment_clusters_chain_boilerplate_family(ray_session, tmp_path):
    """A short snippet quoted whole inside TWO unrelated long hosts
    chains all three into one containment component — the boilerplate
    family grouping the Jaccard closure misses entirely."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import (
        containment_clusters,
        jaccard_dup_clusters,
    )

    rng = np.random.default_rng(21)
    words = [f"c{i:03d}" for i in range(500)]
    snippet = " ".join(rng.choice(words, 12))
    host_a = " ".join(rng.choice(words, 70)) + " " + snippet
    host_b = snippet + " " + " ".join(rng.choice(words, 70))
    other = " ".join(rng.choice(words, 50))
    texts = [snippet, host_a, host_b, other]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = containment_clusters(str(tmp_path), threshold=0.9).to_pandas()
    lab = dict(zip(got["doc_id"], got["cluster_id"]))
    assert lab.get(0) == lab.get(1) == lab.get(2) == 0
    assert 3 not in lab
    jac = jaccard_dup_clusters(str(tmp_path), threshold=0.6).to_pandas()
    # an all-empty Ray dataset may drop its column schema in to_pandas
    jac_ids = set(jac["doc_id"]) if len(jac) else set()
    assert 0 not in jac_ids  # jaccard sees no family at all


@pytest.mark.parametrize("metric,thresholds", [
    ("jaccard", (0.5, 0.7, 0.9)),
    ("containment", (0.5, 0.7, 0.9)),
])
def test_pair_cascade_randomized_brute_force(
    ray_session, tmp_path, metric, thresholds
):
    """Randomized exactness sweep: the PPJoin cascade (every filter —
    prefix, positional, pre-filters — active) must equal brute-force
    distinct-8-byte-shingle set comparison on corpora built to stress
    overlap structure: clone groups, partial prefixes, subset
    inclusions, shared boilerplate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import ngram_jaccard_exact_pairs

    rng = np.random.default_rng(hash(metric) % 2**31)
    words = [f"r{i:03d}" for i in range(80)]  # small vocab -> heavy overlap
    texts = []
    for _ in range(6):
        texts.append(" ".join(rng.choice(words, int(rng.integers(8, 50)))))
    texts.append(texts[0])                       # exact clone
    texts.append(texts[1] + " tail extra")       # superset of 1
    texts.append(" ".join(texts[2].split()[:6])) # prefix subset of 2
    boiler = " ".join(rng.choice(words, 10))
    texts.append(boiler + " " + texts[3])        # boilerplate + 3
    texts.append(boiler + " unique ending here") # boilerplate + fresh
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")

    sh = [
        {t[i : i + 8] for i in range(len(t) - 7)} for t in texts
    ]
    for t in thresholds:
        expect = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                inter = len(sh[i] & sh[j])
                if not inter:
                    continue
                denom = (
                    min(len(sh[i]), len(sh[j]))
                    if metric == "containment"
                    else len(sh[i] | sh[j])
                )
                if denom and inter / denom >= t:
                    expect.add((i, j))
        got = ngram_jaccard_exact_pairs(
            str(tmp_path), threshold=t, metric=metric
        ).to_pandas()
        pairs = (
            set(zip(got["doc_id_a"], got["doc_id_b"])) if len(got) else set()
        )
        assert pairs == expect, (metric, t, pairs ^ expect)


def test_ngram_jaccard_pairs_clone_cluster_all_pairs(ray_session, tmp_path):
    """Regression: a 4-clone cluster must yield ALL C(4,2)=6 pairs, not
    just the star around the bucket representative (the candidate
    closure found missing by the sf0.1 oracle sweep)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import ngram_jaccard_pairs

    rng = np.random.default_rng(13)
    words = [f"q{i:03d}" for i in range(300)]
    clone = " ".join(rng.choice(words, 40))
    texts = [clone, " ".join(rng.choice(words, 40)), clone,
             " ".join(rng.choice(words, 40)), clone, clone]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
    pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
    assert pairs == {(0, 2), (0, 4), (0, 5), (2, 4), (2, 5), (4, 5)}
