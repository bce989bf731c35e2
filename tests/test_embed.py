"""Multi-probe IVF ANN: exactness at n_cells=1 and recall monotonicity."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
K = 5


@pytest.fixture(scope="module")
def brute(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.array(t["embedding"].to_pylist(), np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1
    mn = m / norm
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    return ids, sims


def _run(n_cells, nprobe):
    from hg_dedup_ray.pipelines.queries import ann_ivf_topk

    return ann_ivf_topk(SF, n_cells=n_cells, nprobe=nprobe).to_pandas()


def _recall(df, ids, sims):
    rec = []
    for i in range(len(ids)):
        true_top = set(ids[np.argsort(-sims[i])[:K]])
        got = set(df[df.query_id == ids[i]].neighbor_id)
        rec.append(len(true_top & got) / K)
    return float(np.mean(rec))


def test_ivf_single_cell_is_exact_brute_force(brute):
    """n_cells=1 must reproduce the brute-force top-k EXACTLY, ranks and
    deterministic (-sim, id) tie-break included."""
    ids, sims = brute
    df = _run(1, 1).sort_values(["query_id", "rank"]).reset_index(drop=True)
    exact = []
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:K]
        exact.extend((ids[i], ids[j], r + 1) for r, j in enumerate(order))
    want = (
        pd.DataFrame(exact, columns=["query_id", "neighbor_id", "rank"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert df.equals(want.astype(df.dtypes.to_dict()))


def test_ivf_multiprobe_recall_monotone(brute):
    """Recall must rise with nprobe and clear a floor at nprobe=2."""
    ids, sims = brute
    r1 = _recall(_run(8, 1), ids, sims)
    r2 = _recall(_run(8, 2), ids, sims)
    assert r2 > r1
    assert r2 >= 0.45, r2
    # every query answered, k rows each
    df = _run(8, 2)
    assert len(df) == len(ids) * K


def _pq_recall(df, ids, sims, n_queries):
    rec = []
    for i in range(len(ids)):
        if ids[i] >= n_queries:
            continue
        true_top = set(ids[np.argsort(-sims[i])[:K]])
        got = set(df[df.query_id == ids[i]].neighbor_id)
        rec.append(len(true_top & got) / K)
    return float(np.mean(rec))


def test_ivfpq_refine_recall_and_determinism(brute):
    """IVF-PQ+refine: recall floor vs brute force, full answer shape,
    bit-identical across runs (seeded training, argmin ties break low)."""
    from hg_dedup_ray.pipelines.queries import ANN_NUM_QUERIES, ann_ivfpq_topk

    ids, sims = brute
    df = ann_ivfpq_topk(SF).to_pandas()
    assert _pq_recall(df, ids, sims, ANN_NUM_QUERIES) >= 0.55
    assert len(df) == ANN_NUM_QUERIES * K
    df2 = ann_ivfpq_topk(SF).to_pandas()
    a = df.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = df2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivfpq_refine_beats_adc_only(brute):
    """refine=1 degenerates to raw ADC ordering (shortlist == ANN_K);
    the full refine stage must strictly improve recall on this fixture
    (measured: ~0.26 ADC-only vs ~0.72 refined)."""
    from hg_dedup_ray.pipelines.queries import ANN_NUM_QUERIES, ann_ivfpq_topk

    ids, sims = brute
    adc = _pq_recall(
        ann_ivfpq_topk(SF, refine=1).to_pandas(), ids, sims, ANN_NUM_QUERIES
    )
    ref = _pq_recall(
        ann_ivfpq_topk(SF).to_pandas(), ids, sims, ANN_NUM_QUERIES
    )
    assert ref > adc


def test_ivfpq_exhaustive_equals_brute_force(brute):
    """nprobe == n_cells + all-covering refine => the IVF-PQ pipeline is
    EXACT: neighbor sets equal brute force for every query (the oracle
    check runs the same equality vs DuckDB; this pins it vs numpy)."""
    from hg_dedup_ray.pipelines.queries import ANN_NUM_QUERIES, ann_ivfpq_exhaustive

    ids, sims = brute
    df = ann_ivfpq_exhaustive(SF).to_pandas()
    assert len(df) == ANN_NUM_QUERIES * K
    for q in range(ANN_NUM_QUERIES):
        true_top = set(ids[np.argsort(-sims[q])[:K]])
        got = set(df[df.query_id == q].neighbor_id)
        assert got == true_top, q


def test_ivfpq_recall_report_matches_direct_computation(brute):
    """The report's integer n_hits must equal the brute-force overlap
    computed independently, and recall = n_hits/k exactly."""
    from hg_dedup_ray.pipelines.queries import (
        ANN_NUM_QUERIES,
        ann_ivfpq_recall_report,
        ann_ivfpq_topk,
    )

    ids, sims = brute
    rep = ann_ivfpq_recall_report(SF).to_pandas().set_index("query_id")
    assert len(rep) == ANN_NUM_QUERIES
    approx = ann_ivfpq_topk(SF).to_pandas()
    for q in range(ANN_NUM_QUERIES):
        true_top = set(ids[np.argsort(-sims[q])[:K]])
        got = set(approx[approx.query_id == q].neighbor_id)
        assert int(rep.loc[q, "n_hits"]) == len(true_top & got)
        assert rep.loc[q, "recall"] == len(true_top & got) / K
        assert int(rep.loc[q, "k"]) == K
    # quality floor on the fixture (same floor test_ivfpq_refine pins)
    assert rep["recall"].mean() >= 0.55
