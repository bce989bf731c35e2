"""Resumable-run tests (SURVEY.md §5(e), north_rule checkpoint contract).

Run 1 completes; we then delete some partition manifests + outputs
(simulating a crash that lost those partitions) and rerun: the rerun must
skip completed partitions, recompute only the missing ones, reuse the
cross-partition candidate checkpoint, and produce byte-identical output
to a fresh run.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.resumable import run_dedup_resumable
from hg_dedup_ray.sources.webpages import write_webpages
from hg_dedup_ray.state import checkpoint as ck


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_pages")
    write_webpages(str(d), n_docs=300, seed=11, minlen=48, n_files=6)
    return str(d)


def _cfg(ckpt_dir: str) -> DedupConfig:
    return DedupConfig(
        minlen=48, num_partitions=4, shingle_k=8, checkpoint_dir=ckpt_dir
    )


def _read_out(output_dir: str) -> pd.DataFrame:
    df = pq.read_table(output_dir).to_pandas()
    drop = [c for c in ("part",) if c in df.columns]
    return (
        df.drop(columns=drop)
        .sort_values("doc_seq")
        .reset_index(drop=True)
        .astype({"n_removed_bytes": "int64"})
    )


def test_resume_skips_completed_and_matches_fresh(pages_dir, tmp_path):
    out1 = str(tmp_path / "out_fresh")
    s1 = run_dedup_resumable(pages_dir, out1, _cfg(str(tmp_path / "ck1")))
    assert s1["parts_total"] == 4
    assert sorted(s1["parts_processed_this_run"]) == [0, 1, 2, 3]
    assert s1["parts_skipped_this_run"] == []

    # rerun with intact checkpoints: everything skipped, nothing recomputed
    s1b = run_dedup_resumable(pages_dir, out1, _cfg(str(tmp_path / "ck1")))
    assert s1b["parts_processed_this_run"] == []
    assert s1b["parts_total"] == 4

    # crash simulation: lose partitions 1 and 3
    ck1 = str(tmp_path / "ck1")
    for p in (1, 3):
        os.remove(ck.part_manifest_path(ck1, p))
        os.remove(os.path.join(out1, f"part={p}", "data.parquet"))
    s2 = run_dedup_resumable(pages_dir, out1, _cfg(ck1))
    assert sorted(s2["parts_processed_this_run"]) == [1, 3]
    assert sorted(s2["parts_skipped_this_run"]) == [0, 2]

    # candidate-stage checkpoint was reused (manifest untouched -> done)
    with open(os.path.join(ck1, "candidates", "manifest.json")) as f:
        assert json.load(f)["status"] == "done"

    # resumed output == a fresh run in a clean directory
    out2 = str(tmp_path / "out_clean")
    run_dedup_resumable(pages_dir, out2, _cfg(str(tmp_path / "ck2")))
    a, b = _read_out(out1), _read_out(out2)
    pd.testing.assert_frame_equal(a, b)
    assert a["n_removed_bytes"].sum() > 0  # fixtures contain duplicates


def test_manifest_lineage_fields(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckd = str(tmp_path / "ck")
    cfg = _cfg(ckd)
    run_dedup_resumable(pages_dir, out, cfg)
    manifests = ck.load_completed_parts(ckd, cfg)
    assert set(manifests) == {0, 1, 2, 3}
    for p, m in manifests.items():
        assert m["cfg_hash"] == ck.cfg_fingerprint(cfg)
        assert m["n_docs"] > 0
        assert m["corpus_bytes"] > m["n_docs"]  # sentinel + text bytes
        assert len(m["content_hash"]) == 16
        assert m["input_files"], "lineage must record input files"
        assert os.path.exists(m["output_file"])
        assert m["doc_seq_min"] <= m["doc_seq_max"]

    # doc_seq ranges must tile [0, n_docs) contiguously (order-contiguous
    # partitioning is what makes keep-first == global doc order)
    spans = sorted(
        (m["doc_seq_min"], m["doc_seq_max"]) for m in manifests.values()
    )
    assert spans[0][0] == 0
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 == a1 + 1


def test_cfg_change_invalidates_checkpoints(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckd = str(tmp_path / "ck")
    run_dedup_resumable(pages_dir, out, _cfg(ckd))
    cfg2 = DedupConfig(
        minlen=64, num_partitions=4, shingle_k=8, checkpoint_dir=ckd
    )
    assert ck.load_completed_parts(ckd, cfg2) == {}
    assert ck.load_candidates(ckd, cfg2) is None


def test_changed_input_invalidates_checkpoints(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckd = str(tmp_path / "ck")
    cfg = _cfg(ckd)
    s1 = run_dedup_resumable(pages_dir, out, cfg)
    assert sorted(s1["parts_processed_this_run"]) == [0, 1, 2, 3]

    # grow one input file (append a page) -> ALL partitions stale
    import pyarrow.parquet as pq
    import pyarrow as pa

    victim = sorted(os.listdir(pages_dir))[0]
    src2 = str(tmp_path / "pages2")
    import shutil as _sh

    _sh.copytree(pages_dir, src2)
    p = os.path.join(src2, victim)
    t = pq.read_table(p)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), p)

    s2 = run_dedup_resumable(src2, out, cfg)
    assert sorted(s2["parts_processed_this_run"]) == [0, 1, 2, 3], s2
    assert s2["parts_skipped_this_run"] == []


def test_checkpoint_manifest_report(ray_session):
    """The lineage/metrics surfacing query: one row per partition,
    doc counts summing to the corpus, non-empty lineage fingerprints,
    all partitions complete."""
    from hg_dedup_ray.pipelines.queries import checkpoint_manifest_report

    t = checkpoint_manifest_report("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 4  # cfg num_partitions
    assert t["n_docs"].sum() == 500
    assert (t["status"] == "done").all()
    assert (t["content_hash"].str.len() > 0).all()
    assert (t["doc_seq_min"] <= t["doc_seq_max"]).all()
    # order-contiguous partitioning: ranges must not overlap
    s = t.sort_values("part")
    assert (s["doc_seq_min"].values[1:] > s["doc_seq_max"].values[:-1]).all()


def test_run_metrics_summary_conservation(ray_session):
    """The one-row rollup conserves what the per-partition manifests
    report, and bytes_indexed equals the fixture's total text bytes."""
    import duckdb

    from hg_dedup_ray.pipelines.queries import (
        checkpoint_manifest_report,
        run_metrics_summary,
    )

    sf = "/root/testdata/sf0.001"
    s = run_metrics_summary(sf).to_pandas().iloc[0]
    parts = checkpoint_manifest_report(sf).to_pandas()
    assert s["n_partitions"] == len(parts) == 4
    assert s["n_docs"] == parts["n_docs"].sum() == 500
    assert s["bytes_indexed"] == parts["corpus_bytes"].sum()
    assert s["n_removed_bytes"] == parts["n_removed_bytes"].sum()
    want = duckdb.sql(
        f"SELECT sum(strlen(text)) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    # the indexed corpus adds ONE document-boundary sentinel byte per doc
    assert s["bytes_indexed"] == want + s["n_docs"]
    assert s["n_cross_spans"] >= 0 and s["n_clustered_urls"] > 0


def test_kill_after_k_partitions_resumes_at_sf01(tmp_path):
    """VERDICT r04 #6: a run KILLED mid-way (crash injection: partitions
    >= k die before any work) must leave durable in-task manifests for
    the finished partitions; the rerun skips exactly those, recomputes
    the rest, and the resumed output is byte-identical to a fresh run —
    at sf0.1 block counts (5000 docs, 8 partitions)."""
    import glob

    sf_docs = "/root/testdata/sf0.1/documents.parquet"
    ckd = str(tmp_path / "ck")
    cfg = DedupConfig(
        minlen=48, num_partitions=8, shingle_k=8,
        id_col="doc_id", seq_col="doc_id", text_col="text",
        checkpoint_dir=ckd,
    )
    out1 = str(tmp_path / "out_killed")

    os.makedirs(ckd, exist_ok=True)
    flag = os.path.join(ckd, "FAIL_PARTS_GE")
    with open(flag, "w") as fh:
        fh.write("3")
    with pytest.raises(Exception):
        run_dedup_resumable(sf_docs, out1, cfg)
    os.remove(flag)

    # durable manifests exist for SOME proper subset of partitions
    survived = sorted(
        ck.load_completed_parts(str(tmp_path / "ck"), cfg).keys()
    )
    assert survived, "in-task manifests must survive the crash"
    assert len(survived) < 8
    assert all(p < 3 for p in survived)

    s2 = run_dedup_resumable(sf_docs, out1, cfg)
    assert s2["parts_skipped_this_run"] == survived
    assert sorted(s2["parts_processed_this_run"]) == sorted(
        set(range(8)) - set(survived)
    )
    assert s2["parts_total"] == 8

    # resumed output == fresh run in a clean directory, value-identical
    out2 = str(tmp_path / "out_clean")
    cfg2 = DedupConfig(
        minlen=48, num_partitions=8, shingle_k=8,
        id_col="doc_id", seq_col="doc_id", text_col="text",
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    run_dedup_resumable(sf_docs, out2, cfg2)

    def _df(d):
        df = pq.read_table(sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))).to_pandas()
        return df.sort_values("doc_seq").reset_index(drop=True)

    a, b = _df(out1), _df(out2)
    pd.testing.assert_frame_equal(a, b)
    assert a["n_removed_bytes"].sum() > 0
