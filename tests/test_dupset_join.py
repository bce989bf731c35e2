"""Bucketed distributed dup-set path (stages/dupset_join.py): must match
the broadcast path's output exactly, with NO driver-side text collection.
"""

import numpy as np
import pandas as pd
import pytest
import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

MINLEN = 32


def _cfg(extra=None, **kw):
    return DedupConfig(
        minlen=MINLEN, num_partitions=4, shingle_k=8, jaccard_threshold=0.2,
        extra=dict(extra or {}), **kw,
    )


@pytest.fixture(scope="module")
def ds(ray_session, webpages_small):
    out_dir, paths, tags = webpages_small
    return ray.data.read_parquet(sorted(paths)), tags


def _norm(df):
    df = df.sort_values("doc_seq").reset_index(drop=True)
    rr = [
        [(int(r["start"]), int(r["end"])) for r in row]
        for row in df["sa_remove_ranges"]
    ]
    return df, rr


def test_bucketed_matches_broadcast(ds, monkeypatch):
    ds, tags = ds
    want, want_rr = _norm(dedup_dataset(ds, _cfg()).to_pandas())

    # the bucketed path must NEVER collect texts on the driver
    import hg_dedup_ray.pipelines.sa_dedup as sd

    def _boom(*a, **k):
        raise AssertionError("driver-side text collection in bucketed mode")

    monkeypatch.setattr(sd, "_collect_texts", _boom)
    got, got_rr = _norm(
        dedup_dataset(ds, _cfg(extra={"dupset_strategy": "bucketed"})).to_pandas()
    )
    assert (got["n_removed_bytes"].to_numpy() == want["n_removed_bytes"].to_numpy()).all()
    assert (got["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()
    assert got_rr == want_rr


def test_auto_routes_to_bucketed_above_limit(ds, monkeypatch):
    """Default config ships dupset_strategy='auto': above the member-row
    limit it must take the bucketed scale path WITHOUT any strategy flag
    and never collect text on the driver. The limit override stands in
    for web-scale dup density on the small fixture."""
    ds, tags = ds
    want, want_rr = _norm(dedup_dataset(ds, _cfg()).to_pandas())

    import hg_dedup_ray.pipelines.sa_dedup as sd

    def _boom(*a, **k):
        raise AssertionError("driver-side text collection on the auto scale path")

    monkeypatch.setattr(sd, "_collect_texts", _boom)
    monkeypatch.setattr(sd, "_collect_texts_by_seq", _boom)
    got, got_rr = _norm(
        dedup_dataset(ds, _cfg(extra={"dupset_broadcast_limit": 0})).to_pandas()
    )
    assert (got["n_removed_bytes"].to_numpy() == want["n_removed_bytes"].to_numpy()).all()
    assert (got["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()
    assert got_rr == want_rr


def test_bucketed_unfiltered_join_matches(ds):
    """Force the no-prefilter branch (dupset_filter_limit=0): the full
    bucketed text shuffle — the true 100 TB fallback — must still match."""
    ds, tags = ds
    want, want_rr = _norm(dedup_dataset(ds, _cfg()).to_pandas())
    got, got_rr = _norm(
        dedup_dataset(
            ds,
            _cfg(extra={"dupset_strategy": "bucketed", "dupset_filter_limit": 0}),
        ).to_pandas()
    )
    assert (got["n_removed_bytes"].to_numpy() == want["n_removed_bytes"].to_numpy()).all()
    assert (got["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()
    assert got_rr == want_rr


def test_bucketed_cross_partition_and_clusters(ds):
    ds, tags = ds
    out = dedup_dataset(ds, _cfg(extra={"dupset_strategy": "bucketed"})).to_pandas()
    out = out.sort_values("doc_seq").reset_index(drop=True)
    a, b = tags["cross_partition"]
    assert len(out["sa_remove_ranges"][max(a, b)]) > 0
    g = tags["exact_dup"]
    cids = {int(out["cluster_id"][d]) for d in g}
    assert cids == {min(g)}


def test_bucketed_no_duplicates_negative_control(ray_session):
    texts = [" ".join(f"u{d}w{i}" for i in range(30)) for d in range(90)]
    dset = ray.data.from_pandas(pd.DataFrame({"doc_id": range(90), "text": texts}))
    cfg = DedupConfig(
        minlen=48, num_partitions=3, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
        extra={"dupset_strategy": "bucketed"},
    )
    out = dedup_dataset(dset, cfg).to_pandas()
    assert (out["n_removed_bytes"] == 0).all()
    assert out["cluster_id"].nunique() == 90


def test_coarse_candidate_path_matches_driver_path(ds):
    """VERDICT r05 stress finding: above driver_key_limit the candidate
    bucket build must take the coarse-bucket distributed path (one
    map_groups call per cbucket, segmented internally — never one per
    hot key) and produce output identical to the driver streaming
    path."""
    ds, tags = ds
    want, want_rr = _norm(dedup_dataset(ds, _cfg()).to_pandas())
    got, got_rr = _norm(
        dedup_dataset(ds, _cfg(extra={"driver_key_limit": 1})).to_pandas()
    )
    assert (
        got["n_removed_bytes"].to_numpy() == want["n_removed_bytes"].to_numpy()
    ).all()
    assert (got["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()
    assert got_rr == want_rr
    assert want["n_removed_bytes"].sum() > 0
