"""End-to-end pipeline conformance vs the naive oracle.

- single partition: per-doc clipped ranges must match the oracle EXACTLY
  (the reference's own strongest check is sharded-vs-unsharded equality,
  reference workflow_pileval.sh:17-45);
- multi partition: dup-pair recall >= 0.99 vs oracle pairs (LSH routing);
- remove-mode excision consistent with annotate ranges.
"""

import numpy as np
import pytest
import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.oracle import oracle_doc_ranges, oracle_dup_pairs
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
from hg_dedup_ray.sources.webpages import write_webpages

MINLEN = 32


@pytest.fixture(scope="module")
def pipeline_input(ray_session, webpages_small):
    out_dir, paths, tags = webpages_small
    ds = ray.data.read_parquet(sorted(paths))
    import pyarrow.parquet as pq

    texts = [
        s.encode("utf-8")
        for p in sorted(paths)
        for s in pq.read_table(p)["text"].to_pylist()
    ]
    return ds, texts, tags


def run_pipeline(ds, num_partitions, mode="annotate"):
    cfg = DedupConfig(minlen=MINLEN, num_partitions=num_partitions, mode=mode,
                      shingle_k=8, jaccard_threshold=0.2)
    out = dedup_dataset(ds, cfg)
    rows = sorted(out.take_all(), key=lambda r: r["doc_seq"])
    return rows, cfg


def ranges_of(rows):
    return [
        [(int(r["start"]), int(r["end"])) for r in row["sa_remove_ranges"]]
        for row in rows
    ]


def test_single_partition_matches_oracle_exactly(pipeline_input):
    ds, texts, _ = pipeline_input
    rows, _ = run_pipeline(ds, num_partitions=1)
    assert len(rows) == len(texts)
    got = ranges_of(rows)
    want = oracle_doc_ranges(texts, MINLEN)
    assert got == want


def test_multi_partition_recall(pipeline_input):
    ds, texts, tags = pipeline_input
    rows, _ = run_pipeline(ds, num_partitions=4)
    got = ranges_of(rows)
    want = oracle_doc_ranges(texts, MINLEN)

    # all within-partition spans are exact; global recall on removed bytes
    want_bytes = sum(e - s for rr in want for s, e in rr)
    got_bytes = sum(e - s for rr in got for s, e in rr)
    assert got_bytes >= 0.99 * want_bytes, (got_bytes, want_bytes)

    # soundness: nothing removed that the oracle keeps
    for d, (g, w) in enumerate(zip(got, want)):
        covered = np.zeros(len(texts[d]), dtype=bool)
        for s, e in w:
            covered[s:e] = True
        for s, e in g:
            assert covered[s:e].all(), (d, (s, e), w)

    # dup-pair recall vs oracle pairs: a pair counts as found if the later
    # doc has any removed range (substring path) or shares a cluster
    pairs = oracle_dup_pairs(texts, MINLEN)
    clusters = {r["doc_seq"]: r["cluster_id"] for r in rows}
    found = 0
    for a, b in pairs:
        later = max(a, b)
        if got[later] or clusters[a] == clusters[b]:
            found += 1
    assert found >= 0.99 * len(pairs), (found, len(pairs))


def test_cross_partition_pattern_found(pipeline_input):
    ds, texts, tags = pipeline_input
    rows, _ = run_pipeline(ds, num_partitions=4)
    got = ranges_of(rows)
    a, b = tags["cross_partition"]
    assert got[max(a, b)], "cross-partition duplicate span not found"


def test_exact_dups_clustered(pipeline_input):
    ds, texts, tags = pipeline_input
    rows, _ = run_pipeline(ds, num_partitions=4)
    g = tags["exact_dup"]
    cids = {rows[d]["cluster_id"] for d in g}
    assert len(cids) == 1, cids
    assert cids == {min(g)}


def test_remove_mode_consistent_with_annotate(pipeline_input):
    ds, texts, _ = pipeline_input
    rows, _ = run_pipeline(ds, num_partitions=1, mode="remove")
    for row in rows:
        t = row["text"].encode("utf-8")
        rr = [(int(r["start"]), int(r["end"])) for r in row["sa_remove_ranges"]]
        keep = []
        prev = 0
        for s, e in rr:
            keep.append(t[prev:s])
            prev = e
        keep.append(t[prev:])
        assert b"".join(keep).decode("utf-8") == row["text_deduped"]


def test_single_doc_and_tiny_inputs(ray_session):
    import pandas as pd

    import ray as _ray
    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    cfg = DedupConfig(
        minlen=32, num_partitions=2, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    one = _ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["just one doc"]}))
    out = dedup_dataset(one, cfg).to_pandas()
    assert len(out) == 1 and out["n_removed_bytes"].iloc[0] == 0

    empty_text = _ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "", "x"]})
    )
    out = dedup_dataset(empty_text, cfg).to_pandas()
    assert len(out) == 3
    assert (out["n_removed_bytes"] == 0).all()  # nothing >= minlen


def test_pruned_scan_strategy_matches_sort(ray_session, pipeline_input):
    """Range-partitioned block-pruned scan (the default; no sort shuffle)
    must produce exactly the groupby sort path's output."""
    ds, texts, tags = pipeline_input
    import pandas as pd

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    cfg_sort = DedupConfig(
        minlen=MINLEN, num_partitions=4, shingle_k=8,
        jaccard_threshold=0.2,
        extra={"scan_strategy": "groupby"},
    )
    rows_sort = sorted(
        dedup_dataset(ds, cfg_sort).take_all(), key=lambda r: r["doc_seq"]
    )
    cfg = DedupConfig(
        minlen=MINLEN, num_partitions=4, shingle_k=8,
        jaccard_threshold=0.2,
        extra={"scan_strategy": "pruned"},
    )
    out = (
        dedup_dataset(ds, cfg).to_pandas().sort_values("doc_seq").reset_index(drop=True)
    )
    want = (
        pd.DataFrame(rows_sort).sort_values("doc_seq").reset_index(drop=True)
    )
    assert (out["n_removed_bytes"].to_numpy() == want["n_removed_bytes"].to_numpy()).all()
    assert (out["cluster_id"].to_numpy() == want["cluster_id"].to_numpy()).all()

    def norm(col):
        return [
            [(int(r["start"]), int(r["end"])) for r in rr] for rr in col
        ]

    assert norm(out["sa_remove_ranges"]) == norm(want["sa_remove_ranges"])


def test_no_duplicates_negative_control(ray_session):
    """A corpus with no >=minlen repeats: zero ranges, every doc its own
    cluster, both scan strategies."""
    import pandas as pd

    import ray as _ray
    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    texts = [
        " ".join(f"u{d}w{i}" for i in range(30)) for d in range(120)
    ]
    ds = _ray.data.from_pandas(pd.DataFrame({"doc_id": range(120), "text": texts}))
    for extra in ({"scan_strategy": "groupby"}, {"scan_strategy": "pruned"}):
        cfg = DedupConfig(
            minlen=48, num_partitions=3, shingle_k=8,
            seq_col="doc_id", id_col="doc_id", text_col="text",
            extra=dict(extra),
        )
        out = dedup_dataset(ds, cfg).to_pandas()
        assert (out["n_removed_bytes"] == 0).all()
        assert out["cluster_id"].nunique() == 120


def test_run_dedup_writes_partitioned_parquet(ray_session, webpages_small, tmp_path):
    import pyarrow.parquet as pq

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import run_dedup

    out_dir, paths, tags = webpages_small
    cfg = DedupConfig(minlen=MINLEN, num_partitions=3, shingle_k=8,
                      jaccard_threshold=0.2)
    dest = str(tmp_path / "out")
    run_dedup(sorted(paths), dest, cfg, columns=["url", "doc_seq", "text"])
    import os as _os

    parts = sorted(d for d in _os.listdir(dest) if d.startswith("part="))
    assert len(parts) == 3, parts
    t = pq.read_table(dest)
    n_in = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert len(t) == n_in
    assert "sa_remove_ranges" in t.column_names
