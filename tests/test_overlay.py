"""ANSI overlay + annotated-output checker (reference find_dup_docs.cpp
:18-69 and verify_zst_alldressed.py:1-49)."""

import os

import numpy as np
import pytest
import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
from hg_dedup_ray.tools.overlay import (
    annotate_report,
    coverage_mask,
    dup_doc_ansi,
    red_spans,
    remove_ranges_ansi,
    strip_ansi,
    write_dup_doc_overlays,
    write_remove_overlays,
)


def test_coverage_mask_is_window_union():
    """Must equal the reference's pos_dropped sweep (find_dup_docs.cpp:
    25-33): union of [ptr, ptr+minlen) windows."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(5, 60))
        ptrs = np.unique(rng.integers(0, n, size=rng.integers(0, 8)))
        minlen = int(rng.integers(1, 10))
        want = np.zeros(n, bool)
        for p in ptrs:
            want[p : p + minlen] = True
        got = coverage_mask(n, ptrs, minlen)
        assert (got == want).all()


def test_remove_ranges_ansi_roundtrip():
    text = "hello wonderful world of duplicated text".encode()
    ranges = [(6, 15), (25, 35)]
    s = remove_ranges_ansi(text, ranges)
    assert strip_ansi(s).encode() == text
    assert red_spans(s) == ranges


def test_remove_ranges_ansi_empty_and_full():
    t = b"abcdef"
    assert remove_ranges_ansi(t, []) == "abcdef"
    full = remove_ranges_ansi(t, [(0, 6)])
    assert red_spans(full) == [(0, 6)]
    assert strip_ansi(full) == "abcdef"


def test_dup_doc_ansi_colors():
    """red = dropped-only, yellow = overlap, green = kept-only."""
    text = b"0123456789abcdefghij"
    ptrs = np.array([2, 6, 14], np.int64)
    kept = np.array([False, True, True])
    s = dup_doc_ansi(text, ptrs, kept, minlen=4)
    # dropped covers [2,6), kept covers [6,10)+[14,18) -> no overlap
    assert "\x1b[31m2345" in s
    assert "\x1b[32m6789" in s
    assert strip_ansi(s).encode() == text
    # overlapping windows go yellow
    kept2 = np.array([False, True, False])
    s2 = dup_doc_ansi(text, np.array([2, 4, 14]), kept2, minlen=4)
    assert "\x1b[33m" in s2  # [4,6) dropped∩kept
    assert strip_ansi(s2).encode() == text


@pytest.fixture(scope="module")
def annotated(ray_session, webpages_small):
    out_dir, paths, tags = webpages_small
    ds = ray.data.read_parquet(sorted(paths))
    cfg = DedupConfig(minlen=32, num_partitions=1, mode="remove",
                      shingle_k=8, jaccard_threshold=0.2)
    return dedup_dataset(ds, cfg).materialize(), cfg, sorted(paths)


def test_annotate_report_ratios(annotated):
    ds, cfg, _ = annotated
    rep = annotate_report(ds)
    assert rep["num_lines"] == 120
    assert 0 < rep["num_diff_lines"] <= 120
    assert 0 < rep["ratio_removed_bytes"] < 1
    # remove-mode consistency: excise(text, ranges) == text_deduped
    assert rep["inconsistent_rows"] == 0


def test_write_remove_overlays_roundtrip(annotated, tmp_path):
    ds, cfg, _ = annotated
    out = str(tmp_path / "ansi")
    n = write_remove_overlays(ds, out)
    assert n == annotate_report(ds)["num_diff_lines"]
    files = os.listdir(out)
    assert len(files) == n
    # spot-check: red spans in the file == the doc's sa_remove_ranges
    rows = {r["doc_seq"]: r for r in ds.take_all()}
    for fname in sorted(files)[:5]:
        seq = int(fname[3:-5])
        s = open(os.path.join(out, fname), encoding="utf-8").read()
        want = [(r["start"], r["end"]) for r in rows[seq]["sa_remove_ranges"]]
        assert red_spans(s) == want
        assert strip_ansi(s) == rows[seq]["text"]


def test_write_dup_doc_overlays(annotated, tmp_path):
    ds, cfg, paths = annotated
    from hg_dedup_ray.pipelines.sa_dedup import extract_docs

    docs = extract_docs(ray.data.read_parquet(paths), cfg)
    out = str(tmp_path / "dupdocs")
    n = write_dup_doc_overlays(docs, cfg, out)
    assert n > 0
    files = os.listdir(out)
    assert len(files) == n
    s = open(os.path.join(out, sorted(files)[0]), encoding="utf-8").read()
    # every dup doc file has at least one colored region and decodes clean
    assert "\x1b[" in s and strip_ansi(s)
