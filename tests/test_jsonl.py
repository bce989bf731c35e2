"""JSONL source/sink + reference-workflow tests (reference S1/S2/S4 +
workflow_toy.sh journey), and the D5/D6 diagnostic kernels."""

import gzip
import json
import os

import numpy as np
import pytest

from hg_dedup_ray.functions.corpus import build_corpus
from hg_dedup_ray.functions.scan import (
    dup_ptrs_to_docs,
    find_dup_ptrs,
    find_remove_ranges,
)
from hg_dedup_ray.functions.suffix_array import build_suffix_array
from hg_dedup_ray.sources.jsonl import discover_files, read_jsonl, write_jsonl


# long shared paragraph with NO internal repetition (so the first
# occurrence carries no self-duplicate ranges)
DUP = "shared paragraph: " + " ".join(f"token{i}" for i in range(30)) + "."


def _make_tree(root):
    docs = {
        "a/part0.jsonl": [
            {"text": "unique text one " * 8, "site": "x"},
            {"text": DUP, "site": "x"},
        ],
        "crawl=2024/part1.jsonl.gz": [
            {"text": DUP, "site": "y", "n": 7},
            {"text": "another unique body " * 8, "site": "y"},
        ],
        "b/part2.jsonl": [{"text": DUP + "tail " * 10, "site": "z"}],
    }
    for rel, rows in docs.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        payload = "".join(json.dumps(r) + "\n" for r in rows).encode()
        if rel.endswith(".gz"):
            payload = gzip.compress(payload)
        with open(p, "wb") as f:
            f.write(payload)
    return docs


def test_discovery_order_strips_crawl(tmp_path):
    _make_tree(str(tmp_path))
    files = discover_files(str(tmp_path))
    rels = [os.path.relpath(f, tmp_path) for f in files]
    # 'crawl=' stripped for sorting: "2024/..." < "a/..." < "b/..."
    assert rels == ["crawl=2024/part1.jsonl.gz", "a/part0.jsonl", "b/part2.jsonl"]


def test_roundtrip_preserves_metadata(ray_session, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    docs = _make_tree(str(src))
    ds = read_jsonl(str(src))
    rows = ds.take_all()
    assert len(rows) == 5
    # doc_seq monotone in (file order, linenum)
    seqs = [r["doc_seq"] for r in sorted(rows, key=lambda r: r["doc_seq"])]
    assert seqs == sorted(seqs)
    written = write_jsonl(ds, str(out))
    assert sorted(written) == sorted(docs.keys())
    for rel, want_rows in docs.items():
        p = os.path.join(out, rel)
        raw = open(p, "rb").read()
        if rel.endswith(".gz"):
            raw = gzip.decompress(raw)
        got = [json.loads(l) for l in raw.decode().splitlines()]
        assert [g["text"] for g in got] == [w["text"] for w in want_rows]
        for g, w in zip(got, want_rows):
            for k, v in w.items():
                assert g[k] == v, (rel, k)


def test_jsonl_dedup_annotate_and_remove(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.jsonl_workflow import run_jsonl_dedup

    src = tmp_path / "src"
    _make_tree(str(src))
    out_a = tmp_path / "annot"
    run_jsonl_dedup(str(src), str(out_a), minlen=64, num_partitions=2)
    # the DUP paragraph appears in 3 docs; first (crawl=2024 sorts first)
    # is kept, later occurrences get sa_remove_ranges
    ann = {}
    for rel in ("crawl=2024/part1.jsonl.gz", "a/part0.jsonl", "b/part2.jsonl"):
        raw = open(os.path.join(out_a, rel), "rb").read()
        if rel.endswith(".gz"):
            raw = gzip.decompress(raw)
        for ln, line in enumerate(raw.decode().splitlines()):
            ann[(rel, ln)] = json.loads(line)
    assert ann[("crawl=2024/part1.jsonl.gz", 0)]["sa_remove_ranges"] == []
    assert ann[("a/part0.jsonl", 1)]["sa_remove_ranges"], "dup not annotated"
    assert ann[("b/part2.jsonl", 0)]["sa_remove_ranges"], "dup not annotated"
    # metadata survived the pipeline
    assert ann[("crawl=2024/part1.jsonl.gz", 0)]["n"] == 7

    out_r = tmp_path / "removed"
    run_jsonl_dedup(str(src), str(out_r), minlen=64, num_partitions=2, mode="remove")
    raw = open(os.path.join(out_r, "a/part0.jsonl"), "rb").read().decode()
    removed_doc = json.loads(raw.splitlines()[1])
    r = ann[("a/part0.jsonl", 1)]
    want_len = len(r["text"].encode()) - sum(e - s for s, e in r["sa_remove_ranges"])
    assert len(removed_doc["text"].encode()) == want_len
    assert "sa_remove_ranges" not in removed_doc


def test_find_dup_ptrs_superset_of_remove(ray_session=None):
    texts = [
        b"the quick brown fox jumps over the lazy dog repeatedly today",
        b"the quick brown fox jumps over the lazy dog repeatedly today",
        b"completely different content here with no repeats at all!!",
    ]
    corpus, starts, ends = build_corpus(texts)
    sa = build_suffix_array(corpus)
    minlen = 32
    ptrs, kept = find_dup_ptrs(corpus, sa, minlen)
    assert ptrs.size > 0
    ranges = find_remove_ranges(corpus, sa, minlen)
    dropped = np.sort(ptrs[~kept])
    # dropped ptrs coalesce exactly into the remove ranges
    from hg_dedup_ray.functions.scan import coalesce_ptrs_to_ranges

    assert np.array_equal(coalesce_ptrs_to_ranges(dropped, minlen), ranges)
    # every kept ptr is the minimum of its duplicate content
    assert kept.any()
    d_ix, n_kept, n_drop = dup_ptrs_to_docs(ptrs, kept, starts, ends)
    assert set(d_ix.tolist()) == {0, 1}  # doc 2 clean
    assert (n_kept + n_drop > 0).all()


def test_zst_roundtrip(ray_session, tmp_path):
    """.jsonl.zst read + write via pyarrow's built-in zstd codec."""
    import pyarrow as pa

    src = tmp_path / "src"
    os.makedirs(src)
    rows = [{"text": "zstd doc " + "x" * 50, "k": 1}, {"text": "another", "k": 2}]
    payload = "".join(json.dumps(r) + "\n" for r in rows).encode()
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as s:
        s.write(payload)
    (src / "a.jsonl.zst").write_bytes(sink.getvalue().to_pybytes())

    ds = read_jsonl(str(src))
    got = sorted(ds.take_all(), key=lambda r: r["linenum"])
    assert [g["text"] for g in got] == [r["text"] for r in rows]

    out = tmp_path / "out"
    write_jsonl(ds, str(out))
    raw = (out / "a.jsonl.zst").read_bytes()
    assert raw[:4] == b"\x28\xb5\x2f\xfd"
    with pa.input_stream(pa.BufferReader(raw), compression="zstd") as s:
        back = [json.loads(l) for l in s.read().decode().splitlines()]
    assert [b["text"] for b in back] == [r["text"] for r in rows]
    assert back[0]["k"] == 1
