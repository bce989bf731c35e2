"""Parity against the REAL reference engine.

Builds the reference's own index format (tokenized/offset + suffix array
via its shipped ``rust_indexing`` binary), compiles a 10-line driver
around the unmodified reference header (cpp_engine_dedup.h), runs the
reference's ``find_remove_ranges`` scan, and asserts:

1. our single-partition scan produces BYTE-IDENTICAL remove ranges;
2. the full multi-partition Ray pipeline reproduces the reference's
   removed-byte set with recall >= 0.99 and soundness >= 0.99 (the
   north_rule's dup-pair recall criterion, measured against actual
   reference output rather than a reimplementation).

Skipped when the toolchain (g++ / rust_indexing) is unavailable.
"""

import math
import os
import shutil
import subprocess

import numpy as np
import pyarrow.parquet as pq
import pytest

from hg_dedup_ray.functions.corpus import build_corpus
from hg_dedup_ray.functions.scan import find_remove_ranges
from hg_dedup_ray.functions.suffix_array import build_suffix_array

REF = "/root/reference"
RUST = os.path.join(REF, "rust_indexing")

DRIVER_SRC = """
#include "cpp_engine_dedup.h"
int main(int argc, char **argv) {
    if (argc != 3) { return 1; }
    EngineDedup<U8> engine({string(argv[1])}, false);
    engine.find_remove_ranges((size_t)stoi(argv[2]));
    return 0;
}
"""

toolchain = pytest.mark.skipif(
    shutil.which("g++") is None or not os.access(RUST, os.X_OK),
    reason="reference toolchain unavailable",
)


# 64 = toy config (reference workflow_toy.sh:18 uses 32-class values);
# 500 = the production scan config (reference aws_workflow.sh:2)
@pytest.fixture(scope="module", params=[64, 500])
def ref_setup(request, tmp_path_factory):
    """(minlen, corpus, starts, ends, texts, reference_ranges)."""
    from hg_dedup_ray.sources.webpages import write_webpages

    minlen = request.param
    work = tmp_path_factory.mktemp(f"refparity{minlen}")
    pages = str(work / "pages")
    write_webpages(pages, n_docs=400, seed=13, minlen=minlen, n_files=5)
    texts = [
        t
        for p in sorted(os.listdir(pages))
        for t in pq.read_table(os.path.join(pages, p))["text"].to_pylist()
    ]
    corpus, starts, ends = build_corpus([t.encode() for t in texts])

    # reference index layout (reference indexing_v6_sharded.py:46-56,152-154)
    idx = str(work / "index0")
    os.makedirs(idx)
    with open(os.path.join(idx, "tokenized"), "wb") as f:
        f.write(corpus.tobytes())
    with open(os.path.join(idx, "offset"), "wb") as f:
        f.write((starts - 1).astype(np.uint64).tobytes())
    size = int(corpus.shape[0])
    ratio = math.ceil(math.log2(size) / 8)
    sa_dir = os.path.join(idx, "sa")
    os.makedirs(sa_dir)
    subprocess.run(
        [RUST, "make-part", "--data-file", os.path.join(idx, "tokenized"),
         "--parts-dir", sa_dir, "--start-byte", "0", "--end-byte", str(size),
         "--ratio", str(ratio), "--token-width", "1"],
        check=True, capture_output=True,
    )
    (part,) = os.listdir(sa_dir)
    os.replace(os.path.join(sa_dir, part), os.path.join(idx, "table"))

    src = work / "ref_scan_main.cpp"
    src.write_text(DRIVER_SRC)
    binp = str(work / "ref_scan")
    subprocess.run(
        ["g++", "-O2", "-std=c++20", "-pthread", f"-I{REF}", str(src), "-o", binp],
        check=True, capture_output=True,
    )
    subprocess.run([binp, idx, str(minlen)], check=True, capture_output=True)
    rr = np.fromfile(
        os.path.join(idx, f"dedup_minlen{minlen}", "remove_ranges"),
        dtype=np.uint64,
    ).reshape(-1, 2).astype(np.int64)
    return minlen, corpus, starts, ends, texts, rr


@toolchain
def test_scan_byte_identical_to_reference(ref_setup):
    minlen, corpus, starts, ends, texts, ref_ranges = ref_setup
    ours = find_remove_ranges(corpus, build_suffix_array(corpus), minlen)
    assert ref_ranges.shape[0] > 0
    assert np.array_equal(ours, ref_ranges)


@toolchain
@pytest.mark.parametrize("dupset_strategy", ["broadcast", "bucketed"])
def test_pipeline_recall_vs_reference(ref_setup, ray_session, dupset_strategy):
    import pandas as pd

    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    minlen, corpus, starts, ends, texts, ref_ranges = ref_setup
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    cfg = DedupConfig(
        minlen=minlen, num_partitions=4, shingle_k=16,
        seq_col="doc_id", id_col="doc_id", text_col="text",
        extra={"dupset_strategy": dupset_strategy},
    )
    out = (
        dedup_dataset(ray.data.from_pandas(df), cfg)
        .to_pandas()
        .sort_values("doc_seq")
        .reset_index(drop=True)
    )

    N = corpus.shape[0]
    ref_mask = np.zeros(N, dtype=bool)
    for s, e in ref_ranges:
        ref_mask[s:e] = True
    our_mask = np.zeros(N, dtype=bool)
    for d, rr in enumerate(out["sa_remove_ranges"]):
        for r in rr:
            our_mask[starts[d] + r["start"] : starts[d] + r["end"]] = True

    # NOTE: the reference clips ranges to UTF-8 boundaries only at
    # writeback; our sa_remove_ranges are already clipped. The fixture is
    # ASCII-dominant so the difference is at most a few bytes per range.
    inter = int((ref_mask & our_mask).sum())
    recall = inter / max(int(ref_mask.sum()), 1)
    soundness = inter / max(int(our_mask.sum()), 1)
    assert recall >= 0.99, recall
    assert soundness >= 0.99, soundness


SHARDED_DRIVER_SRC = """
#include "cpp_engine_dedup.h"
int main(int argc, char **argv) {
    // usage: ref_scan_sharded <min_len> <num_threads> <num_batches> <dir>...
    if (argc < 5) { return 1; }
    vector<string> dirs;
    for (int i = 4; i < argc; i++) dirs.push_back(argv[i]);
    EngineDedup<U8> engine(dirs, false);
    engine.find_remove_ranges_parallel_sharded(
        (size_t)stoi(argv[1]), (size_t)stoi(argv[2]), false, (size_t)stoi(argv[3]));
    return 0;
}
"""


@toolchain
def test_pipeline_vs_reference_sharded_mode(ref_setup, ray_session, tmp_path):
    """The reference's PRODUCTION path (multi-shard pseudo-merge,
    cpp_engine_dedup.h:502-799) with shard boundaries equal to our
    partition boundaries, compared against our full Ray pipeline."""
    import pandas as pd

    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    minlen, corpus, starts, ends, texts, _ = ref_setup
    n = len(texts)
    P = 4
    bounds = [(n * p // P, n * (p + 1) // P) for p in range(P)]  # == extract's map

    dirs = []
    shard_starts = []
    for p, (lo, hi) in enumerate(bounds):
        c, st, en = build_corpus([t.encode() for t in texts[lo:hi]])
        idx = str(tmp_path / f"shard{p}")
        os.makedirs(idx)
        with open(os.path.join(idx, "tokenized"), "wb") as f:
            f.write(c.tobytes())
        with open(os.path.join(idx, "offset"), "wb") as f:
            f.write((st - 1).astype(np.uint64).tobytes())
        sa_dir = os.path.join(idx, "sa")
        os.makedirs(sa_dir)
        subprocess.run(
            [RUST, "make-part", "--data-file", os.path.join(idx, "tokenized"),
             "--parts-dir", sa_dir, "--start-byte", "0",
             "--end-byte", str(int(c.shape[0])),
             "--ratio", str(math.ceil(math.log2(int(c.shape[0])) / 8)),
             "--token-width", "1"],
            check=True, capture_output=True,
        )
        (part,) = os.listdir(sa_dir)
        os.replace(os.path.join(sa_dir, part), os.path.join(idx, "table"))
        dirs.append(idx)
        shard_starts.append(st)

    src = tmp_path / "ref_scan_sharded.cpp"
    src.write_text(SHARDED_DRIVER_SRC)
    binp = str(tmp_path / "ref_scan_sharded")
    subprocess.run(
        ["g++", "-O2", "-std=c++20", "-pthread", f"-I{REF}", str(src), "-o", binp],
        check=True, capture_output=True,
    )
    subprocess.run(
        [binp, str(minlen), "2", "1"] + dirs, check=True, capture_output=True
    )

    # reference global removed-byte mask in GLOBAL corpus coordinates
    N = corpus.shape[0]
    ref_mask = np.zeros(N, dtype=bool)
    for p, (lo, hi) in enumerate(bounds):
        rr = np.fromfile(
            os.path.join(dirs[p], f"dedup_minlen{minlen}", "remove_ranges"),
            dtype=np.uint64,
        ).reshape(-1, 2).astype(np.int64)
        st = shard_starts[p]
        for s, e in rr:
            # shard-local offset -> (doc, in-doc) -> global
            d = int(np.searchsorted(st, s, side="right") - 1)
            g = starts[lo + d] + (s - st[d])
            ref_mask[g : g + (e - s)] = True

    df = pd.DataFrame({"doc_id": np.arange(n), "text": texts})
    cfg = DedupConfig(
        minlen=minlen, num_partitions=P, shingle_k=16,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    out = (
        dedup_dataset(ray.data.from_pandas(df), cfg)
        .to_pandas().sort_values("doc_seq").reset_index(drop=True)
    )
    our_mask = np.zeros(N, dtype=bool)
    for d, rr in enumerate(out["sa_remove_ranges"]):
        for r in rr:
            our_mask[starts[d] + r["start"] : starts[d] + r["end"]] = True

    inter = int((ref_mask & our_mask).sum())
    recall = inter / max(int(ref_mask.sum()), 1)
    soundness = inter / max(int(our_mask.sum()), 1)
    assert int(ref_mask.sum()) > 0
    assert recall >= 0.99, recall
    assert soundness >= 0.99, soundness
