"""Skew handling: a hot boilerplate paragraph shared by hundreds of docs
(the north_rule's 'hot shingle' case) must stay bounded — buckets are
chunked with the keep-first representative — while every non-first
occurrence is still marked for removal."""

import numpy as np
import pandas as pd
import pytest

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
from hg_dedup_ray.stages.candidates import chunk_members


BOILER = "hot boilerplate: " + " ".join(f"b{i}" for i in range(25)) + " end."


def test_chunk_members_properties():
    order = np.arange(1000)
    chunks = chunk_members(order, 64)
    assert all(len(c) <= 64 for c in chunks)
    assert all(c[0] == 0 for c in chunks), "every chunk carries keep-first rep"
    covered = np.unique(np.concatenate(chunks))
    assert np.array_equal(covered, order)
    # small buckets pass through untouched
    assert len(chunk_members(np.arange(10), 64)) == 1


@pytest.mark.parametrize("n_docs", [300])
def test_hot_boilerplate_bounded_and_complete(ray_session, n_docs):
    rng = np.random.default_rng(5)
    texts = []
    for d in range(n_docs):
        unique = " ".join(
            f"w{d}_{i}{rng.integers(0, 9)}" for i in range(12)
        )
        # boilerplate on every doc, unique filler around it
        texts.append(f"{unique} {BOILER} u{d} tail.")
    df = pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})
    ds = ray.data.from_pandas(df)
    cfg = DedupConfig(
        minlen=len(BOILER.encode()),
        num_partitions=4,
        shingle_k=8,
        max_band_bucket=16,  # force chunking of the hot bucket
        seq_col="doc_id",
        id_col="doc_id",
        text_col="text",
    )
    out = dedup_dataset(ds, cfg).to_pandas().sort_values("doc_seq")
    removed = out["n_removed_bytes"].to_numpy()
    # first doc keeps its copy; EVERY later doc has the boilerplate marked
    assert removed[0] == 0
    misses = int((removed[1:] == 0).sum())
    assert misses == 0, f"{misses}/{n_docs - 1} hot-boilerplate dups missed"
