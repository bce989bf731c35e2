"""Winnowing detection guarantee + auto-partitioning.

The winnowing scheme (Schleimer et al., SIGMOD'03) must guarantee: any
byte-identical shared region of length >= w + k - 1 (= minlen) yields at
least one identical selected fingerprint in both documents.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from hg_dedup_ray.functions.winnow import (
    batch_fingerprints,
    doc_fingerprints,
    sliding_min,
    winnow_params,
)


def _fp(text: bytes, k: int, w: int) -> set:
    return set(doc_fingerprints(np.frombuffer(text, np.uint8), k, w).tolist())


@settings(max_examples=50, deadline=None)
@given(
    prefix_a=st.binary(min_size=0, max_size=120),
    prefix_b=st.binary(min_size=0, max_size=120),
    suffix_a=st.binary(min_size=0, max_size=120),
    suffix_b=st.binary(min_size=0, max_size=120),
    shared=st.binary(min_size=100, max_size=200),
    minlen=st.sampled_from([64, 100]),
)
def test_shared_region_shares_fingerprint(
    prefix_a, prefix_b, suffix_a, suffix_b, shared, minlen
):
    if len(shared) < minlen:
        shared = shared * ((minlen // max(len(shared), 1)) + 1)
    k, w = winnow_params(minlen, 16)
    assert w + k - 1 <= minlen
    a = prefix_a + shared + suffix_a
    b = prefix_b + shared + suffix_b
    assert _fp(a, k, w) & _fp(b, k, w), "guarantee violated"


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8),
    minlen=st.sampled_from([32, 100]),
)
def test_batch_matches_per_doc(texts, minlen):
    from hg_dedup_ray.functions.minhash import _splitmix

    k, w = winnow_params(minlen, 16)
    # decode-safe: treat as latin-1 strings for the Arrow column
    col = pa.chunked_array([pa.array([t.decode("latin-1") for t in texts])])
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    buf, offsets = string_column_bytes(col)
    fv, fc = batch_fingerprints(buf, offsets, k, w)
    pos = 0
    SALT = np.uint64(0x57494E4E4F573737)
    for d, t in enumerate(texts):
        tb = t.decode("latin-1").encode("utf-8")
        want = np.sort(
            _splitmix(doc_fingerprints(np.frombuffer(tb, np.uint8), k, w) ^ SALT)
        )
        got = np.sort(fv[pos : pos + fc[d]])
        assert np.array_equal(got, want), d
        pos += fc[d]


def test_sliding_min_matches_naive():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    for w in (1, 2, 7, 51, 499, 500, 600):
        got = sliding_min(a, w)
        if w >= a.shape[0]:
            want = np.array([a.min()], dtype=np.uint64)
        else:
            want = np.array(
                [a[i : i + w].min() for i in range(a.shape[0] - w + 1)],
                dtype=np.uint64,
            )
        assert np.array_equal(got, want), w


def test_auto_partitions(ray_session, tmp_path):
    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.sources.webpages import write_webpages
    from hg_dedup_ray.stages.extract import resolve_num_partitions

    d = str(tmp_path / "pages")
    write_webpages(d, n_docs=400, seed=3, minlen=48, n_files=4)
    ds = ray.data.read_parquet(d)
    cfg = DedupConfig(num_partitions=0, target_partition_bytes=50_000)
    n = resolve_num_partitions(ds, cfg)
    total = ds.map_batches(
        lambda b: pa.table(
            {"n": pa.array([sum(len(t.encode()) for t in b["text"].to_pylist())], pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("n")
    assert n >= total // 50_000, (n, total)
    # explicit value passes through untouched
    assert resolve_num_partitions(ds, DedupConfig(num_partitions=7)) == 7

    # end-to-end with auto partitioning
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    cfg2 = DedupConfig(
        minlen=48, num_partitions=0, target_partition_bytes=50_000, shingle_k=8
    )
    out = dedup_dataset(ds, cfg2).to_pandas()
    assert len(out) == 400
    assert out["part"].nunique() > 1
    assert out["n_removed_bytes"].sum() > 0


def test_oph_signatures_estimate_jaccard():
    """OPH + densification must estimate Jaccard about as well as k
    independent permutations (both within ~0.08 abs error at 128 perms)."""
    from hg_dedup_ray.functions.minhash import (
        batch_signatures,
        batch_signatures_oph,
        estimate_jaccard,
        shingle_hashes,
    )

    rng = np.random.default_rng(7)
    for trial in range(5):
        base = rng.integers(32, 127, size=1500, dtype=np.uint8)
        near = base.copy()
        e = rng.integers(0, 1300)
        near[e : e + 200] = rng.integers(32, 127, size=200, dtype=np.uint8)
        sa_ = set(np.unique(shingle_hashes(base, 16)).tolist())
        sb_ = set(np.unique(shingle_hashes(near, 16)).tolist())
        true_j = len(sa_ & sb_) / len(sa_ | sb_)
        arr = np.concatenate([base, near])
        off = np.array([0, 1500, 3000])
        for fn in (batch_signatures, batch_signatures_oph):
            sig = fn(arr, off, 16, 128, 42)
            est = estimate_jaccard(sig[0], sig[1])
            assert abs(est - true_j) < 0.12, (fn.__name__, est, true_j)

    # identical docs -> estimate exactly 1; disjoint -> near 0
    a = rng.integers(32, 127, size=800, dtype=np.uint8)
    b = rng.integers(32, 127, size=800, dtype=np.uint8)
    arr = np.concatenate([a, a, b])
    off = np.array([0, 800, 1600, 2400])
    from hg_dedup_ray.functions.minhash import batch_signatures_oph as oph, estimate_jaccard as est_

    sig = oph(arr, off, 16, 128, 1)
    assert est_(sig[0], sig[1]) == 1.0
    assert est_(sig[0], sig[2]) < 0.1
    # short + empty docs produce full, deterministic signatures
    so = np.array([0, 3, 3, 20])
    sb = rng.integers(32, 127, size=20, dtype=np.uint8)
    s1 = oph(sb, so, 16, 128, 1)
    s2 = oph(sb, so, 16, 128, 1)
    assert np.array_equal(s1, s2)
    assert not (s1 == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1).any()
