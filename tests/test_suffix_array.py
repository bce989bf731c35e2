"""Unit tests: suffix-array builder vs brute force + sortedness property."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hg_dedup_ray.functions.suffix_array import (
    build_suffix_array,
    build_suffix_array_naive,
    verify_sa_correctness,
)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"banana",
        b"mississippi",
        b"aaaaaaaaaa",
        b"abababab",
        b"\xff" + "héllo wörld".encode() + b"\xff" + "héllo wörld".encode(),
        bytes(range(256)),
    ],
)
def test_matches_naive(data):
    got = build_suffix_array(data)
    want = build_suffix_array_naive(data)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_matches_naive_hypothesis(data):
    np.testing.assert_array_equal(build_suffix_array(data), build_suffix_array_naive(data))


def test_sortedness_property_large():
    rng = np.random.default_rng(0)
    # heavy duplication: tile a small alphabet chunk
    chunk = rng.integers(97, 105, size=512).astype(np.uint8).tobytes()
    data = chunk * 40 + rng.integers(0, 256, size=2000).astype(np.uint8).tobytes()
    arr = np.frombuffer(data, dtype=np.uint8)
    sa = build_suffix_array(arr)
    assert len(sa) == len(arr)
    assert len(np.unique(sa)) == len(arr)
    assert verify_sa_correctness(arr, sa, hack=64)


def test_nul_run_corpora_fully_sorted():
    """Corpora ending in 0x00 runs (or all-NUL) must still yield a true
    lexicographic SA: residual equal-rank segments are tie-broken by
    suffix length (shorter = prefix = first)."""
    import numpy as np

    from hg_dedup_ray.functions.suffix_array import (
        build_suffix_array,
        build_suffix_array_naive,
        verify_sa_correctness,
    )

    cases = [
        b"\x00\x00\x00",
        b"ab\x00\x00\x00",
        b"aaaa" + b"\x00" * 20,
        bytes(np.random.default_rng(0).integers(0, 3, 300, dtype=np.uint8)),
    ]
    for c in cases:
        got = build_suffix_array(c)
        want = build_suffix_array_naive(c)
        assert (got == want).all(), c[:16]
        assert verify_sa_correctness(np.frombuffer(c, np.uint8), got)
