"""Unit tests: run detection / keep-first / coalescing vs the naive oracle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hg_dedup_ray.functions.corpus import build_corpus
from hg_dedup_ray.functions.scan import find_remove_ranges
from hg_dedup_ray.functions.suffix_array import build_suffix_array
from hg_dedup_ray.oracle import oracle_remove_ranges


def vectorized_ranges(texts: list[bytes], minlen: int) -> list[tuple[int, int]]:
    corpus, _, _ = build_corpus(texts)
    sa = build_suffix_array(corpus)
    return [tuple(r) for r in find_remove_ranges(corpus, sa, minlen)]


@pytest.mark.parametrize(
    "texts,minlen",
    [
        ([b"hello world", b"hello world"], 4),
        ([b"hello world", b"hello world"], 11),          # whole doc duplicated
        ([b"abcabcabc"], 3),                             # within-doc tandem
        ([b"xxINTRO-COMMON-BLOCKyy", b"zzINTRO-COMMON-BLOCKww"], 8),
        ([b"short", b"short"], 6),                       # minlen > doc: no removal
        ([b"a" * 50], 10),                               # self-repeat single doc
        ([b"", b"", b"abc"], 2),                         # empty docs
        ([b"commonpart", b"commonpart", b"commonpart"], 5),  # 3-way
    ],
)
def test_matches_oracle_handpicked(texts, minlen):
    assert vectorized_ranges(texts, minlen) == oracle_remove_ranges(texts, minlen)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(97, 101), min_size=0, max_size=60).map(bytes),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_matches_oracle_hypothesis(texts, minlen):
    # tiny alphabet (a-e) => dense repeats, stresses run grouping + coalesce
    assert vectorized_ranges(texts, minlen) == oracle_remove_ranges(texts, minlen)


def test_keep_first_semantics():
    # duplicated block in doc0 and doc2 -> removal only in doc2's span
    texts = [b"AAAA-unique-block-BBBB", b"nothing shared here!", b"xx AAAA-unique-block-BBBB yy"]
    ranges = vectorized_ranges(texts, 8)
    corpus, starts, ends = build_corpus(texts)
    assert len(ranges) == 1
    s, e = ranges[0]
    assert starts[2] <= s and e <= ends[2]


def test_sentinel_never_in_window():
    # identical docs: window spanning the sentinel between them must not match
    texts = [b"ab", b"ab"]
    assert vectorized_ranges(texts, 2) == oracle_remove_ranges(texts, 2)


# --- hash-group kernel (SA-free) ------------------------------------------

def test_hashed_kernel_identical_on_fixture():
    """find_remove_ranges_hashed must be byte-identical to the SA path on
    the webpages corpus at several minlens."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.functions.corpus import build_corpus
    from hg_dedup_ray.functions.scan import (
        find_remove_ranges,
        find_remove_ranges_hashed,
    )
    from hg_dedup_ray.functions.suffix_array import build_suffix_array
    from hg_dedup_ray.sources.webpages import generate_webpages

    table, _ = generate_webpages(n_docs=300, seed=11, minlen=48)
    texts = [t.encode() for t in table["text"].to_pylist()]
    corpus, _, _ = build_corpus(texts)
    sa = build_suffix_array(corpus)
    for minlen in (16, 48, 100):
        want = find_remove_ranges(corpus, sa, minlen)
        got = find_remove_ranges_hashed(corpus, minlen)
        assert np.array_equal(got, want), minlen
    assert find_remove_ranges(corpus, sa, 48).shape[0] > 0


def test_hashed_kernel_identical_random():
    """Randomized equivalence incl. tiny alphabets (max hash-collision
    pressure), sentinel-adjacent windows, and forced duplicates."""
    from hg_dedup_ray.functions.corpus import build_corpus
    from hg_dedup_ray.functions.scan import (
        find_remove_ranges,
        find_remove_ranges_hashed,
    )
    from hg_dedup_ray.functions.suffix_array import build_suffix_array

    rng = np.random.default_rng(7)
    for trial in range(60):
        n_docs = int(rng.integers(2, 25))
        docs = [
            bytes(rng.integers(97, 97 + int(rng.integers(2, 5)),
                               rng.integers(3, 300)).astype(np.uint8))
            for _ in range(n_docs)
        ]
        docs += [docs[0], docs[-1]]
        corpus, _, _ = build_corpus(docs)
        minlen = int(rng.integers(2, 24))
        want = find_remove_ranges(corpus, build_suffix_array(corpus), minlen)
        got = find_remove_ranges_hashed(corpus, minlen)
        assert np.array_equal(got, want), (trial, minlen)


def test_hashed_kernel_token_dtypes():
    """Element-generic: u16/u32 token corpora give identical results."""
    from hg_dedup_ray.functions.scan import (
        find_remove_ranges,
        find_remove_ranges_hashed,
        sentinel_value,
    )
    from hg_dedup_ray.functions.suffix_array import build_suffix_array

    rng = np.random.default_rng(9)
    for dt in (np.uint16, np.uint32):
        sent = sentinel_value(dt)
        docs = [rng.integers(0, 50, rng.integers(5, 120)).astype(dt)
                for _ in range(12)]
        docs += [docs[0], docs[3]]
        parts = []
        for d in docs:
            parts.append(np.array([sent], dt))
            parts.append(d)
        corpus = np.concatenate(parts)
        for minlen in (3, 8):
            want = find_remove_ranges(corpus, build_suffix_array(corpus), minlen)
            got = find_remove_ranges_hashed(corpus, minlen)
            assert np.array_equal(got, want), (str(dt), minlen)


def test_hashed_kernel_edge_cases():
    from hg_dedup_ray.functions.scan import find_remove_ranges_hashed

    assert find_remove_ranges_hashed(np.empty(0, np.uint8), 4).shape == (0, 2)
    assert find_remove_ranges_hashed(np.frombuffer(b"ab", np.uint8), 4).shape == (0, 2)
    # all-sentinel corpus: every window blocked
    c = np.full(50, 0xFF, np.uint8)
    assert find_remove_ranges_hashed(c, 4).shape == (0, 2)


def test_find_dup_ptrs_hashed_identical():
    """find_dup_ptrs_hashed must reproduce the SA-based diagnostic scan
    exactly (ptrs AND kept flags)."""
    from hg_dedup_ray.functions.corpus import build_corpus
    from hg_dedup_ray.functions.scan import find_dup_ptrs, find_dup_ptrs_hashed
    from hg_dedup_ray.functions.suffix_array import build_suffix_array
    from hg_dedup_ray.sources.webpages import generate_webpages

    table, _ = generate_webpages(n_docs=200, seed=5, minlen=48)
    corpus, _, _ = build_corpus([t.encode() for t in table["text"].to_pylist()])
    sa = build_suffix_array(corpus)
    for minlen in (24, 48):
        p1, k1 = find_dup_ptrs(corpus, sa, minlen)
        p2, k2 = find_dup_ptrs_hashed(corpus, minlen)
        assert np.array_equal(p1, p2) and np.array_equal(k1, k2), minlen
    assert p1.size > 0

    rng = np.random.default_rng(13)
    for trial in range(30):
        docs = [bytes(rng.integers(97, 100, rng.integers(4, 150)).astype(np.uint8))
                for _ in range(int(rng.integers(2, 15)))]
        docs += [docs[0]]
        c, _, _ = build_corpus(docs)
        ml = int(rng.integers(3, 16))
        p1, k1 = find_dup_ptrs(c, build_suffix_array(c), ml)
        p2, k2 = find_dup_ptrs_hashed(c, ml)
        assert np.array_equal(p1, p2) and np.array_equal(k1, k2), trial


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(97, 101), min_size=0, max_size=60).map(bytes),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_hashed_kernel_matches_oracle_hypothesis(texts, minlen):
    from hg_dedup_ray.functions.scan import find_remove_ranges_hashed

    corpus, _, _ = build_corpus(texts)
    got = [tuple(r) for r in find_remove_ranges_hashed(corpus, minlen)]
    assert got == oracle_remove_ranges(texts, minlen)
