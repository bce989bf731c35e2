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
