"""Tests for UTF-8 clip, range->doc scatter, excision (reference
write_back_to_jsonl_sharded.py:58-101 semantics)."""

import numpy as np
import pytest

from hg_dedup_ray.functions.clip import (
    clip_doc_ranges,
    excise,
    kept_in_the_middle_lengths,
    scatter_ranges_to_docs,
    utf8_clip,
)


def _clip(text: str, s: int, e: int):
    b = text.encode("utf-8")
    return utf8_clip(np.frombuffer(b, dtype=np.uint8), s, e)


def test_clip_ascii_noop():
    assert _clip("hello world", 2, 7) == (2, 7)


def test_clip_start_mid_codepoint():
    # "é" = C3 A9 at bytes 0-1; s=1 lands on the continuation byte
    assert _clip("éabc", 1, 4) == (2, 4)


def test_clip_end_mid_codepoint():
    # e=1 points AT the continuation byte -> retreat to 0
    assert _clip("éabc", 0, 1) == (0, 0)


def test_clip_end_equals_len_exempt():
    # e == len(doc) is exempt from retreating even if last char multibyte
    text = "abé"
    b = text.encode("utf-8")
    assert _clip(text, 0, len(b)) == (0, len(b))


def test_clip_multibyte_cjk():
    text = "日本語"  # 3 bytes each
    assert _clip(text, 1, 9) == (3, 9)
    assert _clip(text, 3, 4) == (3, 3)


def test_excise_and_gaps():
    doc = b"0123456789"
    ranges = [(2, 4), (6, 8)]
    assert excise(doc, ranges) == b"014589"
    assert kept_in_the_middle_lengths(len(doc), ranges) == [2]
    assert excise(doc, []) == doc
    assert excise(doc, [(0, 10)]) == b""


def test_scatter_ranges():
    # two docs: text spans [1,6) and [7,12)
    doc_starts = np.array([1, 7])
    doc_ends = np.array([6, 12])
    ranges = np.array([[2, 5], [7, 9], [10, 12]])
    np.testing.assert_array_equal(
        scatter_ranges_to_docs(ranges, doc_starts, doc_ends), [0, 1, 1]
    )


def test_scatter_rejects_cross_doc():
    doc_starts = np.array([1, 7])
    doc_ends = np.array([6, 12])
    with pytest.raises(AssertionError):
        scatter_ranges_to_docs(np.array([[5, 8]]), doc_starts, doc_ends)


def test_clip_doc_ranges_round_trip():
    text = "aaéébb"
    b = text.encode("utf-8")
    out = clip_doc_ranges(b, [(3, 5)])  # starts mid-é, ends mid-second-é
    (s, e) = out[0]
    # decoded slices must all be valid utf-8
    b[:s].decode("utf-8")
    b[s:e].decode("utf-8")
    b[e:].decode("utf-8")
