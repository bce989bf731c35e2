"""Writeback kernels: range->doc scatter, UTF-8 boundary clip, excision.

Replicates reference write_back_to_jsonl_sharded.py:58-101 exactly:

- ranges never cross document boundaries (a run window contains no
  sentinel, reference cpp_engine_dedup.h:233-235) — asserted here too;
- range offsets are rebased to doc-relative byte offsets;
- UTF-8 clip (reference :75-83): advance ``s`` while the byte AT ``s`` is a
  continuation byte (0x80..0xBF); retreat ``e`` while the byte AT ``e`` is a
  continuation byte — UNLESS ``e == len(doc)`` (exclusive end already on a
  boundary);
- "remove" mode concatenates the kept slices from the zip
  ``[(0,0)] + remove + [(len,len)]`` (reference :85-94).
"""

from __future__ import annotations

import numpy as np


def scatter_ranges_to_docs(
    ranges: np.ndarray, doc_starts: np.ndarray, doc_ends: np.ndarray
) -> np.ndarray:
    """Assign each corpus-offset range to its containing doc.

    ``doc_starts[d]``/``doc_ends[d]`` delimit doc d's text bytes in the
    partition corpus (text span, sentinel excluded). Returns int64 array of
    doc indices, one per range. Sorted merge join on interval containment
    (reference write_back_to_jsonl_sharded.py:70-73) via searchsorted.
    """
    if ranges.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    doc_ix = np.searchsorted(doc_starts, ranges[:, 0], side="right") - 1
    assert (doc_ix >= 0).all()
    assert (ranges[:, 0] >= doc_starts[doc_ix]).all(), "range starts before doc"
    assert (ranges[:, 1] <= doc_ends[doc_ix]).all(), "range crosses doc boundary"
    return doc_ix


def utf8_clip(doc_bytes: bytes | np.ndarray, s: int, e: int) -> tuple[int, int]:
    """Clip [s, e) to whole UTF-8 characters, reference semantics
    (write_back_to_jsonl_sharded.py:75-83)."""
    b = doc_bytes
    n = len(b)
    while s < n and 0x80 <= b[s] < 0xC0:
        s += 1
    if e != n:
        while e >= 0 and 0x80 <= b[e] < 0xC0:
            e -= 1
    assert s <= e, (s, e)
    return s, e


def clip_doc_ranges(
    doc_bytes: bytes, ranges: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """UTF-8-clip every doc-relative range, preserving order."""
    arr = np.frombuffer(doc_bytes, dtype=np.uint8)
    return [utf8_clip(arr, int(s), int(e)) for s, e in ranges]


def excise(doc_bytes: bytes, remove_ranges: list[tuple[int, int]]) -> bytes:
    """Concatenate kept slices around the (clipped) remove ranges
    (reference write_back_to_jsonl_sharded.py:85-94)."""
    n = len(doc_bytes)
    keep = [
        (r0[1], r1[0])
        for r0, r1 in zip([(0, 0)] + list(remove_ranges), list(remove_ranges) + [(n, n)])
    ]
    return b"".join(doc_bytes[s:e] for s, e in keep)


def kept_in_the_middle_lengths(
    doc_len: int, remove_ranges: list[tuple[int, int]]
) -> list[int]:
    """QA stat: lengths of kept gaps strictly between two removed ranges
    (reference write_back_to_jsonl_sharded.py:91-92)."""
    keep = [
        (r0[1], r1[0])
        for r0, r1 in zip(
            [(0, 0)] + list(remove_ranges), list(remove_ranges) + [(doc_len, doc_len)]
        )
    ]
    return [e - s for s, e in keep[1:-1]]
