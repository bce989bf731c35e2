"""Pairwise duplicate-span confirmation for cross-partition candidates.

Given two documents (earlier doc A by global order, later doc B), find the
byte ranges of B that the reference's GLOBAL scan would remove because an
equal >=minlen window exists in A (or earlier in B itself). Implemented by
running the exact partition-local kernels on the 2-doc corpus
``\\xff A \\xff B`` — the same semantics as reference
cpp_engine_dedup.h:215-302 restricted to two documents. Returned ranges are
B-relative and unclipped.

Soundness: every range emitted here is also removed by the reference's
global scan (a window equal to an earlier occurrence); completeness across
partitions is bounded by LSH routing recall (the >=0.99 criterion).
"""

from __future__ import annotations

import numpy as np

from hg_dedup_ray.functions.corpus import build_corpus
from hg_dedup_ray.functions.scan import find_remove_ranges
from hg_dedup_ray.functions.suffix_array import build_suffix_array


def pair_remove_ranges(
    text_a: bytes, text_b: bytes, minlen: int
) -> np.ndarray:
    """Ranges of B (doc-relative, unclipped, shape (R,2)) removed when A
    precedes B in global document order."""
    corpus, starts, ends = build_corpus([text_a, text_b])
    sa = build_suffix_array(corpus)
    ranges = find_remove_ranges(corpus, sa, minlen)
    if ranges.shape[0] == 0:
        return ranges
    b_start, b_end = int(starts[1]), int(ends[1])
    in_b = (ranges[:, 0] >= b_start) & (ranges[:, 1] <= b_end)
    out = ranges[in_b].copy()
    out -= b_start
    return out


def union_ranges(range_lists: list[np.ndarray]) -> np.ndarray:
    """Union of [start,end) interval sets: merge overlapping OR touching.

    Within-partition ranges are already coalesced with gaps >= 1 byte
    (reference break rule `diff > minlen`), so a union with nothing else
    returns them unchanged — the single-partition path stays byte-exact.
    """
    nonempty = [r for r in range_lists if r.size]
    if not nonempty:
        return np.empty((0, 2), dtype=np.int64)
    allr = np.concatenate(nonempty)
    order = np.lexsort((allr[:, 1], allr[:, 0]))
    allr = allr[order]
    # running max of ends; new group when start > max(previous ends)
    run_end = np.maximum.accumulate(allr[:, 1])
    new_grp = np.ones(len(allr), dtype=bool)
    new_grp[1:] = allr[1:, 0] > run_end[:-1]
    grp = np.cumsum(new_grp) - 1
    starts = allr[new_grp, 0]
    ends = np.maximum.reduceat(allr[:, 1], np.flatnonzero(new_grp))
    return np.stack([starts, ends], axis=1).astype(np.int64)
