"""Naive single-process oracle of the reference's global dedup semantics.

Deliberately written as a direct, slow transcription of the reference
algorithm (reference cpp_engine_dedup.h:215-302 `find_remove_ranges` and
write_back_to_jsonl_sharded.py:58-101) using plain Python — structurally
independent from the vectorized kernels in ``functions/`` so tests can
cross-check the two. Only usable at test scale (O(n^2 log n) suffix sort).
"""

from __future__ import annotations

import numpy as np

SENT = 0xFF


def _suffix_sort(corpus: bytes, fast: bool) -> list[int]:
    if fast:
        # scan/coalesce logic stays naive-python; the SA builder itself is
        # independently property-tested vs brute force in test_suffix_array
        from hg_dedup_ray.functions.suffix_array import build_suffix_array

        return build_suffix_array(corpus).tolist()
    return sorted(range(len(corpus)), key=lambda i: corpus[i:])


def oracle_remove_ranges(
    texts: list[bytes], minlen: int, fast_sa: bool = True
) -> list[tuple[int, int]]:
    """Global remove ranges (corpus byte offsets) for docs in doc_seq order."""
    corpus = b"\xff" + b"\xff".join(texts) if texts else b""
    n = len(corpus)
    sa = _suffix_sort(corpus, fast_sa)

    remove_ptrs: list[int] = []
    run: list[int] = [sa[0]] if n else []
    for rank in range(1, n):
        p1, p2 = run[-1], sa[rank]
        window_ok = (
            p1 + minlen <= n
            and p2 + minlen <= n
            and corpus[p1 : p1 + minlen] == corpus[p2 : p2 + minlen]
            and SENT not in corpus[p1 : p1 + minlen]
        )
        if window_ok:
            run.append(p2)
            continue
        if len(run) > 1:
            keep = min(run)
            remove_ptrs.extend(p for p in run if p != keep)
        run = [p2]
    if len(run) > 1:
        keep = min(run)
        remove_ptrs.extend(p for p in run if p != keep)
    remove_ptrs.sort()

    ranges: list[list[int]] = []
    for p in remove_ptrs:
        if ranges and ranges[-1][1] >= p:
            ranges[-1][1] = p + minlen
        else:
            ranges.append([p, p + minlen])
    return [(s, e) for s, e in ranges]


def oracle_doc_ranges(
    texts: list[bytes], minlen: int, clip: bool = True, fast_sa: bool = True
) -> list[list[tuple[int, int]]]:
    """Per-doc (doc-relative, optionally UTF-8-clipped) remove ranges."""
    ranges = oracle_remove_ranges(texts, minlen, fast_sa)
    # doc text spans
    starts, pos = [], 0
    for t in texts:
        pos += 1  # sentinel
        starts.append(pos)
        pos += len(t)
    out: list[list[tuple[int, int]]] = [[] for _ in texts]
    ri = 0
    for d, t in enumerate(texts):
        ds_, de_ = starts[d], starts[d] + len(t)
        while ri < len(ranges) and ranges[ri][0] < de_:
            s, e = ranges[ri]
            assert s >= ds_ and e <= de_, "range crosses doc boundary"
            s -= ds_
            e -= ds_
            if clip:
                while s < len(t) and 0x80 <= t[s] < 0xC0:
                    s += 1
                if e != len(t):
                    while e >= 0 and 0x80 <= t[e] < 0xC0:
                        e -= 1
                assert s <= e
            out[d].append((int(s), int(e)))
            ri += 1
    assert ri == len(ranges)
    return out


def oracle_dup_pairs(
    texts: list[bytes], minlen: int, fast_sa: bool = True
) -> set[tuple[int, int]]:
    """Set of (kept_doc, removed_doc) pairs implied by shared >=minlen runs —
    the ground truth for the dup-pair recall >=0.99 criterion."""
    corpus = b"\xff" + b"\xff".join(texts) if texts else b""
    n = len(corpus)
    # doc index per corpus position
    doc_of = np.zeros(n, dtype=np.int64)
    pos = 0
    for d, t in enumerate(texts):
        doc_of[pos : pos + len(t) + 1] = d
        pos += len(t) + 1
    sa = _suffix_sort(corpus, fast_sa)
    pairs: set[tuple[int, int]] = set()
    run: list[int] = [sa[0]] if n else []

    def flush(run: list[int]) -> None:
        if len(run) > 1:
            keep = min(run)
            kd = int(doc_of[keep])
            for p in run:
                if p != keep:
                    pairs.add((kd, int(doc_of[p])))

    for rank in range(1, n):
        p1, p2 = run[-1], sa[rank]
        if (
            p1 + minlen <= n
            and p2 + minlen <= n
            and corpus[p1 : p1 + minlen] == corpus[p2 : p2 + minlen]
            and SENT not in corpus[p1 : p1 + minlen]
        ):
            run.append(p2)
            continue
        flush(run)
        run = [p2]
    flush(run)
    return pairs
