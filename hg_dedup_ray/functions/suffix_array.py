"""Suffix-array construction over byte corpora — pure numpy, vectorized.

The reference builds suffix arrays with an external Rust binary
(`rust_indexing make-part`, reference indexing_v6_sharded.py:222-252). We
rebuild with numpy prefix-doubling (Manber-Myers, O(n log n) lexsorts with
early exit once all ranks are distinct), which keeps the whole build inside
a Ray actor task with no subprocess or temp files.

The corpus layout matches the reference index (reference
indexing_v6_sharded.py:46-56): ``b"\\xff" + utf8(text)`` per document,
concatenated in global document order; ``0xff`` never occurs in valid UTF-8
so the sentinel is unambiguous.
"""

from __future__ import annotations

import numpy as np

SENTINEL = 0xFF


def build_suffix_array(data: bytes | bytearray | memoryview | np.ndarray) -> np.ndarray:
    """Suffix array of ``data`` (uint8), returned as int64 start offsets in
    lexicographic order of suffixes. Equivalent to
    ``sorted(range(n), key=lambda i: data[i:])``.

    Prefix doubling: rank suffixes by their first ``k`` bytes, double ``k``
    until all ranks are distinct. Each round is one ``np.lexsort`` + a
    vectorized re-rank; rounds needed = O(log(longest repeat)).
    """
    if isinstance(data, (bytes, bytearray, memoryview)):
        a = np.frombuffer(bytes(data), dtype=np.uint8)
    else:
        a = np.ascontiguousarray(data, dtype=np.uint8)
    n = a.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)

    rank = a.astype(np.int64)
    k = 1
    while True:
        # Secondary key: rank of the suffix starting k bytes later
        # (-1 == "past the end", sorts before every real rank).
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        sa = np.lexsort((rank2, rank))
        r1 = rank[sa]
        r2 = rank2[sa]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(changed) - 1
        rank = new_rank
        k *= 2
        if rank[sa[-1]] == n - 1 or k >= n:
            # all ranks distinct (max rank == n-1) -> fully sorted
            return sa.astype(np.int64)


def build_suffix_array_naive(data: bytes) -> np.ndarray:
    """O(n^2 log n) oracle for tests: python sort of suffix slices."""
    return np.array(sorted(range(len(data)), key=lambda i: data[i:]), dtype=np.int64)


def verify_sa_correctness(corpus: np.ndarray, sa: np.ndarray, hack: int = 1000) -> bool:
    """Adjacent ranks must be sorted when compared on ``hack``-byte prefixes
    (reference `verify_sa_correctness`, cpp_engine_dedup.h:914-930)."""
    n = len(sa)
    buf = corpus.tobytes()
    for i in range(n - 1):
        p, q = int(sa[i]), int(sa[i + 1])
        if buf[p : p + hack] > buf[q : q + hack]:
            return False
    return True
