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
    """Suffix array of ``data``, returned as int64 start offsets in
    lexicographic order of suffixes. Equivalent to
    ``sorted(range(n), key=lambda i: data[i:])``.

    Accepts uint8 byte corpora (the reference's u8 path) or uint16/uint32
    TOKEN corpora (the reference's tokenizer path, indexing_v6_sharded.py:
    205-218/282-292 — suffixes start at token boundaries, comparisons are
    token-wise).

    Larsson-Sadakane-style prefix doubling, fully vectorized:
    - initial radix pass sorts by the first 16 bytes' worth of elements at
      once (two big-endian u64 packs), so doubling starts at k=16/itemsize;
    - each round re-sorts ONLY still-tied segments by the rank k elements
      ahead; work per round is O(ties), which collapses after the longest
      repeats are resolved (O(n log n) worst case, ~O(n) typical).
    """
    if isinstance(data, (bytes, bytearray, memoryview)):
        a = np.frombuffer(bytes(data), dtype=np.uint8)
    else:
        a = np.ascontiguousarray(data)
        assert a.dtype in (np.uint8, np.uint16, np.uint32), a.dtype
    n = a.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)

    # 16-byte-equivalent initial radix (two u64 keys, one lexsort):
    # natural-language text ties ~85% of positions on 8 bytes but only
    # ~25% on 16, so doubling starts at K0 with a far smaller tied set
    # (~2.5x faster than an 8-byte first pass on web text, same output)
    ipw = 8 // a.dtype.itemsize  # elements packed per u64 word
    shift = np.uint64(8 * a.dtype.itemsize)
    K0 = 2 * ipw
    b = np.concatenate([a, np.zeros(K0, dtype=a.dtype)])
    v = np.zeros(n, dtype=np.uint64)
    v2 = np.zeros(n, dtype=np.uint64)
    for j in range(ipw):
        v = (v << shift) | b[j : j + n].astype(np.uint64)
        v2 = (v2 << shift) | b[j + ipw : j + ipw + n].astype(np.uint64)
    sa = np.lexsort((v2, v)).astype(np.int64)
    vs, vs2 = v[sa], v2[sa]
    newseg = np.ones(n, dtype=bool)
    newseg[1:] = (vs[1:] != vs[:-1]) | (vs2[1:] != vs2[:-1])
    # rank[suffix] = sa-index of its segment's first element (Larsson-
    # Sadakane convention: usable as an ordinal AND stable under segment-
    # local refinement)
    seg_start = np.maximum.accumulate(np.where(newseg, np.arange(n), -1))
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = seg_start

    # initial tied set: elements of segments with >1 member (computed once;
    # every later round derives the next tied set from the current one, so
    # per-round work is O(ties), not O(n))
    seg_id0 = np.cumsum(newseg) - 1
    sizes0 = np.bincount(seg_id0)
    idx = np.flatnonzero((sizes0 > 1)[seg_id0]).astype(np.int64)

    k = K0
    while idx.size and k < n:
        suf = sa[idx]
        seg = rank[suf]  # segment start index = segment key
        r2 = np.where(suf + k < n, rank[(suf + k) % n], np.int64(-1))
        order = np.lexsort((r2, seg))
        suf = suf[order]
        r2 = r2[order]
        seg = seg[order]
        sa[idx] = suf
        newval = np.ones(idx.shape[0], dtype=bool)
        newval[1:] = (seg[1:] != seg[:-1]) | (r2[1:] != r2[:-1])
        grp = np.cumsum(newval) - 1
        rank[suf] = idx[newval][grp]
        counts = np.bincount(grp)
        idx = idx[(counts > 1)[grp]]
        k *= 2
    if idx.size:
        # residual ties after k >= n are suffixes identical all the way to
        # the corpus end (possible only when the data itself ends in a
        # 0x00-run the initial radix pad can't distinguish, or n <= K0
        # with embedded NULs). The shorter suffix is then a PREFIX of the
        # longer -> sorts first: order each tied segment by start offset
        # descending.
        suf = sa[idx]
        seg = rank[suf]
        order = np.lexsort((-suf, seg))
        sa[idx] = suf[order]
    return sa


def build_suffix_array_naive(data: bytes) -> np.ndarray:
    """O(n^2 log n) oracle for tests: python sort of suffix slices."""
    return np.array(sorted(range(len(data)), key=lambda i: data[i:]), dtype=np.int64)


def verify_sa_correctness(corpus: np.ndarray, sa: np.ndarray, hack: int = 1000) -> bool:
    """Adjacent ranks must be sorted when compared on ``hack``-element
    prefixes (reference `verify_sa_correctness`, cpp_engine_dedup.h:
    914-930). Element-wise, so it holds for u8 byte and u16/u32 token
    corpora alike."""
    n = len(sa)
    if corpus.dtype == np.uint8:
        buf = corpus.tobytes()
        for i in range(n - 1):
            p, q = int(sa[i]), int(sa[i + 1])
            if buf[p : p + hack] > buf[q : q + hack]:
                return False
        return True
    for i in range(n - 1):
        p, q = int(sa[i]), int(sa[i + 1])
        if list(corpus[p : p + hack]) > list(corpus[q : q + hack]):
            return False
    return True
