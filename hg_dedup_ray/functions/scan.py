"""Dedup scan kernels: SA-adjacent run detection, keep-first, coalescing.

Reference semantics (conformance contract, SURVEY.md §7.0):

A byte offset ``q`` is a remove-pointer iff the ``minlen``-byte window at
``q`` (a) fits in the corpus, (b) contains no ``0xff`` document sentinel,
(c) is byte-equal to the window of a suffix adjacent to it in suffix-array
order (forming a maximal run of equal windows), and (d) ``q`` is not the
run's minimum offset — one copy of every repeated string is KEPT
(reference cpp_engine_dedup.h:215-302: `find_remove_ranges`).

Sorted remove-pointers fold into ranges ``[ptr, ptr+minlen)`` where a new
pointer whose start is <= the open range's end extends it to
``ptr + minlen`` (reference cpp_engine_dedup.h:285-292).

All kernels are vectorized numpy — no per-rank Python loop. The byte-equal
test over adjacent SA entries runs column-by-column over a geometrically
shrinking candidate set (adjacent suffixes that survive j equal bytes),
so cost is O(sum of adjacent-LCPs capped at minlen), same work as the
reference's memcmp but batched.
"""

from __future__ import annotations

import numpy as np


def sentinel_value(dtype) -> int:
    """Document-sentinel token for a corpus dtype: 0xFF for u8 bytes
    (never occurs in valid UTF-8), all-ones for u16/u32 token streams —
    the token the reference's ``doc_sep`` bytes (\\xff x itemsize,
    indexing_v6_sharded.py:282-292) decode to at that width."""
    return (1 << (8 * np.dtype(dtype).itemsize)) - 1


def sentinel_positions(corpus: np.ndarray) -> np.ndarray:
    """Sorted positions of the document sentinels."""
    return np.flatnonzero(corpus == np.array(sentinel_value(corpus.dtype), corpus.dtype))


def window_sentinel_free(
    ptrs: np.ndarray, sent_pos: np.ndarray, minlen: int
) -> np.ndarray:
    """True where [ptr, ptr+minlen) contains no sentinel."""
    lo = np.searchsorted(sent_pos, ptrs, side="left")
    hi = np.searchsorted(sent_pos, ptrs + minlen, side="left")
    return lo == hi


def adjacent_run_mask(
    corpus: np.ndarray, sa: np.ndarray, minlen: int, sent_pos: np.ndarray | None = None
) -> np.ndarray:
    """Boolean mask over adjacent SA pairs: mask[i] == True iff sa[i] and
    sa[i+1] share a minlen-byte prefix, both windows fit the corpus, and
    the (shared) window is sentinel-free.

    Matches the run-continuation condition of the reference scan loop
    (cpp_engine_dedup.h:228-238): both `ptr+minlen <= ds_size`, `memcmp == 0`,
    no 0xff in the window.
    """
    n = len(sa)
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=bool)
    N = corpus.shape[0]
    if sent_pos is None:
        sent_pos = sentinel_positions(corpus)
    left = sa[:-1]
    right = sa[1:]
    ok = (left + minlen <= N) & (right + minlen <= N)
    # sentinel-free check on the left window; when memcmp==0 both windows
    # hold identical bytes so checking one side suffices — but we must also
    # pre-filter the right side to avoid keeping pairs that differ only via
    # sentinels: the byte-equality loop below compares real bytes, and a
    # sentinel byte participates in equality like any other, so filtering
    # the left window up front and verifying equality is exactly the
    # reference condition.
    ok &= window_sentinel_free(left, sent_pos, minlen)
    cand = np.flatnonzero(ok)
    # equality ONE u64 WORD AT A TIME: vw[i] packs the 8//itemsize
    # elements at corpus[i:] into one u64 (big-endian, so u64 equality ==
    # element-wise equality), turning the memcmp into minlen/ipw
    # gather-compares over the shrinking still-equal set — adjacent
    # suffixes naturally share long prefixes, so the set shrinks slowly
    # and per-element columns were the scan's hot loop
    if cand.size:
        ipw = 8 // corpus.dtype.itemsize
        shift = np.uint64(8 * corpus.dtype.itemsize)
        pad = np.zeros(ipw, dtype=corpus.dtype)
        bp = np.concatenate([corpus, pad])
        vw = np.zeros(N, dtype=np.uint64)
        for j in range(ipw):
            vw = (vw << shift) | bp[j : j + N].astype(np.uint64)
        step_end = minlen - (ipw - 1)
        for j in range(0, step_end, ipw):
            if cand.size == 0:
                break
            eq_j = vw[left[cand] + j] == vw[right[cand] + j]
            cand = cand[eq_j]
        for j in range(max(0, step_end + (-step_end % ipw)), minlen):
            if cand.size == 0:
                break
            eq_j = corpus[left[cand] + j] == corpus[right[cand] + j]
            cand = cand[eq_j]
    mask = np.zeros(n - 1, dtype=bool)
    mask[cand] = True
    return mask


def remove_ptrs_from_runs(sa: np.ndarray, run_mask: np.ndarray) -> np.ndarray:
    """Expand runs (maximal stretches of True in ``run_mask``) into
    remove-pointers: every member except the run's minimum offset.
    Returns SORTED unique remove-pointers (int64).

    Keep-first = min byte offset; within one partition corpus built in
    doc_seq order, byte offset order == document order (reference keeps
    `min_element(ptrs)`, cpp_engine_dedup.h:239-247 / 717-724).
    """
    if run_mask.size == 0 or not run_mask.any():
        return np.empty(0, dtype=np.int64)
    padded = np.concatenate(([False], run_mask, [False]))
    edges = np.flatnonzero(padded[1:] != padded[:-1])
    starts = edges[0::2]          # run covers sa[starts[r] .. ends[r]] inclusive
    ends = edges[1::2]            # mask True on [starts, ends) -> members to ends
    lengths = ends - starts + 1   # number of suffixes in each run
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    # flatten member indices: starts[r] + 0..lengths[r]-1
    member_idx = np.repeat(starts, lengths) + (
        np.arange(lengths.sum()) - np.repeat(offsets, lengths)
    )
    members = sa[member_idx]
    run_id = np.repeat(np.arange(len(starts)), lengths)
    mins = np.minimum.reduceat(members, offsets)
    remove = members[members != mins[run_id]]
    remove = np.sort(remove)
    return remove.astype(np.int64)


def coalesce_ptrs_to_ranges(remove_ptrs: np.ndarray, minlen: int) -> np.ndarray:
    """Fold sorted remove-pointers into [start, end) ranges, shape (R, 2).

    Reference rule (cpp_engine_dedup.h:285-292): extend the open range to
    ``ptr + minlen`` when ``open.end >= ptr``; since pointers are sorted and
    every window has length minlen, a break happens exactly where
    ``ptr[i] - ptr[i-1] > minlen``.
    """
    if remove_ptrs.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    p = remove_ptrs
    brk = np.flatnonzero(np.diff(p) > minlen)
    starts = p[np.concatenate(([0], brk + 1))]
    ends = p[np.concatenate((brk, [p.size - 1]))] + minlen
    return np.stack([starts, ends], axis=1).astype(np.int64)


def find_dup_ptrs(
    corpus: np.ndarray, sa: np.ndarray, minlen: int
) -> tuple[np.ndarray, np.ndarray]:
    """Diagnostic scan (reference `find_dup_ptrs`, cpp_engine_dedup.h:801-837):
    ALL members of every duplicate run, tagged kept (run minimum) vs
    dropped. Returns (ptrs int64 sorted, kept bool) — a superset of the
    remove-pointers (dropped == the remove set)."""
    mask = adjacent_run_mask(corpus, sa, minlen, sentinel_positions(corpus))
    if mask.size == 0 or not mask.any():
        return np.empty(0, np.int64), np.empty(0, bool)
    padded = np.concatenate(([False], mask, [False]))
    edges = np.flatnonzero(padded[1:] != padded[:-1])
    starts, ends = edges[0::2], edges[1::2]
    lengths = ends - starts + 1
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    member_idx = np.repeat(starts, lengths) + (
        np.arange(lengths.sum()) - np.repeat(offsets, lengths)
    )
    members = sa[member_idx]
    run_id = np.repeat(np.arange(len(starts)), lengths)
    mins = np.minimum.reduceat(members, offsets)
    kept = members == mins[run_id]
    order = np.argsort(members, kind="stable")
    return members[order].astype(np.int64), kept[order]


def dup_ptrs_to_docs(
    ptrs: np.ndarray, kept: np.ndarray, doc_starts: np.ndarray, doc_ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group dup pointers by containing doc (reference `find_dup_docs`,
    cpp_engine_dedup.h:839-867 — offset->doc binary search). Returns
    (doc_ix per doc with >=1 dup ptr, n_kept, n_dropped)."""
    if ptrs.size == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    doc_ix = np.searchsorted(doc_starts, ptrs, side="right") - 1
    assert (ptrs < doc_ends[doc_ix]).all(), "dup ptr outside its doc"
    uniq = np.unique(doc_ix)
    n_kept = np.bincount(doc_ix, weights=kept)[uniq].astype(np.int64)
    n_drop = np.bincount(doc_ix, weights=~kept)[uniq].astype(np.int64)
    return uniq.astype(np.int64), n_kept, n_drop


def find_remove_ranges(
    corpus: np.ndarray, sa: np.ndarray, minlen: int
) -> np.ndarray:
    """Full partition-local scan: corpus + SA -> coalesced remove ranges
    (global partition byte offsets), shape (R, 2). Composition of the three
    kernels above; semantics == reference `find_remove_ranges`
    (cpp_engine_dedup.h:215-302)."""
    sent = sentinel_positions(corpus)
    mask = adjacent_run_mask(corpus, sa, minlen, sent)
    ptrs = remove_ptrs_from_runs(sa, mask)
    return coalesce_ptrs_to_ranges(ptrs, minlen)


# ---------------------------------------------------------------------------
# hash-group scan kernel (suffix-array-free, byte-identical output)

_HASH_P = 0x9E3779B97F4A7C15 | 1  # odd -> invertible mod 2^64
_U64_MASK = (1 << 64) - 1


def _inv_u64(p: int) -> int:
    """Multiplicative inverse of odd ``p`` mod 2^64 (Newton iteration)."""
    x = p
    for _ in range(6):
        x = (x * (2 - p * x)) & _U64_MASK
    return x


_HASH_CHUNK = 1 << 16  # 64k elements: pow/term scratch stays L2-resident


def _window_hashes(corpus: np.ndarray, minlen: int) -> np.ndarray:
    """Canonical polynomial hash of every minlen-window, O(n) via prefix
    sums: h_i = (S[i+L] - S[i]) * p^-i mod 2^64.

    Computed in 64k-element chunks with running p^i / p^-i carries so the
    pow-series and term scratch arrays never leave cache — measured 16x
    faster than full-size intermediates under 32-way contention (the
    full-size version moves ~10 u64 arrays of DRAM traffic per corpus
    byte; chunking leaves only S, h and the element conversion)."""
    N = corpus.shape[0]
    m = N - minlen + 1
    S = np.empty(N + 1, np.uint64)
    S[0] = 0
    scratch = np.empty(_HASH_CHUNK, np.uint64)
    pcar = 1
    for c0 in range(0, N, _HASH_CHUNK):
        c1 = min(c0 + _HASH_CHUNK, N)
        k = c1 - c0
        pw = scratch[:k]
        pw[0] = pcar
        if k > 1:
            np.multiply.accumulate(
                np.full(k - 1, np.uint64(_HASH_P), np.uint64), out=pw[1:]
            )
            pw[1:] *= np.uint64(pcar)
        a = corpus[c0:c1].astype(np.uint64)
        a += np.uint64(1)
        np.cumsum(a * pw, out=S[c0 + 1 : c1 + 1])
        S[c0 + 1 : c1 + 1] += S[c0]
        pcar = (int(pw[k - 1]) * _HASH_P) & _U64_MASK
    h = np.empty(m, np.uint64)
    inv_p = _inv_u64(_HASH_P)
    icar = 1
    for c0 in range(0, m, _HASH_CHUNK):
        c1 = min(c0 + _HASH_CHUNK, m)
        k = c1 - c0
        ipw = scratch[:k]
        ipw[0] = icar
        if k > 1:
            np.multiply.accumulate(np.full(k - 1, np.uint64(inv_p), np.uint64), out=ipw[1:])
            ipw[1:] *= np.uint64(icar)
        h[c0:c1] = (S[c0 + minlen : c1 + minlen] - S[c0:c1]) * ipw
        icar = (int(ipw[k - 1]) * inv_p) & _U64_MASK
    return h


def _sentinel_free_starts(sent: np.ndarray, m: int, minlen: int) -> np.ndarray:
    """Ascending window starts in [0, m) that do not overlap a sentinel —
    built directly from the complement of the blocked intervals
    [s-minlen+1, s] (sent is sorted, so blocked ends are strictly
    increasing and gap extraction is exact). Replaces the old
    full-length int32 coverage array + cumsum + flatnonzero: the only
    full-size write left is the result itself."""
    if sent.size == 0:
        return np.arange(m, dtype=np.int64)
    lo = np.clip(sent - minlen + 1, 0, m)
    hi = np.clip(sent + 1, 0, m)
    starts = np.concatenate(([0], hi)).astype(np.int64)
    ends = np.concatenate((lo, [m])).astype(np.int64)
    lens = np.maximum(ends - starts, 0)
    nz = lens > 0
    starts, lens = starts[nz], lens[nz]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    off = np.cumsum(lens) - lens
    return np.repeat(starts - off, lens) + np.arange(total, dtype=np.int64)


def _singleton_prefilter(
    pos: np.ndarray, hp: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Drop windows whose hash bucket holds only them — EXACT for >=2-member
    equality classes (equal u64 hashes share every bucket level), it can
    only over-keep (bucket-collision noise), never drop a true duplicate.

    Two-level scheme chosen for DRAM behavior under 32-way contention:
    a single flat counter table sized ~8x the window count is tens of MB
    per worker, and the random scatter/gather into it is latency-bound
    (measured: HALF the whole kernel's time at 2 MB partitions). Instead:
    one 1-byte-key counting argsort (numpy radix) splits the hashes into
    256 ranges, then each range histograms the NEXT <=17 bits into a
    <=1 MB cache-resident table — ~2^25 effective buckets (vs 2^22
    before) at a fraction of the traffic, so survivors shrink to near
    the true dup fraction and the downstream u64 argsort shrinks with
    them (measured 510k -> 93k survivors, 124 ms -> ~45 ms prefilter,
    61 ms -> 8 ms argsort on the 1.6 MB profile fixture)."""
    top = (hp >> np.uint64(56)).astype(np.uint8)
    order = np.argsort(top, kind="stable")
    hs = hp[order]
    cnt = np.bincount(top, minlength=256)
    bounds = np.concatenate(([0], np.cumsum(cnt)))
    keep_s = np.empty(hs.shape[0], bool)
    for i in range(256):
        a, b = int(bounds[i]), int(bounds[i + 1])
        n = b - a
        if n < 2:
            keep_s[a:b] = False
            continue
        # table ~16x the range size (capped at 1 MB): collision noise
        # ~e^-(1/16) while zeroing stays proportional to the range
        bits = max(10, min(17, int(16 * n).bit_length()))
        sb = ((hs[a:b] >> np.uint64(56 - bits)) & np.uint64((1 << bits) - 1)).astype(
            np.int64
        )
        keep_s[a:b] = np.bincount(sb, minlength=1 << bits)[sb] >= 2
    ko = np.sort(order[keep_s])  # restore ascending-position order
    return pos[ko], hp[ko]


def _dup_candidate_windows(
    corpus: np.ndarray, minlen: int
) -> tuple[np.ndarray, np.ndarray]:
    """(pos, hp) of sentinel-free windows surviving the singleton
    prefilter, ascending by position — the shared front half of both
    hash-group kernels."""
    N = corpus.shape[0]
    m = N - minlen + 1
    pos = _sentinel_free_starts(sentinel_positions(corpus), m, minlen)
    if pos.size < 2:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = _window_hashes(corpus, minlen)
    hp = h[pos]
    del h
    return _singleton_prefilter(pos, hp)


def find_remove_ranges_hashed(corpus: np.ndarray, minlen: int) -> np.ndarray:
    """`find_remove_ranges` WITHOUT the suffix array — byte-identical
    output, ~3-4x faster (tests/test_scan.py asserts equality; the
    reference-parity suite runs this kernel by default).

    Key identity: a maximal SA run whose adjacent suffixes share a
    >=minlen prefix is exactly an EQUALITY CLASS of minlen-element
    windows (prefix-sharing is transitive, and a suffix shorter than
    minlen sorts before — never between — the class members). So the
    scan reduces to grouping window values:

    1. canonical polynomial window hash, O(n) via prefix sums
       (h_i = (S[i+L]-S[i]) * p^-i mod 2^64 — p odd hence invertible);
    2. drop windows overlapping a document sentinel (blocked-interval
       complement) and prefilter singleton hash buckets
       (_singleton_prefilter — exact for >=2-member classes);
    3. ONE stable u64 radix argsort (ties keep ascending position, so an
       equality class is a contiguous ascending run);
    4. verify adjacent equal-hash windows element-wise (exactness does
       not depend on the hash: collisions are split here);
    5. the SA-path run expansion + keep-min + coalesce, with the
       hash-sorted position array standing in for the SA.

    A 2^-64-probability hash collision can only SPLIT an equality class
    (the interloper fails step 4), never merge one — keeping at most one
    extra occurrence; it cannot remove non-duplicate text."""
    N = corpus.shape[0]
    if N < minlen:
        return np.empty((0, 2), dtype=np.int64)
    pos, hp = _dup_candidate_windows(corpus, minlen)
    if pos.size < 2:
        return np.empty((0, 2), dtype=np.int64)
    order = np.argsort(hp, kind="stable")  # radix sort for ints; stable
    sp = pos[order].astype(np.int64)
    hs = hp[order]
    del hp, pos, order
    cand = np.flatnonzero(hs[1:] == hs[:-1])
    del hs
    if cand.size:
        # element-wise verify, chunked so the gather matrix stays bounded
        win = np.arange(minlen)
        chunk = max(1, (32 << 20) // max(minlen, 1))
        keep_parts = []
        for c0 in range(0, cand.size, chunk):
            cc = cand[c0 : c0 + chunk]
            eq = (
                corpus[sp[cc][:, None] + win] == corpus[sp[cc + 1][:, None] + win]
            ).all(axis=1)
            keep_parts.append(cc[eq])
        cand = np.concatenate(keep_parts)
    mask = np.zeros(sp.shape[0] - 1, dtype=bool)
    mask[cand] = True
    ptrs = remove_ptrs_from_runs(sp, mask)
    return coalesce_ptrs_to_ranges(ptrs, minlen)


def find_dup_ptrs_hashed(
    corpus: np.ndarray, minlen: int
) -> tuple[np.ndarray, np.ndarray]:
    """`find_dup_ptrs` via the hash-group kernel (same equality-class
    identity as `find_remove_ranges_hashed`): ALL members of every
    duplicate window class, tagged kept (class minimum) vs dropped.
    Identical output to the SA-based `find_dup_ptrs` (tested)."""
    N = corpus.shape[0]
    empty = (np.empty(0, np.int64), np.empty(0, bool))
    if N < minlen:
        return empty
    pos, hp = _dup_candidate_windows(corpus, minlen)
    if pos.size < 2:
        return empty
    order = np.argsort(hp, kind="stable")
    sp = pos[order].astype(np.int64)
    hs = hp[order]
    del hp, pos, order
    cand = np.flatnonzero(hs[1:] == hs[:-1])
    del hs
    if cand.size:
        win = np.arange(minlen)
        chunk = max(1, (32 << 20) // max(minlen, 1))
        keep_parts = []
        for c0 in range(0, cand.size, chunk):
            cc = cand[c0 : c0 + chunk]
            eq = (
                corpus[sp[cc][:, None] + win] == corpus[sp[cc + 1][:, None] + win]
            ).all(axis=1)
            keep_parts.append(cc[eq])
        cand = np.concatenate(keep_parts)
    if cand.size == 0:
        return empty
    mask = np.zeros(sp.shape[0] - 1, dtype=bool)
    mask[cand] = True
    padded = np.concatenate(([False], mask, [False]))
    edges = np.flatnonzero(padded[1:] != padded[:-1])
    starts, ends = edges[0::2], edges[1::2]
    lengths = ends - starts + 1
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    member_idx = np.repeat(starts, lengths) + (
        np.arange(lengths.sum()) - np.repeat(offsets, lengths)
    )
    members = sp[member_idx]
    run_id = np.repeat(np.arange(len(starts)), lengths)
    mins = np.minimum.reduceat(members, offsets)
    kept = members == mins[run_id]
    o = np.argsort(members, kind="stable")
    return members[o].astype(np.int64), kept[o]
