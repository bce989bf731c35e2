"""Edit-distance (Levenshtein) kernels for the similarity-join family.

Semantics are CODEPOINT-level Levenshtein distance — the same unit
DuckDB's ``levenshtein()`` measures — so the paired SQL oracle is exact
on non-ASCII text too.  The filter cascade (queries.edit_distance_pairs)
runs over exact-packed 8-BYTE grams; the bridge between the two units is
the destruction bound in ``BYTE_GRAM_DESTROY``.

Reference semantics context: the reference engine's dedup notion is
byte-window equality (cpp_engine_dedup.h find_remove_ranges); the
edit-distance join is a breadth operator with no reference analog, built
on the Ed-Join filter framework (Xiao, Wang, Lin — PVLDB 1(1), 2008:
q-gram prefix filtering for edit-distance joins) and Ukkonen's banded
DP (Information and Control 64, 1985).
"""

from __future__ import annotations

import numpy as np

# One codepoint edit rewrites a contiguous UTF-8 region of at most 4
# bytes, so it can destroy at most (q - 1) + 4 byte-window occurrences
# of a q-byte gram => at most q + 3 distinct gram TYPES per edit.  For
# q = 8 that is 11 types per edit; d edits lose at most 11*d types, so
# any pair within edit distance d shares >= max(Da, Db) - 11*d distinct
# byte-grams (the count filter) and its 11*d + 1 globally-rarest grams
# must overlap (the prefix filter).  Pure-ASCII text would allow the
# tighter q-per-edit bound, but the filters must stay complete on any
# UTF-8 input (tests/test_editdist.py pins a multi-byte case).
BYTE_GRAM_Q = 8
BYTE_GRAM_DESTROY = BYTE_GRAM_Q + 3


def char_counts(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row codepoint counts from a concatenated UTF-8 buffer.

    A codepoint starts at every byte that is NOT a continuation byte
    (0b10xxxxxx), so the count per row is a prefix-sum difference — one
    vectorized pass, no decode."""
    if data.shape[0] == 0:
        return np.zeros(offsets.shape[0] - 1, np.int64)
    starts = (data & 0xC0) != 0x80
    cum = np.concatenate(([0], np.cumsum(starts)))
    return (cum[offsets[1:]] - cum[offsets[:-1]]).astype(np.int64)


def codepoints(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codepoint buffer uint32, per-row codepoint offsets int64).

    One C-level decode per CALL (bytes -> str -> UTF-32LE), not per
    row: decoding a concatenation of valid UTF-8 rows equals the
    concatenation of the decoded rows."""
    nch = char_counts(data, offsets)
    cpoff = np.concatenate(([0], np.cumsum(nch))).astype(np.int64)
    if data.shape[0] == 0:
        return np.empty(0, np.uint32), cpoff
    cp = np.frombuffer(
        data.tobytes().decode("utf-8").encode("utf-32-le"), np.uint32
    )
    return cp, cpoff


def doc_distinct_grams(
    data: np.ndarray, offsets: np.ndarray, q: int = BYTE_GRAM_Q
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct q-byte grams per row, exact-packed into u64.

    Returns (doc_ix, gram, n_distinct_per_doc) with rows sorted by
    (doc_ix, gram).  Same big-endian window pack as the shingle kernel
    in queries.ngram_jaccard_exact_pairs (identity is bijective with
    q = 8 bytes — no hashing, so the count/prefix filters stay exact)."""
    nb = offsets.shape[0] - 1
    lens = np.diff(offsets)
    cnt = np.maximum(lens - q + 1, 0).astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.uint64),
            np.zeros(nb, np.int64),
        )
    buf = np.concatenate([data, np.zeros(q, np.uint8)])
    m = data.shape[0]
    v = np.zeros(m, np.uint64)
    for j in range(q):
        v = (v << np.uint64(8)) | buf[j : j + m].astype(np.uint64)
    doc_ix = np.repeat(np.arange(nb), cnt)
    seg = np.cumsum(cnt) - cnt
    pos = (np.arange(total) - seg[doc_ix]) + offsets[doc_ix]
    g = v[pos]
    order = np.lexsort((g, doc_ix))
    d_s, g_s = doc_ix[order], g[order]
    keep = np.concatenate(
        ([True], (d_s[1:] != d_s[:-1]) | (g_s[1:] != g_s[:-1]))
    )
    d_k, g_k = d_s[keep], g_s[keep]
    n_doc = np.bincount(d_k, minlength=nb).astype(np.int64)
    return d_k, g_k, n_doc


def banded_levenshtein(
    acp: np.ndarray,
    aoff: np.ndarray,
    bcp: np.ndarray,
    boff: np.ndarray,
    d: int,
) -> np.ndarray:
    """Exact Levenshtein distances for S sequence pairs, lockstep across
    pairs with a Ukkonen band of half-width ``d``.

    acp/bcp are concatenated uint32 codepoint buffers; aoff/boff are the
    (S+1)-element row offsets.  Returns int64 distances; any true
    distance > d is reported as d + 1 (the band proves only ">").  All
    per-row work is numpy over (active_pairs, 2d+1) views — the loop is
    over DP ROWS (max sequence length), never over pairs.

    Band algebra: row i spans columns j = i-d .. i+d; band slot k holds
    column j = i + k - d, so diag dp[i-1][j-1] sits at slot k of the
    previous row and the deletion term dp[i-1][j] at slot k+1.  The
    insertion (within-row) dependency dp[i][j-1]+1 is resolved without a
    scalar loop by the prefix-min cascade: with e = base - k,
    dp[i] = min(base, k + cummin(e)) — each +1 step along the row is one
    unit of the (k - k') gap.  Values are capped at d+1, which is sound
    because min/+1 recurrences never let a capped cell produce a value
    below the cap."""
    S = aoff.shape[0] - 1
    out = np.full(S, d + 1, np.int64)
    if S == 0:
        return out
    na = np.diff(aoff).astype(np.int64)
    nb = np.diff(boff).astype(np.int64)
    act = np.flatnonzero(np.abs(na - nb) <= d)
    if act.shape[0] == 0:
        return out
    # empty-a rows: answer is nb (<= d by the band precondition)
    ea = act[na[act] == 0]
    out[ea] = nb[ea]
    act = act[na[act] > 0]
    if act.shape[0] == 0:
        return out
    # sort active pairs by na DESC: at DP row i the still-running pairs
    # are a PREFIX of the sorted order, so every row works on a dense
    # slice (no masks, no wasted lanes for short pairs)
    order = act[np.argsort(-na[act], kind="stable")]
    na_s, nb_s = na[order], nb[order]
    ao_s, bo_s = aoff[order], boff[order]
    W = 2 * d + 1
    INF = d + 1
    karr = np.arange(W, dtype=np.int64)
    # row 0: dp[0][j] = j for j = 0..d (slot k = j + d... row 0 slot k
    # holds column j = k - d, so slots k < d are outside the matrix)
    prev = np.where(karr >= d, karr - d, INF).astype(np.int64)
    prev = np.minimum(prev, INF)
    dp = np.broadcast_to(prev, (order.shape[0], W)).copy()
    max_na = int(na_s[0])
    # pairs finishing at row i: na_s is descending, so they occupy a
    # contiguous tail slice found by two searchsorteds
    neg = -na_s
    for i in range(1, max_na + 1):
        n_act = int(np.searchsorted(neg, -i, side="right"))
        if n_act == 0:
            break
        cur_dp = dp[:n_act]
        ai = acp[ao_s[:n_act] + (i - 1)]
        j = karr + (i - d)  # column per slot, shape (W,)
        bidx = bo_s[:n_act, None] + (j - 1)[None, :]
        valid_b = (j >= 1)[None, :] & (j[None, :] <= nb_s[:n_act, None])
        bj = bcp[np.clip(bidx, 0, bcp.shape[0] - 1)]
        sub_cost = (ai[:, None] != bj) | ~valid_b
        diag = cur_dp + sub_cost
        up = np.concatenate(
            [cur_dp[:, 1:], np.full((n_act, 1), INF, np.int64)], axis=1
        ) + 1
        base = np.minimum(diag, up)
        # out-of-matrix columns must not feed the cascade
        base[~valid_b & (j != 0)[None, :]] = INF + 1
        if i <= d:
            base[:, d - i] = i  # boundary dp[i][0] = i deletions
        e = base - karr[None, :]
        np.minimum.accumulate(e, axis=1, out=e)
        np.minimum(e + karr[None, :], INF, out=cur_dp)
        # harvest pairs whose final row this is (na == i)
        lo = int(np.searchsorted(neg, -i, side="left"))
        if lo < n_act:
            fin = np.arange(lo, n_act)
            kf = nb_s[fin] - i + d  # in [0, 2d] by the band precondition
            out[order[fin]] = dp[fin, kf]
    return out


def reference_levenshtein(a: str, b: str) -> int:
    """Plain O(n*m) two-row DP — the independent test oracle for the
    banded kernel (tests only; never on the data path)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            )
        prev = cur
    return prev[len(b)]
