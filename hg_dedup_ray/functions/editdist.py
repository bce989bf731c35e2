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
# when a doc is PURE ASCII every codepoint it loses is one byte, so an
# edit rewrites <= 1 of its own bytes and destroys <= q types — a
# per-DOC bound (it holds regardless of what the partner doc is), so
# ASCII docs index the smaller 8d+1 prefix while multibyte docs keep
# 11d+1; the pair lemma composes the two sides' bounds independently
ASCII_GRAM_DESTROY = BYTE_GRAM_Q


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
    a_start: np.ndarray,
    a_len: np.ndarray,
    bcp: np.ndarray,
    b_start: np.ndarray,
    b_len: np.ndarray,
    d: int,
) -> np.ndarray:
    """Exact threshold Levenshtein for S sequence pairs, lockstep across
    pairs with a Ukkonen band of half-width ``d`` and PER-ROW DROPOUT.

    Each side is (codepoint buffer, per-pair start, per-pair length) —
    starts may point anywhere into a SHARED buffer, so callers pass doc
    offsets directly and no per-pair sequence copies are ever made
    (15M candidate pairs x ~600 codepoints would be ~70 GB of gathers).
    Returns int64 distances; any true distance > d is reported as d+1.

    Early termination is what makes this the whole verify stage: every
    DP cell is >= the minimum of the previous row (min/+1 recurrence),
    so once a pair's band minimum exceeds d its final distance provably
    exceeds d — the pair is retired with d+1 after ~O(d) rows.  On a
    web-style corpus nearly all gram-filter candidates die this way,
    which beats a shared-gram count filter (whose cost is the FULL
    Da+Db gather per pair) at both small and large scale.  All per-row
    work is numpy over (live_pairs, 2d+1) arrays — the Python loop is
    over DP ROWS, never over pairs.

    Band algebra: row i spans columns j = i-d .. i+d; band slot k holds
    column j = i + k - d, so diag dp[i-1][j-1] sits at slot k of the
    previous row and the deletion term dp[i-1][j] at slot k+1.  The
    insertion (within-row) dependency dp[i][j-1]+1 is resolved without
    a scalar loop by the prefix-min cascade: with e = base - k,
    dp[i] = min(base, k + cummin(e)).  Values cap at d+1: min/+1
    recurrences never let a capped cell fall back below the cap."""
    S = a_start.shape[0]
    out = np.full(S, d + 1, np.int64)
    if S == 0:
        return out
    na = a_len.astype(np.int64)
    nb = b_len.astype(np.int64)
    act = np.flatnonzero(np.abs(na - nb) <= d)
    if act.shape[0] == 0:
        return out
    # empty-a rows: answer is nb (<= d by the band precondition)
    ea = act[na[act] == 0]
    out[ea] = nb[ea]
    act = act[na[act] > 0]
    if act.shape[0] == 0:
        return out
    if bcp.shape[0] == 0:
        # every remaining pair has na > 0 against an empty b buffer
        # (so nb == 0 and na <= d by the band precondition) — answer
        # is na; the gather below cannot index an empty array
        out[act] = na[act]
        return out
    live = act  # indices of pairs still running
    na_l, nb_l = na[live], nb[live]
    ao_l, bo_l = a_start[live].astype(np.int64), b_start[live].astype(np.int64)
    W = 2 * d + 1
    INF = d + 1
    karr = np.arange(W, dtype=np.int64)
    prev = np.where(karr >= d, karr - d, INF).astype(np.int64)
    dp = np.broadcast_to(prev, (live.shape[0], W)).copy()
    max_na = int(na_l.max())
    for i in range(1, max_na + 1):
        ai = acp[ao_l + (i - 1)]
        j = karr + (i - d)  # column per slot, shape (W,)
        bidx = bo_l[:, None] + (j - 1)[None, :]
        valid_b = (j >= 1)[None, :] & (j[None, :] <= nb_l[:, None])
        bj = bcp[np.clip(bidx, 0, bcp.shape[0] - 1)]
        sub_cost = (ai[:, None] != bj) | ~valid_b
        diag = dp + sub_cost
        up = np.concatenate(
            [dp[:, 1:], np.full((dp.shape[0], 1), INF, np.int64)], axis=1
        ) + 1
        base = np.minimum(diag, up)
        # out-of-matrix columns must not feed the cascade
        base[~valid_b & (j != 0)[None, :]] = INF + 1
        if i <= d:
            base[:, d - i] = i  # boundary dp[i][0] = i deletions
        e = base - karr[None, :]
        np.minimum.accumulate(e, axis=1, out=e)
        dp = np.minimum(e + karr[None, :], INF)
        # harvest finished pairs (this was their last row)
        fin = na_l == i
        if fin.any():
            fi = np.flatnonzero(fin)
            out[live[fi]] = dp[fi, nb_l[fi] - i + d]
        # dropout: finished, or band minimum already past the threshold
        # (every later cell is >= the current row min — retire as d+1)
        alive = ~fin & (dp.min(axis=1) <= d)
        if not alive.all():
            if not alive.any():
                break
            dp = dp[alive]
            live = live[alive]
            na_l, nb_l = na_l[alive], nb_l[alive]
            ao_l, bo_l = ao_l[alive], bo_l[alive]
    return out


def chunked_hamming(
    cp: np.ndarray,
    a_start: np.ndarray,
    b_start: np.ndarray,
    n: np.ndarray,
    k: int,
    chunk: int = 64,
) -> np.ndarray:
    """Exact threshold Hamming distances for S EQUAL-LENGTH codepoint
    pairs, lockstep across pairs with per-chunk dropout: positions are
    compared ``chunk`` at a time; a pair retires with k+1 the moment
    its mismatch count passes k (mismatches only accumulate, so the
    early exit is exact). Both sides read the shared buffer in place
    via starts — no per-pair copies (the banded_levenshtein rule)."""
    S = a_start.shape[0]
    out = np.full(S, k + 1, np.int64)
    if S == 0:
        return out
    live = np.arange(S)
    al = a_start[live].astype(np.int64)
    bl = b_start[live].astype(np.int64)
    nl = n[live].astype(np.int64)
    acc = np.zeros(S, np.int64)
    top = max(int(nl.max()), 0)
    carr = np.arange(chunk, dtype=np.int64)
    for c0 in range(0, top, chunk):
        still = nl > c0
        fin = live[~still]
        out[fin] = acc[~still]  # exhausted all positions: final count
        live, al, bl, nl, acc = (
            live[still], al[still], bl[still], nl[still], acc[still]
        )
        if live.shape[0] == 0:
            return out
        idx = c0 + carr
        valid = idx[None, :] < nl[:, None]
        hi = max(cp.shape[0] - 1, 0)
        av = cp[np.clip(al[:, None] + idx, 0, hi)] if cp.shape[0] else None
        if av is None:
            break  # only n == 0 rows can exist; handled at loop entry
        bv = cp[np.clip(bl[:, None] + idx, 0, hi)]
        acc = acc + ((av != bv) & valid).sum(axis=1)
        ok = acc <= k
        if not ok.all():
            live, al, bl, nl, acc = (
                live[ok], al[ok], bl[ok], nl[ok], acc[ok]
            )
            if live.shape[0] == 0:
                return out
    out[live] = acc
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
