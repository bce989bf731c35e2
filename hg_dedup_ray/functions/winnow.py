"""Winnowing document fingerprints for cross-partition substring routing.

Replaces the reference's global SA pseudo-merge (reference
cpp_engine_dedup.h:502-799) candidate discovery with the winnowing scheme
of Schleimer, Wilkerson & Aiken (SIGMOD'03, the MOSS fingerprint): take
the rolling k-gram hash stream of a document and record the MINIMUM hash
of every w-wide window. Guarantee: any byte-identical region of length
>= w + k - 1 shared by two documents yields at least one identical selected
fingerprint in both — so with w = minlen - k + 1, every >=minlen duplicate
region is routed to a common LSH-style bucket DETERMINISTICALLY (unlike
doc-level MinHash, which only finds high-Jaccard document pairs).

Expected fingerprint density is 2/(w+1) per byte — for the reference
production config (minlen=500, k=16, w=485) that's one 8-byte key per
~240 input bytes, i.e. a ~3% shuffle volume.
"""

from __future__ import annotations

import numpy as np

from hg_dedup_ray.functions.minhash import _splitmix, shingle_hashes

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def sliding_min(a: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every w-wide window of ``a`` — O(n), fully vectorized
    (block prefix/suffix minima)."""
    n = a.shape[0]
    if w <= 1 or n == 0:
        return a
    if w >= n:
        return np.array([a.min()], dtype=a.dtype)
    pad = (-n) % w
    b = np.concatenate([a, np.full(pad, _U64_MAX, dtype=a.dtype)])
    m = b.reshape(-1, w)
    pre = np.minimum.accumulate(m, axis=1).reshape(-1)
    suf = np.minimum.accumulate(m[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    out_len = n - w + 1
    return np.minimum(suf[:out_len], pre[w - 1 : w - 1 + out_len])


def winnow_params(minlen: int, shingle_k: int) -> tuple[int, int]:
    """(k, w) such that w + k - 1 <= minlen (detection guarantee).

    k is raised to minlen//2 (>= shingle_k) so a shared fingerprint implies
    a shared k-gram of ~minlen/2 bytes — strong evidence of a real
    duplicate region — rather than a short gram that unrelated docs share
    by chance. Fewer false candidate groups, same guarantee."""
    k = min(max(shingle_k, minlen // 2), minlen)
    w = max(1, minlen - k + 1)
    return k, w


def doc_fingerprints(text_bytes: np.ndarray, k: int, w: int) -> np.ndarray:
    """Unique selected fingerprints of one document (sorted u64)."""
    if text_bytes.shape[0] == 0:
        return np.empty(0, dtype=np.uint64)
    h = shingle_hashes(text_bytes, k)
    return np.unique(sliding_min(h, w))


def batch_fingerprints(
    buf: np.ndarray, offsets: np.ndarray, k: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fingerprints for a batch of docs.

    Returns (fp values u64, per-doc counts) — flatten-friendly for building
    the exploded (bucket_key, url, ...) rows.
    """
    n = offsets.shape[0] - 1
    total = int(offsets[-1]) if n else 0
    if n == 0 or total == 0:
        counts = np.zeros(n, dtype=np.int64)
        vals = np.empty(0, np.uint64)
        # empty docs still get the single whole-doc fingerprint
        chunks = []
        for d in range(n):
            fps = doc_fingerprints(buf[offsets[d] : offsets[d + 1]], k, w)
            counts[d] = fps.shape[0]
            chunks.append(fps)
        if chunks:
            vals = np.concatenate(chunks)
        return _splitmix(vals ^ np.uint64(0x57494E4E4F573737)), counts

    # ONE window-hash pass over the batch's concatenated bytes and ONE
    # global sliding_min; per-doc results are slices of it (every window
    # we select lies fully inside one doc, so cross-doc bytes never leak)
    from hg_dedup_ray.functions.minhash import window_hash_stream

    lens = np.diff(offsets)
    nsh = np.maximum(lens - k + 1, 0)  # valid shingle starts per doc
    nwin = np.maximum(nsh - w + 1, 0)  # fully-inside window starts per doc
    stream = _splitmix(window_hash_stream(buf, total, k))

    sm = sliding_min(stream, w) if total >= w else stream
    starts = offsets[:-1].astype(np.int64)
    tot_win = int(nwin.sum())
    doc_idx = np.repeat(np.arange(n), nwin)
    base = np.repeat(starts, nwin)
    grp0 = np.repeat(np.concatenate(([0], np.cumsum(nwin)))[:-1], nwin)
    vals = sm[base + (np.arange(tot_win) - grp0)] if tot_win else np.empty(0, np.uint64)
    if tot_win:
        # collapse consecutive repeats first: the same window-min persists
        # across ~w adjacent windows, so this shrinks the array ~w/2 x
        # before the (much more expensive) per-doc unique below
        run = np.ones(tot_win, dtype=bool)
        run[1:] = (vals[1:] != vals[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        vals = vals[run]
        doc_idx = doc_idx[run]

    # short docs (no full window): one fingerprint = min over their own
    # shingle hashes (or the whole-doc hash if shorter than k)
    short = np.flatnonzero((nwin == 0) & (lens > 0))
    s_idx = np.empty(short.shape[0], dtype=np.int64)
    s_val = np.empty(short.shape[0], dtype=np.uint64)
    for i, d in enumerate(short):
        s_idx[i] = d
        if nsh[d] > 0:
            s_val[i] = stream[offsets[d] : offsets[d] + nsh[d]].min()
        else:  # 0 < len < k: single whole-doc hash (empty docs emit none)
            piece = buf[offsets[d] : offsets[d + 1]]
            s_val[i] = shingle_hashes(piece, k)[0]
    doc_idx = np.concatenate([doc_idx, s_idx])
    vals = np.concatenate([vals, s_val])

    # per-doc dedupe of selected values (winnowing emits repeats)
    order = np.lexsort((vals, doc_idx))
    di, va = doc_idx[order], vals[order]
    keep = np.ones(di.shape[0], dtype=bool)
    keep[1:] = (di[1:] != di[:-1]) | (va[1:] != va[:-1])
    di, va = di[keep], va[keep]
    counts = np.bincount(di, minlength=n).astype(np.int64)
    # salt so winnow keys can never collide with MinHash band keys if the
    # two streams are ever unioned into one shuffle
    return _splitmix(va ^ np.uint64(0x57494E4E4F573737)), counts
