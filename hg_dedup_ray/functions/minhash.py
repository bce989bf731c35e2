"""MinHash / LSH kernels — pure numpy, batch-vectorized.

The reference receives MinHash-deduped input from an upstream system
(reference README.md:17 "minhash/jacc_filter", aws_workflow.sh:3) — the
north_star folds that stage into OUR scope: byte-shingle MinHash signatures
+ LSH banding route candidate duplicate docs across partitions, replacing
the reference's in-process cross-shard SA pseudo-merge
(reference cpp_engine_dedup.h:502-799) with an explicit groupby shuffle.

All kernels operate on a whole batch of documents at once:
``batch_signatures`` loops over permutations (128), not over documents,
using ``np.minimum.reduceat`` over the concatenated shingle-hash stream.
"""

from __future__ import annotations

import numpy as np

_FNV = np.uint64(1099511628211)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — cheap high-quality u64 mixing."""
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


# FNV is odd -> invertible mod 2^64; enables the O(total) prefix-sum form
# of the k-byte polynomial window hash below
_FNV_INV = np.uint64(pow(int(_FNV), -1, 1 << 64))
_POW_CACHE: dict[str, np.ndarray] = {}


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(FNV^t, FNV^-t) power tables, grown geometrically and cached per
    worker process."""
    pw = _POW_CACHE.get("pow")
    if pw is None or pw.shape[0] < n:
        m = max(n, 2 * (pw.shape[0] if pw is not None else 0), 1 << 16)
        pw = np.empty(m, np.uint64)
        pv = np.empty(m, np.uint64)
        pw[0] = pv[0] = 1
        np.cumprod(np.full(m - 1, _FNV, np.uint64), out=pw[1:])
        np.cumprod(np.full(m - 1, _FNV_INV, np.uint64), out=pv[1:])
        _POW_CACHE["pow"], _POW_CACHE["pinv"] = pw, pv
    return _POW_CACHE["pow"], _POW_CACHE["pinv"]


def window_hash_stream(buf: np.ndarray, total: int, k: int) -> np.ndarray:
    """h[i] = sum_{j<k} buf[i+j] * FNV^(k-1-j)  (mod 2^64) for every
    i in [0, total), with zero padding past the buffer end — bit-identical
    to the naive k-pass rolling loop, but O(total) independent of k via
    modular prefix sums (FNV^-1 exists mod 2^64):

        S[t] = sum_{u<t} buf[u] * FNV^-u ;  h[i] = (S[i+k]-S[i]) * FNV^(i+k-1)

    The k-pass loop costs k full-buffer multiply-adds (k = minlen/2 = 250
    at the reference's production minlen=500); this costs ~4 passes flat.
    """
    if total <= 0:
        return np.zeros(0, np.uint64)
    if k < 12:  # measured crossover: the k-pass loop wins for tiny k
        pad = np.zeros(k - 1, dtype=np.uint8) if k > 1 else np.empty(0, np.uint8)
        b8 = np.concatenate([buf[:total], pad]) if k > 1 else buf[:total]
        s = np.zeros(total, np.uint64)
        for j in range(k):
            s = s * _FNV + b8[j : j + total].astype(np.uint64)
        return s
    ext = total + k - 1
    b = np.zeros(ext, np.uint64)
    b[:total] = buf[:total]
    pw, pv = _powers(ext + 1)
    S = np.empty(ext + 1, np.uint64)
    S[0] = 0
    np.cumsum(b * pv[:ext], out=S[1:])  # wraps mod 2^64
    return (S[k : k + total] - S[:total]) * pw[k - 1 : k - 1 + total]


def shingle_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """u64 rolling polynomial hashes of all k-byte shingles of ``data``.
    Docs shorter than k yield one hash over the whole (padded) doc."""
    n = data.shape[0]
    if n < k:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            h = h * _FNV + np.uint64(data[j])
        return _splitmix(h)
    m = n - k + 1
    return _splitmix(window_hash_stream(data, n, k)[:m])


def batch_signatures(
    texts_buf: np.ndarray,
    doc_offsets: np.ndarray,
    k: int,
    num_perm: int,
    seed: int,
) -> np.ndarray:
    """MinHash signatures for a batch of docs, shape (n_docs, num_perm).

    ``texts_buf`` is the concatenation of all docs' utf-8 bytes;
    ``doc_offsets`` (n_docs+1,) delimits each doc. Work is vectorized per
    PERMUTATION over the entire batch's shingle stream.
    """
    n_docs = doc_offsets.shape[0] - 1
    sig = np.full((n_docs, num_perm), U64_MAX, dtype=np.uint64)
    if n_docs == 0:
        return sig
    total = int(doc_offsets[-1])
    # one window-hash pass over the whole batch buffer (zero-padded so
    # every position has a window), then mask shingles crossing doc bounds
    stream = _splitmix(window_hash_stream(texts_buf, total, k))
    # invalid: positions whose k-window crosses the NEXT doc boundary
    lens = np.diff(doc_offsets)
    valid_counts = np.maximum(lens - k + 1, 0)
    invalid_mask = np.ones(total, dtype=bool)
    for d in range(n_docs):  # cheap slice-assign per doc
        invalid_mask[doc_offsets[d] : doc_offsets[d] + valid_counts[d]] = False
    invalid_idx = np.flatnonzero(invalid_mask)
    # reduceat over NONEMPTY docs only (their starts are strictly
    # increasing and < total); a clamp of trailing empty-doc starts would
    # split the preceding doc's segment. Empty docs stay U64_MAX here and
    # are overwritten by the valid_counts==0 loop below.
    nz = np.flatnonzero(lens > 0)
    starts = doc_offsets[:-1][nz].astype(np.int64)
    rng = np.random.default_rng(seed)
    # odd multipliers: multiplication mod 2^64 by an odd constant is a
    # bijection of the (already splitmix-mixed) stream — one pass per perm
    salts = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    for p in range(num_perm):
        permuted = stream * salts[p]
        permuted[invalid_idx] = U64_MAX
        if nz.size:
            sig[nz, p] = np.minimum.reduceat(permuted, starts)
    # docs with no valid shingle (len < k, incl. empty): hash the whole doc
    for d in np.flatnonzero(valid_counts == 0):
        piece = texts_buf[doc_offsets[d] : doc_offsets[d + 1]]
        h = shingle_hashes(piece, k) if piece.shape[0] else np.array([np.uint64(0)])
        sig[d, :] = np.uint64(h[0]) * salts
    return sig


def batch_signatures_oph(
    texts_buf: np.ndarray,
    doc_offsets: np.ndarray,
    k: int,
    num_perm: int,
    seed: int,
) -> np.ndarray:
    """One-Permutation Hashing MinHash (Li, Owen & Zhang '12) with
    rotation densification (Shrivastava & Li '14): ONE pass over the
    shingle stream — each hash lands in bin ``h >> (64-log2(P))`` and the
    per-(doc, bin) minimum is the signature slot; empty bins borrow the
    next non-empty bin's value (rotating), preserving the unbiased
    Jaccard estimate. ~num_perm x less work than k independent
    permutations; same (n_docs, num_perm) contract as batch_signatures.
    """
    assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of 2"
    n_docs = doc_offsets.shape[0] - 1
    sig = np.full((n_docs, num_perm), U64_MAX, dtype=np.uint64)
    if n_docs == 0:
        return sig
    total = int(doc_offsets[-1])
    seed_mix = np.uint64((int(seed) * int(_MIX1)) & 0xFFFFFFFFFFFFFFFF)
    stream = _splitmix(window_hash_stream(texts_buf, total, k) ^ seed_mix)

    lens = np.diff(doc_offsets)
    valid_counts = np.maximum(lens - k + 1, 0)
    pbits = int(num_perm).bit_length() - 1
    bins = (stream >> np.uint64(64 - pbits)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs), lens)
    valid = np.zeros(total, dtype=bool)
    for d in range(n_docs):  # cheap slice-assign per doc
        valid[doc_offsets[d] : doc_offsets[d] + valid_counts[d]] = True
    di, bi, hv = doc_idx[valid], bins[valid], stream[valid]
    # min per (doc, bin): single minimum.at scatter (C-speed ufunc)
    np.minimum.at(sig, (di, bi), hv)

    # docs with no valid shingle (len < k, incl empty): whole-doc hash
    for d in np.flatnonzero(valid_counts == 0):
        piece = texts_buf[doc_offsets[d] : doc_offsets[d + 1]]
        h = shingle_hashes(piece, k) if piece.shape[0] else np.array([np.uint64(0)])
        hh = _splitmix(np.uint64(h[0]) ^ seed_mix)
        sig[d, int(hh >> np.uint64(64 - pbits))] = hh

    # rotation densification: empty bins take the value of the next
    # non-empty bin to the right (cyclically), offset-mixed so two docs
    # that share only non-empty bins don't spuriously match on empties
    empty = sig == U64_MAX
    if empty.any():
        filled = sig.copy()
        for shift in range(1, num_perm):
            rolled = np.roll(sig, -shift, axis=1)
            take = (filled == U64_MAX) & (rolled != U64_MAX)
            if take.any():
                shift_mix = np.uint64((int(shift) * int(_MIX2)) & 0xFFFFFFFFFFFFFFFF)
                filled[take] = _splitmix(rolled[take] + shift_mix)
            if not (filled == U64_MAX).any():
                break
        sig = filled
    return sig


def band_hashes(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys, shape (n_docs, num_bands): docs equal in any band
    become groupby-shuffle candidates."""
    n_docs, num_perm = sig.shape
    r = num_perm // num_bands
    bands = sig.reshape(n_docs, num_bands, r)
    h = np.zeros((n_docs, num_bands), dtype=np.uint64)
    for j in range(r):
        h = h * _FNV + bands[:, :, j]
    # fold in the band index so identical row-slices in different bands
    # don't collide into one bucket
    h = _splitmix(h ^ np.arange(num_bands, dtype=np.uint64)[None, :])
    return h


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate = fraction of agreeing permutations."""
    return float(np.mean(sig_a == sig_b))


def oph_band_keys(sig: np.ndarray, num_bands: int, band_r: int) -> np.ndarray:
    """(n, num_bands) u64 LSH band bucket keys over OPH signature rows:
    iterated splitmix fold of each band's r sig words, salted with the
    band index (golden gamma) so identical slices in different bands
    don't collide. Injective stand-in for the r-tuple (~2^-64/pair); the
    DuckDB oracles key on the exact tuple via string_agg. Single source
    of truth for minhash_band_clusters / lsh_recall_report /
    minhash_jaccard_estimate_pairs / near_dedup_keep_first."""
    n = sig.shape[0]
    bands = sig.reshape(n, num_bands, band_r)
    key = np.full((n, num_bands), np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        key = key + np.arange(num_bands, dtype=np.uint64)[None, :]
        for j in range(band_r):
            key = _splitmix(key ^ bands[:, :, j])
    return key


def make_band_rows(
    k: int = 16,
    num_perm: int = 128,
    seed: int = 42,
    num_bands: int = 32,
    band_r: int = 4,
    id_col: str = "doc_id",
):
    """map_batches fn factory: text batches -> long (bkey:u64, doc_id)
    rows at the production OPH + banding config (one row per (doc,
    band))."""
    import pyarrow as pa

    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    def band_rows(batch: "pa.Table") -> "pa.Table":
        buf, off = string_column_bytes(batch["text"])
        sig = batch_signatures_oph(buf, off, k, num_perm, seed)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = oph_band_keys(sig, num_bands, band_r)
        return pa.table(
            {
                "bkey": pa.array(key.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, num_bands), pa.int64()),
            }
        )

    return band_rows
