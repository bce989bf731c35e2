"""SimHash near-dup signatures: 64-bit sign-of-weighted-bit-sums over the
k-gram hash set of each document (Charikar'02). Hamming-close signatures
indicate near-duplicate docs; banding the 64 bits into 4x16-bit keys gives
the LSH shuffle for candidate pairs (docs within Hamming distance 3 share
at least one of 4 bands)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.functions.arrow_utils import string_column_bytes
from hg_dedup_ray.functions.minhash import shingle_hashes


def simhash64(text_bytes: np.ndarray, k: int) -> np.uint64:
    h = shingle_hashes(text_bytes, k) if text_bytes.shape[0] else np.array([np.uint64(0)])
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.shape[0]
    sig_bits = (votes > 0).astype(np.uint8)
    return np.packbits(sig_bits, bitorder="little").view(np.uint64)[0]


def batch_simhash(texts_buf: np.ndarray, doc_offsets: np.ndarray, k: int) -> np.ndarray:
    """SimHash signatures for a batch: ONE rolling-hash pass over the
    concatenated byte stream (same layout as minhash.batch_signatures),
    then a per-doc unpackbits majority vote (vectorized within doc)."""
    from hg_dedup_ray.functions.minhash import _splitmix, window_hash_stream

    n_docs = doc_offsets.shape[0] - 1
    sigs = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return sigs
    total = int(doc_offsets[-1])
    stream = _splitmix(window_hash_stream(texts_buf, total, k))
    lens = np.diff(doc_offsets)
    valid_counts = np.maximum(lens - k + 1, 0)
    for d in range(n_docs):
        s = int(doc_offsets[d])
        m = int(valid_counts[d])
        h = stream[s : s + m] if m else None
        if h is None or m == 0:  # short doc: hash the whole doc
            piece = texts_buf[doc_offsets[d] : doc_offsets[d + 1]]
            h = (
                shingle_hashes(piece, k)
                if piece.shape[0]
                else np.array([np.uint64(0)])
            )
        bits = np.unpackbits(
            np.ascontiguousarray(h).view(np.uint8).reshape(-1, 8),
            axis=1,
            bitorder="little",
        )
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.shape[0]
        sigs[d] = np.packbits(
            (votes > 0).astype(np.uint8), bitorder="little"
        ).view(np.uint64)[0]
    return sigs


class SimHasher:
    """map_batches actor: (doc_id, simhash, band0..band3) rows."""

    def __init__(self, shingle_k: int = 8):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf, offsets = string_column_bytes(batch["text"])
        sigs = batch_simhash(buf, offsets, self.k)
        cols = {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.uint64())}
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF), pa.uint64()
            )
        return pa.table(cols)


class SimHashBandEmitter:
    """map_batches actor: one row per (doc, band) — the LSH explode that
    feeds ``groupby(band_key)``; band index is salted into the key so the
    4 bands occupy disjoint keyspaces."""

    def __init__(self, shingle_k: int = 8):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.functions.minhash import _splitmix

        buf, offsets = string_column_bytes(batch["text"])
        sigs = batch_simhash(buf, offsets, self.k)
        n = sigs.shape[0]
        bands = np.stack(
            [(sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)],
            axis=1,
        )  # (n, 4)
        keys = _splitmix(
            bands ^ (np.arange(4, dtype=np.uint64)[None, :] << np.uint64(48))
        ).reshape(-1)
        idx = np.repeat(np.arange(n), 4)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.uint64()),
                "doc_id": pa.array(ids[idx], pa.int64()),
                "simhash": pa.array(sigs[idx], pa.uint64()),
            }
        )


def simhash_bucket_pairs(max_hamming: int, sig_col: str = "simhash"):
    """map_groups fn over one band bucket: all distinct doc pairs with
    Hamming(sig_col) <= max_hamming. Buckets are 16-bit-collision sets —
    small; pairwise compare within bucket is bounded. Works for any u64
    signature column (simhash, image phash, ...)."""

    def fn(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sigs = group[sig_col].to_numpy(zero_copy_only=False)
        ids, uniq = np.unique(ids, return_index=True)
        sigs = sigs[uniq]
        empty = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        m = ids.shape[0]
        if m < 2:
            return empty
        ham = hamming64(sigs[:, None], sigs[None, :])
        ai, bi = np.nonzero(np.triu(ham <= max_hamming, k=1))
        if ai.size == 0:
            return empty
        return pa.table(
            {
                "doc_id_a": pa.array(ids[ai], pa.int64()),
                "doc_id_b": pa.array(ids[bi], pa.int64()),
                "hamming": pa.array(ham[ai, bi], pa.int64()),
            }
        )

    return fn


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
