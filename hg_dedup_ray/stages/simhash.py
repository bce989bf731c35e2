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
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for b in np.flatnonzero(votes > 0):
        sig |= np.uint64(1) << np.uint64(b)
    return sig


class SimHasher:
    """map_batches actor: (doc_id, simhash, band0..band3) rows."""

    def __init__(self, shingle_k: int = 8):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf, offsets = string_column_bytes(batch["text"])
        n = offsets.shape[0] - 1
        sigs = np.zeros(n, dtype=np.uint64)
        for d in range(n):
            sigs[d] = simhash64(buf[offsets[d] : offsets[d + 1]], self.k)
        cols = {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.uint64())}
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF), pa.uint64()
            )
        return pa.table(cols)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
