"""Vectorized Bloom filter over u64 keys — the broadcast-membership
structure for decontamination / incremental dedup at 100 TB.

A benchmark (eval-set) n-gram table or a previously-indexed corpus's
shingle set is built ONCE into a fixed-size bit array, shipped to every
worker via ``ray.put``, and queried per batch with pure numpy gathers —
no shuffle, no per-row Python, memory fixed regardless of corpus size.

Double hashing (Kirsch-Mitzenmacher): position_i = h1 + i*h2 (mod m),
h1/h2 both splitmix64-derived, h2 forced odd, giving k independent-enough
probes from two hashes. At the default 12 bits/key, k=8 the false-positive
rate is ~5e-4; callers that need exactness (the DuckDB-oracle-checked
queries) use an exact u64 set below ``EXACT_LIMIT`` keys and fall back to
bloom + exact-verify above it.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_SALT2 = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _MIX1
        x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for each key's k probes."""
    keys = np.ascontiguousarray(keys, np.uint64)
    h1 = _splitmix(keys)
    with np.errstate(over="ignore"):
        h2 = _splitmix(keys ^ _SALT2) | np.uint64(1)
        pos = (
            h1[:, None]
            + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None]
        )
    return (pos % np.uint64(m_bits)).astype(np.int64)


def bloom_build(
    keys: np.ndarray, bits_per_key: int = 12, k: int = 8
) -> np.ndarray:
    """Build a Bloom bitset (uint8 array) over u64 ``keys``.

    Size is ``bits_per_key * max(len(keys), 1)`` bits rounded up to a
    byte; the array is what you ``ray.put`` once and read in every task.
    """
    n = max(int(keys.shape[0]), 1)
    m_bits = ((bits_per_key * n + 7) // 8) * 8
    bitset = np.zeros(m_bits // 8, np.uint8)
    if keys.shape[0]:
        pos = _probe_positions(keys, m_bits, k).ravel()
        np.bitwise_or.at(
            bitset, pos >> 3, np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        )
    return bitset


def bloom_query(bitset: np.ndarray, keys: np.ndarray, k: int = 8) -> np.ndarray:
    """bool mask: True where the key is possibly in the set (all k bits
    set); False means definitely absent. Vectorized gather, no loops."""
    if keys.shape[0] == 0:
        return np.zeros(0, bool)
    m_bits = bitset.shape[0] * 8
    pos = _probe_positions(keys, m_bits, k)
    byte = bitset[pos >> 3]
    bit = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
    return ((byte & bit) != 0).all(axis=1)
