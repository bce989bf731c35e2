"""Vectorized whitespace-token hashing and word-n-gram hashing.

Word-level analogue of ``functions/minhash.shingle_hashes`` (which works on
byte shingles): tokens are whitespace-split (``pc.ascii_split_whitespace``,
matching the DuckDB oracles' ``regexp_split_to_array(trim(text), '\\s+')``),
each token gets a u64 polynomial hash over its bytes, and an n-gram hash
combines n consecutive token hashes — all with numpy segment arithmetic, no
Python per row/token.

u64 hash identity stands in for string identity downstream (doc-frequency
counts, HLL distinct sketches). Collisions are possible in principle
(~2^-64 per pair); every consumer documents that assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hg_dedup_ray.functions.arrow_utils import string_column_bytes

_P = np.uint64(1099511628211)       # FNV-64 prime as polynomial base
_Q = np.uint64(0x9E3779B97F4A7C15)  # golden-gamma base for gram combine
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

# power table, grown on demand (tokens are short; grams are <= 8 tokens).
# u64 wraparound is the intended ring arithmetic throughout this module.
_POW_P = np.ones(64, np.uint64)
with np.errstate(over="ignore"):
    for _i in range(1, 64):
        _POW_P[_i] = _POW_P[_i - 1] * _P


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def _pow_table(n: int) -> np.ndarray:
    global _POW_P
    with np.errstate(over="ignore"):
        while _POW_P.shape[0] <= n:
            ext = np.empty(_POW_P.shape[0] * 2, np.uint64)
            ext[: _POW_P.shape[0]] = _POW_P
            for i in range(_POW_P.shape[0], ext.shape[0]):
                ext[i] = ext[i - 1] * _P
            _POW_P = ext
    return _POW_P


def token_hashes(tokens: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """u64 hash per token string: polynomial over utf-8 bytes + splitmix.

    Fully vectorized: one flat byte buffer, exponent = position-from-end
    within each token, one ``np.add.reduceat`` segment sum (mod-2^64
    wraparound is the intended ring arithmetic).
    """
    data, offsets = string_column_bytes(tokens)
    n = offsets.shape[0] - 1
    if n == 0:
        return np.empty(0, np.uint64)
    lens = np.diff(offsets)
    if data.shape[0] == 0:  # all-empty tokens (not produced by whitespace split)
        return _splitmix(np.zeros(n, np.uint64))
    pow_tab = _pow_table(int(lens.max()) + 1)
    pos = np.arange(data.shape[0], dtype=np.int64) - np.repeat(offsets[:-1], lens)
    expo = np.repeat(lens, lens) - 1 - pos
    prod = data.astype(np.uint64) * pow_tab[expo]
    sums = np.zeros(n, np.uint64)
    nz = lens > 0
    # reduceat needs strictly valid segment starts; empty segments handled
    # by masking (they keep hash 0 pre-mix)
    if nz.any():
        starts = offsets[:-1][nz]
        red = np.add.reduceat(prod, starts)
        sums[nz] = red
    # length-salt so "a" and "\x00a" style prefixes can't alias
    return _splitmix(sums + lens.astype(np.uint64) * _Q)


def doc_tokens_full(
    text_col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat token u64 hashes, flat token char lengths, int64 doc offsets
    (n_docs+1,)) for a text column, using the oracle-compatible whitespace
    split. Lengths are CHARACTER counts (``pc.utf8_length``) to match the
    DuckDB oracles' ``length(w)``."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(text_col))
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_off = np.zeros(counts.shape[0] + 1, np.int64)
    np.cumsum(counts, out=doc_off[1:])
    # empty/whitespace-only docs split to [''] — drop those empty tokens
    # and zero their doc's count
    flat_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    if (flat_lens == 0).any():
        nonempty = flat_lens > 0
        flat = flat.filter(pa.array(nonempty))
        docs_rep = np.repeat(
            np.arange(counts.shape[0], dtype=np.int64), counts
        )
        counts = counts - np.bincount(
            docs_rep[~nonempty], minlength=counts.shape[0]
        ).astype(np.int64)
        np.cumsum(counts, out=doc_off[1:])
        flat_lens = flat_lens[nonempty]
    th = token_hashes(flat)
    return th, flat_lens, doc_off


def doc_tokens(text_col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat token u64 hashes, int64 doc offsets (n_docs+1,)) for a text
    column, using the oracle-compatible whitespace split."""
    th, _lens, doc_off = doc_tokens_full(text_col)
    return th, doc_off


def word_gram_hashes(
    tok_hash: np.ndarray, doc_off: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """u64 hashes of all word n-grams, flat across docs.

    Returns (gram_hashes, gram_doc_off) where gram_doc_off[d] delimits doc
    d's grams; a doc with fewer than n tokens contributes zero grams.
    Combine is a polynomial in _Q over the n consecutive token hashes,
    evaluated with n shifted vectorized adds (no per-gram loop).
    """
    total = tok_hash.shape[0]
    counts = np.diff(doc_off)
    gcounts = np.maximum(counts - (n - 1), 0)
    gram_off = np.zeros(counts.shape[0] + 1, np.int64)
    np.cumsum(gcounts, out=gram_off[1:])
    m_total = int(gram_off[-1])
    if m_total == 0:
        return np.empty(0, np.uint64), gram_off
    if total >= n:
        acc = np.zeros(total - (n - 1), np.uint64)
        q = np.uint64(1)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc += tok_hash[j : total - (n - 1) + j] * q
                q = q * _Q
    else:
        acc = np.empty(0, np.uint64)
    # select positions that don't cross a doc boundary: flat start index i
    # belongs to doc d iff i < doc_off[d+1] - (n-1)
    docs_rep = np.repeat(np.arange(counts.shape[0], dtype=np.int64), gcounts)
    starts = doc_off[:-1][docs_rep] + (
        np.arange(m_total, dtype=np.int64) - gram_off[:-1][docs_rep]
    )
    return _splitmix(acc[starts]), gram_off


def distinct_per_doc(
    grams: np.ndarray, gram_off: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc distinct gram hashes (flat) + new offsets — one lexsort
    over (doc, gram), no per-doc Python."""
    counts = np.diff(gram_off)
    docs_rep = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
    if grams.shape[0] == 0:
        return grams, gram_off
    order = np.lexsort((grams, docs_rep))
    g_s, d_s = grams[order], docs_rep[order]
    keep = np.ones(g_s.shape[0], bool)
    keep[1:] = (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])
    g_u, d_u = g_s[keep], d_s[keep]
    new_counts = np.bincount(d_u, minlength=counts.shape[0]).astype(np.int64)
    new_off = np.zeros(counts.shape[0] + 1, np.int64)
    np.cumsum(new_counts, out=new_off[1:])
    return g_u, new_off
