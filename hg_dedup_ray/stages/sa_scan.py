"""Per-partition suffix-array index + dedup scan as a ``map_groups`` task.

Replaces the reference's shard index build (external `rust_indexing`,
reference indexing_v6_sharded.py:222-252) + in-process scan
(`find_remove_ranges`, cpp_engine_dedup.h:215-302). One task per
order-contiguous partition: sort docs by doc_seq, concatenate
``\\xff + text`` bytes, build the SA, run the vectorized scan, scatter the
coalesced ranges back to per-doc UNclipped doc-relative ranges.

Emitted schema: url, doc_seq, part, text, n_bytes,
rr_starts:list<int64>, rr_ends:list<int64>.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.functions.clip import scatter_ranges_to_docs
from hg_dedup_ray.functions.scan import find_remove_ranges
from hg_dedup_ray.functions.suffix_array import build_suffix_array


def texts_to_corpus(text_col: pa.ChunkedArray | pa.Array):
    """Build the sentinel-joined corpus directly from Arrow string buffers
    (no per-row Python bytes objects).

    Returns (corpus uint8, doc_text_starts, doc_text_ends) — layout as
    reference indexing_v6_sharded.py:46-56."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    data, offsets = string_column_bytes(text_col)
    n = offsets.shape[0] - 1
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64), np.empty(0, np.int64)
    lens = np.diff(offsets)
    total = int(lens.sum())
    corpus = np.empty(total + n, dtype=np.uint8)
    sent_pos = np.concatenate(([0], np.cumsum(lens[:-1] + 1)))
    corpus[sent_pos] = 0xFF
    starts = sent_pos + 1
    ends = starts + lens
    for d in range(n):  # n memcpy's, no Python bytes materialization
        corpus[starts[d] : ends[d]] = data[offsets[d] : offsets[d + 1]]
    return corpus, starts, ends


def tokens_to_corpus(
    text_col: pa.ChunkedArray | pa.Array, tokenizer, reverse: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Token-mode corpus (reference u16/u32 path, indexing_v6_sharded.py:
    282-292): each doc contributes ``sentinel_token + tokens`` in doc_seq
    order. Returns (corpus, token_starts, token_ends, byte_lens)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.scan import sentinel_value
    from hg_dedup_ray.functions.tokenize import reverse_doc_tokens

    data, offsets = string_column_bytes(text_col)
    n = offsets.shape[0] - 1
    dt = tokenizer.dtype
    if n == 0:
        z = np.empty(0, np.int64)
        return np.empty(0, dt), z, z.copy(), z.copy()
    byte_lens = np.diff(offsets).astype(np.int64)
    toks = [
        tokenizer.encode(bytes(data[offsets[d] : offsets[d + 1]])) for d in range(n)
    ]
    if reverse:
        toks = [reverse_doc_tokens(t) for t in toks]
    tok_lens = np.fromiter((t.shape[0] for t in toks), count=n, dtype=np.int64)
    sent_pos = np.concatenate(([0], np.cumsum(tok_lens[:-1] + 1)))
    starts = sent_pos + 1
    ends = starts + tok_lens
    corpus = np.empty(int(ends[-1]) if n else 0, dtype=dt)
    corpus[sent_pos] = np.array(sentinel_value(dt), dt)
    for d in range(n):
        corpus[starts[d] : ends[d]] = toks[d]
    return corpus, starts, ends, byte_lens


def make_partition_scan(
    minlen: int,
    token_dtype: str = "u8",
    tokenizer_name: str = "bytepair",
    reverse: bool = False,
    scan_kernel: str = "hash",
):
    """map_groups fn over one partition's docs (pyarrow batch).

    token_dtype "u8" scans the raw utf-8 byte corpus (minlen in bytes —
    the reference's only production mode); "u16"/"u32" scan a TOKEN corpus
    (minlen in tokens, reference tokenizer path). ``reverse`` indexes each
    doc's reversed sequence (reference ``--reversed``) and maps ranges
    back to forward coordinates. Emitted rr_starts/rr_ends are always
    forward BYTE offsets, so writeback is mode-agnostic.

    ``scan_kernel`` picks the dedup kernel: "hash" (default, SA-free
    window grouping — byte-identical output, faster) or "sa" (full
    suffix-array formulation)."""

    def partition_scan(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_seq")
        n = len(group)
        tok = None
        if token_dtype == "u8":
            if reverse:
                corpus, starts, ends, byte_lens = _u8_reversed_corpus(group["text"])
            else:
                corpus, starts, ends = texts_to_corpus(group["text"])
                byte_lens = (ends - starts).astype(np.int64)
        else:
            from hg_dedup_ray.functions.tokenize import get_tokenizer

            tok = get_tokenizer(tokenizer_name)
            assert np.dtype(tok.dtype).itemsize == {"u16": 2, "u32": 4}[token_dtype]
            corpus, starts, ends, byte_lens = tokens_to_corpus(
                group["text"], tok, reverse
            )
        if corpus.shape[0] == 0:
            ranges = np.empty((0, 2), dtype=np.int64)
        elif scan_kernel == "hash":
            from hg_dedup_ray.functions.scan import find_remove_ranges_hashed

            ranges = find_remove_ranges_hashed(corpus, minlen)
        else:
            sa = build_suffix_array(corpus)
            ranges = find_remove_ranges(corpus, sa, minlen)
        doc_ix = scatter_ranges_to_docs(ranges, starts, ends)
        # per-doc doc-relative ranges as two parallel list<int64> columns
        counts = np.bincount(doc_ix, minlength=n) if n else np.zeros(0, np.int64)
        list_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        order = np.argsort(doc_ix, kind="stable")
        rs = (ranges[order, 0] - starts[doc_ix[order]]).astype(np.int64)
        re_ = (ranges[order, 1] - starts[doc_ix[order]]).astype(np.int64)
        if reverse or tok is not None:
            rs, re_ = _to_forward_byte_ranges(
                rs, re_, doc_ix[order], byte_lens, (ends - starts), tok, reverse
            )
        rr_starts = pa.ListArray.from_arrays(
            pa.array(list_offsets, pa.int32()), pa.array(rs, pa.int64())
        )
        rr_ends = pa.ListArray.from_arrays(
            pa.array(list_offsets, pa.int32()), pa.array(re_, pa.int64())
        )
        return pa.table(
            {
                "url": group["url"],
                "doc_seq": group["doc_seq"],
                "part": group["part"],
                "text": group["text"],
                "n_bytes": group["n_bytes"],
                "rr_starts": rr_starts,
                "rr_ends": rr_ends,
            }
        )

    return partition_scan


def _u8_reversed_corpus(text_col):
    """u8 corpus with each doc's BYTES reversed (reference --reversed,
    indexing_v6_sharded.py:49). Same layout as texts_to_corpus."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    data, offsets = string_column_bytes(text_col)
    n = offsets.shape[0] - 1
    if n == 0:
        z = np.empty(0, np.int64)
        return np.empty(0, np.uint8), z, z.copy(), z.copy()
    lens = np.diff(offsets)
    total = int(lens.sum())
    corpus = np.empty(total + n, dtype=np.uint8)
    sent_pos = np.concatenate(([0], np.cumsum(lens[:-1] + 1)))
    corpus[sent_pos] = 0xFF
    starts = sent_pos + 1
    ends = starts + lens
    for d in range(n):
        corpus[starts[d] : ends[d]] = data[offsets[d] : offsets[d + 1]][::-1]
    return corpus, starts, ends, lens.astype(np.int64)


def _to_forward_byte_ranges(
    rs: np.ndarray,
    re_: np.ndarray,
    doc_ix: np.ndarray,
    byte_lens: np.ndarray,
    unit_lens: np.ndarray,
    tok,
    reverse: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Doc-relative scan-unit ranges -> forward BYTE ranges.

    1. reverse mode: [s, e) in reversed coords -> [L - e, L - s)
       (L = doc length in scan units);
    2. token mode: token range x token width, clamped to the doc's true
       byte length (the final token may be zero-padded);
    3. re-sort ascending within each doc (unreversing flips order).
    """
    if rs.shape[0] == 0:
        return rs, re_
    if reverse:
        L = unit_lens[doc_ix]
        rs, re_ = L - re_, L - rs
    if tok is not None:
        w = tok.width
        nb = byte_lens[doc_ix]
        rs = np.minimum(rs * w, nb)
        re_ = np.minimum(re_ * w, nb)
    order = np.lexsort((rs, doc_ix))
    return rs[order].astype(np.int64), re_[order].astype(np.int64)
