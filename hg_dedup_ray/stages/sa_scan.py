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


def make_partition_scan(minlen: int):
    """map_groups fn over one partition's docs (pyarrow batch)."""

    def partition_scan(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_seq")
        corpus, starts, ends = texts_to_corpus(group["text"])
        n = len(group)
        if corpus.shape[0] == 0:
            ranges = np.empty((0, 2), dtype=np.int64)
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
