"""Partition-corpus construction: docs -> sentinel-joined byte corpus.

Reference layout (indexing_v6_sharded.py:46-56): each doc contributes
``b"\\xff" + utf8(text)``; docs concatenated in global document order.
``offsets[d]`` is the position of doc d's sentinel; the doc's text span is
``[offsets[d] + 1, offsets[d+1])`` with an implicit final bound at corpus
end (reference cpp_engine_dedup.h:869-896 `get_doc_by_ix`).
"""

from __future__ import annotations

import numpy as np

SENTINEL_BYTE = b"\xff"


def build_corpus(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (corpus uint8 array, doc_text_starts, doc_text_ends).

    doc_text_starts/ends delimit each doc's text bytes (sentinel excluded).
    """
    lens = np.fromiter((len(t) for t in texts), count=len(texts), dtype=np.int64)
    sent_pos = np.concatenate(([0], np.cumsum(lens[:-1] + 1))) if len(texts) else np.empty(0, np.int64)
    starts = sent_pos + 1
    ends = starts + lens
    corpus = np.frombuffer(SENTINEL_BYTE + SENTINEL_BYTE.join(texts), dtype=np.uint8) if texts else np.empty(0, np.uint8)
    return corpus, starts, ends
