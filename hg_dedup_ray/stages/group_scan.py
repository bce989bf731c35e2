"""Cross-partition span confirmation: mini-corpus SA scans per candidate
group.

Every winnowing bucket whose members span >1 partition becomes a candidate
GROUP; the group's docs (in doc_seq order) form a mini-corpus which is run
through the exact partition-scan kernels (suffix array + run detection +
keep-first + coalesce, reference cpp_engine_dedup.h:215-302 semantics).
Spans found for any non-first member are sound w.r.t. the reference's
global scan (an equal window exists in an earlier doc), and the winnowing
guarantee (functions/winnow.py) makes every >=minlen cross-partition
duplicate region land in some common bucket — group scanning is therefore
robust where pairwise chaining is not (an unrelated doc sharing only the
selected k-gram cannot break the group's internal matches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.clip import scatter_ranges_to_docs
from hg_dedup_ray.functions.corpus import build_corpus
from hg_dedup_ray.functions.scan import find_remove_ranges
from hg_dedup_ray.functions.suffix_array import build_suffix_array


def mini_corpus_scan(texts: list[bytes], cfg: DedupConfig) -> list[tuple[int, int, int]]:
    """Scan one mini-corpus (texts in doc_seq order) with the SAME mode
    (token_dtype / tokenizer / reverse) as the partition scan, returning
    (doc_ix, byte_start, byte_end) doc-relative FORWARD ranges."""
    from hg_dedup_ray.stages.sa_scan import (
        _to_forward_byte_ranges,
        tokens_to_corpus,
    )

    tok = None
    if cfg.token_dtype == "u8" and not cfg.reverse:
        corpus, starts, ends = build_corpus(texts)
        byte_lens = (ends - starts).astype(np.int64)
    else:
        import pyarrow as _pa

        col = _pa.array([t.decode("utf-8") for t in texts], _pa.string())
        if cfg.token_dtype == "u8":
            from hg_dedup_ray.stages.sa_scan import _u8_reversed_corpus

            corpus, starts, ends, byte_lens = _u8_reversed_corpus(col)
        else:
            from hg_dedup_ray.functions.tokenize import get_tokenizer

            tok = get_tokenizer(cfg.tokenizer)
            corpus, starts, ends, byte_lens = tokens_to_corpus(col, tok, cfg.reverse)
    if corpus.shape[0] == 0:
        return []
    if cfg.scan_kernel == "hash":
        from hg_dedup_ray.functions.scan import find_remove_ranges_hashed

        ranges = find_remove_ranges_hashed(corpus, cfg.minlen)
    else:
        sa = build_suffix_array(corpus)
        ranges = find_remove_ranges(corpus, sa, cfg.minlen)
    if ranges.shape[0] == 0:
        return []
    doc_ix = scatter_ranges_to_docs(ranges, starts, ends)
    order = np.argsort(doc_ix, kind="stable")
    rs = (ranges[order, 0] - starts[doc_ix[order]]).astype(np.int64)
    re_ = (ranges[order, 1] - starts[doc_ix[order]]).astype(np.int64)
    d_o = doc_ix[order]
    if cfg.reverse or tok is not None:
        rs, re_ = _to_forward_byte_ranges(
            rs, re_, d_o, byte_lens, (ends - starts), tok, cfg.reverse
        )
    return [(int(d), int(s), int(e)) for d, s, e in zip(d_o, rs, re_)]


class GroupScanner:
    """map_batches actor over candidate-group rows.

    Each input row: {"urls": list[str] sorted by doc_seq}. Texts come from
    the broadcast dup-set dict (ray.put once, ray.get per actor).
    Output rows: (url, start, end) doc-relative unclipped remove ranges.
    """

    def __init__(self, cfg: DedupConfig, texts_ref):
        import ray

        self.cfg = cfg
        self.texts: dict[str, str] = (
            ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_urls: list[str] = []
        out_s: list[int] = []
        out_e: list[int] = []
        for urls in batch["urls"].to_pylist():
            texts = [self.texts[u].encode("utf-8") for u in urls]
            for d, s, e in mini_corpus_scan(texts, self.cfg):
                out_urls.append(urls[d])
                out_s.append(s)
                out_e.append(e)
        return pa.table(
            {
                "url": pa.array(out_urls, pa.string()),
                "start": pa.array(out_s, pa.int64()),
                "end": pa.array(out_e, pa.int64()),
            }
        )


def bucket_to_group(group: pa.Table) -> pa.Table:
    """One winnow bucket -> zero or one candidate-group row.

    Emits only when the bucket spans >1 distinct doc and >1 partition
    (same-partition duplicates are already exact via the partition scan).
    Members are doc_seq-sorted so the mini-corpus keep-first order equals
    global document order.
    """
    urls = group["url"].to_numpy(zero_copy_only=False)
    seq = group["doc_seq"].to_numpy(zero_copy_only=False)
    part = group["part"].to_numpy(zero_copy_only=False)
    _, uniq_idx = np.unique(urls, return_index=True)
    if len(uniq_idx) < 2 or len(np.unique(part[uniq_idx])) < 2:
        return pa.table({"urls": pa.array([], pa.list_(pa.string()))})
    order = uniq_idx[np.argsort(seq[uniq_idx], kind="stable")]
    return pa.table({"urls": pa.array([list(urls[order])], pa.list_(pa.string()))})
