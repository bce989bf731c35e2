"""Winnowing fingerprint stage: docs -> exploded (bucket_key, url, doc_seq,
part) rows for the substring-candidate shuffle. Actor pool like the
MinHash stage; (k, w) derived from cfg.minlen (detection guarantee
w + k - 1 <= minlen, see functions/winnow.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.arrow_utils import string_column_bytes
from hg_dedup_ray.functions.winnow import batch_fingerprints, winnow_params


class WinnowFingerprinter:
    def __init__(self, cfg: DedupConfig):
        self.k, self.w = winnow_params(cfg.minlen, cfg.shingle_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf, offsets = string_column_bytes(batch["text"])
        values, counts = batch_fingerprints(buf, offsets, self.k, self.w)
        return pa.table(
            {
                "bucket_key": pa.array(values, pa.uint64()),
                "url": pa.array(
                    np.repeat(batch["url"].to_numpy(zero_copy_only=False), counts)
                ),
                "doc_seq": pa.array(
                    np.repeat(batch["doc_seq"].to_numpy(zero_copy_only=False), counts),
                    pa.int64(),
                ),
                "part": pa.array(
                    np.repeat(batch["part"].to_numpy(zero_copy_only=False), counts),
                    pa.int32(),
                ),
            }
        )
