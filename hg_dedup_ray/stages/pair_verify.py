"""Candidate-pair verification stage (cluster edges).

For each LSH candidate pair (A earlier than B in global order) compute the
exact k-shingle Jaccard — the clustering edge weight. Duplicate SPANS are
handled separately by the winnow bucket group scans (stages/group_scan.py).

Texts for pair endpoints are BROADCAST: ``ray.put`` once on the driver,
``ray.get`` once per actor in ``__init__`` — never re-shipped per batch.
Only docs that appear in candidate pairs are broadcast (the dup set, a
small fraction of the corpus). At 100 TB scale with a huge dup set this
becomes a bucketed hash join on url; see pipelines/sa_dedup.py docstring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.minhash import shingle_hashes


class PairVerifier:
    def __init__(self, cfg: DedupConfig, texts_ref):
        import ray

        self.cfg = cfg
        self.texts: dict[str, str] = (
            ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        )
        self._shingle_cache: dict[str, np.ndarray] = {}

    def _shingles(self, url: str, text: bytes) -> np.ndarray:
        h = self._shingle_cache.get(url)
        if h is None:
            arr = np.frombuffer(text, dtype=np.uint8)
            h = np.unique(shingle_hashes(arr, self.cfg.shingle_k)) if arr.size else np.empty(0, np.uint64)
            self._shingle_cache[url] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        jac = np.zeros(len(batch), dtype=np.float64)
        for i in range(len(batch)):
            ua = batch["url_a"][i].as_py()
            ub = batch["url_b"][i].as_py()
            sa_ = self._shingles(ua, self.texts[ua].encode("utf-8"))
            sb_ = self._shingles(ub, self.texts[ub].encode("utf-8"))
            inter = np.intersect1d(sa_, sb_, assume_unique=True).shape[0]
            union = sa_.shape[0] + sb_.shape[0] - inter
            jac[i] = inter / union if union else 1.0
        return pa.table(
            {
                "url_a": batch["url_a"],
                "seq_a": batch["seq_a"],
                "url_b": batch["url_b"],
                "seq_b": batch["seq_b"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
