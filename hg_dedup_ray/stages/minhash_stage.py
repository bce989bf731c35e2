"""MinHash signature + LSH banding stages (cross-partition candidate routing).

Actor-pool stage: the permutation salts / config live in the actor
(``__init__`` once per actor), each ``__call__`` vectorizes over a batch.
Band rows explode each doc into ``num_bands`` (band_key, url, doc_seq,
part) rows; a ``groupby("band_key")`` shuffle co-locates collision buckets;
``bucket_to_pairs`` emits candidate pairs against the bucket's
doc_seq-minimum representative (O(bucket) pairs, not O(bucket^2) — the
skew-proof pairing for hot buckets; north_rule "skew-aware salting").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.arrow_utils import string_column_bytes
from hg_dedup_ray.functions.minhash import (
    band_hashes,
    batch_signatures,
    batch_signatures_oph,
)


class MinHashBander:
    """map_batches actor: docs -> exploded LSH band rows."""

    def __init__(self, cfg: DedupConfig):
        self.k = cfg.shingle_k
        self.num_perm = cfg.num_perm
        self.num_bands = cfg.num_bands
        self.seed = cfg.minhash_seed
        self.sig_fn = batch_signatures_oph if cfg.minhash_oph else batch_signatures

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf, doc_offsets = string_column_bytes(batch["text"])
        sig = self.sig_fn(buf, doc_offsets, self.k, self.num_perm, self.seed)
        bh = band_hashes(sig, self.num_bands)  # (n, B)
        B = self.num_bands
        return pa.table(
            {
                "bucket_key": pa.array(bh.reshape(-1), pa.uint64()),
                "url": pa.array(np.repeat(batch["url"].to_numpy(zero_copy_only=False), B)),
                "doc_seq": pa.array(
                    np.repeat(batch["doc_seq"].to_numpy(zero_copy_only=False), B), pa.int64()
                ),
                "part": pa.array(
                    np.repeat(batch["part"].to_numpy(zero_copy_only=False), B), pa.int32()
                ),
            }
        )


def bucket_to_pairs(group: pa.Table) -> pa.Table:
    """One bucket (LSH band or winnow fingerprint) -> candidate pairs.

    Pairing = CHAIN + REP over members sorted by doc_seq: each member pairs
    with its doc_seq predecessor (chain) and with the bucket's doc_seq
    minimum (rep). Linear in bucket size — hot buckets (the reference's
    'hot prefix' skew, FIXTURES.md §2.8) cost O(n) pairs, not O(n^2) —
    while the chain keeps recall when an unrelated doc shares the bucket
    key but not the duplicated region.
    Emits (url_a, seq_a, part_a, url_b, seq_b, part_b) with a = earlier doc.
    """
    n = len(group)
    if n < 2:
        return _empty_pairs()
    urls = group["url"].to_numpy(zero_copy_only=False)
    seq = group["doc_seq"].to_numpy(zero_copy_only=False)
    part = group["part"].to_numpy(zero_copy_only=False)
    # dedupe multiple rows of the same doc within one bucket
    _, uniq_idx = np.unique(urls, return_index=True)
    m = len(uniq_idx)
    if m < 2:
        return _empty_pairs()
    urls, seq, part = urls[uniq_idx], seq[uniq_idx], part[uniq_idx]
    order = np.argsort(seq, kind="stable")
    urls, seq, part = urls[order], seq[order], part[order]
    # chain: (i-1, i) for i in 1..m-1 ; rep: (0, i) for i in 2..m-1
    a_idx = np.concatenate([np.arange(m - 1), np.zeros(max(m - 2, 0), np.int64)])
    b_idx = np.concatenate([np.arange(1, m), np.arange(2, m)])
    return pa.table(
        {
            "url_a": pa.array(urls[a_idx]),
            "seq_a": pa.array(seq[a_idx], pa.int64()),
            "part_a": pa.array(part[a_idx], pa.int32()),
            "url_b": pa.array(urls[b_idx]),
            "seq_b": pa.array(seq[b_idx], pa.int64()),
            "part_b": pa.array(part[b_idx], pa.int32()),
        }
    )


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "url_a": pa.array([], pa.string()),
            "seq_a": pa.array([], pa.int64()),
            "part_a": pa.array([], pa.int32()),
            "url_b": pa.array([], pa.string()),
            "seq_b": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int32()),
        }
    )
