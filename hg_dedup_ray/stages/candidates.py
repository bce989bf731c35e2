"""Fused candidate-routing stage: ONE pass over doc texts emits both
MinHash/LSH band rows (near-dup document candidates -> cluster edges) and
winnowing fingerprint rows (substring candidates -> group scans), sharing
one ``groupby(bucket_key)`` shuffle. Kind is encoded in the row (0=band,
1=fingerprint); the two key spaces are salt-separated so buckets never mix.

Replaces the separate MinHashBander + WinnowFingerprinter stages (kept for
direct use/tests) with half the text passes and one less all-to-all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.arrow_utils import string_column_bytes
from hg_dedup_ray.functions.minhash import (
    band_hashes,
    batch_signatures,
    batch_signatures_oph,
)
from hg_dedup_ray.functions.winnow import batch_fingerprints, winnow_params


class CandidateEmitter:
    """map_batches actor: docs -> (bucket_key, kind, url, doc_seq, part)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.kfp, self.w = winnow_params(cfg.minlen, cfg.shingle_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        buf, offsets = string_column_bytes(batch["text"])
        url_col = batch["url"]
        if isinstance(url_col, pa.ChunkedArray):
            url_col = url_col.combine_chunks()
        seqs = batch["doc_seq"].to_numpy(zero_copy_only=False)
        parts = batch["part"].to_numpy(zero_copy_only=False)

        sig_fn = batch_signatures_oph if cfg.minhash_oph else batch_signatures
        sig = sig_fn(buf, offsets, cfg.shingle_k, cfg.num_perm, cfg.minhash_seed)
        bh = band_hashes(sig, cfg.num_bands)  # (n, B)
        B = cfg.num_bands
        fp_vals, fp_counts = batch_fingerprints(buf, offsets, self.kfp, self.w)

        keys = np.concatenate([bh.reshape(-1), fp_vals])
        kinds = np.concatenate(
            [np.zeros(bh.size, np.uint8), np.ones(fp_vals.size, np.uint8)]
        )
        rep_b = np.repeat(np.arange(len(batch)), B)
        rep_f = np.repeat(np.arange(len(batch)), fp_counts)
        idx = np.concatenate([rep_b, rep_f])
        return pa.table(
            {
                "bucket_key": pa.array(keys, pa.uint64()),
                "kind": pa.array(kinds, pa.uint8()),
                # C-level string gather — a numpy object-array fancy index
                # here cost ~3x the whole emit at 40M exploded rows.
                # DICTIONARY-encoded: each doc's url repeats ~(bands +
                # fingerprints) times across its exploded rows, so the
                # dictionary stores it once per block and rows carry an
                # int32 index — ~2.5x smaller candidate blocks, the
                # difference between fitting and spilling to death on
                # the 10M-doc stress probe (r5)
                "url": pc.take(
                    pc.dictionary_encode(url_col), pa.array(idx, pa.int64())
                ),
                "doc_seq": pa.array(seqs[idx], pa.int64()),
                "part": pa.array(parts[idx], pa.int32()),
            }
        )


def chunk_members(order: np.ndarray, max_docs: int) -> list[np.ndarray]:
    """Skew handling: split doc_seq-sorted member indices of an oversized
    (hot-shingle/boilerplate) bucket into chunks that EACH carry the
    bucket's global first member (the keep-first representative).

    Sound for removal semantics: a non-first member's shared window only
    needs SOME earlier doc containing it to be marked, and the earliest
    occurrence is in every chunk. Bounds every downstream mini-corpus
    scan / pair fan-out to ~max_docs regardless of bucket size."""
    m = order.shape[0]
    if m <= max_docs:
        return [order]
    first = order[:1]
    rest = order[1:]
    step = max(max_docs - 1, 1)
    return [
        np.concatenate([first, rest[i : i + step]])
        for i in range(0, rest.shape[0], step)
    ]


def make_bucket_to_candidates(max_docs: int = 256):
    """map_groups fn factory: one bucket -> 0..k candidate rows
    {kind, urls, seqs, parts} (members doc_seq-sorted, deduped; oversized
    buckets chunked via ``chunk_members``).

    Band buckets (kind 0) need >=2 distinct docs; fingerprint buckets
    (kind 1) additionally need >1 partition (same-partition substrings are
    already exact via the partition scan)."""

    def fn(group: pa.Table) -> pa.Table:
        kind = int(group["kind"][0].as_py())
        urls = group["url"].to_numpy(zero_copy_only=False)
        seq = group["doc_seq"].to_numpy(zero_copy_only=False)
        part = group["part"].to_numpy(zero_copy_only=False)
        _, uniq_idx = np.unique(urls, return_index=True)
        empty = pa.table(
            {
                "kind": pa.array([], pa.uint8()),
                "urls": pa.array([], pa.list_(pa.string())),
                "seqs": pa.array([], pa.list_(pa.int64())),
                "parts": pa.array([], pa.list_(pa.int32())),
            }
        )
        if len(uniq_idx) < 2:
            return empty
        if kind == 1 and len(np.unique(part[uniq_idx])) < 2:
            return empty
        order = uniq_idx[np.argsort(seq[uniq_idx], kind="stable")]
        chunks = chunk_members(order, max_docs)
        return pa.table(
            {
                "kind": pa.array([kind] * len(chunks), pa.uint8()),
                "urls": pa.array(
                    [list(urls[c]) for c in chunks], pa.list_(pa.string())
                ),
                "seqs": pa.array(
                    [[int(s) for s in seq[c]] for c in chunks],
                    pa.list_(pa.int64()),
                ),
                "parts": pa.array(
                    [[int(p) for p in part[c]] for c in chunks],
                    pa.list_(pa.int32()),
                ),
            }
        )

    return fn


# default-config instance (back-compat for tests / direct use)
bucket_to_candidates = make_bucket_to_candidates()


def make_coarse_bucket_to_candidates(max_docs: int = 256):
    """map_groups fn factory for COARSE key buckets (``bucket_key % M``):
    one group holds MANY hot buckets; segment by bucket_key internally
    and apply the same per-bucket candidate rules. This is the
    above-driver-limit scale path — Ray's groupby costs one Python call
    PER GROUP, so grouping at hot-key cardinality (millions at 10M+
    docs) is the banned per-group anti-pattern; 128 coarse groups keep
    dispatch constant while the segment loop inside runs at numpy slice
    cost. Found by the 10M-doc stress probe (r5): the fine-grained
    groupby stalled >10 min where the whole 960k-doc run takes ~10 s."""

    def fn(group: pa.Table) -> pa.Table:
        bk = group["bucket_key"].to_numpy(zero_copy_only=False)
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        urls = np.asarray(group["url"].to_pylist(), dtype=object)
        seq = group["doc_seq"].to_numpy(zero_copy_only=False)
        part = group["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(bk, kind="stable")
        bk, kinds, urls, seq, part = (
            bk[order], kinds[order], urls[order], seq[order], part[order]
        )
        starts = np.flatnonzero(
            np.concatenate(([True], bk[1:] != bk[:-1]))
        )
        ends = np.concatenate((starts[1:], [bk.shape[0]]))
        out_kind: list[int] = []
        out_urls: list[list] = []
        out_seqs: list[list] = []
        out_parts: list[list] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            u = urls[s:e]
            _, uniq_idx = np.unique(u, return_index=True)
            if len(uniq_idx) < 2:
                continue
            kind = int(kinds[s])
            p = part[s:e]
            if kind == 1 and len(np.unique(p[uniq_idx])) < 2:
                continue
            sq = seq[s:e]
            morder = uniq_idx[np.argsort(sq[uniq_idx], kind="stable")]
            for c in chunk_members(morder, max_docs):
                out_kind.append(kind)
                out_urls.append(list(u[c]))
                out_seqs.append([int(x) for x in sq[c]])
                out_parts.append([int(x) for x in p[c]])
        return pa.table(
            {
                "kind": pa.array(out_kind, pa.uint8()),
                "urls": pa.array(out_urls, pa.list_(pa.string())),
                "seqs": pa.array(out_seqs, pa.list_(pa.int64())),
                "parts": pa.array(out_parts, pa.list_(pa.int32())),
            }
        )

    return fn


def expand_band_pairs(
    urls: list[str], seqs: list[int], parts: list[int]
) -> list[tuple]:
    """Chain + rep pairing over a doc_seq-sorted band bucket (see
    stages/minhash_stage.bucket_to_pairs for rationale)."""
    m = len(urls)
    out = []
    for i in range(1, m):
        out.append((urls[i - 1], seqs[i - 1], parts[i - 1], urls[i], seqs[i], parts[i]))
    for i in range(2, m):
        out.append((urls[0], seqs[0], parts[0], urls[i], seqs[i], parts[i]))
    return out
