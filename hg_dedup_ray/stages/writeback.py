"""Writeback stage: merge spans, clip to UTF-8, annotate/remove, attach
cluster ids. Ray-side equivalent of reference
write_back_to_jsonl_sharded.py:58-105 (mode semantics + clip) with the
original-layout JSONL mirroring replaced by Parquet columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.arrow_utils import ranges_to_struct_list
from hg_dedup_ray.functions.clip import clip_doc_ranges, excise
from hg_dedup_ray.functions.pair_scan import union_ranges


def _maybe_get(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _xranges_from_tables(tables) -> dict[str, np.ndarray]:
    """Concatenate span block tables (url, part, start, end) into the
    per-worker url -> ndarray(R,2) lookup. Vectorized: one sort over the
    span rows, sliced at url boundaries."""
    tables = [t for t in tables if t is not None and len(t)]
    if not tables:
        return {}
    tab = pa.concat_tables([t.select(["url", "start", "end"]) for t in tables])
    urls = np.asarray(tab["url"].to_pylist(), dtype=object)
    s = tab["start"].to_numpy(zero_copy_only=False)
    e = tab["end"].to_numpy(zero_copy_only=False)
    order = np.argsort(urls, kind="stable")
    urls, s, e = urls[order], s[order], e[order]
    bounds = np.flatnonzero(np.concatenate(([True], urls[1:] != urls[:-1])))
    out: dict[str, np.ndarray] = {}
    for i, b in enumerate(bounds):
        hi = bounds[i + 1] if i + 1 < len(bounds) else urls.shape[0]
        out[str(urls[b])] = np.stack([s[b:hi], e[b:hi]], axis=1).astype(np.int64)
    return out


class Writeback:
    """map_batches actor over the partition-scan output.

    ``xranges_ref``: broadcast dict url -> ndarray(R,2) of extra
    (cross-partition) doc-relative unclipped ranges.
    ``clusters_ref``: broadcast dict url -> cluster_id.
    """

    def __init__(self, cfg: DedupConfig, xranges_ref=None, clusters_ref=None):
        self.cfg = cfg
        x = _maybe_get(xranges_ref)
        if isinstance(x, tuple) and len(x) == 2 and x[0] == "tables":
            # bucketed dup-set path: span BLOCK REFS (url+ints, no text);
            # fetched zero-copy from the object store once per worker
            import ray

            x = _xranges_from_tables(ray.get(list(x[1])) if x[1] else [])
        self.xranges: dict[str, np.ndarray] = x or {}
        self.clusters: dict[str, int] = _maybe_get(clusters_ref) or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        seqs = batch["doc_seq"].to_numpy(zero_copy_only=False)
        remove_mode = self.cfg.mode == "remove"

        # vectorized fast path: docs with no local ranges and no
        # cross-partition ranges pass through untouched (the overwhelming
        # majority) — only the affected subset pays the per-row merge
        local_counts = pc.list_value_length(batch["rr_starts"]).to_numpy(
            zero_copy_only=False
        )
        affected = local_counts > 0
        if self.xranges:
            has_x = pc.is_in(
                batch["url"],
                value_set=pa.array(list(self.xranges.keys()), pa.string()),
            ).to_numpy(zero_copy_only=False)
            affected = affected | has_x

        counts = np.zeros(n, dtype=np.int64)
        flat_s: list[int] = []
        flat_e: list[int] = []
        n_removed = np.zeros(n, dtype=np.int64)
        deduped_affected: list[str] = []  # remove mode: affected rows only
        if affected.any():
            idx = np.flatnonzero(affected)
            urls_a = batch["url"].take(pa.array(idx)).to_pylist()
            texts_a = batch["text"].take(pa.array(idx)).to_pylist()
            rs_a = batch["rr_starts"].take(pa.array(idx)).to_pylist()
            re_a = batch["rr_ends"].take(pa.array(idx)).to_pylist()
            for j, i in enumerate(idx):
                rs, re_ = rs_a[j], re_a[j]
                xr = self.xranges.get(urls_a[j])
                local = np.array([rs, re_], dtype=np.int64).T.reshape(-1, 2)
                merged = union_ranges([local, xr]) if xr is not None else local
                tb = texts_a[j].encode("utf-8")
                clipped = clip_doc_ranges(
                    tb, [(int(s), int(e)) for s, e in merged]
                )
                counts[i] = len(clipped)
                flat_s.extend(s for s, _ in clipped)
                flat_e.extend(e for _, e in clipped)
                n_removed[i] = sum(e - s for s, e in clipped)
                if remove_mode:
                    deduped_affected.append(excise(tb, clipped).decode("utf-8"))

        list_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        sa_remove_ranges = ranges_to_struct_list(
            list_offsets, np.array(flat_s, dtype=np.int64), np.array(flat_e, dtype=np.int64)
        )
        if self.clusters:
            urls = batch["url"].to_pylist()
            cluster_id = np.array(
                [self.clusters.get(u, int(s)) for u, s in zip(urls, seqs)],
                dtype=np.uint64,
            )
        else:  # no cross-partition clusters: every doc is its own cluster
            cluster_id = seqs.astype(np.uint64)
        cols = {
            "url": batch["url"],
            "doc_seq": batch["doc_seq"],
            "part": batch["part"],
            "text": batch["text"],
            "n_bytes": batch["n_bytes"],
            "sa_remove_ranges": sa_remove_ranges,
            "n_removed_bytes": pa.array(n_removed, pa.int64()),
            "cluster_id": pa.array(cluster_id, pa.uint64()),
        }
        if remove_mode:
            # untouched rows reuse the input text buffer; only the affected
            # subset materializes Python strings (replace_with_mask keeps
            # the rest zero-copy — no full-column to_pylist)
            text_arr = batch["text"]
            if isinstance(text_arr, pa.ChunkedArray):
                text_arr = text_arr.combine_chunks()
            if affected.any():
                cols["text_deduped"] = pc.replace_with_mask(
                    text_arr,
                    pa.array(affected),
                    pa.array(deduped_affected, pa.string()),
                )
            else:
                cols["text_deduped"] = text_arr
        return pa.table(cols)
