"""Annotate-in-place: run the flagship dedup, then attach its results to
the ORIGINAL dataset rows — every input column (html, warc_ts, lang, any
metadata) passes through untouched and never enters a dedup shuffle.

This is the Parquet-native analogue of the reference's annotate mode
(write_back_to_jsonl_sharded.py:94-101: original doc + sa_remove_ranges),
and the right shape for wide rows at 100 TB: only (url, text) feed the
dedup machinery; the result rides back as a compact broadcast of the
AFFECTED docs (ranges + non-singleton cluster ids), the same boundedness
argument as the pair-verify text broadcast. Swap the broadcast for a
bucketed hash join when the dup set outgrows driver memory
(pipelines/sa_dedup.py docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.arrow_utils import ranges_to_struct_list
from hg_dedup_ray.functions.clip import excise
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset


def collect_annotations(ann_ds, id_col: str = "url"):
    """Compact {id -> (ranges, cluster_id)} for AFFECTED docs only, from a
    dedup_dataset output. Affected = has remove ranges OR a non-singleton
    cluster."""

    def significant(b: pa.Table) -> pa.Table:
        seqs = b["doc_seq"].to_numpy(zero_copy_only=False)
        cid = b["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            b["n_removed_bytes"].to_numpy(zero_copy_only=False) > 0
        ) | (cid != seqs)
        return b.filter(pa.array(keep))

    rows = (
        ann_ds.select_columns(
            ["url", "doc_seq", "sa_remove_ranges", "cluster_id", "n_removed_bytes"]
        )
        .map_batches(significant, batch_format="pyarrow")
        .take_all()
    )
    return {
        r["url"]: (
            [(int(x["start"]), int(x["end"])) for x in r["sa_remove_ranges"]],
            int(r["cluster_id"]),
        )
        for r in rows
    }


def annotate_dataset(ds, cfg: DedupConfig, mode: str | None = None):
    """ds -> ds + (sa_remove_ranges, n_removed_bytes, cluster_id
    [, text_deduped]) with ALL original columns preserved.

    ``mode`` overrides cfg.mode ("annotate" or "remove")."""
    mode = mode or cfg.mode
    assert mode in ("annotate", "remove"), mode
    from dataclasses import replace

    ann = dedup_dataset(ds, replace(cfg, mode="annotate"))
    amap = collect_annotations(ann, cfg.id_col)
    aref = ray.put(amap)
    remove_mode = mode == "remove"
    id_col, seq_col, text_col = cfg.id_col, cfg.seq_col, cfg.text_col

    def attach(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        annotations = get_broadcast(aref)
        ids = batch[id_col].to_pylist()
        seqs = batch[seq_col].to_numpy(zero_copy_only=False)
        n = len(batch)
        counts = np.zeros(n, dtype=np.int64)
        flat_s: list[int] = []
        flat_e: list[int] = []
        removed = np.zeros(n, dtype=np.int64)
        cids = np.empty(n, dtype=np.int64)
        deduped: list[str | None] = [None] * n
        texts = batch[text_col].to_pylist() if remove_mode else None
        for i in range(n):
            ranges, cid = annotations.get(str(ids[i]), ([], int(seqs[i])))
            cids[i] = cid
            counts[i] = len(ranges)
            for s, e in ranges:
                flat_s.append(s)
                flat_e.append(e)
                removed[i] += e - s
            if remove_mode:
                tb = texts[i].encode("utf-8")
                deduped[i] = (
                    excise(tb, ranges).decode("utf-8") if ranges else texts[i]
                )
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        batch = batch.append_column(
            "sa_remove_ranges",
            ranges_to_struct_list(
                offsets,
                np.array(flat_s, dtype=np.int64),
                np.array(flat_e, dtype=np.int64),
            ),
        )
        batch = batch.append_column(
            "n_removed_bytes", pa.array(removed, pa.int64())
        )
        batch = batch.append_column("cluster_id", pa.array(cids, pa.int64()))
        if remove_mode:
            batch = batch.append_column(
                "text_deduped", pa.array(deduped, pa.string())
            )
        return batch

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=cfg.batch_size)
