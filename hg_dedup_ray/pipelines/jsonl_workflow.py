"""The reference's end-to-end user journey on Ray Data: a directory tree
of JSONL docs in -> substring dedup -> the SAME tree out, with duplicate
ranges excised (``mode="remove"``) or annotated as ``sa_remove_ranges``
(``mode="annotate"``) — reference README.md:23-30 / workflow_toy.sh.

Dataflow: read_jsonl (S1/S2) -> dedup_dataset (flagship) -> collect the
ANNOTATIONS of affected docs only (ranges + non-singleton cluster ids; no
text) -> broadcast -> finalize map_batches over the ORIGINAL rows
(preserving opaque metadata verbatim) -> write_jsonl (S4).

The annotation broadcast is bounded by the dup set, like the pair-verify
texts broadcast; at a scale where it outgrows driver memory, swap for the
bucketed hash join described in pipelines/sa_dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.clip import excise
from hg_dedup_ray.pipelines.annotate import collect_annotations
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
from hg_dedup_ray.sources.jsonl import read_jsonl, write_jsonl


def run_jsonl_dedup(
    in_root: str,
    out_root: str,
    minlen: int = 100,
    num_partitions: int = 8,
    mode: str = "annotate",
) -> list[str]:
    """Dedup a JSONL tree; returns the relative paths written."""
    assert mode in ("annotate", "remove"), mode
    cfg = DedupConfig(
        minlen=minlen,
        num_partitions=num_partitions,
        mode="annotate",  # ranges computed once; excision applied below
        id_col="doc_seq",
        seq_col="doc_seq",
        text_col="text",
    )
    src = read_jsonl(in_root)
    ann = dedup_dataset(src, cfg)
    # keyed by url == str(doc_seq) here (id_col="doc_seq")
    amap_s = collect_annotations(ann, cfg.id_col)
    amap = {int(k): v for k, v in amap_s.items()}
    aref = ray.put(amap)
    remove_mode = mode == "remove"

    def finalize(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        annotations = get_broadcast(aref)
        seqs = batch["doc_seq"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_text: list[str] = []
        out_ranges: list[list[list[int]]] = []
        out_cid: list[int] = []
        for i, s in enumerate(seqs):
            ranges, cid = annotations.get(int(s), ([], int(s)))
            out_cid.append(cid)
            if remove_mode and ranges:
                out_text.append(
                    excise(texts[i].encode("utf-8"), ranges).decode("utf-8")
                )
                out_ranges.append([])
            else:
                out_text.append(texts[i])
                out_ranges.append([[s_, e_] for s_, e_ in ranges])
        cols = {
            "path": batch["path"],
            "linenum": batch["linenum"],
            "doc_seq": batch["doc_seq"],
            "text": pa.array(out_text, pa.string()),
            "metadata": batch["metadata"],
            "cluster_id": pa.array(out_cid, pa.int64()),
        }
        if not remove_mode:
            cols["sa_remove_ranges"] = pa.array(
                out_ranges, pa.list_(pa.list_(pa.int64()))
            )
        return pa.table(cols)

    final = src.map_batches(finalize, batch_format="pyarrow")
    return write_jsonl(final, out_root)
