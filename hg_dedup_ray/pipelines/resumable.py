"""Resumable flagship run: partition = unit of work AND unit of recovery.

``run_dedup_resumable(input_paths, output_dir, cfg)`` executes the same
dataflow as ``sa_dedup.dedup_dataset`` but checkpoints:

- the cross-partition candidate stage (whole-stage artifact: xranges +
  clusters parquet + manifest), and
- every partition (scan -> merge -> writeback -> its own parquet file,
  written atomically, plus a manifest with lineage + metrics).

A rerun after a crash loads the manifests, skips completed partitions
(and the candidate stage), and processes only what is missing — the Ray
analogue of the reference's "skip if output exists" re-entrancy
(reference indexing_v6_sharded.py:201-203,225-227) with the lineage and
metrics the rebuild contract requires.

Scale notes: one task per partition writes one file under
``output_dir/part={p}/`` — a failed 100 TB run resumes at partition
granularity; nothing global is rewritten. Manifests are tiny JSON; the
driver only ever materializes the per-partition METRICS rows (one per
partition), never data.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.sa_dedup import (
    compute_cross_partition,
    extract_docs,
)
from hg_dedup_ray.state import checkpoint as ck
from hg_dedup_ray.stages.writeback import Writeback


def _make_partition_processor(
    cfg: DedupConfig, output_dir: str, cfg_hash: str, input_files,
    xranges_ref, clusters_ref, ckpt_dir: str, input_sizes: dict,
):
    """map_groups fn: one partition -> (write parquet + manifest) -> 1
    metrics row. The manifest is written IN the task, atomically, right
    after the partition's parquet lands — a run killed mid-way keeps a
    durable record of every finished partition, so resume is partition-
    granular for real crashes, not only for post-hoc manifest surgery
    (exercised by tests/test_resume.py kill-k test)."""

    def process(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from hg_dedup_ray.functions.scan import find_remove_ranges
        from hg_dedup_ray.functions.suffix_array import build_suffix_array
        from hg_dedup_ray.functions.clip import scatter_ranges_to_docs
        from hg_dedup_ray.stages.sa_scan import texts_to_corpus

        part = int(group["part"][0].as_py())
        # crash injection for the kill-k resume test: when the flag file
        # exists, partitions >= its value die before doing any work,
        # like a mid-run SIGKILL (a FILE, not an env var — long-lived
        # Ray workers snapshot env at spawn, the file is read fresh
        # every task). The short sleep lets concurrently-running
        # healthy partitions finish (and write their durable manifests)
        # before the abort tears the execution down — the realistic
        # crash timeline.
        _flag = os.path.join(ckpt_dir, "FAIL_PARTS_GE")
        if os.path.exists(_flag):
            with open(_flag) as fh:
                k = int(fh.read().strip())
            if part >= k:
                time.sleep(4)
                raise RuntimeError(f"injected crash before part {part}")
        group = group.sort_by("doc_seq")
        t0 = time.time()
        corpus, starts, ends = texts_to_corpus(group["text"])
        if corpus.shape[0]:
            sa = build_suffix_array(corpus)
        t_sa = time.time()
        if corpus.shape[0]:
            ranges = find_remove_ranges(corpus, sa, cfg.minlen)
        else:
            ranges = np.empty((0, 2), dtype=np.int64)
        t_scan = time.time()

        n = len(group)
        doc_ix = scatter_ranges_to_docs(ranges, starts, ends)
        counts = np.bincount(doc_ix, minlength=n) if n else np.zeros(0, np.int64)
        list_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        order = np.argsort(doc_ix, kind="stable")
        rs = (ranges[order, 0] - starts[doc_ix[order]]).astype(np.int64)
        re_ = (ranges[order, 1] - starts[doc_ix[order]]).astype(np.int64)
        scanned = pa.table(
            {
                "url": group["url"],
                "doc_seq": group["doc_seq"],
                "part": group["part"],
                "text": group["text"],
                "n_bytes": group["n_bytes"],
                "rr_starts": pa.ListArray.from_arrays(
                    pa.array(list_offsets, pa.int32()), pa.array(rs, pa.int64())
                ),
                "rr_ends": pa.ListArray.from_arrays(
                    pa.array(list_offsets, pa.int32()), pa.array(re_, pa.int64())
                ),
            }
        )
        wb = Writeback(cfg, xranges_ref, clusters_ref)
        # hive layout: the part={p} directory name carries the column
        final = wb(scanned).drop_columns(["part"])

        part_dir = os.path.join(output_dir, f"part={part}")
        os.makedirs(part_dir, exist_ok=True)
        out_file = os.path.join(part_dir, "data.parquet")
        tmp = out_file + ".tmp"
        pq.write_table(final, tmp)
        os.replace(tmp, out_file)
        t_write = time.time()

        urls = group["url"].to_pylist()
        nb = group["n_bytes"].to_numpy(zero_copy_only=False)
        seqs = group["doc_seq"].to_numpy(zero_copy_only=False)
        m = ck.PartitionManifest(
            part=part,
            cfg_hash=cfg_hash,
            input_files=list(input_files),
            doc_seq_min=int(seqs.min()) if n else 0,
            doc_seq_max=int(seqs.max()) if n else 0,
            n_docs=n,
            corpus_bytes=int(corpus.shape[0]),
            content_hash=ck.content_hash(urls, nb),
            n_local_ranges=int(ranges.shape[0]),
            n_removed_bytes=int(
                final["n_removed_bytes"].to_numpy(zero_copy_only=False).sum()
            ),
            sa_build_s=round(t_sa - t0, 4),
            scan_s=round(t_scan - t_sa, 4),
            write_s=round(t_write - t_scan, 4),
            output_file=out_file,
            input_sizes=input_sizes,
        )
        # durable record first (atomic JSON), metrics row second
        ck.write_part_manifest(ckpt_dir, m)
        from dataclasses import asdict

        # input_files/input_sizes are driver-known; keep the metrics row
        # arrow-friendly (no dict columns)
        row = {
            k: [v]
            for k, v in asdict(m).items()
            if k not in ("input_files", "input_sizes")
        }
        row["input_files"] = [list(input_files)]
        return pa.table(row)

    return process


def run_dedup_resumable(
    input_paths, output_dir: str, cfg: DedupConfig, columns=None
) -> dict:
    """Run (or resume) the flagship dedup; returns a run summary dict."""
    ckpt_dir = cfg.checkpoint_dir or os.path.join(output_dir, "_ckpt")
    cfgh = ck.cfg_fingerprint(cfg)

    ds = ray.data.read_parquet(input_paths, columns=columns)
    if cfg.num_partitions == 0:  # auto-size from data volume
        from dataclasses import replace

        from hg_dedup_ray.stages.extract import resolve_num_partitions

        cfg = replace(cfg, num_partitions=resolve_num_partitions(ds, cfg))
        cfgh = ck.cfg_fingerprint(cfg)
    try:
        input_files = sorted(ds.input_files())
    except Exception:
        input_files = list(np.atleast_1d(input_paths))
    sizes = ck.input_sizes(input_files)
    docs = extract_docs(ds, cfg)
    completed = ck.load_completed_parts(ckpt_dir, cfg, sizes)
    multi = cfg.num_partitions > 1
    need_candidates = multi and ck.load_candidates(ckpt_dir, cfg, sizes) is None
    todo_unknown = len(completed) < cfg.num_partitions
    if multi and (need_candidates or todo_unknown):
        docs = docs.materialize()

    # --- cross-partition stage (whole-stage checkpoint) ------------------
    xranges_ref = clusters_ref = None
    if multi:
        cached = ck.load_candidates(ckpt_dir, cfg, sizes)
        if cached is None:
            t0 = time.time()
            xranges, clusters = compute_cross_partition(docs, cfg)
            ck.save_candidates(
                ckpt_dir, cfg, xranges, clusters,
                metrics={"stage_s": round(time.time() - t0, 3)},
                input_sizes_map=sizes,
            )
        else:
            xranges, clusters = cached
        xranges_ref = ray.put(xranges)
        clusters_ref = ray.put(clusters)

    # --- per-partition scan + writeback, skipping completed --------------
    done_parts = frozenset(completed)
    processed = []
    if todo_unknown:
        todo = docs
        if done_parts:
            done_ref = ray.put(done_parts)

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                done = ray.get(done_ref) if isinstance(done_ref, ray.ObjectRef) else done_ref
                return batch.filter(
                    pc.invert(
                        pc.is_in(
                            batch["part"],
                            value_set=pa.array(sorted(done), pa.int32()),
                        )
                    )
                )

            todo = todo.map_batches(drop_done, batch_format="pyarrow")
        metrics = todo.groupby("part").map_groups(
            _make_partition_processor(
                cfg, output_dir, cfgh, input_files, xranges_ref,
                clusters_ref, ckpt_dir, sizes,
            ),
            batch_format="pyarrow",
        )
        # manifests are written IN the partition tasks (crash-durable);
        # the driver only collects the one-row-per-partition metrics
        for row in metrics.take_all():
            processed.append(int(row["part"]))

    all_manifests = ck.load_completed_parts(ckpt_dir, cfg)
    return {
        "output_dir": output_dir,
        "checkpoint_dir": ckpt_dir,
        "cfg_hash": cfgh,
        "parts_total": len(all_manifests),
        "parts_processed_this_run": sorted(processed),
        "parts_skipped_this_run": sorted(done_parts),
        "n_docs": sum(m["n_docs"] for m in all_manifests.values()),
        "corpus_bytes": sum(m["corpus_bytes"] for m in all_manifests.values()),
        "n_removed_bytes": sum(
            m["n_removed_bytes"] for m in all_manifests.values()
        ),
    }
