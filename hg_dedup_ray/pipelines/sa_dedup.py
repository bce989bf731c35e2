"""The flagship pipeline: suffix-array substring dedup, Ray-Data-first.

Dataflow (SURVEY.md §7):

    read_parquet (pruned cols)
      -> extract map_batches          (project, n_bytes, contiguous part id)
      -> groupby(part).map_groups     (per-partition SA index + scan)   [shuffle 1]
      -> MinHash map_batches (actors) -> LSH band explode
      -> groupby(band_key)            (candidate buckets)               [shuffle 2]
      -> rep-pairing -> groupby(pair) dedupe                            [shuffle 3, small]
      -> PairVerifier map_batches     (broadcast texts of dup-set only)
      -> driver union-find (small edge set) -> broadcast cluster ids
      -> Writeback map_batches        (merge + clip + annotate/remove)
      -> write_parquet(partition_cols=["part"])                        [resumable layout]

Scale notes:
- Shuffles 2/3 move only (u64 key, url, seq, part) rows — never text.
- Texts are broadcast ONLY for docs appearing in candidate pairs (the dup
  set). If the dup set itself outgrows driver memory, swap the broadcast
  for a bucketed hash join: add bucket=hash(url)%B to pairs and docs,
  groupby(bucket) both, join per bucket — same pattern, no driver state.
- The partition scan holds one partition corpus in task memory; cap it
  with cfg.target_partition_bytes / num_partitions at scale.
"""

from __future__ import annotations

import numpy as np

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.stages.extract import make_extract_fn, seq_bounds
from hg_dedup_ray.stages.candidates import (
    CandidateEmitter,
    bucket_to_candidates,
    expand_band_pairs,
)
from hg_dedup_ray.stages.group_scan import GroupScanner, bucket_to_group
from hg_dedup_ray.stages.minhash_stage import MinHashBander, bucket_to_pairs, dedupe_pairs
from hg_dedup_ray.stages.winnow_stage import WinnowFingerprinter
from hg_dedup_ray.stages.pair_verify import PairVerifier
from hg_dedup_ray.stages.sa_scan import make_partition_scan
from hg_dedup_ray.stages.writeback import Writeback
from hg_dedup_ray.state.cluster import union_find_clusters


def _pool(cfg: DedupConfig, key: str) -> tuple[int, int]:
    """Actor-pool sizing: autoscale 1..k where k leaves headroom for the
    read/shuffle stages (a pool whose MIN size equals the cluster CPU count
    deadlocks the streaming executor waiting for actors)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    k = cfg.extra.get(key, max(1, cpus - 1))
    return (1, max(1, min(k, cpus - 1)))


def extract_docs(ds, cfg: DedupConfig):
    """read -> (url, doc_seq, part, text, n_bytes) dataset."""
    mn, mx = seq_bounds(ds, cfg)
    return ds.map_batches(
        make_extract_fn(cfg, mn, mx), batch_format="pyarrow", batch_size=cfg.batch_size
    )


def candidate_pairs(docs, cfg: DedupConfig):
    """MinHash/LSH banding -> deduped near-dup DOC pairs (cluster edges)."""
    bands = docs.map_batches(
        MinHashBander,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(cfg, "minhash_concurrency"),
    )
    pairs = bands.groupby("bucket_key").map_groups(bucket_to_pairs, batch_format="pyarrow")
    return pairs.groupby(["url_a", "url_b"]).map_groups(dedupe_pairs, batch_format="pyarrow")


def candidate_groups(docs, cfg: DedupConfig):
    """Winnowing fingerprints -> cross-partition candidate GROUPS.

    Any >=minlen shared substring region is guaranteed a common bucket
    (w + k - 1 <= minlen, functions/winnow.py); buckets spanning >1
    partition become doc_seq-sorted groups for mini-corpus SA scans.
    """
    winnows = docs.map_batches(
        WinnowFingerprinter,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(cfg, "winnow_concurrency"),
    )
    return winnows.groupby("bucket_key").map_groups(bucket_to_group, batch_format="pyarrow")


def compute_cross_partition(docs, cfg: DedupConfig):
    """Cross-partition stage: (xranges, clusters) dicts.

    ONE fused pass emits band + fingerprint rows; ONE shuffle buckets
    them; the driver receives compact candidate rows (urls/seqs only),
    then dup-set texts are broadcast once for group scans + pair verify.

    Returns ``(xranges: dict[url, ndarray(R,2)], clusters: dict[url, int])``.
    """
    cand = docs.map_batches(
        CandidateEmitter,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(cfg, "candidate_concurrency"),
    )
    cand_rows = (
        cand.groupby("bucket_key")
        .map_groups(bucket_to_candidates, batch_format="pyarrow")
        .take_all()
    )
    pair_set: set[tuple] = set()
    group_set: set[tuple] = set()
    for r in cand_rows:
        if not r["urls"]:
            continue
        if r["kind"] == 0:
            pair_set.update(expand_band_pairs(r["urls"], r["seqs"], r["parts"]))
        else:
            group_set.add(tuple(r["urls"]))
    pair_rows = [
        {
            "url_a": a, "seq_a": sa_, "part_a": pa_,
            "url_b": b, "seq_b": sb_, "part_b": pb_,
        }
        for (a, sa_, pa_, b, sb_, pb_) in sorted(pair_set)
    ]
    groups = sorted(group_set)
    urls_needed = {r["url_a"] for r in pair_rows} | {r["url_b"] for r in pair_rows}
    urls_needed.update(u for g in groups for u in g)
    xranges: dict[str, np.ndarray] = {}
    edges: list[tuple] = []
    if urls_needed:
        texts_ref = ray.put(_collect_texts(docs, urls_needed))

        if groups:
            span_rows = (
                ray.data.from_items([{"urls": list(g)} for g in groups])
                .map_batches(
                    GroupScanner,
                    fn_constructor_args=(cfg, texts_ref),
                    batch_format="pyarrow",
                    batch_size=64,
                    concurrency=_pool(cfg, "group_scan_concurrency"),
                )
                .take_all()
            )
            for r in span_rows:
                rr = np.array([[r["start"], r["end"]]], dtype=np.int64)
                prev = xranges.get(r["url"])
                xranges[r["url"]] = (
                    np.concatenate([prev, rr]) if prev is not None else rr
                )

        if pair_rows:
            verified = (
                ray.data.from_items(pair_rows)
                .map_batches(
                    PairVerifier,
                    fn_constructor_args=(cfg, texts_ref),
                    batch_format="pyarrow",
                    batch_size=256,
                    concurrency=_pool(cfg, "verify_concurrency"),
                )
                .take_all()
            )
            edges = [
                (r["url_a"], r["url_b"], r["seq_a"], r["seq_b"])
                for r in verified
                if r["jaccard"] >= cfg.jaccard_threshold
            ]
    clusters = union_find_clusters(edges)
    return xranges, clusters


def dedup_dataset(ds, cfg: DedupConfig):
    """Full dedup: input dataset -> annotated/deduped docs dataset."""
    docs = extract_docs(ds, cfg)
    if cfg.num_partitions > 1:
        # docs feeds three consumers (scan, banding, dup-set text fetch);
        # pin the pruned projection once instead of re-running the read +
        # extract per consumer. Blocks spill to disk under memory pressure.
        docs = docs.materialize()
    scanned = docs.groupby("part").map_groups(
        make_partition_scan(cfg.minlen), batch_format="pyarrow"
    )

    # --- cross-partition candidates (skipped when only one partition:
    # the partition scan is already globally exact) -----------------------
    xranges_ref = None
    clusters_ref = None
    if cfg.num_partitions > 1:
        xranges, clusters = compute_cross_partition(docs, cfg)
        xranges_ref = ray.put(xranges)
        clusters_ref = ray.put(clusters)

    return scanned.map_batches(
        Writeback,
        fn_constructor_args=(cfg, xranges_ref, clusters_ref),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(cfg, "writeback_concurrency"),
    )


def _collect_texts(docs, urls_needed: set[str]) -> dict[str, str]:
    """Texts of the dup set only, via a filtered streaming pass."""
    import pyarrow.compute as pc

    url_arr = list(urls_needed)

    def pick(batch):
        mask = pc.is_in(batch["url"], value_set=__import__("pyarrow").array(url_arr))
        return batch.filter(mask)

    out: dict[str, str] = {}
    for b in (
        docs.select_columns(["url", "text"])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=4096, batch_format="pyarrow")
    ):
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist()):
            out[u] = t
    return out


def run_dedup(input_paths, output_dir: str, cfg: DedupConfig, columns=None):
    """read_parquet -> dedup -> partitioned parquet (one dir per part)."""
    ds = ray.data.read_parquet(input_paths, columns=columns)
    out = dedup_dataset(ds, cfg)
    out.write_parquet(output_dir, partition_cols=["part"])
    return output_dir
