"""CLI entry point — ``python -m hg_dedup_ray``.

Mirrors the reference's argparse surface (indexing_v6_sharded.py:256-271,
find_remove_ranges.py:7-15, write_back_to_jsonl_sharded.py:11-17 — data
dirs, minlen, mode, token_dtype, tokenizer, --reversed, cpus, batch
size) re-expressed over the Ray pipelines: one command runs the full
read -> dedup -> write journey that the reference splits across three
step scripts.

    python -m hg_dedup_ray --data_dir pages/ --save_dir out/ \
        --minlen 500 --mode remove --format parquet
    python -m hg_dedup_ray --data_dir corpus_jsonl/ --save_dir out/ \
        --format jsonl --minlen 100 --mode annotate
    python -m hg_dedup_ray ... --token_dtype u16 --tokenizer bytepair
    python -m hg_dedup_ray ... --resumable     # checkpointed, rerun-safe

Cluster deployment (the north-rule `ray job submit` path): the job
driver inherits $RAY_ADDRESS from the submission environment and joins
the fixed-size cluster — same command line, nothing else changes:

    ray job submit --working-dir . -- python -m hg_dedup_ray \
        --data_dir s3://pages/ --save_dir s3://out/ --minlen 500 \
        --mode remove --resumable   # rerun skips finished partitions

This module OWNS the Ray session (init + shutdown); the library never
calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hg_dedup_ray",
        description="Ray-Data suffix/substring dedup (keep-first) over "
        "parquet or jsonl corpora.",
    )
    p.add_argument("--data_dir", required=True,
                   help="Input corpus: a parquet dir/file or a jsonl tree.")
    p.add_argument("--save_dir", default=None,
                   help="Output directory (partitioned parquet, or a "
                   "mirrored jsonl tree with --format jsonl). Required "
                   "except with --check_query.")
    p.add_argument("--format", default="parquet", choices=["parquet", "jsonl"])
    p.add_argument("--minlen", type=int, default=100,
                   help="Minimum duplicate length, in corpus units "
                   "(bytes for u8, tokens for u16/u32).")
    p.add_argument("--mode", default="annotate", choices=["annotate", "remove"],
                   help="annotate = attach sa_remove_ranges; remove = also "
                   "emit text with the ranges excised.")
    p.add_argument("--token_dtype", default="u8", choices=["u8", "u16", "u32"])
    p.add_argument("--tokenizer", default="bytepair",
                   help="u16/u32 tokenizer: bytepair | bytequad | a HF name "
                   "(gpt2/llama/olmo; needs transformers).")
    p.add_argument("--reversed", dest="reverse", action="store_true",
                   help="Index each document's reversed sequence.")
    p.add_argument("--scan_kernel", default="hash", choices=["hash", "sa"])
    p.add_argument("--partitions", type=int, default=0,
                   help="Corpus partitions (0 = auto-size from data volume).")
    p.add_argument("--batch_size", type=int, default=None,
                   help="Rows per map_batches batch (default: config).")
    p.add_argument("--cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all).")
    p.add_argument("--ray_address", default=None,
                   help="Ray cluster address. Default: $RAY_ADDRESS if "
                   "set (e.g. under `ray job submit`, which injects it "
                   "so the driver joins the submitting cluster), else "
                   "'local'. --cpus is ignored on a real cluster.")
    p.add_argument("--text_col", default="text")
    p.add_argument("--id_col", default="url")
    p.add_argument("--seq_col", default="doc_seq",
                   help="Global order column (int64); derived if absent.")
    p.add_argument("--resumable", action="store_true",
                   help="Checkpointed parquet run (skips finished "
                   "partitions on rerun).")
    p.add_argument("--run_query", default=None, metavar="NAME",
                   help="Run a registered operator instead of the dedup "
                   "journey: --data_dir is the table directory, the "
                   "result writes to save_dir as partitioned parquet. "
                   "'list' prints all registered names.")
    p.add_argument("--check_query", default=None, metavar="NAME",
                   nargs="+",
                   help="Validate operators against their DuckDB oracles "
                   "over --data_dir's parquet tables (driver-identical "
                   "rows/schema/dtypes/value-hash compare; 'all' checks "
                   "every registered query). Prints one JSON report; "
                   "exit 1 on any mismatch/error.")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.save_dir and not args.check_query and args.run_query != "list":
        parser.error("--save_dir is required except with --check_query")
    import ray

    if not ray.is_initialized():
        import os

        addr = args.ray_address or os.environ.get("RAY_ADDRESS") or "local"
        kw = {}
        if addr == "local":
            # a private local cluster: size + dashboard are ours to set
            kw["include_dashboard"] = False
            if args.cpus:
                kw["num_cpus"] = args.cpus
        ray.init(address=addr, **kw)
    try:
        if args.check_query:
            from hg_dedup_ray.tools.oracle_check import check_queries

            names = (None if args.check_query == ["all"]
                     else args.check_query)
            report = check_queries(args.data_dir, names)
            print(json.dumps(report))
            return 0 if report["mismatch"] + report["error"] == 0 else 1

        if args.run_query:
            from hg_dedup_ray.pipelines.queries import QUERIES

            if args.run_query == "list":
                print(json.dumps(sorted(QUERIES)))
                return 0
            if args.run_query not in QUERIES:
                print(f"unknown query {args.run_query!r}; see --run_query list",
                      file=sys.stderr)
                return 2
            res = QUERIES[args.run_query](args.data_dir)
            if not isinstance(res, ray.data.Dataset):
                res = ray.data.from_arrow(res) if hasattr(res, "schema") else (
                    ray.data.from_pandas(res))
            # materialize once: write + count off the same blocks (a lazy
            # Dataset would re-execute the whole DAG for the count)
            res = res.materialize()
            res.write_parquet(args.save_dir)
            print(json.dumps({"query": args.run_query, "out": args.save_dir,
                              "rows": res.count()}))
            return 0

        from hg_dedup_ray.config import DedupConfig

        cfg_kw = dict(
            minlen=args.minlen,
            mode=args.mode,
            num_partitions=args.partitions,
            token_dtype=args.token_dtype,
            tokenizer=args.tokenizer,
            reverse=args.reverse,
            scan_kernel=args.scan_kernel,
            text_col=args.text_col,
            id_col=args.id_col,
            seq_col=args.seq_col,
        )
        if args.batch_size:
            cfg_kw["batch_size"] = args.batch_size
        if args.format == "jsonl":
            from hg_dedup_ray.pipelines.jsonl_workflow import run_jsonl_dedup

            written = run_jsonl_dedup(
                args.data_dir, args.save_dir, minlen=args.minlen,
                num_partitions=args.partitions or 8, mode=args.mode,
            )
            print(json.dumps({"format": "jsonl", "files_written": len(written)}))
        elif args.resumable:
            from hg_dedup_ray.pipelines.resumable import run_dedup_resumable

            summary = run_dedup_resumable(
                args.data_dir, args.save_dir, DedupConfig(**cfg_kw)
            )
            print(json.dumps({"format": "parquet", "resumable": True,
                              **{k: v for k, v in summary.items()
                                 if isinstance(v, (int, float, str, bool))}}))
        else:
            from hg_dedup_ray.pipelines.sa_dedup import run_dedup

            run_dedup(args.data_dir, args.save_dir, DedupConfig(**cfg_kw))
            print(json.dumps({"format": "parquet", "out": args.save_dir}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
