"""CLI entry point (python -m hg_dedup_ray) — the reference's three-step
argparse journey (indexing_v6_sharded.py:256-271 etc.) as one command."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_cli_parquet_remove(tmp_path):
    from hg_dedup_ray.sources.webpages import write_webpages

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_webpages(src, n_docs=80, seed=3, minlen=32, n_files=4)
    res = subprocess.run(
        [sys.executable, "-m", "hg_dedup_ray",
         "--data_dir", src, "--save_dir", out,
         "--minlen", "32", "--mode", "remove", "--cpus", "4",
         "--partitions", "2"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["format"] == "parquet"
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    tabs = [pq.read_table(f) for f in files]
    n = sum(len(t) for t in tabs)
    assert n == 80
    cols = set(tabs[0].schema.names)
    assert {"url", "sa_remove_ranges", "text_deduped", "n_removed_bytes"} <= cols
    assert sum(t["n_removed_bytes"].to_pandas().sum() for t in tabs) > 0


def test_cli_parser_surface():
    """The reference's flag names exist (token_dtype, tokenizer,
    --reversed, cpus, batch_size, mode)."""
    from hg_dedup_ray.__main__ import build_parser

    p = build_parser()
    args = p.parse_args(
        ["--data_dir", "a", "--save_dir", "b", "--token_dtype", "u16",
         "--tokenizer", "bytepair", "--reversed", "--batch_size", "512",
         "--cpus", "2", "--mode", "annotate", "--scan_kernel", "sa"]
    )
    assert args.token_dtype == "u16" and args.reverse and args.scan_kernel == "sa"


def test_cli_run_query(tmp_path):
    """--run_query executes a registered operator and writes parquet."""
    out = str(tmp_path / "qout")
    res = subprocess.run(
        [sys.executable, "-m", "hg_dedup_ray",
         "--data_dir", "/root/testdata/sf0.001", "--save_dir", out,
         "--run_query", "token_counts", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["rows"] == 500
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert sum(len(pq.read_table(f)) for f in files) == 500


def test_cli_run_query_list_and_unknown(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "hg_dedup_ray", "--data_dir", "x",
         "--save_dir", "y", "--run_query", "list", "--cpus", "2"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0
    names = json.loads(res.stdout.strip().splitlines()[-1])
    assert "exact_dedup" in names and len(names) >= 75
    res = subprocess.run(
        [sys.executable, "-m", "hg_dedup_ray", "--data_dir", "x",
         "--save_dir", "y", "--run_query", "nope", "--cpus", "2"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 2
