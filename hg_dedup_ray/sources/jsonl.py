"""JSONL dataset source/sink — parity with the reference's external data
model (reference indexing_v6_sharded.py:21-39,74,179 `load_file` + file
discovery, write_back_to_jsonl_sharded.py:39-56 `write_buf`).

- Discovery: recursive glob ``**/*.json*`` sorted by path with ``crawl=``
  stripped for sort order — this ordering DEFINES global doc order, so
  ``doc_seq`` is assigned from (file rank, line number).
- Formats: ``.jsonl`` plain, ``.jsonl.gz`` (stdlib gzip), ``.jsonl.zst``
  (pyarrow's built-in zstd codec) — full reference format parity.
- Schema: required ``text``; every other JSON field is carried as one
  opaque ``metadata`` JSON-string column (the reference keeps metadata as
  opaque JSON too); plus ``path``, ``linenum``, ``doc_seq``.
- Sink: re-emit docs grouped by original ``path``, mirroring the
  directory tree and per-file compression.

Reading streams one task per file via ``read_binary_files`` +
``map_batches`` (no driver-side IO); writing is one task per original
file via ``groupby("path").map_groups``.
"""

from __future__ import annotations

import glob
import gzip
import io
import json
import os

import numpy as np
import pyarrow as pa

import ray


def _open_bytes(data: bytes, path: str) -> str:
    """Decompress by MAGIC BYTES, not extension: some readers (including
    Ray's read_binary_files) already auto-decompress on read."""
    if data[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame (pyarrow codec)
        with pa.input_stream(pa.BufferReader(data), compression="zstd") as s:
            data = s.read()
    elif data[:2] == b"\x1f\x8b":  # gzip
        data = gzip.decompress(data)
    return bytes(data).decode("utf-8")


def discover_files(root: str) -> list[str]:
    """Recursive ``**/*.json*`` glob, reference sort order (``crawl=``
    stripped before comparing — reference indexing_v6_sharded.py:179)."""
    paths = glob.glob(os.path.join(root, "**", "*.json*"), recursive=True)
    return sorted(paths, key=lambda p: p.replace("crawl=", ""))


def read_jsonl(root: str) -> ray.data.Dataset:
    """Directory tree of .jsonl[.gz|.zst] -> Dataset with columns
    (path, linenum, doc_seq, text, metadata)."""
    files = discover_files(root)
    if not files:
        raise FileNotFoundError(f"no *.json* files under {root}")
    # line counts per file are unknown up front; assign doc_seq as
    # (file_rank << 32) | linenum — monotone in (file order, line order),
    # which is all keep-first semantics needs (any order-embedding works)
    rank = {p: i for i, p in enumerate(files)}
    rel = {p: os.path.relpath(p, root) for p in files}

    ds = ray.data.read_binary_files(files, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out_path, out_line, out_seq, out_text, out_meta = [], [], [], [], []
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            text_blob = _open_bytes(data, path)
            lines = text_blob.split("\n")
            if lines and lines[-1] == "":  # trailing newline, as reference
                lines.pop()
            r = rank[path]
            for ln, line in enumerate(lines):
                obj = json.loads(line)
                text = obj.pop("text")
                out_path.append(rel[path])
                out_line.append(ln)
                out_seq.append((r << 32) | ln)
                out_text.append(text)
                out_meta.append(json.dumps(obj, sort_keys=True))
        return pa.table(
            {
                "path": pa.array(out_path, pa.string()),
                "linenum": pa.array(out_line, pa.int64()),
                "doc_seq": pa.array(out_seq, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "metadata": pa.array(out_meta, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_jsonl(ds: ray.data.Dataset, out_root: str) -> list[str]:
    """Write docs back to their original relative paths + compression,
    mirroring the reference write_buf sink. Docs' non-text fields come
    from the ``metadata`` JSON-string column; any extra columns (e.g.
    ``sa_remove_ranges``) are attached as JSON fields.

    One task per original file; returns the list of files written.
    """
    os.makedirs(out_root, exist_ok=True)

    passthrough = {"path", "linenum", "doc_seq", "text", "metadata"}

    def write_group(group: pa.Table) -> pa.Table:
        group = group.sort_by("linenum")
        path = group["path"][0].as_py()
        extra_cols = [c for c in group.column_names if c not in passthrough]
        buf = io.StringIO()
        for i in range(len(group)):
            obj = {"text": group["text"][i].as_py()}
            meta = group["metadata"][i].as_py() if "metadata" in group.column_names else None
            if meta:
                obj.update(json.loads(meta))
            for c in extra_cols:
                v = group[c][i].as_py()
                if isinstance(v, np.generic):
                    v = v.item()
                obj[c] = v
            buf.write(json.dumps(obj, sort_keys=True))
            buf.write("\n")
        payload = buf.getvalue().encode("utf-8")
        target = os.path.join(out_root, path)
        os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
        if path.endswith(".zst"):
            sink = pa.BufferOutputStream()
            with pa.CompressedOutputStream(sink, "zstd") as s:
                s.write(payload)
            payload = sink.getvalue().to_pybytes()
        elif path.endswith(".gz"):
            payload = gzip.compress(payload)
        tmp = target + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, target)
        return pa.table({"path": pa.array([path], pa.string())})

    rows = (
        ds.groupby("path")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return sorted(r["path"] for r in rows)
