"""QA / diff tooling: ANSI dup overlays + annotated-output checker.

Re-expresses the reference's two inspection tools:

- ``find_dup_docs.cpp:18-69`` — per-dup-doc ``.ansi`` files where each byte
  is colored by its dup status: red = covered only by DROPPED dup windows,
  yellow = covered by both dropped and kept windows, green = kept-only,
  plain = not duplicated. Windows are ``[ptr, ptr+minlen)`` for every dup
  pointer, unioned per status.
- ``verify_zst_alldressed.py:1-49`` — a self-contained checker over
  annotated output: writes removed ranges in red, prints the ratio of
  lines with any removal and the ratio of removed bytes.

Everything here is driver-light: overlay files are written inside
``map_batches`` workers (one small ``.ansi`` per flagged doc — flagged docs
are the rare case), and the report reduces to a handful of counters.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

RESET = "\x1b[0m"
RED = "\x1b[31m"
GREEN = "\x1b[32m"
YELLOW = "\x1b[33m"

_STATE_CODE = {0: RESET, 1: RED, 2: GREEN, 3: YELLOW}


def coverage_mask(n: int, starts: np.ndarray, minlen: int) -> np.ndarray:
    """Boolean mask of bytes covered by the union of ``[s, s+minlen)``
    windows (the reference's pos_dropped/pos_kept sweep,
    find_dup_docs.cpp:25-42, is exactly this union for sorted ptrs)."""
    m = np.zeros(n + 1, np.int32)
    if starts.size:
        np.add.at(m, np.minimum(starts, n), 1)
        np.add.at(m, np.minimum(starts + minlen, n), -1)
    return np.cumsum(m[:-1]) > 0


def _emit_ansi(text: bytes, state: np.ndarray) -> str:
    """Bytes + per-byte state (0 plain / 1 red / 2 green / 3 yellow) ->
    ANSI string, one escape per state change (find_dup_docs.cpp:44-69)."""
    if not text:
        return ""
    change = np.flatnonzero(np.diff(state)) + 1
    bounds = np.concatenate(([0], change, [len(text)]))
    parts = []
    cur = 0  # the reference starts in "white"
    for i in range(len(bounds) - 1):
        s = int(state[bounds[i]])
        if s != cur:
            parts.append(_STATE_CODE[s])
            cur = s
        parts.append(text[bounds[i] : bounds[i + 1]].decode("utf-8", "replace"))
    if cur != 0:
        parts.append(RESET)
    return "".join(parts)


def dup_doc_ansi(
    text: bytes, dup_ptrs: np.ndarray, kept: np.ndarray, minlen: int
) -> str:
    """One doc's red/yellow/green overlay from its doc-relative dup
    pointers + kept flags (reference find_dup_docs.cpp:18-69)."""
    dropped_m = coverage_mask(len(text), dup_ptrs[~kept], minlen)
    kept_m = coverage_mask(len(text), dup_ptrs[kept], minlen)
    state = dropped_m.astype(np.int8) + 2 * kept_m.astype(np.int8)
    return _emit_ansi(text, state)


def remove_ranges_ansi(text: bytes, ranges) -> str:
    """Red-highlight removed [s, e) byte ranges (reference
    verify_zst_alldressed.py:25-34)."""
    state = np.zeros(len(text), np.int8)
    for s, e in ranges:
        state[s:e] = 1
    return _emit_ansi(text, state)


def strip_ansi(s: str) -> str:
    import re

    return re.sub(r"\x1b\[[0-9;]*m", "", s)


def red_spans(s: str) -> list[tuple[int, int]]:
    """Parse an overlay back into plain-text [s, e) BYTE spans that were
    red — the inverse of remove_ranges_ansi, for round-trip checks."""
    import re

    spans, pos, red, start = [], 0, False, 0
    for m in re.finditer(r"\x1b\[([0-9;]*)m|([^\x1b]+)", s):
        if m.group(2) is not None:
            pos += len(m.group(2).encode("utf-8"))
        else:
            now_red = m.group(1) == "31"
            if now_red and not red:
                start = pos
            elif red and not now_red:
                spans.append((start, pos))
            red = now_red
    if red:
        spans.append((start, pos))
    return spans


# ---------------------------------------------------------------------------
# Ray-side: overlay writer + annotate report

def write_remove_overlays(annotated, out_dir: str, limit_per_block: int = 1000):
    """Write ``<out_dir>/doc<doc_seq>.ansi`` for every doc with a non-empty
    ``sa_remove_ranges`` (reference verify_zst_alldressed.py writes one
    .ansi per diff line). Runs inside map_batches — workers write directly,
    nothing text-sized crosses the driver. Returns the number written."""
    os.makedirs(out_dir, exist_ok=True)

    def fn(batch: pa.Table) -> pa.Table:
        wrote = 0
        rrs = batch["sa_remove_ranges"].to_pylist()
        for i, rr in enumerate(rrs):
            if not rr or wrote >= limit_per_block:
                continue
            text = batch["text"][i].as_py().encode("utf-8")
            seq = batch["doc_seq"][i].as_py()
            ranges = [(r["start"], r["end"]) for r in rr]
            with open(
                os.path.join(out_dir, f"doc{seq}.ansi"), "w", encoding="utf-8"
            ) as f:
                f.write(remove_ranges_ansi(text, ranges))
            wrote += 1
        return pa.table({"n_written": pa.array([wrote], pa.int64())})

    import pyarrow.compute as pc_  # noqa: F401

    out = annotated.map_batches(fn, batch_format="pyarrow")
    return int(sum(r["n_written"] for r in out.take_all()))


def write_dup_doc_overlays(docs, cfg, out_dir: str, limit_per_part: int = 1000):
    """Per-partition diagnostic overlays (reference find_dup_docs.cpp:18-69):
    for every doc containing >=1 dup pointer, write
    ``<out_dir>/doc<doc_seq>.ansi`` with red = dropped-window bytes,
    yellow = dropped+kept, green = kept-only. ``docs`` is the extracted
    (url, doc_seq, part, text, n_bytes) dataset. Returns docs written."""
    from hg_dedup_ray.functions.scan import find_dup_ptrs, find_dup_ptrs_hashed
    from hg_dedup_ray.functions.suffix_array import build_suffix_array
    from hg_dedup_ray.stages.sa_scan import texts_to_corpus

    os.makedirs(out_dir, exist_ok=True)
    minlen = cfg.minlen
    use_hash = cfg.scan_kernel == "hash"

    def fn(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_seq")
        corpus, starts, ends = texts_to_corpus(group["text"])
        wrote = 0
        if corpus.shape[0]:
            if use_hash:
                ptrs, kept = find_dup_ptrs_hashed(corpus, minlen)
            else:
                sa = build_suffix_array(corpus)
                ptrs, kept = find_dup_ptrs(corpus, sa, minlen)
            if ptrs.size:
                doc_ix = np.searchsorted(starts, ptrs, side="right") - 1
                for d in np.unique(doc_ix):
                    if wrote >= limit_per_part:
                        break
                    sel = doc_ix == d
                    rel = ptrs[sel] - starts[d]
                    text = group["text"][int(d)].as_py().encode("utf-8")
                    seq = group["doc_seq"][int(d)].as_py()
                    with open(
                        os.path.join(out_dir, f"doc{seq}.ansi"),
                        "w",
                        encoding="utf-8",
                    ) as f:
                        f.write(dup_doc_ansi(text, rel, kept[sel], minlen))
                    wrote += 1
        return pa.table({"n_written": pa.array([wrote], pa.int64())})

    out = docs.groupby("part").map_groups(fn, batch_format="pyarrow")
    return int(sum(r["n_written"] for r in out.take_all()))


def annotate_report(annotated) -> dict:
    """The verify_zst_alldressed.py:38-48 summary over an annotated
    dataset: ratio of lines with any removal + ratio of removed bytes
    (bytes counted over flagged lines, as the reference does). If the
    dataset carries remove-mode output (``text_deduped``), additionally
    verifies per row that excising ``sa_remove_ranges`` from ``text``
    reproduces ``text_deduped`` exactly and that the result is valid
    UTF-8 — the annotate/remove consistency check."""
    from hg_dedup_ray.functions.clip import excise

    has_deduped = "text_deduped" in annotated.schema().names

    def fn(batch: pa.Table) -> pa.Table:
        rrs = batch["sa_remove_ranges"].to_pylist()
        diff = removed = orig = bad = 0
        for i, rr in enumerate(rrs):
            if not rr:
                continue
            diff += 1
            text = batch["text"][i].as_py().encode("utf-8")
            orig += len(text)
            spans = [(r["start"], r["end"]) for r in rr]
            removed += sum(e - s for s, e in spans)
            if has_deduped:
                got = excise(text, spans)
                want = batch["text_deduped"][i].as_py().encode("utf-8")
                if got != want:
                    bad += 1
        return pa.table(
            {
                "lines": pa.array([len(batch)], pa.int64()),
                "diff_lines": pa.array([diff], pa.int64()),
                "bytes_orig": pa.array([orig], pa.int64()),
                "bytes_removed": pa.array([removed], pa.int64()),
                "inconsistent": pa.array([bad], pa.int64()),
            }
        )

    rows = annotated.map_batches(fn, batch_format="pyarrow").take_all()
    tot = {k: sum(r[k] for r in rows) for k in
           ("lines", "diff_lines", "bytes_orig", "bytes_removed", "inconsistent")}
    return {
        "num_lines": tot["lines"],
        "num_diff_lines": tot["diff_lines"],
        "ratio_diff_lines": tot["diff_lines"] / tot["lines"] if tot["lines"] else 0.0,
        "ratio_removed_bytes": (
            tot["bytes_removed"] / tot["bytes_orig"] if tot["bytes_orig"] else 0.0
        ),
        "inconsistent_rows": tot["inconsistent"],
    }
