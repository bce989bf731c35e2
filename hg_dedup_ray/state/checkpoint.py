"""Per-partition checkpoint manifests for resumable runs.

Ray-native replacement for the reference's "output files exist -> skip
step" resume (reference indexing_v6_sharded.py:67-69,201-203,225-227) at
partition granularity, upgraded with explicit lineage + metrics per the
rebuild contract: each completed partition records the input files, a
content hash of its documents, suffix-array build stats, and scan/write
metrics, so a rerun (`ray job submit` again) skips completed partitions
and recomputes only missing/stale ones.

Layout under a checkpoint dir:

    ckpt/
      candidates/manifest.json     cross-partition stage (whole-stage ckpt)
      candidates/xranges.parquet   url, start, end
      candidates/clusters.parquet  url, cluster_id
      parts/part={p}.json          one manifest per completed partition

Manifests are written atomically (tmp + rename). A manifest is only valid
for the cfg fingerprint it was produced under — changing minlen / mode /
partitioning invalidates all checkpoints automatically.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np

from hg_dedup_ray.config import DedupConfig

SCHEMA_VERSION = 1


def cfg_fingerprint(cfg: DedupConfig) -> str:
    """Hash of every semantics-affecting config field."""
    payload = json.dumps(
        {
            "minlen": cfg.minlen,
            "mode": cfg.mode,
            "num_partitions": cfg.num_partitions,
            "id_col": cfg.id_col,
            "text_col": cfg.text_col,
            "seq_col": cfg.seq_col,
            "num_perm": cfg.num_perm,
            "num_bands": cfg.num_bands,
            "shingle_k": cfg.shingle_k,
            "minhash_seed": cfg.minhash_seed,
            "jaccard_threshold": cfg.jaccard_threshold,
            "v": SCHEMA_VERSION,
        },
        sort_keys=True,
    )
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


def content_hash(urls, n_bytes) -> str:
    """Order-sensitive hash of (url, n_bytes) pairs — cheap partition
    lineage fingerprint (text itself is not rehashed; n_bytes + identity
    catches reassignment/reordering, the realistic staleness modes)."""
    h = hashlib.blake2b(digest_size=8)
    for u, nb in zip(urls, n_bytes):
        h.update(str(u).encode())
        h.update(int(nb).to_bytes(8, "little", signed=False))
    return h.hexdigest()


def input_sizes(paths) -> dict[str, int]:
    """{path: byte size} — the cheap input-staleness fingerprint stored
    in manifests: a rerun whose input files changed size is NOT resumed
    from stale partitions."""
    out = {}
    for p in paths:
        try:
            out[str(p)] = os.path.getsize(p)
        except OSError:
            out[str(p)] = -1
    return out


@dataclass
class PartitionManifest:
    part: int
    cfg_hash: str
    input_files: list = field(default_factory=list)
    input_sizes: dict = field(default_factory=dict)
    doc_seq_min: int = 0
    doc_seq_max: int = 0
    n_docs: int = 0
    corpus_bytes: int = 0
    content_hash: str = ""
    n_local_ranges: int = 0
    n_removed_bytes: int = 0
    sa_build_s: float = 0.0
    scan_s: float = 0.0
    write_s: float = 0.0
    output_file: str = ""
    status: str = "done"


def _json_default(o):
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON-serializable: {type(o)}")


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=_json_default)
    os.replace(tmp, path)


def part_manifest_path(ckpt_dir: str, part: int) -> str:
    return os.path.join(ckpt_dir, "parts", f"part={part}.json")


def write_part_manifest(ckpt_dir: str, m: PartitionManifest) -> None:
    _atomic_write_json(part_manifest_path(ckpt_dir, m.part), asdict(m))


def load_completed_parts(
    ckpt_dir: str, cfg: DedupConfig, current_input_sizes: dict | None = None
) -> dict[int, dict]:
    """part -> manifest dict, for manifests matching the cfg fingerprint
    whose output file still exists and (when ``current_input_sizes`` is
    given) whose recorded input sizes still match."""
    out: dict[int, dict] = {}
    d = os.path.join(ckpt_dir, "parts")
    if not os.path.isdir(d):
        return out
    want = cfg_fingerprint(cfg)
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("cfg_hash") != want or m.get("status") != "done":
            continue
        if m.get("output_file") and not os.path.exists(m["output_file"]):
            continue
        if (
            current_input_sizes is not None
            and m.get("input_sizes")
            and m["input_sizes"] != current_input_sizes
        ):
            continue  # input changed since this partition was produced
        out[int(m["part"])] = m
    return out


# ----------------------------------------------------------- candidates
def candidates_dir(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "candidates")


def save_candidates(
    ckpt_dir: str,
    cfg: DedupConfig,
    xranges: dict[str, np.ndarray],
    clusters: dict[str, int],
    metrics: dict | None = None,
    input_sizes_map: dict | None = None,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = candidates_dir(ckpt_dir)
    os.makedirs(d, exist_ok=True)
    urls, starts, ends = [], [], []
    for u, rr in sorted(xranges.items()):
        for s, e in rr:
            urls.append(u)
            starts.append(int(s))
            ends.append(int(e))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "start": pa.array(starts, pa.int64()),
                "end": pa.array(ends, pa.int64()),
            }
        ),
        os.path.join(d, "xranges.parquet"),
    )
    cu = sorted(clusters.items())
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in cu], pa.string()),
                "cluster_id": pa.array([int(c) for _, c in cu], pa.int64()),
            }
        ),
        os.path.join(d, "clusters.parquet"),
    )
    _atomic_write_json(
        os.path.join(d, "manifest.json"),
        {
            "cfg_hash": cfg_fingerprint(cfg),
            "status": "done",
            "n_xrange_urls": len(xranges),
            "n_clustered_urls": len(clusters),
            "input_sizes": input_sizes_map or {},
            **(metrics or {}),
        },
    )


def load_candidates(
    ckpt_dir: str, cfg: DedupConfig, current_input_sizes: dict | None = None
) -> tuple[dict[str, np.ndarray], dict[str, int]] | None:
    """(xranges, clusters) if a valid checkpoint exists, else None."""
    import pyarrow.parquet as pq

    d = candidates_dir(ckpt_dir)
    mp = os.path.join(d, "manifest.json")
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    if m.get("cfg_hash") != cfg_fingerprint(cfg) or m.get("status") != "done":
        return None
    if (
        current_input_sizes is not None
        and m.get("input_sizes")
        and m["input_sizes"] != current_input_sizes
    ):
        return None  # input changed since the candidate stage ran
    xt = pq.read_table(os.path.join(d, "xranges.parquet"))
    xranges: dict[str, np.ndarray] = {}
    if len(xt):
        u = np.asarray(xt["url"].to_pylist())
        se = np.stack(
            [xt["start"].to_numpy(), xt["end"].to_numpy()], axis=1
        ).astype(np.int64)
        order = np.argsort(u, kind="stable")
        u, se = u[order], se[order]
        bounds = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        for i, b in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(u)
            xranges[str(u[b])] = se[b:e]
    ct = pq.read_table(os.path.join(d, "clusters.parquet"))
    clusters = {
        str(u): int(c)
        for u, c in zip(ct["url"].to_pylist(), ct["cluster_id"].to_pylist())
    }
    return xranges, clusters
