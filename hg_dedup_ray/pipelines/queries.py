"""Query library backing ``__ray_entry__.queries()``.

Every callable takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a Ray Dataset / pyarrow Table. Column names intentionally match
the paired SQL in ``oracles.py`` (the driver sorts columns by name before
value-hashing).

NOTE: none of these call ray.init(); the caller owns the Ray session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.functions.readers import read_parquet_sized
from hg_dedup_ray.stages import textstats
from hg_dedup_ray.stages.embed import (
    PartialTopK,
    embedding_matrix,
    kmeans_centroids,
    merge_topk,
)
from hg_dedup_ray.stages.simhash import SimHasher

ANN_K = 5
ANN_NUM_QUERIES = 10
NEAR_DUP_COS = 0.4


# --- generic raw-task shard+reduce hooks (the _hot_keys_parallel /
# _shard_cand_block shape, r5): keyed multi-stage fan-outs over a
# MATERIALIZED dataset's blocks without Dataset groupby — Ray 2.49's
# sort-based shuffle stalls on many-block inputs (see sa_dedup.py), and
# even when it runs, each groupby is a full extra exchange. ``col``
# must hold small ints in [0, n); callables are cloudpickled closures.


@ray.remote
def _shard_table_block(tab: pa.Table, filter_fn, col: str, n: int):
    """One block -> (optional filter) -> n sub-tables by ``col`` value.
    Invoke with .options(num_returns=n)."""
    if filter_fn is not None:
        tab = filter_fn(tab)
    v = tab[col].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    tab = tab.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(v[order], np.arange(n + 1))
    return tuple(
        tab.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n)
    )


@ray.remote
def _reduce_and_shard(fn, col: str, n: int, *tabs):
    """Concat one key-range's sub-tables, apply ``fn``, and shard the
    OUTPUT by ``col`` for the next round. .options(num_returns=n)."""
    tabs = [t for t in tabs if t is not None and len(t)]
    if not tabs:
        return tuple(None for _ in range(n))
    out = fn(pa.concat_tables(tabs))
    v = out[col].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    out = out.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(v[order], np.arange(n + 1))
    return tuple(
        out.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n)
    )


@ray.remote
def _map_block(fn, tab: pa.Table):
    """Apply ``fn`` to one materialized block — a per-block partial
    pass without spinning a whole Dataset execution."""
    return fn(tab)


@ray.remote
def _reduce_concat(fn, empty: pa.Table, *tabs):
    """Concat one key-range's sub-tables and apply ``fn`` (terminal
    round; returns ``empty`` when the range has no rows so the refs can
    feed ray.data.from_arrow_refs directly)."""
    tabs = [t for t in tabs if t is not None and len(t)]
    if not tabs:
        return empty
    return fn(pa.concat_tables(tabs))


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _docs_sized(sf_dir: str, columns=None):
    """Size-derived block count (functions/readers) — for the light
    per-batch map/agg queries whose cost is task+shuffle orchestration,
    not per-byte compute. The flagship keeps _docs: its partitioning is
    derived from doc_seq bounds, block granularity tuned separately."""
    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _cpus() -> int:
    return int(ray.cluster_resources().get("CPU", 4))


def _pool() -> tuple[int, int]:
    return (1, max(1, _cpus() - 1))


# --------------------------------------------------------------- dedup ops
def _exact_keeper_ids(
    docs, num_buckets: int = 64, precomputed_fp: bool = False
) -> np.ndarray:
    """Sorted keeper doc_ids of exact keep-first text dedup over any
    (doc_id, text) dataset — the fp/partial-min shape documented on
    exact_dedup, shared with dedup_tier_cascade's exact tier and
    curation_cascade's dedup tier (which passes ``precomputed_fp=True``
    with (doc_id, fp:u64) rows so the text is read exactly once)."""

    def fp_min_partial(batch: pa.Table) -> pa.Table:
        h = batch if precomputed_fp else textstats.content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        d = h["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, fp))
        fp, d = fp[order], d[order]
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        fp, d = fp[bnd], d[bnd]  # first per fp == min doc_id
        return pa.table(
            {
                "cbucket": pa.array((fp % num_buckets).astype(np.int64), pa.int64()),
                "fp": pa.array(fp, pa.uint64()),
                "keep_id": pa.array(d, pa.int64()),
            }
        )

    def fp_min_combine(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        d = group["keep_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, fp))
        fp, d = fp[order], d[order]
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        return pa.table({"keep_id": pa.array(d[bnd], pa.int64())})

    keepers = (
        docs.map_batches(fp_min_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("cbucket")
        .map_groups(fp_min_combine, batch_format="pyarrow")
    )
    return np.sort(
        np.concatenate(
            [
                b["keep_id"].to_numpy(zero_copy_only=False)
                for b in keepers.select_columns(["keep_id"]).iter_batches(
                    batch_size=1 << 18, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )


def _filter_by_ids(keep_ref):
    """map_batches fn: broadcast semi-join of a batch's doc_id column
    against a sorted id array (``ray.put`` once, probed per batch)."""

    def filter_keep(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ids = get_broadcast(keep_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, d)
        mask = (pos < ids.shape[0]) & (ids[np.minimum(pos, ids.shape[0] - 1)] == d)
        return batch.filter(pa.array(mask))

    return filter_keep


def exact_dedup(sf_dir: str):
    """Exact dedup: keep the min-doc_id doc of every identical text
    (SURVEY.md A6; the guide's exact-dedup idiom).

    Only (fp:u64, doc_id) enters the shuffle — never text. The fp key
    space is ~one group per distinct doc, so a native per-fp aggregate
    pays Ray's per-group cost on every unique document; instead each
    batch pre-reduces to its per-fp min (one lexsort) and the shuffle
    groups by a COARSE fp%64 bucket whose combine is one more
    lexsort-boundary pass — group count fixed regardless of corpus
    size. Keeper ids (8 B/doc) stream to the driver for a broadcast
    semi-join; at a scale where that outgrows the driver, replace with
    bucket = hash(doc_id)%B on both sides + per-bucket join."""
    keep_ids = _exact_keeper_ids(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    keep_ref = ray.put(keep_ids)
    return read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).map_batches(_filter_by_ids(keep_ref), batch_format="pyarrow")


def normalized_exact_dedup(sf_dir: str):
    """C4-style FUZZY-EXACT dedup: keep the min-doc_id doc among
    documents whose NORMALIZED text (lowercase, alnum-only, whitespace
    runs collapsed, trimmed — the ``normalize_texts`` transform) is
    identical, collapsing the cosmetic variants plain exact dedup
    misses (case, punctuation, spacing). Same scale shape as
    ``exact_dedup``: only (u64 fingerprint of the normalized text,
    doc_id) enters the shuffle; the normalization itself is three Arrow
    kernels, zero Python per row."""

    def norm_fp(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"[^a-z0-9 ]", " ")
        t = pc.replace_substring_regex(t, r" +", " ")
        t = pc.utf8_trim_whitespace(t)
        return textstats.content_hash_u64(
            pa.table({"doc_id": batch["doc_id"], "text": t})
        )

    fps = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(norm_fp, batch_format="pyarrow", batch_size=4096)
    keep_ref = ray.put(_exact_keeper_ids(fps, precomputed_fp=True))
    return read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).map_batches(_filter_by_ids(keep_ref), batch_format="pyarrow")


def minhash_clusters(sf_dir: str, threshold: float = 0.5):
    """Near-dup cluster ids over documents via the flagship machinery.

    Oracle-checked: candidates are verified with EXACT Jaccard before the
    min-label closure, so the output equals the SQL exact-pairs closure
    whenever candidate recall is 1.0 (deterministic on the fixture;
    partition-set equality verified at sf0.01) — the oracle checks recall
    and precision of the routing + verify + union-find cascade."""
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    cfg = DedupConfig(
        minlen=64,
        num_partitions=4,
        shingle_k=8,
        jaccard_threshold=threshold,
        seq_col="doc_id",
        id_col="doc_id",
        text_col="text",
    )
    out = dedup_dataset(_docs(sf_dir, columns=["doc_id", "text"]), cfg)

    def cast_label(b: pa.Table) -> pa.Table:
        # cluster labels are min doc_seq (< 2^63); emit int64 so the
        # dtype matches the oracle's BIGINT exactly, not just the values
        i = b.schema.get_field_index("cluster_id")
        return b.set_column(i, "cluster_id", pc.cast(b["cluster_id"], pa.int64()))

    return out.select_columns(["url", "doc_seq", "cluster_id"]).map_batches(
        cast_label, batch_format="pyarrow"
    )


def sa_dedup_documents(sf_dir: str, minlen: int = 64):
    """Flagship substring dedup over the documents table (rows-only check:
    suffix-array semantics are not SQL-expressible)."""
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    cfg = DedupConfig(
        minlen=minlen,
        num_partitions=4,
        shingle_k=8,
        seq_col="doc_id",
        id_col="doc_id",
        text_col="text",
    )
    out = dedup_dataset(_docs(sf_dir, columns=["doc_id", "text"]), cfg)
    return out.select_columns(
        ["url", "doc_seq", "n_bytes", "n_removed_bytes", "cluster_id"]
    )


def minhash_sig_rows(sf_dir: str):
    """OPH MinHash signatures at the PRODUCTION config (shingle_k=16,
    num_perm=128, seed=42 — config.py defaults, the ones minhash_clusters
    routes candidates with), exploded to long (doc_id, perm, sig) rows so
    the DuckDB oracle can hash-check every cell: the oracle replicates
    the FNV window fold, seed xor, splitmix64, 7-bit binning, per-bin
    min, and rotation densification bit-for-bit in SQL."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.minhash import batch_signatures_oph

    k, num_perm, seed = 16, 128, 42

    def sig_rows(batch: pa.Table) -> pa.Table:
        buf, off = string_column_bytes(batch["text"])
        sig = batch_signatures_oph(buf, off, k, num_perm, seed)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, num_perm), pa.int64()),
                "perm": pa.array(
                    np.tile(np.arange(num_perm, dtype=np.int64), n), pa.int64()
                ),
                "sig": pa.array(sig.reshape(-1), pa.uint64()),
            }
        )

    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        sig_rows, batch_format="pyarrow", batch_size=2048
    )


def minhash_band_clusters(
    sf_dir: str, num_bands: int = 32, band_r: int = 4, docs=None
):
    """Textbook MinHash-LSH clustering, DuckDB-hash-checked end to end:
    OPH signatures (the cell-exact ``minhash_sig_rows`` kernel) -> b=32
    bands of r=4 perms -> docs sharing any band bucket are edges ->
    connected components labeled by min doc_id. The oracle recomputes
    the signatures in SQL, folds the same bands, and closes the same
    graph with a recursive-CTE min-label walk — so LSH *cluster
    assignments* (not just signatures) are value-checked.

    Scale shape: 32 compact (u64 band key, doc_id) rows per doc; a
    hot-key prefilter (functions/pair_distinct.hot_u64_keys) drops the
    overwhelmingly-singleton buckets before any grouping; hot buckets
    emit STAR edges (member -> bucket-min) per coarse key%64 group —
    enough for connectivity, linear in bucket size; components resolve
    via driver union-find below ``driver_edge_limit`` rows and the
    groupby min-label rounds above. Band-key u64 folding stands in for
    the r-tuple of sigs (collision odds ~2^-64/pair)."""
    from hg_dedup_ray.functions.minhash import make_band_rows
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys
    from hg_dedup_ray.state.cluster import (
        distributed_min_label,
        union_find_clusters,
    )

    if docs is None:
        docs = _docs_sized(sf_dir, columns=["doc_id", "text"])
    rows = (
        docs.map_batches(
            make_band_rows(num_bands=num_bands, band_r=band_r),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .materialize()
    )
    hot = hot_u64_keys(rows, "bkey")
    empty = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    )
    if hot.shape[0] == 0:
        return empty
    hot_ref = ray.put(hot)

    def hot_only(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        h = get_broadcast(hot_ref)
        bk = batch["bkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(h, bk)
        mask = (pos < h.shape[0]) & (h[np.minimum(pos, h.shape[0] - 1)] == bk)
        b = batch.filter(pa.array(mask))
        return b.append_column(
            "cb",
            pa.array(
                (b["bkey"].to_numpy(zero_copy_only=False) % 64).astype(np.int64),
                pa.int64(),
            ),
        )

    def star_edges(group: pa.Table) -> pa.Table:
        bk = group["bkey"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bk))
        bk, did = bk[order], did[order]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        run_id = np.cumsum(new) - 1
        rep = did[new][run_id]  # bucket min (first in sorted run)
        keep = did != rep
        return pa.table(
            {
                "u": pa.array(rep[keep], pa.int64()),
                "v": pa.array(did[keep], pa.int64()),
            }
        )

    edge_tab = (
        rows.map_batches(hot_only, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(star_edges, batch_format="pyarrow")
    )
    edges: list[tuple[int, int, int, int]] = []
    for b in edge_tab.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        edges.extend((int(x), int(y), int(x), int(y)) for x, y in zip(u, v))
    if not edges:
        return empty
    resolve = union_find_clusters if len(edges) <= 1_000_000 else distributed_min_label
    labels = resolve(edges)
    ids = np.array(sorted(labels), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    np.array([labels[i] for i in ids], dtype=np.int64), pa.int64()
                ),
            }
        )
    )


def _exact_pairs_packed_ref(sf_dir: str, threshold: float = 0.8):
    """Broadcast ref of the sorted packed-u64 exact-Jaccard pair set
    (answer-sized by definition) plus its count."""
    ex_a, ex_b = [], []
    for b in ngram_jaccard_exact_pairs(sf_dir, threshold).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        ex_a.append(b["doc_id_a"].to_numpy(zero_copy_only=False))
        ex_b.append(b["doc_id_b"].to_numpy(zero_copy_only=False))
    ea = np.concatenate(ex_a) if ex_a else np.empty(0, np.int64)
    eb = np.concatenate(ex_b) if ex_b else np.empty(0, np.int64)
    exact_packed = np.unique(
        (ea.astype(np.uint64) << np.uint64(32)) | eb.astype(np.uint64)
    )
    return ray.put(exact_packed), int(exact_packed.shape[0])


def _lsh_candidate_counts(rows, exact_ref) -> tuple[int, int]:
    """(n_candidate_pairs, n_hits) of a (bkey:u64, doc_id) band-row
    Dataset against the broadcast packed exact-pair array: hot-key
    prefilter, per-bkey%64-bucket vectorized pair expansion, global
    dedup per pair%64 group, per-group COUNT scalars only."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys

    hot = hot_u64_keys(rows, "bkey")
    if hot.shape[0] == 0:
        return 0, 0
    hot_ref = ray.put(np.sort(hot))

    def hot_pairs(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        h = get_broadcast(hot_ref)
        bk = batch["bkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(h, bk)
        mask = (pos < h.shape[0]) & (h[np.minimum(pos, h.shape[0] - 1)] == bk)
        bk = bk[mask]
        did = batch["doc_id"].to_numpy(zero_copy_only=False)[mask]
        return pa.table(
            {
                "cb": pa.array((bk % 64).astype(np.int64), pa.int64()),
                "bkey": pa.array(bk, pa.uint64()),
                "doc_id": pa.array(did, pa.int64()),
            }
        )

    def expand_bucket_pairs(group: pa.Table) -> pa.Table:
        bk = group["bkey"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bk))
        bk, did = bk[order], did[order]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.cumsum(run_len) - run_len
        local = np.arange(did.shape[0]) - run_start[run_id]
        rep = (run_len[run_id] - 1 - local).astype(np.int64)
        tot = int(rep.sum())
        if tot == 0:
            return pa.table(
                {"pb": pa.array([], pa.int64()), "pair": pa.array([], pa.uint64())}
            )
        a_idx = np.repeat(np.arange(did.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        b_idx = a_idx + (np.arange(tot) - seg[a_idx] + 1)
        lo = np.minimum(did[a_idx], did[b_idx]).astype(np.uint64)
        hi = np.maximum(did[a_idx], did[b_idx]).astype(np.uint64)
        pair = np.unique((lo << np.uint64(32)) | hi)
        return pa.table(
            {
                "pb": pa.array((pair % 64).astype(np.int64), pa.int64()),
                "pair": pa.array(pair, pa.uint64()),
            }
        )

    def count_partial(group: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ex = get_broadcast(exact_ref)
        pair = np.unique(group["pair"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(ex, pair)
        hits = int(
            ((pos < ex.shape[0]) & (ex[np.minimum(pos, ex.shape[0] - 1)] == pair)).sum()
        ) if ex.shape[0] else 0
        return pa.table(
            {
                "n_cand": pa.array([pair.shape[0]], pa.int64()),
                "n_hit": pa.array([hits], pa.int64()),
            }
        )

    parts = (
        rows.map_batches(hot_pairs, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(expand_bucket_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(count_partial, batch_format="pyarrow")
        .take_all()
    )
    return (
        int(sum(r["n_cand"] for r in parts)),
        int(sum(r["n_hit"] for r in parts)),
    )


LSH_SWEEP_CONFIGS = ((16, 8), (32, 4), (64, 2))


def lsh_param_sweep(sf_dir: str, configs=LSH_SWEEP_CONFIGS,
                    threshold: float = 0.8):
    """Banding-parameter tuning report: candidate-pair count, exact-pair
    hits, and therefore measured recall/precision pressure for several
    (num_bands, band_r) partitions of the SAME 128-perm OPH signature —
    the report that picks b/r before a web-scale LSH pass ((64,2) recalls
    more but floods candidates; (16,8) is strict). The 128 signature
    words are computed ONCE per batch; each config only re-folds them,
    so the corpus is read exactly once for all configs plus once for the
    exact side. Output one row per config, ordered by num_bands.

    Scale shape: the multi-config band rows materialize once (cfg column
    keeps key spaces separate); per config the shared hot-key prefilter
    -> bucketed pair expansion -> count reduction of
    _lsh_candidate_counts runs over a cheap column filter of that
    materialized set."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.minhash import (
        batch_signatures_oph,
        oph_band_keys,
    )

    exact_ref, n_exact = _exact_pairs_packed_ref(sf_dir, threshold)
    cfgs = sorted(configs)

    def multi_band_rows(batch: pa.Table) -> pa.Table:
        buf, off = string_column_bytes(batch["text"])
        sig = batch_signatures_oph(buf, off, 16, 128, 42)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cfg_col, bkey_col, doc_col = [], [], []
        for ci, (b, r) in enumerate(cfgs):
            key = oph_band_keys(sig, b, r)
            cfg_col.append(np.full(ids.shape[0] * b, ci, np.int8))
            bkey_col.append(key.reshape(-1))
            doc_col.append(np.repeat(ids, b))
        return pa.table(
            {
                "cfg": pa.array(np.concatenate(cfg_col), pa.int8()),
                "bkey": pa.array(np.concatenate(bkey_col), pa.uint64()),
                "doc_id": pa.array(np.concatenate(doc_col), pa.int64()),
            }
        )

    rows = (
        _docs_sized(sf_dir, columns=["doc_id", "text"])
        .map_batches(multi_band_rows, batch_format="pyarrow", batch_size=2048)
        .materialize()
    )
    nb, br, ncs, nhs = [], [], [], []
    for ci, (b, r) in enumerate(cfgs):
        n_cand, n_hit = _lsh_candidate_counts(
            rows.filter(expr=f"cfg == {ci}"), exact_ref
        )
        nb.append(b)
        br.append(r)
        ncs.append(n_cand)
        nhs.append(n_hit)
    return pa.table(
        {
            "num_bands": pa.array(nb, pa.int64()),
            "band_r": pa.array(br, pa.int64()),
            "n_exact_pairs": pa.array([n_exact] * len(cfgs), pa.int64()),
            "n_candidate_pairs": pa.array(ncs, pa.int64()),
            "n_hits": pa.array(nhs, pa.int64()),
        }
    )


def lsh_recall_report(sf_dir: str, num_bands: int = 32, band_r: int = 4,
                      threshold: float = 0.8):
    """LSH quality evaluation — ONE row of integer counts quantifying the
    north-star's recall criterion on this fixture: n_exact_pairs (exact
    k=8-shingle Jaccard >= 0.8, the PPJoin cascade), n_candidate_pairs
    (distinct doc pairs sharing any MinHash band bucket at b=32/r=4), and
    n_hits (exact pairs the LSH candidates cover). recall = hits/exact on
    the consumer side; at this config the banding theory gives
    P[candidate | J>=0.8] = 1-(1-0.8^4)^32 ~ 1-5e-8.

    Scale shape: see _exact_pairs_packed_ref / _lsh_candidate_counts
    (shared with lsh_param_sweep)."""
    from hg_dedup_ray.functions.minhash import make_band_rows

    exact_ref, n_exact = _exact_pairs_packed_ref(sf_dir, threshold)
    rows = (
        _docs_sized(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            make_band_rows(num_bands=num_bands, band_r=band_r),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .materialize()
    )
    n_cand, n_hit = _lsh_candidate_counts(rows, exact_ref)
    return pa.table(
        {
            "n_exact_pairs": pa.array([n_exact], pa.int64()),
            "n_candidate_pairs": pa.array([n_cand], pa.int64()),
            "n_hits": pa.array([n_hit], pa.int64()),
        }
    )


def simhash_sigs(sf_dir: str):
    """64-bit SimHash signatures + 16-bit LSH bands per doc (rows-only).

    Runs as a task closure on Ray's warm shared workers (_task_stage):
    the hasher's state is a few compiled tables — an actor pool's ~2s
    spin-up would dominate this sub-second stage."""
    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        _task_stage(SimHasher), batch_format="pyarrow", batch_size=2048
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, num_buckets: int = 32):
    """Doc pairs with exact k-shingle Jaccard >= threshold, candidates via
    MinHash bands. Oracle-checked against the exact all-pairs SQL: the
    verify stage is exact, so the output equals the exact answer exactly
    when LSH recall is 1.0 — the oracle is therefore a recall+precision
    check of the whole cascade (pair-set-equal verified at sf0.01).

    Fully distributed — nothing text-sized touches the driver: candidate
    pairs (compact int rows) explode into two member rows each, texts
    attach via the bucketed doc_seq hash join (the dupset_join pattern:
    doc side pre-filtered with a broadcast int64 seq array so only
    candidate texts enter the shuffle), and each pair-hash bucket
    verifies its pairs with per-doc shingle sets computed ONCE per
    bucket."""
    from hg_dedup_ray.functions.minhash import shingle_hashes
    from hg_dedup_ray.pipelines.sa_dedup import candidate_pairs, extract_docs

    cfg = DedupConfig(
        minlen=64, num_partitions=4, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    k = cfg.shingle_k
    empty = ray.data.from_arrow(
        pa.table(
            {"doc_id_a": pa.array([], pa.int64()), "doc_id_b": pa.array([], pa.int64())}
        )
    )
    docs = extract_docs(_docs(sf_dir, columns=["doc_id", "text"]), cfg).materialize()
    pairs = candidate_pairs(docs, cfg).materialize()
    if pairs.count() == 0:
        return empty

    # Candidate CLOSURE: the routing may emit star edges (member ->
    # bucket representative) instead of every within-bucket pair — for
    # keep-first dedup that is enough, but THIS query wants all pairs.
    # Any true pair's endpoints share a bucket (winnow >= minlen
    # guarantee / minhash bands) and every bucket member connects to its
    # representative, so expanding to ALL pairs within each connected
    # component of the candidate graph restores exactness. The expansion
    # is answer-order-bounded: a c-clone component genuinely HAS ~C(c,2)
    # true pairs at high thresholds. (Found by the sf0.1 oracle sweep:
    # a 4-clone cluster emitted the star but not one member-member pair.)
    from hg_dedup_ray.state.cluster import union_find_clusters

    es, eb = [], []
    for b in pairs.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        es.append(b["seq_a"].to_numpy(zero_copy_only=False))
        eb.append(b["seq_b"].to_numpy(zero_copy_only=False))
    ea, ebb = np.concatenate(es), np.concatenate(eb)
    labels = union_find_clusters(
        [(int(x), int(y), int(x), int(y)) for x, y in zip(ea, ebb)]
    )
    mem = np.array(sorted(labels), dtype=np.int64)
    lab = np.array([labels[i] for i in mem], dtype=np.int64)
    order_l = np.argsort(lab, kind="stable")
    mem, lab = mem[order_l], lab[order_l]
    new_grp = np.concatenate(([True], lab[1:] != lab[:-1]))
    grp_id = np.cumsum(new_grp) - 1
    grp_len = np.bincount(grp_id)
    grp_start = np.cumsum(grp_len) - grp_len
    local = np.arange(mem.shape[0]) - grp_start[grp_id]
    rep_n = (grp_len[grp_id] - 1 - local).astype(np.int64)
    tot = int(rep_n.sum())
    a_idx = np.repeat(np.arange(mem.shape[0]), rep_n)
    seg = np.cumsum(rep_n) - rep_n
    b_idx = a_idx + (np.arange(tot) - seg[a_idx] + 1)
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "seq_a": pa.array(mem[a_idx], pa.int64()),
                "seq_b": pa.array(mem[b_idx], pa.int64()),
            }
        )
    )

    def to_member_rows(b: pa.Table) -> pa.Table:
        sa_ = b["seq_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sb_ = b["seq_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (sa_ << np.uint64(32)) | sb_
        seqs = np.concatenate([sa_, sb_]).astype(np.int64)
        pids = np.concatenate([pid, pid])
        n = seqs.shape[0]
        return pa.table(
            {
                "seq_bucket": pa.array(seqs % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "doc_seq": pa.array(seqs, pa.int64()),
                "pid": pa.array(pids, pa.uint64()),
                "text": pa.nulls(n, pa.string()),
            }
        )

    members = pairs.map_batches(to_member_rows, batch_format="pyarrow").materialize()
    # broadcast ONLY the candidate seqs (8 B each) for the doc-side filter
    seqs_needed = np.unique(
        np.concatenate(
            [
                t["doc_seq"].to_numpy(zero_copy_only=False)
                for t in ray.get(members.to_arrow_refs())
                if len(t)
            ]
            or [np.empty(0, np.int64)]
        )
    )
    filter_ref = ray.put(seqs_needed)

    def doc_rows(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        keep = get_broadcast(filter_ref)
        s = b["doc_seq"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keep, s)
        mask = (pos < keep.shape[0]) & (keep[np.minimum(pos, keep.shape[0] - 1)] == s)
        b = b.filter(pa.array(mask))
        n = len(b)
        return pa.table(
            {
                "seq_bucket": pa.array(
                    b["doc_seq"].to_numpy(zero_copy_only=False) % num_buckets,
                    pa.int64(),
                ),
                "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "doc_seq": b["doc_seq"],
                "pid": pa.nulls(n, pa.uint64()),
                "text": b["text"],
            }
        )

    def attach_text(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        d = group.filter(pa.array(side == 0))
        m = group.filter(pa.array(side == 1))
        out_empty = pa.table(
            {
                "pid": pa.array([], pa.uint64()),
                "pbucket": pa.array([], pa.int64()),
                "doc_seq": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        if len(d) == 0 or len(m) == 0:
            return out_empty
        dseq = d["doc_seq"].to_numpy(zero_copy_only=False)
        order = np.argsort(dseq, kind="stable")
        mseq = m["doc_seq"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dseq[order], mseq)
        ok = (pos < dseq.shape[0]) & (
            dseq[order][np.minimum(pos, dseq.shape[0] - 1)] == mseq
        )
        if not ok.all():  # member without a doc row: drop (defensive)
            m = m.filter(pa.array(ok))
            pos = pos[ok]
        pid = m["pid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pid": m["pid"],
                "pbucket": pa.array((pid % np.uint64(num_buckets)).astype(np.int64)),
                "doc_seq": m["doc_seq"],
                "text": pc.take(d["text"], pa.array(order[pos], pa.int64())),
            }
        )

    def verify_bucket(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {"doc_id_a": pa.array([], pa.int64()), "doc_id_b": pa.array([], pa.int64())}
        )
        n = len(group)
        if n == 0:
            return out_empty
        seq = group["doc_seq"].to_numpy(zero_copy_only=False)
        pid = group["pid"].to_numpy(zero_copy_only=False)
        # per-doc shingle set computed ONCE per bucket
        uniq, inv = np.unique(seq, return_inverse=True)
        first = np.zeros(uniq.shape[0], np.int64)
        first[inv[::-1]] = np.arange(n - 1, -1, -1)
        texts = group["text"].to_pylist()
        sets = [
            np.unique(
                shingle_hashes(
                    np.frombuffer(texts[f].encode("utf-8"), np.uint8), k
                )
            )
            if texts[f]
            else np.empty(0, np.uint64)
            for f in first
        ]
        # one argsort + run segmentation over pid (not a rescan per pair)
        order = np.argsort(pid, kind="stable")
        pid_s, inv_s = pid[order], inv[order]
        new = np.concatenate(([True], pid_s[1:] != pid_s[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [pid_s.shape[0]]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue  # defensive: missing doc row
            sa_, sb_ = sets[inv_s[s]], sets[inv_s[s + 1]]
            inter = np.intersect1d(sa_, sb_, assume_unique=True).shape[0]
            union = sa_.shape[0] + sb_.shape[0] - inter
            # union == 0 (both docs shorter than k) emits nothing: the
            # exact oracle has no shingles for either doc, hence no pair.
            if union and inter / union >= threshold:
                p = pid_s[s]
                a_out.append(int(p >> np.uint64(32)))
                b_out.append(int(p & np.uint64(0xFFFFFFFF)))
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
            }
        )

    joined = (
        docs.map_batches(doc_rows, batch_format="pyarrow")
        .union(members)
        .groupby("seq_bucket")
        .map_groups(attach_text, batch_format="pyarrow")
    )
    return joined.groupby("pbucket").map_groups(verify_bucket, batch_format="pyarrow")


def ngram_jaccard_exact_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    num_buckets: int = 64,
    verify_broadcast_limit: int = 8_000_000,
    bitset_byte_limit: int = 256 << 20,
    emit_jaccard: bool = False,
    metric: str = "jaccard",
):
    """EXACT k=8-byte-shingle Jaccard pairs, DuckDB-green, via PPJoin
    prefix + positional filtering (Xiao et al., WWW'08): candidates come
    only from the RAREST ~(1-t) fraction of each doc's shingles, pruned
    further by match position, then verified exactly.

    ``metric="containment"`` switches the WHOLE cascade to exact
    max-containment pairs: C(A,B) = |A∩B| / min(|A|,|B|) >= t — the
    subset-inclusion duplicates (a page quoted whole inside a longer
    page) that Jaccard structurally misses when the size ratio is
    large. Filter changes, each still enlarging-only: the length filter
    is DROPPED (any size ratio can contain), the inverted index holds
    ALL hot rows (not just prefixes) because only the pair's SMALLER
    side is guaranteed a prefix hit, and the positional bound must
    reach ceil(t*min(n_a,n_b)). Candidate expansion (r5) is
    SLACK-CUTOFF anchored: each posting run sorts by slack q = n-rank
    descending, so an anchor's qualifying partners are exactly a
    q-prefix of its run found by one searchsorted — per-anchor exact
    windows, zero over-generation. On top sits the l=L COUNT filter
    (extended-prefix counting, AdaptJoin, Wang et al. VLDB'12): a pair
    with overlap >= alpha must place >= min(alpha, L) shared shingles
    inside the relaxed rank windows, so pairs sharing only a short
    common phrase never reach verify (8.3M -> 0.58M candidates at
    sf0.1, answer 290 — both filters exact, see expand_candidates).
    Discovery proof mirrors the Jaccard one: the pair's
    globally-FIRST shared shingle has rank <= n_small - i <
    prefix(n_small) in the smaller doc, and the overlap bound at that
    occurrence is exact. Remaining cost is structural: generation
    volume == sum over doc pairs of shared-window-shingle counts
    (~66M at sf0.1 even with L=1 strict windows on the dense word-
    salad fixture), the information-theoretic floor of any
    inverted-index scheme on a corpus this dense.

    k is fixed at 8 so each shingle packs EXACTLY into one u64 word
    (big-endian): shingle identity is collision-free and bijective with
    the oracle's 8-BYTE hex(encode(text)) slices — byte-exact on
    non-ASCII input too (tests/test_nonascii_oracles.py).

    Why not plain inverted-index counting: expanding all-pairs within each
    shingle's posting list is O(sum_sh df(sh)^2) — measured 280M pair
    rows / 190+ s at sf0.1 where the final answer is 256 pairs. The
    exact-filter cascade gets there in a few seconds:

    1. df pass: per-doc-distinct shingle rows -> global doc frequency of
       every shingle with >= 2 docs ("hot"; 32-way shard+reduce).
    2. prefix pass: re-derive each doc's distinct shingles, order by the
       global (df, sh) total order ascending, keep the first
       p = n - ceil(t*n) + 1 (the prefix). If J(A,B) >= t the prefixes
       MUST share a shingle, and shared shingles have df >= 2 — only
       prefix-AND-hot rows (with their rank) enter the inverted index.
    3. candidates: within each prefix posting run, all-pairs plus
       (a) the length filter min(n_a,n_b) >= t*max(n_a,n_b) and
       (b) the POSITIONAL filter: a match at ranks (ra, rb) bounds the
       overlap by 1 + min(n_a-1-ra, n_b-1-rb), which must reach
       alpha = ceil(t/(1+t)*(n_a+n_b)). Per-occurrence testing equals
       testing at the pair's globally first shared token (earlier
       matches only have larger bounds), so this stays EXACT while
       cutting candidates ~7x on repetitive web text (1.44M -> 200k
       measured at sf0.1).
    4. verify: shared shingles necessarily have df >= 2, so
       |A ∩ B| = |hot(A) ∩ hot(B)| exactly. Each candidate doc's
       hot-shingle rows ship ONCE per pair-hash bucket that needs them
       (not once per pair); the per-pair replication happens node-local
       inside the verify task (numpy repeat + one lexsort + run-length
       dup count) — shuffle volume stays O(docs x shingles x buckets),
       never O(pairs x shingles). Texts never shuffle; candidate pair
       keys (8 B each, output-bounded) are the only driver collection.

    Floating-point care: all candidate-side bounds use ceil(x - 1e-9) /
    >= x - 1e-9 so rounding only ENLARGES the candidate set; the final
    Jaccard test is exact integer inter/union in float64 division,
    matching DuckDB."""
    import os as _os
    import time as _time

    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys_counts

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    is_cont = metric == "containment"
    K = 8
    EPS = 1e-9
    # count-filter depth (containment): see expand_candidates. Larger L
    # widens the generation windows by L-1 ranks but demands L relaxed
    # occurrences per pair — the sweet spot trades expansion volume
    # against verify volume (swept at sf0.1; env override for tuning).
    CNT_L = int(_os.environ.get("GRAFT_CONT_L", "16"))
    n_verify_buckets = 16
    _dbg = bool(_os.environ.get("GRAFT_DEBUG_TIMING"))
    _t0 = _time.time()

    def _mark(label: str) -> None:
        if _dbg:
            print(f"[pairs:{metric}] {label}: {_time.time() - _t0:.2f}s")

    def _doc_shingles(batch: pa.Table):
        """Distinct (doc, shingle) rows sorted by (doc, shingle):
        returns (ids, doc_ix, sh, n_per_doc)."""
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 32):
            # pair identity packs two ids into one u64 (32-bit halves)
            raise ValueError("ngram_jaccard_exact_pairs requires 0 <= doc_id < 2^32")
        nb = len(batch)
        lens = np.diff(offsets)
        cnt = np.maximum(lens - K + 1, 0).astype(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return ids, np.empty(0, np.int64), np.empty(0, np.uint64), np.zeros(nb, np.int64)
        # pack every 8-byte window of the whole batch buffer into u64
        buf = np.concatenate([data, np.zeros(K, np.uint8)])
        m = data.shape[0]
        v8 = np.zeros(m, np.uint64)
        for j in range(K):
            v8 = (v8 << np.uint64(8)) | buf[j : j + m].astype(np.uint64)
        doc_ix = np.repeat(np.arange(nb), cnt)
        seg_start = np.cumsum(cnt) - cnt
        pos = (np.arange(total) - seg_start[doc_ix]) + offsets[doc_ix]
        sh = v8[pos]
        order = np.lexsort((sh, doc_ix))
        d_s, s_s = doc_ix[order], sh[order]
        keep = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])))
        d_k, s_k = d_s[keep], s_s[keep]
        n_doc = np.bincount(d_k, minlength=nb).astype(np.int64)
        return ids, d_k, s_k, n_doc

    def shingle_rows(batch: pa.Table) -> pa.Table:
        # df pass emits ONLY the 8-byte shingle column (one row per
        # distinct (doc, shingle)) — row count per shingle IS its df
        _ids, _d, s_k, _n = _doc_shingles(batch)
        return pa.table({"sh": pa.array(s_k, pa.uint64())})

    mat = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(shingle_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    def _pairs_table(keepp: np.ndarray, jv: np.ndarray) -> pa.Table:
        """Verified pairs (+ the exact metric value when emit_jaccard —
        the pressure-curve/report consumer; the plain query keeps its
        2-column oracle schema)."""
        cols = {
            "doc_id_a": pa.array((keepp >> np.uint64(32)).astype(np.int64)),
            "doc_id_b": pa.array(
                (keepp & np.uint64(0xFFFFFFFF)).astype(np.int64)
            ),
        }
        if emit_jaccard:
            cols[metric] = pa.array(jv, pa.float64())
        return pa.table(cols)

    # same result type on every branch: callers use Dataset-only APIs
    empty = ray.data.from_arrow(
        _pairs_table(np.empty(0, np.uint64), np.empty(0, np.float64))
    )
    _mark("df-mat")
    hot, dfc = hot_u64_keys_counts(mat, "sh")
    _mark("hot-keys")
    if hot.shape[0] == 0:
        return empty
    hot_ref = ray.put((hot, dfc))

    _empty_cand = pa.table(
        {"pbucket": pa.array([], pa.int64()), "pair": pa.array([], pa.uint64())}
    )
    _empty_cand_cont = pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "pair": pa.array([], pa.uint64()),
            "cnt": pa.array([], pa.int64()),
            "st": pa.array([], pa.uint8()),
            "req": pa.array([], pa.uint8()),
        }
    )

    def prefix_rows(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        H, DF = get_broadcast(hot_ref)
        ids, d_k, s_k, n_doc = _doc_shingles(batch)
        if s_k.shape[0] == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "pref": pa.array([], pa.bool_()),
                }
            )
        pos = np.searchsorted(H, s_k)
        pos_c = np.minimum(pos, H.shape[0] - 1)
        is_hot = (pos < H.shape[0]) & (H[pos_c] == s_k)
        dfv = np.where(is_hot, DF[pos_c], 1)
        # rank each doc's shingles under the global (df, sh) order
        order = np.lexsort((s_k, dfv, d_k))
        d_o, s_o, df_o = d_k[order], s_k[order], dfv[order]
        starts = np.searchsorted(d_o, np.arange(n_doc.shape[0]))
        rank = np.arange(d_o.shape[0]) - starts[d_o]
        p_doc = n_doc - np.ceil(threshold * n_doc - EPS).astype(np.int64) + 1
        # containment widens the anchor window by L-1 ranks (EXTENDED
        # prefix, AdaptJoin-style): the l=L count filter needs the
        # pair's L-th-smallest shared shingle, whose anchor rank can
        # sit up to L-1 past the strict prefix (see expand_candidates).
        in_pref = rank < p_doc[d_o] + (CNT_L - 1 if is_cont else 0)
        # jaccard indexes ONLY prefix rows (both sides of a pair are
        # guaranteed a prefix hit); containment must index every hot
        # row — only the smaller side is guaranteed one — with the
        # (extended-)prefix flag carried for the anchored expansion.
        keep = (df_o >= 2) if is_cont else (in_pref & (df_o >= 2))
        d_f, s_f, r_f = d_o[keep], s_o[keep], rank[keep]
        return pa.table(
            {
                "bucket": pa.array((s_f % np.uint64(num_buckets)).astype(np.int64)),
                "sh": pa.array(s_f, pa.uint64()),
                "doc_id": pa.array(ids[d_f], pa.int64()),
                "n": pa.array(n_doc[d_f], pa.int64()),
                "rank": pa.array(r_f, pa.int64()),
                "pref": pa.array(in_pref[keep], pa.bool_()),
            }
        )

    def expand_candidates(group: pa.Table) -> pa.Table:
        sh = group["sh"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        rk = group["rank"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sh))
        sh, did, n, rk = sh[order], did[order], n[order], rk[order]
        new = np.concatenate(([True], sh[1:] != sh[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.cumsum(run_len) - run_len
        local = np.arange(sh.shape[0]) - run_start[run_id]
        if is_cont:
            # SLACK-CUTOFF anchored expansion + l=L COUNT filter
            # (extended-prefix counting, AdaptJoin / Wang et al.
            # VLDB'12 — both exact). Theory: if |A∩B| >= alpha =
            # ceil(t*min(na,nb)), the i-th globally-smallest shared
            # shingle s_i has rank <= n - (alpha-i+1) on BOTH sides
            # (the alpha-i+1 larger shared shingles all rank above
            # s_i). With slack q = n - rank, occurrence s_i satisfies
            # min(q_a, q_b) >= alpha - i + 1, so for L' = min(alpha,L)
            # at least L' occurrences pass the RELAXED bound thr =
            # alpha - L' + 1, and s_1 passes the STRICT bound alpha.
            # A pair whose shared rare material is one short phrase
            # (< L overlapping 8-grams inside the rank windows) never
            # reaches verify — the dominant web-text false-positive
            # class.
            #
            # Generation is waste-free: each run sorts by q DESCENDING,
            # so an anchor's qualifying partners (q_b >= thr_a) are
            # exactly a prefix of the run found by one searchsorted —
            # per-ANCHOR cutoffs, not the old run-min window that let
            # one tiny anchor validate every partner for all anchors.
            # Every generated occurrence with the anchor on the
            # (n, doc_id)-smaller side is relaxed-qualifying by
            # construction (q_a >= thr_a holds from the ext-prefix rank
            # bound); the opposite direction is dropped so each
            # (pair, shingle) occurrence is counted exactly once —
            # the smaller side's own cutoff emits it iff it qualifies.
            q = n - rk
            order2 = np.lexsort((-q, sh))
            sh, did, n, rk, q = (
                sh[order2], did[order2], n[order2], rk[order2], q[order2]
            )
            # sh/did/n/rk were already permuted by `order` above — the
            # raw column must go through BOTH permutations to stay
            # row-aligned (order[order2], never order2 alone)
            pref = group["pref"].to_numpy(zero_copy_only=False)[order][order2]
            new2 = np.concatenate(([True], sh[1:] != sh[:-1]))
            run_id = np.cumsum(new2) - 1
            run_len = np.bincount(run_id)
            run_start = np.cumsum(run_len) - run_len
            ppos = np.flatnonzero(pref)
            if ppos.shape[0] == 0:
                return _empty_cand_cont
            na_a = n[ppos]
            alpha_a = np.ceil(threshold * na_a - EPS).astype(np.int64)
            req_a = np.minimum(alpha_a, CNT_L)
            thr_a = np.maximum(alpha_a - req_a + 1, 1)
            # segmented cutoff: keys ascend by (run, -q); rows of run r
            # with q >= thr live in [run_start[r], searchsorted(...)).
            # Stride = max_q+1 (not a fixed 2^41) so run_id * stride
            # can't overflow int64 at any plausible run count.
            _B2 = np.int64(int(q.max()) + 1)
            keys = run_id.astype(np.int64) * _B2 + (_B2 - 1 - q)
            rid_a = run_id[ppos].astype(np.int64)
            cnt_a = (
                np.searchsorted(
                    keys, rid_a * _B2 + (_B2 - 1 - thr_a), side="right"
                )
                - run_start[rid_a]
            )
            rep_p = cnt_a - 1  # anchor's own row is inside its cutoff
            hasp = rep_p > 0
            tot = int(rep_p[hasp].sum())
            if tot == 0:
                return _empty_cand_cont
            ppos_s, rep_s = ppos[hasp], rep_p[hasp]
            alpha_s, req_s = alpha_a[hasp], req_a[hasp]
            pos_a = ppos_s - run_start[run_id[ppos_s]]
            gi = np.repeat(
                np.arange(ppos_s.shape[0], dtype=np.int32), rep_s
            )
            seg = np.cumsum(rep_s) - rep_s
            j = np.arange(tot, dtype=np.int64) - seg[gi]
            j = j + (j >= pos_a[gi])  # skip the anchor's own slot
            a_idx = np.repeat(ppos_s, rep_s)
            b_idx = np.repeat(run_start[run_id[ppos_s]], rep_s) + j
            # canonical direction: anchor strictly the (n, doc_id)-
            # smaller side; the reverse copy is emitted (iff it
            # qualifies) by the other row's own anchor cutoff. The
            # (n, did) composite packs both the direction compare and
            # the doc ids into ONE gather per side — per-row DRAM
            # traffic, not FLOPs, bounds this stage at 32 workers
            # (repo-wide bytes-moved rule), so everything else gathers
            # only AFTER `fwd` halves the rows.
            comp = (n.astype(np.uint64) << np.uint64(32)) | did.astype(
                np.uint64
            )
            ca, cb = comp[a_idx], comp[b_idx]
            fwd = ca < cb
            if not fwd.any():
                return _empty_cand_cont
            a_idx, b_idx, gi = a_idx[fwd], b_idx[fwd], gi[fwd]
            ca, cb = ca[fwd], cb[fwd]
            strict = (
                np.minimum(q[a_idx], q[b_idx]) >= alpha_s[gi]
            ).astype(np.uint8)
            reqv = req_s[gi].astype(np.uint8)
            _M32 = np.uint64(0xFFFFFFFF)
            ia, ib = ca & _M32, cb & _M32
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            pairs_all = (lo << np.uint64(32)) | hi
            u, inv = np.unique(pairs_all, return_inverse=True)
            cnt = np.bincount(inv, minlength=u.shape[0]).astype(np.int64)
            st = np.zeros(u.shape[0], np.uint8)
            np.maximum.at(st, inv, strict)
            rq = np.zeros(u.shape[0], np.uint8)
            np.maximum.at(rq, inv, reqv)
            return pa.table(
                {
                    "pbucket": pa.array(
                        (u % np.uint64(num_buckets)).astype(np.int64)
                    ),
                    "pair": pa.array(u, pa.uint64()),
                    "cnt": pa.array(cnt, pa.int64()),
                    "st": pa.array(st, pa.uint8()),
                    "req": pa.array(rq, pa.uint8()),
                }
            )
        rep = (run_len[run_id] - 1 - local).astype(np.int64)
        tot = int(rep.sum())
        if tot == 0:
            return _empty_cand
        a_idx = np.repeat(np.arange(sh.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        off = np.arange(tot) - seg[a_idx] + 1
        b_idx = a_idx + off
        na, nbv, ra, rb = n[a_idx], n[b_idx], rk[a_idx], rk[b_idx]
        # length filter + positional filter (both exact, see docstring)
        alpha = np.ceil(
            threshold / (1.0 + threshold) * (na + nbv) - EPS
        ).astype(np.int64)
        ok = (np.minimum(na, nbv) >= threshold * np.maximum(na, nbv) - EPS) & (
            1 + np.minimum(na - 1 - ra, nbv - 1 - rb) >= alpha
        )
        a_idx, b_idx = a_idx[ok], b_idx[ok]
        if a_idx.shape[0] == 0:
            return _empty_cand
        pair = np.unique(
            (did[a_idx].astype(np.uint64) << np.uint64(32))
            | did[b_idx].astype(np.uint64)
        )
        return pa.table(
            {
                "pbucket": pa.array((pair % np.uint64(num_buckets)).astype(np.int64)),
                "pair": pa.array(pair, pa.uint64()),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        pair = np.unique(group["pair"].to_numpy(zero_copy_only=False))
        return pa.table({"pair": pa.array(pair, pa.uint64())})

    def bucket_count_filter(group: pa.Table) -> pa.Table:
        """Containment combine: sum each pair's relaxed-occurrence
        counts across shingle buckets (pair -> pbucket is deterministic,
        so ALL of a pair's partial rows land here), then apply the two
        exact necessary conditions: >= 1 strict occurrence, and >=
        min(alpha, L) relaxed occurrences (the count filter)."""
        pair = group["pair"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(pair, return_inverse=True)
        csum = np.zeros(u.shape[0], np.int64)
        np.add.at(csum, inv, group["cnt"].to_numpy(zero_copy_only=False))
        stm = np.zeros(u.shape[0], np.uint8)
        np.maximum.at(stm, inv, group["st"].to_numpy(zero_copy_only=False))
        rqm = np.zeros(u.shape[0], np.uint8)
        np.maximum.at(rqm, inv, group["req"].to_numpy(zero_copy_only=False))
        keep = (stm > 0) & (csum >= rqm)
        return pa.table({"pair": pa.array(u[keep], pa.uint64())})

    idx_rows = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        prefix_rows, batch_format="pyarrow", batch_size=4096
    )
    if is_cont:
        # Containment prefix bound (VERDICT r03 #1): the group-local
        # partner pre-filter (see expand_candidates) is applied BEFORE
        # the repartition+groupby shuffle too, so non-viable partner
        # rows never shuffle. na_min per hot shingle = min size of any
        # doc whose PREFIX contains it — a driver array the exact size
        # of the already-broadcast (hot, df) map; rows of anchor-less
        # shingles drop entirely. Byte-identical to the unfiltered
        # cascade: the filter formula equals the in-group one (all rows
        # of a shingle share one bucket, and every pref row survives,
        # so the group-local na_min is unchanged). ~1.7x fewer rows
        # through the double shuffle on the sf0.1 fixture.
        idx_mat = idx_rows.materialize()

        def anchor_min_partial(b: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            H, _DF = get_broadcast(hot_ref)
            prefm = b["pref"].to_numpy(zero_copy_only=False)
            sh_p = b["sh"].to_numpy(zero_copy_only=False)[prefm]
            n_p = b["n"].to_numpy(zero_copy_only=False)[prefm]
            hpos = np.searchsorted(H, sh_p)  # index rows are hot
            u, inv = np.unique(hpos, return_inverse=True)
            mn = np.full(u.shape[0], np.iinfo(np.int64).max)
            np.minimum.at(mn, inv, n_p)
            return pa.table(
                {
                    "hpos": pa.array(u, pa.int64()),
                    "mn": pa.array(mn, pa.int64()),
                }
            )

        na_min = np.full(hot.shape[0], np.iinfo(np.int64).max)
        # per-block raw tasks over the already-materialized index (one
        # Dataset execution fewer than a map_batches+materialize round)
        for tbl in ray.get(
            [
                _map_block.remote(anchor_min_partial, r)
                for r in idx_mat.to_arrow_refs()
            ]
        ):
            if len(tbl):
                np.minimum.at(
                    na_min,
                    tbl["hpos"].to_numpy(zero_copy_only=False),
                    tbl["mn"].to_numpy(zero_copy_only=False),
                )
        _BIG = np.int64(1) << np.int64(40)
        alpha_min_g = np.where(
            na_min >= _BIG,
            _BIG,  # anchor-less sentinel: the keep test below fails
            np.ceil(threshold * np.minimum(na_min, _BIG) - EPS).astype(
                np.int64
            ),
        )
        am_ref = ray.put(alpha_min_g)

        def partner_filter(b: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            alpha = get_broadcast(am_ref)
            H, _DF = get_broadcast(hot_ref)
            sh_ = b["sh"].to_numpy(zero_copy_only=False)
            am = alpha[np.searchsorted(H, sh_)]
            prefm = b["pref"].to_numpy(zero_copy_only=False)
            n_ = b["n"].to_numpy(zero_copy_only=False)
            rk_ = b["rank"].to_numpy(zero_copy_only=False)
            thr = np.maximum(am - (CNT_L - 1), 1)
            keep = prefm | ((am < _BIG) & (rk_ <= n_ - thr))
            return b.filter(pa.array(keep))

        _mark("index-mat")
        # raw-task shard+reduce instead of repartition + two Dataset
        # groupbys (r5): index blocks shard by shingle bucket in one
        # pass with the partner filter fused, each bucket's expansion
        # reducer shards its pair-partials by pbucket, and terminal
        # combiners apply the count filter — same math, two fewer
        # all-to-all exchanges, one task per bucket across the pool.
        _empty_pairs = pa.table({"pair": pa.array([], pa.uint64())})
        shard_refs = [
            _shard_table_block.options(num_returns=num_buckets).remote(
                r, partner_filter, "bucket", num_buckets
            )
            for r in idx_mat.to_arrow_refs()
        ]
        exp_refs = [
            _reduce_and_shard.options(num_returns=num_buckets).remote(
                expand_candidates, "pbucket", num_buckets,
                *(row[b] for row in shard_refs),
            )
            for b in range(num_buckets)
        ]
        cand = ray.data.from_arrow_refs(
            [
                _reduce_concat.remote(
                    bucket_count_filter, _empty_pairs,
                    *(row[p] for row in exp_refs),
                )
                for p in range(num_buckets)
            ]
        ).materialize()
    else:
        cand = (
            idx_rows
            .groupby("bucket")
            .map_groups(expand_candidates, batch_format="pyarrow")
            .groupby("pbucket")
            .map_groups(bucket_distinct, batch_format="pyarrow")
            .materialize()
        )
    _mark("candidates")
    ptabs = ray.get(cand.to_arrow_refs())
    pchunks = [t["pair"].to_numpy(zero_copy_only=False) for t in ptabs if len(t)]
    if not pchunks:
        return empty
    allp = np.concatenate(pchunks)
    _mark(f"collect ({allp.shape[0]} cand pairs)")
    docs_needed = np.unique(
        np.concatenate(
            [allp >> np.uint64(32), allp & np.uint64(0xFFFFFFFF)]
        ).astype(np.int64)
    )
    docs_ref = ray.put(docs_needed)

    _empty_out = _pairs_table(np.empty(0, np.uint64), np.empty(0, np.float64))

    def _cand_doc_hot(batch: pa.Table):
        """(doc_id, hot shingle, n) arrays for candidate docs only."""
        from hg_dedup_ray.stages.broadcast import get_broadcast

        need = get_broadcast(docs_ref)
        ids0 = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(need, ids0)
        m = (pos < need.shape[0]) & (need[np.minimum(pos, need.shape[0] - 1)] == ids0)
        batch = batch.filter(pa.array(m))
        ids, d_k, s_k, n_doc = _doc_shingles(batch)
        H, _DF = get_broadcast(hot_ref)
        if s_k.shape[0]:
            p2 = np.searchsorted(H, s_k)
            p2c = np.minimum(p2, H.shape[0] - 1)
            is_hot = (p2 < H.shape[0]) & (H[p2c] == s_k)
            d_f, s_f = d_k[is_hot], s_k[is_hot]
        else:
            d_f, s_f = d_k, s_k
        return ids[d_f], s_f, n_doc[d_f]

    # --- verify-path selection. The doc side of the verification join is
    # the candidate docs' hot-shingle rows, bounded above by mat's row
    # count (already materialized — the check is free). Below the limit
    # that side is a few-MB ray.put broadcast read by every verify task:
    # verification becomes one shuffle-free map_batches over candidate
    # pairs. Above it, the bucketed two-hop join keeps every row in the
    # object store — the 100 TB path, same math, tested equal.
    if mat.count() <= verify_broadcast_limit:
        def cand_doc_hot_rows(b: pa.Table) -> pa.Table:
            doc, sh_, n_ = _cand_doc_hot(b)
            return pa.table(
                {
                    "doc_id": pa.array(doc, pa.int64()),
                    "sh": pa.array(sh_, pa.uint64()),
                    "n": pa.array(n_, pa.int64()),
                }
            )

        doc_rows = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            cand_doc_hot_rows, batch_format="pyarrow", batch_size=4096
        )
        tabs2 = ray.get(doc_rows.materialize().to_arrow_refs())
        dd = [t["doc_id"].to_numpy(zero_copy_only=False) for t in tabs2 if len(t)]
        if not dd:
            return empty
        ddoc = np.concatenate(dd)
        dsh = np.concatenate(
            [t["sh"].to_numpy(zero_copy_only=False) for t in tabs2 if len(t)]
        )
        dn = np.concatenate(
            [t["n"].to_numpy(zero_copy_only=False) for t in tabs2 if len(t)]
        )
        order = np.lexsort((dsh, ddoc))
        ddoc, dsh, dn = ddoc[order], dsh[order], dn[order]
        doc_u, doc_start, doc_cnt = np.unique(
            ddoc, return_index=True, return_counts=True
        )
        n_by_doc = dn[doc_start]

        # Bitset fast path: hot shingles index a compact bit space, so
        # each doc is one row of a (docs x ceil(|hot|/64)) u64 matrix and
        # |A ∩ B| is AND + popcount — no per-batch lexsort at all.
        # Guarded by matrix size; the lexsort verify below is the
        # fallback when the local hot-shingle space is too wide.
        width = (hot.shape[0] + 63) // 64
        if doc_u.shape[0] * width * 8 <= bitset_byte_limit:
            row = np.searchsorted(doc_u, ddoc)
            idx = np.searchsorted(hot, dsh).astype(np.uint64)
            bits = np.zeros((doc_u.shape[0], width), np.uint64)
            np.bitwise_or.at(
                bits,
                (row, (idx >> np.uint64(6)).astype(np.int64)),
                np.uint64(1) << (idx & np.uint64(63)),
            )
            pop16 = np.array(
                [bin(i).count("1") for i in range(1 << 16)], np.uint8
            )
            side_ref = ray.put((doc_u, bits, n_by_doc, pop16))

            def verify_bitset(b: pa.Table) -> pa.Table:
                from hg_dedup_ray.stages.broadcast import get_broadcast

                doc_u, bits, n_by_doc, pop16 = get_broadcast(side_ref)
                pair = b["pair"].to_numpy(zero_copy_only=False)
                if pair.shape[0] == 0:
                    return _empty_out
                a = (pair >> np.uint64(32)).astype(np.int64)
                bb = (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)
                pa_ = np.searchsorted(doc_u, a)
                pb_ = np.searchsorted(doc_u, bb)
                nd = doc_u.shape[0]
                found = (
                    (pa_ < nd)
                    & (pb_ < nd)
                    & (doc_u[np.minimum(pa_, nd - 1)] == a)
                    & (doc_u[np.minimum(pb_, nd - 1)] == bb)
                )
                pair, pa_, pb_ = pair[found], pa_[found], pb_[found]
                if pair.shape[0] == 0:
                    return _empty_out
                # chunked AND+popcount: a full-batch `bits[pa_] & bits[pb_]`
                # temporary is (65536, width) u64 ≈ 100 MB — DRAM-bound
                # (the repo-wide cache-resident-chunk rule); 2048-pair
                # chunks keep every temporary in L2 (~3 MB)
                inter = np.empty(pair.shape[0], np.int64)
                CH = 2048
                for c0 in range(0, pair.shape[0], CH):
                    c1 = min(c0 + CH, pair.shape[0])
                    band = bits[pa_[c0:c1]] & bits[pb_[c0:c1]]
                    inter[c0:c1] = (
                        pop16[band.view(np.uint16).reshape(c1 - c0, -1)]
                        .sum(axis=1)
                        .astype(np.int64)
                    )
                denom = (
                    np.minimum(n_by_doc[pa_], n_by_doc[pb_])
                    if is_cont
                    else n_by_doc[pa_] + n_by_doc[pb_] - inter
                )
                jac = np.divide(
                    inter, denom, out=np.zeros(pair.shape[0]), where=denom > 0
                )
                okj = jac >= threshold
                return _pairs_table(pair[okj], jac[okj])

            n_parts = max(1, min(64, allp.shape[0] // 65536 + 1))
            return cand.repartition(n_parts).map_batches(
                verify_bitset, batch_format="pyarrow", batch_size=65536
            )

        side_ref = ray.put((doc_u, doc_start, doc_cnt, n_by_doc, dsh))

        def verify_broadcast(b: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            doc_u, doc_start, doc_cnt, n_by_doc, dsh = get_broadcast(side_ref)
            pair = b["pair"].to_numpy(zero_copy_only=False)
            if pair.shape[0] == 0:
                return _empty_out
            np_ = pair.shape[0]
            mdoc = np.concatenate(
                [
                    (pair >> np.uint64(32)).astype(np.int64),
                    (pair & np.uint64(0xFFFFFFFF)).astype(np.int64),
                ]
            )
            pidx = np.concatenate([np.arange(np_)] * 2)
            pos = np.searchsorted(doc_u, mdoc)
            okd = (pos < doc_u.shape[0]) & (
                doc_u[np.minimum(pos, doc_u.shape[0] - 1)] == mdoc
            )
            pidx, pos = pidx[okd], pos[okd]
            sum_n = np.bincount(
                pidx, weights=n_by_doc[pos], minlength=np_
            ).astype(np.int64)
            mcount = np.bincount(pidx, minlength=np_)
            rep = doc_cnt[pos]
            tot = int(rep.sum())
            if tot == 0:
                return _empty_out
            mi = np.repeat(np.arange(pidx.shape[0]), rep)
            seg = np.cumsum(rep) - rep
            off = np.arange(tot) - seg[mi]
            di = doc_start[pos][mi] + off
            p_all, sh_all = pidx[mi], dsh[di]
            o3 = np.lexsort((sh_all, p_all))
            p_s, sh_s = p_all[o3], sh_all[o3]
            dup = (p_s[1:] == p_s[:-1]) & (sh_s[1:] == sh_s[:-1])
            inter = np.bincount(p_s[1:][dup], minlength=np_).astype(np.int64)
            if is_cont:
                denom = np.full(np_, np.iinfo(np.int64).max, np.int64)
                np.minimum.at(denom, pidx, n_by_doc[pos].astype(np.int64))
                denom[mcount != 2] = 0
            else:
                denom = sum_n - inter
            jac = np.divide(inter, denom, out=np.zeros(np_), where=denom > 0)
            okj = (jac >= threshold) & (mcount == 2)
            return _pairs_table(pair[okj], jac[okj])

        # cand materializes as a handful of blocks; re-split so the verify
        # tasks (the compute-heavy part) use the whole CPU pool. 8 KB-row
        # slices keep the local replication (~0.5 M rows each) cache-warm.
        n_parts = max(1, min(256, allp.shape[0] // 8192 + 1))
        return cand.repartition(n_parts).map_batches(
            verify_broadcast, batch_format="pyarrow", batch_size=8192
        )

    def member_rows(b: pa.Table) -> pa.Table:
        pair = b["pair"].to_numpy(zero_copy_only=False)
        a = (pair >> np.uint64(32)).astype(np.int64)
        bb = (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)
        doc = np.concatenate([a, bb])
        pr = np.concatenate([pair, pair])
        nm = doc.shape[0]
        return pa.table(
            {
                "dbucket": pa.array(doc % num_buckets, pa.int64()),
                "kind": pa.array(np.ones(nm, np.uint8), pa.uint8()),
                "doc_id": pa.array(doc, pa.int64()),
                "sh": pa.nulls(nm, pa.uint64()),
                "n": pa.nulls(nm, pa.int64()),
                "pair": pa.array(pr, pa.uint64()),
            }
        )

    def doc_side_rows(batch: pa.Table) -> pa.Table:
        doc, s_f, n_f = _cand_doc_hot(batch)
        nr = doc.shape[0]
        return pa.table(
            {
                "dbucket": pa.array(doc % num_buckets, pa.int64()),
                "kind": pa.array(np.zeros(nr, np.uint8), pa.uint8()),
                "doc_id": pa.array(doc, pa.int64()),
                "sh": pa.array(s_f, pa.uint64()),
                "n": pa.array(n_f, pa.int64()),
                "pair": pa.nulls(nr, pa.uint64()),
            }
        )

    _empty_attached = pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "kind": pa.array([], pa.uint8()),
            "pair": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "sh": pa.array([], pa.uint64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def attach_docs(group: pa.Table) -> pa.Table:
        """One doc-hash bucket: ship each doc's hot-shingle rows ONCE per
        pair-hash bucket that needs the doc (kind=0 rows), plus one
        (pair, doc) row per membership (kind=1). The per-pair replication
        is deferred to the verify task — node-local numpy, not shuffle."""
        kind = group["kind"].to_numpy(zero_copy_only=False)
        d = group.filter(pa.array(kind == 0))
        m = group.filter(pa.array(kind == 1))
        if len(d) == 0 or len(m) == 0:
            return _empty_attached
        mdoc = m["doc_id"].to_numpy(zero_copy_only=False)
        mpair = m["pair"].to_numpy(zero_copy_only=False)
        mpb = (mpair % np.uint64(n_verify_buckets)).astype(np.int64)
        # distinct (doc, pbucket) demand
        okey = np.lexsort((mpb, mdoc))
        dd, pp = mdoc[okey], mpb[okey]
        firstd = np.concatenate(([True], (dd[1:] != dd[:-1]) | (pp[1:] != pp[:-1])))
        dem_doc, dem_pb = dd[firstd], pp[firstd]
        # replicate doc rows once per demanded pbucket
        ddoc = d["doc_id"].to_numpy(zero_copy_only=False)
        dsh = d["sh"].to_numpy(zero_copy_only=False)
        dn = d["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ddoc, kind="stable")
        ddoc, dsh, dn = ddoc[order], dsh[order], dn[order]
        doc_u, doc_start, doc_cnt = np.unique(
            ddoc, return_index=True, return_counts=True
        )
        pos = np.searchsorted(doc_u, dem_doc)
        okd = (pos < doc_u.shape[0]) & (
            doc_u[np.minimum(pos, doc_u.shape[0] - 1)] == dem_doc
        )
        dem_pb, pos = dem_pb[okd], pos[okd]
        rep = doc_cnt[pos]
        tot = int(rep.sum())
        if tot == 0:
            return _empty_attached
        mi = np.repeat(np.arange(dem_pb.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        off = np.arange(tot) - seg[mi]
        di = doc_start[pos][mi] + off
        nm = mpair.shape[0]
        return pa.table(
            {
                "pbucket": pa.array(
                    np.concatenate([dem_pb[mi], mpb]), pa.int64()
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(tot, np.uint8), np.ones(nm, np.uint8)]
                    ),
                    pa.uint8(),
                ),
                "pair": pa.chunked_array(
                    [pa.nulls(tot, pa.uint64()), pa.array(mpair, pa.uint64())]
                ),
                "doc_id": pa.array(
                    np.concatenate([ddoc[di], mdoc]), pa.int64()
                ),
                "sh": pa.chunked_array(
                    [pa.array(dsh[di], pa.uint64()), pa.nulls(nm, pa.uint64())]
                ),
                "n": pa.chunked_array(
                    [pa.array(dn[di], pa.int64()), pa.nulls(nm, pa.int64())]
                ),
            }
        )

    def verify_pairs(group: pa.Table) -> pa.Table:
        """One pair-hash bucket: replicate doc shingle rows per pair
        LOCALLY, then |A ∩ B| = duplicated (pair, shingle) keys (each
        side's set is distinct, so a key appears at most twice). One
        lexsort + run-length pass — no per-pair dispatch, no per-pair
        shuffle volume."""
        kind = group["kind"].to_numpy(zero_copy_only=False)
        d = group.filter(pa.array(kind == 0))
        m = group.filter(pa.array(kind == 1))
        if len(d) == 0 or len(m) == 0:
            return _empty_out
        # doc rows may arrive duplicated only if a doc's rows were
        # demanded from its single dbucket — unique by construction
        ddoc = d["doc_id"].to_numpy(zero_copy_only=False)
        dsh = d["sh"].to_numpy(zero_copy_only=False)
        dn = d["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ddoc, kind="stable")
        ddoc, dsh, dn = ddoc[order], dsh[order], dn[order]
        doc_u, doc_start, doc_cnt = np.unique(
            ddoc, return_index=True, return_counts=True
        )
        n_by_doc = dn[doc_start]
        # each (pair, doc) membership appears twice (once per side's
        # dbucket emission) — dedupe
        mpair = m["pair"].to_numpy(zero_copy_only=False)
        mdoc = m["doc_id"].to_numpy(zero_copy_only=False)
        ok2 = np.lexsort((mdoc, mpair))
        mpair, mdoc = mpair[ok2], mdoc[ok2]
        firstm = np.concatenate(
            ([True], (mpair[1:] != mpair[:-1]) | (mdoc[1:] != mdoc[:-1]))
        )
        mpair, mdoc = mpair[firstm], mdoc[firstm]
        pu, pidx = np.unique(mpair, return_inverse=True)
        # replicate each membership's doc rows locally
        pos = np.searchsorted(doc_u, mdoc)
        okd = (pos < doc_u.shape[0]) & (
            doc_u[np.minimum(pos, doc_u.shape[0] - 1)] == mdoc
        )
        pidx, pos, mdoc = pidx[okd], pos[okd], mdoc[okd]
        # denominators: sum of the two docs' n per pair
        sum_n = np.bincount(
            pidx, weights=n_by_doc[pos], minlength=pu.shape[0]
        ).astype(np.int64)
        rep = doc_cnt[pos]
        tot = int(rep.sum())
        if tot == 0:
            return _empty_out
        mi = np.repeat(np.arange(pidx.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        off = np.arange(tot) - seg[mi]
        di = doc_start[pos][mi] + off
        p_all, sh_all = pidx[mi], dsh[di]
        o3 = np.lexsort((sh_all, p_all))
        p_s, sh_s = p_all[o3], sh_all[o3]
        dup = (p_s[1:] == p_s[:-1]) & (sh_s[1:] == sh_s[:-1])
        inter = np.bincount(p_s[1:][dup], minlength=pu.shape[0]).astype(np.int64)
        # defensive: only pairs with BOTH docs' rows resolved may pass
        mcount = np.bincount(pidx, minlength=pu.shape[0])
        if is_cont:
            denom = np.full(pu.shape[0], np.iinfo(np.int64).max, np.int64)
            np.minimum.at(denom, pidx, n_by_doc[pos].astype(np.int64))
            denom[mcount != 2] = 0
        else:
            denom = sum_n - inter
        jac = np.divide(
            inter, denom, out=np.zeros(pu.shape[0]), where=denom > 0
        )
        okj = (jac >= threshold) & (mcount == 2)
        return _pairs_table(pu[okj], jac[okj])

    members = cand.map_batches(member_rows, batch_format="pyarrow")
    docrows = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        doc_side_rows, batch_format="pyarrow", batch_size=4096
    )
    return (
        docrows.union(members)
        .groupby("dbucket")
        .map_groups(attach_docs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(verify_pairs, batch_format="pyarrow")
    )


def ngram_containment_pairs(sf_dir: str, threshold: float = 0.6):
    """EXACT max-containment near-dup pairs, DuckDB-green:
    C(A,B) = |A∩B| / min(|A|,|B|) >= t over distinct 8-byte shingles —
    the dedup family member that catches SUBSET-INCLUSION duplicates
    (boilerplate-wrapped reposts, quoted-whole pages) which Jaccard
    structurally misses once the size ratio exceeds ~t. Runs the shared
    PPJoin-style cascade (``ngram_jaccard_exact_pairs``) with the
    containment filter set: no length filter, all-hot-rows index,
    prefix-anchored candidate expansion probed from the smaller side,
    ceil(t*min) positional bound, exact intersection verify. Default
    t=0.6 exercises containment-only pairs on the synthetic fixtures
    (34 of 290 pairs at sf0.1 are invisible to Jaccard at the same t)."""
    return ngram_jaccard_exact_pairs(
        sf_dir, threshold=threshold, metric="containment"
    )


EDIT_DISTANCE_D = 8


def edit_distance_pairs(
    sf_dir: str,
    d: int = EDIT_DISTANCE_D,
    num_buckets: int = 64,
    verify_broadcast_limit: int = 2_000_000,
    pair_collect_limit: int = 32_000_000,
    metric: str = "levenshtein",
):
    """EXACT edit-distance similarity join, DuckDB-green: all pairs with
    codepoint-level Levenshtein distance <= d — the near-dup family
    member that catches SMALL-EDIT duplicates (typo fixes, one-line
    template swaps, re-encodes) which set-based Jaccard/containment see
    only as "very similar", never as "k edits apart". No reference
    analog (the reference engine is byte-window equality only); built on
    the Ed-Join filter framework (Xiao, Wang, Lin — PVLDB 1(1), 2008)
    with the same cascade discipline as ``ngram_jaccard_exact_pairs``:

    0. exact-clone collapse: one representative per distinct text runs
       the cascade (content_hash_u64, the exact_dedup key); members are
       re-expanded onto verified rep pairs at the end plus the
       intra-clone ed=0 pairs. Clone families share ALL prefix grams —
       without this their C(k,2) pairs re-generate once per gram.
    1. df pass over distinct exact-packed 8-BYTE grams (u64, the
       shingle pack) -> global df of every gram with >= 2 docs.
    2. prefix pass: each doc ranks its distinct grams by the global
       (df, gram) order and indexes only its rarest hot grams — the
       ``8*d + 1`` rarest for pure-ASCII docs, ``11*d + 1`` otherwise.
       Completeness: one codepoint edit rewrites a <= 4-byte region of
       a doc (<= 1 byte when that doc is pure ASCII), destroying at
       most 11 (resp. 8) of ITS distinct gram types, so a true pair
       shares >= max(Da - cA*d, Db - cB*d) distinct grams and the
       classic prefix lemma puts one shared gram inside both docs'
       (c*d + 1)-prefixes (functions/editdist.BYTE_GRAM_DESTROY /
       ASCII_GRAM_DESTROY). Docs with fewer distinct grams than their
       prefix size (too short or too repetitive for the lemma) route
       WHOLE into one sentinel group.
    3. candidates: a WINDOWED sweep per posting run — rows sort by
       (run, nch) so each row's |n_a - n_b| <= d partners are one
       segmented searchsorted slice; length-filter survivors are the
       only pairs ever materialized (the sentinel group is simply a
       run with sh = 0, same code path).
    4. verify: threshold banded DP with per-row dropout, lockstep
       across pairs (functions/editdist.banded_levenshtein). There is
       deliberately NO shared-gram count filter: a pair that is far
       from the threshold exits the DP after ~O(d) rows (every cell is
       >= the previous row's band minimum), which costs less than the
       count filter's full Da+Db gather per pair — measured 4x
       end-to-end on a 320k-doc web-style corpus where 15M candidates
       cover a 4-pair answer.

    The verify side (candidate docs' text) is candidate-bounded, not
    corpus-bounded: below ``verify_broadcast_limit`` candidate-doc rows
    it ships once as a ray.put broadcast and verification is a
    shuffle-free map_batches over pair rows; above it, the bucketed
    two-hop join (doc-hash attach -> pair-hash verify, the
    ``ngram_jaccard_pairs`` LSH-verify shape) keeps every row in the
    object store — same math, pinned equal in tests/test_editdist.py.

    Output: (doc_id_a, doc_id_b, edit_distance), a < b, distance <= d.
    Distances are integers, so the oracle compare is exact with no
    rounding concerns.

    ``metric="hamming"`` swaps the candidate generator and the verify
    kernel but keeps the whole skeleton (the jaccard/containment shared
    -cascade pattern): pairs within d SUBSTITUTIONS — necessarily the
    same codepoint length. Candidates come from the classic position-
    partition pigeonhole (Hamming cousin of Pass-Join's segments):
    each doc splits its codepoints into d+1 near-equal POSITION blocks
    (layout is a pure function of the length, so equal-length docs
    share it); <= d mismatches over d+1 disjoint blocks leave >= 1
    block IDENTICAL at the identical span, so indexing (length, block
    index, block content hash) finds every true pair — hash collisions
    only add candidates, killed by the exact verify. Docs shorter than
    d+1 codepoints route to the sentinel (every equal-length pair of
    theirs is trivially within d). The run sweep uses window 0 (equal
    lengths), and verify is functions/editdist.chunked_hamming —
    mismatches only accumulate, so dropout is per position-chunk.
    Output column: hamming_distance."""
    from hg_dedup_ray.functions.editdist import (
        ASCII_GRAM_DESTROY,
        BYTE_GRAM_DESTROY,
        banded_levenshtein,
        char_counts,
        chunked_hamming,
        codepoints,
        doc_distinct_grams,
    )
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys_counts

    import os as _os
    import time as _time

    if metric not in ("levenshtein", "hamming"):
        raise ValueError(f"unknown metric {metric!r}")
    is_ham = metric == "hamming"
    val_col = "hamming_distance" if is_ham else "edit_distance"
    d_win = 0 if is_ham else d  # run-sweep length window
    SENTINEL = num_buckets  # the degenerate (short/repetitive) group
    _dbg = bool(_os.environ.get("GRAFT_DEBUG_TIMING"))
    _t0 = _time.time()

    def _mark(label: str) -> None:
        if _dbg:
            print(f"[editdist] {label}: {_time.time() - _t0:.2f}s")

    def _doc_arrays(batch: pa.Table):
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError("edit_distance_pairs requires 0 <= doc_id < 2^32")
        d_k, g_k, n_gram = doc_distinct_grams(data, offsets)
        nch = char_counts(data, offsets)
        # per-doc prefix size: pure-ASCII docs lose <= 8 gram types per
        # edit (their own edited region is 1 byte), multibyte docs <= 11
        # — the two sides' bounds compose independently in the lemma
        pref_doc = (
            np.where(
                nch == np.diff(offsets), ASCII_GRAM_DESTROY, BYTE_GRAM_DESTROY
            ).astype(np.int64)
            * d
            + 1
        )
        return ids, d_k, g_k, n_gram, nch, pref_doc

    # --- stage 0: EXACT-CLONE COLLAPSE. Web corpora are clone-heavy,
    # and a clone family of k docs shares ALL prefix grams — without
    # collapse its C(k,2) pairs are re-generated once per shared gram
    # (measured 383M expansion rows on a 320k-doc web-style corpus, vs
    # ~1M after collapse). The cascade runs on one representative per
    # distinct text (min doc_id, the content_hash_u64 key exact_dedup
    # already trusts); member pairs are re-expanded onto every verified
    # rep pair at the end (identical text => identical distance) plus
    # the intra-clone ed=0 pairs — answer-exact by construction.
    fp_mat = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            textstats.content_hash_u64, batch_format="pyarrow", batch_size=4096
        )
        .materialize()
    )
    hot_fp, _fpc = hot_u64_keys_counts(fp_mat, "fp")
    mem_rep = np.empty(0, np.int64)  # rep id per clone family (sorted)
    mem_off = np.zeros(1, np.int64)  # offsets into mem_flat per family
    mem_flat = np.empty(0, np.int64)  # member doc_ids, family-contiguous
    if hot_fp.shape[0]:

        def _hot_fp_rows(tb: pa.Table) -> pa.Table:
            fpv = tb["fp"].to_numpy(zero_copy_only=False)
            H = hot_fp  # rides the per-block task closure (dup-bounded)
            pos = np.searchsorted(H, fpv)
            m = (pos < H.shape[0]) & (
                H[np.minimum(pos, H.shape[0] - 1)] == fpv
            )
            return tb.filter(pa.array(m))

        dup_tabs = [
            t
            for t in ray.get(
                [
                    _map_block.remote(_hot_fp_rows, r)
                    for r in fp_mat.to_arrow_refs()
                ]
            )
            if len(t)
        ]
        if dup_tabs:
            dt = pa.concat_tables(dup_tabs)
            dfp = dt["fp"].to_numpy(zero_copy_only=False)
            dids = dt["doc_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((dids, dfp))
            dfp, dids = dfp[order], dids[order]
            bnd = np.concatenate(([True], dfp[1:] != dfp[:-1]))
            starts = np.flatnonzero(bnd)
            mem_rep = dids[starts]  # min doc_id per family
            mem_off = np.concatenate(
                (starts, [dfp.shape[0]])
            ).astype(np.int64)
            mem_flat = dids
            ro = np.argsort(mem_rep, kind="stable")
            # re-pack family-contiguous in rep order for searchsorted
            lens = np.diff(mem_off)[ro]
            mem_rep = mem_rep[ro]
            newoff = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            flat2 = np.empty_like(mem_flat)
            src = np.repeat(mem_off[:-1][ro], lens) + (
                np.arange(mem_flat.shape[0])
                - np.repeat(newoff[:-1], lens)
            )
            flat2 = mem_flat[src]
            mem_off, mem_flat = newoff, flat2
    nonrep = np.sort(
        np.setdiff1d(mem_flat, mem_rep, assume_unique=False)
    )
    nonrep_ref = ray.put(nonrep)
    _mark(f"clone-collapse ({mem_rep.shape[0]} families)")

    def _rep_only(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        nr = get_broadcast(nonrep_ref)
        if nr.shape[0] == 0:
            return batch
        ids0 = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nr, ids0)
        dup = (pos < nr.shape[0]) & (
            nr[np.minimum(pos, nr.shape[0] - 1)] == ids0
        )
        return batch.filter(pa.array(~dup))

    if not is_ham:

        def gram_rows(batch: pa.Table) -> pa.Table:
            _ids, _d, g_k, _n, _c, _p = _doc_arrays(_rep_only(batch))
            return pa.table({"sh": pa.array(g_k, pa.uint64())})

        mat = (
            _docs(sf_dir, columns=["doc_id", "text"])
            .map_batches(gram_rows, batch_format="pyarrow", batch_size=4096)
            .materialize()
        )
        hot, dfc = hot_u64_keys_counts(mat, "sh")
        hot_ref = ray.put((hot, dfc))
        _mark(f"df+hot ({hot.shape[0]} hot grams)")
    else:
        hot_ref = None  # hamming candidates need no gram statistics

    _empty_out = pa.table(
        {
            "doc_id_a": pa.array([], pa.int64()),
            "doc_id_b": pa.array([], pa.int64()),
            val_col: pa.array([], pa.int64()),
        }
    )
    _empty_cand = pa.table(
        {"pbucket": pa.array([], pa.int64()), "pair": pa.array([], pa.uint64())}
    )
    _empty_cand_pairs = pa.table({"pair": pa.array([], pa.uint64())})

    def _postlude(res):
        """Re-expand clone members onto the rep-level result: every
        verified (rep_a, rep_b, e) fans out to all member cross pairs
        (identical text => identical distance), plus the intra-clone
        ed=0 pairs the rep-only cascade never sees. No-op when the
        corpus has no exact clones."""
        if mem_rep.shape[0] == 0:
            return res
        exp_ref = ray.put((mem_rep, mem_off, mem_flat))

        def expand_members(bt: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            R, O, F = get_broadcast(exp_ref)
            a = bt["doc_id_a"].to_numpy(zero_copy_only=False)
            b = bt["doc_id_b"].to_numpy(zero_copy_only=False)
            e = bt[val_col].to_numpy(zero_copy_only=False)
            n = a.shape[0]
            if n == 0:
                return _empty_out

            def _fam(x):
                pos = np.searchsorted(R, x)
                posc = np.minimum(pos, max(R.shape[0] - 1, 0))
                hit = (pos < R.shape[0]) & (R[posc] == x)
                k = np.where(hit, O[posc + 1] - O[posc], 1)
                o = np.where(hit, O[posc], 0)
                return hit, k.astype(np.int64), o.astype(np.int64)

            hit_a, ka, oa = _fam(a)
            hit_b, kb, ob = _fam(b)
            tot = ka * kb
            T = int(tot.sum())
            row = np.repeat(np.arange(n), tot)
            seg = np.cumsum(tot) - tot
            t = np.arange(T) - seg[row]
            ai = t // kb[row]
            bi = t % kb[row]
            av = np.where(hit_a[row], F[oa[row] + ai], a[row])
            bv = np.where(hit_b[row], F[ob[row] + bi], b[row])
            return pa.table(
                {
                    "doc_id_a": pa.array(np.minimum(av, bv), pa.int64()),
                    "doc_id_b": pa.array(np.maximum(av, bv), pa.int64()),
                    val_col: pa.array(e[row], pa.int64()),
                }
            )

        res = res.map_batches(expand_members, batch_format="pyarrow")
        # intra-clone pairs: members are doc_id-ascending within each
        # family, so the windowed repeat/arange emit is already (lo, hi)
        lens = np.diff(mem_off)
        local = np.arange(mem_flat.shape[0]) - np.repeat(mem_off[:-1], lens)
        repv = np.repeat(lens, lens) - 1 - local
        T = int(repv.sum())
        a_idx = np.repeat(np.arange(mem_flat.shape[0]), repv)
        seg = np.cumsum(repv) - repv
        b_idx = a_idx + (np.arange(T) - seg[a_idx]) + 1
        intra = pa.table(
            {
                "doc_id_a": pa.array(mem_flat[a_idx], pa.int64()),
                "doc_id_b": pa.array(mem_flat[b_idx], pa.int64()),
                val_col: pa.array(np.zeros(T, np.int64), pa.int64()),
            }
        )
        return res.union(ray.data.from_arrow(intra))

    def ham_index_rows(batch: pa.Table) -> pa.Table:
        """(length, block index, block content hash) postings + the
        short-doc sentinel — the position-partition pigeonhole."""
        batch = _rep_only(batch)
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError("requires 0 <= doc_id < 2^32")
        nch = char_counts(data, offsets)
        cp, cpoff = codepoints(data, offsets)
        k1 = d + 1
        longm = nch > d  # short docs: every equal-length pair is <= d
        li = np.flatnonzero(longm)
        keys_out, doc_out, nch_out = [], [], []
        if li.shape[0]:
            nl = nch[li]
            base = cpoff[:-1][li]
            P1 = np.uint64(0x9E3779B97F4A7C15)
            P2 = np.uint64(0xC2B2AE3D27D4EB4F)
            hi_cp = max(cp.shape[0] - 1, 0)
            for i in range(k1):
                s_i = base + (i * nl) // k1
                e_i = base + ((i + 1) * nl) // k1
                ln = e_i - s_i
                h = np.zeros(li.shape[0], np.uint64)
                for j in range(int(ln.max()) if ln.shape[0] else 0):
                    m = j < ln
                    cj = cp[np.clip(s_i + j, 0, hi_cp)].astype(np.uint64)
                    h[m] = h[m] * P1 + cj[m] + np.uint64(1)
                i_mix = np.uint64((i * 0xFF51AFD7ED558CCD) % (1 << 64))
                key = h * P1 ^ nl.astype(np.uint64) * P2 ^ i_mix
                keys_out.append(key)
                doc_out.append(ids[li])
                nch_out.append(nl)
        degen = np.flatnonzero(~longm)
        bucket = np.concatenate(
            [
                (np.concatenate(keys_out) % np.uint64(num_buckets)).astype(
                    np.int64
                )
                if keys_out
                else np.empty(0, np.int64),
                np.full(degen.shape[0], SENTINEL, np.int64),
            ]
        )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "sh": pa.array(
                    np.concatenate(
                        (keys_out or [np.empty(0, np.uint64)])
                        + [np.zeros(degen.shape[0], np.uint64)]
                    ),
                    pa.uint64(),
                ),
                "doc_id": pa.array(
                    np.concatenate(
                        (doc_out or [np.empty(0, np.int64)])
                        + [ids[degen]]
                    ),
                    pa.int64(),
                ),
                "nch": pa.array(
                    np.concatenate(
                        (nch_out or [np.empty(0, np.int64)])
                        + [nch[degen]]
                    ),
                    pa.int64(),
                ),
            }
        )

    def index_rows(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        H, DF = get_broadcast(hot_ref)
        ids, d_k, g_k, n_gram, nch, pref_doc = _doc_arrays(_rep_only(batch))
        nb = ids.shape[0]
        if g_k.shape[0]:
            pos = np.searchsorted(H, g_k)
            pos_c = np.minimum(pos, max(H.shape[0] - 1, 0))
            is_hot = (
                (pos < H.shape[0]) & (H[pos_c] == g_k)
                if H.shape[0]
                else np.zeros(g_k.shape[0], bool)
            )
            dfv = np.where(is_hot, DF[pos_c] if H.shape[0] else 1, 1)
            order = np.lexsort((g_k, dfv, d_k))
            d_o, g_o, df_o = d_k[order], g_k[order], dfv[order]
            starts = np.searchsorted(d_o, np.arange(nb))
            rank = np.arange(d_o.shape[0]) - starts[d_o]
            keep = (rank < pref_doc[d_o]) & (df_o >= 2)
            d_f, g_f = d_o[keep], g_o[keep]
        else:
            d_f = np.empty(0, np.int64)
            g_f = np.empty(0, np.uint64)
        degen = np.flatnonzero(n_gram < pref_doc)
        bucket = np.concatenate(
            [
                (g_f % np.uint64(num_buckets)).astype(np.int64),
                np.full(degen.shape[0], SENTINEL, np.int64),
            ]
        )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "sh": pa.array(
                    np.concatenate([g_f, np.zeros(degen.shape[0], np.uint64)]),
                    pa.uint64(),
                ),
                "doc_id": pa.array(
                    np.concatenate([ids[d_f], ids[degen]]), pa.int64()
                ),
                "nch": pa.array(
                    np.concatenate([nch[d_f], nch[degen]]), pa.int64()
                ),
            }
        )

    def _emit_pairs(ia: np.ndarray, ib: np.ndarray) -> pa.Table:
        lo = np.minimum(ia, ib).astype(np.uint64)
        hi = np.maximum(ia, ib).astype(np.uint64)
        pair = np.unique((lo << np.uint64(32)) | hi)
        return pa.table(
            {
                "pbucket": pa.array(
                    (pair % np.uint64(num_buckets)).astype(np.int64)
                ),
                "pair": pa.array(pair, pa.uint64()),
            }
        )

    def expand(group: pa.Table) -> pa.Table:
        """Windowed in-run generation, one code path for gram runs AND
        the sentinel group (whose rows all carry sh = 0, i.e. one run):
        rows sort by (run, nch, doc_id), so each row's admissible
        partners (|n_a - n_b| <= d with n_b >= n_a) are a contiguous
        slice found by ONE segmented searchsorted — only length-filter
        survivors are ever materialized, never all-pairs-then-filter.
        Skew note: a run is one clone-collapsed posting list; after
        stage 0 the giant runs (clone families) are gone, and the
        sentinel group is window-bounded by construction."""
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        nch_ = group["nch"].to_numpy(zero_copy_only=False)
        if did.shape[0] < 2:
            return _empty_cand
        sh = group["sh"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, nch_, sh))
        sh, did, nch_ = sh[order], did[order], nch_[order]
        new = np.concatenate(([True], sh[1:] != sh[:-1]))
        run_id = (np.cumsum(new) - 1).astype(np.int64)
        big = np.int64(int(nch_.max()) + d + 2)
        keys = run_id * big + nch_
        hi_ix = np.searchsorted(
            keys, run_id * big + nch_ + d_win, side="right"
        )
        rep = hi_ix - np.arange(nch_.shape[0]) - 1
        tot = int(rep.sum())
        if tot == 0:
            return _empty_cand
        a_idx = np.repeat(np.arange(nch_.shape[0]), rep)
        seg = np.cumsum(rep) - rep
        b_idx = a_idx + (np.arange(tot) - seg[a_idx]) + 1
        return _emit_pairs(did[a_idx], did[b_idx])

    def bucket_distinct(group: pa.Table) -> pa.Table:
        pair = np.unique(group["pair"].to_numpy(zero_copy_only=False))
        return pa.table({"pair": pa.array(pair, pa.uint64())})

    cand = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            ham_index_rows if is_ham else index_rows,
            batch_format="pyarrow",
            batch_size=4096,
        )
        .groupby("bucket")
        .map_groups(expand, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .materialize()
    )
    cand_n = cand.count()
    empty = ray.data.from_arrow(_empty_out)
    if cand_n == 0:
        return _postlude(empty)
    _mark(f"candidates ({cand_n} pairs)")

    # candidate DOC ids via per-block uniques — 8 B per candidate doc
    # on the driver (corpus-bounded), never the pair set itself: the
    # pair set grows superlinearly on boilerplate-heavy corpora
    # (measured 4.1M at 320k docs -> 35M at 1M docs, ~n^1.9) and only
    # the broadcast path below ever materializes it driver-side
    def _doc_ids_of(tb: pa.Table):
        if len(tb) == 0:  # groupby can emit schema-less empty blocks
            return np.empty(0, np.int64)
        p = tb["pair"].to_numpy(zero_copy_only=False)
        return np.unique(
            np.concatenate(
                [p >> np.uint64(32), p & np.uint64(0xFFFFFFFF)]
            ).astype(np.int64)
        )

    idchunks = ray.get(
        [_map_block.remote(_doc_ids_of, r) for r in cand.to_arrow_refs()]
    )
    docs_needed = np.unique(
        np.concatenate(idchunks or [np.empty(0, np.int64)])
    )
    docs_ref = ray.put(docs_needed)

    def _needed_only(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        need = get_broadcast(docs_ref)
        ids0 = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(need, ids0)
        m = (pos < need.shape[0]) & (
            need[np.minimum(pos, need.shape[0] - 1)] == ids0
        )
        return batch.filter(pa.array(m))

    def _build_side(tb: pa.Table):
        """TEXTS-ONLY verify side from a (doc_id, text) table: sorted
        doc ids, raw byte buffer + offsets, codepoint counts. Grams and
        codepoints are NOT precomputed here — an early version did, and
        at 320k candidate docs that was a 95 s single-threaded driver
        gram pass; the verify tasks now derive both for just their own
        batch's docs (node-local, pool-parallel)."""
        ids = tb["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        tb = tb.take(pa.array(order, pa.int64()))
        ids = ids[order]
        data, offsets = string_column_bytes(tb["text"])
        nch = char_counts(data, offsets)
        return ids, data, offsets, nch

    def _verify_side(side, pair: np.ndarray) -> pa.Table:
        """Count filter + banded DP for one batch of candidate pairs
        against a (broadcast or group-local) texts-only doc side."""
        doc_u, data, offsets, nch_g = side
        if pair.shape[0] == 0:
            return _empty_out
        a = (pair >> np.uint64(32)).astype(np.int64)
        b = (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)
        pa_ = np.searchsorted(doc_u, a)
        pb_ = np.searchsorted(doc_u, b)
        nd = doc_u.shape[0]
        found = (
            (pa_ < nd)
            & (pb_ < nd)
            & (doc_u[np.minimum(pa_, nd - 1)] == a)
            & (doc_u[np.minimum(pb_, nd - 1)] == b)
        )
        pair, pa_, pb_ = pair[found], pa_[found], pb_[found]
        np_ = pair.shape[0]
        if np_ == 0:
            return _empty_out
        # localize: codepoints for THIS batch's unique docs only — the
        # kernel then reads them IN PLACE via (start, len), so no
        # per-pair sequence copies exist anywhere
        U, inv = np.unique(np.concatenate([pa_, pb_]), return_inverse=True)
        li_a, li_b = inv[:np_], inv[np_:]
        lens = offsets[U + 1] - offsets[U]
        loff = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        lt = int(loff[-1])
        if lt:
            mi0 = np.repeat(np.arange(U.shape[0]), lens)
            src = offsets[U][mi0] + (np.arange(lt) - loff[mi0])
            ldata = data[src]
        else:
            ldata = np.empty(0, np.uint8)
        cp, cpoff = codepoints(ldata, loff)
        nch = nch_g[U]
        pa_, pb_ = li_a, li_b
        if is_ham:
            # key collisions could pair unequal lengths: enforce here
            ed = np.full(np_, d + 1, np.int64)
            eq = nch[pa_] == nch[pb_]
            if eq.any():
                ed[eq] = chunked_hamming(
                    cp, cpoff[pa_[eq]], cpoff[pb_[eq]], nch[pa_[eq]], d
                )
        else:
            ed = banded_levenshtein(
                cp, cpoff[pa_], nch[pa_], cp, cpoff[pb_], nch[pb_], d
            )
        okd = ed <= d
        return pa.table(
            {
                "doc_id_a": pa.array(
                    (pair[okd] >> np.uint64(32)).astype(np.int64)
                ),
                "doc_id_b": pa.array(
                    (pair[okd] & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
                val_col: pa.array(ed[okd], pa.int64()),
            }
        )

    doc_rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(_needed_only, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    _mark(f"doc-fetch ({doc_rows.count()} candidate docs)")
    if (
        doc_rows.count() <= verify_broadcast_limit
        and cand_n <= pair_collect_limit
    ):
        pchunks = [
            t["pair"].to_numpy(zero_copy_only=False)
            for t in ray.get(cand.to_arrow_refs())
            if len(t)
        ]
        allp = np.concatenate(pchunks)
        tabs = [t for t in ray.get(doc_rows.to_arrow_refs()) if len(t)]
        if not tabs:
            return _postlude(empty)
        side = _build_side(pa.concat_tables(tabs))
        # sort pairs by the longer side's length DESC so DP batches are
        # length-homogeneous (the kernel iterates to the batch max)
        doc_u, _data, _off, nch_s = side
        la = nch_s[np.searchsorted(doc_u, (allp >> np.uint64(32)).astype(np.int64))]
        lb = nch_s[
            np.searchsorted(doc_u, (allp & np.uint64(0xFFFFFFFF)).astype(np.int64))
        ]
        allp = allp[np.argsort(-np.maximum(la, lb), kind="stable")]
        side_ref = ray.put(side)

        def verify_broadcast(bt: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            return _verify_side(
                get_broadcast(side_ref),
                bt["pair"].to_numpy(zero_copy_only=False),
            )

        n_parts = max(1, min(128, allp.shape[0] // 4096 + 1))
        return _postlude(
            ray.data.from_arrow(
                pa.table({"pair": pa.array(allp, pa.uint64())})
            )
            .repartition(n_parts)
            .map_batches(
                verify_broadcast, batch_format="pyarrow", batch_size=4096
            )
        )

    # --- above-limit path: bucketed two-hop join. Neither the texts
    # NOR the candidate pairs ever touch the driver — `cand` streams
    # straight from the object store into the member-row emit (the
    # LSH-verify attach_text shape; one text row ships per membership)
    pairs_ds = cand

    def to_member_rows(bt: pa.Table) -> pa.Table:
        if len(bt) == 0:  # schema-less empty block (see _doc_ids_of)
            bt = _empty_cand_pairs
        pr = bt["pair"].to_numpy(zero_copy_only=False)
        a = (pr >> np.uint64(32)).astype(np.int64)
        b = (pr & np.uint64(0xFFFFFFFF)).astype(np.int64)
        doc = np.concatenate([a, b])
        prs = np.concatenate([pr, pr])
        n = doc.shape[0]
        return pa.table(
            {
                "dbucket": pa.array(doc % num_buckets, pa.int64()),
                "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                "doc_id": pa.array(doc, pa.int64()),
                "pair": pa.array(prs, pa.uint64()),
                "text": pa.nulls(n, pa.string()),
            }
        )

    def doc_bucket_rows(bt: pa.Table) -> pa.Table:
        bt = _needed_only(bt)
        n = len(bt)
        doc = bt["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dbucket": pa.array(doc % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "doc_id": pa.array(doc, pa.int64()),
                "pair": pa.nulls(n, pa.uint64()),
                "text": bt["text"],
            }
        )

    _empty_attached = pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "pair": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )

    def attach_text(group: pa.Table) -> pa.Table:
        sidec = group["side"].to_numpy(zero_copy_only=False)
        dt = group.filter(pa.array(sidec == 0))
        mt = group.filter(pa.array(sidec == 1))
        if len(dt) == 0 or len(mt) == 0:
            return _empty_attached
        dd = dt["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(dd, kind="stable")
        md = mt["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dd[order], md)
        ok = (pos < dd.shape[0]) & (
            dd[order][np.minimum(pos, dd.shape[0] - 1)] == md
        )
        if not ok.all():  # defensive: member without a doc row
            mt = mt.filter(pa.array(ok))
            pos = pos[ok]
        pr = mt["pair"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pbucket": pa.array(
                    (pr % np.uint64(num_buckets)).astype(np.int64)
                ),
                "pair": mt["pair"],
                "doc_id": mt["doc_id"],
                "text": pc.take(dt["text"], pa.array(order[pos], pa.int64())),
            }
        )

    def verify_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _empty_out
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        prs = group["pair"].to_numpy(zero_copy_only=False)
        # per-doc arrays computed ONCE per bucket from the first row of
        # each doc, then the shared verify path runs on distinct pairs
        uniq, first = np.unique(doc, return_index=True)
        side = _build_side(
            pa.table(
                {
                    "doc_id": pa.array(uniq, pa.int64()),
                    "text": pc.take(group["text"], pa.array(first, pa.int64())),
                }
            )
        )
        return _verify_side(side, np.unique(prs))

    members = pairs_ds.map_batches(to_member_rows, batch_format="pyarrow")
    docrows = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        doc_bucket_rows, batch_format="pyarrow", batch_size=4096
    )
    return _postlude(
        docrows.union(members)
        .groupby("dbucket")
        .map_groups(attach_text, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )


def edit_distance_clusters(sf_dir: str, d: int = EDIT_DISTANCE_D):
    """Cluster assignments over the exact edit-distance pair graph —
    the revision-chain grouping (v1 ~ v2 ~ v3 each within d edits
    chains a whole edit history into one component even when the ends
    are more than d apart). Same driver as the other cluster family
    members: answer-sized edges from ``edit_distance_pairs``, min-label
    components (driver union-find below the edge limit, groupby
    min-label rounds above)."""
    from hg_dedup_ray.state.cluster import (
        distributed_min_label,
        union_find_clusters,
    )

    edges: list[tuple[int, int, int, int]] = []
    for b in edit_distance_pairs(sf_dir, d).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        a = b["doc_id_a"].to_numpy(zero_copy_only=False)
        bb = b["doc_id_b"].to_numpy(zero_copy_only=False)
        edges.extend(
            (int(x), int(y), int(x), int(y)) for x, y in zip(a, bb)
        )
    resolve = (
        union_find_clusters if len(edges) <= 1_000_000 else distributed_min_label
    )
    labels = resolve(edges)
    ids = np.array(sorted(labels), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    np.array([labels[i] for i in ids], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )
    )


EDIT_PRESSURE_DS = (0, 4, 8)


def edit_distance_pressure(sf_dir: str, ds=EDIT_PRESSURE_DS):
    """The threshold-tuning report for the edit-distance family (the
    ``dedup_pressure_curve`` pattern): per candidate threshold d, how
    many pairs exist and how many docs a pairwise keep-first pass
    would drop. ONE cascade at d_max = max(ds) computes every pair
    WITH its exact integer distance; binning is driver-side numpy over
    the answer-bounded pair set — integers, so the oracle compare has
    no rounding surface at all."""
    rows = edit_distance_pairs(sf_dir, max(ds)).take_all()
    b = np.array([r["doc_id_b"] for r in rows], np.int64)
    e = np.array([r["edit_distance"] for r in rows], np.int64)
    dv = sorted(ds)
    n_pairs, n_dropped = [], []
    for t in dv:
        m = e <= t
        n_pairs.append(int(m.sum()))
        n_dropped.append(int(np.unique(b[m]).shape[0]))
    return pa.table(
        {
            "d": pa.array(dv, pa.int64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "n_dropped_docs": pa.array(n_dropped, pa.int64()),
        }
    )


HAMMING_K = 64


def hamming_distance_pairs(sf_dir: str, k: int = HAMMING_K):
    """EXACT Hamming similarity join, DuckDB-green: all equal-length
    pairs within k codepoint SUBSTITUTIONS — the fixed-layout near-dup
    class (form letters, templated records, bit-rotted mirrors) where
    alignment never shifts, caught without any gram statistics via the
    position-partition pigeonhole. Shares the whole edit-distance
    cascade skeleton (clone collapse, run sweep, broadcast/bucketed
    verify, member re-expansion); see ``edit_distance_pairs``
    (metric="hamming") for the candidate and verify details. Default
    k=64 sits inside the fixtures' substitution-family band (answers
    15 / 11 / 752 at the three SFs)."""
    return edit_distance_pairs(sf_dir, d=k, metric="hamming")


def edit_dedup_keep_first(sf_dir: str, d: int = EDIT_DISTANCE_D):
    """Keep-first APPLY over the edit-distance pair graph: drop every
    doc with at least one SMALLER-id partner within d edits (the
    pairwise keep-first rule — the same rule ``dedup_pressure_curve``
    publishes for Jaccard, deliberately NOT the transitive-cluster
    rule: v3 of a revision chain survives when it is more than d edits
    from the kept v1). The drop set is the doc_id_b side of the
    answer-sized pair set; survivors stream through the house
    sorted-drop-set filter — the corpus never collects anywhere."""
    from hg_dedup_ray.pipelines.corpus_ops import _drop_filter_stream

    chunks = [np.empty(0, np.int64)]
    for b in edit_distance_pairs(sf_dir, d).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        chunks.append(b["doc_id_b"].to_numpy(zero_copy_only=False))
    drop = np.unique(np.concatenate(chunks))
    return _drop_filter_stream(
        sf_dir, drop, ["doc_id", "lang", "source", "n_chars"]
    )


DEDUP_PRESSURE_TAUS = (0.7, 0.8, 0.9)


def dedup_pressure_curve(sf_dir: str, taus=DEDUP_PRESSURE_TAUS):
    """The threshold-tuning report a web-scale near-dup pass publishes
    before anyone picks tau: per Jaccard threshold, how many exact pairs
    exist and how many docs a keep-first pass would drop (a doc is
    dropped iff it has at least one SMALLER-id partner at >= tau — the
    pairwise keep-first rule; pairs are canonically a < b).

    ONE PPJoin cascade at tau_min = min(taus) computes every pair with
    its exact Jaccard; binning is driver-side numpy over the
    output-bounded pair set. The per-pair division is the same
    int64/int64 -> float64 IEEE op DuckDB performs, so the >= tau binning
    is bit-identical (tau literals shared with the oracle)."""
    rows = ngram_jaccard_exact_pairs(
        sf_dir, threshold=min(taus), emit_jaccard=True
    ).take_all()
    a = np.array([r["doc_id_a"] for r in rows], np.int64)
    b = np.array([r["doc_id_b"] for r in rows], np.int64)
    j = np.array([r["jaccard"] for r in rows], np.float64)
    ts = sorted(taus)
    n_pairs, n_dropped = [], []
    for t in ts:
        m = j >= t
        n_pairs.append(int(m.sum()))
        n_dropped.append(int(np.unique(b[m]).shape[0]))
    return pa.table(
        {
            "tau": pa.array(ts, pa.float64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "n_dropped_docs": pa.array(n_dropped, pa.int64()),
        }
    )


def _segment_slices(data: np.ndarray, offsets: np.ndarray, W: int):
    """(seg_start, seg_end, seg_doc, seg_no) byte slices of consecutive
    ``W``-word segments over a concatenated single-space-separated text
    buffer — the shared kernel of segment_dedup_stats / _apply. Fully
    vectorized: word starts = doc starts + bytes after spaces; a segment
    ends one byte before the next segment's separating space (or at the
    doc end)."""
    doc_start = offsets[:-1].astype(np.int64)
    doc_end = offsets[1:].astype(np.int64)
    spaces = np.flatnonzero(data == 32)
    # empty docs have no words: their doc_start would alias the NEXT
    # doc's start (double-counting its first word) and, for a trailing
    # empty doc, index past doc_end — drop them from the word starts.
    # np.unique likewise collapses a doc-final space's phantom start
    # (== the next doc's start), and the ok mask drops starts landing
    # at/after their own doc's end (doc-final space in the last doc).
    ws = np.unique(
        np.concatenate([doc_start[doc_end > doc_start], spaces + 1])
    )
    wdoc = np.searchsorted(offsets, ws, side="right") - 1
    ok = ws < doc_end[np.minimum(wdoc, doc_end.shape[0] - 1)]
    ws, wdoc = ws[ok], wdoc[ok]
    first = np.concatenate(([True], wdoc[1:] != wdoc[:-1]))
    wstart_ix = np.flatnonzero(first)
    widx = np.arange(ws.shape[0]) - wstart_ix[np.cumsum(first) - 1]
    is_seg = (widx % W) == 0
    seg_start = ws[is_seg]
    seg_doc = wdoc[is_seg]
    seg_no = (widx[is_seg] // W).astype(np.int64)
    if len(seg_no) and seg_no.max() >= 1 << 16:
        raise ValueError("segment dedup packs seg_no into 16 bits")
    nxt = np.concatenate([seg_start[1:], [np.int64(0)]])
    same = np.concatenate([seg_doc[1:] == seg_doc[:-1], [False]])
    seg_end = np.where(same, nxt - 1, doc_end[seg_doc])
    return seg_start, seg_end, seg_doc, seg_no


def segment_dedup_stats(sf_dir: str, words_per_seg: int = 16, num_buckets: int = 64):
    """Sub-document keep-first dedup at SEGMENT granularity (CCNet /
    RefinedWeb-style line dedup, generalized): split every doc into
    consecutive ``words_per_seg``-word segments, keep the globally first
    occurrence of each distinct segment (order = (doc_id, seg_no)), and
    report per doc how many of its segments were non-first duplicates.
    DuckDB-green via window functions.

    The fixture text is single-space separated (no leading/trailing or
    doubled spaces), so a segment IS a contiguous byte slice of the doc —
    segments hash directly off the corpus buffer with a vectorized
    FNV-1a over byte columns, no string materialization. Scale shape
    mirrors exact_dedup: only (u64 hash, packed-origin) rows shuffle,
    pre-reduced per batch, combined in coarse hash buckets (fixed group
    count); the dup flags then pre-reduce per doc and combine in coarse
    doc buckets. No broadcast, no driver state, two small shuffles.

    64-bit segment hashes stand in for segment identity (collision odds
    ~n^2/2^64 — negligible below ~10^8 distinct segments); a 10^12-doc
    run would widen to 128-bit (two u64 lanes) with the same shape."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    W = words_per_seg
    FNV_OFF = np.uint64(0xCBF29CE484222325)
    FNV_PRIME = np.uint64(0x100000001B3)

    def seg_rows(batch: pa.Table) -> pa.Table:
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 47):
            raise ValueError("segment_dedup_stats packs doc_id into 48 bits")
        seg_start, seg_end, seg_doc, seg_no = _segment_slices(data, offsets, W)
        lens = seg_end - seg_start
        # vectorized FNV-1a over the variable-length slices
        h = np.full(seg_start.shape[0], FNV_OFF, np.uint64)
        max_len = int(lens.max()) if lens.shape[0] else 0
        for j in range(max_len):
            act = lens > j
            h[act] = (h[act] ^ data[seg_start[act] + j].astype(np.uint64)) * FNV_PRIME
        packed = (ids[seg_doc].astype(np.uint64) << np.uint64(16)) | seg_no.astype(
            np.uint64
        )
        # pre-reduce: keep only each hash's min-packed row per batch, plus
        # every occurrence row (needed for the dup flags) — occurrences
        # ARE the rows; the combine below handles the min
        return pa.table(
            {
                "hbucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
                "h": pa.array(h, pa.uint64()),
                "packed": pa.array(packed, pa.uint64()),
            }
        )

    def mark_dups(group: pa.Table) -> pa.Table:
        """One hash bucket: winner per hash = min packed origin; every
        other occurrence is a dup. Pre-reduce dup counts per doc."""
        h = group["h"].to_numpy(zero_copy_only=False)
        packed = group["packed"].to_numpy(zero_copy_only=False)
        order = np.lexsort((packed, h))
        h, packed = h[order], packed[order]
        firsth = np.concatenate(([True], h[1:] != h[:-1]))
        dup = ~firsth  # sorted by packed within hash: first == min origin
        doc = (packed >> np.uint64(16)).astype(np.int64)
        du, dinv = np.unique(doc, return_inverse=True)
        nseg = np.bincount(dinv, minlength=du.shape[0]).astype(np.int64)
        ndup = np.bincount(
            dinv, weights=dup.astype(np.float64), minlength=du.shape[0]
        ).astype(np.int64)
        return pa.table(
            {
                "dbucket": pa.array(du % num_buckets, pa.int64()),
                "doc_id": pa.array(du, pa.int64()),
                "n_part": pa.array(nseg, pa.int64()),
                "dup_part": pa.array(ndup, pa.int64()),
            }
        )

    def combine_docs(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        np_ = group["n_part"].to_numpy(zero_copy_only=False)
        dp = group["dup_part"].to_numpy(zero_copy_only=False)
        du, dinv = np.unique(doc, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(du, pa.int64()),
                "n_segments": pa.array(
                    np.bincount(dinv, weights=np_.astype(np.float64)).astype(np.int64),
                    pa.int64(),
                ),
                "n_dup_segments": pa.array(
                    np.bincount(dinv, weights=dp.astype(np.float64)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        _docs_sized(sf_dir, columns=["doc_id", "text"])
        .map_batches(seg_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("hbucket")
        .map_groups(mark_dups, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(combine_docs, batch_format="pyarrow")
    )


def segment_dedup_apply(sf_dir: str, words_per_seg: int = 16, num_buckets: int = 64):
    """Query wrapper over ``_segment_dedup_apply_ds`` (see there)."""
    return _segment_dedup_apply_ds(
        _docs_sized(sf_dir, columns=["doc_id", "text"]), words_per_seg, num_buckets
    )


def _segment_dedup_apply_ds(docs, words_per_seg: int = 16, num_buckets: int = 64):
    """The REMOVAL step of sub-document segment dedup (CCNet /
    RefinedWeb-style line dedup, generalized): drop every non-first
    duplicate ``words_per_seg``-word segment (global keep-first order =
    (doc_id, seg_no)) and re-emit each doc's remaining segments joined by
    single spaces. ``segment_dedup_stats`` is the report; this applies
    it. DuckDB-green: the oracle rebuilds texts with window functions +
    ordered string_agg.

    Scale shape: pass 1 reuses the stats kernel (u64 FNV segment rows,
    per-batch, nothing text-sized); the hash-bucket combine emits ONLY
    dropped (doc_id, seg_no) rows — dup-fraction-sized; pass 2 is a
    bucketed hash join on doc_id%num_buckets (drop rows union the doc
    texts — the dupset_join pattern, no driver state, no broadcast of
    the drop set), re-derives segment offsets with the shared vectorized
    kernel and joins each doc's kept slices. The only per-doc Python is
    the final bytes-join — the same discipline as the flagship's
    Writeback excision stage."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    W = words_per_seg
    FNV_OFF = np.uint64(0xCBF29CE484222325)
    FNV_PRIME = np.uint64(0x100000001B3)

    def seg_rows(batch: pa.Table) -> pa.Table:
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 47):
            raise ValueError("segment_dedup_apply packs doc_id into 48 bits")
        seg_start, seg_end, seg_doc, seg_no = _segment_slices(data, offsets, W)
        lens = seg_end - seg_start
        h = np.full(seg_start.shape[0], FNV_OFF, np.uint64)
        max_len = int(lens.max()) if lens.shape[0] else 0
        for j in range(max_len):
            act = lens > j
            h[act] = (h[act] ^ data[seg_start[act] + j].astype(np.uint64)) * FNV_PRIME
        packed = (ids[seg_doc].astype(np.uint64) << np.uint64(16)) | seg_no.astype(
            np.uint64
        )
        return pa.table(
            {
                "hbucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
                "h": pa.array(h, pa.uint64()),
                "packed": pa.array(packed, pa.uint64()),
            }
        )

    def drop_rows(group: pa.Table) -> pa.Table:
        """One hash bucket -> ONLY the dropped (doc bucket, doc_id,
        seg_no) rows (every occurrence after each hash's min origin)."""
        h = group["h"].to_numpy(zero_copy_only=False)
        packed = group["packed"].to_numpy(zero_copy_only=False)
        order = np.lexsort((packed, h))
        h, packed = h[order], packed[order]
        dup = np.concatenate(([False], h[1:] == h[:-1]))
        packed = packed[dup]
        doc = (packed >> np.uint64(16)).astype(np.int64)
        return pa.table(
            {
                "dbucket": pa.array(doc % num_buckets, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "seg_no": pa.array(
                    (packed & np.uint64(0xFFFF)).astype(np.int64), pa.int64()
                ),
                "text": pa.nulls(packed.shape[0], pa.string()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dbucket": pa.array(ids % num_buckets, pa.int64()),
                "doc_id": batch["doc_id"],
                "seg_no": pa.array(np.full(ids.shape[0], -1), pa.int64()),
                "text": batch["text"],
            }
        )

    def rebuild(group: pa.Table) -> pa.Table:
        seg = group["seg_no"].to_numpy(zero_copy_only=False)
        docs = group.filter(pa.array(seg == -1))
        drops = group.filter(pa.array(seg != -1))
        if len(docs) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text_deduped": pa.array([], pa.string()),
                    "n_kept_segments": pa.array([], pa.int64()),
                }
            )
        data, offsets = string_column_bytes(docs["text"])
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        seg_start, seg_end, seg_doc, seg_no = _segment_slices(data, offsets, W)
        seg_key = (ids[seg_doc].astype(np.uint64) << np.uint64(16)) | seg_no.astype(
            np.uint64
        )
        dk = np.sort(
            (drops["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
             << np.uint64(16))
            | drops["seg_no"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        if dk.shape[0]:
            pos = np.searchsorted(dk, seg_key)
            dropped = (pos < dk.shape[0]) & (
                dk[np.minimum(pos, dk.shape[0] - 1)] == seg_key
            )
        else:
            dropped = np.zeros(seg_key.shape[0], bool)
        keep = ~dropped
        n_kept = np.bincount(seg_doc[keep], minlength=len(docs)).astype(np.int64)
        mv = data.tobytes()
        texts = []
        bounds = np.searchsorted(seg_doc[keep], np.arange(len(docs) + 1))
        ks, ke = seg_start[keep], seg_end[keep]
        for d in range(len(docs)):
            sl = slice(bounds[d], bounds[d + 1])
            texts.append(
                b" ".join(mv[s:e] for s, e in zip(ks[sl], ke[sl])).decode("utf-8")
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text_deduped": pa.array(texts, pa.string()),
                "n_kept_segments": pa.array(n_kept, pa.int64()),
            }
        )

    drops = (
        docs.map_batches(seg_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("hbucket")
        .map_groups(drop_rows, batch_format="pyarrow")
    )
    return (
        docs.map_batches(doc_rows, batch_format="pyarrow", batch_size=4096)
        .union(drops)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pyarrow")
    )


# --------------------------------------------------------- text analysis
def token_counts(sf_dir: str):
    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        textstats.token_stats, batch_format="pyarrow", batch_size=4096
    )


def quality_scores(sf_dir: str):
    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        textstats.quality_stats, batch_format="pyarrow", batch_size=4096
    )


def lang_id_pred(sf_dir: str):
    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        textstats.lang_id, batch_format="pyarrow", batch_size=4096
    )


def fingerprints(sf_dir: str):
    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        textstats.md5_fingerprint, batch_format="pyarrow", batch_size=4096
    )


def lang_id_confusion(sf_dir: str):
    """Detector EVALUATION: confusion matrix of the labeled ``lang``
    column vs the stopword lang-ID prediction — (lang, lang_pred,
    n_docs). The QA table a pipeline publishes before trusting a
    detector to route documents. Per-batch partial cell counts
    (cardinality = |langs| x |preds|, a handful) then one tiny groupby
    Sum — per-doc rows never shuffle."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        pred = textstats.lang_id(batch)["lang_pred"]
        # one Arrow C++ group_by over the pair — no string sentinel, so
        # a lang label containing any separator char cannot corrupt cells
        t = pa.table(
            {"lang": batch["lang"].cast(pa.string()), "lang_pred": pred}
        )
        g = t.group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "lang_pred": g["lang_pred"],
                "partial": g["count_all"].cast(pa.int64()),
            }
        )

    return (
        _docs_sized(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("partial", alias_name="n_docs"))
    )


def unigram_counts(sf_dir: str):
    """token -> count over all docs. Pre-aggregated inside map_batches
    (one partial count row per token per batch), then a small
    groupby-aggregate — the guide's combiner pattern (SURVEY.md A4)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.ascii_split_whitespace(batch["text"]))
        vc = toks.value_counts()
        return pa.table(
            {"token": vc.field("values"), "partial": vc.field("counts").cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    return (
        _docs_sized(sf_dir, columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("partial", alias_name="cnt"))
    )


def word_doc_freq(sf_dir: str):
    """token -> document frequency (count of docs containing it) — the
    df table behind tf-idf / PPJoin orderings / stopword induction.

    Combiner pattern like ``unigram_counts``, but the partial is
    DISTINCT-per-doc first: docs are atomic within a batch (one row per
    doc), so per-batch distinct (token, doc) pairs — one Arrow C++
    group_by, no Python per token — make the per-token partial counts
    sum to the exact global df."""

    def partial_df(batch: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs = np.repeat(np.arange(len(batch), dtype=np.int64), nper)
        t = pa.table({"token": flat, "d": pa.array(docs, pa.int64())})
        # whitespace-only docs split to [''] — the oracle's WHERE trim<>'' drops them
        t = t.filter(pc.greater(pc.utf8_length(t["token"]), 0))
        dist = t.group_by(["token", "d"]).aggregate([])
        g = dist.group_by("token").aggregate([("d", "count")])
        return pa.table(
            {"token": g["token"], "partial": g["d_count"].cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    return (
        _docs_sized(sf_dir, columns=["text"])
        .map_batches(partial_df, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("partial", alias_name="df"))
    )


def _seg_max(vals: np.ndarray, seg_sorted: np.ndarray, nseg: int) -> np.ndarray:
    """Per-segment max of ``vals`` whose segment ids ``seg_sorted`` are
    sorted ascending; empty segments get 0. One reduceat, no Python loop."""
    out = np.zeros(nseg, np.int64)
    if vals.shape[0]:
        counts = np.bincount(seg_sorted, minlength=nseg)
        nonempty = counts > 0
        # reduceat over nonempty segments only: their starts (cumsum of
        # nonempty counts) are strictly increasing and in-bounds, so no
        # clamp is needed — a clamp would split the segment preceding a
        # trailing empty one.
        ne_counts = counts[nonempty]
        starts = np.concatenate(([0], np.cumsum(ne_counts)[:-1]))
        out[nonempty] = np.maximum.reduceat(vals, starts)
    return out


def repetition_stats(sf_dir: str):
    """Gopher/MassiveText-style repetition quality signals per doc, as
    integer counts (ratio-free so the DuckDB oracle hashes exactly):
    n_words, n_distinct_words, top_word_count (max multiplicity of any
    word), top_bigram_count, dup_word_chars (chars in occurrences beyond
    each word's first), total_word_chars. The repetition filters of a
    pretraining pipeline threshold on the ratios of these counts.

    One vectorized map_batches — token hashing, one lexsort for word
    runs, one for bigram runs, segment reductions; no shuffle (per-doc
    stats never leave their batch). u64 token-hash identity stands in for
    string identity (collision odds ~2^-64/pair, see functions/wordgrams)."""
    from hg_dedup_ray.functions.wordgrams import doc_tokens_full, word_gram_hashes

    def rep_stats(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        th, lens, off = doc_tokens_full(batch["text"])
        counts = np.diff(off)
        docs_rep = np.repeat(np.arange(nb, dtype=np.int64), counts)
        if th.shape[0]:
            order = np.lexsort((th, docs_rep))
            t_s, d_s, l_s = th[order], docs_rep[order], lens[order]
            new = np.concatenate(
                ([True], (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1]))
            )
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id).astype(np.int64)
            run_doc = d_s[new]
            run_wlen = l_s[new]
            n_distinct = np.bincount(run_doc, minlength=nb).astype(np.int64)
            top_word = _seg_max(run_len, run_doc, nb)
            dup_chars = np.bincount(
                run_doc, weights=(run_len - 1) * run_wlen, minlength=nb
            ).astype(np.int64)
            tot_chars = np.bincount(
                docs_rep, weights=lens, minlength=nb
            ).astype(np.int64)
        else:
            n_distinct = top_word = dup_chars = tot_chars = np.zeros(nb, np.int64)
        bg, goff = word_gram_hashes(th, off, 2)
        if bg.shape[0]:
            gdocs = np.repeat(np.arange(nb, dtype=np.int64), np.diff(goff))
            border = np.lexsort((bg, gdocs))
            b_s, gd_s = bg[border], gdocs[border]
            bnew = np.concatenate(
                ([True], (b_s[1:] != b_s[:-1]) | (gd_s[1:] != gd_s[:-1]))
            )
            brun_len = np.bincount(np.cumsum(bnew) - 1).astype(np.int64)
            top_bigram = _seg_max(brun_len, gd_s[bnew], nb)
        else:
            top_bigram = np.zeros(nb, np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(counts, pa.int64()),
                "n_distinct_words": pa.array(n_distinct, pa.int64()),
                "top_word_count": pa.array(top_word, pa.int64()),
                "top_bigram_count": pa.array(top_bigram, pa.int64()),
                "dup_word_chars": pa.array(dup_chars, pa.int64()),
                "total_word_chars": pa.array(tot_chars, pa.int64()),
            }
        )

    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        rep_stats, batch_format="pyarrow", batch_size=4096
    )


def dup_ngram_coverage(sf_dir: str, n: int = 3):
    """Gopher/MassiveText duplicate-n-gram CHARACTER COVERAGE per doc
    (the signal behind the "fraction of characters in duplicate n-grams"
    repetition filters, n=5..10 in Rae et al. 2021 table A1): a word
    position is covered iff it lies inside at least one occurrence of a
    word-n-gram that appears >= 2 times within the same document. Emits
    the ratio-free integer counts (covered words / covered word chars /
    totals) so the DuckDB oracle hashes exactly; the filter thresholds
    covered_chars / total_word_chars. Default n=3 so the signal is
    non-vacuous on the short synthetic fixtures (~25-word docs have no
    repeated 5-grams); the kernel is n-generic.

    Unlike ``repetition_stats``'s top-gram multiplicity, coverage needs
    the UNION of overlapping duplicate-gram occurrences — computed here
    with a difference array over the flattened word-position space
    (+1 at each duplicate-gram start, -1 at start+n, one cumsum), so the
    whole stage is one lexsort + two bincounts per batch, no shuffle
    (per-doc stats never leave their batch). u64 gram-hash identity
    stands in for string identity (see functions/wordgrams)."""
    from hg_dedup_ray.functions.wordgrams import doc_tokens_full, word_gram_hashes

    def cov_stats(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        th, lens, off = doc_tokens_full(batch["text"])
        counts = np.diff(off)
        total_words = int(th.shape[0])
        covered = np.zeros(total_words, bool)
        gh, goff = word_gram_hashes(th, off, n)
        if gh.shape[0]:
            gcounts = np.diff(goff)
            gdocs = np.repeat(np.arange(nb, dtype=np.int64), gcounts)
            gpos = np.arange(gh.shape[0], dtype=np.int64) - np.repeat(
                goff[:-1], gcounts
            )
            order = np.lexsort((gh, gdocs))
            g_s, d_s = gh[order], gdocs[order]
            new = np.concatenate(
                ([True], (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1]))
            )
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id)
            dup_occ = run_len[run_id] >= 2
            if dup_occ.any():
                # global word index of each duplicate-gram start; the
                # gram never crosses its doc boundary (start + n <=
                # off[doc+1]), so the difference array can't bleed
                # coverage into the next doc.
                starts = off[:-1][d_s[dup_occ]] + gpos[order][dup_occ]
                diff = np.bincount(
                    starts, minlength=total_words + 1
                ).astype(np.int64) - np.bincount(
                    starts + n, minlength=total_words + 1
                ).astype(np.int64)
                covered = np.cumsum(diff[:total_words]) > 0
        docs_rep = np.repeat(np.arange(nb, dtype=np.int64), counts)
        covered_words = np.bincount(
            docs_rep, weights=covered, minlength=nb
        ).astype(np.int64)
        covered_chars = np.bincount(
            docs_rep, weights=lens * covered, minlength=nb
        ).astype(np.int64)
        total_chars = np.bincount(
            docs_rep, weights=lens, minlength=nb
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(counts, pa.int64()),
                "covered_words": pa.array(covered_words, pa.int64()),
                "covered_chars": pa.array(covered_chars, pa.int64()),
                "total_word_chars": pa.array(total_chars, pa.int64()),
            }
        )

    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        cov_stats, batch_format="pyarrow", batch_size=4096
    )


def jaccard_dup_clusters(sf_dir: str, threshold: float = 0.8):
    """Near-dup CLUSTER ASSIGNMENTS (doc_id -> cluster_id = min doc_id of
    its connected component) over the exact-Jaccard pair graph — the
    north-star's "cluster assignments" deliverable in oracle-checkable
    form (the DuckDB side closes the same edge set with a recursive CTE).

    Edges come from the PPJoin cascade (``ngram_jaccard_exact_pairs``,
    fully distributed); the edge set is answer-sized (near-dup pairs at
    t>=0.8), so components resolve on the driver below
    ``driver_edge_limit`` and through the groupby min-label propagation
    rounds (state/cluster.distributed_min_label) above it."""
    from hg_dedup_ray.state.cluster import (
        distributed_min_label,
        union_find_clusters,
    )

    edges: list[tuple[int, int, int, int]] = []
    for b in ngram_jaccard_exact_pairs(sf_dir, threshold).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        a = b["doc_id_a"].to_numpy(zero_copy_only=False)
        bb = b["doc_id_b"].to_numpy(zero_copy_only=False)
        edges.extend(
            (int(x), int(y), int(x), int(y)) for x, y in zip(a, bb)
        )
    resolve = union_find_clusters if len(edges) <= 1_000_000 else distributed_min_label
    labels = resolve(edges)
    ids = np.array(sorted(labels), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    np.array([labels[i] for i in ids], dtype=np.int64), pa.int64()
                ),
            }
        )
    )


def containment_clusters(sf_dir: str, threshold: float = 0.6):
    """Cluster assignments over the exact max-CONTAINMENT pair graph —
    the boilerplate-family grouping (a short page quoted inside many
    hosts chains its hosts into one component) that the Jaccard closure
    misses at large size ratios. Same driver: answer-sized containment
    edges from the PPJoin cascade's containment mode, min-label
    components (driver union-find below the edge limit, groupby
    min-label rounds above)."""
    from hg_dedup_ray.state.cluster import (
        distributed_min_label,
        union_find_clusters,
    )

    edges: list[tuple[int, int, int, int]] = []
    for b in ngram_containment_pairs(sf_dir, threshold).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        a = b["doc_id_a"].to_numpy(zero_copy_only=False)
        bb = b["doc_id_b"].to_numpy(zero_copy_only=False)
        edges.extend(
            (int(x), int(y), int(x), int(y)) for x, y in zip(a, bb)
        )
    resolve = (
        union_find_clusters if len(edges) <= 1_000_000 else distributed_min_label
    )
    labels = resolve(edges)
    ids = np.array(sorted(labels), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    np.array([labels[i] for i in ids], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )
    )


def corpus_stats(sf_dir: str):
    """Per (lang, source) doc counts and char sums — metrics aggregation
    (SURVEY.md A3)."""
    from ray.data.aggregate import Count, Sum

    return (
        _docs_sized(sf_dir, columns=["lang", "source", "n_chars"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
    )


# ------------------------------------------------------------- embeddings
def ann_topk(sf_dir: str):
    """Brute-force cosine top-k: queries = vec_id < ANN_NUM_QUERIES,
    corpus streamed in batches, per-batch partial top-k then merge."""
    emb = _emb(sf_dir)
    qt = emb.filter(expr=f"vec_id < {ANN_NUM_QUERIES}").to_pandas()
    import pandas  # noqa: F401

    if len(qt) == 0:  # empty corpus: no queries, empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    qmat = np.stack(qt.sort_values("vec_id")["embedding"].to_numpy())
    qids = qt.sort_values("vec_id")["vec_id"].to_numpy()
    queries_ref = ray.put({"qids": qids, "qmat": qmat})
    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    partials = emb.map_batches(
        _task_stage(PartialTopK, queries_ref, ANN_K),
        batch_format="pyarrow",
        batch_size=1024,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: merge_topk(g, ANN_K), batch_format="pyarrow"
    )


def embedding_near_dup_pairs(sf_dir: str):
    """All (a < b) pairs with cosine >= NEAR_DUP_COS, exact, block-
    pairwise: C blocks -> C(C+1)/2 zero-copy tile tasks, results via
    from_arrow_refs — no whole-corpus driver to_pandas / broadcast
    (stages/embed.near_dup_pairs_blocked). Matches the SQL oracle
    exactly; ann_ivf_topk is the approximate sub-quadratic path."""
    from hg_dedup_ray.stages.embed import near_dup_pairs_blocked

    return near_dup_pairs_blocked(_emb(sf_dir), NEAR_DUP_COS)


def ann_ivf_topk(sf_dir: str, n_cells: int = 8, nprobe: int = 2):
    """Multi-probe IVF ANN (rows-only): the db side partitions into
    kmeans cells, every vector-as-query probes its ``nprobe`` nearest
    cells, per-cell query x db top-k, then one vectorized global merge
    per query — standard IVF search at ~nprobe/n_cells of brute-force
    cost (recall rises with nprobe; n_cells=1 reproduces brute force
    EXACTLY, which tests/test_embed.py pins). Two groupby shuffles total
    (cell, then query-merge); all per-group math is argpartition/lexsort
    — no per-row Python."""
    from hg_dedup_ray.stages.embed import IvfMultiProbeAssigner, _normalize

    emb = _emb(sf_dir)
    sample = np.array(
        [r["embedding"] for r in emb.limit(512).take_all()], dtype=np.float64
    )
    if sample.size == 0:  # empty corpus: nothing to cluster or rank
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    cents = kmeans_centroids(sample, n_cells)
    cents_ref = ray.put(cents)
    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    assigned = emb.map_batches(
        _task_stage(IvfMultiProbeAssigner, cents_ref, nprobe),
        batch_format="pyarrow",
        batch_size=2048,
    )

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def cell_topk(group: pa.Table) -> pa.Table:
        role = group["ivf_role"].to_numpy(zero_copy_only=False)
        db = group.filter(pa.array(role == 0))
        qs = group.filter(pa.array(role == 1))
        nd, nq = len(db), len(qs)
        if nd == 0 or nq == 0:
            return empty
        dmat = _normalize(embedding_matrix(db))
        qmat = _normalize(embedding_matrix(qs))
        dids = db["vec_id"].to_numpy(zero_copy_only=False)
        qids = qs["vec_id"].to_numpy(zero_copy_only=False)
        sims = qmat @ dmat.T  # (nq, nd)
        sims[qids[:, None] == dids[None, :]] = -np.inf  # exclude self
        k = min(ANN_K, nd)
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k] if k < nd else (
            np.broadcast_to(np.arange(nd), (nq, nd)).copy()
        )
        psims = np.take_along_axis(sims, part, axis=1)
        keep = np.isfinite(psims).ravel()
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, part.shape[1])[keep], pa.int64()),
                "neighbor_id": pa.array(dids[part.ravel()][keep], pa.int64()),
                "sim": pa.array(psims.ravel()[keep], pa.float64()),
            }
        )

    cand = assigned.groupby("ivf_cell").map_groups(cell_topk, batch_format="pyarrow")

    from hg_dedup_ray.stages.embed import qbucket_merge_topk

    return qbucket_merge_topk(cand, ANN_K)


def ann_ivf_exhaustive(sf_dir: str):
    """IVF multi-probe with nprobe == n_cells: the probe set is
    exhaustive, so the result EQUALS brute-force top-k over every vector
    as a query — which pins the whole IVF machinery (assignment, per-cell
    top-k, global merge) to a DuckDB oracle. ``ann_ivf_topk`` keeps the
    approximate production config (nprobe < n_cells, rows-only)."""
    return ann_ivf_topk(sf_dir, n_cells=8, nprobe=8)


def ann_ivfpq_topk(
    sf_dir: str,
    n_cells: int = 8,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine: int = 10,
):
    """IVF-PQ ANN with exact refine (IVFADC+R, Jegou et al. 2011;
    rows-only — quantized scoring has no exact oracle; recall vs brute
    force and determinism are pinned in tests/test_embed.py).

    THE memory-bounded trillion-scale ANN shape: after a one-off
    driver-side training pass (coarse k-means + per-subspace PQ
    codebooks over a 512-row sample), every db vector is reduced to
    **16 bytes** (vec_id + m=8 codes packed in one u64) — the ONLY
    thing the cell shuffle carries, independent of embedding dimension.
    Queries broadcast with full precision; per cell, scoring is
    asymmetric distance computation: one (m, ksub) inner-product LUT
    per query, then m vectorized gathers over the unpacked codes — no
    full-precision db read in the scan. nprobe/n_cells bounds the
    scanned fraction exactly as in ann_ivf_topk.

    Refine stage: ADC ordering is noisy exactly where it matters (the
    top of the list), so the ADC pass returns a shortlist of
    ``refine * ANN_K`` ids per query, and ONE more streaming pass
    re-scores just those (query, id) pairs with full-precision vectors
    (broadcast shortlist, searchsorted membership per batch, sims only
    for hits) — at 10^12-vector scale this pass prunes to the
    shortlist's row groups instead of re-streaming the corpus. Measured
    on the fixture: ADC-only recall ~0.26, refined ~= exact-vector IVF
    at the same nprobe (probe loss is then the only loss)."""
    from hg_dedup_ray.pipelines.sa_dedup import _task_stage
    from hg_dedup_ray.stages.broadcast import get_broadcast
    from hg_dedup_ray.stages.embed import (
        PqEncoder,
        _normalize,
        pq_train,
        unpack_codes,
    )

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    emb = _emb(sf_dir)
    sample = np.array(
        [r["embedding"] for r in emb.limit(512).take_all()], dtype=np.float64
    )
    if sample.size == 0:
        return ray.data.from_arrow(empty)
    cents = kmeans_centroids(sample, n_cells)
    books = pq_train(sample, m=m, ksub=ksub)

    qt = emb.filter(expr=f"vec_id < {ANN_NUM_QUERIES}").to_pandas()
    qmat = _normalize(
        np.array([np.asarray(e) for e in qt["embedding"]], dtype=np.float64)
    )
    qids = qt["vec_id"].to_numpy().astype(np.int64)
    qsims = qmat @ cents.T
    P = min(nprobe, cents.shape[0])
    probe = (
        np.argpartition(-qsims, kth=P - 1, axis=1)[:, :P]
        if P < cents.shape[0]
        else np.broadcast_to(
            np.arange(cents.shape[0]), (qmat.shape[0], cents.shape[0])
        ).copy()
    )
    # per-query ADC lookup tables, built ONCE on the driver:
    # luts[q, i, c] = <q_sub_i, codeword_{i,c}>  — (nq, m, ksub)
    dsub = books.shape[2]
    luts = np.einsum(
        "qid,icd->qic", qmat.reshape(qmat.shape[0], m, dsub), books
    )
    enc_ref = ray.put((cents, books))
    q_ref = ray.put((qids, luts, probe))

    enc = emb.map_batches(
        _task_stage(PqEncoder, enc_ref), batch_format="pyarrow", batch_size=2048
    )

    def cell_adc_topk(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return out_empty
        g_qids, g_luts, g_probe = get_broadcast(q_ref)
        cell = int(group["ivf_cell"][0].as_py())
        qsel = np.flatnonzero((g_probe == cell).any(axis=1))
        if qsel.size == 0:
            return out_empty
        dids = group["vec_id"].to_numpy(zero_copy_only=False)
        codes = unpack_codes(
            group["pq_code"].to_numpy(zero_copy_only=False), m
        )  # (nd, m)
        sims = np.zeros((qsel.size, dids.shape[0]))
        for i in range(m):
            sims += g_luts[qsel, i][:, codes[:, i]]
        sims[g_qids[qsel][:, None] == dids[None, :]] = -np.inf  # self
        k = min(ANN_K * refine, dids.shape[0])
        part = (
            np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
            if k < dids.shape[0]
            else np.broadcast_to(
                np.arange(dids.shape[0]), (qsel.size, dids.shape[0])
            ).copy()
        )
        psims = np.take_along_axis(sims, part, axis=1)
        keep = np.isfinite(psims).ravel()
        return pa.table(
            {
                "query_id": pa.array(
                    np.repeat(g_qids[qsel], part.shape[1])[keep], pa.int64()
                ),
                "neighbor_id": pa.array(dids[part.ravel()][keep], pa.int64()),
                "sim": pa.array(psims.ravel()[keep], pa.float64()),
            }
        )

    cand = enc.groupby("ivf_cell").map_groups(
        cell_adc_topk, batch_format="pyarrow"
    )

    # ADC shortlist: global top refine*ANN_K per query. Tiny by
    # construction (<= nq * nprobe * refine*ANN_K rows reach the driver;
    # nq, refine, ANN_K are constants), like ann_topk's partials.
    ql, nl, sl = [], [], []
    for b in cand.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ql.append(b["query_id"].to_numpy(zero_copy_only=False))
        nl.append(b["neighbor_id"].to_numpy(zero_copy_only=False))
        sl.append(b["sim"].to_numpy(zero_copy_only=False))
    qa = np.concatenate(ql) if ql else np.empty(0, np.int64)
    na = np.concatenate(nl) if nl else np.empty(0, np.int64)
    sa = np.concatenate(sl) if sl else np.empty(0, np.float64)
    order = np.lexsort((na, -sa, qa))
    qa, na = qa[order], na[order]
    if qa.shape[0]:
        new = np.concatenate(([True], qa[1:] != qa[:-1]))
        rid = np.cumsum(new) - 1
        run_start = np.cumsum(np.bincount(rid)) - np.bincount(rid)
        local = np.arange(qa.shape[0]) - run_start[rid]
        keepm = local < ANN_K * refine
        qa, na = qa[keepm], na[keepm]
    # sort shortlist by neighbor id for per-batch searchsorted membership
    so = np.lexsort((qa, na))
    sl_nid, sl_qid = na[so], qa[so]
    qid_sorted = np.sort(qids)
    qrow_of = np.argsort(qids, kind="stable")  # qmat row for sorted qids
    ref_ref = ray.put((sl_nid, sl_qid, qid_sorted, qmat[qrow_of]))

    def refine_batch(batch: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return out_empty
        nid, qid, qs, qm = get_broadcast(ref_ref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(nid, vids, "left")
        hi = np.searchsorted(nid, vids, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_empty
        mat = _normalize(embedding_matrix(batch))
        rows = np.repeat(np.arange(vids.shape[0]), counts)
        slpos = np.repeat(lo, counts) + (
            np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        qidx = np.searchsorted(qs, qid[slpos])
        sims = np.einsum("ij,ij->i", qm[qidx], mat[rows])
        return pa.table(
            {
                "query_id": pa.array(qid[slpos], pa.int64()),
                "neighbor_id": pa.array(vids[rows], pa.int64()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    refined = emb.map_batches(
        refine_batch, batch_format="pyarrow", batch_size=2048
    )

    from hg_dedup_ray.stages.embed import qbucket_merge_topk

    return qbucket_merge_topk(refined, ANN_K)


def ann_ivfpq_exhaustive(sf_dir: str):
    """IVF-PQ with nprobe == n_cells AND an all-covering refine
    shortlist: every vector is ADC-scored, the shortlist holds the whole
    corpus, and the full-precision refine re-ranks everything — so the
    result EQUALS brute-force top-k, pinning the entire IVFADC+R
    machinery (k-means train, 16-byte code round-trip, LUT scoring,
    shortlist merge, refine pass) to the same DuckDB oracle as
    ``ann_topk``, the ann_ivf_exhaustive trick applied one level deeper.
    ``ann_ivfpq_topk`` keeps the approximate production config
    (rows-only; its quality is the value contract of
    ``ann_ivfpq_recall_report``)."""
    return ann_ivfpq_topk(sf_dir, n_cells=8, nprobe=8, refine=1 << 20)


def ann_ivfpq_recall_report(sf_dir: str):
    """recall@k of the production-config IVF-PQ ANN vs the exact
    brute-force top-k, per query: (query_id, k, n_hits, recall) with
    n_hits = |ivfpq_topk ∩ exact_topk| as an INTEGER — the numeric
    quality contract for the approximate entries. Rows-only by nature
    (the approximate side has no SQL analog); the integer counts are
    deterministic on a fixed fixture and regression-pinned in
    tests/test_embed.py. Both inputs are answer-sized (nq x k rows), so
    the set intersection is driver-trivial."""
    exact = ann_topk(sf_dir).to_pandas()
    approx = ann_ivfpq_topk(sf_dir).to_pandas()
    if len(exact) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "n_hits": pa.array([], pa.int64()),
                "recall": pa.array([], pa.float64()),
            }
        )
    ek = (
        exact["query_id"].to_numpy(np.int64) << np.int64(32)
    ) | exact["neighbor_id"].to_numpy(np.int64)
    ak = (
        approx["query_id"].to_numpy(np.int64) << np.int64(32)
    ) | approx["neighbor_id"].to_numpy(np.int64)
    hit = np.isin(ek, ak)
    qids = exact["query_id"].to_numpy(np.int64)
    u = np.unique(qids)
    n_hits = np.zeros(u.shape[0], np.int64)
    np.add.at(n_hits, np.searchsorted(u, qids), hit.astype(np.int64))
    return pa.table(
        {
            "query_id": pa.array(u, pa.int64()),
            "k": pa.array(np.full(u.shape[0], ANN_K, np.int64), pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "recall": pa.array(n_hits / float(ANN_K), pa.float64()),
        }
    )


def top_docs_per_lang(sf_dir: str, k: int = 3):
    """Windowed top-k per group (rank() shape): per lang, the k largest
    docs by n_chars, doc_id tiebreak. One groupby over the BOUNDED lang
    enum; per-group work is one vectorized lexsort + slice. Per-block
    partial top-k runs first so only k rows per (block, lang) shuffle."""

    def partial_topk(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, lang))
        lang_s = lang[order]
        new = np.concatenate(([True], lang_s[1:] != lang_s[:-1]))
        rid = np.cumsum(new) - 1
        run_start = np.cumsum(np.bincount(rid)) - np.bincount(rid)
        local = np.arange(lang_s.shape[0]) - run_start[rid]
        keep = order[local < k]
        return batch.take(pa.array(keep, pa.int64()))

    def final_topk(group: pa.Table) -> pa.Table:
        nc = group["n_chars"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc))[:k]
        return pa.table(
            {
                "lang": group["lang"].take(pa.array(order, pa.int64())),
                "doc_id": pa.array(did[order], pa.int64()),
                "n_chars": pa.array(nc[order], pa.int64()),
                "lang_rank": pa.array(np.arange(1, order.shape[0] + 1), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
        .map_batches(partial_topk, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def lang_len_percentiles(sf_dir: str):
    """Exact discrete percentiles (quantile_disc semantics: the smallest
    value whose cumulative fraction >= p) of n_chars per lang. Groups are
    the bounded lang enum; per-group math is one sort + two gathers."""

    def pct(group: pa.Table) -> pa.Table:
        nc = np.sort(group["n_chars"].to_numpy(zero_copy_only=False))
        n = nc.shape[0]

        def disc(p: float) -> int:
            return int(nc[max(int(np.ceil(p * n)) - 1, 0)])

        return pa.table(
            {
                "lang": pa.array([group["lang"][0].as_py()], pa.string()),
                "n_docs": pa.array([n], pa.int64()),
                "p50_chars": pa.array([disc(0.5)], pa.int64()),
                "p90_chars": pa.array([disc(0.9)], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["lang", "n_chars"])
        .groupby("lang")
        .map_groups(pct, batch_format="pyarrow")
    )


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup doc pairs via SimHash: band explode -> hot-band prefilter
    -> groupby(band_key) -> within-bucket Hamming filter -> vectorized
    pair distinct. Oracle-checked: <=3 differing bits cannot touch all 4
    16-bit bands, so band-bucket search finds EXACTLY the pairs the
    oracle's self-join (band equality + bit_count(xor) <= 3) finds.

    No per-singleton-group Python anywhere: band keys seen once are
    filtered out before the groupby, and duplicate pairs from multiple
    bands are removed by an in-block lexsort distinct + a native Min
    aggregate (functions/pair_distinct.py), not a map_groups per pair."""
    from hg_dedup_ray.functions.pair_distinct import distinct_pairs, hot_u64_keys
    from hg_dedup_ray.stages.simhash import SimHashBandEmitter, simhash_bucket_pairs

    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    bands = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _task_stage(SimHashBandEmitter),
        batch_format="pyarrow",
        batch_size=2048,
    ).materialize()
    hot = hot_u64_keys(bands, "band_key")
    if hot.shape[0] == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    hot_ref = ray.put(pa.array(hot, pa.uint64()))

    def keep_hot(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        return b.filter(pc.is_in(b["band_key"], value_set=get_broadcast(hot_ref)))

    pairs = (
        bands.map_batches(keep_hot, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(simhash_bucket_pairs(max_hamming), batch_format="pyarrow")
    )
    return distinct_pairs(
        pairs,
        key_cols=["doc_id_a", "doc_id_b"],
        int_key_cols=("doc_id_a", "doc_id_b"),
        carry_cols=["hamming"],
    )


def sa_dedup_resumable(sf_dir: str):
    """Flagship pipeline through the checkpointing driver: writes
    partitioned parquet + per-partition lineage manifests under /tmp,
    returns the re-read output (rows-only; exercises resume machinery)."""
    import shutil
    import tempfile

    from hg_dedup_ray.pipelines.resumable import run_dedup_resumable

    out_dir = tempfile.mkdtemp(prefix="hgdr_resume_")
    try:
        cfg = DedupConfig(
            minlen=64, num_partitions=4, shingle_k=8,
            seq_col="doc_id", id_col="doc_id", text_col="text",
        )
        run_dedup_resumable(f"{sf_dir}/documents.parquet", out_dir, cfg)
        import glob

        import pyarrow.parquet as pq

        # pyarrow datasets ignore _-prefixed dirs (the _ckpt artifacts),
        # so only part=*/ files count as output
        if not glob.glob(f"{out_dir}/part=*/*.parquet"):
            # empty input: zero partitions processed, no output files
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "doc_seq": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                    "n_removed_bytes": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        t = pq.read_table(
            out_dir, columns=["url", "doc_seq", "n_bytes", "n_removed_bytes", "cluster_id"]
        )
        return t.sort_by("doc_seq")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def checkpoint_manifest_report(sf_dir: str):
    """Per-partition LINEAGE + METRICS of a resumable flagship run,
    surfaced as a queryable table — the artifact the north-star's
    "checkpoints record lineage and metrics" clause is about: partition
    id, input-file count, doc-seq range, doc/byte counts, scan results,
    the order-sensitive content fingerprint a rerun validates against,
    and completion status. Runs the checkpointing driver into /tmp and
    reads back ONLY the manifests (a few hundred bytes per partition,
    never the data)."""
    import shutil
    import tempfile

    from hg_dedup_ray.pipelines.resumable import run_dedup_resumable
    from hg_dedup_ray.state.checkpoint import load_completed_parts

    out_dir = tempfile.mkdtemp(prefix="hgdr_manifest_")
    try:
        cfg = DedupConfig(
            minlen=64, num_partitions=4, shingle_k=8,
            seq_col="doc_id", id_col="doc_id", text_col="text",
        )
        run_dedup_resumable(f"{sf_dir}/documents.parquet", out_dir, cfg)
        parts = load_completed_parts(f"{out_dir}/_ckpt", cfg)
        rows = sorted(parts.values(), key=lambda m: m["part"])
        return pa.table(
            {
                "part": pa.array([m["part"] for m in rows], pa.int64()),
                "n_input_files": pa.array(
                    [len(m["input_files"]) for m in rows], pa.int64()
                ),
                "doc_seq_min": pa.array(
                    [m["doc_seq_min"] for m in rows], pa.int64()
                ),
                "doc_seq_max": pa.array(
                    [m["doc_seq_max"] for m in rows], pa.int64()
                ),
                "n_docs": pa.array([m["n_docs"] for m in rows], pa.int64()),
                "corpus_bytes": pa.array(
                    [m["corpus_bytes"] for m in rows], pa.int64()
                ),
                "n_local_ranges": pa.array(
                    [m["n_local_ranges"] for m in rows], pa.int64()
                ),
                "n_removed_bytes": pa.array(
                    [m["n_removed_bytes"] for m in rows], pa.int64()
                ),
                "content_hash": pa.array(
                    [m["content_hash"] for m in rows], pa.string()
                ),
                "status": pa.array([m["status"] for m in rows], pa.string()),
            }
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def run_metrics_summary(sf_dir: str):
    """ONE-ROW run rollup of a resumable flagship run — the "bytes
    indexed, candidate pairs, spans removed" metrics clause of the
    north-star as a publishable record: partition/doc/byte totals from
    the per-partition manifests plus the cross-partition candidate
    stage's counts (dup-set urls, cluster assignments). Reads only
    manifests and the two answer-sized candidate artifacts, never the
    corpus."""
    import shutil
    import tempfile

    from hg_dedup_ray.pipelines.resumable import run_dedup_resumable
    from hg_dedup_ray.state.checkpoint import (
        load_candidates,
        load_completed_parts,
    )

    out_dir = tempfile.mkdtemp(prefix="hgdr_metrics_")
    try:
        cfg = DedupConfig(
            minlen=64, num_partitions=4, shingle_k=8,
            seq_col="doc_id", id_col="doc_id", text_col="text",
        )
        run_dedup_resumable(f"{sf_dir}/documents.parquet", out_dir, cfg)
        ckpt = f"{out_dir}/_ckpt"
        parts = load_completed_parts(ckpt, cfg)
        cand = load_candidates(ckpt, cfg)
        xranges, clusters = cand if cand is not None else ({}, {})
        ms = list(parts.values())
        n_spans = sum(len(rr) for rr in xranges.values())
        return pa.table(
            {
                "n_partitions": pa.array([len(ms)], pa.int64()),
                "n_docs": pa.array(
                    [sum(m["n_docs"] for m in ms)], pa.int64()
                ),
                "bytes_indexed": pa.array(
                    [sum(m["corpus_bytes"] for m in ms)], pa.int64()
                ),
                "n_local_ranges": pa.array(
                    [sum(m["n_local_ranges"] for m in ms)], pa.int64()
                ),
                "n_removed_bytes": pa.array(
                    [sum(m["n_removed_bytes"] for m in ms)], pa.int64()
                ),
                "n_cross_spans": pa.array([n_spans], pa.int64()),
                "n_dupset_urls": pa.array([len(xranges)], pa.int64()),
                "n_clustered_urls": pa.array([len(clusters)], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ------------------------------------------------------------- multimodal
def _multimodal(sf_dir: str, kind: str, stage_cls, batch_size: int, **kw):
    from hg_dedup_ray.stages import multimodal as mm

    return (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda b: mm.attach_payloads(b, kind),  # payload = REAL text bytes
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        .map_batches(
            stage_cls,
            batch_format="pyarrow",
            batch_size=batch_size,  # payload-heavy rows: small batches
            concurrency=_pool(),
            **kw,
        )
    )


def image_features(sf_dir: str):
    """Opaque binary image payloads -> typed feature columns via an
    actor-pool decode stage (decode stubbed: stages/multimodal.py)."""
    from hg_dedup_ray.stages.multimodal import ImageFeatures

    return _multimodal(sf_dir, "image", ImageFeatures, 256)


def audio_features(sf_dir: str):
    from hg_dedup_ray.stages.multimodal import AudioFeatures

    return _multimodal(sf_dir, "audio", AudioFeatures, 256)


def video_frame_sample(sf_dir: str):
    """Video payloads -> one row per sampled frame (stride 4)."""
    from hg_dedup_ray.stages.multimodal import FrameSampler

    return _multimodal(sf_dir, "video", FrameSampler, 64)


def html_text_extract(sf_dir: str):
    """The north rule's PER-ROW INVARIANT as a value-checked row:
    extract each page's text from its REAL ``html:binary`` column (text
    content of the <main> element, stdlib parser, entities decoded) and
    count byte-identical matches against the table's ``text`` column —
    (n_pages, n_byte_identical) must be equal, and the DuckDB oracle
    pins both to the documents row count. The webpages fixture embeds
    text escaped inside <main> (sources/webpages.py), so any parser or
    encoding regression flips the second count and the hash check.

    Scale shape: one actor-pool streaming pass (parse state per actor),
    one tiny (n, n_eq) partial row per batch — nothing page-sized
    shuffles or reaches the driver."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.sources.webpages import generate_webpages
    from hg_dedup_ray.stages.multimodal import HtmlMainText

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    empty = pa.table(
        {
            "n_pages": pa.array([0], pa.int64()),
            "n_byte_identical": pa.array([0], pa.int64()),
        }
    )
    if n_docs == 0:
        return ray.data.from_arrow(empty)
    table, _ = generate_webpages(n_docs=n_docs, seed=42, minlen=64)

    class ExtractAndCompare(HtmlMainText):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            eq = pc.equal(
                out["extracted_text"].cast(pa.binary()),
                out["text"].cast(pa.binary()),
            )
            return pa.table(
                {
                    "n_pages": pa.array([len(out)], pa.int64()),
                    "n_byte_identical": pa.array(
                        [int(pc.sum(eq.cast(pa.int64())).as_py() or 0)],
                        pa.int64(),
                    ),
                }
            )

    parts = (
        ray.data.from_arrow(table.select(["url", "html", "text"]))
        .map_batches(
            ExtractAndCompare,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=_pool(),
        )
        .take_all()
    )
    return pa.table(
        {
            "n_pages": pa.array(
                [int(sum(r["n_pages"] for r in parts))], pa.int64()
            ),
            "n_byte_identical": pa.array(
                [int(sum(r["n_byte_identical"] for r in parts))], pa.int64()
            ),
        }
    )


def html_features(sf_dir: str):
    """Real HTML parsing over the input_hint webpages table's
    ``html:binary`` column: tag/link counts, title, visible-text ratio
    via the stdlib-parser actor stage (stages/multimodal.HtmlFeatures).

    The webpages table is the deterministic synthetic fixture
    (sources/webpages.py) sized to the sf dir's documents row count — the
    BASELINE.json input shape, synthesized because no external data
    exists in this sandbox. Rows-only (HTML parsing has no reasonable
    SQL oracle)."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.sources.webpages import generate_webpages
    from hg_dedup_ray.stages.multimodal import HtmlFeatures

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    if n_docs == 0:  # empty corpus: no pages to parse
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "n_tags": pa.array([], pa.int64()),
                    "n_links": pa.array([], pa.int64()),
                    "title": pa.array([], pa.string()),
                    "text_ratio": pa.array([], pa.float64()),
                }
            )
        )
    table, _ = generate_webpages(n_docs=n_docs, seed=42, minlen=64)
    return (
        ray.data.from_arrow(table.select(["url", "html"]))
        .map_batches(
            HtmlFeatures,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=_pool(),
        )
    )


def image_phash_near_dup(sf_dir: str, max_hamming: int = 3):
    """Perceptual-hash image near-dup pairs: real PNG/PPM payloads are
    decoded (stages/multimodal.StdCodec), aHashed from the PIXELS
    (stages/mediadedup.ahash64 — resolution-independent 8x8 area mean),
    then the SimHash banded-Hamming pair search runs over the 64-bit
    signatures. EXACT for the <=3-bit radius: <=3 differing bits cannot
    touch all four 16-bit bands, so every qualifying pair shares a band
    bucket (the same pigeonhole simhash_near_dup_pairs is oracle-checked
    on). Only (doc_id, 8-byte sig) rows shuffle; payloads never leave
    the decode stage. Rows-only (pixel decode has no SQL oracle);
    exactness vs a brute-force all-pairs scan is pinned in
    tests/test_multimodal.py."""
    from hg_dedup_ray.functions.pair_distinct import distinct_pairs, hot_u64_keys
    from hg_dedup_ray.stages.mediadedup import ImagePHashBands
    from hg_dedup_ray.stages.multimodal import attach_payloads
    from hg_dedup_ray.stages.simhash import simhash_bucket_pairs

    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    bands = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda b: attach_payloads(b, "image"),
            batch_format="pyarrow",
            batch_size=256,  # payload-heavy rows: small batches
        )
        .map_batches(
            _task_stage(ImagePHashBands), batch_format="pyarrow", batch_size=256
        )
        .materialize()
    )
    hot = hot_u64_keys(bands, "band_key")
    if hot.shape[0] == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    hot_ref = ray.put(pa.array(hot, pa.uint64()))

    def keep_hot(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        return b.filter(pc.is_in(b["band_key"], value_set=get_broadcast(hot_ref)))

    pairs = (
        bands.map_batches(keep_hot, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(
            simhash_bucket_pairs(max_hamming, sig_col="phash"),
            batch_format="pyarrow",
        )
    )
    return distinct_pairs(
        pairs,
        key_cols=["doc_id_a", "doc_id_b"],
        int_key_cols=("doc_id_a", "doc_id_b"),
        carry_cols=["hamming"],
    )


def audio_fingerprint_dedup(sf_dir: str):
    """Exact audio dedup on decoded CONTENT: WAV payloads -> mono PCM
    (stages/multimodal.StdCodec) -> 64-bit energy-profile fingerprint
    (stages/mediadedup.audio_fp64) -> keep-first over identical
    fingerprints. Same coarse-bucket combine as exact_dedup: each batch
    pre-reduces to its per-fp min doc_id (one lexsort), the shuffle
    groups by fp%64 (fixed group count at any corpus size), keeper ids
    broadcast back for the keep flag (at a scale where keepers outgrow
    the driver, swap in the hash(doc_id)%B bucketed semi-join exactly as
    exact_dedup documents). Output (doc_id, audio_fp, keep);
    rows-only (PCM decode has no SQL oracle) — keep-flag equality vs a
    brute-force fingerprint scan is pinned in tests/test_multimodal.py."""
    from hg_dedup_ray.stages.mediadedup import AudioFingerprint
    from hg_dedup_ray.stages.multimodal import attach_payloads

    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    num_buckets = 64
    fps = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda b: attach_payloads(b, "audio"),
            batch_format="pyarrow",
            batch_size=256,
        )
        .map_batches(
            _task_stage(AudioFingerprint), batch_format="pyarrow", batch_size=256
        )
        .materialize()
    )

    def fp_min_partial(batch: pa.Table) -> pa.Table:
        fp = batch["audio_fp"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, fp))
        fp, d = fp[order], d[order]
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        fp, d = fp[bnd], d[bnd]
        return pa.table(
            {
                "cbucket": pa.array((fp % num_buckets).astype(np.int64), pa.int64()),
                "fp": pa.array(fp, pa.uint64()),
                "keep_id": pa.array(d, pa.int64()),
            }
        )

    def fp_min_combine(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        d = group["keep_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, fp))
        fp, d = fp[order], d[order]
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        return pa.table({"keep_id": pa.array(d[bnd], pa.int64())})

    keepers = (
        fps.map_batches(fp_min_partial, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(fp_min_combine, batch_format="pyarrow")
    )
    keep_ids = np.sort(
        np.concatenate(
            [
                b["keep_id"].to_numpy(zero_copy_only=False)
                for r in keepers.to_arrow_refs()
                if len(b := ray.get(r))
            ]
            or [np.array([], np.int64)]
        )
    )
    keep_ref = ray.put(keep_ids)

    def flag(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ks = get_broadcast(keep_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, d)
        keep = (pos < ks.shape[0]) & (ks[np.minimum(pos, ks.shape[0] - 1)] == d)
        return batch.append_column("keep", pa.array(keep, pa.bool_()))

    return fps.map_batches(flag, batch_format="pyarrow")


def video_framehash_near_dup(sf_dir: str, threshold: float = 0.5, num_buckets: int = 64):
    """Video near-dup pairs by SHARED-FRAME Jaccard — the standard video
    dedup formulation (frame-fingerprint matching): decode each Y4M
    payload (stages/multimodal.StdCodec), aHash every frame, and report
    doc pairs whose DISTINCT-frame-hash sets have Jaccard >= threshold.

    Candidate generation is PREFIX-FILTERED (the PPJoin cascade of
    ngram_jaccard_exact_pairs, specialized to tiny sets): each doc's
    frame hashes are ordered by global df ascending and only the
    ``n - ceil(t*n) + 1`` rarest are indexed, so a stop frame (all-black
    / intro card shared by thousands of videos) lands in a doc's prefix
    only when the doc has nothing rarer — the per-posting-list pair
    expansion CLAUDE.md bans as quadratic never sees ubiquitous hashes.
    The prefix guarantee holds for any consistent global order, so
    candidates remain a SUPERSET of qualifying pairs (prefix length is
    rounded toward the enlarging side; doc fragments straddling blocks
    only enlarge it further). Candidates are then verified EXACTLY
    against each doc's full sorted frame-hash set (<= a dozen u64s =
    ~100 B/doc, broadcast for candidate docs only — the dup-set
    broadcast pattern; above a driver budget this side would ride the
    bucketed dupset_join shape instead).

    Shuffles carry only (u64 fhash / pid, short ints); frames and
    payloads never leave the decode stage. Per-group Python runs only on
    hot PREFIX hashes, per-pair Python only on surviving candidates
    (both dup-bounded). Rows-only (frame decode has no SQL oracle);
    equality with a brute-force all-pairs set scan is pinned in
    tests/test_multimodal.py."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys_counts
    from hg_dedup_ray.stages.mediadedup import VideoFrameHashes
    from hg_dedup_ray.stages.multimodal import attach_payloads

    from hg_dedup_ray.pipelines.sa_dedup import _task_stage

    rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda b: attach_payloads(b, "video"),
            batch_format="pyarrow",
            batch_size=256,  # payload-heavy rows: small batches
        )
        .map_batches(
            _task_stage(VideoFrameHashes), batch_format="pyarrow", batch_size=256
        )
        .materialize()
    )
    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    )
    hot, df = hot_u64_keys_counts(rows, "fhash")
    if hot.shape[0] == 0:
        return empty
    df_ref = ray.put((hot, df.astype(np.int64)))

    def prefix_postings(batch: pa.Table) -> pa.Table:
        """(fhash, doc_id, nframes) rows for each doc's df-ascending
        PREFIX hashes that are hot (df >= 2). Runs on whole blocks
        (batch_size=None): doc fragments would only enlarge the prefix
        (local rank <= global rank), never shrink it."""
        from hg_dedup_ray.stages.broadcast import get_broadcast

        e = pa.table(
            {
                "fhash": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
                "nframes": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "fhash" not in batch.column_names:
            return e
        hot_s, df_s = get_broadcast(df_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        fh = batch["fhash"].to_numpy(zero_copy_only=False)
        nf = batch["nframes"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(hot_s, fh)
        jc = np.minimum(j, hot_s.shape[0] - 1)
        is_hot = (j < hot_s.shape[0]) & (hot_s[jc] == fh)
        dfv = np.where(is_hot, df_s[jc], 1)
        order = np.lexsort((fh, dfv, ids))
        ids_s, fh_s, nf_s = ids[order], fh[order], nf[order]
        hot_m = is_hot[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        )
        seg = np.diff(np.concatenate((starts, [ids_s.shape[0]])))
        rank = np.arange(ids_s.shape[0], dtype=np.int64) - np.repeat(starts, seg)
        # enlarging rounding: ceil(t*n - eps), so borderline n*t keeps
        # the extra slot (a candidate superset is always safe)
        plen = nf_s - np.ceil(threshold * nf_s - 1e-9).astype(np.int64) + 1
        keep = (rank < plen) & hot_m
        return pa.table(
            {
                "fhash": pa.array(fh_s[keep], pa.uint64()),
                "doc_id": pa.array(ids_s[keep], pa.int64()),
                "nframes": pa.array(nf_s[keep], pa.int64()),
            }
        )

    _empty_pairs = pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "pid": pa.array([], pa.uint64()),
        }
    )

    def posting_pairs(group: pa.Table) -> pa.Table:
        # one PREFIX posting list; each doc appears at most once
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        if ids.shape[0] and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError("video_framehash_near_dup requires 0 <= doc_id < 2^32")
        nf = group["nframes"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, nf = ids[order], nf[order]
        m = ids.shape[0]
        if m < 2:
            return _empty_pairs
        ai, bi = np.triu_indices(m, k=1)
        na, nb = nf[ai], nf[bi]
        # length filter (J >= t implies min >= t*max); eps only ENLARGES
        ok = np.minimum(na, nb) >= threshold * np.maximum(na, nb) - 1e-9
        ai, bi = ai[ok], bi[ok]
        pid = (ids[ai].astype(np.uint64) << np.uint64(32)) | ids[bi].astype(
            np.uint64
        )
        return pa.table(
            {
                "pbucket": pa.array(
                    (pid % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "pid": pa.array(pid, pa.uint64()),
            }
        )

    def distinct_pids(group: pa.Table) -> pa.Table:
        pid = np.unique(group["pid"].to_numpy(zero_copy_only=False))
        return pa.table({"pid": pa.array(pid, pa.uint64())})

    cand = (
        rows.map_batches(prefix_postings, batch_format="pyarrow", batch_size=None)
        .groupby("fhash")
        .map_groups(posting_pairs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(distinct_pids, batch_format="pyarrow")
        .materialize()
    )
    if cand.count() == 0:
        return empty

    # ---- exact verify: broadcast candidate docs' full frame-hash sets
    pid_all = np.concatenate(
        [
            t["pid"].to_numpy(zero_copy_only=False)
            for t in ray.get(cand.to_arrow_refs())
            if len(t)
        ]
    )
    cand_ids = np.unique(
        np.concatenate(
            [
                (pid_all >> np.uint64(32)).astype(np.int64),
                (pid_all & np.uint64(0xFFFFFFFF)).astype(np.int64),
            ]
        )
    )
    ids_ref = ray.put(cand_ids)

    def member_rows(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ci = get_broadcast(ids_ref)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ci, d)
        hit = (pos < ci.shape[0]) & (ci[np.minimum(pos, ci.shape[0] - 1)] == d)
        return b.filter(pa.array(hit)).select(["doc_id", "fhash"])

    mem = rows.map_batches(member_rows, batch_format="pyarrow").take_all()
    md = np.array([r["doc_id"] for r in mem], np.int64)
    mh = np.array([r["fhash"] for r in mem], np.uint64)
    order = np.lexsort((mh, md))
    md, mh = md[order], mh[order]
    set_starts = np.flatnonzero(np.concatenate(([True], md[1:] != md[:-1])))
    set_ids = md[set_starts]
    set_offs = np.concatenate((set_starts, [md.shape[0]]))
    sets_ref = ray.put((set_ids, set_offs, mh))

    def verify(b: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        sid, soff, shash = get_broadcast(sets_ref)
        pid = b["pid"].to_numpy(zero_copy_only=False)
        a = (pid >> np.uint64(32)).astype(np.int64)
        bb = (pid & np.uint64(0xFFFFFFFF)).astype(np.int64)
        ja = np.searchsorted(sid, a)
        jb = np.searchsorted(sid, bb)
        out_j = np.empty(pid.shape[0], np.float64)
        for i in range(pid.shape[0]):  # per-PAIR: candidates only, sets tiny
            sa_ = shash[soff[ja[i]] : soff[ja[i] + 1]]
            sb_ = shash[soff[jb[i]] : soff[jb[i] + 1]]
            inter = np.intersect1d(sa_, sb_, assume_unique=True).shape[0]
            union = sa_.shape[0] + sb_.shape[0] - inter
            out_j[i] = inter / union if union else 1.0
        keep = out_j >= threshold
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep], pa.int64()),
                "doc_id_b": pa.array(bb[keep], pa.int64()),
                "jaccard": pa.array(out_j[keep], pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def _window_keepfirst_ctx(
    docs, minlen: int, broadcast_limit: int = 20_000_000
):
    """Shared passes 1-2 of the doc-internal keep-first window family
    (window_dedup_report / window_ptr_report / window_kept_gaps, plus
    the window tier of dedup_tier_cascade — ``docs`` is any Dataset
    with (doc_id, text) columns): find
    the duplicated (count >= 2) windows and each one's global first
    (doc_id, pos) key. Returns ``(docs, batch_windows, map_ref,
    ptrs)`` where ``batch_windows(batch) -> (hashes, window_doc_row,
    in_doc_pos, valid_mask, ids)`` and exactly one of map_ref/ptrs is
    set (both None when the corpus has no duplicated windows):

    - ``map_ref`` (<= ``broadcast_limit`` distinct duplicated windows):
      a ``ray.put`` (sorted hot hashes, first keys) map consumers probe
      per batch — 16 B per distinct duplicated window.
    - ``ptrs`` (above the limit): a distributed pointer Dataset
      (dbucket, doc_id, pos, kept) with one row per OCCURRENCE of a
      duplicated window — nothing window-map-sized ever lands on the
      driver; consumers aggregate per doc-bucket (the
      stages/dupset_join bucketed shape, one extra keys-only shuffle).

    Scale shape: two streaming passes over the corpus, neither of which
    shuffles text. Pass 1 streams window hashes and emits each batch-
    distinct hash once (twice when it repeats in-batch), so the global
    count >= 2 test = the hot-window set; pass 2 ships (hash, key) rows
    for HOT windows only (dup-bounded) through a 64-way coarse-bucket
    segment-min to get each hot window's global first key. The hot
    PREFILTER itself stays a broadcast array (8 B per distinct dup
    window, the repo-wide keeper-set budget; hot_u64_keys already
    shards its reduction). u64 rolling
    hashes stand in for window identity with the same documented
    collision odds as substring_decontaminate (~n^2/2^64). Windows are
    BYTES on both sides: the oracles slice hex(encode(text)), so parity
    holds on non-ASCII too (tests/test_nonascii_oracles.py)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys
    from hg_dedup_ray.functions.scan import _window_hashes

    def _batch_windows(batch: pa.Table):
        """(hashes, window_doc_row, in_doc_pos, valid_mask, ids)."""
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 31):
            # the keep-first key packs (doc_id, pos) into one u64 on the
            # Ray side (good to 2^32), but the window-family DuckDB
            # oracles compute doc_id * 2^32 + pos in BIGINT — the
            # oracle-parity-safe domain is doc_id < 2^31
            raise ValueError("window_dedup_report requires 0 <= doc_id < 2^31")
        if data.shape[0] < minlen:
            z = np.empty(0, np.int64)
            return np.empty(0, np.uint64), z, z, np.empty(0, bool), ids
        h = _window_hashes(data, minlen)
        m = h.shape[0]
        pos = np.arange(m, dtype=np.int64)
        wdoc = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + minlen <= offsets[1:][wdoc]
        return h, wdoc, pos - offsets[:-1][wdoc], valid, ids

    def hash_partial(batch: pa.Table) -> pa.Table:
        # distinct hash once + once more when it repeats IN-batch, so a
        # global occurrence count >= 2 is exactly "row count >= 2" here
        h, _wdoc, _ip, valid, _ids = _batch_windows(batch)
        hv = np.sort(h[valid])
        if hv.shape[0]:
            starts = np.flatnonzero(
                np.concatenate(([True], hv[1:] != hv[:-1]))
            )
            cnt = np.diff(np.concatenate((starts, [hv.shape[0]])))
            u = hv[starts]
            hv = np.concatenate([u, u[cnt >= 2]])
        return pa.table({"h": pa.array(hv, pa.uint64())})

    mat = docs.map_batches(
        hash_partial, batch_format="pyarrow", batch_size=1024
    ).materialize()
    hot = hot_u64_keys(mat, "h")

    if hot.shape[0] == 0:
        return docs, _batch_windows, None, None
    hot_ref = ray.put(hot)

    def hot_keys(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        H = get_broadcast(hot_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        p = np.searchsorted(H, h)
        pc_ = np.minimum(p, H.shape[0] - 1)
        hit = valid & (p < H.shape[0]) & (H[pc_] == h)
        hh = h[hit]
        key = (ids[wdoc[hit]].astype(np.uint64) << np.uint64(32)) | ip[
            hit
        ].astype(np.uint64)
        return pa.table(
            {
                "hbucket": pa.array(
                    (hh % np.uint64(64)).astype(np.int64), pa.int64()
                ),
                "h": pa.array(hh, pa.uint64()),
                "k": pa.array(key, pa.uint64()),
            }
        )

    if hot.shape[0] > broadcast_limit:
        # ABOVE-LIMIT PATH: never collect the first-key map. Each
        # hbucket group holds ALL occurrences of its hot windows, so the
        # group-local (h, key)-lexsort first IS the global keeper; emit
        # one (doc_id, pos, kept) pointer row per occurrence, keyed by a
        # 64-way doc bucket for the consumers' per-doc aggregation.
        def ptr_rows(group: pa.Table) -> pa.Table:
            h = group["h"].to_numpy(zero_copy_only=False)
            k = group["k"].to_numpy(zero_copy_only=False)
            order = np.lexsort((k, h))
            h, k = h[order], k[order]
            kept = np.concatenate(([True], h[1:] != h[:-1]))
            doc_id = (k >> np.uint64(32)).astype(np.int64)
            pos = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
            return pa.table(
                {
                    "dbucket": pa.array(doc_id % 64, pa.int64()),
                    "doc_id": pa.array(doc_id, pa.int64()),
                    "pos": pa.array(pos, pa.int64()),
                    "kept": pa.array(kept.astype(np.uint8), pa.uint8()),
                }
            )

        ptrs = (
            docs.map_batches(hot_keys, batch_format="pyarrow", batch_size=1024)
            .groupby("hbucket")
            .map_groups(ptr_rows, batch_format="pyarrow")
        )
        return docs, _batch_windows, None, ptrs

    def first_key_combine(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h))
        h, k = h[order], k[order]
        keep = np.concatenate(([True], h[1:] != h[:-1]))
        return pa.table(
            {"h": pa.array(h[keep], pa.uint64()), "k": pa.array(k[keep], pa.uint64())}
        )

    firsts = (
        docs.map_batches(hot_keys, batch_format="pyarrow", batch_size=1024)
        .groupby("hbucket")
        .map_groups(first_key_combine, batch_format="pyarrow")
    )
    # hot-window first-key map: dup-distinct-bounded (16 B per distinct
    # duplicated window), the same broadcast budget as the keeper sets
    tabs = [t for t in ray.get(firsts.to_arrow_refs()) if len(t)]
    fh = np.concatenate(
        [t["h"].to_numpy(zero_copy_only=False) for t in tabs]
        or [np.empty(0, np.uint64)]
    )
    fk = np.concatenate(
        [t["k"].to_numpy(zero_copy_only=False) for t in tabs]
        or [np.empty(0, np.uint64)]
    )
    order = np.argsort(fh)
    return docs, _batch_windows, ray.put((fh[order], fk[order])), None


def window_dedup_report(
    sf_dir: str, minlen: int = 64, broadcast_limit: int = 20_000_000
):
    """The flagship's keep-first substring-dedup semantics as an
    ORACLE-CHECKED per-doc report: for every ``minlen``-byte window lying
    fully inside a doc, the occurrence with the smallest (doc_id, pos)
    is kept and every other occurrence becomes a remove pointer
    (reference keep-min rule, cpp_engine_dedup.h:239-247); per doc the
    sorted pointers coalesce into ranges with the reference's gap rule
    (break at diff > minlen, cpp_engine_dedup.h:285-292) and the report
    row is (doc_id, n_dup_windows, removed_bytes). This is the
    north-star operation restricted to doc-internal windows so DuckDB
    can replicate it exactly (window explode + keep-first + islands).
    Pass 3 re-streams the corpus, probes the broadcast (hot, first-key)
    map, and folds remove pointers into per-doc islands vectorized;
    above ``broadcast_limit`` distinct duplicated windows, doc marker
    rows union the ctx's distributed pointer rows in a 64-way doc-bucket
    groupby instead (keys+ints only, never text)."""
    docs, _batch_windows, map_ref, ptrs = _window_keepfirst_ctx(
        _docs(sf_dir, columns=["doc_id", "text"]), minlen,
        broadcast_limit=broadcast_limit,
    )

    if map_ref is None and ptrs is None:  # no duplicated windows anywhere

        def zeros(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_dup_windows": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "removed_bytes": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        return docs.map_batches(zeros, batch_format="pyarrow")

    if ptrs is not None:
        # bucketed above-limit path: one marker row per doc (kept=2,
        # pos=-1) unions the pointer rows; each doc bucket folds its
        # remove pointers into islands vectorized across docs
        def doc_marker(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = ids.shape[0]
            return pa.table(
                {
                    "dbucket": pa.array(ids % 64, pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
                    "kept": pa.array(np.full(n, 2, np.uint8), pa.uint8()),
                }
            )

        def combine(group: pa.Table) -> pa.Table:
            doc = group["doc_id"].to_numpy(zero_copy_only=False)
            pos = group["pos"].to_numpy(zero_copy_only=False)
            kept = group["kept"].to_numpy(zero_copy_only=False)
            mids = np.sort(doc[kept == 2])
            n = mids.shape[0]
            rm = kept == 0
            d, rp = doc[rm], pos[rm]
            order = np.lexsort((rp, d))
            d, rp = d[order], rp[order]
            idx = np.searchsorted(mids, d)
            nw = np.bincount(idx, minlength=n).astype(np.int64)
            rb = np.zeros(n, np.int64)
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                seg = rp[en - 1] - rp[st] + minlen
                rb = np.bincount(idx[st], weights=seg, minlength=n).astype(
                    np.int64
                )
            return pa.table(
                {
                    "doc_id": pa.array(mids, pa.int64()),
                    "n_dup_windows": pa.array(nw, pa.int64()),
                    "removed_bytes": pa.array(rb, pa.int64()),
                }
            )

        return (
            docs.map_batches(doc_marker, batch_format="pyarrow", batch_size=4096)
            .union(ptrs)
            .groupby("dbucket")
            .map_groups(combine, batch_format="pyarrow")
        )

    def report(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        HS, KMIN = get_broadcast(map_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        nb = len(batch)
        p = np.searchsorted(HS, h)
        pc_ = np.minimum(p, HS.shape[0] - 1)
        hit = valid & (p < HS.shape[0]) & (HS[pc_] == h)
        key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
            np.uint64
        )
        rm = hit & (key != KMIN[pc_])
        d, rp = wdoc[rm], ip[rm]  # pos-ascending => sorted per doc
        nw = np.bincount(d, minlength=nb).astype(np.int64)
        if rp.shape[0]:
            st = np.flatnonzero(
                np.concatenate(
                    ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                )
            )
            en = np.concatenate((st[1:], [rp.shape[0]]))
            seg = rp[en - 1] - rp[st] + minlen
            rb = np.bincount(d[st], weights=seg, minlength=nb).astype(np.int64)
        else:
            rb = np.zeros(nb, np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_dup_windows": pa.array(nw, pa.int64()),
                "removed_bytes": pa.array(rb, pa.int64()),
            }
        )

    return docs.map_batches(report, batch_format="pyarrow", batch_size=1024)


def window_ptr_report(
    sf_dir: str, minlen: int = 64, broadcast_limit: int = 20_000_000
):
    """D5/D6 kept-vs-dropped pointer report (reference
    find_dup_ptrs/find_dup_docs, cpp_engine_dedup.h:801-867) under the
    doc-internal window semantics, ORACLE-CHECKED: per doc that touches
    any duplicated window, the count of occurrences it KEEPS (it holds
    the global min (doc_id, pos) key) vs occurrences DROPPED to an
    earlier doc. ``dup_doc_report`` keeps the full cross-doc corpus
    formulation (rows-only, reference-parity-tested); this pins the
    same kept/dropped accounting to DuckDB."""
    docs, _batch_windows, map_ref, ptrs = _window_keepfirst_ctx(
        _docs(sf_dir, columns=["doc_id", "text"]), minlen,
        broadcast_limit=broadcast_limit,
    )

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_kept_ptrs": pa.array([], pa.int64()),
            "n_dropped_ptrs": pa.array([], pa.int64()),
        }
    )
    if map_ref is None and ptrs is None:  # no duplicated windows anywhere
        return ray.data.from_arrow(empty)

    if ptrs is not None:
        # bucketed above-limit path: a doc appears in the report iff it
        # has any pointer row, so no marker union is needed here
        def combine(group: pa.Table) -> pa.Table:
            doc = group["doc_id"].to_numpy(zero_copy_only=False)
            kept = group["kept"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(doc, return_inverse=True)
            nk = np.bincount(inv[kept == 1], minlength=u.shape[0]).astype(
                np.int64
            )
            nd = np.bincount(inv[kept == 0], minlength=u.shape[0]).astype(
                np.int64
            )
            return pa.table(
                {
                    "doc_id": pa.array(u, pa.int64()),
                    "n_kept_ptrs": pa.array(nk, pa.int64()),
                    "n_dropped_ptrs": pa.array(nd, pa.int64()),
                }
            )

        return ptrs.groupby("dbucket").map_groups(
            combine, batch_format="pyarrow"
        )

    def report(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        HS, KMIN = get_broadcast(map_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        if h.shape[0] == 0:
            return empty
        p = np.searchsorted(HS, h)
        pc_ = np.minimum(p, HS.shape[0] - 1)
        hit = valid & (p < HS.shape[0]) & (HS[pc_] == h)
        key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
            np.uint64
        )
        kept = hit & (key == KMIN[pc_])
        drop = hit & ~kept
        nb = len(batch)
        nk = np.bincount(wdoc[kept], minlength=nb).astype(np.int64)
        nd = np.bincount(wdoc[drop], minlength=nb).astype(np.int64)
        any_ = (nk + nd) > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[any_], pa.int64()),
                "n_kept_ptrs": pa.array(nk[any_], pa.int64()),
                "n_dropped_ptrs": pa.array(nd[any_], pa.int64()),
            }
        )

    return docs.map_batches(report, batch_format="pyarrow", batch_size=1024)


def window_kept_gaps(
    sf_dir: str, minlen: int = 24, broadcast_limit: int = 20_000_000
):
    """Kept-middle-lengths QA stat (reference
    write_back_to_jsonl_sharded.py:91-111) under the doc-internal window
    semantics, ORACLE-CHECKED: histogram of the gap lengths between two
    consecutive removed islands inside one doc. ``kept_middle_lengths``
    keeps the full cross-doc corpus formulation (rows-only); this pins
    the island-coalesce + gap accounting to DuckDB. minlen=24 for the
    same non-vacuity reason as kept_middle_lengths (64 yields almost no
    two-island docs on the fixtures)."""
    from ray.data.aggregate import Sum

    docs, _batch_windows, map_ref, ptrs = _window_keepfirst_ctx(
        _docs(sf_dir, columns=["doc_id", "text"]), minlen,
        broadcast_limit=broadcast_limit,
    )

    empty = pa.table(
        {"gap_len": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if map_ref is None and ptrs is None:  # no duplicated windows anywhere
        return ray.data.from_arrow(empty)

    if ptrs is not None:
        # bucketed above-limit path: islands/gaps from each doc bucket's
        # remove pointers, then the same tiny gap-length groupby-Sum
        def gaps_group(group: pa.Table) -> pa.Table:
            kept = group["kept"].to_numpy(zero_copy_only=False)
            rm = kept == 0
            d = group["doc_id"].to_numpy(zero_copy_only=False)[rm]
            rp = group["pos"].to_numpy(zero_copy_only=False)[rm]
            order = np.lexsort((rp, d))
            d, rp = d[order], rp[order]
            g = np.empty(0, np.int64)
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                same = d[st[1:]] == d[st[:-1]]
                g = (rp[st[1:]] - (rp[en[:-1] - 1] + minlen))[same]
            vals, counts = np.unique(g, return_counts=True)
            return pa.table(
                {
                    "gap_len": pa.array(vals, pa.int64()),
                    "partial": pa.array(counts, pa.int64()),
                }
            )

        return (
            ptrs.groupby("dbucket")
            .map_groups(gaps_group, batch_format="pyarrow")
            .groupby("gap_len")
            .aggregate(Sum("partial", alias_name="n"))
        )

    def gaps(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        HS, KMIN = get_broadcast(map_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        g = np.empty(0, np.int64)
        if h.shape[0]:
            p = np.searchsorted(HS, h)
            pc_ = np.minimum(p, HS.shape[0] - 1)
            hit = valid & (p < HS.shape[0]) & (HS[pc_] == h)
            key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
                np.uint64
            )
            rm = hit & (key != KMIN[pc_])
            d, rp = wdoc[rm], ip[rm]  # pos-ascending => sorted per doc
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                same = d[st[1:]] == d[st[:-1]]  # island i+1 in island i's doc
                g = (rp[st[1:]] - (rp[en[:-1] - 1] + minlen))[same]
        vals, counts = np.unique(g, return_counts=True)
        return pa.table(
            {
                "gap_len": pa.array(vals, pa.int64()),
                "partial": pa.array(counts, pa.int64()),
            }
        )

    return (
        docs.map_batches(gaps, batch_format="pyarrow", batch_size=1024)
        .groupby("gap_len")
        .aggregate(Sum("partial", alias_name="n"))
    )


def incremental_window_dedup(
    sf_dir: str,
    minlen: int = 24,
    every: int = 19,
    broadcast_limit: int = 20_000_000,
):
    """Cross-snapshot SUBSTRING dedup — the third granularity of the
    incremental family (exact = webclean.incremental_dedup, near =
    incremental_near_dedup, substring = here), ORACLE-CHECKED: history
    docs (doc_id % every == 0) are immutable; for every NEW-snapshot
    doc, a window is a remove pointer iff it occurs anywhere in history
    OR at an earlier (doc_id, pos) within the snapshot. Pointers
    coalesce with the reference gap rule and the row is (doc_id,
    n_dup_windows, removed_bytes) per new doc. Implemented as
    keep-first under a HISTORY-PRIORITY total order: docs are re-keyed
    to (is_snapshot << 30) | doc_id before the shared
    _window_keepfirst_ctx passes, so history occurrences always hold
    the first key — the whole window machinery (hot prefilter,
    first-key map, above-limit pointer path) is reused unchanged.
    doc_id must be < 2^30: the snapshot bit sits at bit 30 so the
    re-keyed id stays inside the ctx's < 2^31 oracle-parity domain
    (the SQL key stays in BIGINT)."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def rekey(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.shape[0] and (ids.min() < 0 or ids.max() >= 1 << 30):
            raise ValueError(
                "incremental_window_dedup requires 0 <= doc_id < 2^30 "
                "(bit 30 carries the snapshot flag)"
            )
        snap = (ids % every != 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array((snap << 30) | ids, pa.int64()),
                "text": batch["text"],
            }
        )
    rdocs, _batch_windows, map_ref, ptrs = _window_keepfirst_ctx(
        docs.map_batches(rekey, batch_format="pyarrow", batch_size=4096),
        minlen,
        broadcast_limit=broadcast_limit,
    )

    _SNAP = np.int64(1) << np.int64(30)

    def _unmap_filter(tab: pa.Table) -> pa.Table:
        """Keep snapshot rows, restore original doc_ids."""
        ids = tab["doc_id"].to_numpy(zero_copy_only=False)
        snap = (ids & _SNAP) != 0
        out = tab.filter(pa.array(snap))
        ids2 = out["doc_id"].to_numpy(zero_copy_only=False) & ~_SNAP
        return out.set_column(
            out.column_names.index("doc_id"), "doc_id",
            pa.array(ids2, pa.int64()),
        )

    if map_ref is None and ptrs is None:  # no duplicated windows anywhere

        def zeros(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return _unmap_filter(
                pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "n_dup_windows": pa.array(np.zeros(n, np.int64), pa.int64()),
                        "removed_bytes": pa.array(np.zeros(n, np.int64), pa.int64()),
                    }
                )
            )

        return rdocs.map_batches(zeros, batch_format="pyarrow")

    if ptrs is not None:
        # bucketed above-limit path — window_dedup_report's marker/ptr
        # doc-bucket aggregation, then unmap+filter to snapshot docs
        def doc_marker(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = ids.shape[0]
            return pa.table(
                {
                    "dbucket": pa.array(ids % 64, pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
                    "kept": pa.array(np.full(n, 2, np.uint8), pa.uint8()),
                }
            )

        def combine(group: pa.Table) -> pa.Table:
            doc = group["doc_id"].to_numpy(zero_copy_only=False)
            pos = group["pos"].to_numpy(zero_copy_only=False)
            kept = group["kept"].to_numpy(zero_copy_only=False)
            mids = np.sort(doc[kept == 2])
            n = mids.shape[0]
            rm = kept == 0
            d, rp = doc[rm], pos[rm]
            order = np.lexsort((rp, d))
            d, rp = d[order], rp[order]
            idx = np.searchsorted(mids, d)
            nw = np.bincount(idx, minlength=n).astype(np.int64)
            rb = np.zeros(n, np.int64)
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                seg = rp[en - 1] - rp[st] + minlen
                rb = np.bincount(idx[st], weights=seg, minlength=n).astype(
                    np.int64
                )
            return _unmap_filter(
                pa.table(
                    {
                        "doc_id": pa.array(mids, pa.int64()),
                        "n_dup_windows": pa.array(nw, pa.int64()),
                        "removed_bytes": pa.array(rb, pa.int64()),
                    }
                )
            )

        return (
            rdocs.map_batches(doc_marker, batch_format="pyarrow", batch_size=4096)
            .union(ptrs)
            .groupby("dbucket")
            .map_groups(combine, batch_format="pyarrow")
        )

    def report(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        HS, KMIN = get_broadcast(map_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        nb = len(batch)
        nw = np.zeros(nb, np.int64)
        rb = np.zeros(nb, np.int64)
        if h.shape[0]:
            p = np.searchsorted(HS, h)
            pc_ = np.minimum(p, HS.shape[0] - 1)
            hit = valid & (p < HS.shape[0]) & (HS[pc_] == h)
            key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
                np.uint64
            )
            rm = hit & (key != KMIN[pc_])
            d, rp = wdoc[rm], ip[rm]
            nw = np.bincount(d, minlength=nb).astype(np.int64)
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                seg = rp[en - 1] - rp[st] + minlen
                rb = np.bincount(d[st], weights=seg, minlength=nb).astype(np.int64)
        return _unmap_filter(
            pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_dup_windows": pa.array(nw, pa.int64()),
                    "removed_bytes": pa.array(rb, pa.int64()),
                }
            )
        )

    return rdocs.map_batches(report, batch_format="pyarrow", batch_size=1024)


# max kept bytes per output string chunk: int32 Arrow offsets. Tests
# patch this down to exercise the chunked path without 2 GB fixtures.
_STR_CHUNK_BYTES = 2**31 - 1


def _excise_islands(
    ids: np.ndarray,
    text_col,
    isl_row: np.ndarray,
    isl_s: np.ndarray,
    isl_e: np.ndarray,
) -> pa.Table:
    """Shared excision kernel of window_dedup_apply: UTF-8-clip the
    per-doc remove islands (reference write_back_to_jsonl_sharded.py:
    75-83 — advance s / retreat e over continuation bytes, e == doc len
    exempt) and rebuild each doc's text from the kept slices
    (reference :85-94), fully vectorized over the batch byte buffer.
    ``isl_row`` indexes rows of the given (ids, text_col) table;
    ``isl_s``/``isl_e`` are doc-relative byte offsets. int32 string
    offsets bound one output CHUNK to < 2 GB; above that (the bucketed
    apply path hands ~1/64 of the whole corpus to one call) the output
    column is emitted as a ChunkedArray split at doc boundaries so each
    chunk's rebased offsets fit int32 — same ``pa.string()`` type, no
    silent wraparound."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    data, offsets = string_column_bytes(text_col)
    n = ids.shape[0]
    doc_start, doc_end = offsets[:-1], offsets[1:]
    abs_s = isl_s + doc_start[isl_row]
    abs_e = isl_e + doc_start[isl_row]
    dend = doc_end[isl_row]
    if data.shape[0] and abs_s.shape[0]:
        guard = data.shape[0] - 1
        for _ in range(3):  # UTF-8 has <= 3 continuation bytes
            m = (abs_s < dend) & (
                (data[np.minimum(abs_s, guard)] & 0xC0) == 0x80
            )
            abs_s = abs_s + m
        for _ in range(3):
            m = (abs_e != dend) & (
                (data[np.minimum(abs_e, guard)] & 0xC0) == 0x80
            )
            abs_e = abs_e - m
    delta = np.zeros(data.shape[0] + 1, np.int64)
    np.add.at(delta, abs_s, 1)
    np.add.at(delta, abs_e, -1)
    kept = np.cumsum(delta[:-1]) <= 0
    out = data[kept]
    kc = np.concatenate(([0], np.cumsum(kept)))
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(kc[doc_end] - kc[doc_start], out=new_off[1:])
    if new_off[-1] <= _STR_CHUNK_BYTES:
        dedup_text = pa.Array.from_buffers(
            pa.string(),
            n,
            [None, pa.py_buffer(new_off.astype(np.int32)), pa.py_buffer(out)],
        )
    else:
        # rebase offsets per chunk of whole docs; a single doc always
        # fits (its input string already had int32 offsets)
        chunks, start = [], 0
        while start < n:
            base = new_off[start]
            end = int(
                np.searchsorted(new_off, base + _STR_CHUNK_BYTES, side="right")
            ) - 1
            end = min(max(end, start + 1), n)
            seg_off = (new_off[start : end + 1] - base).astype(np.int32)
            chunks.append(
                pa.Array.from_buffers(
                    pa.string(),
                    end - start,
                    [
                        None,
                        pa.py_buffer(seg_off),
                        pa.py_buffer(np.ascontiguousarray(out[base:new_off[end]])),
                    ],
                )
            )
            start = end
        dedup_text = pa.chunked_array(chunks, pa.string())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_removed_ranges": pa.array(
                np.bincount(isl_row, minlength=n).astype(np.int64), pa.int64()
            ),
            "removed_bytes": pa.array(
                np.bincount(
                    isl_row, weights=(abs_e - abs_s), minlength=n
                ).astype(np.int64),
                pa.int64(),
            ),
            "dedup_text": dedup_text,
        }
    )


def window_dedup_apply(
    sf_dir: str, minlen: int = 24, broadcast_limit: int = 20_000_000
):
    """The flagship's END PRODUCT under the doc-internal window
    semantics, ORACLE-CHECKED by value down to the rebuilt strings:
    keep-first window dedup (window_dedup_report's formulation) APPLIED
    — every non-first duplicated window's islands are UTF-8-clipped and
    excised, and the row is (doc_id, n_removed_ranges, removed_bytes,
    dedup_text). This closes the loop the reference closes with
    write_back_to_jsonl_sharded.py (M4 excision + M3 clip), restricted
    to doc-internal windows so DuckDB can rebuild the identical strings
    (hex-slice string_agg + decode). minlen=24 for the same
    non-vacuity reason as window_kept_gaps.

    Scale shape: _window_keepfirst_ctx's two streaming passes, then one
    pass that re-probes the broadcast first-key map and excises in
    place; above ``broadcast_limit`` the ctx's distributed pointer rows
    join the doc texts through ONE bucketed shuffle (the dupset_join
    shape — text never lands on the driver)."""
    docs, _batch_windows, map_ref, ptrs = _window_keepfirst_ctx(
        _docs(sf_dir, columns=["doc_id", "text"]), minlen,
        broadcast_limit=broadcast_limit,
    )

    z = np.empty(0, np.int64)
    if map_ref is None and ptrs is None:  # nothing duplicated anywhere

        def passthrough(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _excise_islands(ids, batch["text"], z, z, z)

        return docs.map_batches(passthrough, batch_format="pyarrow")

    if ptrs is not None:
        # bucketed above-limit path: one shared-schema union (text rows
        # side=0, pointer rows side=1) -> doc-bucket groupby -> excise
        def text_rows(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = ids.shape[0]
            return pa.table(
                {
                    "dbucket": pa.array(ids % 64, pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                    "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
                    "kept": pa.array(np.full(n, 2, np.uint8), pa.uint8()),
                    "text": batch["text"],
                }
            )

        def ptr_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "dbucket": batch["dbucket"],
                    "doc_id": batch["doc_id"],
                    "side": pa.array(np.ones(n, np.uint8), pa.uint8()),
                    "pos": batch["pos"],
                    "kept": batch["kept"],
                    "text": pa.array([""] * n, pa.string()),
                }
            )

        def apply_group(group: pa.Table) -> pa.Table:
            side = group["side"].to_numpy(zero_copy_only=False)
            t = group.filter(pa.array(side == 0))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            order_t = np.argsort(ids, kind="stable")
            t = t.take(pa.array(order_t, pa.int64()))
            ids = ids[order_t]
            kept_f = group["kept"].to_numpy(zero_copy_only=False)
            rm = (side == 1) & (kept_f == 0)
            d = group["doc_id"].to_numpy(zero_copy_only=False)[rm]
            rp = group["pos"].to_numpy(zero_copy_only=False)[rm]
            order = np.lexsort((rp, d))
            d, rp = d[order], rp[order]
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                isl_row = np.searchsorted(ids, d[st])
                return _excise_islands(
                    ids, t["text"], isl_row, rp[st], rp[en - 1] + minlen
                )
            return _excise_islands(ids, t["text"], z, z, z)

        return (
            docs.map_batches(text_rows, batch_format="pyarrow", batch_size=1024)
            .union(ptrs.map_batches(ptr_rows, batch_format="pyarrow"))
            .groupby("dbucket")
            .map_groups(apply_group, batch_format="pyarrow")
        )

    def apply_batch(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        HS, KMIN = get_broadcast(map_ref)
        h, wdoc, ip, valid, ids = _batch_windows(batch)
        if h.shape[0] == 0:
            return _excise_islands(ids.astype(np.int64), batch["text"], z, z, z)
        p = np.searchsorted(HS, h)
        pc_ = np.minimum(p, HS.shape[0] - 1)
        hit = valid & (p < HS.shape[0]) & (HS[pc_] == h)
        key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
            np.uint64
        )
        rm = hit & (key != KMIN[pc_])
        d, rp = wdoc[rm], ip[rm]  # pos-ascending => sorted per doc
        if rp.shape[0]:
            st = np.flatnonzero(
                np.concatenate(
                    ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                )
            )
            en = np.concatenate((st[1:], [rp.shape[0]]))
            return _excise_islands(
                ids.astype(np.int64), batch["text"], d[st], rp[st],
                rp[en - 1] + minlen,
            )
        return _excise_islands(ids.astype(np.int64), batch["text"], z, z, z)

    return docs.map_batches(apply_batch, batch_format="pyarrow", batch_size=1024)


def dedup_then_pack(
    sf_dir: str, minlen: int = 24, capacity: int = 256
):
    """The prepare-training-shards JOURNEY, value-checked end to end:
    window_dedup_apply's excised texts flow straight into token-budget
    sequence packing (webclean.pack_docs_ds) — per doc (doc_id,
    n_tokens, pack_id, pack_off) computed over the DEDUPED text. The
    oracle chains the apply SQL (hex-rebuilt strings) into the pack
    prefix-sum SQL, so any drift in either stage or in their
    composition flips the hash. Scale shape = the two stages' own
    documented shapes composed; the intermediate never materializes on
    the driver."""
    from hg_dedup_ray.pipelines.webclean import pack_docs_ds

    applied = window_dedup_apply(sf_dir, minlen=minlen)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "text": b["dedup_text"]})

    return pack_docs_ds(
        applied.map_batches(rename, batch_format="pyarrow"), capacity
    )


def dedup_tier_cascade(
    sf_dir: str,
    words_per_seg: int = 16,
    minlen: int = 64,
    broadcast_limit: int = 20_000_000,
):
    """The TIERED dedup survival report: run the three dedup
    granularities of a web-corpus curation pipeline in sequence — exact
    doc dedup (keep min doc_id per identical text), then segment-level
    keep-first dedup (CCNet/RefinedWeb line dedup) over the exact
    survivors, then doc-internal keep-first WINDOW dedup (the flagship's
    substring semantics, window_dedup_report's formulation) over the
    segment-cleaned texts — and report docs/bytes surviving after each
    tier. Rows: (tier_no, tier, n_docs, n_bytes); ORACLE-CHECKED end to
    end (the SQL chains the exact_dedup, segment_dedup_apply and
    window_dedup_report oracle blocks over the same intermediate texts).

    Scale shape = composition of the three tiers' own documented shapes
    (each already individually oracle-checked); the only additions are
    per-batch (count, byte-sum) partials — one tiny row per block — and
    two corpus-sized intermediates (exact survivors, cleaned texts) that
    are materialized into the object store because the next tier streams
    them multiple times, exactly like the flagship's partition corpora.
    ``n_bytes`` counts characters (oracle ``length()``) while window
    removal counts bytes — a mixed accounting the oracle mirrors exactly,
    so the engines agree on any input (non-ASCII parity pinned in
    tests/test_nonascii_oracles.py)."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    docs = _docs_sized(sf_dir, columns=["doc_id", "text"])

    def _utf8len(batch: pa.Table) -> np.ndarray:
        return (
            pc.utf8_length(batch["text"])
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    def _sum_rows(ds, fn) -> tuple[int, int]:
        parts = ds.map_batches(fn, batch_format="pyarrow").take_all()
        return (
            int(sum(r["d"] for r in parts)),
            int(sum(r["b"] for r in parts)),
        )

    def count_all(batch: pa.Table) -> pa.Table:
        lens = _utf8len(batch)
        return pa.table(
            {
                "d": pa.array([len(batch)], pa.int64()),
                "b": pa.array([int(lens.sum())], pa.int64()),
            }
        )

    def count_nonempty(batch: pa.Table) -> pa.Table:
        lens = _utf8len(batch)
        return pa.table(
            {
                "d": pa.array([int((lens > 0).sum())], pa.int64()),
                "b": pa.array([int(lens.sum())], pa.int64()),
            }
        )

    # tier 0: the input corpus
    t0d, t0b = _sum_rows(docs, count_all)

    # tier 1: exact keep-first survivors
    keep_ids = _exact_keeper_ids(docs)
    surv = docs.map_batches(
        _filter_by_ids(ray.put(keep_ids)), batch_format="pyarrow"
    ).materialize()
    t1d = int(keep_ids.shape[0])
    _, t1b = _sum_rows(surv, count_all)

    # tier 2: segment keep-first dedup over the survivors
    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "text": batch["text_deduped"]}
        )

    cleaned = (
        _segment_dedup_apply_ds(surv, words_per_seg)
        .map_batches(rename, batch_format="pyarrow")
        .materialize()
    )
    t2d, t2b = _sum_rows(cleaned, count_nonempty)

    # tier 3: doc-internal keep-first window dedup over the cleaned texts
    cdocs, bw, map_ref, ptrs = _window_keepfirst_ctx(
        cleaned, minlen, broadcast_limit=broadcast_limit
    )
    if map_ref is None and ptrs is None:
        t3d, t3b = t2d, t2b
    elif ptrs is not None:
        # bucketed above-limit path: marker rows carry each doc's char
        # length in the pos field; per doc bucket, fold remove pointers
        # into islands and emit one (docs-surviving, bytes-remaining)
        # partial row — only 64 tiny rows reach the driver
        def len_marker(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            lens = _utf8len(batch)
            return pa.table(
                {
                    "dbucket": pa.array(ids % 64, pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "pos": pa.array(lens, pa.int64()),
                    "kept": pa.array(np.full(ids.shape[0], 2, np.uint8), pa.uint8()),
                }
            )

        def rem_partial(group: pa.Table) -> pa.Table:
            doc = group["doc_id"].to_numpy(zero_copy_only=False)
            pos = group["pos"].to_numpy(zero_copy_only=False)
            kept = group["kept"].to_numpy(zero_copy_only=False)
            marker = kept == 2
            order_m = np.argsort(doc[marker], kind="stable")
            mids = doc[marker][order_m]
            lens = pos[marker][order_m]
            rm = kept == 0
            d, rp = doc[rm], pos[rm]
            order = np.lexsort((rp, d))
            d, rp = d[order], rp[order]
            rb = np.zeros(mids.shape[0], np.int64)
            if rp.shape[0]:
                st = np.flatnonzero(
                    np.concatenate(
                        ([True], (d[1:] != d[:-1]) | (rp[1:] - rp[:-1] > minlen))
                    )
                )
                en = np.concatenate((st[1:], [rp.shape[0]]))
                seg = rp[en - 1] - rp[st] + minlen
                rb = np.bincount(
                    np.searchsorted(mids, d[st]), weights=seg,
                    minlength=mids.shape[0],
                ).astype(np.int64)
            rem = lens - rb
            return pa.table(
                {
                    "d": pa.array([int((rem > 0).sum())], pa.int64()),
                    "b": pa.array([int(rem.sum())], pa.int64()),
                }
            )

        parts3 = (
            cdocs.map_batches(len_marker, batch_format="pyarrow", batch_size=4096)
            .union(ptrs)
            .groupby("dbucket")
            .map_groups(rem_partial, batch_format="pyarrow")
            .take_all()
        )
        t3d = int(sum(r["d"] for r in parts3))
        t3b = int(sum(r["b"] for r in parts3))
    else:

        def remaining(batch: pa.Table) -> pa.Table:
            HS, KMIN = get_broadcast(map_ref)
            h, wdoc, ip, valid, ids = bw(batch)
            nb = len(batch)
            rb = np.zeros(nb, np.int64)
            if h.shape[0]:
                p = np.searchsorted(HS, h)
                pcl = np.minimum(p, HS.shape[0] - 1)
                hit = valid & (p < HS.shape[0]) & (HS[pcl] == h)
                key = (ids[wdoc].astype(np.uint64) << np.uint64(32)) | ip.astype(
                    np.uint64
                )
                rm = hit & (key != KMIN[pcl])
                d_, rp = wdoc[rm], ip[rm]  # pos-ascending => sorted per doc
                if rp.shape[0]:
                    st = np.flatnonzero(
                        np.concatenate(
                            (
                                [True],
                                (d_[1:] != d_[:-1]) | (rp[1:] - rp[:-1] > minlen),
                            )
                        )
                    )
                    en = np.concatenate((st[1:], [rp.shape[0]]))
                    seg = rp[en - 1] - rp[st] + minlen
                    rb = np.bincount(d_[st], weights=seg, minlength=nb).astype(
                        np.int64
                    )
            rem = _utf8len(batch) - rb
            return pa.table(
                {
                    "d": pa.array([int((rem > 0).sum())], pa.int64()),
                    "b": pa.array([int(rem.sum())], pa.int64()),
                }
            )

        t3d, t3b = _sum_rows(cdocs, remaining)

    return pa.table(
        {
            "tier_no": pa.array([0, 1, 2, 3], pa.int64()),
            "tier": pa.array(["input", "exact", "segment", "window"], pa.string()),
            "n_docs": pa.array([t0d, t1d, t2d, t3d], pa.int64()),
            "n_bytes": pa.array([t0b, t1b, t2b, t3b], pa.int64()),
        }
    )


def dup_doc_report(sf_dir: str, minlen: int = 64):
    """Diagnostic D5/D6 (reference find_dup_ptrs/find_dup_docs,
    cpp_engine_dedup.h:801-867): per doc containing duplicate-run
    members, the count of kept vs dropped pointers (rows-only)."""
    from hg_dedup_ray.pipelines.sa_dedup import extract_docs
    from hg_dedup_ray.stages.sa_scan import texts_to_corpus
    from hg_dedup_ray.functions.scan import dup_ptrs_to_docs, find_dup_ptrs_hashed

    cfg = DedupConfig(
        minlen=minlen, num_partitions=4,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    docs = extract_docs(_docs(sf_dir, columns=["doc_id", "text"]), cfg)

    def part_report(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_seq")
        corpus, starts, ends = texts_to_corpus(group["text"])
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_kept_ptrs": pa.array([], pa.int64()),
                "n_dropped_ptrs": pa.array([], pa.int64()),
            }
        )
        if corpus.shape[0] == 0:
            return empty
        ptrs, kept = find_dup_ptrs_hashed(corpus, minlen)
        d_ix, n_kept, n_drop = dup_ptrs_to_docs(ptrs, kept, starts, ends)
        if d_ix.size == 0:
            return empty
        ids = group["doc_seq"].to_numpy(zero_copy_only=False)[d_ix]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_kept_ptrs": pa.array(n_kept, pa.int64()),
                "n_dropped_ptrs": pa.array(n_drop, pa.int64()),
            }
        )

    return docs.groupby("part").map_groups(part_report, batch_format="pyarrow")


def jsonl_roundtrip_dedup(sf_dir: str):
    """Reference user journey (S1/S2/S4 + annotate): documents exported
    as a JSONL tree, deduped via the jsonl workflow, read back — returns
    (doc_seq, n_ranges, cluster_id) per doc (rows-only)."""
    import json as _json
    import shutil
    import tempfile

    from hg_dedup_ray.pipelines.jsonl_workflow import run_jsonl_dedup

    work = tempfile.mkdtemp(prefix="hgdr_jsonl_")
    try:
        src = f"{work}/src"
        import os as _os

        _os.makedirs(src, exist_ok=True)
        n_files = 4
        # stream batches into the n_files handles — no full-table pandas
        handles = [open(f"{src}/part{f}.jsonl", "w") for f in range(n_files)]
        try:
            for b in _docs(sf_dir, columns=["doc_id", "text", "lang"]).iter_batches(
                batch_size=4096, batch_format="pyarrow"
            ):
                dids = b["doc_id"].to_numpy(zero_copy_only=False)
                texts = b["text"].to_pylist()
                langs = b["lang"].to_pylist()
                for did, text, lang in zip(dids, texts, langs):
                    handles[int(did) % n_files].write(
                        _json.dumps(
                            {"text": text, "doc_id": int(did), "lang": lang}
                        ) + "\n"
                    )
        finally:
            for fh in handles:
                fh.close()
        out = f"{work}/out"
        run_jsonl_dedup(src, out, minlen=64, num_partitions=4)
        rows = []
        for f in range(n_files):
            if not _os.path.exists(f"{out}/part{f}.jsonl"):
                continue  # empty source shard: the sink mirrors nothing
            with open(f"{out}/part{f}.jsonl") as fh:
                for line in fh:
                    obj = _json.loads(line)
                    rows.append(
                        {
                            "doc_id": int(obj["doc_id"]),
                            "n_ranges": len(obj.get("sa_remove_ranges", [])),
                            "cluster_id": int(obj["cluster_id"]),
                        }
                    )
        rows.sort(key=lambda r: r["doc_id"])
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "n_ranges": pa.array([r["n_ranges"] for r in rows], pa.int64()),
                "cluster_id": pa.array([r["cluster_id"] for r in rows], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------- relational breadth ops
def _events(sf_dir: str, columns=None):
    from hg_dedup_ray.functions.readers import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=columns)


def event_sessions(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 32):
    """Sessionization — the windowed-aggregate shape Ray Data lacks as a
    builtin: per user, events sorted by time split into sessions at
    >gap_minutes silences.

    Scale shape (same bucketed composition as asof_join_events_orders):
    users hash into ``num_buckets`` groups — ONE shuffle of (bucket, uid,
    ts, event_id) rows, group count fixed at num_buckets regardless of
    user count — then each bucket runs one lexsort(user, ts, event_id) +
    np.diff + bincount segment reduction. No per-user Python call
    (the per-mostly-singleton-key map_groups anti-pattern)."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((uid % num_buckets).astype(np.int64)),
                "user_id": pa.array(uid.astype(np.int64)),
                "ts_us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"],
            }
        )

    def bucket_sessions(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        if uid.shape[0] == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        sess_start = new_user | np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        run_id = np.cumsum(new_user) - 1
        return pa.table(
            {
                "user_id": pa.array(uid[new_user], pa.int64()),
                "n_events": pa.array(np.bincount(run_id), pa.int64()),
                "n_sessions": pa.array(
                    np.bincount(run_id, weights=sess_start).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        _events(sf_dir, columns=["event_id", "ts", "user_id"])
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=8192)
        .groupby("bucket")
        .map_groups(bucket_sessions, batch_format="pyarrow")
    )


def event_type_stats(sf_dir: str):
    """Multi-aggregate groupby over events (count / sum / mean). Float
    aggregates rounded to 6 dp on both sides: distributed summation
    order differs from DuckDB's in the low bits."""
    from ray.data.aggregate import Count, Mean, Sum

    agg = (
        _events(sf_dir, columns=["event_type", "value"])
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="avg_value"),
        )
    )

    def round6(batch: pa.Table) -> pa.Table:
        for c in ("sum_value", "avg_value"):
            batch = batch.set_column(
                batch.column_names.index(c),
                c,
                pc.round(batch[c], ndigits=6),
            )
        return batch

    return agg.map_batches(round6, batch_format="pyarrow")


def top_docs_by_chars(sf_dir: str, k: int = 10):
    """Global sort + limit (top-k docs by n_chars, doc_id tiebreak)."""
    return (
        _docs_sized(sf_dir, columns=["doc_id", "n_chars"])
        .sort(key=["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
    )


# GPT-2-style pretokenizer pattern, restricted to RE2 syntax (no
# lookahead) so Arrow and DuckDB count identically
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_counts(sf_dir: str):
    """BPE-ish pretokenization counts per doc (brief: 'token counting —
    whitespace + a BPE-ish regex'); the whitespace variant is
    token_counts."""

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pc.count_substring_regex(
                    batch["text"], BPE_PATTERN
                ).cast(pa.int64()),
            }
        )

    return _docs_sized(sf_dir, columns=["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow", batch_size=4096
    )


def tokenizer_fertility(sf_dir: str):
    """Tokenizer QA per language: (lang, n_docs, sum_bpe_tokens,
    sum_words, sum_chars) — the integer numerators/denominators behind
    fertility (BPE tokens per word) and compression (chars per token),
    the table a multilingual pipeline publishes before fixing a token
    budget per language. All-integer so the distributed sums hash
    exactly; word count uses the \\S+ run count (== the oracles'
    regexp_split_to_array on trimmed text, phantom-''-free by
    construction). Per-batch per-lang partials, one tiny groupby Sum."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        nbpe = pc.count_substring_regex(
            batch["text"], BPE_PATTERN
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        nw = pc.count_substring_regex(batch["text"], r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nc = pc.utf8_length(batch["text"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        langs, inv = np.unique(
            batch["lang"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        k = langs.shape[0]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "p_docs": pa.array(np.bincount(inv, minlength=k), pa.int64()),
                "p_bpe": pa.array(
                    np.bincount(inv, weights=nbpe, minlength=k).astype(np.int64),
                    pa.int64(),
                ),
                "p_words": pa.array(
                    np.bincount(inv, weights=nw, minlength=k).astype(np.int64),
                    pa.int64(),
                ),
                "p_chars": pa.array(
                    np.bincount(inv, weights=nc, minlength=k).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        _docs_sized(sf_dir, columns=["text", "lang"])
        .map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby("lang")
        .aggregate(
            Sum("p_docs", alias_name="n_docs"),
            Sum("p_bpe", alias_name="sum_bpe_tokens"),
            Sum("p_words", alias_name="sum_words"),
            Sum("p_chars", alias_name="sum_chars"),
        )
    )


def asof_join_events_orders(sf_dir: str, num_buckets: int = 32):
    """AS-OF JOIN — an operator Ray Data lacks, built as the scalable
    bucketed merge-join composition: for every event, the latest order of
    the same user with o_orderdate <= event ts (ties broken by max
    o_orderkey, so the result is deterministic — plain DuckDB ASOF picks
    an arbitrary row among date ties).

    Scale shape: BOTH sides hash-partition on the join key (user id) into
    ``num_buckets`` via one groupby shuffle carrying only the join/value
    columns; inside each bucket the probe is fully vectorized — orders
    sorted once by (custkey, date, orderkey), events mapped through a
    composite (custkey, date-rank) key, and ONE np.searchsorted resolves
    every event's as-of row. No driver-side data, no per-row Python."""
    ev = _events(sf_dir, columns=["event_id", "ts", "user_id"])
    od = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def ev_side(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((uid % num_buckets).astype(np.int64)),
                "side": pa.array(np.zeros(len(b), np.uint8)),
                "key": pa.array(uid.astype(np.int64)),
                "ts_us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"],
                "o_orderkey": pa.nulls(len(b), pa.int64()),
                "o_totalprice": pa.nulls(len(b), pa.float64()),
            }
        )

    def od_side(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((ck % num_buckets).astype(np.int64)),
                "side": pa.array(np.ones(len(b), np.uint8)),
                "key": pa.array(ck.astype(np.int64)),
                "ts_us": b["o_orderdate"].cast(pa.int64()),
                "event_id": pa.nulls(len(b), pa.int64()),
                "o_orderkey": b["o_orderkey"],
                "o_totalprice": b["o_totalprice"],
            }
        )

    def bucket_asof(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "last_order_key": pa.array([], pa.int64()),
                "last_order_date": pa.array([], pa.timestamp("us")),
                "last_order_price": pa.array([], pa.float64()),
            }
        )
        evs = group.filter(pa.array(side == 0))
        ods = group.filter(pa.array(side == 1))
        if len(evs) == 0 or len(ods) == 0:
            return empty
        ock = ods["key"].to_numpy(zero_copy_only=False)
        odate = ods["ts_us"].to_numpy(zero_copy_only=False)
        okey = ods["o_orderkey"].to_numpy(zero_copy_only=False)
        oprice = ods["o_totalprice"].to_numpy(zero_copy_only=False)
        o_order = np.lexsort((okey, odate, ock))
        ock, odate, okey, oprice = (
            ock[o_order], odate[o_order], okey[o_order], oprice[o_order]
        )
        uid = evs["key"].to_numpy(zero_copy_only=False)
        ets = evs["ts_us"].to_numpy(zero_copy_only=False)
        eid = evs["event_id"].to_numpy(zero_copy_only=False)
        # composite (key, date-rank) so one global searchsorted resolves
        # the per-user as-of position; 'right' on (date <= ts) lands after
        # every qualifying order, and the (date, orderkey) sort makes
        # idx-1 the deterministic winner
        udates = np.unique(odate)
        R = np.int64(udates.shape[0] + 2)
        comp_o = ock * R + (np.searchsorted(udates, odate) + 1)
        e_rank = np.searchsorted(udates, ets, side="right")  # rank of last date <= ts
        comp_e = uid * R + e_rank
        idx = np.searchsorted(comp_o, comp_e, side="right") - 1
        ok = (idx >= 0) & (ock[np.maximum(idx, 0)] == uid)
        idx, eid_k, uid_k = idx[ok], eid[ok], uid[ok]
        return pa.table(
            {
                "event_id": pa.array(eid_k, pa.int64()),
                "user_id": pa.array(uid_k, pa.int64()),
                "last_order_key": pa.array(okey[idx], pa.int64()),
                "last_order_date": pa.array(odate[idx]).cast(pa.timestamp("us")),
                "last_order_price": pa.array(oprice[idx], pa.float64()),
            }
        )

    both = ev.map_batches(ev_side, batch_format="pyarrow", batch_size=8192).union(
        od.map_batches(od_side, batch_format="pyarrow", batch_size=8192)
    )
    return both.groupby("bucket").map_groups(bucket_asof, batch_format="pyarrow")


def range_join_orders_prior_year(sf_dir: str, num_buckets: int = 32):
    """RANGE (band) JOIN — per order, the count and price sum of the SAME
    customer's strictly-earlier orders within the prior 365 days. The
    inequality-band join Ray Data lacks, as a bucketed composition:
    hash-partition on the join key, sort each bucket once by
    (custkey, date), then TWO vectorized searchsorteds (band lower/upper
    bound) + a prefix-sum gather answer every row — no per-row Python,
    no driver data."""
    DAY_US = 86_400_000_000
    od = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((ck % num_buckets).astype(np.int64)),
                "o_orderkey": b["o_orderkey"],
                "ck": pa.array(ck.astype(np.int64)),
                "date_us": b["o_orderdate"].cast(pa.int64()),
                "price": b["o_totalprice"],
            }
        )

    def bucket_range_join(group: pa.Table) -> pa.Table:
        ck = group["ck"].to_numpy(zero_copy_only=False)
        date = group["date_us"].to_numpy(zero_copy_only=False)
        okey = group["o_orderkey"].to_numpy(zero_copy_only=False)
        price = group["price"].to_numpy(zero_copy_only=False)
        order = np.lexsort((date, ck))
        ck_s, date_s, price_s = ck[order], date[order], price[order]
        # exact integer-cents prefix sums (distributed float sums would
        # diverge from the oracle in the 6th decimal)
        cents = np.round(price_s * 100).astype(np.int64)
        pre = np.concatenate(([0], np.cumsum(cents)))
        udates = np.unique(date_s)
        R = np.int64(udates.shape[0] + 2)
        comp = ck_s * R + (np.searchsorted(udates, date_s) + 1)
        # band [date-365d, date) per row, same customer
        lo_rank = np.searchsorted(udates, date_s - 365 * DAY_US, side="left") + 1
        hi_rank = np.searchsorted(udates, date_s)  # rank of dates < date (+1 -1)
        lo = np.searchsorted(comp, ck_s * R + lo_rank, side="left")
        hi = np.searchsorted(comp, ck_s * R + hi_rank + 1, side="left")
        n_prior = (hi - lo).astype(np.int64)
        sum_prior = (pre[hi] - pre[lo]).astype(np.float64) / 100.0
        return pa.table(
            {
                "o_orderkey": pa.array(okey[order], pa.int64()),
                "n_prior_year": pa.array(n_prior, pa.int64()),
                "sum_prior_year": pa.array(np.round(sum_prior, 6), pa.float64()),
            }
        )

    return (
        od.map_batches(add_bucket, batch_format="pyarrow", batch_size=8192)
        .groupby("bucket")
        .map_groups(bucket_range_join, batch_format="pyarrow")
    )


def events_hourly(sf_dir: str, num_buckets: int = 64):
    """Tumbling-window aggregate: per (user, hour) event count + value
    sum.

    The (user, hour) key space grows with the data (~1 group per user per
    active hour — 95k at sf0.1), so the native groupby.aggregate pays
    Ray's per-group cost and dominated this query 7:1. Scale shape
    instead: per-batch vectorized pre-reduce (lexsort + reduceat) emits
    one partial row per in-batch group, keyed by a COARSE hash bucket;
    the shuffle then has num_buckets groups regardless of user count and
    each bucket combines its partials with one more lexsort + segment
    sum. Values accumulate in integer centi-units (the fixture's values
    have 2 decimals) so the distributed reduction order cannot perturb
    the rounded float64 result."""

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((hour, uid))
        uid, hour, cents = uid[order], hour[order], cents[order]
        bnd = np.flatnonzero(
            np.concatenate(([True], (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])))
        )
        n = np.diff(np.concatenate((bnd, [uid.shape[0]])))
        s = np.add.reduceat(cents, bnd)
        u, h = uid[bnd], hour[bnd]
        return pa.table(
            {
                "cbucket": pa.array((u * 31 + h) % num_buckets, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "hour_bucket": pa.array(h, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        hour = group["hour_bucket"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        c = group["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hour, uid))
        uid, hour, n, c = uid[order], hour[order], n[order], c[order]
        bnd = np.flatnonzero(
            np.concatenate(([True], (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])))
        )
        return pa.table(
            {
                "user_id": pa.array(uid[bnd], pa.int64()),
                "hour_bucket": pa.array(hour[bnd], pa.int64()),
                "n": pa.array(np.add.reduceat(n, bnd), pa.int64()),
                "sum_value": pa.array(
                    np.round(np.add.reduceat(c, bnd) / 100.0, 6), pa.float64()
                ),
            }
        )

    return (
        _events(sf_dir, columns=["ts", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("cbucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def orders_per_nation(
    sf_dir: str, broadcast_limit: int = 50_000_000, num_buckets: int = 64
):
    """Broadcast hash join (guide's small-side pattern), fully
    vectorized: customer's (sorted c_custkey -> nation index) arrays and
    the 25-row nation name array are ``ray.put`` once; each batch does a
    ``np.searchsorted`` gather (custkey -> row -> nationkey) then maps
    nationkey -> name via ``pc.take`` on the broadcast name array — no
    per-row Python, no shuffle join; the only shuffle is the final
    25-group aggregate. Price summed in exact integer cents (same
    distributed-float-order fix as pricing_summary).

    Scale note: nation is the true small side (fixed 25 rows) and always
    broadcasts; customer grows with sf, so above ``broadcast_limit``
    customers the custkey attach switches to a bucketed hash join
    (``key % num_buckets`` co-grouping — the
    relational._revenue_by_segment_bucketed shape) with the orders side
    pre-reduced per batch to (custkey, count, cents) partials, so the
    shuffle carries distinct-custkey rows and nothing
    customer-table-sized ever lands on the driver.
    """
    from ray.data.aggregate import Count, Sum

    n_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    if n_cust == 0:  # inner join on an empty dim side: empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "sum_price": pa.array([], pa.float64()),
                }
            )
        )
    if n_cust > broadcast_limit:
        return _orders_per_nation_bucketed(sf_dir, num_buckets)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nat = (
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        .to_pandas()
        .sort_values("n_nationkey", ignore_index=True)
    )
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    order = np.argsort(ckeys, kind="stable")
    ckeys_sorted = ckeys[order]
    cnation_sorted = cust["c_nationkey"].to_numpy(np.int64)[order]
    nkeys_sorted = nat["n_nationkey"].to_numpy(np.int64)
    names_arr = pa.array(nat["n_name"], pa.string())
    side_ref = ray.put((ckeys_sorted, cnation_sorted, nkeys_sorted, names_arr))

    def attach_nation(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ck, cn, nk, names = get_broadcast(side_ref)
        cust_keys = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.searchsorted(ck, cust_keys)
        rows_c = np.minimum(rows, ck.shape[0] - 1)
        # inner-join semantics: drop orders whose custkey has no
        # customer row (referential integrity holds on real TPC-H data;
        # degenerate fixtures must not crash or mis-bucket)
        ok = (rows < ck.shape[0]) & (ck[rows_c] == cust_keys)
        if not ok.all():
            batch = batch.filter(pa.array(ok))
            rows_c = rows_c[ok]
        nation_keys = cn[rows_c]
        # same inner-join semantics on the nation side: an empty nation
        # table or a dangling c_nationkey must drop the order (as the
        # oracle's inner join does), not crash or credit the last nation
        if nk.shape[0] == 0:
            okn = np.zeros(nation_keys.shape[0], bool)
            nation_rows = np.empty(0, np.int64)
        else:
            rows_n = np.searchsorted(nk, nation_keys)
            nation_rows = np.minimum(rows_n, nk.shape[0] - 1)
            okn = (rows_n < nk.shape[0]) & (nk[nation_rows] == nation_keys)
        if not okn.all():
            batch = batch.filter(pa.array(okn))
            nation_rows = nation_rows[okn] if nk.shape[0] else nation_rows
        price_c = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64()
        )
        return pa.table(
            {
                "n_name": pc.take(names, pa.array(nation_rows, pa.int64())),
                "price_c": price_c,
            }
        )

    agg = (
        read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(attach_nation, batch_format="pyarrow", batch_size=8192)
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_c", alias_name="sum_price_c"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "n_orders": batch["n_orders"],
                "sum_price": pc.divide(
                    pc.cast(batch["sum_price_c"], pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _orders_per_nation_bucketed(sf_dir: str, num_buckets: int = 64):
    """Above-limit path of orders_per_nation: customer streams into a
    custkey-bucket hash join instead of a driver broadcast. Only nation
    (fixed 25 rows) is ``ray.put``; orders pre-reduce per batch to
    (custkey, n, cents) so the shuffle carries distinct-custkey partial
    rows, and each bucket gathers nation indices with one searchsorted
    then emits <= 25 (nidx, p_n, p_cents) partials. Reference analog:
    write_back_to_jsonl_sharded.py:70-86 (shard the corpus-growing
    side, never collect it)."""
    from ray.data.aggregate import Sum

    from hg_dedup_ray.stages.broadcast import get_broadcast

    nat = (
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        .to_pandas()
        .sort_values("n_nationkey", ignore_index=True)
    )
    nkeys_sorted = nat["n_nationkey"].to_numpy(np.int64)
    names_arr = pa.array(nat["n_name"], pa.string())
    n_nat = nkeys_sorted.shape[0]
    nat_ref = ray.put(nkeys_sorted)

    def cust_rows(b: pa.Table) -> pa.Table:
        nk = get_broadcast(nat_ref)
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if nk.shape[0]:
            pos = np.searchsorted(nk, cn)
            pos_c = np.minimum(pos, nk.shape[0] - 1)
            ok = (pos < nk.shape[0]) & (nk[pos_c] == cn)
        else:  # inner join vs an empty nation table drops every customer
            ok = np.zeros(ck.shape[0], bool)
            pos_c = np.empty(0, np.int64)
        ck, nidx = ck[ok], pos_c[ok] if nk.shape[0] else pos_c
        n = ck.shape[0]
        return pa.table(
            {
                "cb": pa.array(ck % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(n, np.uint8), pa.uint8()),
                "key": pa.array(ck, pa.int64()),
                "nidx": pa.array(nidx, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keys, inv = np.unique(ck, return_inverse=True)
        n = np.bincount(inv, minlength=keys.shape[0]).astype(np.int64)
        csum = np.zeros(keys.shape[0], np.int64)
        np.add.at(csum, inv, cents)
        m = keys.shape[0]
        return pa.table(
            {
                "cb": pa.array(keys % num_buckets, pa.int64()),
                "side": pa.array(np.ones(m, np.uint8), pa.uint8()),
                "key": pa.array(keys, pa.int64()),
                "nidx": pa.array(np.zeros(m, np.int64), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cents": pa.array(csum, pa.int64()),
            }
        )

    _empty_partial = pa.table(
        {
            "nidx": pa.array([], pa.int64()),
            "p_n": pa.array([], pa.int64()),
            "p_cents": pa.array([], pa.int64()),
        }
    )

    def join_reduce(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        c = group.filter(pa.array(side == 0))
        o = group.filter(pa.array(side == 1))
        if len(c) == 0 or len(o) == 0:
            return _empty_partial
        ck = c["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        nidx_s = c["nidx"].to_numpy(zero_copy_only=False)[order]
        ok_keys = o["key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck_s, ok_keys)
        pos_c = np.minimum(pos, ck_s.shape[0] - 1)
        hit = (pos < ck_s.shape[0]) & (ck_s[pos_c] == ok_keys)
        nidx = nidx_s[pos_c[hit]]
        p_n = np.zeros(n_nat, np.int64)
        np.add.at(p_n, nidx, o["n"].to_numpy(zero_copy_only=False)[hit])
        p_c = np.zeros(n_nat, np.int64)
        np.add.at(p_c, nidx, o["cents"].to_numpy(zero_copy_only=False)[hit])
        nz = p_n > 0
        return pa.table(
            {
                "nidx": pa.array(np.flatnonzero(nz).astype(np.int64), pa.int64()),
                "p_n": pa.array(p_n[nz], pa.int64()),
                "p_cents": pa.array(p_c[nz], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            read_parquet_sized(
                f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
            ).map_batches(order_rows, batch_format="pyarrow", batch_size=8192)
        )
        .groupby("cb")
        .map_groups(join_reduce, batch_format="pyarrow")
        .groupby("nidx")
        .aggregate(
            Sum("p_n", alias_name="n_orders"),
            Sum("p_cents", alias_name="sum_price_c"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nidx = batch["nidx"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pc.take(names_arr, pa.array(nidx, pa.int64())),
                "n_orders": batch["n_orders"],
                "sum_price": pc.divide(
                    pc.cast(batch["sum_price_c"], pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def kept_middle_lengths(sf_dir: str, minlen: int = 24):
    """Reference QA stat (write_back_to_jsonl_sharded.py:91-111): lengths
    of kept gaps BETWEEN two removed ranges inside one doc, as a
    (length, count) histogram — ORACLE-CHECKED since r5: the sentinel-
    separated corpus makes the scan's windows doc-internal and the
    keep-first order == (doc, pos) order, so the production winnow-
    routed ranges are byte-identical to the window formulation
    (verified at sf0.001/0.01/0.1) and the window_kept_gaps SQL is this
    query's exact oracle.

    Default minlen=24: on the sf0.001/sf0.01 fixtures this is the largest
    window that produces docs with TWO separated removed ranges, so the
    driver-visible run is a real signal (minlen=64 returned 0 rows in
    round 1 — vacuous).

    num_partitions=0 (auto) — the flagship's production default. The
    forced-4-partition config this stat used through r03 spent ~90% of
    its wall time in the cross-partition candidate routing on a fixture
    small enough for one scan partition (9 s → 0.5 s at sf0.1); the
    multi-partition path stays pinned by dup_doc_report (P=4, oracle-
    checked) and the parity/skew tests."""
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
    from ray.data.aggregate import Sum

    cfg = DedupConfig(
        minlen=minlen, num_partitions=0, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    out = dedup_dataset(_docs(sf_dir, columns=["doc_id", "text"]), cfg)

    def gaps(batch: pa.Table) -> pa.Table:
        """Vectorized over the list<struct<start,end>> column: gap j of a
        doc is ranges[j+1].start - ranges[j].end; adjacent-element diffs
        over the flattened struct values, masked at list boundaries."""
        chunks = []
        col = batch["sa_remove_ranges"]
        arrs = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        for la in arrs:
            if la.null_count:
                la = la.fill_null([])
            vals = la.flatten()  # slice-safe, unlike .values
            if len(vals) < 2:
                continue
            lens_per = pc.list_value_length(la).to_numpy(zero_copy_only=False)
            offs = np.concatenate(([0], np.cumsum(lens_per.astype(np.int64))))
            starts = vals.field("start").to_numpy(zero_copy_only=False)
            ends = vals.field("end").to_numpy(zero_copy_only=False)
            g = starts[1:].astype(np.int64) - ends[:-1].astype(np.int64)
            mask = np.ones(g.shape[0], bool)
            inner = offs[1:-1]  # list boundaries in value space
            inner = inner[(inner > 0) & (inner <= g.shape[0])]
            mask[inner - 1] = False  # diff crossing two docs
            chunks.append(g[mask])
        lens = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
        vals, counts = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "gap_len": pa.array(vals, pa.int64()),
                "partial": pa.array(counts, pa.int64()),
            }
        )

    return (
        out.select_columns(["sa_remove_ranges"])
        .map_batches(gaps, batch_format="pyarrow")
        .groupby("gap_len")
        .aggregate(Sum("partial", alias_name="n"))
    )


def annotate_window_report(sf_dir: str, minlen: int = 24):
    """The annotate-mode end product VALUE-CHECKED (VERDICT r04 #5):
    the REAL production pipeline (dedup_dataset -> collect_annotations
    -> attach, i.e. the reference annotate mode,
    write_back_to_jsonl_sharded.py:94-101) run at the window-family
    minlen, with the SQL-expressible columns selected. The sentinel-
    separated corpus makes the SA scan's windows doc-internal, so the
    production winnow-routed ranges are BYTE-IDENTICAL to the window
    keep-first formulation (verified at sf0.001/0.01/0.1) — the oracle
    is the window island SQL LEFT-JOINed back onto documents, which
    pins the whole annotate path (range attach, passthrough columns,
    per-doc byte accounting) to DuckDB. ``annotate_documents`` keeps
    the full production config as the rows-only sibling."""
    from hg_dedup_ray.pipelines.annotate import annotate_dataset

    cfg = DedupConfig(
        minlen=minlen, num_partitions=0, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    out = annotate_dataset(_docs(sf_dir), cfg)

    def finish(b: pa.Table) -> pa.Table:
        nr = pc.fill_null(
            pc.list_value_length(b["sa_remove_ranges"]), 0
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "source": b["source"],
                "n_chars": b["n_chars"],
                "n_removed_ranges": pc.cast(nr, pa.int64()),
                "n_removed_bytes": b["n_removed_bytes"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def annotate_documents(sf_dir: str):
    """annotate-in-place over the documents table: ALL original columns
    preserved (lang, source, n_chars never enter a shuffle), dedup
    results attached (rows-only; annotate_window_report is the
    value-checked sibling at the window-family minlen)."""
    from hg_dedup_ray.pipelines.annotate import annotate_dataset

    cfg = DedupConfig(
        minlen=64, num_partitions=4, shingle_k=8,
        seq_col="doc_id", id_col="doc_id", text_col="text",
    )
    out = annotate_dataset(_docs(sf_dir), cfg)
    return out.select_columns(
        ["doc_id", "lang", "source", "n_chars", "n_removed_bytes", "cluster_id"]
    )


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over lineitem: filter pushed to
    the read, revenue computed vectorized per batch, multi-aggregate
    groupby.

    Money columns are 2-decimal doubles; summing float64 across a
    distributed reduction is order-dependent and at sf0.1 the error on
    ~1e9-scale sums exceeds the 6-dp round (round-1 hash mismatch).
    Scale-proof fix: accumulate in EXACT integer units (cents for
    qty/price, 1e-4 units for disc_price) as int64, divide once at the
    end — the oracle SQL does the identical integer-unit sum, so both
    sides produce bit-identical float64.
    """
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(
            datetime.datetime(1998, 9, 2), type=pa.timestamp("us")
        )
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        i64 = pa.int64()
        qty_c = pc.cast(pc.round(pc.multiply(batch["l_quantity"], 100.0)), i64)
        base_c = pc.cast(
            pc.round(pc.multiply(batch["l_extendedprice"], 100.0)), i64
        )
        disc_c = pc.cast(pc.round(pc.multiply(batch["l_discount"], 100.0)), i64)
        # extendedprice_cents * (100 - discount_cents): units of 1e-4 dollars
        disc_1e4 = pc.multiply(base_c, pc.subtract(pa.scalar(100, i64), disc_c))
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": qty_c,
                "base_c": base_c,
                "disc_1e4": disc_1e4,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_1e4", alias_name="sum_disc_1e4"),
            Count(alias_name="count_order"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(batch["sum_qty_c"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(
                    pc.cast(batch["sum_base_c"], pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(batch["sum_disc_1e4"], pa.float64()), 10000.0
                ),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


from hg_dedup_ray.pipelines.corpus_ops import (  # noqa: E402
    bm25_topk,
    dedup_drop_tiers,
    dup_rate_by_source,
    bbit_minhash_estimate_pairs,
    minhash_jaccard_estimate_pairs,
    near_dedup_keep_first,
    near_dedup_keep_longest,
    near_dedup_keep_tiered,
    next_token_distribution,
    source_overlap_matrix,
    normalize_texts,
    prefix_dup_docs,
    substring_counts,
    tfidf_top_terms,
)
from hg_dedup_ray.pipelines.relational import (  # noqa: E402
    customers_no_urgent_orders,
    large_volume_orders,
    promo_revenue_share,
    revenue_by_segment,
    supplier_balance_by_region,
)
from hg_dedup_ray.pipelines.sketches import (  # noqa: E402
    approx_counts_cms,
    approx_distinct_hll,
    approx_distinct_kmv,
    distinct_token_counts,
    dup_ngram_stats,
    heavy_hitter_tokens,
    ngram_novelty,
    onion_dedup,
)
from hg_dedup_ray.pipelines.curation import (  # noqa: E402
    cluster_balanced_sample,
    cluster_source_mix,
    dsir_importance_weights,
    gopher_quality_filter,
    kmeans_assign,
    kmeans_lloyd,
    perplexity_buckets,
    semantic_dedup,
    token_entropy,
    unigram_logprob,
)
from hg_dedup_ray.pipelines.curation import (  # noqa: E402
    bigram_logprob,
    bigram_pmi,
    curation_cascade,
    dup_cluster_size_histogram,
    hashed_classifier_score,
    quality_gate_ablation,
    soft_dedup_weights,
    source_mix_weights,
)
from hg_dedup_ray.pipelines.webclean import (  # noqa: E402
    bloom_dedup_report,
    boilerplate_line_strip,
    cap_per_source,
    decontaminate,
    dedup_aware_split,
    deterministic_shuffle,
    incremental_dedup,
    incremental_near_dedup,
    split_leakage_report,
    json_props_stats,
    pack_sequences,
    paragraph_dedup,
    redact_pii,
    stratified_sample,
    substring_decontaminate,
    url_dedup_latest,
)

QUERIES = {
    "exact_dedup": exact_dedup,
    "normalized_exact_dedup": normalized_exact_dedup,
    "segment_dedup_stats": segment_dedup_stats,
    "segment_dedup_apply": segment_dedup_apply,
    "pricing_summary": pricing_summary,
    "annotate_documents": annotate_documents,
    "annotate_window_report": annotate_window_report,
    "kept_middle_lengths": kept_middle_lengths,
    "bpe_token_counts": bpe_token_counts,
    "events_hourly": events_hourly,
    "asof_join_events_orders": asof_join_events_orders,
    "range_join_orders_prior_year": range_join_orders_prior_year,
    "orders_per_nation": orders_per_nation,
    "event_sessions": event_sessions,
    "event_type_stats": event_type_stats,
    "top_docs_by_chars": top_docs_by_chars,
    "dup_doc_report": dup_doc_report,
    "window_dedup_report": window_dedup_report,
    "window_dedup_apply": window_dedup_apply,
    "incremental_window_dedup": incremental_window_dedup,
    "dedup_then_pack": dedup_then_pack,
    "window_ptr_report": window_ptr_report,
    "window_kept_gaps": window_kept_gaps,
    "jsonl_roundtrip_dedup": jsonl_roundtrip_dedup,
    "sa_dedup_documents": sa_dedup_documents,
    "minhash_clusters": minhash_clusters,
    "simhash_sigs": simhash_sigs,
    "simhash_near_dup_pairs": simhash_near_dup_pairs,
    "sa_dedup_resumable": sa_dedup_resumable,
    "checkpoint_manifest_report": checkpoint_manifest_report,
    "run_metrics_summary": run_metrics_summary,
    "image_features": image_features,
    "audio_features": audio_features,
    "video_frame_sample": video_frame_sample,
    "html_features": html_features,
    "html_text_extract": html_text_extract,
    "image_phash_near_dup": image_phash_near_dup,
    "audio_fingerprint_dedup": audio_fingerprint_dedup,
    "video_framehash_near_dup": video_framehash_near_dup,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ngram_jaccard_exact_pairs": ngram_jaccard_exact_pairs,
    "ngram_containment_pairs": ngram_containment_pairs,
    "edit_distance_pairs": edit_distance_pairs,
    "edit_distance_clusters": edit_distance_clusters,
    "edit_dedup_keep_first": edit_dedup_keep_first,
    "hamming_distance_pairs": hamming_distance_pairs,
    "edit_distance_pressure": edit_distance_pressure,
    "dedup_pressure_curve": dedup_pressure_curve,
    "token_counts": token_counts,
    "quality_scores": quality_scores,
    "lang_id": lang_id_pred,
    "lang_id_confusion": lang_id_confusion,
    "fingerprints": fingerprints,
    "unigram_counts": unigram_counts,
    "corpus_stats": corpus_stats,
    "ann_topk": ann_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivf_exhaustive": ann_ivf_exhaustive,
    "ann_ivfpq_exhaustive": ann_ivfpq_exhaustive,
    "ann_ivfpq_recall_report": ann_ivfpq_recall_report,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "top_docs_per_lang": top_docs_per_lang,
    "lang_len_percentiles": lang_len_percentiles,
    "revenue_by_segment": revenue_by_segment,
    "large_volume_orders": large_volume_orders,
    "customers_no_urgent_orders": customers_no_urgent_orders,
    "heavy_hitter_tokens": heavy_hitter_tokens,
    "distinct_token_counts": distinct_token_counts,
    "dup_ngram_stats": dup_ngram_stats,
    "ngram_novelty": ngram_novelty,
    "onion_dedup": onion_dedup,
    "approx_distinct_hll": approx_distinct_hll,
    "approx_distinct_kmv": approx_distinct_kmv,
    "approx_counts_cms": approx_counts_cms,
    "minhash_sig_rows": minhash_sig_rows,
    "decontaminate": decontaminate,
    "stratified_sample": stratified_sample,
    "deterministic_shuffle": deterministic_shuffle,
    "cap_per_source": cap_per_source,
    "redact_pii": redact_pii,
    "json_props_stats": json_props_stats,
    "pack_sequences": pack_sequences,
    "repetition_stats": repetition_stats,
    "dup_ngram_coverage": dup_ngram_coverage,
    "hashed_classifier_score": hashed_classifier_score,
    "word_doc_freq": word_doc_freq,
    "minhash_band_clusters": minhash_band_clusters,
    "lsh_recall_report": lsh_recall_report,
    "lsh_param_sweep": lsh_param_sweep,
    "jaccard_dup_clusters": jaccard_dup_clusters,
    "containment_clusters": containment_clusters,
    "incremental_dedup": incremental_dedup,
    "incremental_near_dedup": incremental_near_dedup,
    "bloom_dedup_report": bloom_dedup_report,
    "dup_rate_by_source": dup_rate_by_source,
    "source_overlap_matrix": source_overlap_matrix,
    "tfidf_top_terms": tfidf_top_terms,
    "bm25_topk": bm25_topk,
    "prefix_dup_docs": prefix_dup_docs,
    "minhash_jaccard_estimate_pairs": minhash_jaccard_estimate_pairs,
    "bbit_minhash_estimate_pairs": bbit_minhash_estimate_pairs,
    "near_dedup_keep_first": near_dedup_keep_first,
    "near_dedup_keep_longest": near_dedup_keep_longest,
    "near_dedup_keep_tiered": near_dedup_keep_tiered,
    "dedup_drop_tiers": dedup_drop_tiers,
    "normalize_texts": normalize_texts,
    "substring_counts": substring_counts,
    "gopher_quality_filter": gopher_quality_filter,
    "quality_gate_ablation": quality_gate_ablation,
    "tokenizer_fertility": tokenizer_fertility,
    "curation_cascade": curation_cascade,
    "token_entropy": token_entropy,
    "kmeans_assign": kmeans_assign,
    "semantic_dedup": semantic_dedup,
    "unigram_logprob": unigram_logprob,
    "perplexity_buckets": perplexity_buckets,
    "bigram_logprob": bigram_logprob,
    "bigram_pmi": bigram_pmi,
    "dsir_importance_weights": dsir_importance_weights,
    "url_dedup_latest": url_dedup_latest,
    "substring_decontaminate": substring_decontaminate,
    "cluster_balanced_sample": cluster_balanced_sample,
    "next_token_distribution": next_token_distribution,
    "cluster_source_mix": cluster_source_mix,
    "supplier_balance_by_region": supplier_balance_by_region,
    "promo_revenue_share": promo_revenue_share,
    "kmeans_lloyd": kmeans_lloyd,
    "soft_dedup_weights": soft_dedup_weights,
    "dup_cluster_size_histogram": dup_cluster_size_histogram,
    "source_mix_weights": source_mix_weights,
    "dedup_tier_cascade": dedup_tier_cascade,
    "dedup_aware_split": dedup_aware_split,
    "split_leakage_report": split_leakage_report,
    "paragraph_dedup": paragraph_dedup,
    "boilerplate_line_strip": boilerplate_line_strip,
}
