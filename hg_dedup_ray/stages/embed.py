"""Embedding-space operators: brute-force cosine top-k ANN, threshold
near-dup pairs, and an IVF-bucketed scale variant.

Patterns per the Ray guide: the QUERY side is small -> broadcast it
(``ray.put`` once, read per actor), stream the corpus side through
``map_batches`` computing per-batch partial top-k (numpy matmul), then
merge partials — no all-to-all shuffle for the brute-force path. The IVF
variant buckets vectors by nearest centroid and shuffles once on
``ivf_cell``, turning the O(N*Q) scan into per-cell scans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class PartialTopK:
    """map_batches actor: corpus batch -> per-query partial top-k rows
    (query_id, neighbor_id, sim). Queries broadcast via object store."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids: np.ndarray = q["qids"]
        self.qmat: np.ndarray = _normalize(q["qmat"].astype(np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(embedding_matrix(batch))
        sims = self.qmat @ m.T  # (Q, n)
        Q, n = sims.shape
        k = min(self.k + 1, n)  # +1 headroom: query may be in this batch
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qi = np.repeat(np.arange(Q), k)
        jj = idx.reshape(-1)
        mask = vids[jj] != self.qids[qi]
        qi, jj = qi[mask], jj[mask]
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi], pa.int64()),
                "neighbor_id": pa.array(vids[jj], pa.int64()),
                "sim": pa.array(sims[qi, jj], pa.float64()),
            }
        )


def merge_topk(group: pa.Table, k: int) -> pa.Table:
    """Per-query merge of partial top-k rows -> final ranks 1..k.
    Deterministic tiebreak: (-sim, neighbor_id)."""
    sims = group["sim"].to_numpy(zero_copy_only=False)
    nids = group["neighbor_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nids, -sims))[:k]
    return pa.table(
        {
            "query_id": group["query_id"].take(pa.array(order)),
            "neighbor_id": pa.array(nids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        }
    )


def _block_pair_table(ta: pa.Table, tb: pa.Table, threshold: float) -> pa.Table:
    if ta.num_rows == 0 or tb.num_rows == 0:
        # repartitioning a tiny corpus can produce empty blocks whose
        # embedding matrix is 1-D; nothing to pair with anyway
        return pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
            }
        )
    va = ta["vec_id"].to_numpy(zero_copy_only=False)
    vb = tb["vec_id"].to_numpy(zero_copy_only=False)
    ma = _normalize(embedding_matrix(ta))
    mb = _normalize(embedding_matrix(tb))
    sims = ma @ mb.T
    ii, jj = np.nonzero(sims >= threshold)
    a, b = va[ii], vb[jj]
    # orient (a < b) regardless of block/vec_id alignment, then distinct
    # (the diagonal tile sees each unordered pair twice)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo < hi
    lo, hi = lo[keep], hi[keep]
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    uniq = np.concatenate(
        ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))
    ) if lo.size else np.empty(0, bool)
    return pa.table(
        {
            "vec_id_a": pa.array(lo[uniq], pa.int64()),
            "vec_id_b": pa.array(hi[uniq], pa.int64()),
        }
    )


def near_dup_pairs_blocked(emb_ds, threshold: float):
    """EXACT all-(a < b) cosine-threshold pairs, block-pairwise.

    The corpus never leaves the object store: the materialized dataset's
    C blocks spawn C(C+1)/2 raw tasks, each fetching two blocks zero-copy
    and emitting that tile's qualifying pairs; results assemble via
    ``from_arrow_refs`` (refs only — no driver matrix, no per-batch
    broadcast re-ship). This is the exact O(N^2)-compute path the SQL
    oracle defines; the sub-quadratic approximate path at scale is IVF
    bucketing (``IvfAssigner`` + groupby, see ann_ivf_topk)."""
    import ray
    import ray.data as rd

    @ray.remote
    def tile(thr: float, ta: pa.Table, tb: pa.Table) -> pa.Table:
        return _block_pair_table(ta, tb, thr)

    # C blocks -> C(C+1)/2 tiles. Three bounds on C:
    #  - work: >=1536 rows per block so per-tile matmul work dominates the
    #    ~10ms task fixed cost (a 2,500-row corpus wants ~3 tiles, not 66 —
    #    the round-2 regression was exactly this overhead)
    #  - saturation: ~2 tiles per CPU once the corpus is big enough
    #  - memory: <=200k rows per block so two blocks + the sim tile fit a
    #    worker heap comfortably
    cpus = int(ray.cluster_resources().get("CPU", 4))
    mat = emb_ds.materialize()
    n = mat.count()
    if n == 0:
        # zero-row parquet reads yield fragment-metadata-only blocks
        # that lack the real columns; never hand those to tile()
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                }
            )
        )
    target_blocks = max(
        2,
        min(-(-n // 1536), int((4 * cpus) ** 0.5)),
        -(-n // 200_000),
    )
    if mat.num_blocks() < target_blocks:
        mat = mat.repartition(target_blocks).materialize()
    elif mat.num_blocks() > 4 * target_blocks:
        # tiny blocks explode the tile count quadratically; coalesce
        mat = mat.repartition(target_blocks).materialize()
    refs = mat.to_arrow_refs()
    out = [
        tile.remote(threshold, refs[i], refs[j])
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    if not out:
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow_refs(out)


class IvfAssigner:
    """map_batches actor: assign each vector to its nearest of C centroids
    (broadcast), emitting an ``ivf_cell`` column. Downstream
    groupby("ivf_cell") co-locates candidate neighbors — the scale path
    for ANN / near-dup (cells bound the pairwise work)."""

    def __init__(self, centroids_ref):
        import ray

        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.centroids = _normalize(np.asarray(c, dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(batch))
        cell = np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int32()))


class IvfMultiProbeAssigner:
    """map_batches actor for multi-probe IVF: each vector emits ONE db
    row in its nearest cell and ``nprobe`` query rows in its nprobe
    nearest cells (standard IVF search: the db side is partitioned, the
    query side probes several cells — recall rises with nprobe at
    nprobe/C of the brute-force cost)."""

    def __init__(self, centroids_ref, nprobe: int):
        import ray

        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.centroids = _normalize(np.asarray(c, dtype=np.float64))
        self.nprobe = min(nprobe, self.centroids.shape[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        m = _normalize(embedding_matrix(batch))
        sims = m @ self.centroids.T  # (n, C)
        own = np.argmax(sims, axis=1).astype(np.int32)
        P = self.nprobe
        probe = np.argpartition(-sims, kth=P - 1, axis=1)[:, :P].astype(np.int32)
        # db rows (role 0) + nprobe query rows (role 1) per vector
        idx = np.concatenate([np.arange(n), np.repeat(np.arange(n), P)])
        cells = np.concatenate([own, probe.reshape(-1)])
        roles = np.concatenate([np.zeros(n, np.uint8), np.ones(n * P, np.uint8)])
        out = batch.take(pa.array(idx, pa.int64()))
        out = out.append_column("ivf_cell", pa.array(cells, pa.int32()))
        return out.append_column("ivf_role", pa.array(roles, pa.uint8()))


def kmeans_centroids(sample: np.ndarray, n_cells: int, seed: int = 42, iters: int = 10) -> np.ndarray:
    """Tiny k-means (numpy) over a driver-side sample to seed IVF cells."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float64))
    cents = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


# ------------------------------------------------------------- IVF-PQ


def pq_train(
    sample: np.ndarray, m: int = 8, ksub: int = 16, seed: int = 42,
    iters: int = 15,
) -> np.ndarray:
    """(m, ksub, d/m) product-quantization codebooks: per-subspace L2
    Lloyd k-means over a (bounded) driver-side sample of L2-normalized
    vectors (Jegou et al. 2011). Deterministic: seeded init, argmin
    ties break low."""
    sample = _normalize(sample.astype(np.float64))
    n, d = sample.shape
    dsub = d // m
    assert dsub * m == d, f"dim {d} not divisible by m={m}"
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), np.float64)
    for i in range(m):
        sub = sample[:, i * dsub : (i + 1) * dsub]
        k = min(ksub, n)
        c = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * (sub @ c.T)
                + (c * c).sum(1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            for j in range(k):
                mem = sub[a == j]
                if len(mem):
                    c[j] = mem.mean(0)
        if k < ksub:  # tiny sample: pad with the last centroid
            c = np.vstack([c, np.repeat(c[-1:], ksub - k, axis=0)])
        books[i] = c
    return books


def pq_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, index of the L2-nearest
    codeword. ``mat`` must already be L2-normalized."""
    m, ksub, dsub = books.shape
    codes = np.empty((mat.shape[0], m), np.uint8)
    for i in range(m):
        sub = mat[:, i * dsub : (i + 1) * dsub]
        d2 = (
            (sub * sub).sum(1)[:, None]
            - 2.0 * (sub @ books[i].T)
            + (books[i] * books[i]).sum(1)[None, :]
        )
        codes[:, i] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """(n, m<=8) uint8 -> (n,) uint64, code i in byte i. The packed form
    is what shuffles: 16 bytes per db vector (vec_id + code) regardless
    of embedding dimension."""
    n, m = codes.shape
    out = np.zeros(n, np.uint64)
    for i in range(m):
        out |= codes[:, i].astype(np.uint64) << np.uint64(8 * i)
    return out


def unpack_codes(packed: np.ndarray, m: int) -> np.ndarray:
    """(n,) uint64 -> (n, m) int64 code indices."""
    return np.stack(
        [
            ((packed >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int64)
            for i in range(m)
        ],
        axis=1,
    )


class PqEncoder:
    """Task-closure stage: vectors -> (vec_id, ivf_cell, pq_code) rows.
    Codebooks + coarse centroids broadcast once; per batch one matmul
    (cell assign) + m small matmuls (codes)."""

    def __init__(self, state_ref):
        import ray

        st = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.cents, self.books = st

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "ivf_cell": pa.array([], pa.int64()),
                "pq_code": pa.array([], pa.uint64()),
            }
        )
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return empty
        mat = _normalize(embedding_matrix(batch))
        cell = np.argmax(mat @ self.cents.T, axis=1).astype(np.int64)
        packed = pack_codes(pq_codes(mat, self.books))
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "ivf_cell": pa.array(cell, pa.int64()),
                "pq_code": pa.array(packed, pa.uint64()),
            }
        )


def qbucket_merge_topk(
    cand,
    k: int,
    id_col: str = "neighbor_id",
    score_col: str = "sim",
    emit_score: bool = False,
    buckets: int = 32,
):
    """Global top-k per query from partial (query_id, id, score) rows —
    the final merge every retrieval operator (ANN brute/IVF/IVF-PQ,
    BM25) shares: ONE bounded groupby on query_id % buckets, per-group
    vectorized lexsort + segment rank, ties broken (-score, id). Emits
    (query_id, id_col, rank[, score_col])."""

    def add_qbucket(b: pa.Table) -> pa.Table:
        q = b["query_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "qbucket", pa.array((q % buckets).astype(np.int64))
        )

    def merge(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy(zero_copy_only=False)
        n = group[id_col].to_numpy(zero_copy_only=False)
        s = group[score_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -s, q))
        q, n, s = q[order], n[order], s[order]
        new = np.concatenate(([True], q[1:] != q[:-1]))
        rid = np.cumsum(new) - 1
        run_start = np.cumsum(np.bincount(rid)) - np.bincount(rid)
        local = np.arange(q.shape[0]) - run_start[rid]
        keep = local < k
        cols = {
            "query_id": pa.array(q[keep], pa.int64()),
            id_col: pa.array(n[keep], pa.int64()),
            "rank": pa.array(local[keep] + 1, pa.int64()),
        }
        if emit_score:
            cols[score_col] = pa.array(s[keep], pa.float64())
        return pa.table(cols)

    return (
        cand.map_batches(add_qbucket, batch_format="pyarrow")
        .groupby("qbucket")
        .map_groups(merge, batch_format="pyarrow")
    )
