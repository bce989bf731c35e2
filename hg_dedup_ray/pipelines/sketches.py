"""Sketch/statistics operators over the documents table: exact heavy
hitters via a candidate-superset pass, exact distinct counts via bucketed
distinct, word-n-gram duplication stats via the inverted-index shape, and
approximate distinct via HyperLogLog.

All tokenization matches the DuckDB oracles' ``regexp_split_to_array(
trim(text), '\\s+')`` (functions/wordgrams.doc_tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.functions import hll
from hg_dedup_ray.functions.wordgrams import (
    distinct_per_doc,
    doc_tokens,
    token_hashes,
    word_gram_hashes,
)

HH_K = 25
DUP_NGRAM_N = 5


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------ heavy hitters


def heavy_hitter_tokens(sf_dir: str, k: int = HH_K, capacity: int = 4096):
    """EXACT top-k most frequent tokens (count desc, token asc) via the
    2-pass frequent-candidates scheme:

    Pass A emits, per batch, only tokens with in-batch count >
    batch_tokens/capacity. Any token with GLOBAL count > N/capacity must
    exceed that threshold in at least one batch (sum argument), so the
    union is a SUPERSET of every candidate for the top-k whenever the
    k-th count > N/capacity — the per-batch filter plays the role of a
    Misra-Gries summary with error N/capacity, without per-item state.
    Pass B exact-counts ONLY the candidate set (broadcast; bounded by
    ~capacity x batches in theory, tiny in practice) and checks the
    guarantee; if the k-th exact count <= N/capacity it falls back to the
    full unigram aggregation — the result is exact either way.

    Output: (token, cnt, hh_rank) — deterministic tie-break on token.
    """
    from ray.data.aggregate import Sum

    def partial_candidates(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        )
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n_batch": pa.array([], pa.int64())}
            )
        vc = toks.value_counts()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        total = int(counts.sum())
        keep = counts > total / capacity
        surv = vc.field("values").filter(pa.array(keep)).cast(pa.string())
        # One sentinel row ("" is excluded from cand_tokens downstream)
        # carries this batch's token total, so the driver's N sums each
        # batch EXACTLY once — batches with zero surviving candidates
        # must still count toward N or the certification check is not a
        # bound, and counting once per surviving token overstates it.
        nb = np.zeros(len(surv) + 1, np.int64)
        nb[-1] = total
        return pa.table(
            {
                "token": pa.concat_arrays([surv, pa.array([""], pa.string())]),
                "n_batch": pa.array(nb),
            }
        )

    cand = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial_candidates, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    cand_tokens = sorted({r["token"] for r in cand if r["token"] != ""})
    if len(cand_tokens) < k:
        # candidate pass can't certify a full top-k -> exact path
        return _exact_topk(sf_dir, k)
    cand_ref = ray.put(pa.array(cand_tokens, pa.string()))

    def exact_counts(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        toks = pc.list_flatten(
            pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        )
        toks = toks.filter(pc.is_in(toks, value_set=get_broadcast(cand_ref)))
        vc = toks.value_counts() if len(toks) else None
        t = vc.field("values") if vc is not None else pa.array([], pa.string())
        c = (
            vc.field("counts").cast(pa.int64())
            if vc is not None
            else pa.array([], pa.int64())
        )
        return pa.table({"token": t, "partial": c})

    counted = (
        _docs(sf_dir, columns=["text"])
        .map_batches(exact_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("partial", alias_name="cnt"))
        .take_all()
    )
    toks = np.array([r["token"] for r in counted], dtype=object)
    cnts = np.array([r["cnt"] for r in counted], dtype=np.int64)
    order = np.lexsort((toks, -cnts))
    top = order[:k]
    # guarantee check: N/capacity must be below the k-th count, else a
    # non-candidate could belong in the top-k -> exact fallback
    n_tokens_total = int(
        sum(r["n_batch"] for r in cand) if cand else 0
    )  # exact N: each batch contributes its total exactly once via the
    # "" sentinel row emitted by partial_candidates
    kth = int(cnts[top[-1]]) if top.shape[0] == k else 0
    if top.shape[0] < k or kth * capacity <= n_tokens_total:
        # a non-candidate could still belong in the top-k -> exact path
        return _exact_topk(sf_dir, k)
    return pa.table(
        {
            "token": pa.array([str(t) for t in toks[top]], pa.string()),
            "cnt": pa.array(cnts[top], pa.int64()),
            "hh_rank": pa.array(np.arange(1, top.shape[0] + 1, dtype=np.int64)),
        }
    )


def _exact_topk(sf_dir: str, k: int) -> pa.Table:
    """Full unigram aggregation fallback (exact whatever the skew)."""
    from hg_dedup_ray.pipelines.queries import unigram_counts

    rows = unigram_counts(sf_dir).take_all()
    toks = np.array([r["token"] for r in rows], dtype=object)
    cnts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.lexsort((toks, -cnts))
    top = order[:k]
    return pa.table(
        {
            "token": pa.array([str(t) for t in toks[top]], pa.string()),
            "cnt": pa.array(cnts[top], pa.int64()),
            "hh_rank": pa.array(np.arange(1, top.shape[0] + 1, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------- distinct counts


def distinct_token_counts(sf_dir: str, num_buckets: int = 64):
    """Exact per-lang distinct token count, fully distributed: per-batch
    (lang, token) dedup -> coarse hash-bucket groupby -> per-bucket
    vectorized distinct -> tiny per-lang combine. Token-hash buckets are
    disjoint, so per-bucket distinct counts add exactly; token identity
    within a bucket uses the STRINGS (no hash-collision exposure)."""
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object),
            counts.astype(np.int64),
        )
        tok_np = np.asarray(flat.to_pylist(), dtype=object)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        tok_np, langs = tok_np[nonempty], langs[nonempty]
        # in-batch dedup before the shuffle (combiner)
        df_keys = np.char.add(
            np.char.add(langs.astype(str), "\x00"), tok_np.astype(str)
        )
        _, ix = np.unique(df_keys, return_index=True)
        th = token_hashes(pa.array(tok_np[ix], pa.string()))
        return pa.table(
            {
                "dbucket": pa.array(
                    (th % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "lang": pa.array(langs[ix], pa.string()),
                "token": pa.array(tok_np[ix], pa.string()),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        langs = np.asarray(group["lang"].to_pylist(), dtype=object)
        toks = np.asarray(group["token"].to_pylist(), dtype=object)
        keys = np.char.add(np.char.add(langs.astype(str), "\x00"), toks.astype(str))
        _, ix = np.unique(keys, return_index=True)
        u_langs, cnt = np.unique(langs[ix], return_counts=True)
        return pa.table(
            {
                "lang": pa.array([str(x) for x in u_langs], pa.string()),
                "partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["lang", "text"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=4096)
        .groupby("dbucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="n_distinct_tokens"))
    )


# --------------------------------------------------------- dup-ngram stats


def dup_ngram_stats(sf_dir: str, n: int = DUP_NGRAM_N):
    """Per-doc word-5-gram duplication: n_ngrams = distinct 5-grams in the
    doc, n_dup_ngrams = how many of those also appear in ANOTHER doc —
    the boilerplate-fraction statistic of web-corpus curation.

    Shape: per-doc distinct gram u64 hashes (vectorized, one lexsort per
    batch) -> hot-key pass keeps only grams on >=2 docs (rows are per-doc
    distinct, so row-count==doc-count) -> broadcast of the DUP grams only
    (bounded by dup density, the same budget as the dup-set broadcast) ->
    per-doc vectorized membership count. Gram identity is the u64
    polynomial hash (collision odds ~2^-64/pair; the oracle uses exact
    strings — documented).
    Docs with fewer than n tokens emit no row (matches the SQL)."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def gram_rows(batch: pa.Table) -> pa.Table:
        th, doc_off = doc_tokens(batch["text"])
        g, goff = word_gram_hashes(th, doc_off, n)
        g, goff = distinct_per_doc(g, goff)
        counts = np.diff(goff)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gram": pa.array(g, pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(ids, counts.astype(np.int64)), pa.int64()
                ),
            }
        )

    grams = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    hot = hot_u64_keys(grams, "gram")
    hot_ref = ray.put(np.sort(hot))

    def per_doc(batch: pa.Table) -> pa.Table:
        # recompute this batch's per-doc distinct grams (cheap, vectorized)
        # instead of re-consuming the gram rows: materialized gram blocks
        # are NOT doc-aligned, so counting there would need a full per-doc
        # shuffle — recomputation keeps the stage shuffle-free
        dup = get_broadcast(hot_ref)
        th, doc_off = doc_tokens(batch["text"])
        g, goff = word_gram_hashes(th, doc_off, n)
        g, goff = distinct_per_doc(g, goff)
        counts = np.diff(goff)
        if dup.shape[0] and g.shape[0]:
            pos = np.searchsorted(dup, g)
            isdup = (pos < dup.shape[0]) & (
                dup[np.minimum(pos, dup.shape[0] - 1)] == g
            )
        else:
            isdup = np.zeros(g.shape[0], bool)
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        n_dup = np.zeros(counts.shape[0], np.int64)
        np.add.at(n_dup, seg, isdup.astype(np.int64))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        has = counts > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[has], pa.int64()),
                "n_ngrams": pa.array(counts[has].astype(np.int64), pa.int64()),
                "n_dup_ngrams": pa.array(n_dup[has], pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow", batch_size=4096
    )


def ngram_novelty(sf_dir: str, n: int = DUP_NGRAM_N):
    """Per-doc word-5-gram NOVELTY, the order-aware sibling of
    dup_ngram_stats: n_stale_ngrams = how many of the doc's distinct
    5-grams already appeared in a STRICTLY EARLIER doc (min doc_id over
    the gram's postings < own doc_id) — the keep-first "how much of this
    doc is old news" curation signal (RedPajama-v2-style dup-ngram
    fraction, but incremental rather than symmetric).

    Shape: same per-doc distinct gram pass as dup_ngram_stats -> hot-key
    pass (a gram's min can precede a doc ONLY if >=2 docs share it, so
    singleton grams never matter) -> one filtered partial-min pass over
    the materialized gram rows (emits <= |hot| short rows per block) ->
    driver segment-min over the dup-density-bounded hot set -> broadcast
    sorted (gram, min_id) -> stateless per-doc membership count. Gram
    identity is the u64 polynomial hash; the oracle uses exact strings
    (documented collision contract as dup_ngram_stats)."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def gram_rows(batch: pa.Table) -> pa.Table:
        th, doc_off = doc_tokens(batch["text"])
        g, goff = word_gram_hashes(th, doc_off, n)
        g, goff = distinct_per_doc(g, goff)
        counts = np.diff(goff)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gram": pa.array(g, pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(ids, counts.astype(np.int64)), pa.int64()
                ),
            }
        )

    grams = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    hot = np.sort(hot_u64_keys(grams, "gram"))
    hot_ref = ray.put(hot)

    def partial_min(batch: pa.Table) -> pa.Table:
        # empty fixtures: Ray hands the INPUT-schema empty block through
        if batch.num_rows == 0 or "gram" not in batch.column_names:
            return pa.table(
                {
                    "gram": pa.array([], pa.uint64()),
                    "min_id": pa.array([], pa.int64()),
                }
            )
        h = get_broadcast(hot_ref)
        g = batch["gram"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if h.shape[0] and g.shape[0]:
            pos = np.searchsorted(h, g)
            hit = (pos < h.shape[0]) & (h[np.minimum(pos, h.shape[0] - 1)] == g)
        else:
            hit = np.zeros(g.shape[0], bool)
        g, ids = g[hit], ids[hit]
        order = np.lexsort((ids, g))
        gs, first = np.unique(g[order], return_index=True)
        return pa.table(
            {
                "gram": pa.array(gs, pa.uint64()),
                "min_id": pa.array(ids[order][first], pa.int64()),
            }
        )

    parts = ray.get(
        grams.map_batches(
            partial_min, batch_format="pyarrow", batch_size=65536
        ).to_arrow_refs()
    )
    parts = [t for t in parts if t.num_rows]  # empty ds: raw pass-through
    gcat = np.concatenate(
        [t["gram"].to_numpy(zero_copy_only=False) for t in parts]
        or [np.empty(0, np.uint64)]
    )
    mcat = np.concatenate(
        [t["min_id"].to_numpy(zero_copy_only=False) for t in parts]
        or [np.empty(0, np.int64)]
    )
    order = np.lexsort((mcat, gcat))
    gs, first = np.unique(gcat[order], return_index=True)
    mins_ref = ray.put((gs, mcat[order][first]))

    def per_doc(batch: pa.Table) -> pa.Table:
        hg, hm = get_broadcast(mins_ref)
        th, doc_off = doc_tokens(batch["text"])
        g, goff = word_gram_hashes(th, doc_off, n)
        g, goff = distinct_per_doc(g, goff)
        counts = np.diff(goff)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        own = np.repeat(ids, counts.astype(np.int64))
        if hg.shape[0] and g.shape[0]:
            pos = np.searchsorted(hg, g)
            hit = (pos < hg.shape[0]) & (
                hg[np.minimum(pos, hg.shape[0] - 1)] == g
            )
            stale = hit & (hm[np.minimum(pos, hg.shape[0] - 1)] < own)
        else:
            stale = np.zeros(g.shape[0], bool)
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        n_stale = np.zeros(counts.shape[0], np.int64)
        np.add.at(n_stale, seg, stale.astype(np.int64))
        has = counts > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[has], pa.int64()),
                "n_ngrams": pa.array(counts[has].astype(np.int64), pa.int64()),
                "n_stale_ngrams": pa.array(n_stale[has], pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------------------------ KMV distinct

_KMV_P = np.uint64(1099511628211)  # FNV-64 prime, same base as wordgrams


def kmv_token_hashes(tokens: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """u64 KMV hash per token: Horner fold of the first 8 bytes
    (zero-padded), then one more fold step with the byte length, then
    splitmix64. Deliberately SIMPLER than wordgrams.token_hashes — this
    exact chain is replicated in the DuckDB oracle with HUGEINT mulmod
    arithmetic (oracles.py), so the KMV estimate is value-checked, not
    rows-only. Tokens sharing an 8-byte prefix AND length collide by
    design; both sides use the same hash, so the estimates still match
    bit-for-bit (ASCII fixture assumption, as with the simhash oracle)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.wordgrams import _splitmix

    buf, off = string_column_bytes(tokens)
    n = off.shape[0] - 1
    if n == 0:
        return np.empty(0, np.uint64)
    lens = np.diff(off)
    pad = np.concatenate([buf, np.zeros(8, np.uint8)])
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(8):
            b = np.where(lens > j, pad[off[:-1] + j], 0).astype(np.uint64)
            h = h * _KMV_P + b
        h = h * _KMV_P + lens.astype(np.uint64)
    return _splitmix(h)


def approx_distinct_kmv(sf_dir: str, k: int = 16):
    """Per-lang approximate distinct-token count via the k-minimum-values
    sketch, DuckDB-green: keep the k smallest distinct token hashes per
    lang; estimate = (k-1) * 2^64 / h_k (exact count when fewer than k
    distinct values exist). KMV merges exactly — every global k-smallest
    value is inside its producing batch's k-smallest — so each batch
    ships at most k 8-byte rows per lang and tokens never shuffle.
    All-integer arithmetic: the estimate is deterministic and the oracle
    recomputes the identical hash chain in SQL.

    Default k=16 so the ESTIMATOR branch (not just the exact-fallback)
    is value-checked on the small-vocabulary fixtures; production runs
    would use k >= 1024 (~3% relative error)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object),
            counts.astype(np.int64),
        )
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = lens > 0
        h = kmv_token_hashes(flat)[keep]
        langs = langs[keep]
        out_lang, out_h = [], []
        for lang in np.unique(langs):
            u = np.unique(h[langs == lang])[:k]  # k smallest distinct
            out_lang.extend([str(lang)] * u.shape[0])
            out_h.append(u)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "x": pa.array(
                    np.concatenate(out_h) if out_h else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        u = np.unique(group["x"].to_numpy(zero_copy_only=False))
        if u.shape[0] < k:
            est = int(u.shape[0])
        else:
            est = (k - 1) * (1 << 64) // int(u[k - 1])
        return pa.table(
            {
                "lang": pa.array([group["lang"][0].as_py()], pa.string()),
                "n_distinct_est": pa.array([est], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("lang")
        .map_groups(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------------ HLL distinct


def approx_distinct_hll(sf_dir: str, p: int = hll.DEFAULT_P):
    """Per-lang approximate distinct-token count via HyperLogLog:
    map_batches emits one fixed 2^p-register sketch row per (batch, lang)
    — a few KB regardless of input size — and the per-lang merge is an
    elementwise max over a handful of rows. The 100 TB shape: NO shuffle
    of tokens, sketch rows only. ~1.6% relative error at p=12 (rows-only
    entry; tests/test_sketches.py pins accuracy vs the exact count)."""

    def partial_sketch(batch: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object),
            counts.astype(np.int64),
        )
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        th = token_hashes(flat)
        keep = lens > 0
        th, langs = th[keep], langs[keep]
        out_lang, out_regs = [], []
        for lang in np.unique(langs):
            regs = hll.empty_registers(p)
            hll.add_hashes(regs, th[langs == lang], p)
            out_lang.append(str(lang))
            out_regs.append(regs)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "regs": pa.array(
                    [r.tobytes() for r in out_regs], pa.binary()
                ),
            }
        )

    def merge_lang(group: pa.Table) -> pa.Table:
        regs = hll.empty_registers(p)
        for b in group["regs"].to_pylist():
            regs = hll.merge(regs, np.frombuffer(b, np.uint8))
        return pa.table(
            {
                "lang": pa.array([group["lang"][0].as_py()], pa.string()),
                "n_distinct_est": pa.array([hll.estimate(regs)], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["lang", "text"])
        .map_batches(partial_sketch, batch_format="pyarrow", batch_size=4096)
        .groupby("lang")
        .map_groups(merge_lang, batch_format="pyarrow")
    )


# ------------------------------------------------------- count-min sketch


CMS_DEPTH = 4
CMS_WIDTH = 1024       # 2^10 cells per row; row r reads hash bits [10r,10r+10)
CMS_TOPK = 20


def approx_counts_cms(sf_dir: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH, topk: int = CMS_TOPK):
    """Count-Min-Sketch token counts (Cormode-Muthukrishnan), DuckDB
    value-checked: the sketch itself — not just its output shape — is
    replicated in SQL, like the KMV/HLL oracles. Each token's cells are
    ``depth`` 10-bit lanes of its splitmix64 hash (the same
    ``kmv_token_hashes`` chain the KMV oracle replicates); the counter
    table is a FIXED depth x width int64 vector, so pass A ships only
    nonzero (cell, count) int rows per batch — never tokens — and the
    driver sums them (4096 counters; the sketch is mergeable, so a
    multi-node run tree-reduces identically). Pass B probes the
    broadcast counters for each batch-DISTINCT token string and keeps
    the batch-local top-k by (estimate DESC, token ASC); any global
    top-k token is inside its own batch's local top-k (estimates come
    from the GLOBAL counters, and a batch sees a subset of competitors),
    so the driver union + re-sort is exact. Output (token, est_count) —
    the top-``topk`` estimated counts, over-estimates by construction."""
    shifts = [np.uint64(10 * r) for r in range(depth)]
    mask = np.uint64(width - 1)

    def _flat_tokens(batch: pa.Table):
        toks = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(lens > 0))

    def counter_partial(batch: pa.Table) -> pa.Table:
        flat = _flat_tokens(batch)
        h = kmv_token_hashes(flat)
        idx = np.concatenate(
            [
                (((h >> s) & mask).astype(np.int64) + r * width)
                for r, s in enumerate(shifts)
            ]
            or [np.empty(0, np.int64)]
        )
        cnt = np.bincount(idx, minlength=depth * width)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    parts = (
        _docs(sf_dir, columns=["text"])
        .map_batches(counter_partial, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    counters = np.zeros(depth * width, np.int64)
    for t in ray.get(parts.to_arrow_refs()):
        if len(t):
            # a block may CONCATENATE several batch outputs, so cell ids
            # repeat within one table — fancy-index += would keep only
            # the last occurrence (np.add.at is the duplicate-safe add)
            np.add.at(
                counters,
                t["cell"].to_numpy(zero_copy_only=False),
                t["cnt"].to_numpy(zero_copy_only=False),
            )
    ctr_ref = ray.put(counters)

    def local_topk(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        C = get_broadcast(ctr_ref)
        flat = _flat_tokens(batch)
        uniq = pc.unique(flat)  # distinct by STRING (hash collisions by
        # design in the 8-byte-prefix chain must list both tokens,
        # matching the SQL side)
        if len(uniq) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "est_count": pa.array([], pa.int64()),
                }
            )
        h = kmv_token_hashes(uniq)
        est = np.min(
            np.stack(
                [
                    C[(((h >> s) & mask).astype(np.int64) + r * width)]
                    for r, s in enumerate(shifts)
                ]
            ),
            axis=0,
        )
        toks = np.asarray(uniq.to_pylist(), dtype=object)
        order = np.argsort(toks, kind="stable")  # token ASC
        order = order[np.argsort(-est[order], kind="stable")]  # est DESC
        take = order[:topk]
        return pa.table(
            {
                "token": pa.array(toks[take].tolist(), pa.string()),
                "est_count": pa.array(est[take], pa.int64()),
            }
        )

    cand = (
        _docs(sf_dir, columns=["text"])
        .map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )  # <= topk rows per batch: answer-sized driver collection
    best: dict[str, int] = {}
    for r in cand:
        best[r["token"]] = int(r["est_count"])
    rows = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return pa.table(
        {
            "token": pa.array([t for t, _ in rows], pa.string()),
            "est_count": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def onion_dedup(sf_dir: str, n: int = DUP_NGRAM_N):
    """ONION-style document-level dedup APPLY (Pomikalek 2011, the
    method behind many web-corpus cleanups): a doc is DROPPED when at
    least half of its distinct word-n-grams already appeared in a
    strictly earlier doc — the keep-first-aware staleness rule
    ``ngram_novelty`` computes. Output per gram-bearing doc:
    (doc_id, n_ngrams, n_stale_ngrams, kept) with the keep flag an
    integer cross-multiplication (2*stale < total), so the verdict is
    engine-exact. Pure composition: the novelty pass's scale shape
    (hot-key prefilter, dup-bounded broadcast) is unchanged; the flag
    is one vectorized map."""

    def flag(batch: pa.Table) -> pa.Table:
        ng = batch["n_ngrams"].to_numpy(zero_copy_only=False)
        st = batch["n_stale_ngrams"].to_numpy(zero_copy_only=False)
        return batch.append_column("kept", pa.array(2 * st < ng, pa.bool_()))

    return ngram_novelty(sf_dir, n).map_batches(
        flag, batch_format="pyarrow"
    )
