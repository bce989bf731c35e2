"""Web-corpus curation operators: Gopher-style quality gating, unigram
entropy scoring, nearest-centroid assignment, and SemDeDup-style semantic
dedup over the embeddings table.

These are the model-quality filters a webtext pretraining pipeline runs
between crawl extraction and tokenization (Rae et al. 2021 "Scaling
Language Models" appendix A / Abbas et al. 2023 "SemDeDup"). Scale shapes:

- gopher_quality_filter / token_entropy: pure per-batch Arrow/numpy
  kernels, embarrassingly parallel, no shuffle. All keep-gates use
  INTEGER cross-multiplication (``3*n <= chars <= 10*n``) so the boolean
  matches the SQL oracle bit-for-bit — no float-threshold drift.
- kmeans_assign: the centroid side is tiny by definition — ``ray.put``
  the normalized (K, d) matrix once, argmax a per-batch matmul against
  it. No shuffle; the 100 TB cost is one streaming pass.
- semantic_dedup: assignment first (broadcast matmul), then ONE shuffle
  on ``centroid_id`` and a per-cluster vectorized dominance check. The
  within-cluster O(c^2) is SemDeDup's own design point — K bounds the
  cluster size, and the row-chunked matmul keeps peak memory at
  ``chunk * cluster`` floats regardless of cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.stages.embed import _normalize, embedding_matrix

# --- Gopher rule constants (Rae et al. 2021, table A1) -------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3          # mean word length in [3, 10]
GOPHER_MAX_MEAN_WL = 10
GOPHER_ALPHA_NUM = 4            # >= 80% of words contain an alphabetic char
GOPHER_ALPHA_DEN = 5
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
# The paper requires >= 2 distinct stop words; the synthetic fixture's
# 31-word vocabulary carries only "the", so the gate here is >= 1 (the
# signal column n_stop_types is emitted either way).
GOPHER_MIN_STOP_TYPES = 1

KMEANS_K = 8                    # centroids = embeddings with vec_id < K
SEMDEDUP_COS = 0.4              # same threshold as embedding_near_dup_pairs
BALANCED_SAMPLE_M = 16          # per-cluster sample size
DSIR_TARGET_MOD = 19            # target domain = doc_id % MOD == 0 (same
                                # deterministic stand-in as decontaminate)


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _doc_words(text: pa.ChunkedArray | pa.Array):
    """(flat_tokens, parent_row_idx, n_rows) of whitespace-split words.

    Mirrors the oracle's ``regexp_split_to_array(trim(text), '\\s+')`` and
    drops the phantom '' token Arrow yields for whitespace-only rows."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nz = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    if not nz.all():
        flat = flat.filter(pa.array(nz))
        parents = parents[nz]
    return flat, parents, len(toks)


# ------------------------------------------------- gopher_quality_filter


def _gopher_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch Gopher signals + integer-exact keep flag (shared by
    gopher_quality_filter and curation_cascade)."""
    flat, parents, n = _doc_words(batch["text"])
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    n_words = np.bincount(parents, minlength=n).astype(np.int64)
    chars = np.bincount(parents, weights=lens, minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(flat, r"[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = np.bincount(parents[alpha], minlength=n).astype(np.int64)
    stop_types = np.zeros(n, np.int64)
    for s in GOPHER_STOPS:
        hit = pc.equal(flat, s).to_numpy(zero_copy_only=False)
        stop_types += np.bincount(parents[hit], minlength=n) > 0
    mean_wl = np.where(n_words > 0, chars / np.maximum(n_words, 1), 0.0)
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (chars >= GOPHER_MIN_MEAN_WL * n_words)
        & (chars <= GOPHER_MAX_MEAN_WL * n_words)
        & (GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * n_words)
        & (stop_types >= GOPHER_MIN_STOP_TYPES)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "total_word_chars": pa.array(chars, pa.int64()),
            "mean_word_len": pa.array(mean_wl, pa.float64()),
            "n_alpha_words": pa.array(n_alpha, pa.int64()),
            "n_stop_types": pa.array(stop_types, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )



def gopher_quality_filter(sf_dir: str):
    """Gopher repetition-free quality gate over the documents table.

    Output per doc: (doc_id, n_words, total_word_chars, mean_word_len,
    n_alpha_words, n_stop_types, keep). ``keep`` applies the word-count
    band, the mean-word-length band, the 80%-alphabetic rule and the
    stop-word rule — all evaluated in integer arithmetic so the flag is
    engine-exact; ``mean_word_len`` is the one float column and is a
    SINGLE division of two exact integers on both sides."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _gopher_stats_batch, batch_format="pyarrow", batch_size=8192
    )


# ------------------------------------------------------- token_entropy


def token_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy (bits) — the repetitiveness signal
    quality classifiers feed on (low entropy = TV-static repetition).

    H = log2(n) - sum(c*log2(c))/n over per-doc distinct-token counts c.
    Output: (doc_id, n_words, n_distinct_words, entropy). Vectorized:
    one dictionary-encode of the flat token column, one np.unique over
    (row, code) pairs, then bincount-weighted segment sums."""

    def ent(batch: pa.Table) -> pa.Table:
        flat, parents, n = _doc_words(batch["text"])
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (parents.astype(np.uint64) << np.uint64(32)) | codes
        uk, counts = np.unique(key, return_counts=True)
        urow = (uk >> np.uint64(32)).astype(np.int64)
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        n_distinct = np.bincount(urow, minlength=n).astype(np.int64)
        clogc = counts * np.log2(counts)
        s = np.bincount(urow, weights=clogc, minlength=n)
        entropy = np.where(
            n_words > 0,
            np.log2(np.maximum(n_words, 1)) - s / np.maximum(n_words, 1),
            0.0,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct_words": pa.array(n_distinct, pa.int64()),
                "entropy": pa.array(entropy, pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        ent, batch_format="pyarrow", batch_size=8192
    )


# ------------------------------------------------------- kmeans_assign


def _centroid_ref(sf_dir: str, k: int):
    """Normalized (K, d) centroid matrix, broadcast once. Centroids are
    the K lowest-vec_id embeddings (deterministic seed — a real pipeline
    would run Lloyd iterations here; assignment is the shuffle-free part
    either way and is what the oracle can express)."""
    ct = (
        _emb(sf_dir, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {k}")
        .take_all()
    )
    mat = np.array([r["embedding"] for r in ct], np.float64)
    cids = np.array([r["vec_id"] for r in ct], np.int64)
    order = np.argsort(cids)  # K rows: sort on the driver, never a shuffle
    return ray.put({"cids": cids[order], "cmat": _normalize(mat[order])})


def _assign_batch(batch: pa.Table, cref) -> tuple[np.ndarray, np.ndarray]:
    from hg_dedup_ray.stages.broadcast import get_broadcast

    c = get_broadcast(cref)
    vids = batch["vec_id"].to_numpy(zero_copy_only=False)
    m = _normalize(embedding_matrix(batch))
    sims = m @ c["cmat"].T                      # (n, K)
    best = np.argmax(sims, axis=1)              # ties -> lowest index == id
    return vids, c["cids"][best]


def kmeans_assign(sf_dir: str, k: int = KMEANS_K):
    """Nearest-centroid (cosine) assignment of every embedding to one of
    the K seed centroids. Output: (vec_id, centroid_id)."""
    cref = _centroid_ref(sf_dir, k)

    def assign(batch: pa.Table) -> pa.Table:
        vids, cids = _assign_batch(batch, cref)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "centroid_id": pa.array(cids, pa.int64()),
            }
        )

    return _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------------------ semantic_dedup


def semantic_dedup(sf_dir: str, k: int = KMEANS_K, cos: float = SEMDEDUP_COS):
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then inside each
    cluster drop every vector that has an EARLIER (lower vec_id) cluster
    member with cosine similarity >= ``cos``. Output: (vec_id,
    centroid_id, kept) for all vectors.

    The dominance rule is "any earlier member", not "any earlier KEPT
    member" — it needs no sequential chain, so each cluster resolves in
    one vectorized pass, and it is exactly expressible as the oracle's
    anti-join. Clusters shuffle once on centroid_id; the per-cluster
    matmul runs in 2048-row chunks against the members before them."""
    cref = _centroid_ref(sf_dir, k)

    def assign(batch: pa.Table) -> pa.Table:
        vids, cids = _assign_batch(batch, cref)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "centroid_id": pa.array(cids, pa.int64()),
                "embedding": emb,
            }
        )

    def cluster_dedup(group: pa.Table) -> pa.Table:
        vids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(vids, kind="stable")
        vids = vids[order]
        m = _normalize(embedding_matrix(group))[order]
        n = m.shape[0]
        kept = np.ones(n, bool)
        chunk = 2048
        for a in range(1, n, chunk):
            b = min(a + chunk, n)
            sims = m[a:b] @ m[:b].T             # rows a..b vs all before b
            ii = np.arange(a, b)[:, None]
            dominated = (sims >= cos) & (np.arange(b)[None, :] < ii)
            kept[a:b] = ~dominated.any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "centroid_id": group["centroid_id"].take(
                    pa.array(order, pa.int64())
                ),
                "kept": pa.array(kept, pa.bool_()),
            }
        )

    return (
        _emb(sf_dir, columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow", batch_size=4096)
        .groupby("centroid_id")
        .map_groups(cluster_dedup, batch_format="pyarrow")
    )


# ----------------------------------------------------- unigram_logprob


def _unigram_scored(sf_dir: str, carry_cols: list[str]):
    """Shared unigram cross-entropy scorer: per-doc mean -log2 p(w)
    under the CORPUS unigram distribution, with ``carry_cols`` passed
    through untouched. Two streaming passes: (1) the standard
    word-count reduction (per-batch dictionary counts,
    vocabulary-sized groupby) whose result broadcasts once via
    ``ray.put`` — web-scale vocabularies are ~10^7 rows / ~100 MB, a
    broadcast-class table; (2) a per-batch lookup + segment sum.
    Output columns: carry_cols + (n_words, xent)."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, _, _ = _doc_words(batch["text"])
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"token": enc.dictionary, "c": pa.array(cnt, pa.int64())})

    vocab_rows = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=8192)
        .groupby("token")
        .aggregate(Sum("c", alias_name="cnt"))
        .take_all()
    )
    toks = np.array([r["token"] for r in vocab_rows])
    cnts = np.array([r["cnt"] for r in vocab_rows], np.float64)
    order = np.argsort(toks)
    toks, cnts = toks[order], cnts[order]
    tot = float(cnts.sum())
    nlogp = -np.log2(cnts / tot)
    vref = ray.put({"toks": toks, "nlogp": nlogp})

    def score(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        v = get_broadcast(vref)
        flat, parents, n = _doc_words(batch["text"])
        fw = flat.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v["toks"], fw)
        w = v["nlogp"][pos]  # every token is in the corpus vocabulary
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        s = np.bincount(parents, weights=w, minlength=n)
        xent = np.where(n_words > 0, s / np.maximum(n_words, 1), 0.0)
        cols = {c: batch[c] for c in carry_cols}
        cols["n_words"] = pa.array(n_words, pa.int64())
        cols["xent"] = pa.array(xent, pa.float64())
        return pa.table(cols)

    return _docs(sf_dir, columns=carry_cols + ["text"]).map_batches(
        score, batch_format="pyarrow", batch_size=8192
    )


def unigram_logprob(sf_dir: str):
    """CCNet-style unigram cross-entropy scoring: score each doc by the
    mean -log2 p(w) of its tokens under the CORPUS unigram distribution
    (high = improbable/garbage text, the perplexity-filter signal).
    Output: (doc_id, n_words, xent). Both engines compute
    -log2(cnt / tot) with the same IEEE ops so 6-dp rounding agrees."""
    return _unigram_scored(sf_dir, ["doc_id"])


def perplexity_buckets(sf_dir: str):
    """CCNet's head/middle/tail split: per lang, rank docs by unigram
    cross-entropy (lowest = most fluent = head) and cut into three
    NTILE(3) buckets — the standard quality-stratification step before
    sampling a web corpus. Output: (doc_id, lang, xent, bucket) with
    bucket in {1, 2, 3} and xent rounded to 6 dp BEFORE ranking on
    both sides, so the order is robust to last-ulp summation
    differences (the tfidf_top_terms convention).

    Shape: the scored rows are numeric-only (doc_id, lang, xent) —
    text never leaves the scoring pass. Per-lang NTILE boundaries come
    from one groupby(lang) map_groups sort over those numeric rows
    (bounded lang enum, same stance as lang_len_percentiles; a
    10^12-doc run swaps in a sampled distributed quantile for the
    boundary step), and one broadcast assignment pass buckets every
    doc against its lang's two boundary (xent, doc_id) pairs."""
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def rounded(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "xent" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "xent": pa.array([], pa.float64()),
                }
            )
        x = np.round(batch["xent"].to_numpy(zero_copy_only=False), 6)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "xent": pa.array(x, pa.float64()),
            }
        )

    scored = (
        _unigram_scored(sf_dir, ["doc_id", "lang"])
        .map_batches(rounded, batch_format="pyarrow", batch_size=8192)
        .materialize()
    )

    def bounds(group: pa.Table) -> pa.Table:
        x = group["xent"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, x))
        x, d = x[order], d[order]
        n = x.shape[0]
        base, rem = divmod(n, 3)
        b1 = base + (1 if rem > 0 else 0)
        b2 = b1 + base + (1 if rem > 1 else 0)
        # NTILE boundary = last (xent, doc_id) pair of buckets 1 and 2;
        # an empty bucket (n < 3) degenerates to the previous boundary.
        i1, i2 = max(b1 - 1, 0), max(b2 - 1, 0)
        return pa.table(
            {
                "lang": pa.array([group["lang"][0].as_py()], pa.string()),
                "t1x": pa.array([x[i1]], pa.float64()),
                "t1d": pa.array([d[i1]], pa.int64()),
                "t2x": pa.array([x[i2]], pa.float64()),
                "t2d": pa.array([d[i2]], pa.int64()),
                "b1": pa.array([b1], pa.int64()),
                "b2": pa.array([b2], pa.int64()),
            }
        )

    brows = scored.groupby("lang").map_groups(
        bounds, batch_format="pyarrow"
    ).take_all()
    langs = np.array([r["lang"] for r in brows])
    order = np.argsort(langs)
    bt = {
        k: np.array([r[k] for r in brows])[order]
        for k in ("t1x", "t1d", "t2x", "t2d", "b1", "b2")
    }
    bt["langs"] = langs[order]
    bref = ray.put(bt)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "xent" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "xent": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        b = get_broadcast(bref)
        li = np.searchsorted(b["langs"], batch["lang"].to_numpy(zero_copy_only=False))
        x = batch["xent"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        le1 = (x < b["t1x"][li]) | ((x == b["t1x"][li]) & (d <= b["t1d"][li]))
        le2 = (x < b["t2x"][li]) | ((x == b["t2x"][li]) & (d <= b["t2d"][li]))
        # an empty NTILE bucket never receives rows
        le1 &= b["b1"][li] > 0
        le2 &= b["b2"][li] > 0
        bucket = np.where(le1, 1, np.where(le2, 2, 3)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    return scored.map_batches(assign, batch_format="pyarrow", batch_size=8192)


# ----------------------------------------------------- bigram_logprob


def bigram_logprob(sf_dir: str):
    """Bigram-LM cross-entropy scoring — the order-2 step up from
    unigram_logprob (CCNet scores with a 5-gram KenLM; the pipeline
    shape is this one): score each doc by the mean
    -log2 P(w_i | w_{i-1}) under the CORPUS bigram model, where
    P(w|v) = c2(v,w) / c1(v) and c1(v) = v's count as a bigram LEFT
    element, so P sums to 1 per context and every scored bigram exists
    in the model (self-trained — no smoothing term to disagree on).

    Passes mirror unigram_logprob: (1) two count reductions — bigram
    strings (left || ' ' || right, injective since tokens contain no
    whitespace) and left-token counts — broadcast once via ``ray.put``
    (at web scale, hash bigrams into ~2^20 feature buckets exactly as
    dsir_importance_weights documents to keep the model
    broadcast-sized); (2) one per-batch lookup + segment sum. Output
    (doc_id, n_bigrams, xent2); docs with < 2 tokens score 0.0. Both
    engines compute -log2(c2/c1) with the same IEEE ops."""
    from ray.data.aggregate import Sum

    def _batch_bigrams(batch: pa.Table):
        """(bigram strings, left tokens, parent doc rows, n rows)."""
        flat, parents, n = _doc_words(batch["text"])
        m = len(flat)
        if m < 2:
            return (
                pa.array([], pa.string()),
                pa.array([], pa.string()),
                np.empty(0, np.int64),
                n,
            )
        left, right = flat.slice(0, m - 1), flat.slice(1)
        valid = parents[1:] == parents[:-1]
        bg = pc.binary_join_element_wise(left, right, " ")
        vmask = pa.array(valid)
        return bg.filter(vmask), left.filter(vmask), parents[:-1][valid], n

    def partial_counts(batch: pa.Table) -> pa.Table:
        bg, _left, _par, _n = _batch_bigrams(batch)
        enc = bg.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"bg": enc.dictionary, "c": pa.array(cnt, pa.int64())})

    bigram_rows = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=8192)
        .groupby("bg")
        .aggregate(Sum("c", alias_name="cnt"))
        .take_all()
    )
    bgs = np.array([r["bg"] for r in bigram_rows])
    c2 = np.array([r["cnt"] for r in bigram_rows], np.float64)
    order = np.argsort(bgs)
    bgs, c2 = bgs[order], c2[order]
    # left-context counts derive from the bigram table itself (c1 = sum
    # of c2 over bigrams sharing the left token) — no third pass
    lefts = np.array([b.split(" ", 1)[0] for b in bgs.tolist()])
    if lefts.shape[0]:
        lorder = np.argsort(lefts, kind="stable")
        ls, cs = lefts[lorder], c2[lorder]
        starts = np.flatnonzero(np.concatenate(([True], ls[1:] != ls[:-1])))
        luniq = ls[starts]
        lcnt = np.add.reduceat(cs, starts)
    else:  # empty corpus: no bigrams anywhere
        luniq, lcnt = lefts, np.empty(0)
    vref = ray.put({"bgs": bgs, "c2": c2, "lv": luniq, "c1": lcnt})

    def score(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        v = get_broadcast(vref)
        bg, left, par, n = _batch_bigrams(batch)
        n_big = np.bincount(par, minlength=n).astype(np.int64)
        if len(bg):
            bgn = np.asarray(bg.to_pylist(), dtype=str)
            ln = np.asarray(left.to_pylist(), dtype=str)
            c2v = v["c2"][np.searchsorted(v["bgs"], bgn)]
            c1v = v["c1"][np.searchsorted(v["lv"], ln)]
            w = -np.log2(c2v / c1v)
            s = np.bincount(par, weights=w, minlength=n)
        else:
            s = np.zeros(n)
        xent2 = np.where(n_big > 0, s / np.maximum(n_big, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_big, pa.int64()),
                "xent2": pa.array(xent2, pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=8192
    )


# ----------------------------------------------------- bigram_pmi


def bigram_pmi(sf_dir: str, min_count: int = 5):
    """Collocation extraction by pointwise mutual information: for every
    bigram seen >= ``min_count`` times corpus-wide, emit
    PMI = log2(P(v,w) / (P_left(v) * P_right(w))) with all three
    probabilities estimated from the bigram table itself (left/right
    marginals), i.e. log2(c2 * N2 / (cL(v) * cR(w))). High-PMI bigrams
    are the corpus's multi-word expressions; low/negative PMI flags
    word-salad. Emitted UNROUNDED (round-half convention differs between
    engines; the harness's shared 6-dp normalization absorbs it).

    Scale shape matches bigram_logprob exactly: one vocabulary-sized
    count reduction (per-batch dictionary-encode + bincount partials,
    groupby-Sum combine); marginals derive from the reduced table by
    splitting the bigram key (tokens contain no whitespace, so the
    first space is unambiguous) — no extra corpus pass. At web scale,
    hash bigrams into ~2^20 feature buckets exactly as
    dsir_importance_weights documents; the output itself is
    model-sized, never doc-sized."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, parents, _n = _doc_words(batch["text"])
        m = len(flat)
        if m < 2:
            return pa.table(
                {"bg": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        left, right = flat.slice(0, m - 1), flat.slice(1)
        valid = pa.array(parents[1:] == parents[:-1])
        bg = pc.binary_join_element_wise(left, right, " ").filter(valid)
        enc = bg.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"bg": enc.dictionary, "c": pa.array(cnt, pa.int64())})

    rows = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=8192)
        .groupby("bg")
        .aggregate(Sum("c", alias_name="cnt"))
        .take_all()
    )
    empty = pa.table(
        {
            "bigram": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )
    if not rows:
        return empty
    bgs = np.array([r["bg"] for r in rows])
    c2 = np.array([r["cnt"] for r in rows], np.float64)
    n2 = c2.sum()

    def _marginal(tokens: np.ndarray):
        """(sorted unique tokens, summed c2 per token)."""
        order = np.argsort(tokens, kind="stable")
        ts, cs = tokens[order], c2[order]
        starts = np.flatnonzero(np.concatenate(([True], ts[1:] != ts[:-1])))
        return ts[starts], np.add.reduceat(cs, starts)

    parts = [b.split(" ", 1) for b in bgs.tolist()]
    lefts = np.array([p[0] for p in parts])
    rights = np.array([p[1] for p in parts])
    lv, cl = _marginal(lefts)
    rv, cr = _marginal(rights)
    keep = c2 >= min_count
    if not keep.any():
        return empty
    clb = cl[np.searchsorted(lv, lefts[keep])]
    crb = cr[np.searchsorted(rv, rights[keep])]
    pmi = np.log2(c2[keep] * n2 / (clb * crb))
    return pa.table(
        {
            "bigram": pa.array(bgs[keep], pa.string()),
            "n": pa.array(c2[keep].astype(np.int64), pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        }
    )


# ------------------------------------------ dsir_importance_weights


def dsir_importance_weights(sf_dir: str, target_mod: int = DSIR_TARGET_MOD):
    """DSIR-style data-selection weights (Xie et al., NeurIPS 2023):
    score every document by the MEAN per-token log-likelihood ratio
    between a TARGET unigram LM (docs with ``doc_id % target_mod == 0``
    — the same deterministic stand-in for a curated target domain that
    ``decontaminate`` uses for its benchmark set) and the RAW-corpus
    unigram LM, both Laplace-smoothed over the raw vocabulary. Positive
    weight = target-like; DSIR's selection step is a rank/threshold on
    this column.

    The published method hashes n-gram features into ~2^20 buckets so
    the two LMs stay broadcast-sized at 10^12 docs; at fixture scale
    exact word tokens keep the DuckDB oracle byte-exact. The scale shape
    is identical either way and mirrors unigram_logprob: (1) one
    vocabulary-sized count reduction (per-batch dictionary-encode +
    bincount partials, groupby-Sum combine) carrying BOTH the raw and
    target counts in the same rows, broadcast once via ``ray.put``;
    (2) a per-batch sorted lookup + segment mean. Nothing doc-sized
    shuffles; both engines compute log2((c+1)/(N+V)) with identical
    IEEE ops so 6-dp rounding agrees (sum ORDER differs, absorbed by
    the harness normalization)."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, parents, _ = _doc_words(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tok_is_tgt = (ids % target_mod == 0)[parents]
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        nvocab = len(enc.dictionary)
        cr = np.bincount(idx, minlength=nvocab).astype(np.int64)
        ct = np.bincount(idx[tok_is_tgt], minlength=nvocab).astype(np.int64)
        return pa.table(
            {
                "token": enc.dictionary,
                "cr": pa.array(cr, pa.int64()),
                "ct": pa.array(ct, pa.int64()),
            }
        )

    vocab_rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=8192)
        .groupby("token")
        .aggregate(Sum("cr", alias_name="crs"), Sum("ct", alias_name="cts"))
        .take_all()
    )
    toks = np.array([r["token"] for r in vocab_rows])
    cr = np.array([r["crs"] for r in vocab_rows], np.int64)
    ct = np.array([r["cts"] for r in vocab_rows], np.int64)
    order = np.argsort(toks)
    toks, cr, ct = toks[order], cr[order], ct[order]
    nvocab = toks.shape[0]
    nr, nt = int(cr.sum()), int(ct.sum())
    lr = np.log2((ct + 1.0) / float(nt + nvocab)) - np.log2(
        (cr + 1.0) / float(nr + nvocab)
    )
    vref = ray.put({"toks": toks, "lr": lr})

    def score(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        v = get_broadcast(vref)
        flat, parents, n = _doc_words(batch["text"])
        fw = flat.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v["toks"], fw)
        w = v["lr"][pos]  # every token is in the raw vocabulary
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        s = np.bincount(parents, weights=w, minlength=n)
        weight = np.where(n_words > 0, s / np.maximum(n_words, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "dsir_weight": pa.array(weight, pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=8192
    )


# --------------------------------------------- cluster_balanced_sample


def cluster_balanced_sample(sf_dir: str, k: int = KMEANS_K, m: int = BALANCED_SAMPLE_M):
    """Cluster-balanced deterministic sampling: assign every embedding to
    its nearest centroid, then keep the M members with the smallest
    (splitmix64(vec_id), vec_id) rank per cluster — the diversity-
    preserving subset selection used after SemDeDup-style clustering.

    Scale shape: assignment is the broadcast matmul (no shuffle); each
    batch reduces to at most K*M candidate rows BEFORE the groupby, so
    the shuffle moves K*M*n_batches 24-byte rows, never the corpus.
    Output: (vec_id, centroid_id) of kept members."""
    from hg_dedup_ray.functions.bloom import _splitmix

    cref = _centroid_ref(sf_dir, k)

    def candidates(batch: pa.Table) -> pa.Table:
        vids, cids = _assign_batch(batch, cref)
        keys = _splitmix(vids.astype(np.uint64))
        order = np.lexsort((vids, keys, cids))  # by cluster, then rank
        cs, vs, ks = cids[order], vids[order], keys[order]
        run_start = np.r_[True, cs[1:] != cs[:-1]]
        rank = np.arange(cs.shape[0]) - np.maximum.accumulate(
            np.where(run_start, np.arange(cs.shape[0]), 0)
        )
        keep = rank < m
        return pa.table(
            {
                "centroid_id": pa.array(cs[keep], pa.int64()),
                "vec_id": pa.array(vs[keep], pa.int64()),
                "rk": pa.array(ks[keep], pa.uint64()),
            }
        )

    def final_topm(group: pa.Table) -> pa.Table:
        vids = group["vec_id"].to_numpy(zero_copy_only=False)
        keys = group["rk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, keys))[:m]
        return pa.table(
            {
                "vec_id": pa.array(vids[order], pa.int64()),
                "centroid_id": group["centroid_id"].take(
                    pa.array(order, pa.int64())
                ),
            }
        )

    return (
        _emb(sf_dir, columns=["vec_id", "embedding"])
        .map_batches(candidates, batch_format="pyarrow", batch_size=4096)
        .groupby("centroid_id")
        .map_groups(final_topm, batch_format="pyarrow")
    )


# -------------------------------------------------- cluster_source_mix

MIX_NUM_BUCKETS = 64


def cluster_source_mix(sf_dir: str, k: int = KMEANS_K, num_buckets: int = MIX_NUM_BUCKETS):
    """Per-semantic-cluster source composition: join every embedding's
    centroid assignment to its document row (doc_id == vec_id) and count
    docs per (centroid_id, source) — the curation report that tells you
    which crawl sources dominate each semantic cluster.

    Ray Data has no join operator; this is the repo's bucketed hash-join
    composition: both sides emit key-only rows (id, centroid | id,
    source dict-code) tagged with ``id % num_buckets``, ONE groupby
    co-locates matching ids, each bucket matches via searchsorted and
    pre-aggregates to (centroid_id, source, n) partials, and a tiny
    final Sum merges across buckets. Nothing text-sized ever shuffles;
    both sides scale linearly with no broadcast requirement."""
    from ray.data.aggregate import Sum

    cref = _centroid_ref(sf_dir, k)

    def emb_rows(batch: pa.Table) -> pa.Table:
        vids, cids = _assign_batch(batch, cref)
        return pa.table(
            {
                "bucket": pa.array(vids % num_buckets, pa.int64()),
                "side": pa.array(np.zeros(vids.shape[0], np.int8), pa.int8()),
                "id": pa.array(vids, pa.int64()),
                "centroid_id": pa.array(cids, pa.int64()),
                "source": pa.array([""] * vids.shape[0], pa.string()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids % num_buckets, pa.int64()),
                "side": pa.array(np.ones(ids.shape[0], np.int8), pa.int8()),
                "id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(np.full(ids.shape[0], -1), pa.int64()),
                "source": batch["source"],
            }
        )

    left = _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        emb_rows, batch_format="pyarrow", batch_size=4096
    )
    right = _docs(sf_dir, columns=["doc_id", "source"]).map_batches(
        doc_rows, batch_format="pyarrow", batch_size=8192
    )

    def bucket_join(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        e = side == 0
        evids, ecids = ids[e], group["centroid_id"].to_numpy(zero_copy_only=False)[e]
        dids = ids[~e]
        dsrc = group["source"].filter(pa.array(~e))
        order = np.argsort(dids)
        dids_s = dids[order]
        pos = np.searchsorted(dids_s, evids)
        hit = (pos < dids_s.shape[0]) & (dids_s[np.minimum(pos, dids_s.shape[0] - 1)] == evids)
        if not hit.any():
            return pa.table(
                {
                    "centroid_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        enc = dsrc.take(pa.array(order[pos[hit]], pa.int64())).dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        scode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cid = ecids[hit]
        key = cid * (scode.max() + 1) + scode
        uk, cnt = np.unique(key, return_counts=True)
        base = scode.max() + 1
        return pa.table(
            {
                "centroid_id": pa.array(uk // base, pa.int64()),
                "source": enc.dictionary.take(pa.array(uk % base, pa.int64())),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    return (
        left.union(right)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pyarrow")
        .groupby(["centroid_id", "source"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


# -------------------------------------------------------- kmeans_lloyd

LLOYD_ITERS = 3


def kmeans_lloyd(sf_dir: str, k: int = KMEANS_K, iters: int = LLOYD_ITERS):
    """Real Lloyd k-means over the embeddings (cosine / spherical):
    ``iters`` rounds of [broadcast centroids -> per-batch partial sums ->
    driver update], then a final assignment pass. The iterative-
    refinement shape Ray Data lacks as a builtin: per round only
    K*(d+1) float64 partials per batch reach the driver (via take_all of
    batch-level partials), the corpus streams, and the update is a tiny
    driver-side normalize. Deterministic: seed = the K lowest-vec_id
    vectors, ties in argmax resolve to the lowest centroid index.

    Output: (vec_id, centroid_id, n_iters). Oracle-checked: the DuckDB
    SQL unrolls the same iterations (oracles._lloyd_sql — one CTE block
    per round over long-form vectors, all DOUBLE), value-checking the
    iterative refinement end-to-end; also pinned against a naive numpy
    reference in tests/test_curation.py."""
    ref = _centroid_ref(sf_dir, k)
    cmat = None

    for _ in range(iters):
        cref = ray.put(ray.get(ref)) if cmat is None else ray.put(
            {"cids": np.arange(k, dtype=np.int64), "cmat": cmat}
        )

        def partial(batch: pa.Table, cref=cref) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            c = get_broadcast(cref)
            m = _normalize(embedding_matrix(batch))
            best = np.argmax(m @ c["cmat"].T, axis=1)
            d = m.shape[1]
            sums = np.zeros((c["cmat"].shape[0], d))
            np.add.at(sums, best, m)
            cnt = np.bincount(best, minlength=c["cmat"].shape[0])
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(cnt), dtype=np.int64)),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        rows = (
            _emb(sf_dir, columns=["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow", batch_size=4096)
            .take_all()
        )
        base = ray.get(ref)["cmat"] if cmat is None else cmat
        d = base.shape[1]
        sums = np.zeros((k, d))
        cnt = np.zeros(k, np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["vsum"])
            cnt[r["cid"]] += r["n"]
        # empty cluster keeps its previous centroid (deterministic)
        new = np.where(cnt[:, None] > 0, sums / np.maximum(cnt[:, None], 1), base)
        cmat = _normalize(new)

    cref = ray.put({"cids": np.arange(k, dtype=np.int64), "cmat": cmat})

    def assign(batch: pa.Table) -> pa.Table:
        vids, cids = _assign_batch(batch, cref)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "centroid_id": pa.array(cids, pa.int64()),
                "n_iters": pa.array(np.full(vids.shape[0], iters), pa.int64()),
            }
        )

    return _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------------ soft dedup reweighting

SOFT_DEDUP_N = 4


def soft_dedup_weights(sf_dir: str, n: int = SOFT_DEDUP_N):
    """SoftDeDup-style data reweighting (He et al. 2024, arXiv:2407.06654):
    instead of REMOVING near-duplicates, down-weight "common" documents.
    Commonness here is the geometric mean of each doc's word-4-gram corpus
    frequency, so ``soft_weight = exp(-mean ln c(g))`` is 1.0 for a doc
    whose every 4-gram is corpus-unique and ~1/k for one duplicated k
    times. Emits (doc_id, n_windows, soft_weight) for EVERY doc; docs too
    short for a window keep weight 1.0.

    Shape: occurrence-level gram u64 rows (vectorized polynomial hashing,
    functions/wordgrams.py) -> hot-key+count pass (grams with c >= 2 only;
    the c == 1 majority contributes ln(1) = 0, so singleton grams never
    leave their block) -> one broadcast of (hot grams, ln counts) ->
    per-doc searchsorted lookup + segment sum. Gram identity is the u64
    hash (collision odds ~2^-64 per pair; the oracle uses exact strings —
    same documented contract as dup_ngram_stats)."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys_counts
    from hg_dedup_ray.functions.wordgrams import doc_tokens, word_gram_hashes
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def gram_rows(batch: pa.Table) -> pa.Table:
        th, doc_off = doc_tokens(batch["text"])
        g, _ = word_gram_hashes(th, doc_off, n)
        return pa.table({"gram": pa.array(g, pa.uint64())})

    grams = (
        _docs(sf_dir, columns=["text"])
        .map_batches(gram_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    hot, cnt = hot_u64_keys_counts(grams, "gram")  # keys come back sorted
    lref = ray.put({"keys": hot, "lnc": np.log(cnt.astype(np.float64))})

    def score(batch: pa.Table) -> pa.Table:
        v = get_broadcast(lref)
        th, doc_off = doc_tokens(batch["text"])
        g, goff = word_gram_hashes(th, doc_off, n)
        counts = np.diff(goff)
        keys, lnc = v["keys"], v["lnc"]
        if keys.shape[0] and g.shape[0]:
            pos = np.searchsorted(keys, g)
            safe = np.minimum(pos, keys.shape[0] - 1)
            w = np.where(keys[safe] == g, lnc[safe], 0.0)
        else:
            w = np.zeros(g.shape[0], np.float64)
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        s = np.zeros(counts.shape[0], np.float64)
        np.add.at(s, seg, w)
        nw = counts.astype(np.int64)
        weight = np.where(nw > 0, np.exp(-(s / np.maximum(nw, 1))), 1.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_windows": pa.array(nw, pa.int64()),
                "soft_weight": pa.array(weight, pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------- dup cluster size histogram


def dup_cluster_size_histogram(sf_dir: str, num_buckets: int = 64):
    """Distribution of exact-duplicate cluster sizes — the first chart of
    every dedup paper (how much of the corpus sits in k-way clusters).
    Rows: (cluster_size, n_clusters).

    Shape mirrors exact_dedup: only (fp:u64, partial count) shuffles, in
    a fixed 64-bucket combine (per-fp native aggregation would pay Ray's
    per-group cost on every DISTINCT doc); each bucket reduces its fps to
    cluster sizes and emits a LOCAL histogram, and a final native
    groupby-Sum over the tiny (size -> count) rows merges buckets."""
    from ray.data.aggregate import Sum

    from hg_dedup_ray.stages import textstats

    def partial(batch: pa.Table) -> pa.Table:
        h = textstats.content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        if fp.shape[0] == 0:
            return pa.table(
                {
                    "cbucket": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.uint64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        fp = np.sort(fp)
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        c = np.diff(np.concatenate((bnd, [fp.shape[0]]))).astype(np.int64)
        fp = fp[bnd]
        return pa.table(
            {
                "cbucket": pa.array((fp % num_buckets).astype(np.int64), pa.int64()),
                "fp": pa.array(fp, pa.uint64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    def bucket_hist(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp, kind="stable")
        fp, c = fp[order], c[order]
        bnd = np.flatnonzero(np.concatenate(([True], fp[1:] != fp[:-1])))
        sizes = np.add.reduceat(c, bnd)
        u, k = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(u.astype(np.int64), pa.int64()),
                "n_partial": pa.array(k.astype(np.int64), pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("cbucket")
        .map_groups(bucket_hist, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_partial", alias_name="n_clusters"))
    )
    return out


# --------------------------------------------- source mixture weighting


def source_mix_weights(sf_dir: str, alpha: float = 0.7):
    """Temperature-scaled sampling weights per source (the multilingual-LM
    mixing rule, p_s proportional to n_s^alpha at alpha = 0.7 — upweights
    tail sources, damps head ones). Rows: (source, n_docs, mix_weight),
    weights summing to 1. Source cardinality is bounded (domains/crawls),
    so the native Count aggregate and the driver-side normalize are over
    a broadcast-class table at any corpus size."""
    from ray.data.aggregate import Count

    rows = (
        _docs(sf_dir, columns=["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .take_all()
    )
    src = [r["source"] for r in rows]
    nd = np.array([r["n_docs"] for r in rows], np.float64)
    p = np.power(nd, alpha)
    z = float(p.sum())
    w = p / z if z > 0 else p
    return pa.table(
        {
            "source": pa.array(src, pa.string()),
            "n_docs": pa.array(nd.astype(np.int64), pa.int64()),
            "mix_weight": pa.array(w, pa.float64()),
        }
    )


# ---------------------------------------------------- curation_cascade


def curation_cascade(sf_dir: str):
    """The canonical webtext tier pipeline as ONE operator: lang-ID gate
    -> Gopher quality gate -> exact keep-first dedup among SURVIVORS
    (CCNet's lang/quality ordering, Rae et al. 2021 section A1.2's gate
    chain).

    Per-doc verdict: (doc_id, lang_ok, quality_ok, drop_stage, keep)
    where drop_stage is the FIRST failed tier ('lang' | 'quality' |
    'duplicate') or 'kept', and keep == (drop_stage = 'kept').

    The dedup tier genuinely runs over gate SURVIVORS only. With the
    text-pure gates used here every copy of a text shares its gate
    outcome, so the survivor-restricted keep-first happens to equal the
    global per-text keep-first — but the cascade structure is what
    gives first-failed-stage attribution, and it stays correct when a
    gate becomes non-text-pure (URL blocklists, per-source rules),
    where restricting dedup to survivors and a column-AND diverge.

    Scale shape: ONE streaming pass over text computes both gates and
    the u64 content fingerprint per batch (the lang_id and
    _gopher_stats_batch kernels, each individually oracle-checked, plus
    blake2b-8); only (doc_id, 2 bools, fp) is materialized. The dedup
    tier reuses _exact_keeper_ids' fp/partial-min shape on the survivor
    subset (precomputed_fp — text is never re-read), keeper ids
    broadcast once, and a stateless flagging pass labels every doc.
    """
    from hg_dedup_ray.pipelines.queries import _exact_keeper_ids
    from hg_dedup_ray.stages import textstats
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def pass1(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang_ok": pa.array([], pa.bool_()),
                "quality_ok": pa.array([], pa.bool_()),
                "fp": pa.array([], pa.uint64()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        lang = textstats.lang_id(batch)
        q = _gopher_stats_batch(batch)
        fp = textstats.content_hash_u64(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_ok": pc.equal(lang["lang_pred"], "en"),
                "quality_ok": q["keep"],
                "fp": fp["fp"],
            }
        )

    rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(pass1, batch_format="pyarrow", batch_size=8192)
        .materialize()
    )

    def survivors(batch: pa.Table) -> pa.Table:
        ok = pc.and_(batch["lang_ok"], batch["quality_ok"])
        return batch.filter(ok).select(["doc_id", "fp"])

    keep_ids = _exact_keeper_ids(
        rows.map_batches(survivors, batch_format="pyarrow"),
        precomputed_fp=True,
    )
    keep_ref = ray.put(keep_ids)

    def label(batch: pa.Table) -> pa.Table:
        ki = get_broadcast(keep_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        lo = batch["lang_ok"].to_numpy(zero_copy_only=False)
        qo = batch["quality_ok"].to_numpy(zero_copy_only=False)
        is_keep = np.zeros(d.shape[0], bool)
        if ki.shape[0]:
            pos = np.searchsorted(ki, d)
            inr = pos < ki.shape[0]
            is_keep[inr] = ki[pos[inr]] == d[inr]
        stage = np.where(
            ~lo, "lang",
            np.where(~qo, "quality", np.where(is_keep, "kept", "duplicate")),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_ok": batch["lang_ok"],
                "quality_ok": batch["quality_ok"],
                "drop_stage": pa.array(stage.tolist(), pa.string()),
                "keep": pa.array(is_keep, pa.bool_()),
            }
        )

    return rows.map_batches(label, batch_format="pyarrow")


# --------------------------------------------- hashed_classifier_score

CLASSIFIER_DIM = 4096  # feature-hash buckets (power of two, 12-bit lanes)


def _classifier_weights() -> np.ndarray:
    """Deterministic int64 weight table for the hashed linear scorer:
    weight[i] = splitmix64(i) % 2001 - 1000, i.e. ~uniform in
    [-1000, 1000]. Integer weights make the per-doc score an EXACT
    int64 sum — no float accumulation order to diverge between the
    distributed Ray sum and the DuckDB oracle. Built once per process
    (4096 * 8 bytes; cheaper to recompute per actor than to broadcast)."""
    from hg_dedup_ray.functions.wordgrams import _splitmix

    idx = np.arange(CLASSIFIER_DIM, dtype=np.uint64)
    return (_splitmix(idx) % np.uint64(2001)).astype(np.int64) - 1000


def hashed_classifier_score(sf_dir: str):
    """Feature-hashing linear text classifier INFERENCE as a streaming
    map stage — the shape of a fastText-style quality/domain classifier
    applied corpus-wide (Joulin et al. 2016: hashed bag-of-words ->
    linear layer): token -> 12-bit feature id -> weight lookup ->
    per-doc sum. The model here is a deterministic splitmix weight
    table so the whole inference pass is DuckDB-replicable and
    value-checked end-to-end, but the execution shape is the real one:
    weights resolved once per process, per-batch vectorized hashing
    (sketches.kmv_token_hashes, the oracle-replicated chain) + one
    bincount dot product, no shuffle, no driver state.

    Output per doc: (doc_id, n_tokens, score); a production filter
    thresholds score (see curation_cascade for gate composition)."""
    from hg_dedup_ray.pipelines.sketches import kmv_token_hashes

    weights = _classifier_weights()

    def score_batch(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        toks = pc.ascii_split_whitespace(
            pc.utf8_trim_whitespace(batch["text"])
        )
        flat = pc.list_flatten(toks)
        per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs_rep = np.repeat(np.arange(nb, dtype=np.int64), per_doc)
        n_tokens = np.zeros(nb, np.int64)
        sc = np.zeros(nb, np.int64)
        if len(flat):
            lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
            keep = lens > 0  # split('') yields [''] — drop phantom tokens
            if keep.any():
                h = kmv_token_hashes(flat.filter(pa.array(keep)))
                idx = (h % np.uint64(CLASSIFIER_DIM)).astype(np.int64)
                kept_docs = docs_rep[keep]
                n_tokens = np.bincount(kept_docs, minlength=nb).astype(
                    np.int64
                )
                # |score| < n_tokens * 1000 << 2^53: float64 bincount
                # accumulation is exact, cast back losslessly.
                sc = np.bincount(
                    kept_docs, weights=weights[idx], minlength=nb
                ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "score": pa.array(sc, pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score_batch, batch_format="pyarrow", batch_size=8192
    )


# ---------------------------------------------- quality_gate_ablation


def quality_gate_ablation(sf_dir: str):
    """Gate-level ABLATION of the Gopher quality filter: per gate, how
    many docs fail it at all (n_fail) and how many fail ONLY it
    (n_fail_alone — the docs that exact gate uniquely removes). The
    report a pipeline publishes before loosening or dropping a filter:
    a gate with n_fail_alone == 0 is fully shadowed by the others.

    Same integer cross-multiplication arithmetic as the keep flag
    (engine-exact), per-batch 4x2 partial counters, one tiny groupby
    Sum — per-doc rows never shuffle."""
    from ray.data.aggregate import Sum

    GATES = ("word_count", "mean_word_len", "alpha_ratio", "stopwords")

    def partials(batch: pa.Table) -> pa.Table:
        st = _gopher_stats_batch(batch)
        nw = st["n_words"].to_numpy(zero_copy_only=False)
        ch = st["total_word_chars"].to_numpy(zero_copy_only=False)
        al = st["n_alpha_words"].to_numpy(zero_copy_only=False)
        sp = st["n_stop_types"].to_numpy(zero_copy_only=False)
        ok = np.stack(
            [
                (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS),
                (ch >= GOPHER_MIN_MEAN_WL * nw)
                & (ch <= GOPHER_MAX_MEAN_WL * nw),
                GOPHER_ALPHA_DEN * al >= GOPHER_ALPHA_NUM * nw,
                sp >= GOPHER_MIN_STOP_TYPES,
            ]
        )
        fail = ~ok
        alone = fail & (ok.sum(axis=0) == len(GATES) - 1)
        return pa.table(
            {
                "gate": pa.array(list(GATES), pa.string()),
                "p_fail": pa.array(fail.sum(axis=1), pa.int64()),
                "p_alone": pa.array(alone.sum(axis=1), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("gate")
        .aggregate(
            Sum("p_fail", alias_name="n_fail"),
            Sum("p_alone", alias_name="n_fail_alone"),
        )
    )
