"""DuckDB oracle SQL paired with pipelines/queries.py.

Column names/types match the Ray results exactly (the driver sorts columns
by name before value-hashing). Ops without an entry here (suffix-array
dedup, MinHash clustering, SimHash, IVF ANN) are checked rows-only by the
driver and oracle-tested against the naive Python reimplementation in
tests/ instead.
"""

from __future__ import annotations

from hg_dedup_ray.pipelines.curation import (
    BALANCED_SAMPLE_M,
    DSIR_TARGET_MOD,
    GOPHER_ALPHA_DEN,
    GOPHER_ALPHA_NUM,
    GOPHER_MAX_MEAN_WL,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WL,
    GOPHER_MIN_STOP_TYPES,
    GOPHER_MIN_WORDS,
    GOPHER_STOPS,
    KMEANS_K,
    LLOYD_ITERS,
    SEMDEDUP_COS,
)
from hg_dedup_ray.pipelines.queries import ANN_K, ANN_NUM_QUERIES, NEAR_DUP_COS
from hg_dedup_ray.stages.textstats import EN_STOPWORDS

_stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_gopher_stops = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPS) + "]"

# --- SimHash oracle: DuckDB replication of stages/simhash.batch_simhash ---
# (FNV-poly 8-byte window hash -> splitmix64 -> per-bit majority vote).
# The FNV fold fits HUGEINT directly (FNV < 2^41 so h*FNV < 2^105); the two
# splitmix 64x64 multiplies use a 32-bit-split mulmod. Byte-exact on
# non-ASCII via hex(encode(...)); assumes len >= window bytes (true of the
# fixtures; see _byte_at).
_M64 = 1 << 64
_FNV_C = 1099511628211
_SM1 = 0xBF58476D1CE4E5B9
_SM2 = 0x94D049BB133111EB


def _byte_at(hx: str, p: str) -> str:
    """SQL: byte value at 1-based BYTE position ``p`` of ``hx``, a
    column holding ``hex(encode(s))``. This is what makes the hash
    oracles byte-exact on non-ASCII text: DuckDB's substr/ord are
    CHARACTER/codepoint-based, while every Ray-side hash folds UTF-8
    bytes — identical on ASCII only. hex() round-trips the raw bytes
    into a VARCHAR where byte p = 2 hex digits at char 2p-1."""
    return (
        f"((strpos('0123456789ABCDEF', substr({hx}, 2*({p}) - 1, 1)) - 1)"
        f" * 16 + strpos('0123456789ABCDEF', substr({hx}, 2*({p}), 1)) - 1)"
    )


def _byte_list(hx: str) -> str:
    """SQL: BIGINT list of all bytes of hex column ``hx`` — decode each
    byte ONCE per row, then window folds index the list (cheap array
    extracts instead of per-window substr chains)."""
    return (
        f"list_transform(range(1, length({hx}) // 2 + 1),"
        f" p -> {_byte_at(hx, 'p')})"
    )


def _pfx8_fold(hx: str, nb: str) -> str:
    """SQL: the kmv_token_hashes pre-mix fold (Horner over the first 8
    BYTES zero-padded, then one more step with the BYTE length) of the
    string whose hex form is column ``hx`` with octet_length ``nb``."""
    fold = (
        f"CAST(CASE WHEN {nb} >= 1 THEN {_byte_at(hx, '1')}"
        " ELSE 0 END AS HUGEINT)"
    )
    for j in range(2, 9):
        fold = (
            f"(({fold}) * {_FNV_C} + CASE WHEN {nb} >= {j}"
            f" THEN {_byte_at(hx, str(j))} ELSE 0 END) % {_M64}"
        )
    return f"(({fold}) * {_FNV_C} + {nb}) % {_M64}"


def _mulmod64(a: str, c: int) -> str:
    """SQL for (a * c) mod 2^64 with a a HUGEINT expr < 2^64, c a u64
    constant — split c into 32-bit halves so no product exceeds HUGEINT."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (
        f"((((({a}) // 4294967296) * {cl} + (({a}) % 4294967296) * {ch})"
        f" % 4294967296 * 4294967296 + (({a}) % 4294967296) * {cl}) % {_M64})"
    )


def _xorshift(a: str, s: int) -> str:
    """SQL for a ^ (a >> s), values < 2^64, via UBIGINT xor."""
    return (
        f"CAST(xor(CAST({a} AS UBIGINT), CAST(({a}) // {1 << s} AS UBIGINT))"
        " AS HUGEINT)"
    )


def _simhash_cte() -> str:
    """Shared CTE chain ending in sig(doc_id, simhash) — used by both the
    signature oracle and the banded near-dup-pair oracle."""
    fold = "CAST(bv[i+0] AS HUGEINT)"
    for j in range(1, 8):
        fold = f"(({fold}) * {_FNV_C} + bv[i+{j}]) % {_M64}"
    return f"""
        bsrc AS (
          SELECT doc_id, {_byte_list("hex(encode(text))")} AS bv
          FROM documents
        ),
        pos AS (
          SELECT doc_id, bv, unnest(range(1, len(bv) - 6)) AS i
          FROM bsrc
        ),
        raw AS (SELECT doc_id, ({fold}) AS h FROM pos),
        s1 AS (SELECT doc_id, {_xorshift('h', 30)} AS x FROM raw),
        s2 AS (SELECT doc_id, {_mulmod64('x', _SM1)} AS x FROM s1),
        s3 AS (SELECT doc_id, {_xorshift('x', 27)} AS x FROM s2),
        s4 AS (SELECT doc_id, {_mulmod64('x', _SM2)} AS x FROM s3),
        s5 AS (SELECT doc_id, CAST({_xorshift('x', 31)} AS UBIGINT) AS x
               FROM s4),
        bits AS (
          SELECT doc_id, b.b AS b,
                 sum(CASE WHEN (x >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM s5, (SELECT unnest(range(0, 64)) AS b) b
          GROUP BY doc_id, b.b
        ),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN vote > 0
                      THEN CAST((CAST(1 AS UBIGINT) << b) AS HUGEINT)
                      ELSE 0 END) AS UBIGINT) AS simhash
          FROM bits GROUP BY doc_id
        )"""


def _simhash_sql() -> str:
    return f"""
        WITH {_simhash_cte()}
        SELECT doc_id, simhash,
               (simhash >> 0)  & 65535 AS band0,
               (simhash >> 16) & 65535 AS band1,
               (simhash >> 32) & 65535 AS band2,
               (simhash >> 48) & 65535 AS band3
        FROM sig
    """


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Banded Hamming near-dup pairs on the SQL-computed signatures:
    pairs sharing >= 1 of the 4 16-bit bands with bit_count(xor) <=
    max_hamming — the LSH guarantee means this equals the Ray query's
    band-bucket search exactly (a <= 3-bit-distant pair always shares a
    band; a pair found in a bucket always shares that band)."""
    band_eq = " OR ".join(
        f"((a.simhash >> {16 * b}) & 65535 = (b.simhash >> {16 * b}) & 65535)"
        for b in range(4)
    )
    return f"""
        WITH {_simhash_cte()}
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                   AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE ({band_eq})
          AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _xorconst(a: str, c: int) -> str:
    """SQL for a ^ c, values < 2^64, via UBIGINT xor."""
    return f"CAST(xor(CAST({a} AS UBIGINT), CAST({c} AS UBIGINT)) AS HUGEINT)"


def _oph_sql(
    k: int = 16, num_perm: int = 128, seed: int = 42,
    src: str = "documents",
) -> str:
    """DuckDB replication of functions/minhash.batch_signatures_oph at
    the production config: FNV k-byte window fold -> xor seed-mix ->
    splitmix64 -> bin = top-7-bits -> per-(doc, bin) min -> rotation
    densification (empty bin borrows the nearest non-empty bin to the
    right cyclically, value re-mixed with shift * MIX2). Long output
    (doc_id, perm, sig) matching queries.minhash_sig_rows cell-for-cell.
    Assumes every doc has >= k bytes (true of the fixtures)."""
    pbits = num_perm.bit_length() - 1
    seed_mix = (seed * _SM1) % _M64
    fold = "CAST(bv[i+0] AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold}) * {_FNV_C} + bv[i+{j}]) % {_M64}"

    def chain(src: str, prefix: str) -> str:
        return f"""
        {prefix}1 AS (SELECT doc_id, bin0, {_xorshift('x', 30)} AS x FROM {src}),
        {prefix}2 AS (SELECT doc_id, bin0, {_mulmod64('x', _SM1)} AS x FROM {prefix}1),
        {prefix}3 AS (SELECT doc_id, bin0, {_xorshift('x', 27)} AS x FROM {prefix}2),
        {prefix}4 AS (SELECT doc_id, bin0, {_mulmod64('x', _SM2)} AS x FROM {prefix}3),
        {prefix}5 AS (SELECT doc_id, bin0, {_xorshift('x', 31)} AS x FROM {prefix}4)"""

    return f"""
        WITH bsrc AS (
          SELECT doc_id, {_byte_list("hex(encode(text))")} AS bv
          FROM {src}
        ),
        pos AS (
          SELECT doc_id, bv, unnest(range(1, len(bv) - {k - 2})) AS i
          FROM bsrc
        ),
        raw AS (SELECT doc_id, CAST(NULL AS BIGINT) AS bin0,
                       {_xorconst(f'(({fold}))', seed_mix)} AS x FROM pos),
        {chain('raw', 'w')},
        mins AS (
          SELECT doc_id, CAST(x // {1 << (64 - pbits)} AS BIGINT) AS bin,
                 min(CAST(x AS UBIGINT)) AS v
          FROM w5 GROUP BY 1, 2
        ),
        grid AS (
          SELECT d.doc_id, g.bin
          FROM (SELECT DISTINCT doc_id FROM {src}) d,
               (SELECT unnest(range(0, {num_perm})) AS bin) g
        ),
        holes AS (
          SELECT g.doc_id, g.bin
          FROM grid g LEFT JOIN mins m
            ON m.doc_id = g.doc_id AND m.bin = g.bin
          WHERE m.v IS NULL
        ),
        borrow AS (
          SELECT doc_id, bin, s, v FROM (
            SELECT h.doc_id, h.bin, s.s AS s, m.v,
                   row_number() OVER (PARTITION BY h.doc_id, h.bin
                                      ORDER BY s.s) AS rn
            FROM holes h
            JOIN (SELECT unnest(range(1, {num_perm})) AS s) s ON TRUE
            JOIN mins m ON m.doc_id = h.doc_id
                       AND m.bin = (h.bin + s.s) % {num_perm}
          ) WHERE rn = 1
        ),
        braw AS (
          SELECT doc_id, bin AS bin0,
                 (CAST(v AS HUGEINT) + (s * {_SM2}) % {_M64}) % {_M64} AS x
          FROM borrow
        ),
        {chain('braw', 'b')},
        dense AS (
          SELECT doc_id, bin0 AS bin, CAST(x AS UBIGINT) AS v FROM b5
          UNION ALL
          SELECT doc_id, bin, v FROM mins
        )
        SELECT doc_id, CAST(bin AS BIGINT) AS perm, v AS sig FROM dense
    """


def _kmv_sql(k: int = 16) -> str:
    """DuckDB replication of sketches.kmv_token_hashes + the KMV
    estimate: Horner fold of the first 8 chars (zero-padded via CASE),
    one more fold step with the length, splitmix64, then per-lang
    k-smallest-distinct and (k-1)*2^64 // h_k (exact count below k).
    Byte-exact on non-ASCII via hex(encode(token))."""
    fold = _pfx8_fold("thx", "tnb")
    return rf"""
        WITH toks0 AS (
          SELECT lang,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        toks AS (
          SELECT lang, hex(encode(token)) AS thx,
                 octet_length(encode(token)) AS tnb
          FROM toks0
        ),
        raw AS (SELECT lang, ({fold}) AS x FROM toks),
        k1 AS (SELECT lang, {_xorshift('x', 30)} AS x FROM raw),
        k2 AS (SELECT lang, {_mulmod64('x', _SM1)} AS x FROM k1),
        k3 AS (SELECT lang, {_xorshift('x', 27)} AS x FROM k2),
        k4 AS (SELECT lang, {_mulmod64('x', _SM2)} AS x FROM k3),
        k5 AS (SELECT DISTINCT lang,
                      CAST({_xorshift('x', 31)} AS UBIGINT) AS x FROM k4),
        r AS (SELECT lang, x,
                     row_number() OVER (PARTITION BY lang ORDER BY x) AS rn
              FROM k5),
        agg AS (SELECT lang, count(*) AS nd,
                       max(CASE WHEN rn = {k} THEN x END) AS hk
                FROM r GROUP BY lang)
        SELECT lang,
               CAST(CASE WHEN nd < {k} THEN nd
                    ELSE ({k - 1} * CAST('18446744073709551616' AS HUGEINT))
                         // CAST(hk AS HUGEINT)
                    END AS BIGINT) AS n_distinct_est
        FROM agg
    """


def _hashed_classifier_sql(dim: int = 4096) -> str:
    """DuckDB replication of curation.hashed_classifier_score: the KMV
    token-hash chain (prefix8+length Horner fold -> splitmix64) gives
    the feature id sm % dim, a SECOND splitmix64 chain over the feature
    id gives the integer weight (% 2001 - 1000), and the per-doc score
    is the exact BIGINT sum over token occurrences."""
    fold = _pfx8_fold("thx", "tnb")
    return rf"""
        WITH toks0 AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        toks AS (
          SELECT doc_id, hex(encode(token)) AS thx,
                 octet_length(encode(token)) AS tnb
          FROM toks0
        ),
        raw AS (SELECT doc_id, ({fold}) AS x FROM toks),
        h1 AS (SELECT doc_id, {_xorshift('x', 30)} AS x FROM raw),
        h2 AS (SELECT doc_id, {_mulmod64('x', _SM1)} AS x FROM h1),
        h3 AS (SELECT doc_id, {_xorshift('x', 27)} AS x FROM h2),
        h4 AS (SELECT doc_id, {_mulmod64('x', _SM2)} AS x FROM h3),
        feat AS (SELECT doc_id,
                        CAST({_xorshift('x', 31)} AS HUGEINT) % {dim} AS x
                 FROM h4),
        w1 AS (SELECT doc_id, {_xorshift('x', 30)} AS x FROM feat),
        w2 AS (SELECT doc_id, {_mulmod64('x', _SM1)} AS x FROM w1),
        w3 AS (SELECT doc_id, {_xorshift('x', 27)} AS x FROM w2),
        w4 AS (SELECT doc_id, {_mulmod64('x', _SM2)} AS x FROM w3),
        wv AS (SELECT doc_id,
                      CAST(CAST({_xorshift('x', 31)} AS HUGEINT) % 2001
                           AS BIGINT) - 1000 AS w
               FROM w4),
        agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                       sum(w)::BIGINT AS score
                FROM wv GROUP BY 1)
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(a.score, 0)::BIGINT AS score
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def _dup_ngram_coverage_sql(n: int = 3) -> str:
    """DuckDB replication of queries.dup_ngram_coverage: word-n-grams
    via lead() windows, duplicate starts via count() over (doc, gram),
    occurrence UNION via DISTINCT covered word positions (pos is 1-based
    from generate_subscripts on both the toks and covered sides). n must
    match the Ray-side default."""
    leads = " || ' ' || ".join(
        ["w"] + [f"lead(w, {k}) OVER win" for k in range(1, n)]
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
                 generate_subscripts(
                     regexp_split_to_array(trim(text), '\s+'), 1) AS pos
          FROM documents WHERE trim(text) <> ''
        ),
        words AS (
          SELECT doc_id, count(*)::BIGINT AS n_words,
                 sum(length(w))::BIGINT AS total_word_chars
          FROM toks GROUP BY 1
        ),
        grams AS (
          SELECT doc_id, pos, {leads} AS g
          FROM toks
          WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY g IS NOT NULL
        ),
        dupstarts AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY doc_id, g) AS c
            FROM grams
          ) WHERE c >= 2
        ),
        covered AS (
          SELECT DISTINCT s.doc_id, s.pos + k.range AS cpos
          FROM dupstarts s CROSS JOIN range({n}) k
        ),
        cov AS (
          SELECT t.doc_id, count(*)::BIGINT AS covered_words,
                 sum(length(t.w))::BIGINT AS covered_chars
          FROM toks t JOIN covered c
            ON t.doc_id = c.doc_id AND t.pos = c.cpos
          GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(w.n_words, 0)::BIGINT AS n_words,
               coalesce(cv.covered_words, 0)::BIGINT AS covered_words,
               coalesce(cv.covered_chars, 0)::BIGINT AS covered_chars,
               coalesce(w.total_word_chars, 0)::BIGINT AS total_word_chars
        FROM documents d
        LEFT JOIN words w USING (doc_id) LEFT JOIN cov cv USING (doc_id)
    """


def _cms_sql(depth: int = 4, width: int = 1024, topk: int = 20) -> str:
    """DuckDB replication of sketches.approx_counts_cms: the same
    token-hash chain as the KMV oracle, cells = depth 10-bit lanes of
    the splitmix output, counters = per-cell occurrence sums, estimate
    per distinct token = least over rows — the full Count-Min Sketch in
    SQL, then ORDER BY estimate DESC, token LIMIT topk."""
    fold = _pfx8_fold("hex(encode(token))", "octet_length(encode(token))")
    cell_exprs = ", ".join(
        f"(sm // {1 << (10 * r)}) % {width} AS c{r}" for r in range(depth)
    )
    ctr_ctes = ", ".join(
        f"ctr{r} AS (SELECT c{r} AS cell, sum(cnt) AS v"
        f" FROM cells GROUP BY c{r})"
        for r in range(depth)
    )
    joins = " ".join(
        f"JOIN ctr{r} j{r} ON j{r}.cell = cells.c{r}" for r in range(depth)
    )
    least = ", ".join(f"j{r}.v" for r in range(depth))
    return rf"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        tokcnt AS (SELECT token, count(*)::BIGINT AS cnt
                   FROM toks GROUP BY token),
        raw AS (SELECT token, cnt, ({fold}) AS x FROM tokcnt),
        c1 AS (SELECT token, cnt, {_xorshift('x', 30)} AS x FROM raw),
        c2 AS (SELECT token, cnt, {_mulmod64('x', _SM1)} AS x FROM c1),
        c3 AS (SELECT token, cnt, {_xorshift('x', 27)} AS x FROM c2),
        c4 AS (SELECT token, cnt, {_mulmod64('x', _SM2)} AS x FROM c3),
        smt AS (SELECT token, cnt,
                       CAST({_xorshift('x', 31)} AS HUGEINT) AS sm FROM c4),
        cells AS (SELECT token, cnt, {cell_exprs} FROM smt),
        {ctr_ctes}
        SELECT cells.token AS token,
               least({least})::BIGINT AS est_count
        FROM cells {joins}
        ORDER BY est_count DESC, token
        LIMIT {topk}
    """


def _lloyd_sql(k: int = KMEANS_K, iters: int = LLOYD_ITERS) -> str:
    """Unrolled spherical Lloyd k-means in SQL: one CTE block per
    iteration (assign -> per-cluster per-dim mean -> keep-previous for
    empty clusters -> renormalize), vectors in long (id, dim, v) form,
    everything cast to DOUBLE so both engines run the same IEEE ops.
    Assignment tie-break = lowest centroid id (row_number ORDER BY sum
    DESC, cid == np.argmax first-max). Per-dim sums differ from numpy's
    only in summation ORDER; the pipeline's assignments are pinned equal
    to the SQL at sf0.001 AND sf0.01 (well-separated fixture — no
    near-tie flips), making the iterative refinement value-checked
    end-to-end."""
    parts = [
        f"""
        e AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                 unnest(embedding)::DOUBLE AS v
          FROM embeddings
        ),
        nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nv FROM e GROUP BY vec_id),
        en AS (SELECT e.vec_id, dim,
                      CASE WHEN nv = 0 THEN v ELSE v / nv END AS v
               FROM e JOIN nrm USING (vec_id)),
        c0 AS (SELECT vec_id AS cid, dim, v FROM en WHERE vec_id < {k})"""
    ]
    for i in range(1, iters + 1):
        p = f"c{i-1}"
        parts.append(
            f"""
        a{i} AS (
          SELECT vec_id, cid FROM (
            SELECT en.vec_id, {p}.cid,
                   row_number() OVER (PARTITION BY en.vec_id
                       ORDER BY sum(en.v * {p}.v) DESC, {p}.cid) AS rn
            FROM en JOIN {p} USING (dim)
            GROUP BY en.vec_id, {p}.cid)
          WHERE rn = 1
        ),
        s{i} AS (
          SELECT a{i}.cid, en.dim, sum(en.v) AS sv, count(*) AS n
          FROM a{i} JOIN en USING (vec_id) GROUP BY 1, 2
        ),
        u{i} AS (
          SELECT p.cid, p.dim, coalesce(s{i}.sv / s{i}.n, p.v) AS v
          FROM {p} p LEFT JOIN s{i} ON s{i}.cid = p.cid AND s{i}.dim = p.dim
        ),
        un{i} AS (SELECT cid, sqrt(sum(v*v)) AS nv FROM u{i} GROUP BY cid),
        c{i} AS (SELECT u{i}.cid, dim,
                        CASE WHEN nv = 0 THEN v ELSE v / nv END AS v
                 FROM u{i} JOIN un{i} USING (cid))"""
        )
    final = f"""
        SELECT vec_id, cid AS centroid_id, {iters}::BIGINT AS n_iters FROM (
          SELECT en.vec_id, c{iters}.cid,
                 row_number() OVER (PARTITION BY en.vec_id
                     ORDER BY sum(en.v * c{iters}.v) DESC, c{iters}.cid) AS rn
          FROM en JOIN c{iters} USING (dim)
          GROUP BY en.vec_id, c{iters}.cid)
        WHERE rn = 1"""
    return "WITH " + ",".join(parts) + final


def _hll_sql(p: int = 12) -> str:
    """DuckDB replication of the HyperLogLog sketch
    (sketches.approx_distinct_hll over functions/hll.py): the exact
    wordgrams.token_hashes chain (Horner polynomial over token bytes with
    FNV base via list_reduce, + len * golden-gamma length salt,
    splitmix64), register = per-(lang, top-p-bits cell) max rank with
    rank derived from the INTEGER bit length of the suffix (no float
    log2), and the estimate in the same order-independent integer
    arithmetic as hll.estimate: S = Σ 2^(R-reg) summed as HUGEINT, ONE
    float division, floor(x+0.5) rounding, scalar ln for the
    linear-counting branch. Byte-exact on non-ASCII via
    hex(encode(token)), as with the simhash/KMV oracles."""
    from hg_dedup_ray.functions.hll import _alpha

    m = 1 << p
    w = 64 - p
    r_max = w + 1
    c_lit = repr(_alpha(m) * m * m * float(1 << r_max))
    q = 0x9E3779B97F4A7C15
    fold = (
        "list_reduce(list_prepend(CAST(0 AS HUGEINT),"
        f" list_transform({_byte_list('hex(encode(token))')},"
        " b0 -> CAST(b0 AS HUGEINT))),"
        f" (acc, b) -> (acc * {_FNV_C} + b) % {_M64})"
    )
    salted = f"(({fold}) + octet_length(encode(token)) * {q}) % {_M64}"
    return rf"""
        WITH toks AS (
          SELECT DISTINCT lang,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        raw AS (SELECT lang, ({salted}) AS x FROM toks),
        h1 AS (SELECT lang, {_xorshift('x', 30)} AS x FROM raw),
        h2 AS (SELECT lang, {_mulmod64('x', _SM1)} AS x FROM h1),
        h3 AS (SELECT lang, {_xorshift('x', 27)} AS x FROM h2),
        h4 AS (SELECT lang, {_mulmod64('x', _SM2)} AS x FROM h3),
        h5 AS (SELECT DISTINCT lang, {_xorshift('x', 31)} AS x FROM h4),
        ranks AS (
          SELECT lang, x // {1 << w} AS cell,
                 CASE WHEN x % {1 << w} = 0 THEN {r_max}
                      ELSE {r_max} - length(
                          format('{{:b}}', CAST(x % {1 << w} AS BIGINT)))
                 END AS rank
          FROM h5
        ),
        regs AS (SELECT lang, cell, max(rank) AS reg FROM ranks GROUP BY 1, 2),
        agg AS (
          SELECT lang,
                 {m} - count(*) AS zeros,
                 sum(CAST(CAST(1 AS BIGINT) << ({r_max} - reg) AS HUGEINT))
                   + CAST({m} - count(*) AS HUGEINT)
                     * CAST(CAST(1 AS BIGINT) << {r_max} AS HUGEINT) AS s_int
          FROM regs GROUP BY lang
        )
        SELECT lang,
               CAST(CASE WHEN zeros > 0
                          AND {c_lit} / CAST(s_int AS DOUBLE) <= {2.5 * m}
                    THEN floor({m} * ln({m}.0 / zeros) + 0.5)
                    ELSE floor({c_lit} / CAST(s_int AS DOUBLE) + 0.5)
               END AS BIGINT) AS n_distinct_est
        FROM agg
    """


def _substring_counts_sql() -> str:
    """Oracle for corpus_ops.substring_counts: the replace()-based
    non-overlapping occurrence count (same left-to-right non-overlap
    semantics as Arrow's count_substring). CROSS JOIN keeps zero-hit
    probes in the result."""
    from hg_dedup_ray.pipelines.corpus_ops import SUBSTRING_QUERIES

    vals = ", ".join(f"('{q}')" for q in SUBSTRING_QUERIES)
    return f"""
        WITH q(query) AS (VALUES {vals})
        SELECT q.query,
               CAST(coalesce(sum((length(d.text) - length(replace(d.text,
                    q.query, ''))) // length(q.query)), 0) AS BIGINT)
                   AS n_occurrences,
               CAST(coalesce(sum(CASE WHEN contains(d.text, q.query)
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs
        FROM q CROSS JOIN documents d GROUP BY q.query
    """


def _next_token_distribution_sql() -> str:
    """Oracle for corpus_ops.next_token_distribution — same replace()-
    based non-overlapping count as the substring_counts oracle, one row
    per (prefix, next_char) probe including zero-hit rows."""
    from hg_dedup_ray.pipelines.corpus_ops import NTD_ALPHABET, NTD_PREFIXES

    vals = ", ".join(
        f"('{p}', '{c}')" for p in NTD_PREFIXES for c in NTD_ALPHABET
    )
    return f"""
        WITH q(prefix, next_char) AS (VALUES {vals})
        SELECT q.prefix, q.next_char,
               CAST(coalesce(sum((length(d.text) - length(replace(d.text,
                    q.prefix || q.next_char, '')))
                    // length(q.prefix || q.next_char)), 0) AS BIGINT)
                   AS n_occurrences
        FROM q CROSS JOIN documents d GROUP BY q.prefix, q.next_char
    """


def _splitmix_doc_id_sql() -> str:
    """CTE chain computing sm = splitmix64(doc_id) over documents —
    shares the mulmod/xorshift helpers with the simhash oracle."""
    return f"""
        r0 AS (SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS x
               FROM documents),
        r1 AS (SELECT doc_id, lang, {_xorshift('x', 30)} AS x FROM r0),
        r2 AS (SELECT doc_id, lang, {_mulmod64('x', _SM1)} AS x FROM r1),
        r3 AS (SELECT doc_id, lang, {_xorshift('x', 27)} AS x FROM r2),
        r4 AS (SELECT doc_id, lang, {_mulmod64('x', _SM2)} AS x FROM r3),
        sm AS (SELECT doc_id, lang,
                      CAST({_xorshift('x', 31)} AS UBIGINT) AS sm FROM r4)
    """


_SAMPLE_RATE_CASE = """
    CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 5000 WHEN 'es' THEN 5000
              WHEN 'fr' THEN 5000 WHEN 'zh' THEN 5000 ELSE 1000 END
"""

_EXACT_CONTAINMENT_PAIRS_SQL = """
    WITH shingles AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(length(hx) // 2 - 7, 0) + 1),
          i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
      FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_id_a
    JOIN counts cb ON cb.doc_id = doc_id_b
    WHERE i * 1.0 / least(ca.n, cb.n) >= 0.6
"""

def _edit_distance_pairs_sql() -> str:
    """Oracle for queries.edit_distance_pairs: pairs within codepoint
    Levenshtein distance d.  Candidate generation mirrors the engine's
    completeness argument but in CHARACTER units (substr/length are
    char-based, the same unit levenshtein() measures): a pair within d
    edits shares >= max(Da, Db) - 8*d distinct 8-CHAR grams (one edit
    destroys at most 8 gram types), and a pair sharing NO gram needs
    max(len) < 8 + 8*d — those short pairs join by length window
    instead.  Both filters are exact necessary conditions; the final
    levenshtein() <= d test runs only on the filtered candidates (the
    unfiltered quadratic verify measured 300+ s at sf0.1)."""
    from hg_dedup_ray.pipelines.queries import EDIT_DISTANCE_D as D

    return f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
    ),
    mx AS (SELECT max(n) AS m FROM d),
    -- grams via a positions cross join, NOT per-row list_transform:
    -- the list formulation measured 25x slower feeding the self-join
    -- below (29.6 s vs 1.2 s for the inter CTE at sf0.1)
    g AS (
      SELECT DISTINCT doc_id, n, substr(text, i::INT, 8) AS gram
      FROM d, (SELECT unnest(range(1, (SELECT m FROM mx))) AS i) s
      WHERE i <= n - 7
    ),
    dc AS (SELECT doc_id, count(*) AS dcnt FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      WHERE abs(a.n - b.n) <= {D}
      GROUP BY 1, 2
    ),
    cand1 AS (
      SELECT ida, idb FROM inter
      JOIN dc ca ON ca.doc_id = ida JOIN dc cb ON cb.doc_id = idb
      WHERE shared >= greatest(ca.dcnt, cb.dcnt) - 8 * {D}
    ),
    cand2 AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb
      FROM d a JOIN d b
        ON a.doc_id < b.doc_id AND abs(a.n - b.n) <= {D}
      WHERE greatest(a.n, b.n) < 8 + 8 * {D}
    ),
    cand AS (SELECT * FROM cand1 UNION SELECT * FROM cand2)
    SELECT ida AS doc_id_a, idb AS doc_id_b,
           levenshtein(da.text, db.text)::BIGINT AS edit_distance
    FROM cand
    JOIN d da ON da.doc_id = cand.ida
    JOIN d db ON db.doc_id = cand.idb
    WHERE levenshtein(da.text, db.text) <= {D}
    """


_EXACT_JACCARD_PAIRS_SQL = """
    WITH shingles AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(length(hx) // 2 - 7, 0) + 1),
          i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
      FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_id_a
    JOIN counts cb ON cb.doc_id = doc_id_b
    WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
"""


def _bloom_sql(m: int = 4096, k: int = 3) -> str:
    """DuckDB replication of webclean.bloom_dedup_report: the same
    prefix8+length fold -> splitmix64 chain as the KMV oracle, probe
    positions = consecutive 12-bit lanes of the hash, and the
    sequential-Bloom semantics expressed order-free: a probe bit was
    set before doc d arrives iff some STRICTLY earlier doc probes the
    same position (window min over pos, ROWS ... 1 PRECEDING after a
    DISTINCT collapse of repeated probes within one doc)."""
    fold = _pfx8_fold("hex(encode(text))", "octet_length(encode(text))")
    shift = max((m - 1).bit_length(), 1)
    posrows = " UNION ALL ".join(
        f"SELECT doc_id, (sm // {1 << (shift * r)}) % {m} AS pos FROM smt"
        for r in range(k)
    )
    return f"""
        WITH raw AS (SELECT doc_id, text, ({fold}) AS x FROM documents),
        g1 AS (SELECT doc_id, text, {_xorshift('x', 30)} AS x FROM raw),
        g2 AS (SELECT doc_id, text, {_mulmod64('x', _SM1)} AS x FROM g1),
        g3 AS (SELECT doc_id, text, {_xorshift('x', 27)} AS x FROM g2),
        g4 AS (SELECT doc_id, text, {_mulmod64('x', _SM2)} AS x FROM g3),
        smt AS (SELECT doc_id, text,
                       CAST({_xorshift('x', 31)} AS HUGEINT) AS sm FROM g4),
        posrows AS ({posrows}),
        dist AS (SELECT DISTINCT doc_id, pos FROM posrows),
        w AS (SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY pos ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prior
              FROM dist),
        flags AS (SELECT doc_id, bool_and(prior IS NOT NULL) AS bloom_dup
                  FROM w GROUP BY doc_id),
        kd AS (SELECT doc_id,
                      doc_id > min(doc_id) OVER (PARTITION BY sm)
                        AS key_dup,
                      doc_id > min(doc_id) OVER (PARTITION BY text)
                        AS exact_dup
               FROM smt)
        SELECT f.doc_id, f.bloom_dup, kd.key_dup, kd.exact_dup
        FROM flags f JOIN kd USING (doc_id)
        ORDER BY f.doc_id
    """



def _lsh_sweep_sql() -> str:
    """Oracle for queries.lsh_param_sweep: the lsh_recall_report oracle's
    CTEs with one bands/cand pair per (num_bands, band_r) config, all
    folding the SAME 128-perm OPH signature by perm // r."""
    from hg_dedup_ray.pipelines.queries import LSH_SWEEP_CONFIGS

    cfgs = sorted(LSH_SWEEP_CONFIGS)
    blocks, selects = [], []
    for b, r in cfgs:
        blocks.append(f"""
        bands{b} AS (
          SELECT doc_id, perm // {r} AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        cand{b} AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands{b} a JOIN bands{b} b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )""")
        selects.append(f"""
        SELECT {b}::BIGINT AS num_bands, {r}::BIGINT AS band_r,
               (SELECT count(*) FROM expairs)::BIGINT AS n_exact_pairs,
               (SELECT count(*) FROM cand{b})::BIGINT AS n_candidate_pairs,
               (SELECT count(*) FROM cand{b} c JOIN expairs e
                 ON e.ua = c.ua AND e.ub = c.ub)::BIGINT AS n_hits""")
    return f"""
        WITH shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ua, b.doc_id AS ub, count(*) AS i
          FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        expairs AS (
          SELECT ua, ub FROM inter
          JOIN counts ca ON ca.doc_id = ua JOIN counts cb ON cb.doc_id = ub
          WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
        ),
        sigs AS ({_oph_sql()}),
        {','.join(blocks)}
        {' UNION ALL '.join(selects)}
        ORDER BY num_bands
    """


def _dedup_pressure_sql() -> str:
    """Oracle for queries.dedup_pressure_curve: the exact-Jaccard pair
    table with its value (same shingle CTEs as the pairs oracle, cut at
    tau_min), conditionally aggregated per threshold. j is the same
    int64/int64 double division the Ray side performs, so >= tau binning
    is bit-identical."""
    from hg_dedup_ray.pipelines.queries import DEDUP_PRESSURE_TAUS

    taus = sorted(DEDUP_PRESSURE_TAUS)
    tau_rows = " UNION ALL ".join(
        f"SELECT CAST({t} AS DOUBLE) AS tau" for t in taus
    )
    return f"""
        WITH shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
          FROM shingles a JOIN shingles b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT doc_id_a, doc_id_b,
                 i * 1.0 / (ca.n + cb.n - i) AS j
          FROM inter
          JOIN counts ca ON ca.doc_id = doc_id_a
          JOIN counts cb ON cb.doc_id = doc_id_b
          WHERE i * 1.0 / (ca.n + cb.n - i) >= {min(taus)}
        ),
        taus AS ({tau_rows})
        SELECT taus.tau,
               coalesce(sum(CASE WHEN p.j >= taus.tau THEN 1 END), 0)::BIGINT
                   AS n_pairs,
               count(DISTINCT CASE WHEN p.j >= taus.tau
                     THEN p.doc_id_b END)::BIGINT AS n_dropped_docs
        FROM taus LEFT JOIN pairs p ON TRUE
        GROUP BY taus.tau
        ORDER BY taus.tau
    """


def _text_hash_cte() -> str:
    """CTE chain ending in ``th(doc_id, text, th)`` where th =
    splitmix64(prefix8+length Horner fold of the WHOLE text) — the
    kmv_token_hashes chain applied per document, exactly as
    webclean.dedup_aware_split computes its content-split hash
    (byte-exact on non-ASCII, as with the bloom/KMV oracles)."""
    fold = _pfx8_fold("hex(encode(text))", "octet_length(encode(text))")
    return f"""
        traw AS (SELECT doc_id, text, ({fold}) AS x FROM documents),
        t1 AS (SELECT doc_id, text, {_xorshift('x', 30)} AS x FROM traw),
        t2 AS (SELECT doc_id, text, {_mulmod64('x', _SM1)} AS x FROM t1),
        t3 AS (SELECT doc_id, text, {_xorshift('x', 27)} AS x FROM t2),
        t4 AS (SELECT doc_id, text, {_mulmod64('x', _SM2)} AS x FROM t3),
        th AS (SELECT doc_id, text,
                      CAST({_xorshift('x', 31)} AS UBIGINT) AS th FROM t4)
    """


def _dedup_aware_split_sql() -> str:
    """Oracle for webclean.dedup_aware_split: heldout iff hash % 10 == 0,
    content hash = the text splitmix chain, naive hash = splitmix(doc_id)."""
    return f"""
        WITH {_text_hash_cte()},
        {_splitmix_doc_id_sql()}
        SELECT th.doc_id,
               CASE WHEN th.th % 10 = 0 THEN 'heldout' ELSE 'train' END
                   AS split_content,
               CASE WHEN sm.sm % 10 = 0 THEN 'heldout' ELSE 'train' END
                   AS split_naive
        FROM th JOIN sm ON sm.doc_id = th.doc_id
        ORDER BY th.doc_id
    """


def _split_leakage_sql() -> str:
    """Oracle for webclean.split_leakage_report: among texts with >= 2
    exact copies, a text leaks under a split iff its copies land on both
    sides (min flag 0 AND max flag 1 within the text group). The Ray
    side groups by blake2b-8 fp instead of raw text — identical barring
    a 64-bit collision, the standing exact_dedup assumption."""
    return f"""
        WITH {_text_hash_cte()},
        {_splitmix_doc_id_sql()},
        flags AS (
          SELECT th.text,
                 CAST(th.th % 10 = 0 AS INT) AS ch,
                 CAST(sm.sm % 10 = 0 AS INT) AS nh
          FROM th JOIN sm ON sm.doc_id = th.doc_id
        ),
        g AS (SELECT text, count(*) AS c,
                     max(ch) AS chx, min(ch) AS chn,
                     max(nh) AS nhx, min(nh) AS nhn
              FROM flags GROUP BY text),
        d AS (SELECT * FROM g WHERE c >= 2),
        agg AS (SELECT count(*)::BIGINT AS n_dup,
                       coalesce(sum(CASE WHEN chx = 1 AND chn = 0
                                    THEN 1 END), 0)::BIGINT AS leak_c,
                       coalesce(sum(CASE WHEN nhx = 1 AND nhn = 0
                                    THEN 1 END), 0)::BIGINT AS leak_n
                FROM d)
        SELECT 'content' AS split_mode, n_dup AS n_dup_texts,
               leak_c AS n_leaky_texts FROM agg
        UNION ALL
        SELECT 'naive', n_dup, leak_n FROM agg
        ORDER BY split_mode
    """


def _window_apply_sql(minlen: int = 24) -> str:
    """Oracle for queries.window_dedup_apply: the window_dedup_report
    island SQL, then the reference UTF-8 clip (advance s / retreat e
    over continuation bytes, exclusive end == doc length exempt,
    write_back_to_jsonl_sharded.py:75-83) as 3-deep CASE chains over
    hex-decoded bytes, then the kept slices rebuilt by hex-slice
    string_agg + from_hex + decode — byte-identical strings to the Ray
    excision kernel on any UTF-8 input."""
    def cont(p: str) -> str:
        b = _byte_at("hx", f"({p}) + 1")  # 0-based pos -> 1-based byte
        return f"(({b}) >= 128 AND ({b}) < 192)"

    # s' = s advanced over <= 3 continuation bytes (bounded by nb)
    s_clip = f"""CASE WHEN s0 < nb AND {cont('s0')} THEN
          CASE WHEN s0 + 1 < nb AND {cont('s0 + 1')} THEN
            CASE WHEN s0 + 2 < nb AND {cont('s0 + 2')} THEN s0 + 3
                 ELSE s0 + 2 END
          ELSE s0 + 1 END
        ELSE s0 END"""
    # e' = e retreated over <= 3 continuation bytes unless e == nb
    e_clip = f"""CASE WHEN e0 = nb THEN e0 ELSE
          CASE WHEN {cont('e0')} THEN
            CASE WHEN {cont('e0 - 1')} THEN
              CASE WHEN {cont('e0 - 2')} THEN e0 - 3 ELSE e0 - 2 END
            ELSE e0 - 1 END
          ELSE e0 END
        END"""
    return f"""
        WITH hdoc AS (
          SELECT doc_id, text, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS nb
          FROM documents
        ),
        w AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(nb - {minlen - 1}, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(nb - {minlen - 1}, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, {2 * minlen}))) AS win
          FROM hdoc
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM w GROUP BY win
        ),
        rp AS (
          SELECT w.doc_id, w.pos
          FROM w JOIN firsts USING (win)
          WHERE firsts.n >= 2
            AND w.doc_id * 4294967296 + w.pos <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > {minlen}
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        isl3 AS (
          SELECT doc_id, island, min(pos) AS s0, max(pos) + {minlen} AS e0
          FROM isl2 GROUP BY doc_id, island
        ),
        isl4 AS (
          SELECT i.doc_id, i.island,
                 ({s_clip}) AS s1, ({e_clip}) AS e1
          FROM isl3 i JOIN hdoc USING (doc_id)
        ),
        pieces AS (
          SELECT doc_id,
                 lag(e1, 1, 0) OVER (PARTITION BY doc_id ORDER BY s1)
                     AS ks,
                 s1 AS ke
          FROM isl4
          UNION ALL
          SELECT i.doc_id, max(i.e1) AS ks, any_value(h.nb) AS ke
          FROM isl4 i JOIN hdoc h USING (doc_id) GROUP BY i.doc_id
        ),
        rebuilt AS (
          SELECT p.doc_id,
                 string_agg(substr(h.hx, (2*p.ks + 1)::INT,
                                   (2*(p.ke - p.ks))::INT),
                            '' ORDER BY p.ks) AS hkept
          FROM pieces p JOIN hdoc h USING (doc_id)
          GROUP BY p.doc_id
        ),
        agg AS (
          SELECT doc_id, count(*)::BIGINT AS n_removed_ranges,
                 sum(e1 - s1)::BIGINT AS removed_bytes
          FROM isl4 GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_removed_ranges, 0)::BIGINT AS n_removed_ranges,
               coalesce(a.removed_bytes, 0)::BIGINT AS removed_bytes,
               CASE WHEN r.hkept IS NULL THEN d.text
                    ELSE decode(from_hex(r.hkept)) END AS dedup_text
        FROM hdoc d
        LEFT JOIN rebuilt r USING (doc_id)
        LEFT JOIN agg a USING (doc_id)
    """


ORACLE_SQL = {
    "dedup_pressure_curve": _dedup_pressure_sql(),
    "lsh_param_sweep": _lsh_sweep_sql(),
    "dedup_aware_split": _dedup_aware_split_sql(),
    "split_leakage_report": _split_leakage_sql(),
    "simhash_sigs": _simhash_sql(),
    "simhash_near_dup_pairs": _simhash_pairs_sql(),
    "minhash_sig_rows": _oph_sql(),
    "stratified_sample": f"""
        WITH {_splitmix_doc_id_sql()}
        SELECT doc_id, lang FROM sm
        WHERE sm % 10000 < {_SAMPLE_RATE_CASE}
    """,
    # Global deterministic shuffle rank: splitmix64(doc_id) is a u64
    # bijection, so ORDER BY sm is a total order with no ties.
    "deterministic_shuffle": f"""
        WITH {_splitmix_doc_id_sql()}
        SELECT doc_id,
               (row_number() OVER (ORDER BY sm) - 1)::BIGINT AS shuffle_rank
        FROM sm
    """,
    # Per-source quota: rank docs within source by the same splitmix64
    # priority, keep rank < 15 (webclean.CAP_PER_SOURCE).
    "cap_per_source": f"""
        WITH {_splitmix_doc_id_sql()},
        r AS (
          SELECT d.doc_id, d.source,
                 (row_number() OVER (PARTITION BY d.source ORDER BY s.sm)
                  - 1)::BIGINT AS src_rank
          FROM documents d JOIN sm s ON s.doc_id = d.doc_id
        )
        SELECT doc_id, source, src_rank FROM r WHERE src_rank < 15
    """,
    "decontaminate": r"""
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        grams AS (
            SELECT doc_id, unnest(list_transform(
                       range(1, greatest(len(w) - 7, 0) + 1),
                       i -> array_to_string(w[i:i+7], ' '))) AS g
            FROM words
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 19 = 0),
        flags AS (
            SELECT g.doc_id, bool_or(b.g IS NOT NULL) AS contaminated
            FROM grams g LEFT JOIN bench b ON g.g = b.g
            WHERE g.doc_id % 19 <> 0
            GROUP BY g.doc_id
        )
        SELECT d.doc_id, coalesce(f.contaminated, FALSE) AS contaminated
        FROM documents d LEFT JOIN flags f ON d.doc_id = f.doc_id
        WHERE d.doc_id % 19 <> 0
    """,
    "redact_pii": r"""
        SELECT event_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(props,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\d+', '<NUM>', 'g') AS redacted,
               len(regexp_extract_all(props,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                 AS n_email,
               len(regexp_extract_all(props,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
               len(regexp_extract_all(props, '\d+'))::BIGINT AS n_num
        FROM events
    """,
    "json_props_stats": r"""
        SELECT event_type,
               count(*)::BIGINT AS n_events,
               sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1)
                   AS BIGINT))::BIGINT AS sum_k,
               round(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1)
                   AS BIGINT)) * 1.0 / count(*), 6) AS avg_k
        FROM events GROUP BY event_type
    """,
    "pack_sequences": r"""
        WITH counts AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM counts
        )
        SELECT doc_id, n_tokens,
               (cum_before // 256)::BIGINT AS pack_id,
               (cum_before % 256)::BIGINT AS pack_off
        FROM cum
    """,
    "ngram_jaccard_exact_pairs": _EXACT_JACCARD_PAIRS_SQL,
    "ngram_containment_pairs": _EXACT_CONTAINMENT_PAIRS_SQL,
    "edit_distance_pairs": _edit_distance_pairs_sql(),
    # Hamming join: no filter theory needed — the equal-CHAR-length
    # join is tiny at fixture scale. DuckDB's hamming() is BYTE-based
    # (it errors on byte-unequal strings even at equal char length),
    # so the codepoint distance is a per-position substr mismatch
    # count instead; empty-doc pairs join separately (no positions)
    "hamming_distance_pairs": """
        WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        mx AS (SELECT coalesce(max(n), 0) AS m FROM d),
        cand AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 a.text AS ta, b.text AS tb, a.n AS n
          FROM d a JOIN d b ON a.n = b.n AND a.doc_id < b.doc_id
          WHERE a.n > 0
        ),
        hd AS (
          SELECT ida, idb,
                 count(*) FILTER (
                   WHERE substr(ta, i::INT, 1) <> substr(tb, i::INT, 1)
                 ) AS hd
          FROM cand, (SELECT unnest(range(1, (SELECT m FROM mx) + 1)) AS i) s
          WHERE i <= n GROUP BY ida, idb
        )
        SELECT ida AS doc_id_a, idb AS doc_id_b, hd::BIGINT AS hamming_distance
        FROM hd WHERE hd <= 64
        UNION ALL
        SELECT a.doc_id, b.doc_id, 0::BIGINT
        FROM d a JOIN d b ON a.n = 0 AND b.n = 0 AND a.doc_id < b.doc_id
    """,
    # threshold-tuning curve over the SAME pair SQL — the ds literals
    # are queries.EDIT_PRESSURE_DS and max(ds) == EDIT_DISTANCE_D, so
    # one pairs CTE serves every bin
    "edit_distance_pressure": f"""
        WITH pairs AS MATERIALIZED ({_edit_distance_pairs_sql()}),
        ds(dv) AS (VALUES (0), (4), (8))
        SELECT dv::BIGINT AS d,
               (SELECT count(*) FROM pairs
                WHERE edit_distance <= dv)::BIGINT AS n_pairs,
               (SELECT count(DISTINCT doc_id_b) FROM pairs
                WHERE edit_distance <= dv)::BIGINT AS n_dropped_docs
        FROM ds ORDER BY dv
    """,
    # pairwise keep-first over the SAME pair SQL: drop = distinct
    # doc_id_b side (pairs are canonically a < b)
    "edit_dedup_keep_first": f"""
        WITH pairs AS MATERIALIZED ({_edit_distance_pairs_sql()})
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT DISTINCT doc_id_b FROM pairs)
    """,
    # min-label closure over the SAME pair SQL (the containment_clusters
    # recursive-CTE shape; the pairs CTE nests its own WITH chain)
    "edit_distance_clusters": f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({_edit_distance_pairs_sql()}),
        edges AS MATERIALIZED (
                  SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
                  UNION SELECT doc_id_b, doc_id_a FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        )
        SELECT n AS doc_id, min(lab)::BIGINT AS cluster_id FROM walk GROUP BY n
    """,
    # The LSH-candidate variant verifies candidates EXACTLY, so its output
    # equals the exact answer whenever LSH recall is 1.0 — which holds
    # deterministically on the driver fixture (lsh_recall_report measures
    # it; verified pair-set-equal to ngram_jaccard_exact_pairs at sf0.01).
    # The oracle therefore checks recall AND precision of the LSH cascade.
    "ngram_jaccard_pairs": _EXACT_JACCARD_PAIRS_SQL,
    "segment_dedup_stats": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 unnest(range(len(string_split(text, ' ')))) AS wi
          FROM documents
        ),
        segs AS (
          SELECT doc_id, wi // 16 AS seg_no,
                 string_agg(word, ' ' ORDER BY wi) AS seg
          FROM w GROUP BY doc_id, wi // 16
        ),
        marked AS (
          SELECT doc_id, seg_no,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
          FROM segs
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_segments,
               sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_segments
        FROM marked GROUP BY doc_id
    """,
    "segment_dedup_apply": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 unnest(range(len(string_split(text, ' ')))) AS wi
          FROM documents
        ),
        segs AS (
          SELECT doc_id, wi // 16 AS seg_no,
                 string_agg(word, ' ' ORDER BY wi) AS seg
          FROM w GROUP BY doc_id, wi // 16
        ),
        marked AS (
          SELECT doc_id, seg_no, seg,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
          FROM segs
        ),
        kept AS (SELECT doc_id, seg_no, seg FROM marked WHERE rn = 1)
        SELECT d.doc_id,
               coalesce(string_agg(k.seg, ' ' ORDER BY k.seg_no), '')
                   AS text_deduped,
               count(k.seg)::BIGINT AS n_kept_segments
        FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
        GROUP BY d.doc_id
    """,
    "exact_dedup": """
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
    "normalized_exact_dedup": """
        WITH n AS (
          SELECT doc_id, lang, source, n_chars,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
          FROM documents
        )
        SELECT doc_id, lang, source, n_chars FROM n
        WHERE doc_id IN (SELECT min(doc_id) FROM n GROUP BY nt)
    """,
    "bpe_token_counts": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               ))::BIGINT AS n_bpe_tokens
        FROM documents
    """,
    "tokenizer_fertility": r"""
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(len(regexp_extract_all(text,
                   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               )))::BIGINT AS sum_bpe_tokens,
               sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS sum_words,
               sum(length(text))::BIGINT AS sum_chars
        FROM documents GROUP BY lang
    """,
    "asof_join_events_orders": """
        WITH ranked AS (
          SELECT e.event_id, e.user_id,
                 o.o_orderkey, o.o_orderdate, o.o_totalprice,
                 row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                 ) AS rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id,
               o_orderkey  AS last_order_key,
               o_orderdate AS last_order_date,
               o_totalprice AS last_order_price
        FROM ranked WHERE rn = 1
    """,
    "range_join_orders_prior_year": """
        SELECT a.o_orderkey,
               count(b.o_orderkey)::BIGINT AS n_prior_year,
               round(coalesce(sum(b.o_totalprice), 0), 6) AS sum_prior_year
        FROM orders a LEFT JOIN orders b
          ON b.o_custkey = a.o_custkey
         AND b.o_orderdate < a.o_orderdate
         AND b.o_orderdate >= a.o_orderdate - INTERVAL 365 DAY
        GROUP BY a.o_orderkey
    """,
    "events_hourly": """
        SELECT user_id,
               (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket,
               count(*)::BIGINT AS n,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY user_id, hour_bucket
    """,
    "orders_per_nation": """
        SELECT n_name, count(*)::BIGINT AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "pricing_summary": """
        -- exact integer-unit sums (cents / 1e-4 dollars) divided once at
        -- the end: bit-identical float64 vs the Ray side's int64 Sum
        -- aggregates regardless of distributed reduction order
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS sum_disc_price,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "event_sessions": """
        SELECT user_id,
               count(*)::BIGINT AS n_events,
               sum(CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)::BIGINT AS n_sessions
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        )
        GROUP BY user_id
    """,
    "event_type_stats": """
        SELECT event_type, count(*)::BIGINT AS n,
               round(sum(value), 6) AS sum_value,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY event_type
    """,
    "top_docs_by_chars": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 10
    """,
    "token_counts": r"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                   AS n_tokens,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
    "quality_scores": rf"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                   AS n_words,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x IN ({_stops}))) AS n_stopwords,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha_chars
        FROM documents
    """,
    "lang_id": rf"""
        SELECT doc_id,
               CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                         x -> x IN ({_stops}))) > 0
                    THEN 'en' ELSE 'und' END AS lang_pred
        FROM documents
    """,
    "lang_id_confusion": rf"""
        WITH pred AS (
          SELECT doc_id,
                 CASE WHEN len(list_filter(
                          regexp_split_to_array(trim(text), '\s+'),
                          x -> x IN ({_stops}))) > 0
                      THEN 'en' ELSE 'und' END AS lang_pred
          FROM documents
        )
        SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY 1, 2
    """,
    "fingerprints": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    "unigram_counts": r"""
        SELECT token, count(*)::BIGINT AS cnt FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ) GROUP BY token
    """,
    "corpus_stats": """
        SELECT lang, source, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars
        FROM documents GROUP BY lang, source
    """,
    "ann_topk": f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < {ANN_NUM_QUERIES}),
             s AS (SELECT q.qid, e.vec_id AS nid,
                          list_cosine_similarity(q.qe, e.embedding) AS sim
                   FROM q, embeddings e WHERE e.vec_id <> q.qid)
        SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                       AS rank
            FROM s)
        WHERE rank <= {ANN_K}
    """,
    "ann_ivfpq_exhaustive": f"""
        -- exhaustive probing + an all-covering full-precision refine
        -- make IVF-PQ exact, so brute-force top-k over the ann_topk
        -- query set is a valid oracle for the whole IVFADC+R machinery
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < {ANN_NUM_QUERIES}),
             s AS (SELECT q.qid, e.vec_id AS nid,
                          list_cosine_similarity(q.qe, e.embedding) AS sim
                   FROM q, embeddings e WHERE e.vec_id <> q.qid)
        SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                       AS rank
            FROM s)
        WHERE rank <= {ANN_K}
    """,
    "ann_ivf_exhaustive": f"""
        -- nprobe == n_cells makes IVF exhaustive == brute force, so the
        -- plain all-queries top-k is a valid oracle for the IVF machinery
        WITH s AS (SELECT q.vec_id AS qid, e.vec_id AS nid,
                          list_cosine_similarity(q.embedding, e.embedding) AS sim
                   FROM embeddings q, embeddings e WHERE e.vec_id <> q.vec_id)
        SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                       AS rank
            FROM s)
        WHERE rank <= {ANN_K}
    """,
    "top_docs_per_lang": """
        SELECT lang, doc_id, n_chars, lang_rank FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC, doc_id)
                       AS lang_rank
            FROM documents)
        WHERE lang_rank <= 3
    """,
    "lang_len_percentiles": """
        SELECT lang, count(*)::BIGINT AS n_docs,
               quantile_disc(n_chars, 0.5)::BIGINT AS p50_chars,
               quantile_disc(n_chars, 0.9)::BIGINT AS p90_chars
        FROM documents GROUP BY lang
    """,
    # TPC-H Q18: top-100 orders by total lineitem quantity > 250, with
    # customer name; fully deterministic order (price DESC, date, key).
    "large_volume_orders": """
        WITH qual AS (
          SELECT l_orderkey, sum(l_quantity)::DOUBLE AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, q.total_qty
        FROM qual q
        JOIN orders o ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 100
    """,
    "revenue_by_segment": """
        SELECT c_mktsegment,
               count(DISTINCT l_orderkey)::BIGINT AS n_orders,
               count(*)::BIGINT AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_mktsegment
    """,
    "customers_no_urgent_orders": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
    "heavy_hitter_tokens": r"""
        SELECT token, cnt, hh_rank FROM (
            SELECT token, cnt,
                   row_number() OVER (ORDER BY cnt DESC, token) AS hh_rank
            FROM (
                SELECT token, count(*)::BIGINT AS cnt FROM (
                    SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS token
                    FROM documents WHERE trim(text) <> ''
                ) GROUP BY token
            )
        ) WHERE hh_rank <= 25
    """,
    "distinct_token_counts": r"""
        SELECT lang, count(DISTINCT token)::BIGINT AS n_distinct_tokens
        FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ) GROUP BY lang
    """,
    "paragraph_dedup": """
        WITH ps AS (
            SELECT doc_id, string_split(text, chr(10)) AS ps FROM documents
        ),
        paras AS (
            SELECT doc_id, unnest(ps) AS p,
                   unnest(range(1, len(ps) + 1)) AS idx
            FROM ps
        ),
        r AS (
            SELECT doc_id, idx, p,
                   row_number() OVER (
                       PARTITION BY p ORDER BY doc_id, idx
                   ) AS rn
            FROM paras
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_paragraphs,
               sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_dup_paragraphs,
               coalesce(string_agg(CASE WHEN rn = 1 THEN p END,
                        chr(10) ORDER BY idx), '') AS kept_text
        FROM r GROUP BY doc_id
    """,
    # C4-style boilerplate removal: non-empty lines present in >=3
    # DISTINCT docs are stripped from every doc (first occurrence too);
    # empty lines always survive.
    "boilerplate_line_strip": """
        WITH ps AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
        ),
        lines AS (
            SELECT doc_id, unnest(ls) AS l,
                   unnest(range(1, len(ls) + 1)) AS idx
            FROM ps
        ),
        df AS (
            SELECT l, count(DISTINCT doc_id) AS df FROM lines
            WHERE l <> '' GROUP BY l
        ),
        flagged AS (
            SELECT li.doc_id, li.idx, li.l,
                   CASE WHEN li.l <> '' AND d.df >= 3 THEN 1 ELSE 0 END AS bp
            FROM lines li LEFT JOIN df d USING (l)
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_lines,
               sum(bp)::BIGINT AS n_boilerplate_lines,
               coalesce(string_agg(CASE WHEN bp = 0 THEN l END,
                        chr(10) ORDER BY idx), '') AS kept_text
        FROM flagged GROUP BY doc_id
    """,
    "ngram_novelty": r"""
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 0) + 1),
                       i -> array_to_string(w[i:i+4], ' ')))) AS g
            FROM words
        ),
        mins AS (SELECT g, min(doc_id) AS m FROM grams GROUP BY g)
        SELECT doc_id, count(*)::BIGINT AS n_ngrams,
               sum(CASE WHEN m < doc_id THEN 1 ELSE 0 END)::BIGINT
                   AS n_stale_ngrams
        FROM grams JOIN mins USING (g)
        GROUP BY doc_id
    """,
    "onion_dedup": r"""
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 0) + 1),
                       i -> array_to_string(w[i:i+4], ' ')))) AS g
            FROM words
        ),
        mins AS (SELECT g, min(doc_id) AS m FROM grams GROUP BY g),
        nov AS (
          SELECT doc_id, count(*)::BIGINT AS n_ngrams,
                 sum(CASE WHEN m < doc_id THEN 1 ELSE 0 END)::BIGINT
                     AS n_stale_ngrams
          FROM grams JOIN mins USING (g)
          GROUP BY doc_id
        )
        SELECT doc_id, n_ngrams, n_stale_ngrams,
               (2 * n_stale_ngrams < n_ngrams) AS kept
        FROM nov
    """,
    "dup_ngram_stats": r"""
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 0) + 1),
                       i -> array_to_string(w[i:i+4], ' ')))) AS g
            FROM words
        ),
        df AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
        SELECT doc_id, count(*)::BIGINT AS n_ngrams,
               sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_dup_ngrams
        FROM grams JOIN df USING (g)
        GROUP BY doc_id
    """,
    "embedding_near_dup_pairs": f"""
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding)
              >= {NEAR_DUP_COS}
    """,
    "repetition_stats": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
                 generate_subscripts(
                     regexp_split_to_array(trim(text), '\s+'), 1) AS pos
          FROM documents WHERE trim(text) <> ''
        ),
        wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
        words AS (
          SELECT doc_id,
                 sum(c)::BIGINT AS n_words,
                 count(*)::BIGINT AS n_distinct_words,
                 max(c)::BIGINT AS top_word_count,
                 sum((c - 1) * length(w))::BIGINT AS dup_word_chars,
                 sum(c * length(w))::BIGINT AS total_word_chars
          FROM wc GROUP BY 1
        ),
        bg AS (
          SELECT doc_id,
                 w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM toks QUALIFY b IS NOT NULL
        ),
        bgtop AS (
          SELECT doc_id, max(c)::BIGINT AS top_bigram_count FROM (
            SELECT doc_id, b, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2
          ) GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(w.n_words, 0)::BIGINT AS n_words,
               coalesce(w.n_distinct_words, 0)::BIGINT AS n_distinct_words,
               coalesce(w.top_word_count, 0)::BIGINT AS top_word_count,
               coalesce(b.top_bigram_count, 0)::BIGINT AS top_bigram_count,
               coalesce(w.dup_word_chars, 0)::BIGINT AS dup_word_chars,
               coalesce(w.total_word_chars, 0)::BIGINT AS total_word_chars
        FROM documents d
        LEFT JOIN words w USING (doc_id) LEFT JOIN bgtop b USING (doc_id)
    """,
    "dup_ngram_coverage": _dup_ngram_coverage_sql(),
    "hashed_classifier_score": _hashed_classifier_sql(),
    "word_doc_freq": r"""
        SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> '') GROUP BY token
    """,
    "jaccard_dup_clusters": """
        WITH RECURSIVE shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ua, b.doc_id AS ub, count(*) AS i
          FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT ua, ub FROM inter
          JOIN counts ca ON ca.doc_id = ua JOIN counts cb ON cb.doc_id = ub
          WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        )
        SELECT n AS doc_id, min(lab)::BIGINT AS cluster_id FROM walk GROUP BY n
    """,
    "containment_clusters": """
        WITH RECURSIVE shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ua, b.doc_id AS ub, count(*) AS i
          FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT ua, ub FROM inter
          JOIN counts ca ON ca.doc_id = ua JOIN counts cb ON cb.doc_id = ub
          WHERE i * 1.0 / least(ca.n, cb.n) >= 0.6
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        )
        SELECT n AS doc_id, min(lab)::BIGINT AS cluster_id FROM walk GROUP BY n
    """,
    # new-snapshot docs sharing ANY band bucket with a history doc are
    # dropped (bucket membership IS the verdict — no verify stage); the
    # oracle keys bands on the exact sig tuple via string_agg where the
    # Ray side uses the salted u64 fold (same standing assumption as
    # minhash_band_clusters)
    "incremental_near_dedup": f"""
        WITH RECURSIVE sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        hits AS (
          SELECT DISTINCT n.doc_id, n.band
          FROM bands n JOIN bands h
            ON h.band = n.band AND h.bkey = n.bkey
           AND n.doc_id % 2 = 1 AND h.doc_id % 2 = 0
        ),
        c AS (SELECT doc_id, count(*)::BIGINT AS nb FROM hits GROUP BY 1)
        SELECT d.doc_id, coalesce(c.nb, 0)::BIGINT AS n_hit_bands,
               coalesce(c.nb, 0) > 0 AS dropped
        FROM documents d LEFT JOIN c USING (doc_id)
        WHERE d.doc_id % 2 = 1
    """,
    "incremental_dedup": """
        SELECT b.doc_id FROM documents b
        WHERE b.doc_id % 2 = 1 AND NOT EXISTS (
          SELECT 1 FROM documents a
          WHERE a.doc_id % 2 = 0 AND a.text = b.text)
    """,
    # LSH band clusters on the SQL-recomputed OPH signatures: band key =
    # the r-tuple of sigs (string form; the Ray side's u64 fold is an
    # injective-stand-in), closure = recursive min-label walk.
    "minhash_band_clusters": f"""
        WITH RECURSIVE sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        )
        SELECT n AS doc_id, min(lab)::BIGINT AS cluster_id FROM walk GROUP BY n
    """,
    # Flagship near-dup clusters: candidates (winnow/MinHash routing) are
    # verified with EXACT Jaccard at 0.5 before the min-label closure, so
    # the output equals the exact-pairs closure whenever candidate recall
    # is 1.0 — deterministic on the fixture (partition-set-equal verified
    # at sf0.01). The oracle checks recall AND precision of the routing +
    # verify + union-find cascade. url == CAST(doc_id AS VARCHAR)
    # (stages/extract.py:51); singleton docs keep their own id.
    "minhash_clusters": """
        WITH RECURSIVE shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ua, b.doc_id AS ub, count(*) AS i
          FROM shingles a JOIN shingles b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT ua, ub FROM inter
          JOIN counts ca ON ca.doc_id = ua JOIN counts cb ON cb.doc_id = ub
          WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        ),
        lab AS (SELECT n AS doc_id, min(lab) AS cid FROM walk GROUP BY n)
        SELECT CAST(d.doc_id AS VARCHAR) AS url,
               d.doc_id AS doc_seq,
               coalesce(l.cid, d.doc_id)::BIGINT AS cluster_id
        FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id
    """,
    "approx_distinct_kmv": _kmv_sql(),
    "bloom_dedup_report": _bloom_sql(),
    "approx_counts_cms": _cms_sql(),
    "approx_distinct_hll": _hll_sql(),
    "kmeans_lloyd": _lloyd_sql(),
    "substring_counts": _substring_counts_sql(),
    "next_token_distribution": _next_token_distribution_sql(),
    "normalize_texts": r"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
               length(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))::BIGINT
                   AS n_norm_chars
        FROM documents
    """,
    "source_overlap_matrix": """
        WITH st AS (SELECT DISTINCT source, text FROM documents)
        SELECT a.source AS source_a, b.source AS source_b,
               count(*)::BIGINT AS n_shared_texts
        FROM st a JOIN st b ON a.text = b.text AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "dup_rate_by_source": """
        SELECT source, count(*)::BIGINT AS n_docs,
               count(DISTINCT text)::BIGINT AS n_distinct_texts,
               (count(*) - count(DISTINCT text))::BIGINT AS n_dup_docs
        FROM documents GROUP BY source
    """,
    # BM25: N and avgdl from integer sums (bit-identical doubles both
    # sides); score rounded to 6 dp BEFORE ranking (tfidf rule); only
    # docs matching >= 1 query term appear (join semantics == the Ray
    # side's score>0 filter, and idf>0 always under the +1 variant)
    "bm25_topk": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
        stats AS (
          SELECT count(*)::BIGINT AS n,
                 sum(dl)::DOUBLE / count(*) AS avgdl
          FROM dl
        ),
        df AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w),
        q AS (SELECT DISTINCT doc_id AS query_id, w FROM toks WHERE doc_id < 3),
        sc AS (
          SELECT q.query_id, tf.doc_id,
                 round(sum(
                   ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                 ), 6) AS score
          FROM q
          JOIN tf ON tf.w = q.w
          JOIN df ON df.w = q.w
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT query_id, doc_id, score,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id
                 ) AS rank
          FROM sc
        )
        SELECT query_id, doc_id, rank::BIGINT AS rank, score
        FROM ranked WHERE rank <= 10
    """,
    "tfidf_top_terms": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
               FROM toks GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM toks GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
        scored AS (
          SELECT doc_id, token,
                 round(tf * ln(n.n * 1.0 / df.df), 6) AS score
          FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, score, term_rank FROM (
          SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token) AS term_rank
          FROM scored)
        WHERE term_rank <= 3
    """,
    "prefix_dup_docs": """
        WITH t AS (SELECT DISTINCT text FROM documents),
        p AS (
          SELECT DISTINCT a.text FROM t a JOIN t b
            ON length(b.text) > length(a.text)
           AND starts_with(b.text, a.text)
        )
        SELECT d.doc_id,
               (d.text IN (SELECT text FROM p)) AS is_prefix_dup
        FROM documents d
    """,
    "minhash_jaccard_estimate_pairs": f"""
        WITH sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT c.ua AS doc_id_a, c.ub AS doc_id_b,
               sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)::BIGINT
                   AS n_match_perms,
               sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                     / 128.0 AS est_jaccard
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.ua
        JOIN sigs sb ON sb.doc_id = c.ub AND sb.perm = sa.perm
        GROUP BY 1, 2
    """,
    # 1-bit minhash (Li & Koenig 2010): agreement of each cell's LOW BIT,
    # debiased with E[agree | J=0] = 1/2: est = max(2*A - 1, 0). All
    # values dyadic (k/128) — bit-exact division both engines.
    "bbit_minhash_estimate_pairs": f"""
        WITH sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT c.ua AS doc_id_a, c.ub AS doc_id_b,
               sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)::BIGINT
                   AS n_match_perms,
               sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                     / 128.0 AS est_jaccard,
               sum(CASE WHEN sa.sig % 2 = sb.sig % 2 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_match_bits,
               greatest(2 * (sum(CASE WHEN sa.sig % 2 = sb.sig % 2
                                      THEN 1 ELSE 0 END) / 128.0) - 1, 0)
                   AS est_jaccard_b1
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.ua
        JOIN sigs sb ON sb.doc_id = c.ub AND sb.perm = sa.perm
        GROUP BY 1, 2
    """,
    # Near-dup REMOVAL: keep only the min-doc_id member of every LSH
    # band cluster (same CTE chain as minhash_band_clusters) plus all
    # unclustered docs.
    "near_dedup_keep_longest": f"""
        WITH RECURSIVE sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        ),
        labels AS (SELECT n AS doc_id, min(lab) AS cluster_id
                   FROM walk GROUP BY n),
        ranked AS (
          SELECT l.doc_id,
                 row_number() OVER (
                   PARTITION BY l.cluster_id
                   ORDER BY d.n_chars DESC, l.doc_id
                 ) AS rn
          FROM labels l JOIN documents d USING (doc_id)
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN ranked r USING (doc_id)
        WHERE r.doc_id IS NULL OR r.rn = 1
    """,
    # Sequential-cascade drop provenance: tier 1 = exact keep-first
    # loser; tier 2 = exact survivor dropped by LSH keep-first over the
    # SURVIVORS (sigs/bands scoped to the surv CTE); 0 = kept.
    "dedup_drop_tiers": f"""
        WITH RECURSIVE surv AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        ),
        sigs AS ({_oph_sql(src='surv')}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        ),
        labels AS (SELECT n AS doc_id, min(lab) AS cluster_id
                   FROM walk GROUP BY n)
        SELECT d.doc_id,
               (CASE WHEN s.doc_id IS NULL THEN 1
                     WHEN l.cluster_id IS NOT NULL
                          AND l.cluster_id <> d.doc_id THEN 2
                     ELSE 0 END)::BIGINT AS drop_tier
        FROM documents d
        LEFT JOIN surv s USING (doc_id)
        LEFT JOIN labels l ON l.doc_id = d.doc_id
    """,
    # Tiered keep: within each cluster the member from the
    # highest-priority source tier wins (trailing digits of source mod
    # 4; no digits -> tier 3), ties by doc_id — value-checks the
    # provenance-priority policy end to end including the tier column.
    "near_dedup_keep_tiered": f"""
        WITH RECURSIVE sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        ),
        labels AS (SELECT n AS doc_id, min(lab) AS cluster_id
                   FROM walk GROUP BY n),
        ranked AS (
          SELECT l.doc_id,
                 row_number() OVER (
                   PARTITION BY l.cluster_id
                   ORDER BY coalesce(try_cast(regexp_extract(
                              d.source, '([0-9]{{1,9}})$', 1) AS BIGINT),
                            3) % 4,
                            l.doc_id
                 ) AS rn
          FROM labels l JOIN documents d USING (doc_id)
        )
        SELECT d.doc_id, d.source, d.n_chars,
               (coalesce(try_cast(regexp_extract(
                   d.source, '([0-9]{{1,9}})$', 1) AS BIGINT), 3)
                % 4)::BIGINT AS tier
        FROM documents d LEFT JOIN ranked r USING (doc_id)
        WHERE r.doc_id IS NULL OR r.rn = 1
    """,
    "near_dedup_keep_first": f"""
        WITH RECURSIVE sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        edges AS (SELECT ua AS u, ub AS v FROM pairs
                  UNION SELECT ub, ua FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        walk(n, lab) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.u, w.lab FROM walk w JOIN edges e ON e.v = w.n
          WHERE w.lab < e.u
        ),
        labels AS (SELECT n AS doc_id, min(lab) AS cluster_id
                   FROM walk GROUP BY n)
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN labels l USING (doc_id)
        WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id
    """,
    # LSH recall evaluation: exact Jaccard>=0.8 pairs vs MinHash b=32/r=4
    # band-candidate pairs, as three integer counts in one row.
    "lsh_recall_report": f"""
        WITH shingles AS (
          SELECT doc_id, UNNEST(list_distinct(list_transform(
              range(1, greatest(length(hx) // 2 - 7, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 16)))) AS sh
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ua, b.doc_id AS ub, count(*) AS i
          FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        expairs AS (
          SELECT ua, ub FROM inter
          JOIN counts ca ON ca.doc_id = ua JOIN counts cb ON cb.doc_id = ub
          WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
        ),
        sigs AS ({_oph_sql()}),
        bands AS (
          SELECT doc_id, perm // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY perm) AS bkey
          FROM sigs GROUP BY 1, 2
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT (SELECT count(*) FROM expairs)::BIGINT AS n_exact_pairs,
               (SELECT count(*) FROM cand)::BIGINT AS n_candidate_pairs,
               (SELECT count(*) FROM cand c JOIN expairs e
                  ON c.ua = e.ua AND c.ub = e.ub)::BIGINT AS n_hits
    """,
    "gopher_quality_filter": rf"""
        WITH w AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
          FROM documents
        ), st AS (
          SELECT doc_id,
                 len(ws)::BIGINT AS n_words,
                 coalesce(list_sum(list_transform(ws, x -> length(x))),
                          0)::BIGINT AS total_word_chars,
                 len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                     ::BIGINT AS n_alpha_words,
                 len(list_filter({_gopher_stops},
                                 s -> list_contains(ws, s)))::BIGINT
                     AS n_stop_types
          FROM w
        )
        SELECT doc_id, n_words, total_word_chars,
               CASE WHEN n_words > 0
                    THEN total_word_chars::DOUBLE / n_words
                    ELSE 0.0 END AS mean_word_len,
               n_alpha_words, n_stop_types,
               (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                AND total_word_chars >= {GOPHER_MIN_MEAN_WL} * n_words
                AND total_word_chars <= {GOPHER_MAX_MEAN_WL} * n_words
                AND {GOPHER_ALPHA_DEN} * n_alpha_words
                        >= {GOPHER_ALPHA_NUM} * n_words
                AND n_stop_types >= {GOPHER_MIN_STOP_TYPES}) AS keep
        FROM st
    """,
    "quality_gate_ablation": rf"""
        WITH w AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
          FROM documents
        ), st AS (
          SELECT doc_id,
                 len(ws)::BIGINT AS nw,
                 coalesce(list_sum(list_transform(ws, x -> length(x))),
                          0)::BIGINT AS ch,
                 len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                     ::BIGINT AS al,
                 len(list_filter({_gopher_stops},
                                 s -> list_contains(ws, s)))::BIGINT AS sp
          FROM w
        ), g AS (
          SELECT (nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
                     AS g1,
                 (ch >= {GOPHER_MIN_MEAN_WL} * nw
                  AND ch <= {GOPHER_MAX_MEAN_WL} * nw) AS g2,
                 ({GOPHER_ALPHA_DEN} * al >= {GOPHER_ALPHA_NUM} * nw) AS g3,
                 (sp >= {GOPHER_MIN_STOP_TYPES}) AS g4
          FROM st
        )
        SELECT 'word_count' AS gate,
               sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END)::BIGINT AS n_fail,
               sum(CASE WHEN NOT g1 AND g2 AND g3 AND g4
                        THEN 1 ELSE 0 END)::BIGINT AS n_fail_alone
        FROM g
        UNION ALL
        SELECT 'mean_word_len',
               sum(CASE WHEN NOT g2 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN NOT g2 AND g1 AND g3 AND g4
                        THEN 1 ELSE 0 END)::BIGINT
        FROM g
        UNION ALL
        SELECT 'alpha_ratio',
               sum(CASE WHEN NOT g3 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN NOT g3 AND g1 AND g2 AND g4
                        THEN 1 ELSE 0 END)::BIGINT
        FROM g
        UNION ALL
        SELECT 'stopwords',
               sum(CASE WHEN NOT g4 THEN 1 ELSE 0 END)::BIGINT,
               sum(CASE WHEN NOT g4 AND g1 AND g2 AND g3
                        THEN 1 ELSE 0 END)::BIGINT
        FROM g
    """,
    # The cascade's dedup tier groups by full text among GATE SURVIVORS
    # only (the Ray side uses a u64 blake2b-8 fingerprint for the same
    # grouping, as exact_dedup does); CASE order defines the first-failed-
    # tier label when a doc fails several gates.
    "curation_cascade": rf"""
        WITH w AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
          FROM documents
        ), st AS (
          SELECT doc_id, text,
                 len(ws)::BIGINT AS n_words,
                 coalesce(list_sum(list_transform(ws, x -> length(x))),
                          0)::BIGINT AS total_word_chars,
                 len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                     ::BIGINT AS n_alpha_words,
                 len(list_filter({_gopher_stops},
                                 s -> list_contains(ws, s)))::BIGINT
                     AS n_stop_types,
                 len(list_filter(ws, x -> x IN ({_stops}))) > 0 AS lang_ok
          FROM w
        ), g AS (
          SELECT doc_id, text, lang_ok,
                 (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                  AND total_word_chars >= {GOPHER_MIN_MEAN_WL} * n_words
                  AND total_word_chars <= {GOPHER_MAX_MEAN_WL} * n_words
                  AND {GOPHER_ALPHA_DEN} * n_alpha_words
                          >= {GOPHER_ALPHA_NUM} * n_words
                  AND n_stop_types >= {GOPHER_MIN_STOP_TYPES}) AS quality_ok
          FROM st
        ), k AS (
          SELECT min(doc_id) AS keep_id FROM g
          WHERE lang_ok AND quality_ok GROUP BY text
        )
        SELECT doc_id, lang_ok, quality_ok,
               CASE WHEN NOT lang_ok THEN 'lang'
                    WHEN NOT quality_ok THEN 'quality'
                    WHEN doc_id IN (SELECT keep_id FROM k) THEN 'kept'
                    ELSE 'duplicate' END AS drop_stage,
               (lang_ok AND quality_ok
                AND doc_id IN (SELECT keep_id FROM k)) AS keep
        FROM g
    """,
    "token_entropy": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
        ag AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS nd,
                      sum(c * log2(c)) AS s
               FROM wc GROUP BY 1)
        SELECT d.doc_id,
               coalesce(n, 0)::BIGINT AS n_words,
               coalesce(nd, 0)::BIGINT AS n_distinct_words,
               CASE WHEN n IS NULL THEN 0.0 ELSE log2(n) - s / n END AS entropy
        FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id
    """,
    "kmeans_assign": f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id < {KMEANS_K})
        SELECT vec_id, cid AS centroid_id FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC,
                              c.cid) AS rn
          FROM embeddings e, c)
        WHERE rn = 1
    """,
    "semantic_dedup": f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id < {KMEANS_K}),
        a AS (
          SELECT vec_id, cid AS centroid_id FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC,
                                c.cid) AS rn
            FROM embeddings e, c)
          WHERE rn = 1
        ),
        dom AS (
          SELECT DISTINCT y.vec_id
          FROM a x JOIN a y
            ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
          JOIN embeddings ex ON ex.vec_id = x.vec_id
          JOIN embeddings ey ON ey.vec_id = y.vec_id
          WHERE list_cosine_similarity(ex.embedding, ey.embedding)
                >= {SEMDEDUP_COS}
        )
        SELECT a.vec_id, a.centroid_id, (dom.vec_id IS NULL) AS kept
        FROM a LEFT JOIN dom ON a.vec_id = dom.vec_id
    """,
    "supplier_balance_by_region": """
        SELECT r_name, count(*)::BIGINT AS n_suppliers,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "promo_revenue_share": """
        WITH j AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS units,
                 (p_type = 'PROMO') AS promo
          FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT CAST(sum(CASE WHEN promo THEN units ELSE 0 END) AS DOUBLE)
                   / 10000.0 AS promo_revenue,
               CAST(sum(units) AS DOUBLE) / 10000.0 AS total_revenue,
               CAST(sum(CASE WHEN promo THEN units ELSE 0 END) AS DOUBLE)
                   / CAST(sum(units) AS DOUBLE) AS promo_share
        FROM j
    """,
    "cluster_source_mix": f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id < {KMEANS_K}),
        a AS (
          SELECT vec_id, cid AS centroid_id FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC,
                                c.cid) AS rn
            FROM embeddings e, c)
          WHERE rn = 1
        )
        SELECT a.centroid_id, d.source, count(*)::BIGINT AS n_docs
        FROM a JOIN documents d ON d.doc_id = a.vec_id
        GROUP BY a.centroid_id, d.source
    """,
    "unigram_logprob": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        uc AS (SELECT w, count(*)::BIGINT AS cnt FROM toks GROUP BY w),
        tot AS (SELECT sum(cnt)::BIGINT AS t FROM uc),
        per AS (
          SELECT t.doc_id, count(*)::BIGINT AS n,
                 sum(-log2(uc.cnt::DOUBLE / tot.t)) AS s
          FROM toks t JOIN uc ON t.w = uc.w CROSS JOIN tot
          GROUP BY t.doc_id
        )
        SELECT d.doc_id, coalesce(n, 0)::BIGINT AS n_words,
               CASE WHEN n IS NULL THEN 0.0 ELSE s / n END AS xent
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    # CCNet head/middle/tail: per-lang NTILE(3) over the 6-dp-rounded
    # unigram cross-entropy (round BEFORE rank — the tfidf_top_terms
    # convention), ties broken by doc_id.
    "perplexity_buckets": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        uc AS (SELECT w, count(*)::BIGINT AS cnt FROM toks GROUP BY w),
        tot AS (SELECT sum(cnt)::BIGINT AS t FROM uc),
        per AS (
          SELECT t.doc_id, count(*)::BIGINT AS n,
                 sum(-log2(uc.cnt::DOUBLE / tot.t)) AS s
          FROM toks t JOIN uc ON t.w = uc.w CROSS JOIN tot
          GROUP BY t.doc_id
        ),
        scored AS (
          SELECT d.doc_id, d.lang,
                 round(CASE WHEN n IS NULL THEN 0.0 ELSE s / n END, 6) AS xent
          FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        )
        SELECT doc_id, lang, xent,
               ntile(3) OVER (PARTITION BY lang
                              ORDER BY xent, doc_id)::BIGINT AS bucket
        FROM scored
    """,
    # Bigram-LM cross-entropy: P(w|v) = c2(v,w) / c1(v) where c1 counts
    # v as a bigram LEFT element (so P sums to 1 per context and the
    # self-trained model needs no smoothing). Bigram identity = the
    # space-joined pair, injective since tokens hold no whitespace.
    # Bigram PMI collocations: marginals derive from the bigram table
    # (left/right element counts), PMI in one shared IEEE expression.
    "bigram_pmi": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''
        ),
        big AS (
          SELECT unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1])) AS bg,
                 unnest(list_transform(range(1, len(w)), i -> w[i])) AS lw,
                 unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS rw
          FROM words
        ),
        c2 AS (
          SELECT bg, any_value(lw) AS lw, any_value(rw) AS rw,
                 count(*)::DOUBLE AS c
          FROM big GROUP BY bg
        ),
        cl AS (SELECT lw, count(*)::DOUBLE AS c FROM big GROUP BY lw),
        cr AS (SELECT rw, count(*)::DOUBLE AS c FROM big GROUP BY rw),
        n2 AS (SELECT count(*)::DOUBLE AS n FROM big)
        SELECT c2.bg AS bigram, c2.c::BIGINT AS n,
               log2(c2.c * n2.n / (cl.c * cr.c)) AS pmi
        FROM c2 CROSS JOIN n2
        JOIN cl ON c2.lw = cl.lw
        JOIN cr ON c2.rw = cr.rw
        WHERE c2.c >= 5
    """,
    "bigram_logprob": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''
        ),
        big AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1])) AS bg,
                 unnest(list_transform(range(1, len(w)), i -> w[i])) AS lw
          FROM words
        ),
        c2 AS (SELECT bg, count(*)::DOUBLE AS c FROM big GROUP BY bg),
        c1 AS (SELECT lw, count(*)::DOUBLE AS c FROM big GROUP BY lw),
        per AS (
          SELECT b.doc_id, count(*)::BIGINT AS n,
                 sum(-log2(c2.c / c1.c)) AS s
          FROM big b JOIN c2 ON b.bg = c2.bg JOIN c1 ON b.lw = c1.lw
          GROUP BY b.doc_id
        )
        SELECT d.doc_id, coalesce(n, 0)::BIGINT AS n_bigrams,
               CASE WHEN n IS NULL THEN 0.0 ELSE s / n END AS xent2
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    # Substring decontamination: a training doc window is contaminated
    # iff the same 64-byte string occurs in a benchmark doc; SQL joins
    # exact 64-BYTE windows (hex(encode()) slices, byte-exact on
    # non-ASCII — tests/test_nonascii_oracles.py).
    # Flagship keep-first window dedup, doc-internal windows: explode
    # every 64-byte window with its BYTE position, keep the min
    # (doc_id, pos) occurrence per distinct window value, coalesce the
    # rest into per-doc islands with the reference gap rule (break at
    # diff > 64).
    # dup_doc_report: the D5/D6 kept/dropped pointer accounting at the
    # PRODUCTION partition granularity. Every cross-doc corpus window
    # contains a sentinel byte (one per doc boundary) and is excluded by
    # the scan, so the dup-window set == doc-internal 64-byte windows
    # grouped per (partition, window); kept = min corpus position = min
    # (doc_id, pos). Partition assignment replicates
    # extract.partition_boundaries: boundary[p] = ceil(p*span/P) + mn,
    # order-contiguous in doc_id, P = 4 (the query's cfg).
    "dup_doc_report": """
        WITH bounds AS (
          SELECT min(doc_id) AS mn, max(doc_id) - min(doc_id) + 1 AS span
          FROM documents
        ),
        pdoc AS (
          SELECT d.doc_id, hex(encode(d.text)) AS hx,
                 least(3, CAST((SELECT count(*) FROM range(0, 4) r(p)
                                WHERE (r.p * b.span + 3) // 4 + b.mn
                                      <= d.doc_id) AS BIGINT) - 1) AS part
          FROM documents d, bounds b
        ),
        w AS (
          SELECT part, doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 63, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 63, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 128))) AS win
          FROM pdoc
        ),
        firsts AS (
          SELECT part, win, min(doc_id * 4294967296 + pos) AS k0,
                 count(*) AS n
          FROM w GROUP BY part, win
        )
        SELECT w.doc_id,
               sum(CASE WHEN w.doc_id * 4294967296 + w.pos = firsts.k0
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept_ptrs,
               sum(CASE WHEN w.doc_id * 4294967296 + w.pos <> firsts.k0
                        THEN 1 ELSE 0 END)::BIGINT AS n_dropped_ptrs
        FROM w JOIN firsts USING (part, win)
        WHERE firsts.n >= 2
        GROUP BY w.doc_id
    """,
    "window_ptr_report": """
        WITH w AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 63, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 63, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 128))) AS win
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM w GROUP BY win
        )
        SELECT w.doc_id,
               sum(CASE WHEN w.doc_id * 4294967296 + w.pos = firsts.k0
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept_ptrs,
               sum(CASE WHEN w.doc_id * 4294967296 + w.pos <> firsts.k0
                        THEN 1 ELSE 0 END)::BIGINT AS n_dropped_ptrs
        FROM w JOIN firsts USING (win)
        WHERE firsts.n >= 2
        GROUP BY w.doc_id
    """,
    "window_kept_gaps": """
        WITH w AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 23, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 23, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 48))) AS win
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM w GROUP BY win
        ),
        rp AS (
          SELECT w.doc_id, w.pos
          FROM w JOIN firsts USING (win)
          WHERE firsts.n >= 2
            AND w.doc_id * 4294967296 + w.pos <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > 24
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        isl3 AS (
          SELECT doc_id, island, min(pos) AS s, max(pos) + 24 AS e
          FROM isl2 GROUP BY doc_id, island
        ),
        g AS (
          SELECT s - lag(e) OVER (PARTITION BY doc_id ORDER BY s) AS gap_len
          FROM isl3
        )
        SELECT gap_len::BIGINT AS gap_len, count(*)::BIGINT AS n
        FROM g WHERE gap_len IS NOT NULL GROUP BY gap_len
    """,
    # annotate_window_report: the annotate-mode production pipeline's
    # SQL-expressible columns — the window island SQL aggregated per doc
    # and LEFT-JOINed back onto documents (zeros for untouched docs).
    "annotate_window_report": """
        WITH w AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 23, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 23, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 48))) AS win
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM w GROUP BY win
        ),
        rp AS (
          SELECT w.doc_id, w.pos
          FROM w JOIN firsts USING (win)
          WHERE firsts.n >= 2
            AND w.doc_id * 4294967296 + w.pos <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > 24
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        isl3 AS (
          SELECT doc_id, island, min(pos) AS s, max(pos) + 24 AS e
          FROM isl2 GROUP BY doc_id, island
        ),
        agg AS (
          SELECT doc_id, count(*)::BIGINT AS n_removed_ranges,
                 sum(e - s)::BIGINT AS n_removed_bytes
          FROM isl3 GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
               coalesce(a.n_removed_ranges, 0)::BIGINT AS n_removed_ranges,
               coalesce(a.n_removed_bytes, 0)::BIGINT AS n_removed_bytes
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "window_dedup_apply": _window_apply_sql(),
    # dedup_then_pack: the apply SQL nested as a derived table, its
    # dedup_text driving the pack prefix-sum — the chained journey.
    "dedup_then_pack": rf"""
        WITH dedup AS (SELECT * FROM ({_window_apply_sql()})),
        counts AS (
            SELECT doc_id,
                   CASE WHEN trim(dedup_text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(dedup_text),
                                                       '\s+'))
                   END AS n_tokens
            FROM dedup
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM counts
        )
        SELECT doc_id, n_tokens,
               (cum_before // 256)::BIGINT AS pack_id,
               (cum_before % 256)::BIGINT AS pack_off
        FROM cum
    """,
    # incremental_window_dedup: keep-first under the history-priority
    # order — key = ((snap << 30) | doc_id) * 2^32 + pos in BIGINT
    # (snap = 0 for history docs, so history occurrences always win);
    # report rows for snapshot docs only, zeros included.
    "incremental_window_dedup": """
        WITH hdoc AS (
          SELECT doc_id, hex(encode(text)) AS hx,
                 CASE WHEN doc_id % 19 = 0 THEN 0 ELSE 1 END AS snap
          FROM documents
        ),
        w AS (
          SELECT doc_id, snap,
                 UNNEST(range(1, greatest(length(hx) // 2 - 23, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 23, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 48))) AS win
          FROM hdoc
        ),
        firsts AS (
          SELECT win,
                 min((snap * 1073741824 + doc_id) * 4294967296 + pos) AS k0,
                 count(*) AS n
          FROM w GROUP BY win
        ),
        rp AS (
          SELECT w.doc_id, w.pos
          FROM w JOIN firsts USING (win)
          WHERE firsts.n >= 2 AND w.snap = 1
            AND (w.snap * 1073741824 + w.doc_id) * 4294967296 + w.pos
                <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > 24
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        agg AS (
          SELECT doc_id,
                 sum(e - s)::BIGINT AS removed_bytes,
                 sum(nw)::BIGINT AS n_dup_windows
          FROM (SELECT doc_id, island, min(pos) AS s, max(pos) + 24 AS e,
                       count(*) AS nw
                FROM isl2 GROUP BY doc_id, island)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_dup_windows, 0)::BIGINT AS n_dup_windows,
               coalesce(a.removed_bytes, 0)::BIGINT AS removed_bytes
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        WHERE d.doc_id % 19 <> 0
    """,
    # html_text_extract: the per-row invariant "extracted text is
    # byte-identical per url" — the oracle pins BOTH counts to the doc
    # count; the Ray side earns equality only by actually parsing the
    # <main> element out of every page's html bytes.
    "html_text_extract": """
        SELECT count(*)::BIGINT AS n_pages,
               count(*)::BIGINT AS n_byte_identical
        FROM documents
    """,
    "window_dedup_report": """
        WITH w AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 63, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 63, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 128))) AS win
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM w GROUP BY win
        ),
        rp AS (
          SELECT w.doc_id, w.pos
          FROM w JOIN firsts USING (win)
          WHERE firsts.n >= 2
            AND w.doc_id * 4294967296 + w.pos <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > 64
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        agg AS (
          SELECT doc_id,
                 sum(e - s)::BIGINT AS removed_bytes,
                 sum(nw)::BIGINT AS n_dup_windows
          FROM (SELECT doc_id, island, min(pos) AS s, max(pos) + 64 AS e,
                       count(*) AS nw
                FROM isl2 GROUP BY doc_id, island)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_dup_windows, 0)::BIGINT AS n_dup_windows,
               coalesce(a.removed_bytes, 0)::BIGINT AS removed_bytes
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    "substring_decontaminate": """
        WITH bw AS (
          SELECT DISTINCT UNNEST(list_transform(
              range(1, greatest(length(hx) // 2 - 63, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 128))) AS w
          FROM (SELECT doc_id, hex(encode(text)) AS hx
                FROM documents WHERE doc_id % 19 = 0)
        ),
        tw AS (
          SELECT doc_id, UNNEST(list_transform(
              range(1, greatest(length(hx) // 2 - 63, 0) + 1),
              i -> substr(hx, (2*i - 1)::INT, 128))) AS w
          FROM (SELECT doc_id, hex(encode(text)) AS hx
                FROM documents WHERE doc_id % 19 <> 0)
        ),
        m AS (
          SELECT doc_id, count(*)::BIGINT AS n
          FROM tw JOIN bw USING (w) GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(m.n, 0)::BIGINT AS n_contaminated_windows,
               coalesce(m.n, 0) > 0 AS is_contaminated
        FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
        WHERE d.doc_id % 19 <> 0
    """,
    # URL canonical dedup: the SQL runs the IDENTICAL RE2 chain as
    # canonicalize_urls (DuckDB's regex engine is also RE2), so the
    # oracle value-checks every canonicalization rule byte-for-byte.
    "url_dedup_latest": r"""
        WITH caps AS (
          SELECT 'HTTPS://www.Site' || (doc_id % 97) || '.EXAMPLE:443/page/'
                 || doc_id || '/?utm_source=feed&id=' || doc_id || '#frag'
                     AS url,
                 1577836800 + doc_id AS ts
          FROM documents
          UNION ALL
          SELECT 'https://site' || (doc_id % 97) || '.example/page/'
                 || doc_id || '?id=' || doc_id,
                 1587836800 + doc_id
          FROM documents WHERE doc_id % 7 = 0
        ),
        split AS (
          SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*')
                     AS pre,
                 regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*',
                                '') AS rest,
                 ts
          FROM caps
        ),
        canon AS (
          SELECT regexp_replace(replace(lower(pre), '://www.', '://'),
                                ':(443|80)$', '')
                 || regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(regexp_replace(rest,
                            '#.*$', ''),
                            '(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&?', '', 'g'),
                            '[?&]$', ''),
                            '/\?', '?', 'g'),
                            '/$', '') AS url_canon,
                 ts
          FROM split
        )
        SELECT url_canon, max(ts)::BIGINT AS warc_ts,
               count(*)::BIGINT AS n_captures
        FROM canon GROUP BY url_canon
    """,
    # DSIR weights: both engines compute log2((c+1)/(N+V)) per token with
    # identical IEEE ops; only the per-doc sum order differs (6-dp safe).
    "dsir_importance_weights": f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''
        ),
        uc AS (SELECT w, count(*)::BIGINT AS cr,
                      (count(*) FILTER (
                          WHERE doc_id % {DSIR_TARGET_MOD} = 0))::BIGINT AS ct
               FROM toks GROUP BY w),
        tot AS (SELECT sum(cr)::BIGINT AS nr, sum(ct)::BIGINT AS nt,
                       count(*)::BIGINT AS v FROM uc),
        lr AS (SELECT w, log2((ct + 1.0) / (nt + v))
                         - log2((cr + 1.0) / (nr + v)) AS lr
               FROM uc CROSS JOIN tot),
        per AS (SELECT t.doc_id, count(*)::BIGINT AS n, sum(lr.lr) AS s
                FROM toks t JOIN lr ON t.w = lr.w GROUP BY t.doc_id)
        SELECT d.doc_id, coalesce(n, 0)::BIGINT AS n_words,
               CASE WHEN n IS NULL THEN 0.0 ELSE s / n END AS dsir_weight
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    "cluster_balanced_sample": f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id < {KMEANS_K}),
        a AS (
          SELECT vec_id, cid AS centroid_id FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC,
                                c.cid) AS rn
            FROM embeddings e, c)
          WHERE rn = 1
        ),
        r0 AS (SELECT vec_id, centroid_id, CAST(vec_id AS HUGEINT) AS x FROM a),
        r1 AS (SELECT vec_id, centroid_id, {_xorshift('x', 30)} AS x FROM r0),
        r2 AS (SELECT vec_id, centroid_id, {_mulmod64('x', _SM1)} AS x FROM r1),
        r3 AS (SELECT vec_id, centroid_id, {_xorshift('x', 27)} AS x FROM r2),
        r4 AS (SELECT vec_id, centroid_id, {_mulmod64('x', _SM2)} AS x FROM r3),
        smx AS (SELECT vec_id, centroid_id,
                       CAST({_xorshift('x', 31)} AS UBIGINT) AS sm FROM r4)
        SELECT vec_id, centroid_id FROM (
          SELECT vec_id, centroid_id,
                 row_number() OVER (PARTITION BY centroid_id
                                    ORDER BY sm, vec_id) AS rn
          FROM smx)
        WHERE rn <= {BALANCED_SAMPLE_M}
    """,
    # SoftDeDup reweighting: soft_weight = exp(-avg ln c(g)) over the
    # doc's word-4-gram occurrences, c(g) = corpus occurrence count.
    # Docs with no 4-gram window keep weight 1.0 (LEFT JOIN + coalesce).
    # Ray side hashes grams to u64 (collision odds ~2^-64/pair); this
    # oracle uses the exact strings — same contract as dup_ngram_stats.
    "soft_dedup_weights": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''
        ),
        grams AS (
          SELECT doc_id, unnest(list_transform(
              range(1, greatest(len(w) - 3, 0) + 1),
              i -> array_to_string(w[i:i+3], ' '))) AS g
          FROM words
        ),
        gc AS (SELECT g, count(*)::BIGINT AS c FROM grams GROUP BY g),
        per AS (
          SELECT grams.doc_id, count(*)::BIGINT AS n_windows,
                 avg(ln(gc.c)) AS alc
          FROM grams JOIN gc USING (g) GROUP BY grams.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_windows, 0)::BIGINT AS n_windows,
               exp(-coalesce(p.alc, 0.0)) AS soft_weight
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
    "dup_cluster_size_histogram": r"""
        SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM (
          SELECT count(*)::BIGINT AS cluster_size
          FROM documents GROUP BY text
        ) GROUP BY cluster_size
    """,
    "source_mix_weights": r"""
        WITH s AS (
          SELECT source, count(*)::BIGINT AS n_docs
          FROM documents GROUP BY source
        ),
        t AS (SELECT sum(pow(n_docs, 0.7)) AS z FROM s)
        SELECT s.source, s.n_docs, pow(s.n_docs, 0.7) / t.z AS mix_weight
        FROM s CROSS JOIN t
    """,
    # Tiered dedup survival: exact keep-first -> segment keep-first over
    # the exact survivors -> doc-internal keep-first window dedup over
    # the segment-cleaned texts. Chains the exact_dedup,
    # segment_dedup_apply and window_dedup_report oracle blocks over the
    # same intermediate texts; n_bytes = length() characters while the
    # window tier removes BYTES — the same mixed accounting the Ray side
    # performs (documented there), so the two engines agree on any
    # input.
    "dedup_tier_cascade": r"""
        WITH surv AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        ),
        w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 unnest(range(len(string_split(text, ' ')))) AS wi
          FROM surv
        ),
        segs AS (
          SELECT doc_id, wi // 16 AS seg_no,
                 string_agg(word, ' ' ORDER BY wi) AS seg
          FROM w GROUP BY doc_id, wi // 16
        ),
        marked AS (
          SELECT doc_id, seg_no, seg,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY doc_id, seg_no) AS rn
          FROM segs
        ),
        kept AS (SELECT doc_id, seg_no, seg FROM marked WHERE rn = 1),
        cleaned AS (
          SELECT s.doc_id,
                 coalesce(string_agg(k.seg, ' ' ORDER BY k.seg_no), '')
                     AS text
          FROM surv s LEFT JOIN kept k ON k.doc_id = s.doc_id
          GROUP BY s.doc_id
        ),
        ww AS (
          SELECT doc_id,
                 UNNEST(range(1, greatest(length(hx) // 2 - 63, 0) + 1)) - 1
                     AS pos,
                 UNNEST(list_transform(
                     range(1, greatest(length(hx) // 2 - 63, 0) + 1),
                     i -> substr(hx, (2*i - 1)::INT, 128))) AS win
          FROM (SELECT doc_id, hex(encode(text)) AS hx FROM cleaned)
        ),
        firsts AS (
          SELECT win, min(doc_id * 4294967296 + pos) AS k0, count(*) AS n
          FROM ww GROUP BY win
        ),
        rp AS (
          SELECT ww.doc_id, ww.pos
          FROM ww JOIN firsts USING (win)
          WHERE firsts.n >= 2
            AND ww.doc_id * 4294967296 + ww.pos <> firsts.k0
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          IS NULL
                      OR pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > 64
                      THEN 1 ELSE 0 END AS brk
          FROM rp
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        ),
        rem AS (
          SELECT doc_id, sum(e - s)::BIGINT AS removed_bytes
          FROM (SELECT doc_id, island, min(pos) AS s, max(pos) + 64 AS e
                FROM isl2 GROUP BY doc_id, island)
          GROUP BY doc_id
        ),
        t3 AS (
          SELECT c.doc_id,
                 length(c.text) - coalesce(r.removed_bytes, 0) AS rem_bytes
          FROM cleaned c LEFT JOIN rem r ON r.doc_id = c.doc_id
        )
        SELECT 0::BIGINT AS tier_no, 'input' AS tier,
               count(*)::BIGINT AS n_docs,
               coalesce(sum(length(text)), 0)::BIGINT AS n_bytes
        FROM documents
        UNION ALL
        SELECT 1::BIGINT, 'exact', count(*)::BIGINT,
               coalesce(sum(length(text)), 0)::BIGINT
        FROM surv
        UNION ALL
        SELECT 2::BIGINT, 'segment',
               (count(*) FILTER (WHERE text <> ''))::BIGINT,
               coalesce(sum(length(text)), 0)::BIGINT
        FROM cleaned
        UNION ALL
        SELECT 3::BIGINT, 'window',
               (count(*) FILTER (WHERE rem_bytes > 0))::BIGINT,
               coalesce(sum(rem_bytes), 0)::BIGINT
        FROM t3
    """,
}

# kept_middle_lengths: the PRODUCTION SA pipeline's gap histogram. The
# sentinel-separated corpus makes scan windows doc-internal and keep-
# first order == (doc, pos) order, so production winnow-routed ranges
# are byte-identical to the window formulation (verified at
# sf0.001/0.01/0.1) — the window_kept_gaps SQL IS its exact oracle.
ORACLE_SQL["kept_middle_lengths"] = ORACLE_SQL["window_kept_gaps"]
