"""Training-data hygiene operators over the web-document table:
benchmark decontamination, deterministic stratified sampling, PII/number
redaction, JSON metadata extraction, and token-budget sequence packing.

These are the cleaning stages a 100 TB pretraining pipeline runs between
dedup and tokenization. Scale shapes:

- decontaminate: the benchmark (eval-set) gram table is SMALL by
  definition — build it once, broadcast via ``ray.put`` (exact u64 set
  below ``DECON_EXACT_LIMIT`` grams, Bloom filter + exact-verify above),
  and filter the big side with vectorized membership per batch. No
  shuffle touches the corpus.
- stratified_sample: pure per-batch hash arithmetic, embarrassingly
  parallel, deterministic across runs/cluster sizes.
- redact_pii / json_props_stats: RE2 kernels (pyarrow.compute) per batch;
  DuckDB's regex engine is also RE2, which is what makes the oracles
  byte-exact.
- pack_sequences: a distributed exclusive prefix-sum (scan) — an operator
  Ray Data lacks as a builtin: per-block partial sums (8 bytes each) meet
  on the driver, the cumulative block offsets broadcast back, and each
  block finishes independently. Only per-block scalars ever leave the
  workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from hg_dedup_ray.functions.bloom import bloom_build, bloom_query
from hg_dedup_ray.functions.wordgrams import (
    distinct_per_doc,
    doc_tokens,
    word_gram_hashes,
)

DECON_N = 8                 # word-gram order for contamination matching
DECON_BENCH_MOD = 19        # benchmark set = doc_id % MOD == 0
DECON_EXACT_LIMIT = 50_000_000  # grams; ~400 MB of u64 keys broadcast
SAMPLE_RATES_BP = {"en": 2500, "de": 5000, "es": 5000, "fr": 5000, "zh": 5000}
SAMPLE_DEFAULT_BP = 1000
PACK_CAPACITY = 256         # tokens per training sequence


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ------------------------------------------------------------ decontaminate


def _bench_gram_set(sf_dir: str, n: int, mod: int) -> np.ndarray:
    """Distinct word-n-gram hashes of the benchmark docs (doc_id % mod
    == 0). The eval set is small by definition; per-batch distinct gram
    arrays (8 B each) return to the driver and union there."""

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % mod == 0
        if not keep.any():
            return pa.table({"g": pa.array([], pa.uint64())})
        th, off = doc_tokens(batch["text"].filter(pa.array(keep)))
        grams, _ = word_gram_hashes(th, off, n)
        return pa.table({"g": pa.array(np.unique(grams), pa.uint64())})

    parts = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(bench_grams, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.array([r["g"] for r in parts], np.uint64))


def decontaminate(sf_dir: str, n: int = DECON_N, mod: int = DECON_BENCH_MOD):
    """Flag every non-benchmark doc sharing at least one word-n-gram with
    the benchmark subset (doc_id % mod == 0) — eval-set decontamination.

    Output: (doc_id, contaminated) for non-benchmark docs. Membership is
    an exact broadcast u64 set below DECON_EXACT_LIMIT grams; above it a
    Bloom filter (functions/bloom.py) prunes per batch and only the rare
    possible-positives re-check against sharded exact sets — the fixture
    path is exact, the bloom kernel is pinned in tests/test_webclean.py.
    """
    bench = _bench_gram_set(sf_dir, n, mod)
    use_bloom = bench.shape[0] > DECON_EXACT_LIMIT
    ref = ray.put(bloom_build(bench) if use_bloom else bench)
    # bloom path would also broadcast hash-sharded exact sets for the
    # verify step; with the fixture-scale benchmark the exact set IS the
    # broadcast, so the verify set and the filter coincide.
    exact_ref = ref if not use_bloom else ray.put(bench)

    def flag(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % mod != 0
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "contaminated": pa.array([], pa.bool_())}
            )
        ids = ids[keep]
        th, off = doc_tokens(batch["text"].filter(pa.array(keep)))
        grams, goff = word_gram_hashes(th, off, n)
        if use_bloom:
            maybe = bloom_query(get_broadcast(ref), grams)
            hit = np.zeros(grams.shape[0], bool)
            if maybe.any():
                hit[maybe] = np.isin(
                    grams[maybe], get_broadcast(exact_ref), kind="sort"
                )
        else:
            hit = np.isin(grams, get_broadcast(ref), kind="sort")
        counts = np.diff(goff)
        doc_idx = np.repeat(np.arange(counts.shape[0]), counts)
        contaminated = np.bincount(
            doc_idx[hit], minlength=counts.shape[0]
        ) > 0
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "contaminated": pa.array(contaminated, pa.bool_()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        flag, batch_format="pyarrow", batch_size=4096
    )


# -------------------------------------------------------- stratified sample


def stratified_sample(sf_dir: str):
    """Deterministic per-language downsampling: keep doc iff
    splitmix64(doc_id) % 10000 < rate_bp[lang]. Hash-based so the sample
    is reproducible across runs, cluster sizes, and input partitionings —
    the property random_shuffle/random_sample lack. Output (doc_id, lang)
    of kept docs."""
    from hg_dedup_ray.functions.bloom import _splitmix

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keys = _splitmix(ids.astype(np.uint64)) % np.uint64(10000)
        lang = batch["lang"]
        enc = lang.combine_chunks().dictionary_encode() if isinstance(
            lang, pa.ChunkedArray
        ) else lang.dictionary_encode()
        rates = np.array(
            [
                SAMPLE_RATES_BP.get(v, SAMPLE_DEFAULT_BP)
                for v in enc.dictionary.to_pylist()
            ],
            np.uint64,
        )
        thresh = rates[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(keys < thresh))

    return _docs(sf_dir, columns=["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow", batch_size=8192
    )


# --------------------------------------------------------------- redact_pii


_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>", "n_email"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>", "n_ip"),
    (r"\d+", "<NUM>", "n_num"),
)


def redact_pii(sf_dir: str):
    """Scrub emails / IPv4s / digit runs from the events' props payload
    (the one fixture column with redactable content — the same kernel
    applies to any string column). Counts are per-pattern matches in the
    ORIGINAL string; replacement applies in pattern order. pyarrow's RE2
    == DuckDB's RE2, so the oracle matches byte-for-byte.

    Output: (event_id, redacted, n_email, n_ip, n_num)."""

    def scrub(batch: pa.Table) -> pa.Table:
        s = batch["props"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        cols = {"event_id": batch["event_id"]}
        counts = {}
        red = s
        for pat, repl, cname in _PII_PATTERNS:
            counts[cname] = pc.count_substring_regex(s, pat)
            red = pc.replace_substring_regex(red, pat, repl)
        cols["redacted"] = red
        for _, _, cname in _PII_PATTERNS:
            cols[cname] = pc.cast(counts[cname], pa.int64())
        return pa.table(cols)

    return _events(sf_dir, columns=["event_id", "props"]).map_batches(
        scrub, batch_format="pyarrow", batch_size=8192
    )


# --------------------------------------------------------- json extraction


def json_props_stats(sf_dir: str):
    """Per-event-type stats of the integer ``k`` field inside the JSON
    props string — vectorized RE2 extraction (no per-row json.loads),
    partial-aggregated inside map_batches so the groupby sees one tiny
    row per (batch, type). Output: (event_type, n_events, sum_k, avg_k)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["props"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        kvals = pc.cast(
            pc.struct_field(
                pc.extract_regex(s, r'"k":\s*(?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        k = kvals.to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        enc = et.combine_chunks().dictionary_encode() if isinstance(
            et, pa.ChunkedArray
        ) else et.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        nt = len(enc.dictionary)
        return pa.table(
            {
                "event_type": enc.dictionary,
                "n": pa.array(np.bincount(idx, minlength=nt), pa.int64()),
                "s": pa.array(
                    np.bincount(idx, weights=k, minlength=nt).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        _events(sf_dir, columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_k"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_events"].to_numpy(zero_copy_only=False)
        s = b["sum_k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_events": b["n_events"],
                "sum_k": b["sum_k"],
                "avg_k": pa.array(np.round(s / np.maximum(n, 1), 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------- pack_sequences


def pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY):
    """Token-budget sequence packing: docs in doc_id order fill training
    sequences of ``capacity`` tokens; doc -> pack floor(cum_before /
    capacity) where cum_before is the exclusive prefix sum of whitespace
    token counts. A doc straddling a boundary stays with its starting
    pack (overflow bounded by the longest doc) — the token-quantized
    packing used when exact bin fills matter less than a stable,
    shuffle-free assignment.

    Distributed scan shape: stage 1 computes per-doc counts; per-block
    token sums (ONE int each) meet on the driver for the block-offset
    cumsum; stage 2 finishes each block with its broadcast offset. Blocks
    are doc_id-ordered (asserted from per-block bounds; violated input
    gets a one-time sort). Output: (doc_id, n_tokens, pack_id, pack_off).
    """
    return pack_docs_ds(
        _docs(sf_dir, columns=["doc_id", "text"]), capacity
    )


def pack_docs_ds(docs, capacity: int = PACK_CAPACITY):
    """pack_sequences over ANY (doc_id, text) Dataset — shared by
    pack_sequences (raw corpus) and queries.dedup_then_pack (packing
    the window-deduped texts)."""

    def counts(batch: pa.Table) -> pa.Table:
        _, off = doc_tokens(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(np.diff(off), pa.int64()),
            }
        )

    mat = (
        docs
        .map_batches(counts, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )

    @ray.remote
    def block_meta(block: pa.Table):
        # empty-input blocks can carry a columnless schema
        if block.num_rows == 0 or "doc_id" not in block.column_names:
            return (None, None, 0, True)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        nt = block["n_tokens"].to_numpy(zero_copy_only=False)
        mono = bool((np.diff(ids) > 0).all())
        return (int(ids[0]), int(ids[-1]), int(nt.sum()), mono)

    refs = mat.to_arrow_refs()
    metas = ray.get([block_meta.remote(r) for r in refs])
    lo_hi = [(m[0], m[1]) for m in metas if m[0] is not None]
    ordered = all(m[3] for m in metas) and all(
        lo_hi[i][1] < lo_hi[i + 1][0] for i in range(len(lo_hi) - 1)
    )
    if not ordered:  # non-contiguous input: pay one sort, then recurse-free
        mat = mat.sort("doc_id").materialize()
        refs = mat.to_arrow_refs()
        metas = ray.get([block_meta.remote(r) for r in refs])
    sums = np.array([m[2] for m in metas], np.int64)
    offs = np.zeros(len(metas), np.int64)
    offs[1:] = np.cumsum(sums[:-1])

    @ray.remote
    def finish(block: pa.Table, base: int) -> pa.Table:
        if block.num_rows == 0 or "doc_id" not in block.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                    "pack_off": pa.array([], pa.int64()),
                }
            )
        nt = block["n_tokens"].to_numpy(zero_copy_only=False)
        cum_before = base + np.cumsum(nt) - nt
        pack_id = cum_before // capacity
        return pa.table(
            {
                "doc_id": block["doc_id"],
                "n_tokens": block["n_tokens"],
                "pack_id": pa.array(pack_id, pa.int64()),
                "pack_off": pa.array(cum_before - pack_id * capacity, pa.int64()),
            }
        )

    out_refs = [finish.remote(r, int(offs[i])) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs)


# -------------------------------------------------------- incremental dedup

INCR_EXACT_LIMIT = 50_000_000  # history fps; ~400 MB of u64 keys broadcast


def incremental_dedup(sf_dir: str, exact_limit: int = INCR_EXACT_LIMIT):
    """Cross-snapshot exact dedup: emit NEW-snapshot doc_ids whose text
    does not appear in the HISTORY snapshot — the monthly-crawl pattern
    (dedup each new dump against everything already indexed). Snapshots
    are carved deterministically from the fixture: history = doc_id % 2
    == 0, new = the rest.

    Identity is the u64 content hash (blake2b-8, same stand-in as
    exact_dedup; the SQL oracle compares the texts themselves). Two
    shapes, picked by history row count:

    - exact broadcast (<= ``exact_limit`` rows): per-batch distinct
      history fps union on the driver, ``ray.put`` once, vectorized
      searchsorted anti-membership per new-side batch. No shuffle.
    - bucketed anti-join above it: both sides emit keys-only rows
      (fp[, doc_id] — 8-16 B/row, never text), groupby a coarse
      fp%256 bucket, and each bucket drops new-side fps present in its
      history side with one searchsorted. Linear, driver-free — the
      10^12-doc path. ``tests/test_webclean.py`` pins both paths equal.
    """
    from hg_dedup_ray.stages.textstats import content_hash_u64

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    n_hist_est = docs.count() // 2

    def side_fps(batch: pa.Table, want_parity: int, with_id: bool) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 2 == want_parity))
        h = content_hash_u64(sub)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        if not with_id:
            return pa.table({"fp": pa.array(np.unique(fp), pa.uint64())})
        return pa.table({"fp": h["fp"], "doc_id": h["doc_id"]})

    if n_hist_est <= exact_limit:
        parts = docs.map_batches(
            lambda b: side_fps(b, 0, False),
            batch_format="pyarrow",
            batch_size=4096,
        ).take_all()
        hist = np.unique(np.array([r["fp"] for r in parts], np.uint64))
        hist_ref = ray.put(hist)

        def keep_new(batch: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            h = get_broadcast(hist_ref)
            t = side_fps(batch, 1, True)
            fp = t["fp"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(h, fp)
            member = (pos < h.shape[0]) & (
                h[np.minimum(pos, h.shape[0] - 1)] == fp
            )
            return pa.table({"doc_id": t["doc_id"].filter(pa.array(~member))})

        return docs.map_batches(keep_new, batch_format="pyarrow", batch_size=4096)

    # ---- bucketed anti-join (scale path) --------------------------------
    num_buckets = 256

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = content_hash_u64(batch)
        fp = h["fp"].to_numpy(zero_copy_only=False)
        side = (ids % 2).astype(np.uint8)  # 0 = history, 1 = new
        return pa.table(
            {
                "bucket": pa.array((fp % num_buckets).astype(np.int64), pa.int64()),
                "side": pa.array(side, pa.uint8()),
                "fp": pa.array(fp, pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    def bucket_anti(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        fp = group["fp"].to_numpy(zero_copy_only=False)
        hist = np.unique(fp[side == 0])
        new_fp = fp[side == 1]
        new_id = group["doc_id"].to_numpy(zero_copy_only=False)[side == 1]
        if hist.shape[0] == 0:  # bucket with no history rows: all new kept
            return pa.table({"doc_id": pa.array(new_id, pa.int64())})
        pos = np.searchsorted(hist, new_fp)
        member = (pos < hist.shape[0]) & (
            hist[np.minimum(pos, hist.shape[0] - 1)] == new_fp
        )
        return pa.table({"doc_id": pa.array(new_id[~member], pa.int64())})

    return (
        docs.map_batches(key_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(bucket_anti, batch_format="pyarrow")
    )


# ------------------------------------------------------ url canonical dedup

URL_PREFIX_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
URL_TRACKING_RE = r"(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&?"
URL_DEDUP_RECRAWL_MOD = 7       # docs with a second (later) capture
URL_TS_BASE = 1_577_836_800     # 2020-01-01 epoch seconds
URL_TS_RECRAWL = 10_000_000     # recrawl offset


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Common-Crawl-style URL canonicalization, pure Arrow RE2 kernels
    (byte-identical to DuckDB's RE2 ``regexp_replace`` chain): lowercase
    scheme+host only, strip ``www.``, default ports, fragments, tracking
    params (utm_*/fbclid/gclid), dangling ``?``/``&``, and trailing
    slashes. Path/query case is preserved (paths are case-sensitive)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ext = pc.extract_regex(urls, r"^(?P<p>[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)")
    pre = pc.fill_null(pc.struct_field(ext, "p"), "")
    rest = pc.replace_substring_regex(urls, URL_PREFIX_RE, "")
    pre = pc.utf8_lower(pre)
    pre = pc.replace_substring(pre, "://www.", "://")
    pre = pc.replace_substring_regex(pre, r":(443|80)$", "")
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, URL_TRACKING_RE, "")
    rest = pc.replace_substring_regex(rest, r"[?&]$", "")
    rest = pc.replace_substring_regex(rest, r"/\?", "?")
    rest = pc.replace_substring_regex(rest, r"/$", "")
    return pc.binary_join_element_wise(pre, rest, "")


def _url_bucket(canon: pa.Array, num_buckets: int) -> np.ndarray:
    """Coarse deterministic bucket of a url string: FNV over the first 16
    bytes, vectorized across rows (collisions only affect load balance —
    the combine is keyed on the full string within each bucket)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    buf, off = string_column_bytes(canon)
    n = off.shape[0] - 1
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100001B3)
    starts = off[:-1]
    lens = off[1:] - starts
    for j in range(16):
        live = lens > j
        idx = starts[live] + j
        h[live] = h[live] * prime + buf[idx].astype(np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def url_dedup_latest(sf_dir: str, num_buckets: int = 64):
    """Common-Crawl-style URL-level dedup, latest-capture-wins: derive a
    deterministic capture log from the documents table (every doc one
    messy capture — uppercase scheme/host, ``www.``, ``:443``, tracking
    params, fragment; every ``doc_id % 7 == 0`` doc a second, LATER,
    already-clean recrawl), canonicalize both with
    :func:`canonicalize_urls`, and keep max(warc_ts) + the capture count
    per canonical URL. DuckDB-green — both engines run the identical RE2
    chain, so the oracle value-checks every canonicalization rule.

    Scale shape (the CC index dedup pattern): captures reduce PER BATCH
    to one (url_canon, max_ts, count) row per distinct url via np.unique
    + segment max — all captures of one url typically sit in the same
    crawl-file batch, so the following shuffle carries ~one short row per
    url; the ``num_buckets``-way combine is vectorized (no per-url
    Python). Nothing doc-sized is broadcast or collected."""

    def caps_reduced(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        id_s = pc.cast(pa.array(ids), pa.string())
        site = pc.cast(pa.array(ids % 97), pa.string())
        messy = pc.binary_join_element_wise(
            "HTTPS://www.Site", site, ".EXAMPLE:443/page/", id_s,
            "/?utm_source=feed&id=", id_s, "#frag", "",
        )
        re_mask = ids % URL_DEDUP_RECRAWL_MOD == 0
        rid = ids[re_mask]
        rid_s = pc.cast(pa.array(rid), pa.string())
        rsite = pc.cast(pa.array(rid % 97), pa.string())
        clean = pc.binary_join_element_wise(
            "https://site", rsite, ".example/page/", rid_s, "?id=", rid_s, "",
        )
        urls = pa.concat_arrays([messy, clean])
        ts = np.concatenate(
            [URL_TS_BASE + ids, URL_TS_BASE + URL_TS_RECRAWL + rid]
        ).astype(np.int64)
        canon = canonicalize_urls(urls)
        cn = canon.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cn, return_inverse=True)
        mx = np.full(uniq.shape[0], np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        cnt = np.bincount(inv, minlength=uniq.shape[0]).astype(np.int64)
        ua = pa.array(uniq)
        return pa.table(
            {
                "b": pa.array(_url_bucket(ua, num_buckets), pa.int64()),
                "url_canon": ua,
                "warc_ts": pa.array(mx, pa.int64()),
                "n_captures": pa.array(cnt, pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        cn = group["url_canon"].to_numpy(zero_copy_only=False)
        ts = group["warc_ts"].to_numpy(zero_copy_only=False)
        ct = group["n_captures"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cn, return_inverse=True)
        mx = np.full(uniq.shape[0], np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        cnt = np.zeros(uniq.shape[0], np.int64)
        np.add.at(cnt, inv, ct)
        return pa.table(
            {
                "url_canon": pa.array(uniq),
                "warc_ts": pa.array(mx, pa.int64()),
                "n_captures": pa.array(cnt, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id"])
        .map_batches(caps_reduced, batch_format="pyarrow", batch_size=8192)
        .groupby("b")
        .map_groups(combine, batch_format="pyarrow")
    )


# ------------------------------------------------ substring decontamination


def substring_decontaminate(sf_dir: str, minlen: int = 64, bench_mod: int = 19):
    """Substring-level eval-set decontamination — the flagship scan
    kernel's rolling window hash applied to the decontaminate problem:
    count, per TRAINING doc, the ``minlen``-byte windows that appear
    verbatim in any BENCHMARK doc (``doc_id % bench_mod == 0``, the
    repo-wide stand-in for an eval set). Sharing a >=minlen substring is
    equivalent to sharing at least one minlen-window, so
    ``is_contaminated`` is exact at substring granularity — the byte-level
    complement of the word-8-gram ``decontaminate`` filter. Windows are
    BYTES; the oracle's substr() is characters — identical on ASCII
    fixtures (the same documented divergence as ngram_jaccard_exact_pairs).

    Scale shape mirrors ``decontaminate``: the benchmark window-hash set
    is small by definition — one streaming pass collects its distinct u64
    hashes (driver-side unique of per-batch partials, ``ray.put``
    broadcast; swap in functions/bloom past ~50M windows exactly like
    decontaminate's gate); the corpus side is one more streaming pass of
    the O(n) chunked rolling-hash kernel plus a sorted-set probe. No
    shuffle touches the corpus. 64-bit window hashes stand in for window
    identity (collision odds ~n^2/2^64, negligible below ~10^8 distinct
    windows; widen to two u64 lanes at 10^12 docs)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes
    from hg_dedup_ray.functions.scan import _window_hashes

    def _batch_windows(batch: pa.Table):
        """(hashes, window_doc_row, valid_mask, ids) for one batch: all
        minlen-window hashes over the concatenated batch buffer, masked
        to windows lying fully inside one doc."""
        data, offsets = string_column_bytes(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if data.shape[0] < minlen:
            return (
                np.empty(0, np.uint64),
                np.empty(0, np.int64),
                np.empty(0, bool),
                ids,
            )
        h = _window_hashes(data, minlen)
        m = h.shape[0]
        pos = np.arange(m, dtype=np.int64)
        wdoc = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + minlen <= offsets[1:][wdoc]
        return h, wdoc, valid, ids

    def bench_partial(batch: pa.Table) -> pa.Table:
        h, wdoc, valid, ids = _batch_windows(batch)
        sel = valid & (ids[wdoc] % bench_mod == 0)
        return pa.table({"h": pa.array(np.unique(h[sel]), pa.uint64())})

    import ray as _ray

    parts = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(bench_partial, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    chunks = [
        t["h"].to_numpy(zero_copy_only=False)
        for t in _ray.get(parts.to_arrow_refs())
        if len(t)
    ]
    bset = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.uint64)
    bref = ray.put(bset)

    def probe(batch: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        bs = get_broadcast(bref)
        h, wdoc, valid, ids = _batch_windows(batch)
        train_w = valid & (ids[wdoc] % bench_mod != 0)
        hh, dd = h[train_w], wdoc[train_w]
        if bs.shape[0] and hh.shape[0]:
            p = np.searchsorted(bs, hh)
            hit = (p < bs.shape[0]) & (bs[np.minimum(p, bs.shape[0] - 1)] == hh)
            n = np.bincount(dd[hit], minlength=ids.shape[0]).astype(np.int64)
        else:
            n = np.zeros(ids.shape[0], np.int64)
        train_doc = ids % bench_mod != 0
        return pa.table(
            {
                "doc_id": pa.array(ids[train_doc], pa.int64()),
                "n_contaminated_windows": pa.array(n[train_doc], pa.int64()),
                "is_contaminated": pa.array(n[train_doc] > 0, pa.bool_()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------------- deterministic_shuffle


SHUFFLE_BUCKET_BITS = 12  # 4096 fixed rank buckets at any corpus size


def deterministic_shuffle(sf_dir: str):
    """Global training-order shuffle WITHOUT a sort shuffle: rank every
    doc by splitmix64(doc_id) (a u64 bijection — no ties) using a
    two-pass histogram. Pass 1 streams per-batch counts of the hash's
    top 12 bits (4096 buckets; only (bucket, count) int rows leave the
    workers); the driver prefix-sums them into bucket base offsets.
    Pass 2 groups rows by bucket — the group count is FIXED at 4096
    regardless of corpus size, per the repo groupby rule — and each
    group sorts locally: global_rank = base[bucket] + local_rank.

    This is the deterministic, cluster-size-independent alternative to
    ``Dataset.random_shuffle`` a reproducible training pipeline needs:
    same permutation on 1 node or 256. Output (doc_id, shuffle_rank).
    Only (bucket:int64, sm:u64, doc_id) rows enter the one shuffle —
    inherent to emitting a global permutation."""
    from hg_dedup_ray.functions.bloom import _splitmix

    shift = np.uint64(64 - SHUFFLE_BUCKET_BITS)
    n_buckets = 1 << SHUFFLE_BUCKET_BITS

    def count_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = (_splitmix(ids.astype(np.uint64)) >> shift).astype(np.int64)
        cnt = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    docs = _docs(sf_dir, columns=["doc_id"])
    parts = docs.map_batches(
        count_partial, batch_format="pyarrow", batch_size=65536
    ).materialize()
    total = np.zeros(n_buckets, np.int64)
    for t in ray.get(parts.to_arrow_refs()):
        if len(t):
            # blocks may concatenate several batch outputs (repeated
            # bucket ids) — np.add.at, never fancy-index +=
            np.add.at(
                total,
                t["bucket"].to_numpy(zero_copy_only=False),
                t["cnt"].to_numpy(zero_copy_only=False),
            )
    base = np.concatenate(([0], np.cumsum(total)[:-1]))
    base_ref = ray.put(base)

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sm = _splitmix(ids.astype(np.uint64))
        return pa.table(
            {
                "bucket": pa.array((sm >> shift).astype(np.int64), pa.int64()),
                "sm": pa.array(sm, pa.uint64()),
                "doc_id": batch["doc_id"],
            }
        )

    def rank_bucket(group: pa.Table) -> pa.Table:
        from hg_dedup_ray.stages.broadcast import get_broadcast

        b = get_broadcast(base_ref)
        sm = group["sm"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(sm)
        bucket = int(group["bucket"][0].as_py())
        rank = int(b[bucket]) + np.arange(sm.shape[0], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "shuffle_rank": pa.array(rank, pa.int64()),
            }
        )

    return (
        docs.map_batches(key_rows, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


# -------------------------------------------------------- cap_per_source


CAP_PER_SOURCE = 15


def cap_per_source(sf_dir: str, cap: int = CAP_PER_SOURCE):
    """Per-source quota sampling — the curation op that stops one domain
    from dominating the mix: keep at most ``cap`` docs per source,
    chosen by deterministic random priority splitmix64(doc_id) (ties
    impossible — the hash is a bijection). Output (doc_id, source,
    src_rank) of kept docs.

    Scale shape: sources hash into 64 coarse buckets (fixed group
    count); within a bucket the rows are dictionary-encoded (EXACT
    source identity, no hash-collision caveat), lexsorted by
    (source_code, sm), and ranked with one searchsorted subtraction —
    no per-source Python. Only (bucket, sm, doc_id, source) rows
    shuffle; at web scale source cardinality is huge but each group is
    a fixed 1/64 slice, and skewed mega-sources cost one extra lexsort
    term, not a hot task."""
    from hg_dedup_ray.functions.bloom import _splitmix

    n_buckets = 64

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sm = _splitmix(ids.astype(np.uint64))
        src = batch["source"]
        enc = (
            src.combine_chunks().dictionary_encode()
            if isinstance(src, pa.ChunkedArray)
            else src.dictionary_encode()
        )
        # bucket by a DETERMINISTIC hash of the source STRING so one
        # source's rows co-locate regardless of which worker hashes them
        # (Python's hash() is per-process salted); the in-bucket
        # grouping below is exact
        import hashlib

        dhash = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(),
                    "little",
                )
                & 0x7FFFFFFF
                for v in enc.dictionary.to_pylist()
            ],
            np.int64,
        )
        bucket = dhash[enc.indices.to_numpy(zero_copy_only=False)] % n_buckets
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "sm": pa.array(sm, pa.uint64()),
                "doc_id": batch["doc_id"],
                "source": src,
            }
        )

    def rank_bucket(group: pa.Table) -> pa.Table:
        sm = group["sm"].to_numpy(zero_copy_only=False)
        src = group["source"]
        enc = (
            src.combine_chunks().dictionary_encode()
            if isinstance(src, pa.ChunkedArray)
            else src.dictionary_encode()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sm, codes))
        codes_s = codes[order]
        starts = np.searchsorted(codes_s, np.arange(len(enc.dictionary)))
        src_rank = np.arange(codes_s.shape[0], dtype=np.int64) - starts[codes_s]
        keep = src_rank < cap
        kept = order[keep]
        return pa.table(
            {
                "doc_id": group["doc_id"].take(pa.array(kept, pa.int64())),
                "source": src.take(pa.array(kept, pa.int64()))
                if not isinstance(src, pa.ChunkedArray)
                else src.combine_chunks().take(pa.array(kept, pa.int64())),
                "src_rank": pa.array(src_rank[keep], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id", "source"])
        .map_batches(key_rows, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


# ------------------------------------------------- bloom dedup report

BLOOM_REPORT_M = 4096  # filter bits — fixture-sized so false positives
BLOOM_REPORT_K = 3     # are visible in the report (prod: bits ~ O(docs))


def bloom_dedup_report(
    sf_dir: str,
    m_bits: int = BLOOM_REPORT_M,
    k: int = BLOOM_REPORT_K,
    num_shards: int = 32,
):
    """Dolma-style sequential Bloom-filter dedup (Soldaini et al. 2024,
    the `dedupe-by-bloom` pass; reference analogue: the keep-first
    identity gate of dedup_v3.py) with full false-positive accounting:

    docs arrive in doc_id order; each queries the filter (k probe bits =
    12-bit lanes of the splitmix64 doc hash), then inserts itself.

    - ``bloom_dup``  — all k probe bits were set by some EARLIER doc
      (what a real Bloom pass would drop),
    - ``key_dup``    — an earlier doc had the same 64-bit doc hash
      (separates hash collisions from bit collisions),
    - ``exact_dup``  — an earlier doc had byte-identical text (ground
      truth; exact_dup => key_dup => bloom_dup, never the reverse).

    Order-aware distributed formulation: bit b's state when doc s
    arrives is fully determined by min_id[b] = the smallest doc_id
    probing b, so the sequential filter becomes per-batch partial mins
    (np.minimum.at into a dense m-array) -> ONE shuffle of <= m short
    rows per block into ``num_shards`` range shards (vectorized segment
    min each) -> a fixed-size broadcast array -> a second stateless
    flagging pass. No text is shuffled; no sequential dependency
    remains. key/exact mins ride the same shape keyed on u64 hashes
    (driver holds one 16-byte row per DISTINCT hash — the QA-diagnostic
    budget; production exact dedup is exact_dedup / incremental_dedup's
    bucketed path).

    The doc hash is sketches.kmv_token_hashes' 8-char-prefix+length
    chain, replicated bit-for-bit in the DuckDB oracle (ASCII fixture
    assumption as documented there); prefix+length collisions are
    therefore deliberate, identical sketch behavior on both sides.
    """
    from hg_dedup_ray.pipelines.sketches import kmv_token_hashes
    from hg_dedup_ray.stages.textstats import content_hash_u64

    m = int(m_bits)
    shift = max((m - 1).bit_length(), 1)
    kk = int(k)
    sentinel = np.iinfo(np.int64).max

    def probe_positions(h: np.ndarray) -> np.ndarray:
        """(n, k) int64 probe positions: consecutive shift-bit lanes."""
        lanes = [
            ((h >> np.uint64(shift * r)) % np.uint64(m)).astype(np.int64)
            for r in range(kk)
        ]
        return np.stack(lanes, axis=1)

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "shard": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "min_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = kmv_token_hashes(batch["text"])
        # kind 0: bloom bit -> min doc_id (dense m-array, then sparse rows)
        arr = np.full(m, sentinel, np.int64)
        pos = probe_positions(h)
        np.minimum.at(arr, pos.ravel(), np.repeat(ids, kk))
        hit = np.flatnonzero(arr != sentinel)
        # kinds 1/2: doc-hash / content-hash -> min doc_id (unique per batch)
        def key_min(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            order = np.lexsort((ids, keys))
            ks, first = np.unique(keys[order], return_index=True)
            return ks.view(np.int64), ids[order][first]

        kh, kh_min = key_min(h)
        fp = content_hash_u64(batch)["fp"].to_numpy(zero_copy_only=False)
        fh, fh_min = key_min(fp)
        key = np.concatenate([hit, kh, fh])
        min_id = np.concatenate([arr[hit], kh_min, fh_min])
        kind = np.repeat(
            np.array([0, 1, 2], np.int8),
            [hit.shape[0], kh.shape[0], fh.shape[0]],
        )
        shard = np.empty(key.shape[0], np.int64)
        nb = hit.shape[0]
        shard[:nb] = key[:nb] * num_shards // m  # bit pos: range shards
        shard[nb:] = (
            key[nb:].view(np.uint64) % np.uint64(num_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "min_id": pa.array(min_id, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.select(["kind", "key", "min_id"])
        key = group["key"].to_numpy(zero_copy_only=False)
        mid = group["min_id"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        order = np.lexsort((mid, key, kind))
        kk_, ky, md = kind[order], key[order], mid[order]
        first = np.ones(order.shape[0], bool)
        first[1:] = (kk_[1:] != kk_[:-1]) | (ky[1:] != ky[:-1])
        return pa.table(
            {
                "kind": pa.array(kk_[first], pa.int8()),
                "key": pa.array(ky[first], pa.int64()),
                "min_id": pa.array(md[first], pa.int64()),
            }
        )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    rows = (
        docs.map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby("shard")
        .map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    bloom_min = np.full(m, sentinel, np.int64)
    keys: dict[int, list] = {1: [], 2: []}
    for r in rows:
        if r["kind"] == 0:
            bloom_min[r["key"]] = min(bloom_min[r["key"]], r["min_id"])
        else:
            keys[r["kind"]].append((r["key"], r["min_id"]))

    def sorted_pair(lst: list) -> tuple[np.ndarray, np.ndarray]:
        if not lst:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        a = np.array(lst, np.int64)
        order = np.argsort(a[:, 0], kind="stable")
        return a[order, 0], a[order, 1]

    state_ref = ray.put(
        (bloom_min, sorted_pair(keys[1]), sorted_pair(keys[2]))
    )

    def flag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bloom_dup": pa.array([], pa.bool_()),
                "key_dup": pa.array([], pa.bool_()),
                "exact_dup": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        from hg_dedup_ray.stages.broadcast import get_broadcast

        bmin, (khs, kmins), (fhs, fmins) = get_broadcast(state_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = kmv_token_hashes(batch["text"])
        bloom = (bmin[probe_positions(h)] < ids[:, None]).all(axis=1)

        def earlier(keys_s, mins_s, q: np.ndarray) -> np.ndarray:
            j = np.searchsorted(keys_s, q)  # every key is present
            return mins_s[j] < ids

        kdup = earlier(khs, kmins, h.view(np.int64))
        fp = content_hash_u64(batch)["fp"].to_numpy(zero_copy_only=False)
        edup = earlier(fhs, fmins, fp.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bloom_dup": pa.array(bloom),
                "key_dup": pa.array(kdup),
                "exact_dup": pa.array(edup),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------- dedup-aware splitting


def dedup_aware_split(sf_dir: str):
    """Train/heldout assignment computed two ways per doc (the
    decontamination-adjacent split op every pretraining pipeline needs):

    - ``split_content``: heldout iff splitmix64(doc text hash) % 10 == 0.
      Every copy of a text shares the hash, so NO duplicate group can
      straddle the boundary — eval contamination by exact duplication is
      structurally impossible (the property split_leakage_report
      measures). Text hash = sketches.kmv_token_hashes' prefix8+length
      chain, bit-replicated in the DuckDB oracle.
    - ``split_naive``: the same 10% rule on splitmix64(doc_id) — the
      strawman that leaks ~2*p*(1-p) of duplicate groups.

    Pure per-batch map, no shuffle; output (doc_id, split_content,
    split_naive)."""
    from hg_dedup_ray.functions.bloom import _splitmix
    from hg_dedup_ray.pipelines.sketches import kmv_token_hashes

    def assign(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "split_content": pa.array([], pa.string()),
                "split_naive": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hc = kmv_token_hashes(batch["text"])
        hn = _splitmix(ids.astype(np.uint64))
        sc = np.where(hc % np.uint64(10) == 0, "heldout", "train")
        sn = np.where(hn % np.uint64(10) == 0, "heldout", "train")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split_content": pa.array(sc.tolist(), pa.string()),
                "split_naive": pa.array(sn.tolist(), pa.string()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        assign, batch_format="pyarrow", batch_size=8192
    )


def split_leakage_report(sf_dir: str, num_buckets: int = 64):
    """(split_mode, n_dup_texts, n_leaky_texts): among texts with >= 2
    exact copies, how many have copies on BOTH sides of each split of
    dedup_aware_split. 'content' is structurally zero (the property the
    op exists to provide); 'naive' leaks whenever a dup group's doc_ids
    hash to different sides.

    Scale shape: per-batch distinct (fp:u64 -> count, 4 presence bits),
    one fp%B coarse-bucket combine (segment sum + OR), tiny final Sum —
    exact_dedup's partial-min shape with bit flags; text never
    shuffles. Text identity via blake2b-8 fp (the exact_dedup collision
    assumption); the split bits hash the text too, so every fp group is
    split-homogeneous in content mode on both engines."""
    from ray.data.aggregate import Sum

    from hg_dedup_ray.functions.bloom import _splitmix
    from hg_dedup_ray.pipelines.sketches import kmv_token_hashes
    from hg_dedup_ray.stages.textstats import content_hash_u64

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cbucket": pa.array([], pa.int64()),
                "fp": pa.array([], pa.uint64()),
                "cnt": pa.array([], pa.int64()),
                "ct": pa.array([], pa.int8()),
                "ch": pa.array([], pa.int8()),
                "nt": pa.array([], pa.int8()),
                "nh": pa.array([], pa.int8()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = content_hash_u64(batch)["fp"].to_numpy(zero_copy_only=False)
        hc = kmv_token_hashes(batch["text"]) % np.uint64(10) == 0
        hn = _splitmix(ids.astype(np.uint64)) % np.uint64(10) == 0
        order = np.argsort(fp, kind="stable")
        f = fp[order]
        new = np.concatenate(([True], f[1:] != f[:-1]))
        rid = np.cumsum(new) - 1
        cnt = np.bincount(rid).astype(np.int64)
        ct = np.bincount(rid, weights=~hc[order]) > 0  # content-train seen
        ch = np.bincount(rid, weights=hc[order]) > 0   # content-heldout seen
        nt = np.bincount(rid, weights=~hn[order]) > 0
        nh = np.bincount(rid, weights=hn[order]) > 0
        uf = f[new]
        return pa.table(
            {
                "cbucket": pa.array(
                    (uf % num_buckets).astype(np.int64), pa.int64()
                ),
                "fp": pa.array(uf, pa.uint64()),
                "cnt": pa.array(cnt, pa.int64()),
                "ct": pa.array(ct.astype(np.int8), pa.int8()),
                "ch": pa.array(ch.astype(np.int8), pa.int8()),
                "nt": pa.array(nt.astype(np.int8), pa.int8()),
                "nh": pa.array(nh.astype(np.int8), pa.int8()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        fp = group["fp"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp, kind="stable")
        f = fp[order]
        new = np.concatenate(([True], f[1:] != f[:-1]))
        rid = np.cumsum(new) - 1
        cnt = np.bincount(
            rid, weights=group["cnt"].to_numpy(zero_copy_only=False)[order]
        )
        flags = {}
        for c in ("ct", "ch", "nt", "nh"):
            flags[c] = (
                np.bincount(
                    rid, weights=group[c].to_numpy(zero_copy_only=False)[order]
                )
                > 0
            )
        dup = cnt >= 2
        return pa.table(
            {
                "n_dup": pa.array([int(dup.sum())], pa.int64()),
                "leak_c": pa.array(
                    [int((dup & flags["ct"] & flags["ch"]).sum())], pa.int64()
                ),
                "leak_n": pa.array(
                    [int((dup & flags["nt"] & flags["nh"]).sum())], pa.int64()
                ),
            }
        )

    parts = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("cbucket")
        .map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    n_dup = int(sum(r["n_dup"] for r in parts))
    leak_c = int(sum(r["leak_c"] for r in parts))
    leak_n = int(sum(r["leak_n"] for r in parts))
    return pa.table(
        {
            "split_mode": pa.array(["content", "naive"], pa.string()),
            "n_dup_texts": pa.array([n_dup, n_dup], pa.int64()),
            "n_leaky_texts": pa.array([leak_c, leak_n], pa.int64()),
        }
    )


# ------------------------------------------------- paragraph-level dedup


def _paragraph_arrays(text_col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split texts on '\\n' -> (flat paragraph values, per-doc paragraph
    counts, u64 hash per paragraph). Splitting keeps empty strings (both
    engines' split semantics agree). Identity is the module-wide
    vectorized u64 polynomial hash (``wordgrams.token_hashes``) — same
    collision stance as the blake2b-8 fp used for whole-doc identity,
    but one segment-sum over the flat byte buffer instead of one
    hashlib call per line."""
    from hg_dedup_ray.functions.wordgrams import token_hashes

    lists = pc.split_pattern(text_col, pattern="\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    counts = (
        pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = lists.flatten()
    return flat, counts, token_hashes(flat)


def paragraph_dedup(sf_dir: str):
    """Dolma-style paragraph-level exact dedup, keep-first over
    (doc_id, paragraph_idx): a paragraph is dropped iff the SAME
    paragraph text occurred at a lexicographically earlier position
    (earlier doc, or earlier index in the same doc). Returns per doc
    (doc_id, n_paragraphs, n_dup_paragraphs, kept_text) with kept_text
    the surviving paragraphs re-joined by '\\n' in original order.
    On one-line corpora this degenerates to exact doc dedup — a free
    oracle cross-check; multi-paragraph semantics are pinned by the
    planted test. Reference analog: the keep-first rule of
    cpp_engine_dedup.h's run scan, at paragraph granularity.

    Shape: ngram_novelty's composition — per-batch (hash, packed rank)
    rows, hot-key prefilter (singleton paragraphs are always kept),
    filtered partial-min over the materialized rows, dup-density-bounded
    broadcast of (hash, min_rank), then one stateless flag+rebuild pass
    (binary_join on the kept ListArray). Text never shuffles; ranks pack
    (doc_id, idx) into one u64 (both guarded < 2^32)."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys
    from hg_dedup_ray.stages.broadcast import get_broadcast

    def _ranks(ids: np.ndarray, counts: np.ndarray) -> np.ndarray:
        if ids.shape[0] and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError("paragraph_dedup packs doc_id into 32 bits")
        total = int(counts.sum())
        idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        own = np.repeat(ids.astype(np.uint64), counts)
        return (own << np.uint64(32)) | idx.astype(np.uint64)

    def para_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "ph": pa.array([], pa.uint64()),
                    "rank": pa.array([], pa.uint64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, counts, ph = _paragraph_arrays(batch["text"])
        return pa.table(
            {
                "ph": pa.array(ph, pa.uint64()),
                "rank": pa.array(_ranks(ids, counts), pa.uint64()),
            }
        )

    paras = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(para_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    hot = np.sort(hot_u64_keys(paras, "ph"))
    hot_ref = ray.put(hot)

    def partial_min(batch: pa.Table) -> pa.Table:
        # empty fixtures: Ray hands the INPUT-schema empty block through
        if batch.num_rows == 0 or "ph" not in batch.column_names:
            return pa.table(
                {
                    "ph": pa.array([], pa.uint64()),
                    "min_rank": pa.array([], pa.uint64()),
                }
            )
        h = get_broadcast(hot_ref)
        g = batch["ph"].to_numpy(zero_copy_only=False)
        rk = batch["rank"].to_numpy(zero_copy_only=False)
        if h.shape[0] and g.shape[0]:
            pos = np.searchsorted(h, g)
            hit = (pos < h.shape[0]) & (h[np.minimum(pos, h.shape[0] - 1)] == g)
        else:
            hit = np.zeros(g.shape[0], bool)
        g, rk = g[hit], rk[hit]
        order = np.lexsort((rk, g))
        gs, first = np.unique(g[order], return_index=True)
        return pa.table(
            {
                "ph": pa.array(gs, pa.uint64()),
                "min_rank": pa.array(rk[order][first], pa.uint64()),
            }
        )

    parts = ray.get(
        paras.map_batches(
            partial_min, batch_format="pyarrow", batch_size=65536
        ).to_arrow_refs()
    )
    parts = [t for t in parts if t.num_rows]  # empty ds: raw pass-through
    gcat = np.concatenate(
        [t["ph"].to_numpy(zero_copy_only=False) for t in parts]
        or [np.empty(0, np.uint64)]
    )
    rcat = np.concatenate(
        [t["min_rank"].to_numpy(zero_copy_only=False) for t in parts]
        or [np.empty(0, np.uint64)]
    )
    order = np.lexsort((rcat, gcat))
    gs, first = np.unique(gcat[order], return_index=True)
    mins_ref = ray.put((gs, rcat[order][first]))

    def flag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_paragraphs": pa.array([], pa.int64()),
                "n_dup_paragraphs": pa.array([], pa.int64()),
                "kept_text": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        hg, hr = get_broadcast(mins_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts, ph = _paragraph_arrays(batch["text"])
        rk = _ranks(ids, counts)
        if hg.shape[0] and ph.shape[0]:
            pos = np.minimum(np.searchsorted(hg, ph), hg.shape[0] - 1)
            hit = hg[pos] == ph
            keep = ~hit | (hr[pos] == rk)
        else:
            keep = np.ones(ph.shape[0], bool)
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        n_dup = np.zeros(counts.shape[0], np.int64)
        np.add.at(n_dup, seg, (~keep).astype(np.int64))
        kept_counts = counts - n_dup
        new_off = np.concatenate(([0], np.cumsum(kept_counts)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(keep))
        )
        kept_text = pc.binary_join(kept_list, "\n")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_paragraphs": pa.array(counts, pa.int64()),
                "n_dup_paragraphs": pa.array(n_dup, pa.int64()),
                "kept_text": kept_text,
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        flag, batch_format="pyarrow", batch_size=4096
    )


def boilerplate_line_strip(sf_dir: str, min_df: int = 3):
    """C4-style global boilerplate removal: a non-empty line that
    occurs in >= min_df DISTINCT documents is boilerplate (cookie
    banners, nav bars, license footers) and is stripped from EVERY doc
    — including its first occurrence, which is what distinguishes this
    from paragraph_dedup's keep-first rule. Empty lines are structure
    and always survive. Returns per doc (doc_id, n_lines,
    n_boilerplate_lines, kept_text) with kept_text re-joined by '\\n'
    in original order.

    Shape: pass 1 emits one u64 row per (doc, DISTINCT non-empty line
    hash) — the per-doc distinct is a batch-local lexsort, so a line
    repeated inside one doc counts once toward df; hot_u64_keys_counts
    returns (key, df) for keys with df >= 2 only (the dup-bounded
    driver set), thresholded at min_df; the boilerplate hash set
    broadcasts sorted and one stateless pass rebuilds kept_text via
    ListArray binary_join. Text never shuffles; the vectorized u64
    polynomial hash stands in for line identity with the same ~2^-64
    collision stance as paragraph_dedup."""
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys_counts
    from hg_dedup_ray.stages.broadcast import get_broadcast

    if min_df < 2:
        raise ValueError("min_df >= 2 (df prefilter keeps only dup keys)")

    def line_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table({"lh": pa.array([], pa.uint64())})
        flat, counts, ph = _paragraph_arrays(batch["text"])
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        seg, ph = seg[ne], ph[ne]
        order = np.lexsort((ph, seg))
        seg_s, ph_s = seg[order], ph[order]
        first = (
            np.concatenate(
                ([True], (seg_s[1:] != seg_s[:-1]) | (ph_s[1:] != ph_s[:-1]))
            )
            if seg_s.shape[0]
            else np.zeros(0, bool)
        )
        return pa.table({"lh": pa.array(ph_s[first], pa.uint64())})

    rows = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(line_rows, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )
    keys, dfs = hot_u64_keys_counts(rows, "lh")
    bp = keys[dfs >= min_df]  # keys come back sorted from np.unique
    bp_ref = ray.put(bp)

    def strip(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "n_boilerplate_lines": pa.array([], pa.int64()),
                "kept_text": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        hot = get_broadcast(bp_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts, ph = _paragraph_arrays(batch["text"])
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if hot.shape[0] and ph.shape[0]:
            pos = np.minimum(np.searchsorted(hot, ph), hot.shape[0] - 1)
            bp_hit = (hot[pos] == ph) & ne
        else:
            bp_hit = np.zeros(ph.shape[0], bool)
        seg = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        n_bp = np.zeros(counts.shape[0], np.int64)
        np.add.at(n_bp, seg, bp_hit.astype(np.int64))
        new_off = np.concatenate(([0], np.cumsum(counts - n_bp)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(~bp_hit))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(counts, pa.int64()),
                "n_boilerplate_lines": pa.array(n_bp, pa.int64()),
                "kept_text": pc.binary_join(kept_list, "\n"),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        strip, batch_format="pyarrow", batch_size=4096
    )


# ------------------------------------------------ incremental_near_dedup


def incremental_near_dedup(sf_dir: str, num_bands: int = 32, band_r: int = 4):
    """Cross-snapshot NEAR-dup dedup: for every NEW-snapshot doc, count
    how many of its MinHash-LSH band buckets collide with any HISTORY
    doc, and drop on any collision — the production monthly-crawl
    pattern (SlimPajama-style: LSH bucket membership IS the dup verdict,
    no pairwise verification stage). Snapshots are carved like
    ``incremental_dedup``: history = doc_id % 2 == 0, new = the rest.

    Output per new doc: (doc_id, n_hit_bands, dropped). Scale shape:
    only (bkey:u64, doc_id) band rows shuffle (32 x 8 B per doc, never
    text); the hot-key prefilter drops the overwhelmingly-singleton
    buckets first (a collision needs key multiplicity >= 2); per coarse
    bkey%64 group one lexsort finds runs containing a history doc; the
    surviving hit rows are dup-bounded and resolve on the driver. The
    u64 band-key fold stands in for the r-tuple (functions/minhash.
    oph_band_keys); the oracle keys on the exact tuple via string_agg."""
    from hg_dedup_ray.functions.minhash import make_band_rows
    from hg_dedup_ray.functions.pair_distinct import hot_u64_keys

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    rows = docs.map_batches(
        make_band_rows(num_bands=num_bands, band_r=band_r),
        batch_format="pyarrow",
        batch_size=2048,
    ).materialize()

    def new_side_report(hits_map):
        """(sorted new ids -> hit counts) applied as one filter scan."""
        hit_ids, hit_counts = hits_map

        def report(batch: pa.Table) -> pa.Table:
            from hg_dedup_ray.stages.broadcast import get_broadcast

            hi, hc = get_broadcast(hit_ids), get_broadcast(hit_counts)
            d = batch["doc_id"].to_numpy(zero_copy_only=False)
            b = batch.filter(pa.array(d % 2 == 1))
            dn = b["doc_id"].to_numpy(zero_copy_only=False)
            cnt = np.zeros(dn.shape[0], np.int64)
            if hi.shape[0]:
                pos = np.searchsorted(hi, dn)
                m = (pos < hi.shape[0]) & (
                    hi[np.minimum(pos, hi.shape[0] - 1)] == dn
                )
                cnt[m] = hc[pos[m]]
            return pa.table(
                {
                    "doc_id": pa.array(dn, pa.int64()),
                    "n_hit_bands": pa.array(cnt, pa.int64()),
                    "dropped": pa.array(cnt > 0, pa.bool_()),
                }
            )

        return report

    empty_map = (
        ray.put(np.empty(0, np.int64)),
        ray.put(np.empty(0, np.int64)),
    )
    ids_only = _docs(sf_dir, columns=["doc_id"])
    hot = hot_u64_keys(rows, "bkey")
    if hot.shape[0] == 0:
        return ids_only.map_batches(
            new_side_report(empty_map), batch_format="pyarrow"
        )
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
                (b["bkey"].to_numpy(zero_copy_only=False) % 64).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    def hit_rows(group: pa.Table) -> pa.Table:
        bk = group["bkey"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bk))
        bk, did = bk[order], did[order]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        run_id = np.cumsum(new) - 1
        has_hist = np.zeros(run_id[-1] + 1 if run_id.shape[0] else 0, bool)
        np.logical_or.at(has_hist, run_id, did % 2 == 0)
        m = has_hist[run_id] & (did % 2 == 1)
        return pa.table({"doc_id": pa.array(did[m], pa.int64())})

    hit_tab = (
        rows.map_batches(hot_only, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(hit_rows, batch_format="pyarrow")
    )
    parts = []
    for b in hit_tab.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        if len(b):
            parts.append(b["doc_id"].to_numpy(zero_copy_only=False))
    if parts:
        allhits = np.concatenate(parts)
        hit_ids, hit_counts = np.unique(allhits, return_counts=True)
        hits_map = (
            ray.put(hit_ids.astype(np.int64)),
            ray.put(hit_counts.astype(np.int64)),
        )
    else:
        hits_map = empty_map
    return ids_only.map_batches(
        new_side_report(hits_map), batch_format="pyarrow"
    )
