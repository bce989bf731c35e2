"""Deterministic synthetic Common-Crawl-style `webpages` table (FIXTURES.md).

Schema mandated by BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
plus an explicit ``doc_seq:int64`` order column (the reference's global doc
order = sorted file path + linenum, reference indexing_v6_sharded.py:179;
we materialize it instead of relying on file layout).

``generate_webpages`` injects the ten duplication patterns from FIXTURES.md
§2 and returns (table, tags) where ``tags`` maps pattern name -> involved
doc_seq list, for targeted assertions. Fully seeded — same (n_docs, seed,
minlen) always yields identical bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras amber crystal delta ember forest "
    "glacier harbor island juniper kernel lumen meadow nectar orbit prism "
    "quartz river summit timber umbra vertex willow xenon yonder zephyr"
).split()

_EXOTIC = ["日本語テキスト", "中文网页内容", "مرحبا بالعالم", "naïve café", "🌍🚀✨", "résumé"]


def _prose(rng: np.random.Generator, n_words: int, doc_id: int) -> str:
    idx = rng.integers(0, len(_WORDS), size=n_words)
    words = [_WORDS[i] for i in idx]
    # doc-unique markers every ~8 words kill accidental >=minlen natural
    # sharing between unrelated docs (the injected patterns must be the ONLY
    # source of long shared substrings)
    for k in range(0, len(words), 8):
        words[k] = f"w{doc_id}p{k}x{words[k]}"
    if rng.random() < 0.3:
        exotic = _EXOTIC[int(rng.integers(0, len(_EXOTIC)))]
        # doc-unique flanks keep the multi-byte chunk (<=24 bytes) from
        # forming a >=minlen shared region with other docs' copies of it
        words.insert(int(rng.integers(0, len(words))), f"q{doc_id}{exotic}z{doc_id}")
    return " ".join(words)


def generate_webpages(
    n_docs: int = 500, seed: int = 42, minlen: int = 64
) -> tuple[pa.Table, dict[str, list[int]]]:
    rng = np.random.default_rng(seed)
    texts: list[str] = [
        _prose(rng, int(rng.integers(40, 160)), i) for i in range(n_docs)
    ]
    tags: dict[str, list[int]] = {}

    def block(n_bytes: int, tag: int) -> str:
        """ASCII block of exactly n_bytes, deterministic per tag."""
        r = np.random.default_rng(seed * 1000 + tag)
        out = []
        size = 0
        while size < n_bytes:
            w = _WORDS[int(r.integers(0, len(_WORDS)))]
            out.append(w)
            size += len(w) + 1
        s = " ".join(out)
        return s[:n_bytes]

    used: set[int] = set()

    def take_at(positions: list[int]) -> list[int]:
        """Claim docs at (approximately) the given indices; linear-probe past
        already-claimed docs so patterns never overlap."""
        out: list[int] = []
        for x in positions:
            x = int(np.clip(x, 0, n_docs - 1))
            if len(used) >= n_docs:
                # degenerate tiny corpora: every doc already claimed —
                # allow reuse instead of probing forever
                out.append(x)
                continue
            while x in used:
                x = (x + 1) % n_docs
            out.append(x)
            used.add(x)
        return out

    def pick(lo: int, hi: int, k: int) -> list[int]:
        return take_at(list(np.clip(np.linspace(lo, hi, k).astype(int), 0, n_docs - 1)))

    # 1. exact duplicate docs (k=3)
    g = pick(10, n_docs - 10, 3)
    for d in g[1:]:
        texts[d] = texts[g[0]]
    tags["exact_dup"] = g

    # 2. shared substring minlen+delta at different positions
    for di, delta in enumerate([0, 1, minlen // 2]):
        b = block(minlen + delta, 100 + di)
        docs = pick(20 + di * 7, n_docs - 20 - di * 5, 3)
        for j, d in enumerate(docs):
            t = texts[d]
            cut = (j * 13) % max(1, len(t) // 2)
            texts[d] = t[:cut] + b + t[cut:]
        tags[f"shared_substring_d{delta}"] = docs

    # 3. sub-minlen repeats (negative control)
    b = block(minlen - 1, 200)
    docs = pick(30, n_docs - 30, 3)
    for j, d in enumerate(docs):
        t = texts[d]
        # doc-distinct single-char delimiters so the shared region is
        # EXACTLY minlen-1 bytes (no accidental flanking extension)
        texts[d] = t[: 10 + j] + str(j) + b + str(j) + t[10 + j :]
    tags["sub_minlen"] = docs

    # 4. within-document repeat
    d = pick(40, 40, 1)[0]
    b = block(minlen + 8, 300)
    texts[d] = texts[d][:20] + b + texts[d][20:50] + b + texts[d][50:]
    tags["within_doc"] = [d]

    # 5. tandem repeats B*3
    d = pick(50, 50, 1)[0]
    b = block(minlen + 4, 400)
    texts[d] = texts[d][:15] + b * 3 + texts[d][15:]
    tags["tandem"] = [d]

    # 6. UTF-8 boundary: shared byte region starts/ends mid-codepoint.
    # "ü"=C3 BC, "μ"=CE BC share trailing byte BC; "á"=C3 A1, "é"=C3 A9
    # share lead byte C3 -> maximal equal region = b"\xbc" + common + b"\xc3".
    da, db = pick(60, n_docs - 60, 2)
    common = block(minlen + 16, 500)
    texts[da] = texts[da][:12] + "ü" + common + "á" + texts[da][12:]
    texts[db] = texts[db][:25] + "μ" + common + "é" + texts[db][25:]
    tags["utf8_boundary"] = [da, db]

    # 7. cross-partition duplicates: first / last decile
    b = block(minlen * 2, 600)
    docs = take_at([5, n_docs - 5])
    for j, d in enumerate(docs):
        t = texts[d]
        texts[d] = t[: 8 + j * 3] + b + t[8 + j * 3 :]
    tags["cross_partition"] = docs

    # 8. hot prefix straddling partition cut points (and a hot LSH band)
    hot = block(minlen + 2, 700)
    docs = pick(70, n_docs - 70, min(30, max(4, n_docs // 16)))
    for d in docs:
        texts[d] = hot + texts[d]
    tags["hot_prefix"] = docs

    # 9. near-duplicates: seeded 1-3 char substitutions per ~500 bytes
    d_src, d_near = pick(80, n_docs - 80, 2)
    t = list(texts[d_src])
    r = np.random.default_rng(seed * 7 + 9)
    n_edits = max(1, (len(t) // 500) * int(r.integers(1, 4)))
    for _ in range(n_edits):
        i = int(r.integers(0, len(t)))
        t[i] = chr(ord("a") + int(r.integers(0, 26)))
    texts[d_near] = "".join(t)
    tags["near_dup"] = [d_src, d_near]

    # 10. sentinel adjacency: block flush at doc start / doc end
    da, db = pick(90, n_docs - 90, 2)
    b = block(minlen + 6, 800)
    texts[da] = b + texts[da]
    texts[db] = texts[db] + b
    tags["sentinel_adjacent"] = [da, db]

    langs = ["en", "de", "zh", "ja", "ar"]
    urls = [f"https://site{i % 97}.example/{i:08d}" for i in range(n_docs)]
    ts0 = np.int64(1_700_000_000_000_000)  # us
    jitter = rng.integers(0, 86_400_000_000, size=n_docs)
    warc_ts = (ts0 + np.arange(n_docs, dtype=np.int64) * 1_000_000 + jitter).astype(
        "datetime64[us]"
    )
    # realistic-enough page markup: title, nav links, entities, a script
    # block (excluded from visible text), paragraph-split body — gives the
    # HtmlFeatures parser (stages/multimodal.py) real structure to extract
    def _page(i: int, t: str) -> bytes:
        import html as _html

        words = t.split()
        title = " ".join(words[:6]) if words else f"page {i}"
        nav = "".join(
            f'<a href="/p/{(i + k) % n_docs:08d}">link {k}</a>'
            for k in range(1 + i % 3)
        )
        # the document text lives VERBATIM (entity-escaped) inside ONE
        # <main> element, so extraction recovers it byte-identically per
        # url — the north-rule per-row invariant (see
        # queries.html_text_extract); title/nav/script/footer are chrome
        return (
            f"<!DOCTYPE html><html lang=\"{langs[i % len(langs)]}\">"
            f"<head><title>{title}</title>"
            f"<script>var pageId={i};</script></head>"
            f"<body><nav>{nav}</nav>"
            f"<main>{_html.escape(t)}</main>"
            f"<p>footer &amp; more</p>"
            f"</body></html>"
        ).encode("utf-8")

    html = [_page(i, t) for i, t in enumerate(texts)]
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[i % len(langs)] for i in range(n_docs)], pa.string()),
            "doc_seq": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
        }
    )
    return table, tags


def write_webpages(
    out_dir: str,
    n_docs: int = 500,
    seed: int = 42,
    minlen: int = 64,
    n_files: int = 8,
) -> tuple[list[str], dict[str, list[int]]]:
    """Write the table as ``n_files`` sorted parquet fragments (FIXTURES.md:
    'Emit 4-16 Parquet files so partition/order logic is exercised')."""
    import os

    import pyarrow.parquet as pq

    table, tags = generate_webpages(n_docs, seed, minlen)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_docs, n_files + 1).astype(int)
    for f in range(n_files):
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(table.slice(bounds[f], bounds[f + 1] - bounds[f]), path)
        paths.append(path)
    return paths, tags
