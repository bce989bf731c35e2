"""webclean operators: bloom kernel accuracy, decontaminate bloom/exact
equivalence, pack_sequences vs naive prefix sum (incl. unordered input),
redact_pii RE2 parity on crafted PII, stratified_sample determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ bloom


def test_bloom_membership_and_fpr():
    from hg_dedup_ray.functions.bloom import bloom_build, bloom_query

    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 63, 100_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bits = bloom_build(members)
    assert bloom_query(bits, members).all()  # no false negatives, ever
    fpr = bloom_query(bits, others).mean()
    assert fpr < 0.01, fpr  # 12 bits/key, k=8 -> ~5e-4 expected


def test_bloom_empty():
    from hg_dedup_ray.functions.bloom import bloom_build, bloom_query

    bits = bloom_build(np.empty(0, np.uint64))
    assert not bloom_query(bits, np.arange(10, dtype=np.uint64)).any()


# --------------------------------------------------------- decontaminate


def test_decontaminate_bloom_path_matches_exact(monkeypatch):
    import hg_dedup_ray.pipelines.webclean as wc

    exact = wc.decontaminate(SF).to_pandas().sort_values("doc_id")
    monkeypatch.setattr(wc, "DECON_EXACT_LIMIT", 0)  # force bloom+verify
    bloom = wc.decontaminate(SF).to_pandas().sort_values("doc_id")
    assert (exact.to_numpy() == bloom.to_numpy()).all()
    assert (exact["doc_id"] % wc.DECON_BENCH_MOD != 0).all()


# -------------------------------------------------------- pack_sequences


def _naive_pack(ids, ntok, capacity):
    order = np.argsort(ids)
    cum_before = np.cumsum(ntok[order]) - ntok[order]
    pack_id = cum_before // capacity
    return pd.DataFrame(
        {
            "doc_id": ids[order],
            "n_tokens": ntok[order],
            "pack_id": pack_id,
            "pack_off": cum_before - pack_id * capacity,
        }
    )


def test_pack_sequences_matches_naive():
    from hg_dedup_ray.pipelines.webclean import PACK_CAPACITY, pack_sequences

    got = pack_sequences(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ntok = np.array(
        [len(s.split()) for s in t["text"].to_pylist()], np.int64
    )
    exp = _naive_pack(
        t["doc_id"].to_numpy(), ntok, PACK_CAPACITY
    ).reset_index(drop=True)
    assert (got.to_numpy() == exp.to_numpy()).all()
    # packs fill to capacity: every pack's docs start below capacity
    assert (got["pack_off"] < PACK_CAPACITY).all()


def test_pack_sequences_unordered_input(tmp_path):
    """Out-of-order doc_ids trigger the one-time sort fallback and still
    produce the doc_id-order packing."""
    from hg_dedup_ray.pipelines.webclean import PACK_CAPACITY, pack_sequences

    rng = np.random.default_rng(3)
    ids = rng.permutation(200).astype(np.int64)
    texts = ["w " * int(rng.integers(1, 40)) for _ in ids]
    pq.write_table(
        pa.table({"doc_id": ids, "text": texts}),
        tmp_path / "documents.parquet",
    )
    got = (
        pack_sequences(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ntok = np.array([len(t.split()) for t in texts], np.int64)
    exp = _naive_pack(ids, ntok, PACK_CAPACITY).reset_index(drop=True)
    assert (got.to_numpy() == exp.to_numpy()).all()


# ------------------------------------------------------------ redact_pii


def test_redact_pii_on_crafted_pii(tmp_path):
    import duckdb

    from hg_dedup_ray.pipelines.webclean import redact_pii

    props = [
        'contact bob.smith+x@ex-ample.co.uk or 10.0.255.3 now',
        '{"k": 42, "ip": "192.168.1.1"}',
        "no pii here",
        "just 123 and 456789",
        "a@b.io a@b.io 1.2.3.4",
    ]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(5), pa.int64()), "props": props}
        ),
        tmp_path / "events.parquet",
    )
    got = redact_pii(str(tmp_path)).to_pandas().sort_values("event_id")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL

    exp = con.sql(ORACLE_SQL["redact_pii"]).df().sort_values("event_id")
    assert (got.to_numpy() == exp.to_numpy()).all()
    r = got.set_index("event_id")
    assert r.loc[0, "redacted"] == "contact <EMAIL> or <IP> now"
    assert r.loc[0, "n_email"] == 1 and r.loc[0, "n_ip"] == 1
    assert r.loc[4, "n_email"] == 2 and r.loc[4, "n_ip"] == 1


# ----------------------------------------------------- stratified_sample


def test_stratified_sample_deterministic_and_rated():
    from hg_dedup_ray.pipelines.webclean import (
        SAMPLE_RATES_BP,
        stratified_sample,
    )

    a = stratified_sample(SF).to_pandas().sort_values("doc_id")
    b = stratified_sample(SF).to_pandas().sort_values("doc_id")
    assert (a.to_numpy() == b.to_numpy()).all()
    full = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    totals = pd.Series(full["lang"].to_pylist()).value_counts()
    kept = a["lang"].value_counts()
    for lang, rate in SAMPLE_RATES_BP.items():
        if totals.get(lang, 0) >= 50:
            frac = kept.get(lang, 0) / totals[lang]
            assert abs(frac - rate / 10000) < 0.25, (lang, frac)


# ----------------------------------------------------- incremental_dedup


def test_incremental_dedup_bucketed_matches_broadcast(ray_session):
    import hg_dedup_ray.pipelines.webclean as wc

    exact = np.sort(wc.incremental_dedup(SF).to_pandas()["doc_id"].to_numpy())
    bucketed = np.sort(
        wc.incremental_dedup(SF, exact_limit=0).to_pandas()["doc_id"].to_numpy()
    )
    assert (exact == bucketed).all()
    assert (exact % 2 == 1).all()  # only new-snapshot docs survive


def test_incremental_dedup_drops_history_dups(ray_session, tmp_path):
    import ray

    import hg_dedup_ray.pipelines.webclean as wc

    # doc 1 repeats doc 0's text; doc 3 is unique; doc 5 repeats doc 3 —
    # but doc 3 is NEW-side (odd), so only doc 1 drops (history = even).
    tab = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 5], pa.int64()),
            "text": pa.array(["aa bb", "aa bb", "cc dd", "ee ff", "ee ff"]),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    for lim in (10**9, 0):  # broadcast path, then bucketed path
        got = np.sort(
            wc.incremental_dedup(str(tmp_path), exact_limit=lim)
            .to_pandas()["doc_id"]
            .to_numpy()
        )
        assert got.tolist() == [3, 5]


def test_canonicalize_urls_rules():
    from hg_dedup_ray.pipelines.webclean import canonicalize_urls

    cases = {
        # scheme+host lowered, www/port/fragment/tracking stripped
        "HTTPS://www.Site3.EXAMPLE:443/page/21/?utm_source=f&id=21#x":
            "https://site3.example/page/21?id=21",
        # path case PRESERVED (paths are case-sensitive)
        "http://A.example:80/CaseSensitive/Path":
            "http://a.example/CaseSensitive/Path",
        # tracking param last; dangling & removed
        "https://a.example/p?id=1&fbclid=abc": "https://a.example/p?id=1",
        # all params tracking -> dangling ? removed; trailing slash gone
        "https://a.example/p/?gclid=1": "https://a.example/p",
        # no scheme: left structurally intact
        "a.example/p?id=2": "a.example/p?id=2",
        # root trailing slash
        "https://a.example/": "https://a.example",
    }
    got = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_url_dedup_latest_keeps_latest_capture(ray_session, tmp_path):
    from hg_dedup_ray.pipelines.webclean import (
        URL_TS_BASE,
        URL_TS_RECRAWL,
        url_dedup_latest,
    )

    tab = pa.table(
        {
            "doc_id": pa.array([0, 1, 7, 13], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    out = (
        url_dedup_latest(str(tmp_path))
        .to_pandas()
        .set_index("url_canon")
        .sort_index()
    )
    assert len(out) == 4  # one row per canonical url
    # docs 0 and 7 have a later recrawl capture: 2 captures, recrawl ts wins
    for d in (0, 7):
        row = out.loc[f"https://site{d % 97}.example/page/{d}?id={d}"]
        assert row["n_captures"] == 2
        assert row["warc_ts"] == URL_TS_BASE + URL_TS_RECRAWL + d
    for d in (1, 13):
        row = out.loc[f"https://site{d % 97}.example/page/{d}?id={d}"]
        assert row["n_captures"] == 1
        assert row["warc_ts"] == URL_TS_BASE + d


def test_substring_decontaminate_planted(ray_session, tmp_path):
    """A training doc embedding a >=minlen benchmark substring is flagged
    with the exact window count; a minlen-1 share is a negative control."""
    from hg_dedup_ray.pipelines.webclean import substring_decontaminate

    bench = "B " * 64                      # doc 0 (0 % 19 == 0): benchmark
    blk = bench[:64]                       # exactly minlen bytes of it
    texts = [
        bench.strip(),
        "t1 " + blk + " t1end",            # contains a full 64-byte window
        # 63 shared bytes flanked by non-space, non-'B' chars so the
        # periodic pattern can't extend across the boundary: NOT flagged
        "t2X" + blk[:-1] + "Y t2end",
        "t3 totally unrelated words here", # clean
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = (
        substring_decontaminate(str(tmp_path), minlen=64)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [1, 2, 3]  # benchmark doc 0 excluded
    assert bool(out.loc[1, "is_contaminated"])
    # every 64-window of blk inside doc 1 that also lies in bench:
    # doc 1 text = 't1 ' + blk + ' t1end'; windows fully inside blk: 1,
    # plus windows overlapping the flanks only if they match bench — the
    # flanks are unique, so exactly the aligned windows of 'B '*32 count
    n = int(out.loc[1, "n_contaminated_windows"])
    assert n >= 1
    assert not bool(out.loc[2, "is_contaminated"])
    assert not bool(out.loc[3, "is_contaminated"])


def test_deterministic_shuffle_partition_independent(ray_session, tmp_path):
    """The histogram-ranked shuffle must yield the SAME permutation no
    matter how the input is partitioned (the cluster-size-independence
    claim): one file vs four files, identical (doc_id -> rank) map, and
    the ranks are a permutation of 0..n-1."""
    from hg_dedup_ray.pipelines.webclean import deterministic_shuffle

    rng = np.random.default_rng(11)
    ids = rng.permutation(400).astype(np.int64)
    texts = [f"doc {i}" for i in ids]

    one = tmp_path / "one"
    four = tmp_path / "four"
    one.mkdir()
    four.mkdir()
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, one / "documents.parquet")
    (four / "documents.parquet").mkdir()
    for j in range(4):
        pq.write_table(
            t.slice(j * 100, 100),
            four / "documents.parquet" / f"part-{j}.parquet",
        )

    a = deterministic_shuffle(str(one)).to_pandas()
    b = deterministic_shuffle(str(four)).to_pandas()
    ma = dict(zip(a["doc_id"], a["shuffle_rank"]))
    mb = dict(zip(b["doc_id"], b["shuffle_rank"]))
    assert ma == mb
    assert sorted(ma.values()) == list(range(400))


def test_cap_per_source_mega_source_skew(ray_session, tmp_path):
    """One source holding 80% of all docs (the hot-domain case) must
    still be capped exactly, with the kept set = the cap lowest
    splitmix priorities of that source."""
    from hg_dedup_ray.functions.bloom import _splitmix
    from hg_dedup_ray.pipelines.webclean import cap_per_source

    n = 500
    src = np.where(np.arange(n) % 5 == 0, "small", "mega")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "text": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "source": pa.array(src.tolist(), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = cap_per_source(str(tmp_path), cap=15).to_pandas()
    assert (got.groupby("source").size() == 15).all()
    sm = _splitmix(np.arange(n, dtype=np.int64).astype(np.uint64))
    for name in ("small", "mega"):
        members = np.flatnonzero(src == name)
        want = set(members[np.argsort(sm[members])][:15].tolist())
        assert set(got[got["source"] == name]["doc_id"]) == want


# ---------------------------------------------------- bloom dedup report


def test_bloom_dedup_report_matches_sequential_simulation():
    """Pin the distributed order-free formulation against a literal
    sequential Bloom pass (query filter, then insert, doc_id order) and
    check the dup-taxonomy invariants exact => key => bloom."""
    from hg_dedup_ray.pipelines.sketches import kmv_token_hashes
    from hg_dedup_ray.pipelines.webclean import (
        BLOOM_REPORT_K,
        BLOOM_REPORT_M,
        bloom_dedup_report,
    )

    df = (
        bloom_dedup_report(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    t = t.sort_by("doc_id")
    h = kmv_token_hashes(t["text"].combine_chunks())
    shift = (BLOOM_REPORT_M - 1).bit_length()

    bits: set[int] = set()
    seen_keys: set[int] = set()
    seen_texts: set[str] = set()
    exp_bloom, exp_key, exp_exact = [], [], []
    for i, txt in enumerate(t["text"].to_pylist()):
        probes = {
            int((h[i] >> np.uint64(shift * r)) % np.uint64(BLOOM_REPORT_M))
            for r in range(BLOOM_REPORT_K)
        }
        exp_bloom.append(probes <= bits)
        exp_key.append(int(h[i]) in seen_keys)
        exp_exact.append(txt in seen_texts)
        bits |= probes
        seen_keys.add(int(h[i]))
        seen_texts.add(txt)

    assert (df["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert df["bloom_dup"].tolist() == exp_bloom
    assert df["key_dup"].tolist() == exp_key
    assert df["exact_dup"].tolist() == exp_exact
    # taxonomy: exact => key => bloom (a Bloom filter never false-negatives)
    assert (~df["exact_dup"] | df["key_dup"]).all()
    assert (~df["key_dup"] | df["bloom_dup"]).all()
    # the fixture makes the taxonomy non-vacuous: bit-collision FPs exist
    assert df["bloom_dup"].sum() > df["key_dup"].sum()
    assert df["key_dup"].sum() > 0


# ------------------------------------------------- dedup-aware splitting


def _planted_dup_fixture(tmp_path):
    """300 docs: ids 0..99 unique texts, then 100 dup groups of 2 copies
    each with ids interleaved across the range so splitmix(doc_id) puts
    some groups on both sides of the naive split."""
    # id FIRST: the content hash is a prefix8+length chain, so texts
    # must differ within their first 8 bytes to get distinct hashes
    texts = [f"u{i} unique doc with filler words" for i in range(100)]
    ids = list(range(100))
    for g in range(100):
        t = f"d{g} duplicated group shared text body"
        texts += [t, t]
        ids += [100 + g, 200 + g]
    df = pd.DataFrame(
        {
            "doc_id": np.array(ids, np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    return df


def test_dedup_aware_split_planted(ray_session, tmp_path):
    """Copies of one text ALWAYS share split_content (structural
    no-leakage), the naive split leaks on this fixture, and both split
    columns match the DuckDB oracle bit-for-bit."""
    import duckdb

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.webclean import (
        dedup_aware_split,
        split_leakage_report,
    )

    _planted_dup_fixture(tmp_path)
    got = (
        dedup_aware_split(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == 300
    # structural property: dup group g = ids {100+g, 200+g} same side
    by_id = got.set_index("doc_id")["split_content"]
    for g in range(100):
        assert by_id[100 + g] == by_id[200 + g]
    # both splits hold out roughly 10%
    for col in ("split_content", "split_naive"):
        frac = (got[col] == "heldout").mean()
        assert 0.02 < frac < 0.25, (col, frac)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.sql(ORACLE_SQL["dedup_aware_split"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got.to_numpy() == exp.to_numpy()).all()

    rep = split_leakage_report(str(tmp_path)).to_pandas()
    rep = rep.set_index("split_mode")
    assert int(rep.loc["content", "n_dup_texts"]) == 100
    assert int(rep.loc["content", "n_leaky_texts"]) == 0  # structural
    assert int(rep.loc["naive", "n_leaky_texts"]) > 0     # the strawman
    exp_rep = con.sql(ORACLE_SQL["split_leakage_report"]).df()
    exp_rep = exp_rep.set_index("split_mode")
    assert (
        rep.sort_index().to_numpy() == exp_rep.sort_index().to_numpy()
    ).all()


# ------------------------------------------------- paragraph-level dedup


def test_paragraph_dedup_planted(ray_session, tmp_path):
    """Keep-first at (doc_id, idx): a repeated paragraph survives only at
    its first occurrence — including WITHIN one doc; kept_text re-joins
    survivors in order; a doc of only stale paragraphs keeps ''. Matches
    the DuckDB oracle on the planted fixture."""
    import duckdb

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.webclean import paragraph_dedup

    boiler = "subscribe to our newsletter"
    texts = [
        "doc zero intro\n" + boiler + "\ndoc zero body",     # first owner
        boiler + "\nunique one\n" + boiler,                   # cross + self dup
        "self dup\nself dup\nself dup",                       # within-doc only
        boiler,                                               # all stale
        "wholly unique paragraph",                            # untouched
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    got = (
        paragraph_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert got.loc[0, "kept_text"] == texts[0]                # first owner intact
    assert int(got.loc[0, "n_dup_paragraphs"]) == 0
    assert got.loc[1, "kept_text"] == "unique one"            # both copies stale
    assert int(got.loc[1, "n_dup_paragraphs"]) == 2
    assert got.loc[2, "kept_text"] == "self dup"              # within-doc dedup
    assert int(got.loc[2, "n_dup_paragraphs"]) == 2
    assert got.loc[3, "kept_text"] == ""                      # nothing survives
    assert got.loc[4, "kept_text"] == texts[4]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.sql(ORACLE_SQL["paragraph_dedup"])
        .df()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert (got.to_numpy() == exp.to_numpy()).all()


def test_boilerplate_line_strip_planted(ray_session, tmp_path):
    """Global line-df strip: a line in >=3 DISTINCT docs vanishes from
    EVERY doc (first occurrence too, twice within one doc); a df=2 line
    survives; a within-doc-only repeat counts once toward df and
    survives; empty lines are kept as structure. Matches the DuckDB
    oracle on the planted fixture."""
    import duckdb

    from hg_dedup_ray.pipelines.oracles import ORACLE_SQL
    from hg_dedup_ray.pipelines.webclean import boilerplate_line_strip

    bp = "(c) example corp all rights reserved"
    duo = "subscribe now"
    texts = [
        "intro zero\n" + bp + "\nbody zero",          # one bp instance
        bp + "\n" + duo + "\n" + bp,                  # bp twice in one doc
        duo + "\n\nbody two\n" + bp,                  # empty line kept
        "self\nself\nself",                           # df=1 despite 3 copies
        bp,                                           # whole doc is boilerplate
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    got = (
        boilerplate_line_strip(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert got.loc[0, "kept_text"] == "intro zero\nbody zero"
    assert int(got.loc[0, "n_boilerplate_lines"]) == 1
    assert got.loc[1, "kept_text"] == duo                 # both bp copies gone
    assert int(got.loc[1, "n_boilerplate_lines"]) == 2
    assert got.loc[2, "kept_text"] == duo + "\n\nbody two"
    assert got.loc[3, "kept_text"] == texts[3]            # within-doc df=1
    assert got.loc[4, "kept_text"] == ""                  # fully stripped
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.sql(ORACLE_SQL["boilerplate_line_strip"])
        .df()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert (got[exp.columns].to_numpy() == exp.to_numpy()).all()


def test_incremental_near_dedup_supersets_exact(ray_session, tmp_path):
    """Any new doc whose text exactly matches a history doc shares ALL
    32 band buckets — the near-dup drop set must contain every exact
    cross-snapshot dup; unrelated new docs must be kept."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.webclean import incremental_near_dedup

    rng = np.random.default_rng(5)
    words = [f"t{i:03d}" for i in range(300)]
    base = " ".join(rng.choice(words, 60))
    texts = [
        base,                                   # 0 history
        base,                                   # 1 new: exact cross dup
        " ".join(rng.choice(words, 60)),        # 2 history
        None,                                   # 3 new: near variant of 2
        " ".join(rng.choice(words, 60)),        # 4 history
        " ".join(rng.choice(words, 60)),        # 5 new: unrelated
    ]
    texts[3] = texts[2][: len(texts[2]) - 10] + " extraword"
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    near = (
        incremental_near_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    )
    assert sorted(near.index) == [1, 3, 5]
    assert near.loc[1, "dropped"] and near.loc[1, "n_hit_bands"] == 32
    assert near.loc[3, "dropped"]  # near variant shares >= 1 band
    assert not near.loc[5, "dropped"] and near.loc[5, "n_hit_bands"] == 0
