"""Fixture-generator sanity + oracle expectations on injected patterns."""

import pyarrow.parquet as pq

from hg_dedup_ray.oracle import oracle_doc_ranges, oracle_dup_pairs
from hg_dedup_ray.sources.webpages import generate_webpages


def test_deterministic():
    t1, tags1 = generate_webpages(n_docs=80, seed=42, minlen=32)
    t2, tags2 = generate_webpages(n_docs=80, seed=42, minlen=32)
    assert t1.equals(t2)
    assert tags1 == tags2


def test_schema_and_utf8():
    t, _ = generate_webpages(n_docs=60, seed=42, minlen=32)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang", "doc_seq"]
    assert len(set(t["url"].to_pylist())) == 60
    for s in t["text"].to_pylist():
        s.encode("utf-8")  # valid round-trip


def test_patterns_against_oracle():
    minlen = 32
    t, tags = generate_webpages(n_docs=120, seed=42, minlen=minlen)
    texts = [s.encode("utf-8") for s in t["text"].to_pylist()]
    per_doc = oracle_doc_ranges(texts, minlen)
    covered = [sum(e - s for s, e in r) for r in per_doc]

    # exact dups: all but first occurrence almost fully covered (clip may trim)
    g = tags["exact_dup"]
    assert covered[g[0]] == 0 or covered[g[0]] < len(texts[g[0]])  # first kept
    for d in g[1:]:
        assert covered[d] >= len(texts[d]) - 4

    # negative control: sub-minlen block alone must cause no removal
    for d in tags["sub_minlen"]:
        # the block itself (minlen-1) can't form a run; doc may still overlap
        # other patterns only if tagged — these docs are otherwise unique
        others = {x for k, v in tags.items() if k != "sub_minlen" for x in v}
        if d not in others:
            assert covered[d] == 0, d

    # shared substrings: doc_seq-first keeps, others covered >= minlen-ish
    for key in ["shared_substring_d0", "shared_substring_d1"]:
        docs = sorted(tags[key])
        for d in docs[1:]:
            assert covered[d] > 0

    # dup pairs include the cross-partition pair
    pairs = oracle_dup_pairs(texts, minlen)
    cp = tags["cross_partition"]
    assert any(a == cp[0] and b == cp[1] for a, b in pairs)


def test_write_fragments(tmp_path):
    from hg_dedup_ray.sources.webpages import write_webpages

    paths, _ = write_webpages(str(tmp_path), n_docs=50, seed=1, minlen=32, n_files=5)
    assert len(paths) == 5
    total = sum(pq.read_table(p).num_rows for p in paths)
    assert total == 50
    seqs = []
    for p in sorted(paths):
        seqs.extend(pq.read_table(p)["doc_seq"].to_pylist())
    assert seqs == list(range(50))
