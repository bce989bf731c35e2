"""Unit tests for the vectorized text-analysis kernels, including the
oracle-semantics regression: stopwords are whitespace-split TOKENS, not
regex word-boundary matches ('the,' and 'state-of-the-art' contain no
stopword token)."""

import duckdb
import numpy as np
import pyarrow as pa

from hg_dedup_ray.stages.textstats import (
    EN_STOPWORDS,
    lang_id,
    quality_stats,
    token_stats,
)

TEXTS = [
    "the cat sat",                    # 1 stopword token ('the')
    "the, cat sat",                   # 'the,' is not a stopword token
    "state-of-the-art stuff",         # hyphen-joined: no stopword token
    "  a  of the  ",                  # leading/trailing ws; 3 stopwords
    "",                               # empty
    "THE A",                          # case-sensitive like the oracle
    "a",                              # single stopword, no whitespace
]


def _batch():
    return pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})


def test_stopword_token_semantics_match_duckdb():
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    con = duckdb.connect()
    df = _batch().to_pandas()
    con.register("d", df)
    want = con.execute(
        rf"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                   AS n_words,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x IN ({stops}))) AS n_stopwords,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   AS n_alpha_chars
        FROM d ORDER BY doc_id
        """
    ).df()
    got = quality_stats(_batch()).to_pandas().sort_values("doc_id")
    for c in ("n_words", "n_stopwords", "n_alpha_chars"):
        assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c


def test_lang_id_uses_token_semantics():
    got = lang_id(_batch()).to_pandas()
    preds = dict(zip(got["doc_id"], got["lang_pred"]))
    assert preds[0] == "en"
    assert preds[1] == "und"  # 'the,' must not count
    assert preds[2] == "und"  # 'state-of-the-art' must not count
    assert preds[3] == "en"
    assert preds[4] == "und"
    assert preds[5] == "und"  # case-sensitive
    assert preds[6] == "en"


def test_token_stats_basic():
    got = token_stats(_batch()).to_pandas()
    assert list(got["n_tokens"]) == [3, 3, 2, 3, 0, 2, 1]


# ----------------------------------------------------- repetition_stats


def test_repetition_stats_brute_force(ray_session, tmp_path):
    from collections import Counter

    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import repetition_stats

    texts = [
        "a a a b",             # top word 3x, bigram 'a a' 2x
        "x",                   # single word: no bigrams
        "",                    # empty
        "   ",                 # whitespace-only
        "ab ab cd cd ab",      # mixed repeats
        "  lead trail  ",      # trimming
        "one two one two one", # bigram 'one two' 2x
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        repetition_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for i, t in enumerate(texts):
        words = t.split()
        wc = Counter(words)
        bg = Counter(zip(words, words[1:]))
        row = got.iloc[i]
        assert row["n_words"] == len(words)
        assert row["n_distinct_words"] == len(wc)
        assert row["top_word_count"] == (max(wc.values()) if wc else 0)
        assert row["top_bigram_count"] == (max(bg.values()) if bg else 0)
        assert row["dup_word_chars"] == sum((c - 1) * len(w) for w, c in wc.items())
        assert row["total_word_chars"] == sum(len(w) for w in words)


def test_repetition_stats_trailing_empty_docs(ray_session, tmp_path):
    """Regression: a trailing zero-token (or zero-bigram) doc must not
    truncate the PRECEDING doc's segment max (_seg_max used to clamp the
    empty segment's start inside the previous segment)."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import repetition_stats

    texts = ["b a a", "x", "", "   "]  # nonempty, 1-word, empty, blank
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        repetition_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 0: word run lengths are [1 ('b'), 2 ('a')] -> top_word_count 2,
    # bigram counts all 1; the old clamp reported 1 here.
    assert got.iloc[0]["top_word_count"] == 2
    assert got.iloc[0]["top_bigram_count"] == 1
    assert got.iloc[1]["top_word_count"] == 1
    assert got.iloc[1]["top_bigram_count"] == 0
    assert list(got["n_words"]) == [3, 1, 0, 0]


def test_seg_max_trailing_empty_segments():
    from hg_dedup_ray.pipelines.queries import _seg_max

    assert list(_seg_max(np.array([1, 2]), np.array([0, 0]), 2)) == [2, 0]
    assert list(_seg_max(np.array([3, 1, 5, 4]), np.array([0, 0, 2, 2]), 4)) == [
        3, 0, 5, 0,
    ]
    assert list(_seg_max(np.array([], np.int64), np.array([], np.int64), 2)) == [0, 0]


# -------------------------------------------------- dup_ngram_coverage


def test_dup_ngram_coverage_brute_force(ray_session, tmp_path):
    """Coverage union vs a pure-Python re-derivation: for n=3, a word
    position is covered iff it lies inside an occurrence of a trigram
    seen >= 2 times in the same doc; covered occurrences OVERLAP (the
    difference-array union must not double count)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import dup_ngram_coverage

    texts = [
        "a b c a b c a b c",      # overlapping repeats of 'a b c'
        "x y z w",                # no repeated trigram
        "p q p q p q p q",        # 'p q p' and 'q p q' both repeat
        "",
        "   ",
        "one two",                # fewer than n words
        "s s s s s",              # same-word runs: every trigram is 's s s'
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        dup_ngram_coverage(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    n = 3
    for i, t in enumerate(texts):
        words = t.split()
        grams = [tuple(words[j : j + n]) for j in range(len(words) - n + 1)]
        gc = Counter(grams)
        covered = set()
        for j, g in enumerate(grams):
            if gc[g] >= 2:
                covered.update(range(j, j + n))
        row = got.iloc[i]
        assert row["n_words"] == len(words)
        assert row["covered_words"] == len(covered)
        assert row["covered_chars"] == sum(len(words[j]) for j in covered)
        assert row["total_word_chars"] == sum(len(w) for w in words)
    # the fixture must exercise BOTH covered and uncovered docs
    assert (got["covered_words"] > 0).any() and (got["covered_words"] == 0).any()


def test_hashed_classifier_score_pure_python(ray_session, tmp_path):
    """Score vs a pure-Python int reimplementation of the whole chain
    (Horner prefix8+length fold, splitmix64, 12-bit bucket, second
    splitmix for the weight) — independent of the numpy kernels."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.curation import hashed_classifier_score

    M = 1 << 64
    FNV = 1099511628211
    SM1, SM2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def splitmix(x: int) -> int:
        x = ((x ^ (x >> 30)) * SM1) % M
        x = ((x ^ (x >> 27)) * SM2) % M
        return x ^ (x >> 31)

    def tok_hash(w: str) -> int:
        h = 0
        b = w.encode()
        for j in range(8):
            h = (h * FNV + (b[j] if len(b) > j else 0)) % M
        h = (h * FNV + len(b)) % M
        return splitmix(h)

    def score(t: str) -> int:
        return sum(
            splitmix(tok_hash(w) % 4096) % 2001 - 1000 for w in t.split()
        )

    texts = ["the quick brown fox", "", "   ", "the the the", "zebra"]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        hashed_classifier_score(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for i, t in enumerate(texts):
        assert got.iloc[i]["n_tokens"] == len(t.split())
        assert got.iloc[i]["score"] == score(t)


def test_lang_id_confusion_totals(ray_session):
    from hg_dedup_ray.pipelines.queries import lang_id_confusion

    t = lang_id_confusion("/root/testdata/sf0.001").to_pandas()
    assert t["n_docs"].sum() == 500
    assert set(t["lang_pred"]) <= {"en", "und"}
    assert (t["n_docs"] > 0).all()
