"""Unit tests for the vectorized text-analysis kernels, including the
oracle-semantics regression: stopwords are whitespace-split TOKENS, not
regex word-boundary matches ('the,' and 'state-of-the-art' contain no
stopword token)."""

import duckdb
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
