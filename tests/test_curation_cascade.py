"""curation_cascade label semantics on a crafted fixture: the driver's
sf tables carry no exact duplicates, so the 'duplicate' tier is
vacuous there — this fixture plants survivors, duplicates of
survivors, lang failures, quality failures and double failures, and
checks the Ray result both directly and against the DuckDB oracle."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# 60 words, mean length in [3,10], all-alpha, contains stopword 'the'
GOOD = ("the quick brown fox jumps over many lazy dogs tonight " * 6).strip()
GOOD2 = ("the small green bird sings near tall oak trees daily " * 6).strip()
NO_STOP = ("zebra lion tiger puma otter heron crane finch robin wren " * 6).strip()
SHORT = "the cat"          # lang ok, fails Gopher word-count band
BOTH_BAD = "zz"            # fails lang AND quality -> labeled 'lang'

DOCS = [
    (0, GOOD),             # kept
    (1, GOOD),             # duplicate of 0
    (2, NO_STOP),          # lang
    (3, SHORT),            # quality
    (4, BOTH_BAD),         # lang (first failed tier)
    (5, GOOD2),            # kept
    (6, GOOD),             # duplicate of 0
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cascade_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_labels_and_keep(ray_session, fixture_dir):
    from hg_dedup_ray.pipelines.curation import curation_cascade

    df = (
        curation_cascade(fixture_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df["drop_stage"]) == [
        "kept", "duplicate", "lang", "quality", "lang", "kept", "duplicate",
    ]
    assert list(df["keep"]) == [True, False, False, False, False, True, False]
    assert (df["keep"] == (df["drop_stage"] == "kept")).all()


def test_matches_oracle_on_planted_duplicates(ray_session, fixture_dir):
    from hg_dedup_ray.tools.oracle_check import check_query

    r = check_query("curation_cascade", fixture_dir)
    assert r["status"] == "ok", r
    assert r["rows"] == len(DOCS)
