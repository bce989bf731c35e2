"""VERDICT r03 #4: byte-exact oracle parity on multi-byte UTF-8.

Every hash/window oracle used to fold DuckDB CHARACTERS (ord/substr)
while the Ray side folds UTF-8 BYTES — identical on ASCII fixtures
only. The oracles now decode bytes via hex(encode(...)); this fixture
plants multi-byte text (Latin accents, CJK, emoji — where chars != bytes
everywhere) with real duplicate structure and runs the full driver
compare (tools/oracle_check) over the affected families.

Known remaining divergence (documented, excluded here): Unicode
WHITESPACE semantics — the Ray side splits on ASCII whitespace
(pc.ascii_split_whitespace) like the oracles' regexp '\\s+' (RE2 \\s is
ASCII), but utf8_trim_whitespace vs SQL trim() differ on exotic
whitespace codepoints, so the fixture uses ASCII separators only."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# the char-vs-byte-sensitive oracle families (VERDICT r03 wrong #4 list)
AFFECTED = [
    "window_dedup_apply",
    "window_dedup_report",
    "incremental_window_dedup",
    "window_ptr_report",
    "window_kept_gaps",
    "substring_decontaminate",
    "dedup_tier_cascade",
    "ngram_jaccard_exact_pairs",
    "ngram_containment_pairs",
    "edit_distance_pairs",
    "edit_distance_clusters",
    "edit_dedup_keep_first",
    "hamming_distance_pairs",
    "ngram_jaccard_pairs",
    "jaccard_dup_clusters",
    "containment_clusters",
    "minhash_clusters",
    "minhash_sig_rows",
    "minhash_band_clusters",
    "minhash_jaccard_estimate_pairs",
    "bbit_minhash_estimate_pairs",
    "simhash_sigs",
    "simhash_near_dup_pairs",
    "lsh_param_sweep",
    "lsh_recall_report",
    "dedup_pressure_curve",
    "incremental_near_dedup",
    "near_dedup_keep_first",
    "near_dedup_keep_longest",
    "near_dedup_keep_tiered",
    "dedup_drop_tiers",
    "dedup_aware_split",
    "split_leakage_report",
    "approx_distinct_kmv",
    "approx_distinct_hll",
    "approx_counts_cms",
    "hashed_classifier_score",
    "bloom_dedup_report",
]


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    rng = np.random.default_rng(23)
    # multi-byte vocabulary: 2-byte (Latin-1 sup, Greek), 3-byte (CJK),
    # 4-byte (emoji) — mixed with ASCII so byte != char offsets shift
    # mid-string, the regime where the old char-based oracles diverge
    vocab = (
        "café naïve Müller œuvre España 北京 東京 データ 重複 言語 模型 "
        "Ωμέγα αλφάβητο привет мир 🌍 🚀 数据 处理 引擎 zürich"
    ).split()
    def rand_text(n_words):
        return " ".join(rng.choice(vocab, n_words))

    block = " ".join(["重複データの定型文 boilerplate café 北京"] * 6)
    rows = []
    for i in range(12):
        rows.append((i, rand_text(10 + 3 * i) + " " + block + " " + rand_text(8 + i)))
    rows.append((12, block + " " + rand_text(40) + " " + block))
    rows.append((13, rows[3][1]))  # exact clone
    rows.append((14, rows[5][1]))  # exact clone
    for i in range(15, 40):
        rows.append((i, rand_text(25 + (i % 7) * 5)))
    # >= 16 bytes (the sig oracles' documented assumption); empty-doc
    # handling is pinned separately on the window family's own fixture
    rows.append((40, "短い文書 🌍 petit"))
    langs = ["zh", "el", "de", "ru", "fr"]
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([langs[r[0] % 5] for r in rows], pa.string()),
            "source": pa.array([f"s{r[0] % 3}" for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("nonascii")
    pq.write_table(tab, d / "documents.parquet")
    return str(d)


def test_fixture_is_truly_multibyte(sf):
    t = pq.read_table(f"{sf}/documents.parquet")
    texts = t["text"].to_pylist()
    assert any(len(s.encode()) > len(s) for s in texts)


@pytest.mark.parametrize("name", AFFECTED)
def test_nonascii_oracle_parity(ray_session, sf, name):
    from hg_dedup_ray.tools.oracle_check import check_query, duckdb_connection

    con = duckdb_connection(sf)
    r = check_query(name, sf, con)
    assert r["status"] == "ok", r
