"""VERDICT r03 #3: the window keep-first family's above-limit path.

With ``broadcast_limit`` forced below the distinct-duplicated-window
count, ``_window_keepfirst_ctx`` must route through the bucketed pointer
Dataset (no driver first-key map) and every consumer must produce output
identical to the broadcast path on a planted high-dup fixture."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    """Planted high-dup corpus: a 200-byte boilerplate block pasted into
    many docs at different offsets (cross-doc window dups), one doc
    containing the block twice (in-doc dup + a two-island gap), exact
    clones, and clean docs."""
    rng = np.random.default_rng(11)

    def rand_text(n):
        return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))

    block = "THE LICENSE FOOTER " * 10  # 190 chars, ASCII
    rows = []
    for i in range(8):
        rows.append((i, rand_text(30 * (i + 1)) + block + rand_text(25 * i + 10)))
    # in-doc double occurrence separated by a wide gap
    rows.append((8, block + rand_text(400) + block))
    rows.append((9, rows[3][1]))  # exact clone of doc 3
    for i in range(10, 16):
        rows.append((i, rand_text(120 + 7 * i)))
    rows.append((16, ""))  # empty doc
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("window_bucketed")
    pq.write_table(tab, d / "documents.parquet")
    return str(d)


def _sorted_df(res):
    df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    return (
        df.reindex(sorted(df.columns), axis=1)
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("minlen", [24, 64])
def test_window_dedup_report_bucketed(ray_session, sf, minlen):
    from hg_dedup_ray.pipelines.queries import window_dedup_report

    broad = _sorted_df(window_dedup_report(sf, minlen=minlen))
    assert (broad["n_dup_windows"] > 0).any()  # fixture is non-vacuous
    bucketed = _sorted_df(
        window_dedup_report(sf, minlen=minlen, broadcast_limit=1)
    )
    assert broad.equals(bucketed)


def test_window_ptr_report_bucketed(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import window_ptr_report

    broad = _sorted_df(window_ptr_report(sf, minlen=64))
    assert len(broad) > 0
    bucketed = _sorted_df(window_ptr_report(sf, minlen=64, broadcast_limit=1))
    assert broad.equals(bucketed)


def test_window_kept_gaps_bucketed(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import window_kept_gaps

    broad = _sorted_df(window_kept_gaps(sf, minlen=24))
    assert len(broad) > 0  # the two-island doc guarantees >= 1 gap row
    bucketed = _sorted_df(window_kept_gaps(sf, minlen=24, broadcast_limit=1))
    assert broad.equals(bucketed)


def test_dedup_tier_cascade_bucketed(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import dedup_tier_cascade

    broad = _sorted_df(dedup_tier_cascade(sf, minlen=24))
    # the window tier must actually remove bytes on this fixture
    bb = broad.set_index("tier_no")["n_bytes"]
    assert int(bb[3]) < int(bb[2])
    bucketed = _sorted_df(dedup_tier_cascade(sf, minlen=24, broadcast_limit=1))
    assert broad.equals(bucketed)


def test_window_dedup_apply_bucketed(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import window_dedup_apply

    broad = _sorted_df(window_dedup_apply(sf, minlen=24))
    assert (broad["n_removed_ranges"] > 0).any()
    # every rebuilt text is valid UTF-8 shorter-or-equal to the original
    assert (broad["dedup_text"].str.len() >= 0).all()
    bucketed = _sorted_df(window_dedup_apply(sf, minlen=24, broadcast_limit=1))
    assert broad.equals(bucketed)


def test_window_dedup_apply_multibyte_clip(ray_session, tmp_path):
    """An island boundary landing mid-CJK-char must clip to whole chars
    (reference write_back semantics) — the excised output stays valid
    UTF-8 and the kept head/tail characters survive intact."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import window_dedup_apply

    block = "统一重复数据删除引擎" * 5  # 150 bytes of 3-byte chars
    rows = [
        (0, "head-" + block + "-tail"),
        (1, "pfx::" + block + "::sfx"),
    ]
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        window_dedup_apply(str(tmp_path), minlen=24)
        .to_pandas()
        .set_index("doc_id")
    )
    # the block repeats in-doc too, so BOTH docs lose their non-first
    # window occurrences; heads/tails (never duplicated) must survive
    for i, (head, tail) in enumerate((("head-", "-tail"), ("pfx::", "::sfx"))):
        assert int(got.loc[i, "n_removed_ranges"]) >= 1
        t = got.loc[i, "dedup_text"]
        t.encode("utf-8")  # valid UTF-8 (clip landed on char boundaries)
        assert t.startswith(head) and t.endswith(tail)
        assert len(t) < len(rows[i][1])
    # doc 1 keeps nothing the (earlier) doc 0 already kept of the block:
    # its removal is at least doc 0's
    assert int(got.loc[1, "removed_bytes"]) >= int(got.loc[0, "removed_bytes"])


def test_incremental_window_dedup_bucketed_and_history_priority(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import incremental_window_dedup

    broad = _sorted_df(incremental_window_dedup(sf, minlen=24, every=3))
    # history docs never appear; snapshot rows exist
    assert (broad["doc_id"] % 3 != 0).all() and len(broad) > 0
    assert (broad["n_dup_windows"] > 0).any()
    bucketed = _sorted_df(
        incremental_window_dedup(sf, minlen=24, every=3, broadcast_limit=1)
    )
    assert broad.equals(bucketed)


def test_incremental_window_history_wins_over_doc_order(ray_session, tmp_path):
    """A window whose FIRST in-doc-id-order occurrence is in the
    snapshot but which also exists in a LATER history doc must still be
    removed from the snapshot doc: history has priority, not doc order."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import incremental_window_dedup

    blk = "shared window payload " * 3  # 66 bytes > minlen
    tab = pa.table(
        {
            "doc_id": pa.array([1, 19], pa.int64()),  # 1 = snapshot, 19 = history
            "text": pa.array(["snap:" + blk, "hist:" + blk], pa.string()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    got = (
        incremental_window_dedup(str(tmp_path), minlen=24)
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(got.index) == [1]
    assert int(got.loc[1, "n_dup_windows"]) > 0
    assert int(got.loc[1, "removed_bytes"]) >= len(blk) - 4
