"""Edit-distance similarity join (queries.edit_distance_pairs).

Three layers: the banded-DP kernel against an independent O(n*m)
reference on random multibyte strings; the full cascade against a
brute-force sweep on a planted fixture that exercises every branch
(gram path, degenerate sentinel for short AND long-but-repetitive docs,
empty docs, multibyte edits, the length filter); and the above-limit
bucketed verify pinned equal to the broadcast path (house rule)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hg_dedup_ray.functions.editdist import (
    banded_levenshtein,
    char_counts,
    codepoints,
    reference_levenshtein,
)

SF0001 = "/root/testdata/sf0.001"


def _pack(strs):
    cps = [np.frombuffer(s.encode("utf-32-le"), np.uint32) for s in strs]
    buf = (
        np.concatenate(cps) if any(len(c) for c in cps) else np.empty(0, np.uint32)
    )
    lens = np.array([len(c) for c in cps], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1].astype(np.int64)
    return buf, starts, lens


def test_kernel_vs_reference_random():
    rng = np.random.default_rng(7)
    al = list("abcdé日🌍")
    pairs = []
    for _ in range(300):
        n = int(rng.integers(0, 40))
        a = "".join(rng.choice(al, n))
        b = list(a)
        for _ in range(int(rng.integers(0, 7))):
            op = rng.choice(list("ids"))
            if op == "i":
                b.insert(int(rng.integers(0, len(b) + 1)), str(rng.choice(al)))
            elif b and op == "d":
                b.pop(int(rng.integers(0, len(b))))
            elif b:
                b[int(rng.integers(0, len(b)))] = str(rng.choice(al))
        pairs.append((a, "".join(b)))
    for _ in range(80):  # unrelated pairs: distances far above the band
        pairs.append(
            (
                "".join(rng.choice(al, int(rng.integers(0, 30)))),
                "".join(rng.choice(al, int(rng.integers(0, 30)))),
            )
        )
    acp, ast, aln = _pack([p[0] for p in pairs])
    bcp, bst, bln = _pack([p[1] for p in pairs])
    for d in (1, 3, 8):
        got = banded_levenshtein(acp, ast, aln, bcp, bst, bln, d)
        for i, (a, b) in enumerate(pairs):
            ref = reference_levenshtein(a, b)
            assert got[i] == (ref if ref <= d else d + 1), (d, a, b)


def test_kernel_edges():
    a = ["", "", "abc", "xyzw", "same"]
    b = ["", "abc", "", "xyzw", "same"]
    acp, ast, aln = _pack(a)
    bcp, bst, bln = _pack(b)
    assert banded_levenshtein(acp, ast, aln, bcp, bst, bln, 3).tolist() == [0, 3, 3, 0, 0]
    # band proves only ">": |len diff| beyond d reports d+1
    assert banded_levenshtein(acp, ast, aln, bcp, bst, bln, 2).tolist() == [0, 3, 3, 0, 0]
    assert banded_levenshtein(acp, ast, aln, bcp, bst, bln, 1).tolist() == [0, 2, 2, 0, 0]


def test_kernel_empty_side_buffers():
    # whole b-side buffer empty while a is not (and vice versa)
    acp, ast, aln = _pack(["ab", "xyz", ""])
    bcp, bst, bln = _pack(["", "", ""])
    assert banded_levenshtein(acp, ast, aln, bcp, bst, bln, 3).tolist() == [2, 3, 0]
    assert banded_levenshtein(bcp, bst, bln, acp, ast, aln, 3).tolist() == [2, 3, 0]
    # at d=2 the 'xyz' pair is outside the band (|3-0| > 2): d+1 marker
    assert banded_levenshtein(acp, ast, aln, bcp, bst, bln, 2).tolist() == [2, 3, 0]


def test_chunked_hamming_kernel():
    from hg_dedup_ray.functions.editdist import chunked_hamming

    rng = np.random.default_rng(11)
    al = list("abcd日🌍")
    pairs = []
    for _ in range(200):
        n = int(rng.integers(0, 200))
        a = "".join(rng.choice(al, n))
        b = list(a)
        for _ in range(int(rng.integers(0, 12))):
            if b:
                b[int(rng.integers(0, len(b)))] = str(rng.choice(al))
        pairs.append((a, "".join(b)))
    # the kernel reads BOTH sides from one shared buffer via starts
    acp, ast, aln = _pack([p[0] for p in pairs])
    bcp, bst, _bln = _pack([p[1] for p in pairs])
    cp = np.concatenate([acp, bcp])
    bst = bst + len(acp)
    for k in (0, 3, 8, 64):
        got = chunked_hamming(cp, ast, bst, aln, k)
        for i, (a, b) in enumerate(pairs):
            hd = sum(x != y for x, y in zip(a, b))
            assert got[i] == (hd if hd <= k else k + 1), (k, a, b)


def _brute_hamming(sf_dir, k):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if len(texts[i]) != len(texts[j]):
                continue
            hd = sum(x != y for x, y in zip(texts[i], texts[j]))
            if hd <= k:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = hd
    return out


def test_hamming_pipeline_matches_bruteforce(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import edit_distance_pairs

    for k in (8, 64):
        df = edit_distance_pairs(sf, d=k, metric="hamming").to_pandas()
        got = {
            (int(r.doc_id_a), int(r.doc_id_b)): int(r.hamming_distance)
            for r in df.itertuples()
        }
        want = _brute_hamming(sf, k)
        assert got == want, k
    # the fixture hits each branch: clones (0), substitutions (1 and
    # 2), multibyte (2), empty-doc sentinel (0), chain hops (5)
    want8 = _brute_hamming(sf, 8)
    assert want8[(0, 4)] == 0 and want8[(0, 1)] == 1
    assert want8[(5, 6)] == 2 and want8[(7, 8)] == 0
    assert want8[(0, 45)] == 5 and (0, 2) not in want8  # insertions shift


def test_hamming_oracle_green_small_sf(ray_session):
    from hg_dedup_ray.tools.oracle_check import check_query

    r = check_query("hamming_distance_pairs", SF0001)
    assert r["status"] == "ok", r


def test_char_helpers_multibyte():
    s = ["héllo", "日本語テスト🌍", "", "x"]
    data = np.frombuffer("".join(s).encode("utf-8"), np.uint8)
    off = np.concatenate(
        ([0], np.cumsum([len(x.encode("utf-8")) for x in s]))
    ).astype(np.int64)
    assert char_counts(data, off).tolist() == [5, 7, 0, 1]
    cp, cpoff = codepoints(data, off)
    assert all(
        cp[cpoff[i] : cpoff[i + 1]].tobytes().decode("utf-32-le") == s[i]
        for i in range(len(s))
    )


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    rng = np.random.default_rng(123)
    words = [f"w{i:03d}" for i in range(200)]

    def salad(n):
        return " ".join(rng.choice(words, n))

    base = salad(40)  # ~200 chars: gram path (plenty of distinct grams)
    b1 = list(base)
    b1[17] = "Q"  # 1 substitution
    b5 = list(base)
    for k in (3, 40, 80, 120, 160):
        b5.insert(k, "#")  # 5 insertions
    b9 = list(base)
    for k in range(9):
        b9[10 + 7 * k] = "Z"  # 9 substitutions: just past d=8
    mb = "データ処理エンジン 重複除去 🌍 " * 4  # multibyte, gram path
    mb2 = list(mb)
    mb2[5] = "炎"
    mb2[30] = "火"  # 2 codepoint substitutions (byte delta is larger)
    rows = [
        (0, base),
        (1, "".join(b1)),  # ed 1
        (2, "".join(b5)),  # ed 5
        (3, "".join(b9)),  # ed 9  -> excluded at d=8
        (4, base),  # exact clone -> ed 0
        (5, mb),
        (6, "".join(mb2)),  # ed 2, multibyte
        (7, ""),  # empty
        (8, ""),  # empty clone -> ed 0
        (9, "short"),  # degenerate (too short for any gram)
        (10, "shor"),  # ed 1 to 9; both reach 7/8 within d too
        (11, "ab" * 120),  # long but 2 distinct grams: degenerate
        (12, "ab" * 120 + "x"),  # ed 1 to 11 (degenerate pair)
        (13, salad(40)),  # same-ish length as base, far away
        (14, base + " " + salad(5)),  # length filter: |delta| > d
    ]
    rows += [(15 + i, salad(20 + (i % 9))) for i in range(30)]
    # a revision CHAIN: ends are 10 edits apart (past d) but each hop is
    # 5 — the transitive-closure case edit_distance_clusters must join
    c1 = list(base)
    for k in (20, 50, 80, 110, 140):
        c1[k] = "@"
    c2 = list(c1)
    for k in (30, 60, 90, 120, 150):
        c2[k] = "%"
    rows += [(45, "".join(c1)), (46, "".join(c2))]
    # third clone of base: a 3-member family exercises the postlude's
    # intra-clone emit AND the member cross-expansion onto rep pairs
    rows += [(47, base)]
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([f"s{r[0] % 3}" for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("editdist")
    pq.write_table(tab, d / "documents.parquet")
    return str(d)


def _brute(sf_dir, d=8):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if abs(len(texts[i]) - len(texts[j])) > d:
                continue
            ed = reference_levenshtein(texts[i], texts[j])
            if ed <= d:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = ed
    return out


def _run(sf_dir, **kw):
    from hg_dedup_ray.pipelines.queries import edit_distance_pairs

    df = edit_distance_pairs(sf_dir, **kw).to_pandas()
    return {
        (int(r.doc_id_a), int(r.doc_id_b)): int(r.edit_distance)
        for r in df.itertuples()
    }


def test_pipeline_matches_bruteforce(ray_session, sf):
    got = _run(sf)
    want = _brute(sf)
    assert got == want
    # the fixture really exercises each branch
    assert (0, 4) in want and want[(0, 4)] == 0  # clone
    assert want[(0, 47)] == 0 and want[(4, 47)] == 0  # 3-member family
    assert want[(1, 47)] == want[(0, 1)]  # member inherits rep's pair
    assert want[(0, 1)] == 1 and want[(0, 2)] == 5  # gram path edits
    assert (0, 3) not in want  # 9 edits: past d
    assert want[(5, 6)] == 2  # multibyte
    assert want[(7, 8)] == 0 and want[(9, 10)] == 1  # degenerate path
    assert want[(11, 12)] == 1  # long-but-repetitive degenerate
    assert (0, 14) not in want  # length filter


def test_clusters_close_the_chain(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import edit_distance_clusters

    # reference: union-find over the brute-force pair graph
    pairs = _brute(sf)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    df = edit_distance_clusters(sf).to_pandas()
    got = dict(zip(df.doc_id.astype(int), df.cluster_id.astype(int)))
    assert got == want
    # the chain case: ends 10 edits apart share a cluster via the middle
    assert (0, 46) not in pairs and got[46] == got[0] == got[45]


def test_pressure_curve(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import edit_distance_pressure

    pairs = _brute(sf)
    df = edit_distance_pressure(sf).to_pandas().set_index("d")
    for t in (0, 4, 8):
        within = {(a, b): e for (a, b), e in pairs.items() if e <= t}
        assert df.loc[t, "n_pairs"] == len(within)
        assert df.loc[t, "n_dropped_docs"] == len({b for _, b in within})


def test_keep_first_apply(ray_session, sf):
    from hg_dedup_ray.pipelines.queries import edit_dedup_keep_first

    pairs = _brute(sf)
    drop = {b for _, b in pairs}
    t = pq.read_table(f"{sf}/documents.parquet")
    want = sorted(set(t["doc_id"].to_pylist()) - drop)
    df = edit_dedup_keep_first(sf).to_pandas()
    assert sorted(df.doc_id.astype(int)) == want
    kept = set(df.doc_id.astype(int))
    # the chain: 45 drops via partner 0, 46 via partner 45, 0 is first
    assert 0 in kept and 45 not in kept and 46 not in kept


def test_bucketed_equals_broadcast(ray_session, sf):
    want = _run(sf)
    # either gate alone must flip to the no-driver-collect path
    assert _run(sf, verify_broadcast_limit=1) == want
    assert _run(sf, pair_collect_limit=1) == want


def test_oracle_green_small_sf(ray_session):
    from hg_dedup_ray.tools.oracle_check import check_query

    r = check_query("edit_distance_pairs", SF0001)
    assert r["status"] == "ok", r
