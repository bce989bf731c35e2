"""M2 tokenizer path (u16/u32 token corpora) + --reversed mode.

Reference: indexing_v6_sharded.py:205-218 (tokenizer init), 282-292
(token corpus layout, \\xff*itemsize doc separator), :49 (--reversed).
"""

import numpy as np
import pyarrow as pa
import pytest

from hg_dedup_ray.functions.tokenize import (
    BytePairTokenizer,
    ByteQuadTokenizer,
    get_tokenizer,
    reverse_doc_tokens,
    unreverse_ranges,
)
from hg_dedup_ray.stages.sa_scan import make_partition_scan


DUP = "The quick brown fox jumps over the lazy dog repeatedly and often. " * 4
DOCS = [
    "unique text one with nothing shared at all here apart from tiny bits. " + "x" * 40,
    DUP + " tail A unique suffix content here",
    "head B unique prefix content here " + DUP,
    "another fully unique document body with no repeats whatsoever inside. " + "y" * 40,
]


def _tab(docs=DOCS):
    return pa.table(
        {
            "url": [f"u{i}" for i in range(len(docs))],
            "doc_seq": pa.array(range(len(docs)), pa.int64()),
            "part": pa.array([0] * len(docs), pa.int32()),
            "text": docs,
            "n_bytes": pa.array([len(d.encode()) for d in docs], pa.int64()),
        }
    )


def _spans(t):
    return {
        t["url"][i].as_py(): list(
            zip(t["rr_starts"][i].as_py(), t["rr_ends"][i].as_py())
        )
        for i in range(len(t))
    }


# --- tokenizers -----------------------------------------------------------

@pytest.mark.parametrize("tok_cls", [BytePairTokenizer, ByteQuadTokenizer])
def test_builtin_tokenizers_invertible(tok_cls):
    tok = tok_cls()
    for s in [b"", b"a", b"hello world", "héllo wörld €".encode(), b"x" * 1001]:
        enc = tok.encode(s)
        assert enc.dtype == tok.dtype
        assert tok.decode(enc, len(s)) == s
        # valid UTF-8 can never produce the all-ones sentinel token
        if s:
            sent = (1 << (8 * np.dtype(tok.dtype).itemsize)) - 1
            assert not (enc == sent).any()


def test_hf_tokenizer_gated():
    with pytest.raises(NotImplementedError):
        get_tokenizer("gpt2")


def test_reverse_roundtrip():
    t = np.arange(7, dtype=np.uint16)
    assert (reverse_doc_tokens(reverse_doc_tokens(t)) == t).all()
    r = np.array([[1, 3], [5, 6]], np.int64)
    fwd = unreverse_ranges(r, 10)
    assert fwd.tolist() == [[4, 5], [7, 9]]


# --- partition scan modes -------------------------------------------------

def test_u8_forward_baseline():
    got = _spans(make_partition_scan(64)(_tab()))
    assert got["u0"] == [] and got["u3"] == []
    assert got["u1"] and got["u2"]  # self-repeats + cross-doc dup removed


@pytest.mark.parametrize(
    "dtype,tokname,minlen_tok",
    [("u16", "bytepair", 32), ("u32", "bytequad", 16)],
)
def test_token_mode_spans_nest_inside_u8_spans(dtype, tokname, minlen_tok):
    """Token-mode removal is SOUND but coarser than the byte scan: a repeat
    is only caught where its occurrences share token alignment (e.g. a
    66-byte period is invisible to 4-byte tokens except every 2nd copy).
    So every token-mode span must nest inside a u8 span (pad one token
    width for the clamped final token), and docs with dup content must
    still get flagged."""
    base = _spans(make_partition_scan(64)(_tab()))
    got = _spans(
        make_partition_scan(minlen_tok, token_dtype=dtype, tokenizer_name=tokname)(
            _tab()
        )
    )
    w = {"u16": 2, "u32": 4}[dtype]
    for u, spans in base.items():
        assert bool(got[u]) == bool(spans), (u, got[u], spans)
        for s1, e1 in got[u]:
            assert any(
                s0 - w <= s1 and e1 <= e0 + w for s0, e0 in spans
            ), (u, (s1, e1), spans)


def test_token_ranges_are_byte_offsets_within_doc():
    got = _spans(
        make_partition_scan(32, token_dtype="u16", tokenizer_name="bytepair")(_tab())
    )
    lens = {f"u{i}": len(d.encode()) for i, d in enumerate(DOCS)}
    for u, spans in got.items():
        for s, e in spans:
            assert 0 <= s < e <= lens[u]


def test_reversed_mode_forward_coordinates():
    """--reversed emits FORWARD byte ranges, sorted ascending per doc, and
    covers the same duplicated content (keep-choice may differ — the
    reference keeps first in reversed coordinate space)."""
    base = _spans(make_partition_scan(64)(_tab()))
    got = _spans(make_partition_scan(64, reverse=True)(_tab()))
    lens = {f"u{i}": len(d.encode()) for i, d in enumerate(DOCS)}
    for u, spans in got.items():
        assert spans == sorted(spans)
        for s, e in spans:
            assert 0 <= s < e <= lens[u]
        # same total removed volume per doc set (content is symmetric here)
    tot = lambda d: sum(e - s for sp in d.values() for s, e in sp)
    assert tot(got) == tot(base)


def test_reversed_token_mode_composes():
    got = _spans(
        make_partition_scan(
            32, token_dtype="u16", tokenizer_name="bytepair", reverse=True
        )(_tab())
    )
    assert got["u1"] and got["u2"] and got["u0"] == [] and got["u3"] == []


# --- mini-corpus scan parity ---------------------------------------------

@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"token_dtype": "u16", "tokenizer": "bytepair"},
        {"reverse": True},
    ],
)
def test_mini_corpus_scan_matches_partition_scan(kw):
    """GroupScanner's mini_corpus_scan must agree with the partition scan
    kernel in every mode (same corpus layout, same keep-first)."""
    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.stages.group_scan import mini_corpus_scan

    minlen = 32 if kw.get("token_dtype") == "u16" else 64
    cfg = DedupConfig(minlen=minlen, **kw)
    texts = [d.encode() for d in DOCS]
    got = mini_corpus_scan(texts, cfg)
    part = _spans(
        make_partition_scan(
            minlen, cfg.token_dtype, cfg.tokenizer, cfg.reverse
        )(_tab())
    )
    want = [
        (i, s, e)
        for i in range(len(DOCS))
        for s, e in part[f"u{i}"]
    ]
    assert got == want


# --- end-to-end through dedup_dataset ------------------------------------

def test_dedup_dataset_token_mode_e2e(ray_session, webpages_small):
    """Full pipeline (pruned scan path) in u16 token mode: runs, emits
    token-aligned byte ranges, and flags a superset-compatible subset of
    the byte-mode dup docs."""
    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    out_dir, paths, tags = webpages_small
    ds = ray.data.read_parquet(sorted(paths))
    base_cfg = DedupConfig(minlen=32, num_partitions=2, shingle_k=8,
                           jaccard_threshold=0.2)
    tok_cfg = DedupConfig(minlen=16, num_partitions=2, shingle_k=8,
                          jaccard_threshold=0.2, token_dtype="u16",
                          tokenizer="bytepair")
    base = {r["url"]: r["sa_remove_ranges"]
            for r in dedup_dataset(ds, base_cfg).take_all()}
    got = {r["url"]: r["sa_remove_ranges"]
           for r in dedup_dataset(ds, tok_cfg).take_all()}
    assert set(got) == set(base)
    flagged_base = {u for u, rr in base.items() if rr}
    flagged_tok = {u for u, rr in got.items() if rr}
    assert flagged_tok, "token mode found no duplicates at all"
    # token mode must not flag docs the byte scan considers clean
    assert flagged_tok <= flagged_base


def test_dedup_dataset_reversed_e2e(ray_session, webpages_small):
    import ray

    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    out_dir, paths, tags = webpages_small
    ds = ray.data.read_parquet(sorted(paths))
    cfg = DedupConfig(minlen=32, num_partitions=2, shingle_k=8,
                      jaccard_threshold=0.2, reverse=True)
    rows = dedup_dataset(ds, cfg).take_all()
    assert len(rows) == 120
    n_spans = sum(len(r["sa_remove_ranges"]) for r in rows)
    assert n_spans > 0
    for r in rows:
        nb = r["n_bytes"]
        prev = -1
        for sp in r["sa_remove_ranges"]:
            assert 0 <= sp["start"] < sp["end"] <= nb
            assert sp["start"] > prev
            prev = sp["start"]


# --- variable-width mini-BPE (the HF adapter surface, in CI) ---------------


def test_minibpe_roundtrip_and_merges():
    from hg_dedup_ray.functions.tokenize import MiniBPETokenizer

    tok = MiniBPETokenizer()
    data = "the cat and the dog are resting".encode()
    ids = tok.encode(data)
    assert ids.dtype == np.uint16
    # BPE actually merged: fewer tokens than characters
    assert ids.shape[0] < len(data.decode())
    assert tok.decode(ids, len(data)) == data
    # determinism
    assert (tok.encode(data) == ids).all()


def test_minibpe_offset_mapping_multibyte():
    """Every token's byte span must slice the utf-8 buffer to exactly
    that token's string — including across multi-byte chars (the char
    offset -> byte offset conversion the HF adapter relies on)."""
    from hg_dedup_ray.functions.tokenize import MiniBPETokenizer

    tok = MiniBPETokenizer()
    text = "the 中文 données and the énd"
    data = text.encode()
    ids = tok.encode(data)
    off = tok._offsets
    assert off.shape[0] == ids.shape[0]
    assert off[0, 0] == 0 and off[-1, 1] == len(data)
    for t in range(ids.shape[0]):
        s, e = int(off[t, 0]), int(off[t, 1])
        piece = data[s:e].decode()
        assert piece == tok._str_of.get(int(ids[t]), piece) or ids[t] == 0
    # token_range_to_bytes: full range covers the doc; clamping works
    assert tok.token_range_to_bytes(0, ids.shape[0], len(data)) == (0, len(data))
    s, e = tok.token_range_to_bytes(1, 3, len(data))
    assert data[s:e].decode() is not None and 0 < s < e <= len(data)
    assert tok.token_range_to_bytes(10**6, 10**6 + 1, len(data)) == (0, 0)


def test_minibpe_unknown_chars_lossy():
    from hg_dedup_ray.functions.tokenize import MiniBPETokenizer

    tok = MiniBPETokenizer()
    data = "ok 🌍 ok".encode()
    ids = tok.encode(data)
    assert (ids == tok.unk_id).sum() == 1
    out = tok.decode(ids, 10**9).decode()
    assert out == "ok � ok"


def test_get_tokenizer_minibpe_and_gate():
    from hg_dedup_ray.functions.tokenize import MiniBPETokenizer, get_tokenizer

    assert isinstance(get_tokenizer("minibpe"), MiniBPETokenizer)


def test_minibpe_heap_encode_matches_naive_greedy():
    """ADVICE r04: the O(n log n) heap+linked-list encode must be
    token- and offset-identical to the rescan-every-pair greedy loop
    it replaced, across random strings over the vocab (incl. repeats,
    multi-byte chars, unknowns) and the chain-merge words."""
    import numpy as np

    from hg_dedup_ray.functions.tokenize import MiniBPETokenizer

    tok_a, tok_b = MiniBPETokenizer(), MiniBPETokenizer()
    rng = np.random.default_rng(5)
    alphabet = list(" theandingisored.,!?é中·\x00abcxyz")
    cases = [
        "", " ", "the cat and the dog are ingesting things",
        "ththththe", "aaaa", "ananand", "ingingING ",
        "données 中文 data", "\x00\x01unknown\x02",
    ]
    for _ in range(60):
        cases.append("".join(rng.choice(alphabet, rng.integers(1, 160))))
    for s in cases:
        data = s.encode("utf-8")
        ids_a = tok_a.encode(data)
        off_a = tok_a._offsets.copy()
        ids_b = tok_b._encode_naive(data)
        off_b = tok_b._offsets.copy()
        assert np.array_equal(ids_a, ids_b), s
        assert np.array_equal(off_a, off_b), s
