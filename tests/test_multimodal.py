"""Multimodal stage tests: wire formats, decode stub, actor plumbing,
frame-sample explosion, and SimHash near-dup banding semantics."""

import numpy as np
import pyarrow as pa
import pytest

from hg_dedup_ray.stages import multimodal as mm
from hg_dedup_ray.stages.simhash import (
    SimHasher,
    batch_simhash,
    hamming64,
    simhash64,
)
from hg_dedup_ray.functions.arrow_utils import string_column_bytes


def _batch(ids):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                [f"document {i} content " * (3 + i % 5) for i in ids], pa.string()
            ),
        }
    )


def test_payload_carries_real_input_bytes():
    """Payload pixel plane must BE the row's bytes, not doc_id noise."""
    b = mm.attach_payloads(_batch([1]), "image")
    img = mm.FakeCodec().decode_image(b["payload"][0].as_py())
    text_bytes = b["text"][0].as_py().encode("utf-8")
    assert bytes(img.reshape(-1)[: len(text_bytes)]) == text_bytes


def test_payload_prefers_html_column():
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["visible"], pa.string()),
            "html": pa.array([b"<html>real markup bytes here</html>" * 4], pa.binary()),
        }
    )
    b = mm.attach_payloads(tbl, "image")
    img = mm.FakeCodec().decode_image(b["payload"][0].as_py())
    assert bytes(img.reshape(-1)[:5]) == b"<html"


def test_image_roundtrip_and_features():
    b = mm.attach_payloads(_batch([1, 2, 3]), "image")
    out = mm.ImageFeatures()(b)
    assert out.column_names == [
        "doc_id", "width", "height", "channels", "mean_pixel", "payload_sha",
    ]
    assert all(8 <= w <= 64 for w in out["width"].to_pylist())
    assert all(c == 3 for c in out["channels"].to_pylist())
    # determinism: same rows -> same features; different text -> different sha
    out2 = mm.ImageFeatures()(mm.attach_payloads(_batch([1, 2, 3]), "image"))
    assert out.equals(out2)
    assert len(set(out["payload_sha"].to_pylist())) == 3


def test_image_resize():
    b = mm.attach_payloads(_batch([5, 6]), "image")
    out = mm.ImageResizer(target=8)(b)
    codec = mm.FakeCodec()
    for i in range(2):
        img = codec.decode_image(out["payload"][i].as_py())
        assert img.shape == (8, 8, 3)


def test_audio_features():
    b = mm.attach_payloads(_batch([10, 11]), "audio")
    out = mm.AudioFeatures()(b)
    d = out["duration_s"].to_pylist()
    assert all(0.01 < x < 0.3 for x in d)  # 256..4096 samples @16k
    assert all(r > 0 for r in out["rms"].to_pylist())


def test_frame_sampler_explodes():
    b = mm.attach_payloads(_batch([20]), "video")
    codec = mm.FakeCodec()
    n_frames = codec.decode_video(b["payload"][0].as_py()).shape[0]
    out = mm.FrameSampler(stride=2)(b)
    assert len(out) == (n_frames + 1) // 2
    assert out["frame_ix"].to_pylist() == list(range(0, n_frames, 2))
    img = codec.decode_image(out["payload"][0].as_py())
    assert img.shape == (12, 16, 1)


def test_html_features_parses_real_markup():
    html = (
        b"<!DOCTYPE html><html><head><title>My Page</title>"
        b"<script>var x=1;</script></head>"
        b'<body><nav><a href="/a">A</a><a href="/b">B</a></nav>'
        b"<p>hello &amp; goodbye</p></body></html>"
    )
    tbl = pa.table(
        {"url": pa.array(["u1"], pa.string()), "html": pa.array([html], pa.binary())}
    )
    out = mm.HtmlFeatures()(tbl)
    assert out["title"][0].as_py() == "My Page"
    assert out["n_links"][0].as_py() == 2
    assert out["n_tags"][0].as_py() >= 8
    r = out["text_ratio"][0].as_py()
    assert 0 < r < 0.5
    # script content must be excluded from visible text ratio
    html2 = html.replace(b"var x=1;", b"var x=1;" * 50)
    tbl2 = pa.table(
        {"url": pa.array(["u2"], pa.string()), "html": pa.array([html2], pa.binary())}
    )
    out2 = mm.HtmlFeatures()(tbl2)
    assert out2["text_ratio"][0].as_py() < r


def test_html_features_on_webpages_fixture():
    from hg_dedup_ray.sources.webpages import generate_webpages

    table, _ = generate_webpages(n_docs=40, seed=42, minlen=64)
    out = mm.HtmlFeatures()(table.select(["url", "html"]))
    assert len(out) == 40
    assert all(t > 0 for t in out["n_tags"].to_pylist())
    assert all(t for t in out["title"].to_pylist())
    assert all(0 < r < 1 for r in out["text_ratio"].to_pylist())


# ------------------------------------------------------------------ simhash
def test_batch_simhash_matches_per_doc():
    texts = ["hello world " * 5, "completely different text!", "x", ""]
    col = pa.chunked_array([pa.array(texts)])
    buf, offsets = string_column_bytes(col)
    got = batch_simhash(buf, offsets, 8)
    for d, t in enumerate(texts):
        want = simhash64(np.frombuffer(t.encode(), dtype=np.uint8), 8)
        assert got[d] == want, (d, t)


def test_simhash_near_dups_are_hamming_close():
    base = "the quick brown fox jumps over the lazy dog. " * 10
    near = base.replace("lazy", "very lazy", 1)  # single small edit
    far = "completely unrelated content about suffix arrays and parquet files. " * 8
    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([base, near, far])}
    )
    out = SimHasher(8)(tbl)
    sigs = out["simhash"].to_numpy(zero_copy_only=False)
    d01 = int(hamming64(np.array([sigs[0]]), np.array([sigs[1]]))[0])
    d02 = int(hamming64(np.array([sigs[0]]), np.array([sigs[2]]))[0])
    assert d01 < d02
    assert d01 <= 6


def test_real_codec_gate_documented():
    # PIL is absent in this environment; _make_codec must yield StdCodec
    # (real uncompressed-container parsing; PIL would only add lossy).
    if mm._have_pil():
        with pytest.raises(NotImplementedError):
            mm._make_codec()
    else:
        assert isinstance(mm._make_codec(), mm.StdCodec)


# ----------------------------------------------------------- real containers
def test_payloads_are_real_standard_containers():
    b = mm.attach_payloads(_batch([1]), "image")
    # even content length -> PNG, odd -> binary PPM (both real containers)
    p0 = b["payload"][0].as_py()
    assert p0[:8] == mm._PNG_SIG or p0[:2] == b"P6"
    b = mm.attach_payloads(_batch([1]), "audio")
    p = b["payload"][0].as_py()
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    b = mm.attach_payloads(_batch([1]), "video")
    assert b["payload"][0].as_py()[:9] == b"YUV4MPEG2"


def test_ppm_header_grammar_with_comments():
    """StdCodec must parse the full netpbm grammar, not just our writer's
    layout: comments and arbitrary whitespace between header tokens."""
    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    crafted = b"P6 # a comment\n  3\t2 # another\n 255\n" + pix.tobytes()
    img = mm.StdCodec().decode_image(crafted)
    assert img.shape == (2, 3, 3)
    assert (img == pix).all()
    # PGM grayscale
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert (mm.StdCodec().decode_image(mm.ppm_bytes(g)) == g[..., None]).all()


def test_wav_chunk_walk_and_extra_chunks():
    pcm = (np.arange(100) * 300 % 20000 - 10000).astype(np.int16)
    wav = mm.wav_bytes(pcm, 8000)
    rate, got = mm.StdCodec().decode_audio(wav)
    assert rate == 8000 and (got == pcm).all()
    # a LIST chunk between fmt and data (real WAVs have these)
    import struct as st
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    extra = b"LIST" + st.pack("<I", 4) + b"INFO"
    data = pcm.tobytes()
    crafted = (
        b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + len(extra) + 8 + len(data))
        + b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + extra + b"data" + st.pack("<I", len(data)) + data
    )
    rate, got = mm.StdCodec().decode_audio(crafted)
    assert rate == 8000 and (got == pcm).all()


def test_y4m_roundtrip_and_c420():
    frames = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 4, 6)
    got = mm.StdCodec().decode_video(mm.y4m_bytes(frames))
    assert (got == frames).all()
    # C420 stream: luma plane extracted, chroma skipped
    w, h = 6, 4
    luma = frames[0]
    chroma = np.zeros(w * h // 2, np.uint8)
    stream = (
        f"YUV4MPEG2 W{w} H{h} F25:1 C420jpeg\n".encode()
        + b"FRAME\n" + luma.tobytes() + chroma.tobytes()
    )
    got = mm.StdCodec().decode_video(stream)
    assert got.shape == (1, 4, 6)
    assert (got[0] == luma).all()


def test_codec_rejects_unknown_containers():
    c = mm.StdCodec()
    with pytest.raises(ValueError):
        c.decode_image(b"GIF89a....")
    with pytest.raises(ValueError):
        c.decode_audio(b"OggS....")
    with pytest.raises(ValueError):
        c.decode_video(b"\x00\x00\x00\x20ftypmp42")


def test_png_roundtrip_gray_and_rgb():
    from hg_dedup_ray.stages.multimodal import StdCodec, png_bytes

    rng = np.random.default_rng(3)
    codec = StdCodec()
    for shape in [(12, 17, 3), (9, 5, 1)]:
        pix = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = codec.decode_image(png_bytes(pix))
        assert out.shape == shape
        assert (out == pix).all()


def test_png_foreign_filters_unapplied():
    """A PNG written with Sub/Up/Average/Paeth filters (as a real encoder
    would emit) decodes to the same pixels as the filter-0 encoding."""
    import struct
    import zlib

    from hg_dedup_ray.stages.multimodal import _PNG_SIG, StdCodec

    rng = np.random.default_rng(5)
    h, w, c = 6, 7, 3
    pix = rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)
    stride = w * c
    flat = pix.reshape(h, stride).astype(np.int64)
    lines = []
    prev = np.zeros(stride, np.int64)
    for r in range(h):
        f = [1, 2, 3, 4, 0, 4][r]
        cur = flat[r]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = np.empty(stride, np.int64)
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
        elif f == 4:
            enc = np.empty(stride, np.int64)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else cc)
                enc[i] = (cur[i] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    out = StdCodec().decode_image(png)
    assert (out == pix).all()


def test_png_crc_rejected():
    import pytest as _pytest

    from hg_dedup_ray.stages.multimodal import StdCodec, png_bytes

    png = bytearray(png_bytes(np.zeros((4, 4, 3), np.uint8)))
    png[40] ^= 0xFF  # corrupt inside IDAT
    with _pytest.raises(ValueError):
        StdCodec().decode_image(bytes(png))


def test_image_payload_mixes_png_and_ppm():
    from hg_dedup_ray.stages.multimodal import _PNG_SIG, StdCodec, image_payload

    even, odd = image_payload(b"ab"), image_payload(b"abc")
    assert even[:8] == _PNG_SIG
    assert odd[:2] == b"P6"
    codec = StdCodec()
    assert codec.decode_image(even).ndim == 3
    assert codec.decode_image(odd).ndim == 3


# ---------------------------------------------------------- media dedup


def test_ahash_resolution_independent_and_sensitive():
    from hg_dedup_ray.stages.mediadedup import ahash64

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    h0 = ahash64(base)
    # exact 4x nearest-neighbor upscale preserves every 8x8 block mean
    up = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
    assert ahash64(up) == h0
    # identical content -> identical hash
    assert ahash64(base.copy()) == h0
    # inversion flips (almost) every brighter-than-mean bit
    assert hamming64(np.uint64(h0), ahash64(255 - base)) > 32
    # grayscale path (2-D input) works
    assert isinstance(ahash64(base.mean(axis=2).astype(np.uint8)), np.uint64)


def test_ahash_small_perturbation_small_hamming():
    """Flipping one block between two far-from-threshold levels flips
    exactly that block's bit (every block stays far from the global
    mean, so no borderline bit elsewhere can move)."""
    from hg_dedup_ray.stages.mediadedup import ahash64

    blocks = np.where(
        (np.arange(8)[:, None] + np.arange(8)[None, :]) % 2 == 0, 200, 50
    ).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 4, axis=0), 4, axis=1)
    h0 = ahash64(img)
    pert_blocks = blocks.copy()
    pert_blocks[0, 1] = 200  # one dark block -> bright
    pert = np.repeat(np.repeat(pert_blocks, 4, axis=0), 4, axis=1)
    assert hamming64(np.uint64(h0), ahash64(pert)) == 1


def test_audio_fp_deterministic():
    from hg_dedup_ray.stages.mediadedup import audio_fp64

    rng = np.random.default_rng(3)
    pcm = rng.integers(-30000, 30000, size=1777, dtype=np.int16)
    assert audio_fp64(pcm) == audio_fp64(pcm.copy())
    assert audio_fp64(np.zeros(100, np.int16)) == np.uint64(0)
    assert audio_fp64(np.array([], np.int16)) == np.uint64(0)
    other = rng.integers(-30000, 30000, size=1777, dtype=np.int16)
    assert audio_fp64(pcm) != audio_fp64(other)


def _drv_image_hashes(sf_dir):
    import pyarrow.parquet as pq

    from hg_dedup_ray.stages.mediadedup import ahash64
    from hg_dedup_ray.stages.multimodal import StdCodec, image_payload

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    codec = StdCodec()
    ids = t["doc_id"].to_numpy()
    sigs = np.array(
        [
            ahash64(codec.decode_image(image_payload(s.encode("utf-8"))))
            for s in t["text"].to_pylist()
        ],
        np.uint64,
    )
    return ids, sigs


def test_image_phash_near_dup_matches_bruteforce(ray_session):
    """The banded pair search is EXACT at radius 3 (pigeonhole): its
    output must equal the all-pairs Hamming<=3 scan."""
    from hg_dedup_ray.pipelines.queries import image_phash_near_dup

    sf = "/root/testdata/sf0.001"
    got = image_phash_near_dup(sf).to_pandas()
    got_set = {
        (min(a, b), max(a, b), h)
        for a, b, h in zip(got["doc_id_a"], got["doc_id_b"], got["hamming"])
    }
    ids, sigs = _drv_image_hashes(sf)
    ham = hamming64(sigs[:, None], sigs[None, :])
    ai, bi = np.nonzero(np.triu(ham <= 3, k=1))
    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]), ham[i, j])
        for i, j in zip(ai, bi)
    }
    assert got_set == want
    assert len(want) > 0  # fixture has exact text dups -> hamming-0 pairs


def test_audio_fingerprint_dedup_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import audio_fingerprint_dedup
    from hg_dedup_ray.stages.mediadedup import audio_fp64
    from hg_dedup_ray.stages.multimodal import StdCodec, audio_payload

    sf = "/root/testdata/sf0.001"
    got = audio_fingerprint_dedup(sf).to_pandas().sort_values("doc_id")
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    codec = StdCodec()
    fps = {}
    for d, s in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        _r, pcm = codec.decode_audio(audio_payload(s.encode("utf-8")))
        fps[int(d)] = int(audio_fp64(pcm))
    first = {}
    for d in sorted(fps):
        first.setdefault(fps[d], d)
    assert len(got) == len(fps)
    for d, fp, keep in zip(got["doc_id"], got["audio_fp"], got["keep"]):
        assert int(fp) == fps[int(d)]
        assert bool(keep) == (first[int(fp)] == int(d))


def test_audio_fingerprint_dedup_drops_planted_dups(ray_session, tmp_path):
    """With planted duplicate texts the keep-first actually fires: the
    min-doc_id copy keeps, every other copy drops."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import audio_fingerprint_dedup

    # random content per doc: distinct ENERGY PROFILES (near-identical
    # texts would rightly collapse to one perceptual fingerprint)
    rng = np.random.default_rng(5)
    texts = [
        bytes(rng.integers(32, 127, size=600, dtype=np.uint8)).decode("ascii")
        for _ in range(20)
    ]
    texts += [texts[3], texts[3], texts[7]]  # dup copies at ids 20,21,22
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        audio_fingerprint_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["keep"][:20].all()
    assert not got["keep"][20:].any()
    assert got["audio_fp"][20] == got["audio_fp"][3]


def _drv_video_sets(sf_dir):
    import pyarrow.parquet as pq

    from hg_dedup_ray.stages.mediadedup import ahash64
    from hg_dedup_ray.stages.multimodal import StdCodec, video_payload

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    codec = StdCodec()
    sets = {}
    for d, s in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        frames = codec.decode_video(video_payload(s.encode("utf-8")))
        sets[int(d)] = set(int(ahash64(f)) for f in frames)
    return sets


def test_video_framehash_near_dup_matches_bruteforce(ray_session):
    """The inverted-index frame-Jaccard is EXACT for threshold > 0 (any
    qualifying pair shares a frame hash, and shared hashes are hot by
    definition): output must equal the all-pairs set scan."""
    from hg_dedup_ray.pipelines.queries import video_framehash_near_dup

    sf = "/root/testdata/sf0.001"
    threshold = 0.5
    got = video_framehash_near_dup(sf, threshold=threshold).to_pandas()
    got_set = {
        (a, b, round(j, 9))
        for a, b, j in zip(got["doc_id_a"], got["doc_id_b"], got["jaccard"])
    }
    assert len(got) == len(got_set)  # no duplicate pair rows
    sets = _drv_video_sets(sf)
    ids = sorted(sets)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want.add((a, b, round(inter / union, 9)))
    assert got_set == want
    assert len(want) > 0  # fixture has exact text dups -> jaccard-1 pairs


def test_video_framehash_stop_frame_stays_exact(ray_session, tmp_path):
    """Stop-frame fixture: every doc shares frame 1 (common 192-byte
    prefix = one ubiquitous aHash), so the naive per-hash pair expansion
    would be quadratic in the corpus. The prefix-filtered cascade must
    still equal the brute-force set scan: non-dup pairs sharing ONLY the
    stop frame stay below threshold, true dup pairs survive."""
    import pyarrow.parquet as pq

    from hg_dedup_ray.pipelines.queries import video_framehash_near_dup

    rng = np.random.default_rng(11)
    common = bytes(rng.integers(32, 127, size=192, dtype=np.uint8)).decode()
    texts = [
        common
        + bytes(rng.integers(32, 127, size=3 * 192, dtype=np.uint8)).decode()
        for _ in range(40)
    ]
    texts += [texts[5], texts[9]]  # true dups at ids 40, 41
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    threshold = 0.5
    got = video_framehash_near_dup(str(tmp_path), threshold=threshold).to_pandas()
    got_set = {
        (a, b, round(j, 9))
        for a, b, j in zip(got["doc_id_a"], got["doc_id_b"], got["jaccard"])
    }
    assert len(got) == len(got_set)
    sets = _drv_video_sets(str(tmp_path))
    ids = sorted(sets)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want.add((a, b, round(inter / union, 9)))
    assert got_set == want
    assert {(a, b) for a, b, _ in want} == {(5, 40), (9, 41)}


def test_html_main_text_roundtrips_hostile_text():
    """<main>-embedded text must round-trip byte-identically through
    escape -> parse -> decode, including markup chars and multi-byte."""
    import html as _html

    t = 'a < b && "c" > d — 中文 🌍 \n line2  double  space'
    page = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<script>var x='<main>fake</main>';</script></head>"
        f"<body><nav><a href='/x'>n</a></nav><main>{_html.escape(t)}</main>"
        "<p>footer &amp; more</p></body></html>"
    ).encode()
    tbl = pa.table(
        {"url": pa.array(["u"], pa.string()), "html": pa.array([page], pa.binary())}
    )
    out = mm.HtmlMainText()(tbl)
    assert out["extracted_text"][0].as_py() == t


def test_webpages_fixture_main_invariant():
    """Every generated page's <main> text == its text column, bytes."""
    from hg_dedup_ray.sources.webpages import generate_webpages

    t, _ = generate_webpages(n_docs=50, seed=7, minlen=32)
    out = mm.HtmlMainText()(t.select(["url", "html", "text"]))
    ext = out["extracted_text"].to_pylist()
    txt = out["text"].to_pylist()
    assert all(a == b for a, b in zip(ext, txt))
