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
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def test_image_roundtrip_and_features():
    b = mm.attach_payloads(_batch([1, 2, 3]), "image")
    out = mm.ImageFeatures()(b)
    assert out.column_names == [
        "doc_id", "width", "height", "channels", "mean_pixel", "payload_sha",
    ]
    assert all(8 <= w < 48 for w in out["width"].to_pylist())
    assert all(c == 3 for c in out["channels"].to_pylist())
    # determinism: same ids -> same features
    out2 = mm.ImageFeatures()(mm.attach_payloads(_batch([1, 2, 3]), "image"))
    assert out.equals(out2)


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
    assert all(0.01 < x < 0.2 for x in d)  # 256..2048 samples @16k
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
    # PIL is absent in this environment; _make_codec must yield the stub.
    if mm._have_pil():
        with pytest.raises(NotImplementedError):
            mm._make_codec()
    else:
        assert isinstance(mm._make_codec(), mm.FakeCodec)
