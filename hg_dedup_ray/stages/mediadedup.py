"""Media-payload dedup signatures: perceptual image hashing (aHash) and
audio PCM fingerprints over REAL decoded containers (StdCodec), plus the
banded-Hamming pair machinery those signatures feed.

This is the image/audio analogue of the text near-dup stack
(stages/simhash.py): an 8-byte signature per asset, computed from the
DECODED pixels / samples — not the container bytes — so re-encoded or
filter-shifted copies of the same content still collide.

Scale shape (the 100 TB contract):
- decode + signature stay inside the per-batch stage (payload-heavy
  rows, small batches); only ``(doc_id, u64 sig / band_key)`` 8-byte
  rows ever enter a shuffle — never payload bytes;
- the Hamming<=3 pair search reuses the 4x16-bit band pigeonhole
  (<=3 differing bits cannot touch all four bands), identical to
  ``simhash_near_dup_pairs`` — hot-band prefilter, groupby(band_key),
  within-bucket vectorized compare, lexsort pair-distinct.

aHash (average hash) per Krawetz's classic construction: grayscale,
8x8 area downsample, bit = block brighter than the mean block. Audio
fingerprint: 64 equal time windows over the mono PCM, bit = window
mean |amplitude| above the global window mean.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hg_dedup_ray.functions.minhash import _splitmix
from hg_dedup_ray.stages.multimodal import _make_codec


def ahash64(img: np.ndarray) -> np.uint64:
    """64-bit average-hash of a decoded (h, w[, c]) uint8 image.

    Grayscale = channel mean; the 8x8 downsample is an EXACT area mean
    via an integral image (any h, w >= 8; smaller axes are nearest-
    neighbor upsampled first), so the hash is independent of the
    source resolution — the property that makes it a perceptual dedup
    key rather than a byte hash."""
    gray = img.astype(np.float64)
    if gray.ndim == 3:
        gray = gray.mean(axis=2)
    for axis in (0, 1):
        if gray.shape[axis] < 8:
            idx = (np.arange(8) * gray.shape[axis]) // 8
            gray = np.take(gray, idx, axis=axis)
    h, w = gray.shape
    integ = np.zeros((h + 1, w + 1), np.float64)
    integ[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(9) * w) // 8
    sums = (
        integ[ye[1:, None], xe[None, 1:]]
        - integ[ye[:-1, None], xe[None, 1:]]
        - integ[ye[1:, None], xe[None, :-1]]
        + integ[ye[:-1, None], xe[None, :-1]]
    )
    areas = (ye[1:, None] - ye[:-1, None]) * (xe[None, 1:] - xe[None, :-1])
    blocks = sums / areas
    bits = (blocks > blocks.mean()).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little").view(np.uint64)[0]


def audio_fp64(pcm: np.ndarray) -> np.uint64:
    """64-bit energy-profile fingerprint of mono int16 PCM: 64 equal
    time windows, bit = window mean |amplitude| > mean over windows.
    Window sums come from one cumsum + edge differences (edges from
    integer arithmetic — no reduceat, so empty trailing windows are
    exactly zero, not clamped)."""
    n = pcm.shape[0]
    if n == 0:
        return np.uint64(0)
    absx = np.abs(pcm.astype(np.float64))
    c = np.concatenate(([0.0], np.cumsum(absx)))
    edges = (np.arange(65) * n) // 64
    wsum = c[edges[1:]] - c[edges[:-1]]
    wlen = np.maximum(np.diff(edges), 1)
    means = wsum / wlen
    bits = (means > means.mean()).astype(np.uint8)
    return np.packbits(bits, bitorder="little").view(np.uint64)[0]


def sig_band_rows(ids: np.ndarray, sigs: np.ndarray, sig_name: str) -> pa.Table:
    """One row per (doc, band): 4x16-bit bands of a u64 signature,
    band index salted into the key (disjoint keyspaces), splitmix-folded
    — the same LSH explode shape as stages/simhash.SimHashBandEmitter."""
    n = sigs.shape[0]
    bands = np.stack(
        [(sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)],
        axis=1,
    )
    keys = _splitmix(
        bands ^ (np.arange(4, dtype=np.uint64)[None, :] << np.uint64(48))
    ).reshape(-1)
    idx = np.repeat(np.arange(n), 4)
    return pa.table(
        {
            "band_key": pa.array(keys, pa.uint64()),
            "doc_id": pa.array(ids[idx], pa.int64()),
            sig_name: pa.array(sigs[idx], pa.uint64()),
        }
    )


class ImagePHashBands:
    """Stage: (doc_id, payload) -> (band_key, doc_id, phash) band rows.

    Decode (PNG/PPM via StdCodec) and aHash happen here, per batch;
    payload bytes never leave the stage. Constructed once per worker
    (pipelines use the _task_stage memo wrapper)."""

    def __init__(self):
        self.codec = _make_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"]
        n = len(batch)
        sigs = np.zeros(n, np.uint64)
        for i in range(n):  # per-row: payloads are opaque blobs
            sigs[i] = ahash64(self.codec.decode_image(pay[i].as_py()))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return sig_band_rows(ids, sigs, "phash")


class VideoFrameHashes:
    """Stage: (doc_id, payload) -> one row per DISTINCT frame hash:
    (doc_id, fhash, nframes) where fhash = aHash64 of the decoded frame
    and nframes = the doc's distinct-frame-hash count (carried on every
    row so the downstream Jaccard never needs a second sizes shuffle).

    Y4M decode + per-frame hashing happen here; a video leaves the stage
    as <= a dozen 24-byte rows regardless of payload size."""

    def __init__(self):
        self.codec = _make_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_ids: list[np.ndarray] = []
        out_fh: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for i in range(len(batch)):  # per-row: payloads are opaque blobs
            frames = self.codec.decode_video(pay[i].as_py())
            fh = np.unique(
                np.array([ahash64(f) for f in frames], np.uint64)
            )
            out_ids.append(np.full(fh.shape[0], ids[i], np.int64))
            out_fh.append(fh)
            out_n.append(np.full(fh.shape[0], fh.shape[0], np.int64))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "fhash": pa.array(
                    np.concatenate(out_fh) if out_fh else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "nframes": pa.array(
                    np.concatenate(out_n) if out_n else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )


class AudioFingerprint:
    """Stage: (doc_id, payload) -> (doc_id, audio_fp) — WAV decode +
    energy-profile fingerprint; 8 bytes per asset leave the stage."""

    def __init__(self):
        self.codec = _make_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"]
        n = len(batch)
        sigs = np.zeros(n, np.uint64)
        for i in range(n):
            _rate, pcm = self.codec.decode_audio(pay[i].as_py())
            sigs[i] = audio_fp64(pcm)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "audio_fp": pa.array(sigs, pa.uint64()),
            }
        )
