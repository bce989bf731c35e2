"""Multimodal (image/audio/video) column stages.

Design contract (the 100 TB shape): media ride as opaque ``binary``
columns with typed metadata columns next to them; decode / feature
extraction / resize / frame sampling are **actor-pool map_batches
stages** — codec/model state is constructed once per actor in
``__init__``, batches stay small because payloads are large.

The image/audio codec libraries are not available in this environment,
so the decode step is STUBBED with a deterministic fake decoder
(``FakeCodec``) behind a capability gate: if PIL/soundfile were
importable they would be used; otherwise the stage still exercises the
real Ray plumbing (schema, actor signature, batch sizing, zero-copy
binary buffers) against deterministically synthesized payloads.

Payload wire format used by the synthesizer + fake codec (little-endian):

    image: b"IMG0" | u16 width | u16 height | u8 channels | pixel bytes
    audio: b"AUD0" | u32 sample_rate | i16 PCM samples
    video: b"VID0" | u16 width | u16 height | u16 n_frames | frame bytes
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def _have_pil() -> bool:
    try:  # pragma: no cover - PIL absent in this environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _tile_bytes(data: bytes, need: int) -> np.ndarray:
    """data cycled/truncated to exactly ``need`` bytes (uint8)."""
    if not data:
        data = b"\x00"
    src = np.frombuffer(data, dtype=np.uint8)
    return np.resize(src, need)


def image_payload(data: bytes) -> bytes:
    """Package REAL input bytes as an IMG0 payload: pixel plane = the
    bytes themselves, square-ish dims derived from the content length."""
    c = 3
    side = int(np.clip(round((max(len(data), 1) / c) ** 0.5), 8, 64))
    pix = _tile_bytes(data, side * side * c)
    return b"IMG0" + struct.pack("<HHB", side, side, c) + pix.tobytes()


def audio_payload(data: bytes) -> bytes:
    """Input bytes reinterpreted as 16 kHz i16 PCM (256..4096 samples)."""
    n = int(np.clip(len(data) // 2, 256, 4096))
    pcm = _tile_bytes(data, n * 2)
    return b"AUD0" + struct.pack("<I", 16000) + pcm.tobytes()


def video_payload(data: bytes) -> bytes:
    """Input bytes as 16x12 grayscale frames (2..12 frames by length)."""
    w, h = 16, 12
    n_frames = int(np.clip(-(-len(data) // (w * h)), 2, 12))
    frames = _tile_bytes(data, n_frames * w * h)
    return b"VID0" + struct.pack("<HHH", w, h, n_frames) + frames.tobytes()


def attach_payloads(batch: pa.Table, kind: str = "image") -> pa.Table:
    """map_batches fn: add a binary payload column built from the REAL
    input bytes of each row — the ``html`` binary column when present
    (the input_hint schema), else the utf-8 ``text`` bytes. The container
    format is synthetic (no real image/audio files exist in this
    environment) but the content is the row's actual data, so every
    downstream feature depends on real input."""
    pack = {"image": image_payload, "audio": audio_payload, "video": video_payload}[kind]
    if "html" in batch.column_names:
        datas = batch["html"].to_pylist()
    else:
        datas = [t.encode("utf-8") for t in batch["text"].to_pylist()]
    payloads = [pack(d if d is not None else b"") for d in datas]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class FakeCodec:
    """Deterministic stand-in decoder for the wire formats above.

    A real deployment replaces this with PIL / libsndfile / pyav; the
    surrounding actor stages do not change.
    """

    def decode_image(self, payload: bytes):
        assert payload[:4] == b"IMG0", "not an IMG0 payload"
        w, h, c = struct.unpack_from("<HHB", payload, 4)
        pix = np.frombuffer(payload, dtype=np.uint8, offset=9)
        return pix.reshape(h, w, c)

    def decode_audio(self, payload: bytes):
        assert payload[:4] == b"AUD0", "not an AUD0 payload"
        (rate,) = struct.unpack_from("<I", payload, 4)
        pcm = np.frombuffer(payload, dtype=np.int16, offset=8)
        return rate, pcm

    def decode_video(self, payload: bytes):
        assert payload[:4] == b"VID0", "not a VID0 payload"
        w, h, n = struct.unpack_from("<HHH", payload, 4)
        frames = np.frombuffer(payload, dtype=np.uint8, offset=10)
        return frames.reshape(n, h, w)


def _make_codec():
    if _have_pil():  # pragma: no cover - real codec path, env lacks PIL
        raise NotImplementedError(
            "real PIL-backed codec deliberately not wired in this "
            "environment; FakeCodec exercises the identical plumbing"
        )
    return FakeCodec()


class _HtmlExtract(object):
    """stdlib html.parser subclass collecting tags / links / title /
    visible text (script+style excluded)."""

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.n_tags = 0
                self.n_links = 0
                self.title = ""
                self.text_parts: list[str] = []
                self._in_title = False
                self._skip_depth = 0

            def handle_starttag(self, tag, attrs):
                self.n_tags += 1
                if tag == "a" and any(k == "href" for k, _ in attrs):
                    self.n_links += 1
                if tag == "title":
                    self._in_title = True
                if tag in ("script", "style"):
                    self._skip_depth += 1

            def handle_endtag(self, tag):
                if tag == "title":
                    self._in_title = False
                if tag in ("script", "style") and self._skip_depth:
                    self._skip_depth -= 1

            def handle_data(self, data):
                if self._in_title:
                    self.title += data
                elif not self._skip_depth:
                    self.text_parts.append(data)

        outer._cls = P

    def parse(self, html_bytes: bytes):
        p = self._cls()
        p.feed(html_bytes.decode("utf-8", errors="replace"))
        return p


class HtmlFeatures:
    """Actor stage over the input's REAL ``html:binary`` column
    (input_hint schema): per page emit tag/link counts, title, and the
    visible-text-to-markup byte ratio. Parser class built once per actor
    (``__init__``); stdlib-only (html.parser) — no external deps."""

    def __init__(self):
        self.extract = _HtmlExtract()

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        n = len(htmls)
        n_tags = np.zeros(n, np.int64)
        n_links = np.zeros(n, np.int64)
        ratio = np.zeros(n, np.float64)
        titles = []
        for i, hb in enumerate(htmls):
            hb = hb or b""
            p = self.extract.parse(hb)
            n_tags[i] = p.n_tags
            n_links[i] = p.n_links
            text = "".join(p.text_parts)
            ratio[i] = (
                len(text.encode("utf-8")) / len(hb) if len(hb) else 0.0
            )
            titles.append(p.title.strip())
        id_col = "url" if "url" in batch.column_names else "doc_id"
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tags": pa.array(n_tags, pa.int64()),
                "n_links": pa.array(n_links, pa.int64()),
                "title": pa.array(titles, pa.string()),
                "text_ratio": pa.array(np.round(ratio, 6), pa.float64()),
            }
        )


class ImageFeatures:
    """Actor stage: binary image payloads -> typed feature columns.

    Codec state is built once per actor (``__init__``), batches should be
    small (payload-heavy rows): pass batch_size<=256 for real images.
    """

    def __init__(self):
        self.codec = _make_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"]
        n = len(batch)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        c = np.zeros(n, np.int32)
        mean = np.zeros(n, np.float64)
        sha = []
        for i in range(n):  # per-row: payloads are opaque blobs, not vectors
            buf = pay[i].as_py()
            img = self.codec.decode_image(buf)
            h[i], w[i], c[i] = img.shape
            mean[i] = float(img.mean())
            sha.append(hashlib.blake2b(buf, digest_size=8).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "channels": pa.array(c, pa.int32()),
                "mean_pixel": pa.array(mean, pa.float64()),
                "payload_sha": pa.array(sha, pa.string()),
            }
        )


class ImageResizer:
    """Actor stage: resize decoded images to (target, target) by nearest-
    neighbor sampling and re-emit as payload bytes (the pattern for a
    thumbnailing / normalization pass before model inference)."""

    def __init__(self, target: int = 16):
        self.codec = _make_codec()
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        t = self.target
        for i in range(len(batch)):
            img = self.codec.decode_image(batch["payload"][i].as_py())
            h, w, c = img.shape
            yi = (np.arange(t) * h // t).astype(np.int64)
            xi = (np.arange(t) * w // t).astype(np.int64)
            small = img[yi][:, xi]
            out.append(
                b"IMG0" + struct.pack("<HHB", t, t, c) + small.tobytes()
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([t] * len(batch), pa.int32()),
                "height": pa.array([t] * len(batch), pa.int32()),
            }
        )


class AudioFeatures:
    """Actor stage: PCM payloads -> duration / RMS / clipping stats."""

    def __init__(self):
        self.codec = _make_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        dur = np.zeros(n, np.float64)
        rms = np.zeros(n, np.float64)
        clip = np.zeros(n, np.float64)
        for i in range(n):
            rate, pcm = self.codec.decode_audio(batch["payload"][i].as_py())
            dur[i] = pcm.shape[0] / rate
            x = pcm.astype(np.float64)
            rms[i] = float(np.sqrt((x * x).mean())) if x.shape[0] else 0.0
            clip[i] = float((np.abs(pcm) >= 32000).mean()) if x.shape[0] else 0.0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "duration_s": pa.array(dur, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "clip_ratio": pa.array(clip, pa.float64()),
            }
        )


class FrameSampler:
    """Actor stage: video payloads -> one row per sampled frame (every
    ``stride``-th), frame re-encoded as an IMG0 payload — the decode ->
    flat_map-shaped explosion a video pipeline needs."""

    def __init__(self, stride: int = 4):
        self.codec = _make_codec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_ix, payloads = [], [], []
        for i in range(len(batch)):
            frames = self.codec.decode_video(batch["payload"][i].as_py())
            n, h, w = frames.shape
            did = batch["doc_id"][i].as_py()
            for f in range(0, n, self.stride):
                ids.append(did)
                frame_ix.append(f)
                payloads.append(
                    b"IMG0" + struct.pack("<HHB", w, h, 1) + frames[f].tobytes()
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_ix": pa.array(frame_ix, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
