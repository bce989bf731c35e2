"""Multimodal (image/audio/video) column stages.

Design contract (the 100 TB shape): media ride as opaque ``binary``
columns with typed metadata columns next to them; decode / feature
extraction / resize / frame sampling are **actor-pool map_batches
stages** — codec/model state is constructed once per actor in
``__init__``, batches stay small because payloads are large.

Decode is REAL: payloads are standard container formats parsed by the
dependency-free ``StdCodec`` —

    image: real PNG (8-bit gray/RGB: chunk walk + CRC verify, zlib
           IDAT inflate, all five scanline filters un-applied) and
           binary PPM (``P6``, RGB) / PGM (``P5``, grayscale) — full
           header grammar (whitespace + ``#`` comments), netpbm spec
    audio: RIFF/WAVE, PCM 16-bit — proper chunk walk (fmt / data)
    video: YUV4MPEG2 (Y4M) mono — header params + FRAME-delimited planes

plus the round-1 synthetic wire formats (IMG0/AUD0/VID0 headers) kept
for back-compat. The payload synthesizers below emit the REAL formats,
built from each row's actual input bytes (the ``html`` column when
present, else utf-8 text), so every downstream feature depends on real
input AND real container parsing. PIL/libsndfile/pyav would only add
lossy-codec support (JPEG/MP3/H.264) — gated on import as before.
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


def ppm_bytes(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6); (h, w, 1)/(h, w) -> PGM (P5)."""
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
    else:
        magic = b"P5"
        pixels = pixels.reshape(pixels.shape[0], pixels.shape[1])
    h, w = pixels.shape[0], pixels.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def wav_bytes(pcm: np.ndarray, rate: int) -> bytes:
    """mono int16 PCM -> canonical 44-byte-header RIFF/WAVE file."""
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def y4m_bytes(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 -> YUV4MPEG2 stream (mono colourspace)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + frames[i].tobytes() for i in range(n))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(pixels: np.ndarray) -> bytes:
    """(h, w, 3)/(h, w, 1)/(h, w) uint8 -> real PNG (8-bit, filter 0 per
    scanline, one zlib IDAT). stdlib-only (zlib + struct)."""
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * c)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (spec 9.2). Sub/Up are fully
    vectorized (Sub is a per-residue-class cumsum); Average/Paeth fall
    back to a per-byte loop — rows are short and those filters only
    appear in foreign PNGs (our encoder emits filter 0)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: prefix sum per residue class mod 256
            for res in range(bpp):
                cur[res::bpp] = (
                    np.cumsum(cur[res::bpp], dtype=np.uint64) % 256
                ).astype(np.uint8)
        elif f == 2:  # Up
            cur += prev
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else cc)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
        out[r] = cur
        prev = cur
    return out


def image_payload(data: bytes) -> bytes:
    """Package REAL input bytes as a real image container: pixel plane =
    the bytes themselves, square-ish dims derived from the content
    length. Rows alternate container by a stable content property —
    even byte length -> PNG (zlib-compressed, CRC-checked), odd -> binary
    PPM — so the decode stage exercises BOTH real formats end to end."""
    c = 3
    side = int(np.clip(round((max(len(data), 1) / c) ** 0.5), 8, 64))
    pix = _tile_bytes(data, side * side * c).reshape(side, side, c)
    return png_bytes(pix) if len(data) % 2 == 0 else ppm_bytes(pix)


def audio_payload(data: bytes) -> bytes:
    """Input bytes reinterpreted as a 16 kHz mono 16-bit WAV file
    (256..4096 samples)."""
    n = int(np.clip(len(data) // 2, 256, 4096))
    pcm = _tile_bytes(data, n * 2).view("<i2")
    return wav_bytes(pcm, 16000)


def video_payload(data: bytes) -> bytes:
    """Input bytes as a Y4M stream of 16x12 grayscale frames (2..12
    frames by length)."""
    w, h = 16, 12
    n_frames = int(np.clip(-(-len(data) // (w * h)), 2, 12))
    frames = _tile_bytes(data, n_frames * w * h).reshape(n_frames, h, w)
    return y4m_bytes(frames)


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


def _pnm_header(payload: bytes):
    """Parse a netpbm binary header (P5/P6): returns (w, h, maxval,
    data_offset). Full grammar — any whitespace between tokens, ``#``
    comments to end-of-line."""
    pos = 2  # past magic
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos] == 0x23:  # '#' comment
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed netpbm header")
        vals.append(int(payload[start:pos]))
    # exactly ONE whitespace byte after maxval, per spec
    return vals[0], vals[1], vals[2], pos + 1


class StdCodec:
    """Dependency-free decoder for standard uncompressed containers:
    PPM/PGM images, RIFF/WAVE PCM audio, YUV4MPEG2 video — plus the
    legacy synthetic IMG0/AUD0/VID0 wire formats. A real deployment adds
    PIL / libsndfile / pyav alongside for LOSSY codecs; the surrounding
    actor stages do not change."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        if payload[:8] == _PNG_SIG:
            return self._decode_png(payload)
        magic = payload[:2]
        if magic in (b"P6", b"P5"):
            w, h, maxval, off = _pnm_header(payload)
            if maxval > 255:
                raise ValueError("16-bit netpbm not supported")
            c = 3 if magic == b"P6" else 1
            pix = np.frombuffer(payload, np.uint8, count=w * h * c, offset=off)
            return pix.reshape(h, w, c)
        if payload[:4] == b"IMG0":  # legacy synthetic format
            w, h, c = struct.unpack_from("<HHB", payload, 4)
            return np.frombuffer(payload, np.uint8, offset=9).reshape(h, w, c)
        raise ValueError("unsupported image container")

    @staticmethod
    def _decode_png(payload: bytes) -> np.ndarray:
        """Real PNG decode, stdlib-only: chunk walk with CRC verify,
        IHDR (8-bit, color type 0 grayscale / 2 RGB, no interlace),
        zlib-inflated IDAT concatenation, scanline un-filtering
        (all five spec filters via _png_unfilter)."""
        import zlib

        pos, n = 8, len(payload)
        w = h = depth = ctype = interlace = None
        idat = []
        while pos + 8 <= n:
            (size,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + size]
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
            if zlib.crc32(tag + body) != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + size
        if w is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        if depth != 8 or ctype not in (0, 2) or interlace:
            raise ValueError(
                "only 8-bit grayscale/RGB non-interlaced PNG supported"
            )
        c = 1 if ctype == 0 else 3
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
        stride = w * c
        if raw.shape[0] != h * (stride + 1):
            raise ValueError("PNG IDAT size mismatch")
        return _png_unfilter(raw, h, stride, c).reshape(h, w, c)

    def decode_audio(self, payload: bytes):
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            pos, n = 12, len(payload)
            rate, bits, channels, data = None, 16, 1, None
            while pos + 8 <= n:
                cid = payload[pos : pos + 4]
                (size,) = struct.unpack_from("<I", payload, pos + 4)
                body = payload[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                        "<HHIIHH", body, 0
                    )
                    if fmt_tag != 1 or bits != 16:
                        raise ValueError("only 16-bit PCM WAV supported")
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)  # chunks are word-aligned
            if rate is None or data is None:
                raise ValueError("WAV missing fmt/data chunk")
            pcm = np.frombuffer(data, "<i2")
            if channels > 1:
                pcm = pcm.reshape(-1, channels)[:, 0].copy()
            return int(rate), pcm
        if payload[:4] == b"AUD0":  # legacy synthetic format
            (rate,) = struct.unpack_from("<I", payload, 4)
            return rate, np.frombuffer(payload, np.int16, offset=8)
        raise ValueError("unsupported audio container")

    def decode_video(self, payload: bytes) -> np.ndarray:
        if payload[:9] == b"YUV4MPEG2":
            eol = payload.index(b"\n")
            w = h = None
            cspace = "420"
            for tok in payload[9:eol].split():
                if tok[:1] == b"W":
                    w = int(tok[1:])
                elif tok[:1] == b"H":
                    h = int(tok[1:])
                elif tok[:1] == b"C":
                    cspace = tok[1:].decode()
            if w is None or h is None:
                raise ValueError("Y4M missing W/H")
            if cspace == "mono":
                fsize = w * h
            elif cspace.startswith("420"):
                fsize = w * h * 3 // 2
            else:
                raise ValueError(f"Y4M colourspace {cspace} not supported")
            frames = []
            pos = eol + 1
            n = len(payload)
            while pos < n:
                feol = payload.index(b"\n", pos)
                if payload[pos : pos + 5] != b"FRAME":
                    raise ValueError("Y4M frame marker missing")
                plane = np.frombuffer(payload, np.uint8, count=fsize, offset=feol + 1)
                frames.append(plane[: w * h].reshape(h, w))  # luma plane
                pos = feol + 1 + fsize
            return np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
        if payload[:4] == b"VID0":  # legacy synthetic format
            w, h, nf = struct.unpack_from("<HHH", payload, 4)
            return np.frombuffer(payload, np.uint8, offset=10).reshape(nf, h, w)
        raise ValueError("unsupported video container")


# back-compat alias: round-1/2 name for the stand-in decoder; StdCodec
# now parses real containers, so the alias simply points at it
FakeCodec = StdCodec


def _make_codec():
    if _have_pil():  # pragma: no cover - env lacks PIL
        raise NotImplementedError(
            "lossy-codec (JPEG) support via PIL deliberately not "
            "wired in this environment; StdCodec handles the real "
            "containers (PNG, PPM/PGM, WAV, Y4M)"
        )
    return StdCodec()


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
                self.main_parts: list[str] = []
                self._in_title = False
                self._skip_depth = 0
                self._main_depth = 0

            def handle_starttag(self, tag, attrs):
                self.n_tags += 1
                if tag == "a" and any(k == "href" for k, _ in attrs):
                    self.n_links += 1
                if tag == "title":
                    self._in_title = True
                if tag in ("script", "style"):
                    self._skip_depth += 1
                if tag == "main":
                    self._main_depth += 1

            def handle_endtag(self, tag):
                if tag == "title":
                    self._in_title = False
                if tag in ("script", "style") and self._skip_depth:
                    self._skip_depth -= 1
                if tag == "main" and self._main_depth:
                    self._main_depth -= 1

            def handle_data(self, data):
                if self._in_title:
                    self.title += data
                elif not self._skip_depth:
                    self.text_parts.append(data)
                    if self._main_depth:
                        self.main_parts.append(data)

        outer._cls = P

    def parse(self, html_bytes: bytes):
        p = self._cls()
        p.feed(html_bytes.decode("utf-8", errors="replace"))
        return p


class HtmlMainText:
    """Actor stage: the M1 text-extraction step over REAL markup — pull
    the document text back out of each page's ``html:binary`` column
    (the text content of its <main> element, entities decoded by the
    stdlib parser). The north rule's per-row invariant is that this is
    byte-identical per url to the reference's extracted text; the
    webpages fixture embeds ``text`` escaped inside <main>, so
    ``queries.html_text_extract`` can assert exact byte equality at
    fleet scale. Parser class built once per actor."""

    def __init__(self):
        self.extract = _HtmlExtract()

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        out = []
        for hb in htmls:
            p = self.extract.parse(hb or b"")
            out.append("".join(p.main_parts))
        id_col = "url" if "url" in batch.column_names else "doc_id"
        cols = {id_col: batch[id_col], "extracted_text": pa.array(out, pa.string())}
        if "text" in batch.column_names:
            cols["text"] = batch["text"]
        return pa.table(cols)


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
            out.append(ppm_bytes(img[yi][:, xi]))
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
                payloads.append(ppm_bytes(frames[f]))  # grayscale -> PGM
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_ix": pa.array(frame_ix, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
