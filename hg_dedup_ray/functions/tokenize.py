"""Tokenizer path — the reference's u16/u32 token-dtype mode (M2).

Reference semantics (indexing_v6_sharded.py:205-218, 282-292): with
``--token_dtype u16|u32`` the corpus holds TOKEN ids instead of utf-8
bytes, the document sentinel is ``\\xff`` x itemsize (the all-ones token),
and the dedup scan compares/counts in token units. The reference's
tokenizers are HuggingFace gpt2/llama/olmo — unavailable offline in this
environment, so:

- ``HFTokenizer`` is the real adapter, gated behind an import-try of
  ``transformers`` (raises NotImplementedError here, documented); its
  offset-mapping surface is the shared ``CharOffsetTokenizer`` base,
  which ``MiniBPETokenizer`` (a vendored tiny character-level BPE with
  a checked-in vocab) runs end-to-end in CI;
- ``BytePairTokenizer`` (u16) / ``ByteQuadTokenizer`` (u32) are the
  deterministic, INVERTIBLE builtins that exercise the identical
  plumbing: fixed-width byte-group tokens, big-endian so token order ==
  byte order, ``0xFF..`` can never be produced from valid UTF-8 input so
  the sentinel stays unambiguous. Token<->byte offset mapping is exact
  (x itemsize), which lets the pipeline emit byte ranges from token-space
  scans.

``reverse_doc_tokens`` implements the reference's ``--reversed`` option
(indexing_v6_sharded.py:49): each doc's token sequence is reversed before
indexing; ranges found in reversed coordinates map back through
``unreverse_ranges``.
"""

from __future__ import annotations

import numpy as np

TOKEN_DTYPES = {"u8": np.uint8, "u16": np.uint16, "u32": np.uint32}


def token_dtype(name: str):
    return TOKEN_DTYPES[name]


class BytePairTokenizer:
    """u16 tokens = consecutive BYTE PAIRS (big-endian), final odd byte
    zero-padded. Deterministic, invertible given the original byte length.
    Token value 0xFFFF would require the byte pair (0xFF, 0xFF) — never
    produced by valid UTF-8 — so the u16 sentinel is safe."""

    dtype = np.uint16
    width = 2

    def encode(self, data: bytes) -> np.ndarray:
        n = len(data)
        if n == 0:
            return np.empty(0, np.uint16)
        pad = (-n) % 2
        b = np.frombuffer(data + b"\x00" * pad, np.uint8).reshape(-1, 2)
        return (
            (b[:, 0].astype(np.uint16) << np.uint16(8)) | b[:, 1].astype(np.uint16)
        )

    def decode(self, tokens: np.ndarray, n_bytes: int) -> bytes:
        out = np.empty((tokens.shape[0], 2), np.uint8)
        out[:, 0] = (tokens >> np.uint16(8)).astype(np.uint8)
        out[:, 1] = (tokens & np.uint16(0xFF)).astype(np.uint8)
        return out.reshape(-1)[:n_bytes].tobytes()

    def token_range_to_bytes(self, s: int, e: int, n_bytes: int) -> tuple[int, int]:
        return min(s * 2, n_bytes), min(e * 2, n_bytes)


class ByteQuadTokenizer:
    """u32 tokens = consecutive 4-byte groups (big-endian), zero-padded."""

    dtype = np.uint32
    width = 4

    def encode(self, data: bytes) -> np.ndarray:
        n = len(data)
        if n == 0:
            return np.empty(0, np.uint32)
        pad = (-n) % 4
        b = np.frombuffer(data + b"\x00" * pad, np.uint8).reshape(-1, 4)
        out = np.zeros(b.shape[0], np.uint32)
        for j in range(4):
            out = (out << np.uint32(8)) | b[:, j].astype(np.uint32)
        return out

    def decode(self, tokens: np.ndarray, n_bytes: int) -> bytes:
        out = np.empty((tokens.shape[0], 4), np.uint8)
        for j in range(4):
            out[:, j] = (tokens >> np.uint32(8 * (3 - j))).astype(np.uint8)
        return out.reshape(-1)[:n_bytes].tobytes()

    def token_range_to_bytes(self, s: int, e: int, n_bytes: int) -> tuple[int, int]:
        return min(s * 4, n_bytes), min(e * 4, n_bytes)


class CharOffsetTokenizer:
    """Shared machinery for VARIABLE-WIDTH tokenizers that report
    per-token CHARACTER spans (the HuggingFace fast-tokenizer
    ``offset_mapping`` contract): converts char spans to BYTE offsets
    for the last-encoded doc, and maps token ranges back to byte ranges
    through them. Subclasses implement ``encode`` and call
    ``_set_offsets_from_chars``; ``MiniBPETokenizer`` exercises this
    path in CI, ``HFTokenizer`` rides the identical code with real
    models installed."""

    width = None  # variable-width: byte mapping goes through offsets
    dtype = np.uint16

    def __init__(self) -> None:
        self._offsets: np.ndarray | None = None

    def _set_offsets_from_chars(
        self, text: str, spans: list[tuple[int, int]]
    ) -> None:
        # char offsets -> byte offsets for the last-encoded doc (the scan
        # calls encode then maps ranges of the same doc back immediately)
        char_to_byte = np.cumsum([0] + [len(c.encode("utf-8")) for c in text])
        self._offsets = np.array(
            [(char_to_byte[s], char_to_byte[e]) for s, e in spans],
            dtype=np.int64,
        ).reshape(-1, 2)

    def token_range_to_bytes(self, s: int, e: int, n_bytes: int) -> tuple[int, int]:
        off = self._offsets
        if off is None or off.shape[0] == 0 or s >= off.shape[0]:
            return 0, 0
        e = min(e, off.shape[0])
        return int(off[s, 0]), min(int(off[e - 1, 1]), n_bytes)


# Checked-in mini vocab: enough ASCII + a few multi-byte chars to run
# real BPE end-to-end in CI. Unknown chars tokenize to UNK (id 0) and
# decode to U+FFFD — the standard lossy-unknown convention.
_MINI_CHARS = (
    " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    ".,!?'\"-:;()éèüñç中文данные"
)
# merge rules in priority order (rank = position), GPT-2 merges.txt style
_MINI_MERGES = (
    ("t", "h"), ("th", "e"), ("the", " "), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("t", "o"), ("o", "u"),
    ("i", "s"), ("e", "d"), ("in", "g"), ("ing", " "), ("e", " "),
    ("s", " "), ("d", " "), ("t", " "), (",", " "), (".", " "),
    ("c", "h"), ("s", "t"), ("l", "l"), ("o", "o"), ("e", "a"),
)


class MiniBPETokenizer(CharOffsetTokenizer):
    """A real (tiny) character-level BPE with a checked-in vocab — the
    CI stand-in for the reference's gpt2/llama/olmo path: same greedy
    highest-priority-pair merge loop, same offset_mapping contract as a
    HF fast tokenizer, variable-width ids. Deterministic; ids fit u16
    and 0xFFFF is never produced, so the token-mode sentinel is safe."""

    def __init__(self) -> None:
        super().__init__()
        self.unk_id = 0
        self._id_of: dict[str, int] = {"<unk>": 0}
        for c in _MINI_CHARS:
            self._id_of[c] = len(self._id_of)
        self._ranks: dict[tuple[str, str], int] = {}
        for a, b in _MINI_MERGES:
            self._ranks[(a, b)] = len(self._ranks)
            self._id_of.setdefault(a + b, len(self._id_of))
        self._str_of = {i: s for s, i in self._id_of.items()}

    def encode(self, data: bytes) -> np.ndarray:
        """Greedy lowest-rank-first BPE via a heap over pair sites + a
        doubly-linked slot list — O(n log n) per doc (the r4 version
        rescanned every adjacent pair per merge, O(n^2); ADVICE r04).
        Exactly the greedy semantics: the heap orders (rank, position)
        so ties break leftmost, ranks are unique per pair so a stale
        heap entry can never alias a different pair, and each merge
        pushes only its two new neighbor sites."""
        import heapq

        text = data.decode("utf-8", errors="replace")
        n = len(text)
        if n == 0:
            self._set_offsets_from_chars(text, [])
            return np.empty(0, np.uint16)
        parts = list(text)
        s = list(range(n))
        e = [i + 1 for i in range(n)]
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(n - 1))
        alive = [True] * n
        ranks = self._ranks
        heap = [
            (r, i)
            for i in range(n - 1)
            if (r := ranks.get((parts[i], parts[i + 1]))) is not None
        ]
        heapq.heapify(heap)
        while heap:
            r, i = heapq.heappop(heap)
            if not alive[i]:
                continue
            j = nxt[i]
            if j == -1:
                continue
            if ranks.get((parts[i], parts[j])) != r:  # stale site
                continue
            parts[i] = parts[i] + parts[j]
            e[i] = e[j]
            alive[j] = False
            nj = nxt[j]
            nxt[i] = nj
            if nj != -1:
                prv[nj] = i
                r3 = ranks.get((parts[i], parts[nj]))
                if r3 is not None:
                    heapq.heappush(heap, (r3, i))
            p = prv[i]
            if p != -1:
                r2 = ranks.get((parts[p], parts[i]))
                if r2 is not None:
                    heapq.heappush(heap, (r2, p))
        keep = [k for k in range(n) if alive[k]]
        self._set_offsets_from_chars(text, [(s[k], e[k]) for k in keep])
        return np.array(
            [self._id_of.get(parts[k], self.unk_id) for k in keep], np.uint16
        )

    def _encode_naive(self, data: bytes) -> np.ndarray:
        """The O(n^2) rescan-every-pair greedy loop, kept as the
        semantics reference for the heap implementation's equivalence
        test (tests/test_token_mode.py)."""
        text = data.decode("utf-8", errors="replace")
        parts = list(text)
        spans = [(i, i + 1) for i in range(len(parts))]
        while len(parts) > 1:
            best_rank, best_pair = None, None
            for i in range(len(parts) - 1):
                r = self._ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (parts[i], parts[i + 1])
            if best_pair is None:
                break
            np_, ns, i = [], [], 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and (parts[i], parts[i + 1]) == best_pair
                ):
                    np_.append(parts[i] + parts[i + 1])
                    ns.append((spans[i][0], spans[i + 1][1]))
                    i += 2
                else:
                    np_.append(parts[i])
                    ns.append(spans[i])
                    i += 1
            parts, spans = np_, ns
        self._set_offsets_from_chars(text, spans)
        return np.array(
            [self._id_of.get(p, self.unk_id) for p in parts], np.uint16
        )

    def decode(self, tokens: np.ndarray, n_bytes: int) -> bytes:
        s = "".join(
            self._str_of.get(int(t), "�") for t in tokens
        ).replace("<unk>", "�")
        return s.encode("utf-8")[:n_bytes]


class HFTokenizer(CharOffsetTokenizer):
    """The reference's gpt2/llama/olmo path (indexing_v6_sharded.py:
    205-218) — requires ``transformers``, which is not installed in this
    environment (no network), so the constructor raises here. The
    offset-mapping surface is the tested ``CharOffsetTokenizer`` base
    (MiniBPETokenizer runs it in CI); only the model load/encode/decode
    calls themselves are necessarily untested offline."""

    def __init__(self, name: str = "gpt2"):
        super().__init__()
        try:  # pragma: no cover - transformers absent here
            from transformers import AutoTokenizer  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "HF tokenizers (gpt2/llama/olmo) need the `transformers` "
                "package + model files — unavailable offline; use the "
                "builtin bytepair/bytequad (fixed-width) or minibpe "
                "(variable-width) tokenizers"
            ) from e
        self.tok = AutoTokenizer.from_pretrained(name, use_fast=True)  # pragma: no cover
        self.dtype = np.uint16 if len(self.tok) < 0xFFFF else np.uint32  # pragma: no cover

    def encode(self, data: bytes) -> np.ndarray:  # pragma: no cover
        text = data.decode("utf-8", errors="replace")
        enc = self.tok(
            text, add_special_tokens=False, return_offsets_mapping=True
        )
        self._set_offsets_from_chars(text, enc["offset_mapping"])
        return np.asarray(enc["input_ids"], dtype=self.dtype)

    def decode(self, tokens: np.ndarray, n_bytes: int) -> bytes:  # pragma: no cover
        return self.tok.decode(tokens.tolist()).encode("utf-8")[:n_bytes]


def get_tokenizer(name: str):
    if name == "bytepair":
        return BytePairTokenizer()
    if name == "bytequad":
        return ByteQuadTokenizer()
    if name == "minibpe":
        return MiniBPETokenizer()
    return HFTokenizer(name)


def reverse_doc_tokens(tokens: np.ndarray) -> np.ndarray:
    """--reversed: index the reversed sequence (reference
    indexing_v6_sharded.py:49 `data = data[::-1]`)."""
    return tokens[::-1].copy()


def unreverse_ranges(ranges: np.ndarray, doc_len: int) -> np.ndarray:
    """Map [s, e) ranges found in reversed coordinates back to forward
    coordinates: [L - e, L - s), re-sorted."""
    if ranges.shape[0] == 0:
        return ranges
    out = np.stack([doc_len - ranges[:, 1], doc_len - ranges[:, 0]], axis=1)
    return out[np.argsort(out[:, 0], kind="stable")]
