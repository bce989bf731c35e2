"""Text-analysis operators over the documents table: token counting,
quality stats, language-ID heuristic, document fingerprinting.

Each is a vectorized ``map_batches`` fn whose semantics are deliberately
mirrorable in ANSI SQL (the driver's DuckDB oracle): integer outputs only
(no float ratios — float rounding rules differ between engines).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EN_STOPWORDS = ("the", "a", "of")


def token_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens, n_bytes) — tokens = \\S+ runs, vectorized."""
    text = batch[text_col]
    n_tokens = pc.count_substring_regex(text, r"\S+")
    n_bytes = pc.binary_length(text.cast(pa.binary()))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": n_tokens.cast(pa.int64()),
            "n_bytes": n_bytes.cast(pa.int64()),
        }
    )


def _stopword_token_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row count of whitespace-split tokens EXACTLY equal to a stopword.

    Matches the oracle's `list_filter(regexp_split_to_array(trim(text),
    '\\s+'), x -> x IN stops)` semantics — a `\\b(the|a|of)\\b` regex would
    also match inside 'the,' or 'state-of-the-art' where the token test
    doesn't. Vectorized: trim → split → flatten → is_in → bincount by the
    flat values' parent row."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    hit = pc.is_in(flat, value_set=pa.array(EN_STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    counts = np.bincount(parents[hit], minlength=len(toks)).astype(np.int64)
    return pa.array(counts, pa.int64())


def quality_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_words, n_stopwords, n_alpha_chars) quality signals."""
    text = batch[text_col]
    n_words = pc.count_substring_regex(text, r"\S+")
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]")
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": n_words.cast(pa.int64()),
            "n_stopwords": _stopword_token_counts(text),
            "n_alpha_chars": n_alpha.cast(pa.int64()),
        }
    )


def lang_id(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, lang_pred): 'en' if any English stopword token occurs, else
    'und'. A deliberately simple, SQL-mirrorable heuristic; the honest
    n-gram scorer lives in ``lang_id_ngram`` (no SQL oracle)."""
    n_stop = _stopword_token_counts(batch[text_col])
    pred = pc.if_else(pc.greater(n_stop, 0), "en", "und")
    return pa.table({id_col: batch[id_col], "lang_pred": pred})


_LANG_PROFILES = {
    # top character trigrams per language (tiny built-in profiles)
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de": (" de", "der", "er ", "ie ", "die", "und", " un", "nd ", "ch ", "sch"),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", " et", "et ", "la ", " la"),
}


class NgramLangId:
    """Actor-pool stage: character-trigram profile scoring (stateful —
    profiles built once per actor). No SQL oracle (heuristic scoring)."""

    def __init__(self):
        self.profiles = {lang: set(tris) for lang, tris in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        for t in texts:
            t = f" {t.lower()} "
            tris = {t[i : i + 3] for i in range(len(t) - 2)}
            best, best_score = "und", 0
            for lang, prof in self.profiles.items():
                score = len(tris & prof)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds)})


def md5_fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, fp) content fingerprint = md5 hex (matches DuckDB md5())."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})


def content_hash_u64(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, fp) u64 content hash (blake2b-8) — the cheap exact-dedup key at
    scale (one 8-byte key per doc instead of shuffling full texts). Per-doc
    digest runs in C; no SQL equivalent (md5_fingerprint is the
    oracle-checked variant)."""
    from hg_dedup_ray.functions.arrow_utils import string_column_bytes

    buf, offsets = string_column_bytes(batch[text_col])
    n = offsets.shape[0] - 1
    out = np.zeros(n, dtype=np.uint64)
    mv = memoryview(buf)
    for d in range(n):
        out[d] = int.from_bytes(
            hashlib.blake2b(mv[offsets[d] : offsets[d + 1]], digest_size=8).digest(),
            "little",
        )
    return pa.table({id_col: batch[id_col], "fp": pa.array(out, pa.uint64())})
