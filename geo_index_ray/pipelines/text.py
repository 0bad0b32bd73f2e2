"""Text-analysis stages for training-data pipelines over `documents`.

All stages are stateless map_batches transforms; string kernels use
pyarrow.compute where available, bounded per-row Python where not.
Stages with exact SQL twins (token_count, quality) keep their arithmetic
ANSI-expressible; heuristics (lang_id, fingerprint) are rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (alphabetical langs only; zh/ja matched by codepoint ranges)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "de"],
    "pt": ["o", "a", "os", "e", "é", "uma", "que", "não"],
    "ru": ["и", "в", "не", "на", "что", "это", "с", "как"],
}


def token_count_stage(id_col: str, text_col: str = "text"):
    """(id, n_tokens): whitespace-token count.

    SQL twin: ``len(list_filter(string_split_regex(text, '\\s+'),
    x -> x <> ''))``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        # str.split() drops empty tokens (leading/trailing/repeated
        # whitespace) — exactly the SQL twin's list_filter semantics
        texts = batch[text_col].to_pylist()
        n = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        return pa.table({id_col: batch[id_col], "n_tokens": pa.array(n)})

    return fn


def bpe_token_count_stage(id_col: str, text_col: str = "text"):
    """(id, n_tokens): BPE-pretokenizer-style regex token count — runs of
    word characters or runs of non-word non-space punctuation, the shape
    GPT-2-style pretokenizers split on.  The pattern compiles ONCE per
    stage closure (per worker), never per batch.

    SQL twin: ``len(regexp_extract_all(text,
    '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]+'))`` (explicit classes so Python
    re and DuckDB RE2 agree).
    """
    import re

    pat = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]+")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = np.array([len(pat.findall(t or "")) for t in texts], dtype=np.int64)
        return pa.table({id_col: batch[id_col], "n_tokens": pa.array(n)})

    return fn


def quality_stage(id_col: str, text_col: str = "text"):
    """(id, n_chars, n_punct, quality_score) — cheap quality signals.

    quality_score = n_chars / (n_punct + 1) computed in double; all three
    are exactly SQL-expressible.
    """

    def fn(batch: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(batch[text_col]).to_numpy().astype(np.int64)
        stripped = pc.replace_substring_regex(batch[text_col], r"[.,!?]", "")
        n_punct = n_chars - pc.utf8_length(stripped).to_numpy().astype(np.int64)
        score = n_chars / (n_punct + 1.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars),
                "n_punct": pa.array(n_punct),
                "quality_score": pa.array(score),
            }
        )

    return fn


def lang_id_stage(id_col: str, text_col: str = "text"):
    """(id, lang_pred): stopword-voting language ID heuristic (rows-only —
    no SQL twin)."""

    marker_sets = {lang: set(ws) for lang, ws in _LANG_MARKERS.items()}

    def fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch[text_col].to_pylist():
            t = t or ""
            # CJK by codepoint dominance
            cjk = sum(1 for ch in t[:200] if "一" <= ch <= "鿿")
            kana = sum(1 for ch in t[:200] if "぀" <= ch <= "ヿ")
            if kana > 2:
                preds.append("ja")
                continue
            if cjk > 2:
                preds.append("zh")
                continue
            words = t.lower().split()[:200]
            best, best_hits = "en", -1
            for lang, markers in marker_sets.items():
                hits = sum(1 for w in words if w in markers)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table({id_col: batch[id_col], "lang_pred": pa.array(preds)})

    return fn


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(0xCBF29CE484222325)


def fingerprint_stage(id_col: str, text_col: str = "text"):
    """(id, fp): 64-bit rolling (FNV-1a) document fingerprint, vectorized
    column-wise over a padded byte matrix (rows-only)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = [t.encode() if t else b"" for t in batch[text_col].to_pylist()]
        n = len(texts)
        if n == 0:
            return pa.table({id_col: batch[id_col], "fp": pa.array([], pa.int64())})
        maxlen = max(1, max(len(t) for t in texts))
        mat = np.frombuffer(
            b"".join(t.ljust(maxlen, b"\x00") for t in texts), dtype=np.uint8
        ).reshape(n, maxlen).astype(np.uint64)
        lens = np.array([len(t) for t in texts])
        h = np.full(n, _FP_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for col in range(maxlen):
                active = col < lens
                hx = np.where(active, (h ^ mat[:, col]) * _FP_BASE, h)
                h = hx
        return pa.table({id_col: batch[id_col], "fp": pa.array(h.view(np.int64))})

    return fn
