"""Text-analysis operators for training-data pipelines over the
``documents`` table — language ID, quality scoring, token counting,
document fingerprinting. All vectorized-per-batch ``map_batches``
stages; stateful pieces (compiled regex, stopword sets) live in actor
``__init__``.

(The reference's text surface is its text index strategies,
``core/index/.../text/TextIndexStrategy.java`` — FORWARD/REVERSE/NGRAM
term extraction; our n-gram language ID and fingerprints reuse that
n-gram machinery shape.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# tiny deterministic per-language character/stopword profiles for the
# n-gram heuristic language id
_LANG_HINTS = {
    "en": {"the", "and", "is", "a", "of"},
    "de": {"der", "und", "die", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
    "es": {"el", "la", "los", "y", "de"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars_calc, n_stopwords) — single-space
    tokenization with empty tokens dropped (exactly DuckDB's
    ``list_filter(str_split(text,' '), x -> x <> '')``)."""
    texts = batch.column("text").to_pylist()
    n_tokens = np.empty(len(texts), dtype=np.int64)
    n_stop = np.empty(len(texts), dtype=np.int64)
    n_chars = np.empty(len(texts), dtype=np.int64)
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        n_tokens[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in stop)
        n_chars[i] = len(t)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars_calc": pa.array(n_chars, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
        }
    )


class QualityScorer:
    """Actor-pool stage: length/punct/stopword quality signals.

    Integer signals match the SQL oracle; the float ``quality`` score
    is engine-only (pytest-verified)."""

    def __init__(self):
        import re

        self.punct = re.compile(r"[.,;:!?]")
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_punct = np.empty(n, dtype=np.int64)
        n_tokens = np.empty(n, dtype=np.int64)
        n_stop = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w for w in t.split(" ") if w]
            n_tokens[i] = len(toks)
            n_stop[i] = sum(1 for w in toks if w in self.stop)
            n_punct[i] = len(self.punct.findall(t))
        ntok = np.maximum(n_tokens, 1)
        quality = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.5
            + np.clip(n_stop / ntok * 5.0, 0, 1) * 0.3
            + np.clip(1.0 - n_punct / ntok, 0, 1) * 0.2
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "quality": pa.array(quality, pa.float64()),
            }
        )


class LangId:
    """Heuristic language ID from stopword-hit counts per language
    (n-gram-style profile matching); deterministic tie-break by
    language code."""

    def __init__(self):
        self.profiles = sorted(_LANG_HINTS.items())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            toks = set(w for w in t.split(" ") if w)
            best, best_n = "und", 0
            for lang, hints in self.profiles:
                hits = len(toks & hints)
                if hits > best_n:
                    best, best_n = lang, hits
            out.append(best)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(out, pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: min of 64-bit rolling hashes
    over character windows (winnowing-style single fingerprint)."""
    texts = batch.column("text").to_pylist()
    fps = np.empty(len(texts), dtype=np.int64)
    B = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(data) < window:
            data = np.pad(data, (0, window - len(data)), constant_values=32)
        # rolling polynomial hash via cumulative trick (vectorized)
        h = np.zeros(len(data) - window + 1, dtype=np.uint64)
        for j in range(window):
            h = h * B + data[j : j + len(h)]
        fps[i] = np.int64(h.min().astype(np.int64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, pa.int64()),
        }
    )
