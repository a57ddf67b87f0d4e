"""Text-analysis kernels for the documents table: language-ID, quality scoring, token
counting, document fingerprinting.

These are the training-data-pipeline operators the engine adds beyond the reference
(driver mandate): each is a vectorized / per-batch kernel designed for
``map_batches(batch_format="pandas")`` over the ``documents`` table, with regexes and
constant tables compiled once per worker at import (or per actor in ``__init__``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

WORD_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
# BPE-ish subword splitter: words, numbers, punctuation runs (GPT-2-style coarse classes)
BPE_RE = re.compile(r"[A-Za-z]+(?:'[a-z]+)?|\d{1,3}|[^\sA-Za-z\d]+")
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"},
    "de": {"der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"},
    "zh": {"的", "了", "是", "在", "我", "有", "和", "就", "不", "人"},
}


def token_count_whitespace(texts: pd.Series) -> np.ndarray:
    """Whitespace token count, vectorized."""
    return texts.str.split().str.len().fillna(0).to_numpy(np.int64)


def token_count_bpe(texts: pd.Series) -> np.ndarray:
    """BPE-ish regex token count (coarse subword classes)."""
    return texts.str.findall(BPE_RE).str.len().fillna(0).to_numpy(np.int64)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length quality features."""
    n_chars = texts.str.len().fillna(0).to_numpy(np.int64)
    words = texts.str.split()
    n_words = words.str.len().fillna(0).to_numpy(np.int64)
    n_punct = texts.str.count(PUNCT_RE).fillna(0).to_numpy(np.int64)
    en_stop = STOPWORDS["en"]
    stop_hits = words.map(
        lambda ws: sum(1 for w in ws if w.lower() in en_stop) if isinstance(ws, list) else 0
    ).to_numpy(np.int64)
    safe_words = np.maximum(n_words, 1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "punct_ratio": n_punct / np.maximum(n_chars, 1),
            "stopword_ratio": stop_hits / safe_words,
            "mean_word_len": (n_chars - np.maximum(n_words - 1, 0)) / safe_words,
        }
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-hit language heuristic: the language whose stopword set scores the most
    hits wins; ties and no-hits → 'und'. (An n-gram profile would layer on the same
    shape; stopword sets are deterministic and oracle-friendly.)"""
    def score(text: str) -> str:
        if not isinstance(text, str) or not text:
            return "und"
        toks = text.lower().split()
        best, best_hits = "und", 0
        for lang, stops in STOPWORDS.items():
            hits = sum(1 for t in toks if t in stops)
            if lang == "zh":
                hits = sum(text.count(ch) for ch in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(score)


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Deterministic rolling-hash document fingerprint (FNV-1a over bytes, 64-bit)."""
    out = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts.fillna("")):
        h = np.uint64(0xCBF29CE484222325)
        prime = np.uint64(0x100000001B3)
        for b in t.encode("utf-8", errors="ignore"):
            h = np.uint64((int(h) ^ b) * int(prime) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out.astype(np.int64, copy=False)  # reinterpret for Arrow int64


def shingles(text: str, k: int = 5) -> set[int]:
    """Word k-shingles hashed to 32-bit ints (crc32: deterministic across processes)."""
    import zlib

    toks = text.split()
    if len(toks) < k:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {
        zlib.crc32(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)
    }
