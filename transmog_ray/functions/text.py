"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All are vectorized-or-cheap per-batch transforms designed for
``map_batches``; definitions are chosen to be exactly reproducible in
ANSI SQL (DuckDB) so the driver's oracle can pin them — except the
language-ID heuristic, which has no reasonable SQL form (rows-only check).
"""

from __future__ import annotations

import hashlib

import pandas as pd

STOPWORDS = ("the", "a", "and", "of", "to")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"},
    "es": {"el", "la", "que", "de", "los", "es", "una", "por", "con", "para"},
}


def token_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """``n_tokens`` = single-space split count (== DuckDB
    ``len(string_split(text, ' '))``), ``n_chars_computed`` = length."""
    s = df[text_col].fillna("")
    df["n_tokens"] = (s.str.count(" ") + 1).astype("int64")
    df["n_chars_computed"] = s.str.len().astype("int64")
    return df


def quality_score(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length/word/stopword quality signals, SQL-reproducible:

    * ``n_words``  — single-space token count
    * ``mean_word_len`` — (chars - spaces) / words (exact float64 ratio —
      identical on both sides, so no rounding)
    * ``stopword_ratio`` — tokens ∈ STOPWORDS / words
    """
    s = df[text_col].fillna("")
    n_words = (s.str.count(" ") + 1).astype("int64")
    n_chars = s.str.len()
    n_spaces = s.str.count(" ")
    df["n_words"] = n_words
    df["mean_word_len"] = (n_chars - n_spaces) / n_words
    # count only exact single-space tokens to mirror the SQL list_filter
    stop_counts = s.str.split(" ").map(
        lambda ws: sum(1 for w in ws if w in STOPWORDS)
    )
    df["stopword_ratio"] = stop_counts / n_words
    return df


def fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """``fp`` = md5 hex of lower(trim(text)) — DuckDB ``md5(lower(trim(text)))``."""
    df["fp"] = [
        hashlib.md5(("" if t is None else str(t)).strip().lower().encode()).hexdigest()
        for t in df[text_col]
    ]
    return df


class LangId:
    """Stopword-profile language guesser (actor-pool friendly: profiles
    compiled once in ``__init__``). Heuristic — no SQL oracle; checked by
    rows-only validation plus unit tests on known-language snippets."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def guess(self, text: str | None) -> str:
        if not text:
            return "und"
        words = text.lower().split()
        if not words:
            return "und"
        best, best_hits = "und", 0
        for lang, prof in self.profiles.items():
            hits = sum(1 for w in words if w in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df["lang_guess"] = [self.guess(t) for t in df["text"]]
        return df


def rolling_fingerprint(text: str, window: int = 16, base: int = 257,
                        mod: int = (1 << 61) - 1) -> int:
    """Deterministic rolling-hash document fingerprint (min of window
    hashes — a 1-permutation MinHash over character windows)."""
    if not text:
        return 0
    h, power = 0, pow(base, window - 1, mod)
    best = None
    data = text.encode("utf-8", "ignore")
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            best = h if best is None or h < best else best
    return best if best is not None else h


__all__ = [
    "token_stats",
    "quality_score",
    "fingerprint",
    "LangId",
    "rolling_fingerprint",
    "STOPWORDS",
]
