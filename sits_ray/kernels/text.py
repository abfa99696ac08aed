"""Text-analysis kernels for the training-data pipeline ops: language ID
(character n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting, and rolling-hash document fingerprinting.

All operate on lists/arrays of strings and are exercised inside
``map_batches`` stages (stateful pieces — compiled regexes, profile
tables — are built once per actor in ``__init__``; see
:mod:`sits_ray.stages.textstats`).
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
BPEISH_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")

# tiny per-language stopword/character profiles (public knowledge)
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(TOKEN_RE.findall(text))


def bpeish_token_count(text: str) -> int:
    """BPE-ish regex token count (letters / digits / single symbols)."""
    return len(BPEISH_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio quality signals
    (heuristics in the C4/Gopher style)."""
    n = len(text)
    toks = TOKEN_RE.findall(text)
    words = [w.lower() for w in WORD_RE.findall(text)]
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    en_stop = LANG_PROFILES["en"]
    return {
        "n_chars": float(n),
        "n_tokens": float(len(toks)),
        "mean_token_len": float(np.mean([len(t) for t in toks])) if toks else 0.0,
        "punct_ratio": n_punct / n if n else 0.0,
        "stopword_ratio": (
            sum(1 for w in words if w in en_stop) / len(words) if words else 0.0
        ),
    }


def detect_lang(text: str) -> str:
    """Stopword-overlap language heuristic; 'zh' if CJK-dominant,
    'und' when nothing matches."""
    cjk = sum(1 for c in text if "一" <= c <= "鿿")
    if cjk > len(text) * 0.2:
        return "zh"
    words = {w.lower() for w in WORD_RE.findall(text)}
    best, best_n = "und", 0
    for lang, prof in LANG_PROFILES.items():
        k = len(words & prof)
        if k > best_n:
            best, best_n = lang, k
    return best


def rolling_fingerprint(text: str, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the whole document (stable fingerprint)."""
    h = 0
    for ch in text.encode("utf-8"):
        h = (h * base + ch) % mod
    return h
