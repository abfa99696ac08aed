"""Text analysis actor stage: language ID, quality features, token counts.

Stateful pattern: regexes + language profiles compiled once per actor in
``__init__`` (guide 'Stateful stages'); ``__call__`` is per batch.
"""

from __future__ import annotations

import pandas as pd

from sits_ray.kernels.text import (
    BPEISH_RE,
    LANG_PROFILES,
    TOKEN_RE,
    WORD_RE,
    detect_lang,
    quality_features,
)


_ANALYZER_CACHE: dict = {}


def analyze_rows(batch, id_col: str = "doc_id", text_col: str = "text"):
    """Plain-task form of :class:`TextAnalyzer` with a per-worker-process
    cache — its state is a handful of frozensets (no load-time setup), so
    warm Ray workers amortize it like an actor pool minus the ~1-2 s pool
    spin-up per call (the dedup._STAGE_CACHE principle: actor pools for
    expensive setup like models, plain tasks for cheap incremental state)."""
    key = (id_col, text_col)
    st = _ANALYZER_CACHE.get(key)
    if st is None:
        st = _ANALYZER_CACHE[key] = TextAnalyzer(id_col=id_col, text_col=text_col)
    return st(batch)


class TextAnalyzer:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        # compiled once per actor (regexes are module-level compiled; the
        # profile sets are hoisted into locals here)
        self.id_col, self.text_col = id_col, text_col
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {
            "doc_id": batch[self.id_col].to_numpy(),
            "pred_lang": [detect_lang(t) for t in batch[self.text_col]],
            "n_tokens_bpeish": [len(BPEISH_RE.findall(t)) for t in batch[self.text_col]],
        }
        feats = [quality_features(t) for t in batch[self.text_col]]
        for k in ("n_chars", "n_tokens", "mean_token_len", "punct_ratio", "stopword_ratio"):
            rows[k] = [f[k] for f in feats]
        out = pd.DataFrame(rows)
        if "lang" in batch.columns:
            out["true_lang"] = batch["lang"].to_numpy()
            out["lang_match"] = out["pred_lang"] == out["true_lang"]
        return out
