"""GLCM texture features over quantized series — the 1-D (time axis)
analog of ``sits_texture`` (reference ``R/sits_texture.R:118-220``,
kernels ``src/glcm_fns.cpp``): quantize values to ``levels`` grey levels,
build the co-occurrence matrix of lag-1 neighbors over a rolling window,
and derive Haralick features (contrast, dissimilarity, homogeneity, ASM,
energy, mean, variance, std, correlation).
"""

from __future__ import annotations

import numpy as np

FEATURES = (
    "contrast", "dissimilarity", "homogeneity", "asm", "energy",
    "glcm_mean", "glcm_var", "glcm_std", "correlation",
)


def quantize(v: np.ndarray, levels: int = 16) -> np.ndarray:
    """Min-max quantize to integer grey levels [0, levels-1] (NaN -> -1)."""
    v = np.asarray(v, dtype=np.float64)
    out = np.full(v.size, -1, dtype=np.int64)
    ok = ~np.isnan(v)
    if not ok.any():
        return out
    lo, hi = v[ok].min(), v[ok].max()
    if hi == lo:
        out[ok] = 0
        return out
    q = np.floor((v[ok] - lo) / (hi - lo) * levels).astype(np.int64)
    out[ok] = np.clip(q, 0, levels - 1)
    return out


def glcm_features(q: np.ndarray, levels: int = 16) -> dict[str, float]:
    """Haralick features of the symmetric lag-1 co-occurrence matrix of a
    quantized 1-D series (invalid levels < 0 break pairs)."""
    q = np.asarray(q, dtype=np.int64)
    a, b = q[:-1], q[1:]
    ok = (a >= 0) & (b >= 0)
    a, b = a[ok], b[ok]
    if a.size == 0:
        return {f: float("nan") for f in FEATURES}
    P = np.zeros((levels, levels), dtype=np.float64)
    np.add.at(P, (a, b), 1.0)
    np.add.at(P, (b, a), 1.0)  # symmetric
    P /= P.sum()
    i = np.arange(levels, dtype=np.float64)
    ii, jj = np.meshgrid(i, i, indexing="ij")
    d = ii - jj
    mu = float((ii * P).sum())
    var = float(((ii - mu) ** 2 * P).sum())
    asm = float((P**2).sum())
    corr = (
        float((((ii - mu) * (jj - mu) * P).sum()) / var) if var > 0 else float("nan")
    )
    return {
        "contrast": float((d**2 * P).sum()),
        "dissimilarity": float((np.abs(d) * P).sum()),
        "homogeneity": float((P / (1.0 + d**2)).sum()),
        "asm": asm,
        "energy": float(np.sqrt(asm)),
        "glcm_mean": mu,
        "glcm_var": var,
        "glcm_std": float(np.sqrt(var)),
        "correlation": corr,
    }


def series_texture(values: np.ndarray, levels: int = 16) -> dict[str, float]:
    """Quantize + GLCM features for one series."""
    return glcm_features(quantize(values, levels), levels)
