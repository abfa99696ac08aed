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


def cooccurrence_counts(q: np.ndarray, levels: int = 16) -> np.ndarray:
    """Symmetric lag-1 co-occurrence COUNT matrices for every row of a
    (k x L) quantized matrix (invalid levels < 0 break pairs): ONE
    bincount builds all k matrices. Integer counts are the cross-engine-
    exact core of the GLCM (the float Haralick reductions sit on top)."""
    k, L = q.shape
    a, b = q[:, :-1], q[:, 1:]
    ok = (a >= 0) & (b >= 0)
    rows = np.repeat(np.arange(k), L - 1).reshape(k, L - 1)
    base = rows[ok] * (levels * levels)
    ij = base + a[ok] * levels + b[ok]
    ji = base + b[ok] * levels + a[ok]
    return np.bincount(
        np.concatenate([ij, ji]), minlength=k * levels * levels
    ).reshape(k, levels, levels)


def quantize_matrix(m: np.ndarray, levels: int = 16) -> np.ndarray:
    """Row-wise min-max quantization of a (k x L) matrix (NaN -> -1);
    identical thresholds to :func:`quantize` per row."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    k, L = m.shape
    valid = ~np.isnan(m)
    any_valid = valid.any(axis=1)
    with np.errstate(all="ignore"):
        lo = np.nanmin(np.where(valid, m, np.inf), axis=1)
        hi = np.nanmax(np.where(valid, m, -np.inf), axis=1)
    rng = hi - lo
    q = np.full((k, L), -1, dtype=np.int64)
    flat_rng = np.where(rng > 0, rng, 1.0)
    qv = np.floor((m - lo[:, None]) / flat_rng[:, None] * levels)
    qv = np.clip(qv, 0, levels - 1)
    const = any_valid & (rng == 0)
    q[valid] = qv[valid].astype(np.int64)
    if const.any():
        cm = const[:, None] & valid
        q[cm] = 0
    return q


def texture_matrix(m: np.ndarray, levels: int = 16) -> dict[str, np.ndarray]:
    """Vectorized-across-series GLCM features: quantize each row of a
    (k x L) matrix, build all k lag-1 co-occurrence matrices with one
    bincount, derive the 9 Haralick features per row (same math as
    :func:`glcm_features`; parity pinned in tests/test_texture_som.py)."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    k, L = m.shape
    if k == 0:
        return {f: np.empty(0) for f in FEATURES}
    q = quantize_matrix(m, levels)

    if L < 2:
        nanv = np.full(k, np.nan)
        return {f: nanv.copy() for f in FEATURES}
    return haralick_rows(cooccurrence_counts(q, levels), levels)


def haralick_rows(counts: np.ndarray, levels: int) -> dict[str, np.ndarray]:
    """The 9 Haralick features for every (levels x levels) count matrix of
    a (k x levels x levels) stack — the shared float core of the 1-D
    (texture_matrix) and 2-D (glcm2d_features) paths."""
    k = counts.shape[0]
    P = np.asarray(counts, dtype=np.float64)
    tot = P.sum(axis=(1, 2))
    has = tot > 0
    P[has] /= tot[has, None, None]
    # Sequential row-major accumulation over the levels*levels cells (NOT
    # np.sum's pairwise tree): the SQL oracle (queries._texture_feats_sql)
    # reduces an (i, j)-ordered list left-to-right, and zero-P cells add an
    # exact +/-0, so summing all cells here == summing nonzero cells there.
    Pf = P.reshape(k, levels * levels)
    ic = np.repeat(np.arange(levels, dtype=np.float64), levels)
    jc = np.tile(np.arange(levels, dtype=np.float64), levels)
    dc = ic - jc

    def seqsum(T: np.ndarray) -> np.ndarray:
        acc = T[:, 0].copy()
        for c in range(1, T.shape[1]):
            acc = acc + T[:, c]
        return acc

    mu = seqsum(ic[None] * Pf)
    var = seqsum((ic[None] - mu[:, None]) ** 2 * Pf)
    asm = seqsum(Pf**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.where(
            var > 0,
            seqsum((ic[None] - mu[:, None]) * (jc[None] - mu[:, None]) * Pf) / var,
            np.nan,
        )
    out = {
        "contrast": seqsum((dc**2)[None] * Pf),
        "dissimilarity": seqsum(np.abs(dc)[None] * Pf),
        "homogeneity": seqsum(Pf / (1.0 + dc**2)[None]),
        "asm": asm,
        "energy": np.sqrt(asm),
        "glcm_mean": mu,
        "glcm_var": var,
        "glcm_std": np.sqrt(var),
        "correlation": corr,
    }
    for f in FEATURES:
        out[f] = np.where(has, out[f], np.nan)
    return out


def quantize_global(m: np.ndarray, levels: int = 16) -> np.ndarray:
    """GLOBAL min-max quantization of a 2-D grid to [0, levels-1]
    (NaN -> -1) — the raster-image rule of ``sits_texture``
    (``R/sits_texture.R:118-160``: one min/max per band, not per row);
    same threshold arithmetic as :func:`quantize`."""
    m = np.asarray(m, dtype=np.float64)
    out = np.full(m.shape, -1, dtype=np.int64)
    ok = ~np.isnan(m)
    if not ok.any():
        return out
    lo, hi = m[ok].min(), m[ok].max()
    if hi == lo:
        out[ok] = 0
        return out
    q = np.floor((m[ok] - lo) / (hi - lo) * levels).astype(np.int64)
    out[ok] = np.clip(q, 0, levels - 1)
    return out


OFFSETS_2D = {"h": (0, 1), "v": (1, 0)}


def cooccurrence_counts_2d(
    q: np.ndarray, levels: int = 16, offsets: dict[str, tuple[int, int]] | None = None
) -> dict[str, np.ndarray]:
    """Symmetric co-occurrence COUNT matrix of a quantized 2-D grid per
    spatial offset — the true 2-D GLCM of ``sits_texture``
    (``src/glcm_fns.cpp``: angle 0 = horizontal (0,1), angle 90 =
    vertical (1, 0)); invalid (< 0) cells break pairs."""
    q = np.asarray(q, dtype=np.int64)
    out = {}
    for name, (dr, dc) in (offsets or OFFSETS_2D).items():
        a = q[: q.shape[0] - dr, : q.shape[1] - dc]
        b = q[dr:, dc:]
        ok = (a >= 0) & (b >= 0)
        av, bv = a[ok], b[ok]
        out[name] = np.bincount(
            np.concatenate([av * levels + bv, bv * levels + av]),
            minlength=levels * levels,
        ).reshape(levels, levels)
    return out


def glcm2d_features(m: np.ndarray, levels: int = 8) -> dict[str, dict[str, float]]:
    """Per-offset Haralick features of a 2-D grid: global quantize, one
    symmetric co-occurrence matrix per offset, shared float core.
    Returns ``{offset_name: {feature: value}}``."""
    counts = cooccurrence_counts_2d(quantize_global(m, levels), levels)
    names = list(counts)
    feats = haralick_rows(np.stack([counts[n] for n in names]), levels)
    return {n: {f: float(feats[f][i]) for f in FEATURES} for i, n in enumerate(names)}
