"""Two-predictor OLS by exact integer normal equations.

Reference analog: sits' trend/regression reductions fit per-series lines
(C_temp_* slope family); this is the corpus-level MULTIPLE regression —
value (cents) ~ hour-of-day + is-tool-call — solved in closed form by
Cramer's rule over 3x3 integer determinants, so the whole fit is
certified cross-engine.

Exactness contracts:
- every moment (n, Sx1, Sx2, Sx11, Sx12, Sx22, Sy, Sx1y, Sx2y, Syy) is
  an exact integer folded from per-batch int64 partials (driver combine
  in arbitrary-precision Python ints — order-free);
- the 3x3 determinants reach ~1e29 at sf0.1 — beyond the two-limb
  ``_i2d`` cast's 2^85 validity — so they cast to double via the
  THREE-limb fold ``i3d`` below, verified bit-identical to the DuckDB
  expression (queries._i3d) on 30k random signed ints up to 126 bits;
- betas are single double divisions of i3d casts; R^2 is a pinned float
  tree mirrored operand-for-operand by the SQL twin.
SQL-side integer range is hugeint (~1.7e38): determinant terms overflow
past ~1e12 rows; the engine side (Python ints) has no such bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def i3d(x: int) -> float:
    """Three-limb exact-replay int->double cast, valid to 2^126: the
    DOUBLE value DuckDB's ``queries._i3d`` expression produces —
    ``(fl(h)*2^64 + fl(m)*2^32) + fl(l)`` with trunc-division limbs.
    NOT always equal to Python's correctly-rounded ``float(x)`` (two
    sequential rounded adds); both engines replay this exact tree."""
    s = -1.0 if x < 0 else 1.0
    a = abs(x)
    h, r = divmod(a, 1 << 64)
    m, lo = divmod(r, 1 << 32)
    return s * ((float(h) * 18446744073709551616.0
                 + float(m) * 4294967296.0) + float(lo))


def _ts_us(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype("datetime64[us]").astype(np.int64)


def ols_two_factor(ds, value_col: str = "value", ts_col: str = "ts",
                   type_col: str = "event_type",
                   tool_type: str = "click") -> pd.DataFrame:
    """Fit cents ~ hour + is_tool over the full event stream: one
    streaming pass of 10 int64 moment partials per batch, driver
    combine, closed-form Cramer solve. Returns one row
    (n_obs, beta0, beta_hour, beta_tool, r2)."""

    def moments(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        y = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                     / 0.01).astype(np.int64)
        x1 = (us // 3600000000) % 24
        x2 = (t[type_col].to_numpy(zero_copy_only=False)
              == tool_type).astype(np.int64)
        vals = {
            "n": len(y), "sx1": x1.sum(), "sx2": x2.sum(),
            "sx11": (x1 * x1).sum(), "sx12": (x1 * x2).sum(),
            "sx22": (x2 * x2).sum(), "sy": y.sum(),
            "sx1y": (x1 * y).sum(), "sx2y": (x2 * y).sum(),
            "syy": (y * y).sum(),
        }
        return pa.table({k: pa.array([int(v)], pa.int64())
                         for k, v in vals.items()})

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n, sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y, syy = (
        int(p[c].astype(object).sum()) for c in
        ["n", "sx1", "sx2", "sx11", "sx12", "sx22", "sy", "sx1y",
         "sx2y", "syy"])

    det = (n * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx12 - sx11 * sx2))
    det0 = (sy * (sx11 * sx22 - sx12 * sx12)
            - sx1 * (sx1y * sx22 - sx12 * sx2y)
            + sx2 * (sx1y * sx12 - sx11 * sx2y))
    det1 = (n * (sx1y * sx22 - sx12 * sx2y)
            - sy * (sx1 * sx22 - sx12 * sx2)
            + sx2 * (sx1 * sx2y - sx1y * sx2))
    det2 = (n * (sx11 * sx2y - sx1y * sx12)
            - sx1 * (sx1 * sx2y - sx1y * sx2)
            + sy * (sx1 * sx12 - sx11 * sx2))
    b0 = i3d(det0) / i3d(det)
    b1 = i3d(det1) / i3d(det)
    b2 = i3d(det2) / i3d(det)
    # R^2: pinned float tree, mirrored operand-for-operand in SQL
    sy2n = i3d(sy * sy) / i3d(n)
    num = ((b0 * i3d(sy) + b1 * i3d(sx1y)) + b2 * i3d(sx2y)) - sy2n
    den = i3d(syy) - sy2n
    return pd.DataFrame([{
        "n_obs": np.int64(n), "beta0": b0, "beta_hour": b1,
        "beta_tool": b2, "r2": num / den,
    }])
