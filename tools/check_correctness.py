"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle SQL side-by-side on a testdata sf dir, compare
row-count + schema + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, exp: pd.DataFrame, name: str) -> list[str]:
    issues = []
    if len(got) != len(exp):
        issues.append(f"rowcount {len(got)} != {len(exp)}")
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        issues.append(f"columns {gc} != {ec}")
        return issues
    g, e = canon(got), canon(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c], e[c]
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
                gvn = gv.to_numpy(dtype=np.float64)
                evn = ev.to_numpy(dtype=np.float64)
                both_nan = np.isnan(gvn) & np.isnan(evn)
                exact = (gvn == evn) | both_nan
                if not exact.all():
                    close = np.isclose(gvn, evn, rtol=1e-9, atol=1e-12) | both_nan
                    n_bad = int((~exact).sum())
                    if close.all():
                        issues.append(f"col {c}: {n_bad} value(s) differ in last ulps (tolerance-close)")
                    else:
                        i = int(np.argmax(~close))
                        issues.append(f"col {c}: MISMATCH {n_bad} rows, e.g. {gvn[i]} != {evn[i]}")
            else:
                if not gv.astype(str).equals(ev.astype(str)):
                    bad = gv.astype(str) != ev.astype(str)
                    i = int(np.argmax(bad.to_numpy()))
                    issues.append(f"col {c}: MISMATCH {int(bad.sum())} rows, e.g. {gv.iloc[i]!r} != {ev.iloc[i]!r}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sits_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_warn = n_bad = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in ORACLE_SQL:
            print(f"[rows] {name}: {len(got)} rows (no SQL oracle)")
            n_ok += 1
            continue
        try:
            exp = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL raised {e}")
            n_bad += 1
            continue
        issues = compare(got, exp, name)
        hard = [i for i in issues if "ulps" not in i]
        if not issues:
            print(f"[ OK ] {name}: {len(got)} rows exact")
            n_ok += 1
        elif not hard:
            print(f"[warn] {name}: {len(got)} rows; " + "; ".join(issues))
            n_warn += 1
        else:
            print(f"[FAIL] {name}: " + "; ".join(issues))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_warn} ulp-warn, {n_bad} fail")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
