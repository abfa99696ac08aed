"""Engine-only registry sweep timing: run every queries() entry at an sf
dir in one warm Ray session, print per-query wall seconds sorted slowest
first plus the total. No DuckDB oracles — this is the performance view
(tools/check_correctness.py is the correctness view).

Usage: python tools/sweep_timing.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sits_ray.queries import QUERIES

    times = {}
    t_all = time.time()
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            # consume lazily-built Datasets so the timing is real.
            # pandas DataFrame.count() is a per-column Series, not a row
            # count — only call .count() on ray Datasets; everything
            # else (DataFrame, pa.Table) supports len()
            import ray.data as _rd

            n = res.count() if isinstance(res, _rd.Dataset) else len(res)
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"
        times[name] = time.time() - t0
        print(f"{times[name]:8.2f}s  {name}  ({n} rows)"
              + (f"  ERROR {err}" if err else ""), flush=True)
    total = time.time() - t_all
    print("\n--- slowest ---")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{dt:8.2f}s  {name}")
    print(f"\ntotal: {total:.1f}s over {len(times)} queries")
    ray.shutdown()


if __name__ == "__main__":
    main()
