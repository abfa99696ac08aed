"""Measure stage-1 object-ref fan-out cost at high file counts
(VERDICT r4 next-round item #2): with ``n_files x (n_parts + 2)``
refs, what do submission latency and driver memory look like, and what
does the coalescing fallback recover?

Runs _stage1 ONLY (the fan-out lives there: ref creation + driver
bookkeeping + the two counts/checksum gathers), ungrouped vs grouped,
on a synthetic many-file layout. Usage:

    python tools/probe_ref_fanout.py [n_files] [n_parts]

Prints one JSON line per configuration. Scratch under /tmp.
"""

import json
import os
import resource
import sys
import time


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sits_ray.synth import write_transcripts

    d = f"/tmp/probe_refs_{n_files}"
    if not os.path.isdir(d) or len(os.listdir(d)) != n_files:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        write_transcripts(d, n_convs=max(n_files, 256), mean_turns=6,
                          seed=7, files=n_files, dup_turns=0)
    paths = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )

    from sits_ray.stages import exchange

    results = []
    for label, max_refs in (("ungrouped", None),
                            ("grouped", exchange.DEFAULT_MAX_STAGE1_REFS)):
        rss0 = rss_mb()
        t0 = time.perf_counter()
        refmat, rows, chk, parts, cpu_ms = exchange._stage1(
            paths, ("1m", "1h", "1d"), n_parts, "conv_id", "ts",
            "turn_idx", "tool", None, None, None, None, 1_000_000, None,
            max_stage1_refs=max_refs,
        )
        t1 = time.perf_counter()
        n_refs = len(refmat) * (n_parts + 2)
        res = {
            "label": label,
            "n_files": len(paths),
            "n_parts": n_parts,
            "n_stage1_tasks": len(refmat),
            "n_refs": n_refs,
            "stage1_wall_sec": round(t1 - t0, 2),
            "driver_maxrss_mb_before": round(rss0, 1),
            "driver_maxrss_mb_after": round(rss_mb(), 1),
            "nonempty_parts": len(rows),
        }
        results.append(res)
        print(json.dumps(res), flush=True)
        # release the ref matrix between configurations
        del refmat
        import gc

        gc.collect()
        time.sleep(2)

    ray.shutdown()
    return results


if __name__ == "__main__":
    main()
