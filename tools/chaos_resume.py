"""Kill-and-resume chaos test (SURVEY §7.2 item 9 / VERDICT r4 item #3
made literal): SIGKILL a stage-2 worker mid-flagship and SIGKILL the
whole driver mid-flagship, then prove the store converges to
byte-identical tiers with only the unfinished partitions recomputed.

Three runs over the same synthetic transcripts input:

1. reference  — uninterrupted run; digest every tier parquet.
2. worker-kill — during the run, SIGKILL one ``ray::_build_write_part``
   worker process; Ray's task retry must absorb it (driver exits 0,
   digests equal).
3. driver-kill — SIGKILL the driver's whole process group once >= 2
   partition manifests have committed but before the run finishes;
   re-run; the resume must skip the committed partitions
   (parts_skipped >= 1, parts_built < parts_total) and the final store
   must be byte-identical to the reference.

Each driver is a separate process with its own local Ray session
(``start_new_session=True`` so a SIGKILL to the process group also
reaps its raylet — no orphan cluster). Never run while other Ray work
runs on this box (CLAUDE.md).

Usage:
    python tools/chaos_resume.py            # small (~1 min)
    python tools/chaos_resume.py --bench    # sf0.1 bench shape
    python tools/chaos_resume.py --child IN OUT N_PARTS   (internal)

Prints one JSON summary line; exit 0 iff every check passed.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(in_dir: str, out_dir: str, n_parts: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("CHAOS_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from sits_ray.pipelines.flagship import run_flagship

    r = run_flagship(in_dir, out_dir, tiers=("1m", "1h", "1d"),
                     n_parts=n_parts, resume=True)
    print("CHAOS_RESULT " + json.dumps(
        {k: r[k] for k in ("parts_total", "parts_built", "parts_skipped")}
    ), flush=True)
    ray.shutdown()


def _digests(out_dir: str) -> dict[str, str]:
    out = {}
    for p in sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                              recursive=True)):
        h = hashlib.sha256()
        with open(p, "rb") as fh:
            h.update(fh.read())
        out[os.path.relpath(p, out_dir)] = h.hexdigest()
    return out


def _spawn(in_dir: str, out_dir: str, n_parts: int) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         in_dir, out_dir, str(n_parts)],
        cwd=REPO, env=env, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _wait_parse(proc: subprocess.Popen) -> dict | None:
    out, _ = proc.communicate()
    for line in (out or "").splitlines():
        if line.startswith("CHAOS_RESULT "):
            return json.loads(line[len("CHAOS_RESULT "):])
    return None


def _find_worker(pgid: int, needle: str) -> int | None:
    """PID of a ray worker running ``needle`` in the child's session."""
    ps = subprocess.run(["ps", "-eo", "pid,pgid,cmd"],
                        capture_output=True, text=True).stdout
    for line in ps.splitlines()[1:]:
        parts = line.split(None, 2)
        if len(parts) < 3:
            continue
        pid_s, pgid_s, cmd = parts
        if needle in cmd and "ray::" in cmd:
            try:
                if int(pgid_s) == pgid:
                    return int(pid_s)
            except ValueError:
                continue
    return None


def _find_stage2_worker(pgid: int) -> int | None:
    return _find_worker(pgid, "_build_write_part")


def _killpg(proc: subprocess.Popen) -> None:
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass


def run_chaos(n_convs: int, files: int, n_parts: int,
              scratch: str) -> dict:
    from sits_ray.synth import write_transcripts_scaled

    # reuse the bench's cached input when the shape matches (the writer
    # is idempotent per (n_convs, mean_turns, seed, files) via _SUCCESS)
    bench_cache = "/tmp/sits_ray_bench/transcripts4_sf0.1"
    if n_convs == 800_000 and os.path.isdir(bench_cache):
        in_dir = write_transcripts_scaled(
            bench_cache, n_convs=n_convs, mean_turns=40, seed=42,
            files=files,
        )
    else:
        in_dir = write_transcripts_scaled(
            os.path.join(scratch, "input"), n_convs=n_convs,
            mean_turns=40, seed=42, files=files,
        )
    summary: dict = {"n_convs": n_convs, "files": files,
                     "n_parts": n_parts}

    # --- 1. reference run -------------------------------------------------
    ref_dir = os.path.join(scratch, "ref")
    shutil.rmtree(ref_dir, ignore_errors=True)
    t0 = time.perf_counter()
    p = _spawn(in_dir, ref_dir, n_parts)
    ref_res = _wait_parse(p)
    summary["reference"] = {
        "ok": p.returncode == 0 and ref_res is not None,
        "wall_sec": round(time.perf_counter() - t0, 1),
        **(ref_res or {}),
    }
    ref_dig = _digests(ref_dir)
    summary["reference"]["n_files"] = len(ref_dig)

    # --- 2. worker kill ---------------------------------------------------
    for attempt in range(3):
        wk_dir = os.path.join(scratch, "wkill")
        shutil.rmtree(wk_dir, ignore_errors=True)
        p = _spawn(in_dir, wk_dir, n_parts)
        pgid = os.getpgid(p.pid)
        killed = None
        deadline = time.time() + 600
        while p.poll() is None and time.time() < deadline:
            w = _find_stage2_worker(pgid)
            if w is not None:
                os.kill(w, signal.SIGKILL)
                killed = w
                break
            time.sleep(0.05)
        res = _wait_parse(p)
        if killed is None:
            continue  # run finished before a worker appeared; retry
        summary["worker_kill"] = {
            "killed_pid": killed,
            "driver_exit": p.returncode,
            "digests_equal": _digests(wk_dir) == ref_dig,
            "attempts": attempt + 1,
            **(res or {}),
        }
        break
    else:
        summary["worker_kill"] = {"killed_pid": None,
                                  "note": "no stage-2 window hit in 3 tries"}

    # --- 2b. stage-1 (split/read) worker kill ----------------------------
    for attempt in range(3):
        s1_dir = os.path.join(scratch, "s1kill")
        shutil.rmtree(s1_dir, ignore_errors=True)
        p = _spawn(in_dir, s1_dir, n_parts)
        pgid = os.getpgid(p.pid)
        killed = None
        deadline = time.time() + 600
        while p.poll() is None and time.time() < deadline:
            w = _find_worker(pgid, "_split_one")
            if w is not None:
                os.kill(w, signal.SIGKILL)
                killed = w
                break
            time.sleep(0.02)
        res = _wait_parse(p)
        if killed is None:
            continue
        summary["stage1_kill"] = {
            "killed_pid": killed,
            "driver_exit": p.returncode,
            "digests_equal": _digests(s1_dir) == ref_dig,
            "attempts": attempt + 1,
            **(res or {}),
        }
        break
    else:
        summary["stage1_kill"] = {"killed_pid": None,
                                  "note": "no stage-1 window hit in 3 tries"}

    # --- 3. driver kill + resume -----------------------------------------
    for attempt in range(3):
        dk_dir = os.path.join(scratch, "dkill")
        shutil.rmtree(dk_dir, ignore_errors=True)
        p = _spawn(in_dir, dk_dir, n_parts)
        man = os.path.join(dk_dir, "_manifests")
        deadline = time.time() + 600
        killed_mid = False
        while p.poll() is None and time.time() < deadline:
            n_done = len(glob.glob(os.path.join(man, "*.json")))
            if n_done >= 2:
                _killpg(p)
                killed_mid = True
                break
            time.sleep(0.02)
        p.wait()
        if not killed_mid:
            continue  # finished before 2 commits; retry with fresh dir
        committed = len(glob.glob(os.path.join(man, "*.json")))
        p2 = _spawn(in_dir, dk_dir, n_parts)
        res2 = _wait_parse(p2)
        summary["driver_kill"] = {
            "committed_at_kill": committed,
            "resume_exit": p2.returncode,
            "resume": res2,
            "digests_equal": _digests(dk_dir) == ref_dig,
            "attempts": attempt + 1,
            "resume_skipped_some": bool(res2 and res2["parts_skipped"] >= 1),
            "resume_built_rest": bool(
                res2 and res2["parts_built"] + res2["parts_skipped"]
                == res2["parts_total"] and res2["parts_built"] >= 1
            ),
        }
        break
    else:
        summary["driver_kill"] = {"note": "never killed mid-run in 3 tries"}

    ok = (
        summary["reference"]["ok"]
        and summary.get("worker_kill", {}).get("digests_equal") is True
        and summary.get("worker_kill", {}).get("driver_exit") == 0
        # stage-1 windows are short; a missed window is not a failure,
        # but a HIT window must converge byte-identically
        and (summary.get("stage1_kill", {}).get("killed_pid") is None
             or (summary["stage1_kill"].get("digests_equal") is True
                 and summary["stage1_kill"].get("driver_exit") == 0))
        and summary.get("driver_kill", {}).get("digests_equal") is True
        and summary.get("driver_kill", {}).get("resume_skipped_some") is True
        and summary.get("driver_kill", {}).get("resume_built_rest") is True
    )
    summary["ok"] = ok
    return summary


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    bench = "--bench" in sys.argv
    if bench:
        n_convs, files, n_parts = 800_000, 32, 64
        scratch = "/tmp/sits_ray_chaos_bench"
    else:
        n_convs, files, n_parts = 4_000, 8, 16
        scratch = "/tmp/sits_ray_chaos_small"
    os.makedirs(scratch, exist_ok=True)
    s = run_chaos(n_convs, files, n_parts, scratch)
    print(json.dumps(s), flush=True)
    sys.exit(0 if s["ok"] else 1)


if __name__ == "__main__":
    main()
