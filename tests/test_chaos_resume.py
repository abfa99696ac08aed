"""Literal kill-and-resume chaos (SURVEY §7.2 item 9): SIGKILL a
stage-2 worker and SIGKILL a mid-run driver, assert byte-identical
tiers and partition-granular resume. Runs tools/chaos_resume.py in
small mode — each driver is its own subprocess with its own local Ray
session, so the pytest session fixture is untouched."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_chaos_kill_and_resume(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, CHAOS_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "chaos_resume.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1]
    s = json.loads(line)
    assert s["reference"]["ok"], s
    wk = s["worker_kill"]
    assert wk.get("killed_pid"), f"no worker killed: {s}"
    assert wk["driver_exit"] == 0 and wk["digests_equal"], s
    dk = s["driver_kill"]
    assert dk.get("digests_equal") is True, s
    assert dk["resume_skipped_some"] and dk["resume_built_rest"], s
    assert s["ok"] and out.returncode == 0
