"""Idempotent resume: interrupt a run (simulated by deleting a subset of
partition outputs + their manifest entries), re-run, and require BYTE-
IDENTICAL tier files vs an uninterrupted run (SURVEY.md §7.9)."""

import glob
import hashlib
import os
import shutil

import pytest

from sits_ray.pipelines.flagship import run_flagship
from sits_ray.state.manifest import Manifest
from sits_ray.synth import write_transcripts_scaled

TIERS = ("1m", "1h")


def _tree_hashes(root):
    out = {}
    for f in sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)):
        rel = os.path.relpath(f, root)
        out[rel] = hashlib.blake2b(open(f, "rb").read(), digest_size=16).hexdigest()
    return out


@pytest.fixture(scope="module")
def in_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume_in"))
    write_transcripts_scaled(d, n_convs=40, mean_turns=20, seed=42, files=4)
    return d


def test_interrupted_rerun_is_byte_identical(ray_session, in_dir, tmp_path):
    ref_out = str(tmp_path / "ref")
    run_flagship(in_dir, ref_out, tiers=TIERS, n_parts=8)
    ref = _tree_hashes(ref_out)
    assert ref

    crash_out = str(tmp_path / "crash")
    run_flagship(in_dir, crash_out, tiers=TIERS, n_parts=8)
    # simulate a crash that lost 3 partitions mid-write: outputs gone,
    # manifests gone (write-then-manifest ordering guarantees a manifest
    # never exists without its files)
    m = Manifest(crash_out)
    victims = sorted({e.part_id for e in m.entries()})[:3]
    m.invalidate(set(victims), TIERS)
    for tier in TIERS:
        for p in victims:
            shutil.rmtree(
                os.path.join(crash_out, "long", f"tier={tier}", f"part_id={p}"),
                ignore_errors=True,
            )
            shutil.rmtree(
                os.path.join(crash_out, "blocks", f"tier={tier}", f"part_id={p}"),
                ignore_errors=True,
            )
    res = run_flagship(in_dir, crash_out, tiers=TIERS, n_parts=8)
    assert res["parts_built"] == len(victims)
    assert _tree_hashes(crash_out) == ref


def test_partial_file_without_manifest_is_rebuilt(ray_session, in_dir, tmp_path):
    """A torn partition (files present, manifest missing) must be rebuilt
    and converge to the same bytes."""
    out = str(tmp_path / "torn")
    run_flagship(in_dir, out, tiers=TIERS, n_parts=8)
    ref = _tree_hashes(out)
    m = Manifest(out)
    victim = m.entries()[0].part_id
    # corrupt the partition's long file AND drop its manifest (torn write)
    f = glob.glob(os.path.join(out, "long", "tier=1m", f"part_id={victim}", "*.parquet"))[0]
    with open(f, "wb") as fh:
        fh.write(b"torn")
    m.invalidate({victim}, TIERS)
    res = run_flagship(in_dir, out, tiers=TIERS, n_parts=8)
    assert res["parts_built"] == 1
    assert _tree_hashes(out) == ref
