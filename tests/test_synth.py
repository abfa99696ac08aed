import numpy as np
import pyarrow as pa

from sits_ray.synth import generate_transcripts, write_transcripts


def test_schema_and_determinism():
    t1 = generate_transcripts(n_convs=20, mean_turns=10, seed=42)
    t2 = generate_transcripts(n_convs=20, mean_turns=10, seed=42)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t1.schema.field("turn_idx").type == pa.int32()
    assert t1.schema.field("ts").type == pa.timestamp("us")
    assert t1.equals(t2)
    t3 = generate_transcripts(n_convs=20, mean_turns=10, seed=43)
    assert not t1.equals(t3)


def test_invariants():
    t = generate_transcripts(n_convs=30, mean_turns=15, seed=42).to_pandas()
    # turn_idx contiguous & unique per conv; ts strictly increasing with turn_idx
    for _, g in t.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert (g["turn_idx"].to_numpy() == np.arange(len(g))).all()
        ts = g["ts"].astype("int64").to_numpy()
        assert (np.diff(ts) > 0).all() or len(g) == 1
    # mega conversation: conv00000000 holds a large share of turns
    share = (t["conv_id"] == "conv00000000").mean()
    assert share > 0.2
    # there is at least one single-turn conv and one >1h gap
    sizes = t.groupby("conv_id").size()
    assert (sizes == 1).any()
    gaps = t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"].diff()
    assert (gaps.dt.total_seconds() > 3600).any()


def test_write_idempotent(tmp_path):
    d = str(tmp_path / "t")
    write_transcripts(d, n_convs=10, mean_turns=5, files=2)
    import os

    files = sorted(os.listdir(d))
    write_transcripts(d, n_convs=10, mean_turns=5, files=2)  # no-op
    assert sorted(os.listdir(d)) == files


def test_dup_turns():
    t = generate_transcripts(n_convs=10, mean_turns=5, seed=42, dup_turns=7)
    base = generate_transcripts(n_convs=10, mean_turns=5, seed=42)
    assert t.num_rows == base.num_rows + 7
