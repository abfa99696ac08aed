import pandas as pd
import pytest

from sits_ray.pipelines.flagship import read_tier, read_tier_blocks, run_flagship
from sits_ray.synth import write_transcripts_scaled

SORT = ["conv_id", "bucket_ts"]


def test_block_store_decodes_to_long(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rb_in"))
    write_transcripts_scaled(d, n_convs=30, mean_turns=20, seed=42, files=3)
    out = str(tmp_path_factory.mktemp("rb_out"))
    run_flagship(d, out, tiers=("1h",), n_parts=4)
    a = (
        read_tier(out, "1h").to_pandas().sort_values(SORT).reset_index(drop=True)
    )
    b = read_tier_blocks(out, "1h", concurrency=1).to_pandas()
    b = b[a.columns.tolist()].sort_values(SORT).reset_index(drop=True)
    a["part_id"] = a["part_id"].astype("int32")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
