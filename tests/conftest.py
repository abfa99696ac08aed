import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_dir(tmp_path_factory):
    """Unit-scale deterministic transcripts parquet (FIXTURES.md Table 1)."""
    from sits_ray.synth import write_transcripts

    d = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts(d, n_convs=50, mean_turns=25, seed=42, files=4, dup_turns=0)
    return d
