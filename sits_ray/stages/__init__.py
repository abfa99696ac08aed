from sits_ray.stages.regularize import (  # noqa: F401
    TIER_WIDTH_US,
    prepare_turns,
    rollup_nested,
    nested_to_long,
    rollup_tiers,
)
from sits_ray.stages.compressor import GorillaEncode, GorillaDecode  # noqa: F401
