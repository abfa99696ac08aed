"""Pure numpy kernels (no Ray). Each mirrors a reference C++/R kernel's
semantics (cited per function) and doubles as the single-process test
oracle, following the reference's own test pattern
(``tests/testthat/test-reduce.R:29-34`` calls ``C_temp_*`` directly)."""

from sits_ray.kernels.gapfill import linear_interp, mask_na, fill_na  # noqa: F401
from sits_ray.kernels.reduce import TEMPORAL_REDUCERS  # noqa: F401
from sits_ray.kernels.rolling import ROLLING_KERNELS  # noqa: F401
