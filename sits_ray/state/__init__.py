from sits_ray.state.manifest import Manifest, PartEntry  # noqa: F401
