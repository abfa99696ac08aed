from sits_ray.pipelines.flagship import run_flagship  # noqa: F401
