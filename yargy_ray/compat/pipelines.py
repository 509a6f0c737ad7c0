"""Reference path: yargy/pipelines (pipelines.py:16-75)."""

from yargy_ray.kernel.gazetteer import (  # noqa: F401
    caseless_pipeline,
    morph_pipeline,
    pipeline,
)
