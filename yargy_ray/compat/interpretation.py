"""Reference path: yargy/interpretation (fact.py, normalizer.py)."""

from yargy_ray.kernel.interp import (  # noqa: F401
    attribute,
    const,
    custom,
    fact,
    inflected,
    normalized,
)
