"""Reference path: yargy/tagger (tagger.py:3-32)."""

from yargy_ray.kernel.tagging import (  # noqa: F401
    PassTagger,
    Tagger,
    TaggerChain,
)
