"""Reference path: yargy/tokenizer (tokenizer.py:10-126)."""

from yargy_ray.kernel.tokenizer import (  # noqa: F401
    EMAIL_RULE,
    PHONE_RULE,
    MorphTokenizer,
    Tokenizer,
)
