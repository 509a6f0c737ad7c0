"""Reference path: yargy/predicates (bank list at predicates/bank.py:18-38)."""

from yargy_ray.kernel.predicates import (  # noqa: F401
    caseless,
    custom,
    dictionary,
    eq,
    gram,
    gte,
    in_,
    in_caseless,
    is_capitalized,
    is_lower,
    is_single,
    is_title,
    is_upper,
    length_eq,
    lte,
    normalized,
    tag,
    true,
)
from yargy_ray.kernel.predicates import type_ as type  # noqa: F401,A001
