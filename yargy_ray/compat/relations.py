"""Reference path: yargy/relations (relations/__init__.py exports)."""

from yargy_ray.kernel.grammar import main  # noqa: F401
from yargy_ray.kernel.relations import (  # noqa: F401
    AndRelation,
    NotRelation,
    OrRelation,
    Relation,
    case_relation,
    gender_relation,
    gnc_relation,
    is_relation,
    number_relation,
)
