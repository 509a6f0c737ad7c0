"""Drop-in import compatibility with the reference package layout.

A user of the reference can switch by replacing ``yargy`` with
``yargy_ray.compat`` in imports — every public name keeps its
reference path and meaning (reference surface: yargy/__init__.py,
yargy/api.py):

    from yargy_ray.compat import rule, or_, Parser
    from yargy_ray.compat.predicates import eq, gram, type
    from yargy_ray.compat.interpretation import fact, inflected
    from yargy_ray.compat.pipelines import morph_pipeline
    from yargy_ray.compat.relations import gnc_relation, main
    from yargy_ray.compat.tokenizer import MorphTokenizer

The engine-side Ray stages live outside this namespace on purpose; the
compat layer is the per-document kernel only.
"""

from yargy_ray.kernel import (  # noqa: F401
    Parser,
    and_,
    empty,
    forward,
    not_,
    or_,
    rule,
)
