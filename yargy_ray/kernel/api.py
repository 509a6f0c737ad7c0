"""User-facing grammar API — mirrors the reference surface.

``rule`` / ``or_`` / ``and_`` / ``not_`` / ``forward`` / ``empty`` /
``main`` plus ``Parser`` (reference: /root/reference/yargy/api.py).
"""

from __future__ import annotations

from . import predicates as P
from .earley import Context, Match, Parser, StateOverflow
from .gazetteer import caseless_pipeline, morph_pipeline, pipeline
from .grammar import (
    EmptyNode,
    GrammarNode,
    Main,
    alt,
    forward,
    seq,
)
from .relations import (
    AndRelation,
    NotRelation,
    OrRelation,
    is_relation,
)

__all__ = [
    'rule', 'or_', 'and_', 'not_', 'forward', 'empty', 'main',
    'Parser', 'Match', 'Context', 'StateOverflow',
    'pipeline', 'caseless_pipeline', 'morph_pipeline',
]

rule = seq
empty = EmptyNode


def main(term):
    return Main(term)


def or_(*items):
    if all(P.is_predicate(i) for i in items):
        return P.OrPredicate(items)
    if all(is_relation(i) for i in items):
        return OrRelation(items)
    if all(isinstance(i, GrammarNode) for i in items):
        return alt(*items)
    raise TypeError('mixed or_ arguments: %r' % [type(i) for i in items])


def and_(*items):
    if all(P.is_predicate(i) for i in items):
        return P.AndPredicate(items)
    if all(is_relation(i) for i in items):
        return AndRelation(items)
    raise TypeError('mixed and_ arguments: %r' % [type(i) for i in items])


def not_(item):
    if P.is_predicate(item):
        return P.NotPredicate(item)
    if is_relation(item):
        return NotRelation(item)
    raise TypeError(type(item))
