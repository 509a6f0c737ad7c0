"""Differential fuzzing vs the actual reference parser.

Hypothesis generates random grammar ASTs (sequences, alternations,
optional, bounded repeats over eq/caseless/type predicates) and random
token texts; the same AST is built through OUR DSL and the REFERENCE's
DSL and ``findall`` span sets must be identical. This pins the entire
compile-parse-resolve path (5-pass normalization, BNF lifting, Earley,
tree ranking, span DP) against the reference on inputs nobody
hand-picked. Derandomized so CI is stable.

Skipped when the reference checkout is absent.
"""

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'yargy')),
    reason='reference repo not available')


# -- grammar spec AST (backend-neutral) ------------------------------------

WORDS = ['a', 'b', 'c', 'A', '1', '2', '.']

_base_pred = st.one_of(
    st.tuples(st.just('eq'), st.sampled_from(WORDS)),
    st.tuples(st.just('caseless'), st.sampled_from(['a', 'b', 'c'])),
    st.tuples(st.just('type'), st.sampled_from(['INT', 'RU', 'LATIN'])),
)

pred_spec = st.one_of(
    _base_pred,
    st.tuples(st.just('and'), st.lists(_base_pred, min_size=2, max_size=2)),
    st.tuples(st.just('not'), _base_pred),
)

PHRASES = [['a', 'b'], ['1'], ['xx', '77'], ['c']]


def rule_spec(depth):
    if depth == 0:
        return st.tuples(st.just('pred'), pred_spec)
    sub = rule_spec(depth - 1)
    return st.one_of(
        st.tuples(st.just('pred'), pred_spec),
        st.tuples(st.just('seq'), st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just('or'), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just('opt'), sub),
        st.tuples(st.just('rep'), sub, st.integers(1, 3)),
        st.tuples(st.just('gaz'),
                  st.lists(st.sampled_from(range(len(PHRASES))),
                           min_size=1, max_size=3, unique=True)),
    )


# top level: a non-nullable anchor predicate then an arbitrary tail, so
# the grammar can never derive the empty string
grammar_spec = st.tuples(pred_spec, st.lists(rule_spec(2), max_size=2))

texts = st.lists(st.sampled_from(WORDS + ['xx', '77']),
                 min_size=0, max_size=8).map(' '.join)


def build(spec, ns):
    kind = spec[0]
    if kind == 'pred':
        return build_pred(spec[1], ns)
    if kind == 'seq':
        return ns['rule'](*[build(s, ns) for s in spec[1]])
    if kind == 'or':
        return ns['or_'](*[ns['rule'](build(s, ns)) for s in spec[1]])
    if kind == 'opt':
        return ns['rule'](build(spec[1], ns)).optional()
    if kind == 'rep':
        return ns['rule'](build(spec[1], ns)).repeatable(max=spec[2])
    if kind == 'gaz':
        return ns['pipeline']([' '.join(PHRASES[i]) for i in spec[1]])
    raise ValueError(spec)


def build_pred(pspec, ns):
    name, arg = pspec
    if name == 'and':
        return ns['and_'](*[build_pred(p, ns) for p in arg])
    if name == 'not':
        return ns['not_'](build_pred(arg, ns))
    return ns[name](arg)


def build_grammar(gspec, ns):
    anchor, tail = gspec
    items = [build_pred(anchor, ns)] + [build(s, ns) for s in tail]
    return ns['rule'](*items)


def _our_ns():
    from yargy_ray.kernel import and_, not_, or_, rule
    from yargy_ray.kernel.gazetteer import pipeline
    from yargy_ray.kernel.predicates import caseless, eq, type_
    return {'rule': rule, 'or_': or_, 'and_': and_, 'not_': not_,
            'eq': eq, 'caseless': caseless, 'type': type_,
            'pipeline': pipeline}


def _ref_ns():
    sys.path.insert(0, REFERENCE)
    from yargy.api import and_, not_, or_, rule
    from yargy.pipelines import pipeline
    from yargy.predicates import caseless, eq, type
    return {'rule': rule, 'or_': or_, 'and_': and_, 'not_': not_,
            'eq': eq, 'caseless': caseless, 'type': type,
            'pipeline': pipeline}


def _our_parser(gspec):
    from yargy_ray.kernel import Parser
    from yargy_ray.kernel.tokenizer import Tokenizer
    return Parser(build_grammar(gspec, _our_ns()), tokenizer=Tokenizer())


def _ref_parser(gspec):
    ns = _ref_ns()
    from yargy import Parser
    from yargy.tokenizer import Tokenizer
    return Parser(build_grammar(gspec, ns), tokenizer=Tokenizer())


@settings(max_examples=150, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(gspec=grammar_spec, text=texts)
def test_findall_spans_match_reference(gspec, text):
    ours = {(m.span.start, m.span.stop, tuple(t.value for t in m.tokens))
            for m in _our_parser(gspec).findall(text)}
    ref = {(m.span.start, m.span.stop, tuple(t.value for t in m.tokens))
           for m in _ref_parser(gspec).findall(text)}
    assert ours == ref


# -- morphology-path fuzz (MorphTokenizer + gram/dictionary predicates) ----

MORPH_WORDS = [
    'сталь', 'стали', 'стал', 'сирота', 'сироты', 'диск', 'диска',
    'александр', 'александру', 'московский', 'московского', 'саша',
    'саши', 'иванов', 'иванову', 'январе', 'январь', 'директор',
    'директором', 'слово', 'слова', '7', '.',
]
GRAMS = ['Name', 'Surn', 'NOUN', 'ADJF', 'sing', 'plur', 'nomn', 'gent']
DICTS = [['сталь', 'январь'], ['директор'], ['московский', 'слово']]

morph_pred = st.one_of(
    st.tuples(st.just('eq'), st.sampled_from(MORPH_WORDS[:8])),
    st.tuples(st.just('gram'), st.sampled_from(GRAMS)),
    st.tuples(st.just('dictionary'),
              st.sampled_from(range(len(DICTS)))),
    st.tuples(st.just('normalized'), st.sampled_from(
        ['сталь', 'саша', 'январь', 'директор'])),
)


def morph_rule_spec(depth):
    if depth == 0:
        return st.tuples(st.just('pred'), morph_pred)
    sub = morph_rule_spec(depth - 1)
    return st.one_of(
        st.tuples(st.just('pred'), morph_pred),
        st.tuples(st.just('seq'), st.lists(sub, min_size=1, max_size=2)),
        st.tuples(st.just('or'), st.lists(sub, min_size=2, max_size=2)),
        st.tuples(st.just('opt'), sub),
        st.tuples(st.just('rep'), sub, st.integers(1, 2)),
    )


morph_grammar_spec = st.tuples(morph_pred,
                               st.lists(morph_rule_spec(1), max_size=2))
morph_texts = st.lists(st.sampled_from(MORPH_WORDS),
                       min_size=0, max_size=6).map(' '.join)


def build_morph_pred(pspec, ns):
    name, arg = pspec
    if name == 'dictionary':
        return ns['dictionary'](DICTS[arg])
    return ns[name](arg)


def _morph_build(spec, ns):
    kind = spec[0]
    if kind == 'pred':
        return build_morph_pred(spec[1], ns)
    if kind == 'seq':
        return ns['rule'](*[_morph_build(s, ns) for s in spec[1]])
    if kind == 'or':
        return ns['or_'](*[ns['rule'](_morph_build(s, ns))
                           for s in spec[1]])
    if kind == 'opt':
        return ns['rule'](_morph_build(spec[1], ns)).optional()
    if kind == 'rep':
        return ns['rule'](_morph_build(spec[1], ns)).repeatable(max=spec[2])
    raise ValueError(spec)


def _morph_grammar(gspec, ns):
    anchor, tail = gspec
    items = [build_morph_pred(anchor, ns)] + [
        _morph_build(s, ns) for s in tail]
    return ns['rule'](*items)


def _our_morph_parser(gspec):
    from yargy_ray.kernel import Parser, and_, not_, or_, rule
    from yargy_ray.kernel.predicates import (
        dictionary, eq, gram, normalized,
    )
    ns = {'rule': rule, 'or_': or_, 'and_': and_, 'not_': not_, 'eq': eq,
          'gram': gram, 'dictionary': dictionary, 'normalized': normalized}
    return Parser(_morph_grammar(gspec, ns))


def _ref_morph_parser(gspec):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'scripts'))
    import reference_parity_morph as harness
    harness.install_fake_pymorphy2()
    sys.path.insert(0, REFERENCE)
    from yargy import Parser
    from yargy.api import and_, not_, or_, rule
    from yargy.predicates import dictionary, eq, gram, normalized
    ns = {'rule': rule, 'or_': or_, 'and_': and_, 'not_': not_, 'eq': eq,
          'gram': gram, 'dictionary': dictionary, 'normalized': normalized}
    return Parser(_morph_grammar(gspec, ns))


@settings(max_examples=120, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(gspec=morph_grammar_spec, text=morph_texts)
def test_morph_findall_matches_reference(gspec, text):
    ours = {(m.span.start, m.span.stop, tuple(t.value for t in m.tokens))
            for m in _our_morph_parser(gspec).findall(text)}
    ref = {(m.span.start, m.span.stop, tuple(t.value for t in m.tokens))
           for m in _ref_morph_parser(gspec).findall(text)}
    assert ours == ref
