"""Debug-surface tests: DOT source rendering + chart pretty-printing
(reference: dot.py, rule/transformators.py:413-539, parser.py:107-124)."""

from yargy_ray.kernel import fact, or_, rule
from yargy_ray.kernel.dot import bnf_as_dot, rule_as_dot, tree_as_dot
from yargy_ray.kernel.earley import Parser
from yargy_ray.kernel.predicates import eq, type_


def grammar():
    F = fact('F', ['x'])
    return or_(
        rule(eq('a'), eq('b').optional().interpretation(F.x)),
        rule(type_('INT')),
    ).named('TOP').interpretation(F)


def test_rule_as_dot():
    src = rule_as_dot(grammar())
    assert src.startswith('digraph G {') and src.endswith('}')
    assert 'Named(TOP)' in src
    assert 'Or' in src
    # predicate leaves render with their labels
    assert "eq('a')" in src or 'a' in src
    # every edge references defined nodes
    lines = src.splitlines()
    defined = {ln.split(' ')[0] for ln in lines if '[label=' in ln}
    for ln in lines:
        if '->' in ln:
            a, b = ln.rstrip(';').split(' -> ')
            assert a in defined and b in defined


def test_bnf_as_dot_and_shared_nodes():
    parser = Parser(grammar())
    src = bnf_as_dot(parser.rule)
    assert src.startswith('digraph G {')
    assert 'Production' in src
    assert src.count('->') >= 4


def test_tree_as_dot():
    parser = Parser(grammar())
    trees = parser.trees('a b')
    assert trees
    src = tree_as_dot(trees[0])
    assert 'digraph G' in src
    assert "'a'" in src        # leaf carries the token value


def test_chart_explain():
    parser = Parser(grammar())
    dump = parser.explain('a b')
    # one section per column: 0 (no token) + 2 tokens
    assert dump.count('----------------') == 3
    assert '·' in dump         # dotted productions
    # start rule shows under its interpretator label
    assert 'F' in dump and '->' in dump


def test_dot2svg_gated():
    import shutil

    import pytest
    from yargy_ray.kernel.dot import dot2svg
    if shutil.which('dot') is None:
        with pytest.raises(RuntimeError):
            dot2svg('digraph G {}')
    else:
        assert '<svg' in dot2svg('digraph G {}')
