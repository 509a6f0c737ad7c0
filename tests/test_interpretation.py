"""Interpretation conformance (reference: tests/test_interpretation.py)."""

import pytest

from yargy_ray.kernel import Parser, attribute, fact, rule
from yargy_ray.kernel.gazetteer import morph_pipeline
from yargy_ray.kernel.interp import const, custom, inflected, normalized
from yargy_ray.kernel.predicates import eq


def test_predicate_attribute():
    F = fact('F', ['a'])
    parser = Parser(rule(eq('a').interpretation(F.a)).interpretation(F))
    record = parser.match('a').fact
    assert record == F(a='a')
    assert record.spans == [(0, 1)]
    assert record.as_json == {'a': 'a'}


def test_merge_facts():
    F = fact('F', ['a', 'b'])
    A = rule(eq('a').interpretation(F.a)).interpretation(F)
    B = rule(eq('b').interpretation(F.b)).interpretation(F)
    parser = Parser(rule(A, B).interpretation(F))
    record = parser.match('a b').fact
    assert record == F(a='a', b='b')
    assert record.spans == [(0, 1), (2, 3)]
    assert record.as_json == {'a': 'a', 'b': 'b'}


def test_rule_attribute():
    F = fact('F', ['a'])
    parser = Parser(rule('a', 'A').interpretation(F.a).interpretation(F))
    record = parser.match('a   A').fact
    assert record == F(a='a A')
    assert record.spans == [(0, 5)]
    assert record.as_json == {'a': 'a A'}


def test_attribute_shadowing():
    F = fact('F', ['a', 'b'])
    parser = Parser(
        rule(eq('a').interpretation(F.a)).interpretation(F.b).interpretation(F))
    record = parser.match('a').fact
    assert record == F(a=None, b='a')
    assert record.spans == [(0, 1)]
    assert record.as_json == {'b': 'a'}


def test_nested_facts():
    F = fact('F', ['a'])
    G = fact('G', ['b'])
    parser = Parser(
        rule(eq('a').interpretation(F.a))
        .interpretation(F).interpretation(G.b).interpretation(G))
    record = parser.match('a').fact
    assert record == G(b=F(a='a'))
    assert record.spans == [(0, 1)]
    assert record.as_json == {'b': {'a': 'a'}}


def test_custom_chains():
    F = fact('F', ['a'])
    parser = Parser(
        rule('1').interpretation(custom(int)).interpretation(F.a)
        .interpretation(F))
    assert parser.match('1').fact == F(a=1)

    parser = Parser(
        rule('1').interpretation(F.a).interpretation(custom(int)))
    assert parser.match('1').fact == 1

    parser = Parser(rule('3', '.', '14').interpretation(custom(float)))
    assert parser.match('3.14').fact == 3.14

    mapping = {'a': 1}
    parser = Parser(
        rule('A').interpretation(custom(str.lower).custom(mapping.get)))
    assert parser.match('A').fact == 1


def test_morph_normalizers():
    assert Parser(
        rule('московским').interpretation(normalized())
    ).match('московским').fact == 'московский'

    assert Parser(
        rule('московским').interpretation(inflected({'nomn', 'femn'}))
    ).match('московским').fact == 'московская'

    months = {'январь': 1}
    assert Parser(
        rule('январе').interpretation(normalized().custom(months.get))
    ).match('январе').fact == 1

    assert Parser(
        rule('январе').interpretation(inflected({'nomn', 'sing'}).custom(months.get))
    ).match('январе').fact == 1


def test_const():
    assert Parser(rule('a').interpretation(const(1))).match('a').fact == 1

    F = fact('F', 'a')
    assert Parser(
        rule('январь').interpretation(F.a.const(1))).match('январь').fact == 1


def test_attribute_pipes():
    F = fact('F', 'a')
    months = {'январь': 1}

    assert Parser(
        rule('январе').interpretation(F.a.inflected({'nomn', 'sing'})
                                      .custom(months.get)).interpretation(F)
    ).match('январе').fact == F(a=1)

    assert Parser(
        rule('январе').interpretation(F.a.normalized().custom(months.get))
        .interpretation(F)
    ).match('январе').fact == F(a=1)

    record = Parser(
        rule('январе').interpretation(F.a.normalized()).interpretation(F)
    ).match('январе').fact
    assert record == F(a='январь')
    assert record.spans == [(0, 6)]
    assert record.as_json == {'a': 'январь'}

    record = Parser(
        rule('январе').interpretation(F.a.inflected({'nomn', 'plur'}))
        .interpretation(F)
    ).match('январе').fact
    assert record == F(a='январи')

    record = Parser(
        rule('1').interpretation(F.a.custom(int)).interpretation(F)
    ).match('1').fact
    assert record == F(a=1)
    assert record.as_json == {'a': 1}

    mapping = {'a': 1}
    record = Parser(
        rule('A').interpretation(F.a.custom(str.lower).custom(mapping.get))
        .interpretation(F)
    ).match('A').fact
    assert record == F(a=1)


def test_bare_attribute():
    F = fact('F', 'a')
    assert Parser(rule('a').interpretation(F.a)).match('a').fact == 'a'


def test_repeatable_attribute():
    F = fact('F', [attribute('a').repeatable()])
    parser = Parser(
        rule(eq('a').interpretation(F.a), eq('b').interpretation(F.a))
        .interpretation(F))
    record = parser.match('a b').fact
    assert record == F(a=['a', 'b'])
    assert record.spans == [(0, 1), (2, 3)]
    assert record.as_json == {'a': ['a', 'b']}


def test_type_errors():
    F = fact('F', ['a'])
    parser = Parser(
        rule('a', eq('1').interpretation(custom(int))).interpretation(F.a))
    match = parser.match('a 1')
    with pytest.raises(TypeError):
        match.fact

    parser = Parser(
        rule('a', eq('1').interpretation(custom(int)))
        .interpretation(custom(str)))
    match = parser.match('a 1')
    with pytest.raises(TypeError):
        match.fact


def test_pipeline_key():
    gaz = morph_pipeline(['закрытое общество', 'завод'])
    F = fact('F', ['a'])

    parser = Parser(gaz.interpretation(F.a.normalized()).interpretation(F))
    assert parser.match('закрытом обществе').fact == F(a='закрытое общество')

    parser = Parser(gaz.interpretation(normalized()))
    assert parser.match('заводе').fact == 'завод'
