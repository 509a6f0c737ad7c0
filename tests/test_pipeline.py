# CONFORMANCE CORPUS — intentionally mirrors the reference test
# file natasha/yargy v0.16.0 tests/test_pipeline.py (gazetteer golden texts and expected spans).
# The fixtures ARE the public conformance surface this engine is
# pinned to (SURVEY.md §5); the implementation under test is a
# from-scratch reimplementation, not a copy.
"""Gazetteer conformance (reference: tests/test_pipeline.py)."""

from yargy_ray.kernel import Parser, rule
from yargy_ray.kernel.gazetteer import (
    caseless_pipeline,
    morph_pipeline,
    pipeline,
)


def test_exact():
    parser = Parser(rule(pipeline(['a b c', 'b c']), 'd'))
    assert parser.match('b c d')
    assert parser.match('a b c d')


def test_repeatable():
    parser = Parser(rule(pipeline(['a b']).repeatable(), 'c'))
    assert parser.match('a b a b c')


def test_caseless():
    parser = Parser(rule(caseless_pipeline(['A B']), 'c'))
    assert parser.match('A b c')


def test_morph_longest_match():
    parser = Parser(morph_pipeline([
        'текст', 'текст песни', 'материал', 'информационный материал']))

    matches = list(parser.findall('текстом песни музыкальной группы'))
    assert len(matches) == 1
    assert [t.value for t in matches[0].tokens] == ['текстом', 'песни']

    matches = list(parser.findall('информационного материала под названием'))
    assert len(matches) == 1
    assert [t.value for t in matches[0].tokens] == [
        'информационного', 'материала']


def test_mixed_type_key():
    parser = Parser(morph_pipeline(['1 B.']))
    assert parser.match('1 b .')
