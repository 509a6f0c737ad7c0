# CONFORMANCE CORPUS — intentionally mirrors the reference test
# file natasha/yargy v0.16.0 tests/test_tokenizer.py (token-stream goldens).
# The fixtures ARE the public conformance surface this engine is
# pinned to (SURVEY.md §5); the implementation under test is a
# from-scratch reimplementation, not a copy.
"""Tokenizer conformance (reference: tests/test_tokenizer.py)."""

import pytest

from yargy_ray.kernel import MorphTokenizer, Tokenizer
from yargy_ray.kernel.records import Span, Token, join_tokens
from yargy_ray.kernel.tokenizer import EMAIL_RULE, EOL, INT, LATIN, OTHER, PUNCT, RU


def test_types():
    tokenizer = Tokenizer()
    assert list(tokenizer('Ростов-на-Дону')) == [
        Token('Ростов', Span(0, 6), RU),
        Token('-', Span(6, 7), PUNCT),
        Token('на', Span(7, 9), RU),
        Token('-', Span(9, 10), PUNCT),
        Token('Дону', Span(10, 14), RU),
    ]
    assert list(tokenizer('vk.com')) == [
        Token('vk', Span(0, 2), LATIN),
        Token('.', Span(2, 3), PUNCT),
        Token('com', Span(3, 6), LATIN),
    ]
    assert list(tokenizer('1 500 000$')) == [
        Token('1', Span(0, 1), INT),
        Token('500', Span(2, 5), INT),
        Token('000', Span(6, 9), INT),
        Token('$', Span(9, 10), PUNCT),
    ]
    assert list(tokenizer('π')) == [Token('π', Span(0, 1), OTHER)]


def test_span_tuple_equality():
    assert Span(0, 6) == (0, 6)
    assert Span(0, 6) < Span(1, 2)


def test_check_type():
    tokenizer = Tokenizer()
    with pytest.raises(ValueError):
        tokenizer.check_type('UNK')
    trimmed = tokenizer.remove_types(EOL)
    with pytest.raises(ValueError):
        trimmed.check_type(EOL)


def test_change_rules():
    assert Tokenizer().add_rules(EMAIL_RULE).split('mailto:me@host.ru') == [
        'mailto', ':', 'me@host.ru']
    assert Tokenizer().remove_types(EOL).split('\nhi,\n\nthe\n') == [
        'hi', ',', 'the']


def test_morph_tokens():
    tokenizer = MorphTokenizer()
    tokens = list(tokenizer('dvd-диски'))
    assert [t.value for t in tokens] == ['dvd', '-', 'диски']
    forms = tokens[2].forms
    assert {(f.normalized, frozenset(f.grams.values)) for f in forms} == {
        ('диск', frozenset({'NOUN', 'accs', 'inan', 'masc', 'plur'})),
        ('диск', frozenset({'NOUN', 'inan', 'masc', 'nomn', 'plur'})),
    }


def test_join_tokens():
    tokenizer = Tokenizer()
    assert join_tokens(tokenizer('pi =        3.14')) == 'pi = 3.14'
