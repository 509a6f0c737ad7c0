# CONFORMANCE CORPUS — intentionally mirrors the reference test
# file natasha/yargy v0.16.0 tests/test_morph.py (morphology goldens, re-pinned to the embedded lexicon).
# The fixtures ARE the public conformance surface this engine is
# pinned to (SURVEY.md §5); the implementation under test is a
# from-scratch reimplementation, not a copy.
"""Morphology backend conformance (reference: tests/test_morph.py)."""

import pytest

from yargy_ray.kernel.morpho import LexiconAnalyzer


@pytest.fixture(scope='module')
def morph():
    return LexiconAnalyzer()


def test_parse(morph):
    forms = morph('сирота')
    form = forms[0]
    assert form.normalized == 'сирота'
    assert form.grams.gender.bi
    assert form.grams.number.single
    assert not form.grams.case.fixed

    assert morph.normalized('стали') == {'сталь', 'стать'}


def test_inflect(morph):
    form = morph('Александру')[0]
    assert 'Name' in form.grams
    assert form.inflect() == 'александр'
    assert form.inflect({'nomn', 'plur'}) == 'александры'

    form = morph('московским')[0]
    assert form.inflect({'nomn', 'femn'}) == 'московская'


def test_oov(morph):
    forms = morph('абракадабрище')
    assert len(forms) == 1
    assert forms[0].normalized == 'абракадабрище'
    assert not forms[0].grams.values


def test_check_gram(morph):
    morph.check_gram('NOUN')
    morph.check_gram('nomn')
    with pytest.raises(ValueError):
        morph.check_gram('verb')
    with pytest.raises(ValueError):
        morph.check_gram('UNKGRAM')
