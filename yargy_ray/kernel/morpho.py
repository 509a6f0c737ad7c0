"""Pluggable morphology backend.

Interface contract (reference: /root/reference/yargy/morph.py:118-143):
``analyzer(word) -> list[Form]``, ``analyzer.normalized(word) -> set[str]``,
``analyzer.check_gram(gram)`` raising ``ValueError`` for unknown grammemes,
and ``Form.inflect(grams)`` re-inflecting the lemma to target grammemes.

Two implementations:

* :class:`LexiconAnalyzer` — deterministic embedded paradigm table
  (``lexicon.py``); the default in this sandbox. Out-of-vocabulary words
  get a single gram-less reading whose lemma is the lowercased surface
  (mirrors pymorphy2's guesser in the "unknown word" limit).
* :class:`Pymorphy2Analyzer` — thin adapter used automatically when
  pymorphy2 + dictionaries are importable (parity runs outside the sandbox).

Analyzers are built once per Ray actor (in ``__init__`` of the extraction
callable) and memoize parses in a per-actor LRU — token frequency is
Zipfian so independent per-worker caches hit nearly as well as a shared one.
"""

from __future__ import annotations

from functools import lru_cache

from .lexicon import KNOWN_GRAMS, PARADIGMS
from .records import Form, Grams

CACHE_SIZE = 10000


class Paradigm:
    """One lexeme: lemma plus its list of (surface, grams) cells."""

    __slots__ = ('lemma', 'cells')

    def __init__(self, lemma, cells):
        self.lemma = lemma
        self.cells = cells  # list[(surface, frozenset)]

    def inflect(self, form, target):
        """Surface of the cell containing all target grammemes.

        Falls back to the lemma when no cell fits (pymorphy2 returns the
        normal form when ``inflect`` fails — reference morph.py:99-103).
        """
        target = frozenset(target)
        for surface, grams in self.cells:
            if target <= grams:
                return surface
        return self.lemma


class LexiconAnalyzer:
    """Deterministic embedded-lexicon analyzer."""

    def __init__(self, paradigms=None):
        index = {}
        for lemma, base, forms in (paradigms or PARADIGMS):
            cells = [(surface, base | grams) for surface, grams in forms]
            paradigm = Paradigm(lemma, cells)
            for surface, grams in cells:
                index.setdefault(surface, []).append(
                    Form(lemma, Grams(grams), paradigm))
        self.index = index
        self._parse = lru_cache(CACHE_SIZE)(self._parse_uncached)

    def check_gram(self, gram):
        if gram not in KNOWN_GRAMS:
            raise ValueError(gram)

    def _parse_uncached(self, word):
        forms = self.index.get(word)
        if forms is None:
            # OOV: single reading, lemma = lowercased surface, no grammemes.
            forms = [Form(word, Grams(frozenset()))]
        return forms

    def __call__(self, word):
        return self._parse(word.lower())

    def normalized(self, word):
        return {form.normalized for form in self(word)}


class _PymorphyParadigm:
    __slots__ = ('raw',)

    def __init__(self, raw):
        self.raw = raw

    def inflect(self, form, target):
        record = self.raw.inflect(set(target))
        if not record:
            return form.normalized
        return record.word


class Pymorphy2Analyzer:
    """Adapter over a real pymorphy2 MorphAnalyzer (parity runs only)."""

    def __init__(self):
        import pymorphy2  # noqa: F401 - optional dependency
        self.raw = pymorphy2.MorphAnalyzer()
        self._parse = lru_cache(CACHE_SIZE)(self._parse_uncached)

    def check_gram(self, gram):
        if not self.raw.TagClass.grammeme_is_known(gram):
            raise ValueError(gram)

    def _parse_uncached(self, word):
        return [
            Form(p.normal_form, Grams(p.tag.grammemes), _PymorphyParadigm(p))
            for p in self.raw.parse(word)
        ]

    def __call__(self, word):
        return self._parse(word)

    def normalized(self, word):
        return {form.normalized for form in self(word)}


_DEFAULT = None


def default_analyzer():
    """Process-wide analyzer singleton (cheap to share: read-only + LRU)."""
    global _DEFAULT
    if _DEFAULT is None:
        try:
            _DEFAULT = Pymorphy2Analyzer()
        except ImportError:
            _DEFAULT = LexiconAnalyzer()
    return _DEFAULT
