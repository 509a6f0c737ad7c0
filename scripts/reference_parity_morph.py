"""Full-stack parity vs the reference INCLUDING morphology.

pymorphy2 is not installed, so we inject a minimal fake ``pymorphy2``
module backed by our deterministic embedded lexicon
(yargy_ray.kernel.morpho.LexiconAnalyzer) before importing the
reference. Both engines then see the EXACT same morphology, and the
reference's complete stack runs: MorphTokenizer, gram/dictionary
predicates, morph_pipeline gazetteers, gender-number-case agreement
relations, and interpretation (normalized / inflected / custom chains).

Compared per text: match spans AND interpreted fact JSON. This extends
the P/R=1.0 evidence of scripts/reference_parity.py from the morph-free
subset to the flagship person/date/money grammars.

Usage: python scripts/reference_parity_morph.py [n_texts]
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = '/root/reference'


def install_fake_pymorphy2():
    """sys.modules['pymorphy2'] backed by the embedded lexicon."""
    from yargy_ray.kernel.lexicon import KNOWN_GRAMS
    from yargy_ray.kernel.morpho import LexiconAnalyzer

    class _Tag:
        __slots__ = ('grammemes',)

        def __init__(self, grammemes):
            self.grammemes = set(grammemes)

    class _Parse:
        __slots__ = ('_form',)

        def __init__(self, form):
            self._form = form

        @property
        def normal_form(self):
            return self._form.normalized

        @property
        def tag(self):
            return _Tag(self._form.grams.values)

        def inflect(self, grams):
            word = self._form.inflect(grams)
            return types.SimpleNamespace(word=word)

    class _TagClass:
        @staticmethod
        def grammeme_is_known(gram):
            return gram in KNOWN_GRAMS

    class MorphAnalyzer:
        TagClass = _TagClass

        def __init__(self):
            self._lexicon = LexiconAnalyzer()

        def parse(self, word):
            return [_Parse(f) for f in self._lexicon(word)]

    mod = types.ModuleType('pymorphy2')
    mod.MorphAnalyzer = MorphAnalyzer
    units = types.ModuleType('pymorphy2.units')
    base = types.ModuleType('pymorphy2.units.base')

    class BaseAnalyzerUnit:  # referenced by the reference's 3.11 hotfix
        pass

    base.BaseAnalyzerUnit = BaseAnalyzerUnit
    units.base = base
    mod.units = units
    sys.modules['pymorphy2'] = mod
    sys.modules['pymorphy2.units'] = units
    sys.modules['pymorphy2.units.base'] = base


MONTHS = {
    'январь': 1, 'февраль': 2, 'март': 3, 'апрель': 4, 'май': 5, 'июнь': 6,
    'июль': 7, 'август': 8, 'сентябрь': 9, 'октябрь': 10, 'ноябрь': 11,
    'декабрь': 12,
}
MULTIPLIERS = {'тысяча': 1_000, 'миллион': 1_000_000}
POSITIONS = [
    'управляющий директор', 'вице-мэр', 'директор', 'старший инженер',
    'инженер', 'менеджер', 'аналитик', 'врач', 'учитель',
]


def build_grammars(ns):
    """Same three flagship grammars from either API namespace.

    ``ns`` supplies: rule, or_, and_, not_, fact, eq, caseless, gte,
    lte, type_, gram, dictionary, morph_pipeline, gnc_relation,
    normalized, custom, inflected.
    """
    Date = ns.fact('Date', ['year', 'month', 'day'])
    MONTH_NAME = ns.dictionary(MONTHS).interpretation(
        Date.month.normalized().custom(MONTHS.get))
    DAY = ns.and_(ns.gte(1), ns.lte(31)).interpretation(Date.day.custom(int))
    MONTH_NUM = ns.and_(ns.gte(1), ns.lte(12)).interpretation(
        Date.month.custom(int))
    YEAR = ns.and_(ns.gte(1900), ns.lte(2100)).interpretation(
        Date.year.custom(int))
    DATE = ns.or_(
        ns.rule(DAY, MONTH_NAME, YEAR.optional()),
        ns.rule(YEAR, ns.eq('-'), MONTH_NUM, ns.eq('-'), DAY),
        ns.rule(YEAR, ns.caseless('г'), ns.eq('.')),
    ).interpretation(Date)

    Money = ns.fact('Money', ['amount', 'mult', 'currency'])
    AMOUNT = ns.type_('INT').repeatable(max=4).interpretation(
        Money.amount.custom(lambda v: int(v.replace(' ', ''))))
    MULT = ns.dictionary(MULTIPLIERS).interpretation(
        Money.mult.normalized().custom(MULTIPLIERS.get))
    CURRENCY = ns.or_(
        ns.rule(ns.in_({'$', '€'})),
        ns.rule(ns.dictionary({'рубль', 'доллар', 'евро'})),
        ns.rule(ns.caseless('руб'), ns.eq('.').optional()),
        ns.rule(ns.caseless('р'), ns.eq('.')),
    ).interpretation(Money.currency.normalized())
    MONEY = ns.rule(AMOUNT, MULT.optional(), CURRENCY).interpretation(Money)

    Person = ns.fact('Person', ['position', 'first', 'last'])
    gnc = ns.gnc_relation()
    POSITION = ns.morph_pipeline(POSITIONS).interpretation(
        Person.position.normalized())
    FIRST = ns.and_(ns.gram('Name'), ns.not_(ns.gram('Abbr'))).interpretation(
        Person.first.inflected()).match(gnc)
    LAST = ns.and_(ns.gram('Surn'), ns.not_(ns.gram('Abbr'))).interpretation(
        Person.last.inflected()).match(gnc)
    PERSON = ns.rule(POSITION.optional(), FIRST, LAST).interpretation(Person)

    Address = ns.fact('Address', ['street_type', 'street', 'house'])
    STREET_TYPE = ns.morph_pipeline(
        ['улица', 'проспект', 'переулок', 'шоссе']).interpretation(
        Address.street_type.normalized())
    STREET = ns.and_(ns.gram('Surn'), ns.not_(ns.gram('Abbr'))
                     ).interpretation(Address.street.custom(str.lower))
    HOUSE_WORD = ns.or_(ns.rule(ns.caseless('дом')),
                        ns.rule(ns.caseless('д'), ns.eq('.')))
    HOUSE = ns.and_(ns.gte(1), ns.lte(999)).interpretation(
        Address.house.custom(int))
    ADDRESS = ns.rule(
        STREET_TYPE, STREET,
        ns.rule(HOUSE_WORD.optional(), HOUSE).optional(),
    ).interpretation(Address)

    return {'date': DATE, 'money': MONEY, 'person': PERSON,
            'address': ADDRESS}


def reference_ns():
    install_fake_pymorphy2()
    sys.path.insert(0, REFERENCE)
    import yargy.api as api
    import yargy.predicates as preds
    from yargy.interpretation import fact, normalized, inflected, custom
    from yargy.pipelines import morph_pipeline
    from yargy.relations import gnc_relation
    ns = types.SimpleNamespace(
        rule=api.rule, or_=api.or_, and_=api.and_, not_=api.not_, fact=fact,
        eq=preds.eq, caseless=preds.caseless, gte=preds.gte, lte=preds.lte,
        in_=preds.in_, type_=preds.type, gram=preds.gram,
        dictionary=preds.dictionary, morph_pipeline=morph_pipeline,
        gnc_relation=gnc_relation, normalized=normalized,
        inflected=inflected, custom=custom,
    )
    from yargy import Parser
    return ns, Parser


def our_ns():
    import yargy_ray.kernel as k
    import yargy_ray.kernel.predicates as preds
    from yargy_ray.kernel.gazetteer import morph_pipeline
    from yargy_ray.kernel.relations import gnc_relation
    ns = types.SimpleNamespace(
        rule=k.rule, or_=k.or_, and_=k.and_, not_=k.not_, fact=k.fact,
        eq=preds.eq, caseless=preds.caseless, gte=preds.gte, lte=preds.lte,
        in_=preds.in_, type_=preds.type_, gram=preds.gram,
        dictionary=preds.dictionary, morph_pipeline=morph_pipeline,
        gnc_relation=gnc_relation,
    )
    from yargy_ray.kernel.interp import normalized, inflected, custom
    ns.normalized = normalized
    ns.inflected = inflected
    ns.custom = custom
    from yargy_ray.kernel import Parser
    return ns, Parser


def load_texts(n):
    sys.path.insert(0, REPO)
    from reference_parity import load_texts as _load
    return _load(n)


def run_side(parser_cls, grammars, texts):
    parsers = {name: parser_cls(g) for name, g in grammars.items()}
    results = {name: set() for name in grammars}
    start = time.time()
    for i, text in enumerate(texts):
        for name, parser in parsers.items():
            for match in parser.findall(text):
                payload = match.fact.as_json
                results[name].add((
                    i, match.span.start, match.span.stop,
                    json.dumps(payload, ensure_ascii=False, sort_keys=True),
                ))
    return time.time() - start, results


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    texts = load_texts(n)

    ns, parser_cls = our_ns()
    ours_t, ours = run_side(parser_cls, build_grammars(ns), texts)

    rns, ref_parser_cls = reference_ns()
    ref_t, ref = run_side(ref_parser_cls, build_grammars(rns), texts)

    per_grammar = {}
    tp = fp = fn = 0
    for name in ref:
        tp += len(ours[name] & ref[name])
        fp += len(ours[name] - ref[name])
        fn += len(ref[name] - ours[name])
        per_grammar[name] = {
            'ref_matches': len(ref[name]),
            'our_matches': len(ours[name]),
            'exact': ours[name] == ref[name],
        }
        if ours[name] != ref[name]:
            sample_missing = sorted(ref[name] - ours[name])[:3]
            sample_extra = sorted(ours[name] - ref[name])[:3]
            per_grammar[name]['sample_missing'] = sample_missing
            per_grammar[name]['sample_extra'] = sample_extra
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0

    print(json.dumps({
        'metric': 'reference_parity_morph',
        'n_texts': len(texts),
        'precision': round(precision, 6),
        'recall': round(recall, 6),
        'grammars': per_grammar,
        'reference_texts_per_sec': round(len(texts) / ref_t, 1),
        'our_texts_per_sec': round(len(texts) / ours_t, 1),
        'speedup_vs_reference': round(ref_t / ours_t, 2),
        'note': 'reference runs its FULL stack (morph predicates, '
                'agreement relations, morph_pipeline, interpretation) on '
                'a fake pymorphy2 backed by the same embedded lexicon; '
                'spans AND interpreted fact JSON compared',
    }, ensure_ascii=False))


if __name__ == '__main__':
    main()
