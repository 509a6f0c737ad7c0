"""OOV suffix-guesser precision on a held-out Russian vocabulary
(VERDICT r4 'next round' #3).

The embedded lexicon covers the conformance + transcript-template
vocabulary; a REAL Russian corpus leans on the suffix guesser
(kernel/morpho.py:guess_grams) for everything else. This harness
measures what a gram()-predicate user would see on frequent Russian
word forms the lexicon does NOT contain: a frequency-ranked golden
sample (rank 1 = top-of-frequency-list function/content words, rank 3
= common tail), each annotated with the set of part-of-speech tags a
full dictionary would assign that SURFACE form.

Metrics per class and overall:
* any_hit — some guessed reading carries an acceptable POS (what
  ``gram('VERB')``-style predicates actually test),
* top1_hit — the FIRST reading is acceptable (what a наивный
  single-reading consumer sees),
* no_guess — the guesser returned nothing (word falls back to a
  gram-less reading; every gram() predicate misses).

Words already present in the embedded lexicon are skipped — this is a
guesser eval, not a dictionary eval. Runs without Ray.

Usage: python scripts/oov_guesser_eval.py [-v]
"""

import sys
from collections import Counter

sys.path.insert(0, '.')

from yargy_ray.kernel.morpho import LexiconAnalyzer  # noqa: E402

POS_TAGS = frozenset({
    'NOUN', 'ADJF', 'ADJS', 'COMP', 'VERB', 'INFN', 'PRTF', 'PRTS',
    'GRND', 'NUMR', 'ADVB', 'NPRO', 'PRED', 'PREP', 'CONJ', 'PRCL',
    'INTJ'})

# (surface form, frequency rank bucket, acceptable POS set)
# POS annotations follow the OpenCorpora tag set the reference's
# pymorphy2 backend uses; multi-POS entries list every analysis a
# full dictionary gives the surface form.
GOLDEN = [
    # --- finite verbs, present/future ---
    ('работает', 1, {'VERB'}), ('говорит', 1, {'VERB'}),
    ('может', 1, {'VERB'}), ('хочет', 1, {'VERB'}),
    ('знает', 1, {'VERB'}), ('думает', 2, {'VERB'}),
    ('делает', 2, {'VERB'}), ('живёт', 2, {'VERB'}),
    ('идёт', 1, {'VERB'}), ('стоит', 1, {'VERB'}),
    ('любит', 2, {'VERB'}), ('видит', 2, {'VERB'}),
    ('пишет', 2, {'VERB'}), ('читает', 2, {'VERB'}),
    ('играет', 2, {'VERB'}), ('помогает', 2, {'VERB'}),
    ('получает', 2, {'VERB'}), ('считает', 2, {'VERB'}),
    ('начинает', 2, {'VERB'}), ('показывает', 2, {'VERB'}),
    ('существует', 2, {'VERB'}), ('использует', 2, {'VERB'}),
    ('позволяет', 2, {'VERB'}), ('умеет', 3, {'VERB'}),
    ('берут', 2, {'VERB'}), ('везут', 3, {'VERB'}),
    ('хотят', 1, {'VERB'}), ('стоят', 2, {'VERB'}),
    ('делают', 2, {'VERB'}), ('знают', 2, {'VERB'}),
    # --- reflexive present ---
    ('находится', 1, {'VERB'}), ('получается', 2, {'VERB'}),
    ('является', 1, {'VERB'}), ('остаётся', 2, {'VERB'}),
    ('занимается', 2, {'VERB'}), ('начинается', 2, {'VERB'}),
    ('кажется', 2, {'VERB'}), ('находятся', 2, {'VERB'}),
    # --- past tense ---
    ('сказал', 1, {'VERB'}), ('сказала', 1, {'VERB'}),
    ('сказали', 2, {'VERB'}), ('сделал', 2, {'VERB'}),
    ('сделала', 2, {'VERB'}), ('работал', 2, {'VERB'}),
    ('работали', 2, {'VERB'}), ('думал', 2, {'VERB'}),
    ('написал', 2, {'VERB'}), ('купила', 2, {'VERB'}),
    ('получил', 2, {'VERB'}), ('увидел', 2, {'VERB'}),
    ('спросил', 2, {'VERB'}), ('ответил', 2, {'VERB'}),
    ('понял', 2, {'VERB'}), ('узнало', 3, {'VERB'}),
    ('договорились', 2, {'VERB'}), ('случилось', 2, {'VERB'}),
    ('осталась', 2, {'VERB'}), ('появился', 2, {'VERB'}),
    # --- infinitives ---
    ('работать', 1, {'INFN'}), ('говорить', 1, {'INFN'}),
    ('сделать', 1, {'INFN'}), ('понять', 2, {'INFN'}),
    ('читать', 2, {'INFN'}), ('писать', 2, {'INFN'}),
    ('смотреть', 2, {'INFN'}), ('помочь', 2, {'INFN'}),
    ('учиться', 2, {'INFN'}), ('вернуться', 2, {'INFN'}),
    # --- nouns, singular nominative ---
    ('жизнь', 1, {'NOUN'}), ('вопрос', 1, {'NOUN'}),
    ('страна', 1, {'NOUN'}), ('вода', 1, {'NOUN'}),
    ('машина', 2, {'NOUN'}), ('проблема', 1, {'NOUN'}),
    ('решение', 2, {'NOUN'}), ('информация', 2, {'NOUN'}),
    ('система', 2, {'NOUN'}), ('результат', 2, {'NOUN'}),
    ('окно', 2, {'NOUN'}), ('письмо', 2, {'NOUN'}),
    ('книга', 2, {'NOUN'}), ('дорога', 2, {'NOUN'}),
    ('область', 2, {'NOUN'}), ('возможность', 2, {'NOUN'}),
    # --- nouns, oblique/plural surface forms ---
    ('вопросы', 2, {'NOUN'}), ('словами', 2, {'NOUN'}),
    ('городах', 2, {'NOUN'}), ('детям', 2, {'NOUN'}),
    ('машины', 2, {'NOUN'}), ('книгу', 2, {'NOUN'}),
    ('письме', 2, {'NOUN'}), ('дорогой', 2, {'NOUN', 'ADJF'}),
    ('журнал', 2, {'NOUN'}), ('вокзал', 3, {'NOUN'}),
    ('институт', 2, {'NOUN'}), ('маршрут', 3, {'NOUN'}),
    ('визит', 3, {'NOUN'}), ('салют', 3, {'NOUN'}),
    ('отел', 3, {'NOUN'}),   # clipped form; noun-like surface
    # --- adjectives ---
    ('новый', 1, {'ADJF'}), ('хороший', 1, {'ADJF'}),
    ('русский', 1, {'ADJF', 'NOUN'}), ('главный', 2, {'ADJF'}),
    ('маленький', 2, {'ADJF'}), ('последний', 1, {'ADJF'}),
    ('важный', 2, {'ADJF'}), ('красный', 2, {'ADJF'}),
    ('большой', 1, {'ADJF'}), ('молодой', 2, {'ADJF'}),
    ('простой', 2, {'ADJF', 'NOUN'}), ('плохой', 2, {'ADJF'}),
    ('новая', 1, {'ADJF'}), ('новые', 1, {'ADJF'}),
    ('нового', 2, {'ADJF'}), ('большим', 2, {'ADJF'}),
    ('хорошую', 2, {'ADJF'}), ('следующее', 2, {'ADJF'}),
    # --- adverbs / predicatives ---
    ('хорошо', 1, {'ADVB', 'PRED', 'ADJS'}),
    ('быстро', 2, {'ADVB', 'ADJS'}),
    ('просто', 1, {'ADVB', 'PRCL', 'ADJS'}),
    ('медленно', 2, {'ADVB', 'ADJS'}),
    ('правильно', 2, {'ADVB', 'ADJS', 'PRED'}),
    ('одновременно', 3, {'ADVB', 'ADJS'}),
]


def main():
    verbose = '-v' in sys.argv
    analyzer = LexiconAnalyzer()
    total = skipped = any_hit = top1_hit = no_guess = 0
    by_bucket = Counter()
    by_bucket_hit = Counter()
    misses = []
    for word, bucket, gold in GOLDEN:
        assert gold <= POS_TAGS, (word, gold - POS_TAGS)
        if word in analyzer.index:
            skipped += 1
            continue
        total += 1
        by_bucket[bucket] += 1
        forms = analyzer(word)
        read_pos = [next((g for g in f.grams.values if g in POS_TAGS),
                         None) for f in forms]
        read_pos = [p for p in read_pos if p]
        if not read_pos:
            no_guess += 1
            misses.append((word, gold, 'NO_GUESS'))
            continue
        if read_pos[0] in gold:
            top1_hit += 1
        if gold & set(read_pos):
            any_hit += 1
            by_bucket_hit[bucket] += 1
        else:
            misses.append((word, gold, '/'.join(sorted(set(read_pos)))))

    print(f'held-out golden words: {len(GOLDEN)} '
          f'(skipped {skipped} already in dict)')
    print(f'evaluated OOV: {total}')
    print(f'any-reading POS hit: {any_hit}/{total} '
          f'({100.0 * any_hit / total:.1f}%)')
    print(f'top-1 reading POS hit: {top1_hit}/{total} '
          f'({100.0 * top1_hit / total:.1f}%)')
    print(f'no guess at all: {no_guess}')
    for b in sorted(by_bucket):
        print(f'  rank bucket {b}: {by_bucket_hit[b]}/{by_bucket[b]} '
              f'any-hit')
    if verbose or misses:
        print('misses (word, gold, guessed):')
        for word, gold, got in misses:
            print(f'  {word:<20s} {"|".join(sorted(gold)):<15s} {got}')


if __name__ == '__main__':
    main()
