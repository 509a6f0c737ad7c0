"""gram()-predicate hit-rate of the embedded lexicon on the synthetic
transcript corpus (VERDICT r01 'what's missing' #1).

Reports, over every RU token occurrence in a deterministic corpus:
* dict_hit   — token found in the embedded paradigm table,
* gram_hit   — token has >=1 reading with non-empty grammemes
               (dictionary OR suffix-guessed; what gram('NOUN')-style
               predicates actually see),
* inflect_hit — nomn/sing re-inflection resolves through a REAL
               paradigm cell (``Form.inflect`` returns a dictionary
               surface, not a fallback); ``inflect_lemma`` counts
               paradigm-backed lemma fallbacks (usually correct — the
               lemma IS the nomn/sing form for most nouns), and
               ``inflect_surface`` counts OOV degenerations where
               ``inflected()`` can only echo the surface form
               (VERDICT r02 'what's missing' #2),
* per-POS breakdown of the readings.

Runs WITHOUT Ray (generator is plain numpy/pyarrow).
"""

import sys
from collections import Counter

sys.path.insert(0, '.')

from yargy_ray.kernel.morpho import LexiconAnalyzer  # noqa: E402
from yargy_ray.kernel.tokenizer import Tokenizer  # noqa: E402
from yargy_ray.sources.transcripts import generate_conversation  # noqa: E402


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    analyzer = LexiconAnalyzer()
    tokenizer = Tokenizer()

    total = dict_hits = gram_hits = 0
    inflect_cell = inflect_lemma = inflect_surface = 0
    inflect_identity = 0
    pos = Counter()
    missed = Counter()
    inflect_missed = Counter()
    lemma_fallback = Counter()
    target = frozenset({'nomn', 'sing'})
    # word classes where pymorphy2's inflect({'nomn','sing'}) is
    # identity or fails-to-normal-form BY DESIGN (invariant words,
    # finite verbs, short forms, pluralia tantum): a lemma fallback for
    # them is bit-for-bit the reference behavior, not a fidelity gap
    identity_pos = {'PREP', 'CONJ', 'PRCL', 'ADVB', 'PRED', 'INTJ',
                    'COMP', 'VERB', 'INFN', 'GRND', 'PRTS', 'ADJS'}
    for conv in range(n_convs):
        for row in generate_conversation(conv, giant_every=0):
            for token in tokenizer(row['text']):
                if token.type != 'RU':
                    continue
                total += 1
                word = token.value.lower()
                in_dict = word in analyzer.index
                forms = analyzer(word)
                has_grams = any(f.grams.values for f in forms)
                dict_hits += in_dict
                gram_hits += has_grams
                # inflect path: does nomn/sing re-inflection resolve
                # through a real paradigm cell for >=1 reading?
                has_cell = any(
                    f.paradigm is not None and any(
                        target <= grams for _, grams in f.paradigm.cells)
                    for f in forms)
                if has_cell:
                    inflect_cell += 1
                elif any(f.paradigm is not None for f in forms):
                    if all(f.grams.values & identity_pos
                           or 'Pltm' in f.grams for f in forms):
                        inflect_identity += 1
                    else:
                        inflect_lemma += 1
                        lemma_fallback[word] += 1
                else:
                    inflect_surface += 1
                    inflect_missed[word] += 1
                for f in forms:
                    for g in ('NOUN', 'ADJF', 'VERB', 'INFN'):
                        if g in f.grams:
                            pos[g] += 1
                            break
                if not in_dict:
                    missed[word] += 1
    print(f'RU tokens: {total}')
    print(f'dict_hit:  {dict_hits} ({100.0 * dict_hits / total:.1f}%)')
    print(f'gram_hit:  {gram_hits} ({100.0 * gram_hits / total:.1f}%)')
    resolved = inflect_cell + inflect_identity + inflect_lemma
    print(f'inflect_hit (paradigm cell):   {inflect_cell} '
          f'({100.0 * inflect_cell / total:.1f}%)')
    print(f'inflect identity-correct (invariant/verb/short/Pltm — '
          f'matches pymorphy2 by design): {inflect_identity} '
          f'({100.0 * inflect_identity / total:.1f}%)')
    print(f'inflect GENUINE cell gaps (full nominals w/o nomn/sing): '
          f'{inflect_lemma} ({100.0 * inflect_lemma / total:.1f}%)')
    print(f'inflect resolved total:        {resolved} '
          f'({100.0 * resolved / total:.1f}%)')
    print(f'inflect surface fallback (OOV): {inflect_surface} '
          f'({100.0 * inflect_surface / total:.1f}%)')
    print('top inflect-miss words:', inflect_missed.most_common(15))
    print('top lemma-fallback words (densest real-cell growth targets):',
          lemma_fallback.most_common(30))
    print(f'lexicon lemmas: '
          f'{len({f.normalized for fs in analyzer.index.values() for f in fs})}'
          f' surface forms: {len(analyzer.index)}')
    print('top OOV (guessed):', missed.most_common(10))


if __name__ == '__main__':
    main()
