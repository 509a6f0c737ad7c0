"""gram()-predicate hit-rate of the embedded lexicon on the synthetic
transcript corpus (VERDICT r01 'what's missing' #1).

Reports, over every RU token occurrence in a deterministic corpus:
* dict_hit   — token found in the embedded paradigm table,
* gram_hit   — token has >=1 reading with non-empty grammemes
               (dictionary OR suffix-guessed; what gram('NOUN')-style
               predicates actually see),
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
    pos = Counter()
    missed = Counter()
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
    print(f'lexicon lemmas: '
          f'{len({f.normalized for fs in analyzer.index.values() for f in fs})}'
          f' surface forms: {len(analyzer.index)}')
    print('top OOV (guessed):', missed.most_common(10))


if __name__ == '__main__':
    main()
