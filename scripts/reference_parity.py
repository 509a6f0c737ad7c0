"""Head-to-head parity + throughput vs the REAL reference implementation.

pymorphy2 is absent in this sandbox, so the reference's morphology
stack cannot load — but its plain ``Tokenizer`` path imports cleanly
(reference tokenizer.py only imports morphology lazily for
MorphTokenizer). That lets us run the reference's own Earley parser on
every MORPH-FREE grammar and compare, text by text, against our kernel:

* P/R of match spans (must be 1.0 — the kernel replicates the
  reference's tree ranking and span-resolution DP exactly), and
* single-process throughput, texts/sec, same texts, same grammars.

Grammars covered (all eq/caseless/type/gte/lte/in_/not_ — no morph):
clause references, ISO dates, money-lite, «quoted titles».

Usage: python scripts/reference_parity.py [n_texts]
Prints one JSON line; numbers are recorded in BASELINE.md.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = '/root/reference'


def reference_grammars():
    sys.path.insert(0, REFERENCE)
    from yargy.api import and_, not_, or_, rule
    from yargy.predicates import caseless, eq, gte, lte, in_, type

    INT = type('INT')
    clause = rule(
        caseless('ст'), eq('.'), INT,
        rule(eq('-'), INT).optional(),
        rule(caseless('п'), eq('.'), INT).optional(),
    )
    YEAR = and_(gte(1900), lte(2100))
    MONTH = and_(gte(1), lte(12))
    DAY = and_(gte(1), lte(31))
    iso_date = rule(YEAR, eq('-'), MONTH, eq('-'), DAY)
    money_lite = rule(
        INT.repeatable(max=4),
        or_(
            rule(in_({'$', '€'})),
            rule(caseless('руб'), eq('.').optional()),
            rule(caseless('р'), eq('.')),
        ),
    )
    title = rule(eq('«'), not_(eq('»')).repeatable(), eq('»'))
    return {'clause': clause, 'iso_date': iso_date,
            'money_lite': money_lite, 'title': title}


def our_grammars():
    from yargy_ray.kernel import and_, not_, or_, rule
    from yargy_ray.kernel.predicates import caseless, eq, gte, lte, in_, type_

    INT = type_('INT')
    clause = rule(
        caseless('ст'), eq('.'), INT,
        rule(eq('-'), INT).optional(),
        rule(caseless('п'), eq('.'), INT).optional(),
    )
    YEAR = and_(gte(1900), lte(2100))
    MONTH = and_(gte(1), lte(12))
    DAY = and_(gte(1), lte(31))
    iso_date = rule(YEAR, eq('-'), MONTH, eq('-'), DAY)
    money_lite = rule(
        INT.repeatable(max=4),
        or_(
            rule(in_({'$', '€'})),
            rule(caseless('руб'), eq('.').optional()),
            rule(caseless('р'), eq('.')),
        ),
    )
    title = rule(eq('«'), not_(eq('»')).repeatable(), eq('»'))
    return {'clause': clause, 'iso_date': iso_date,
            'money_lite': money_lite, 'title': title}


def load_texts(n):
    """Deterministic synthetic transcript turns (same generator as bench)."""
    import pyarrow.parquet as pq
    path = '/tmp/yargy_ray_parity/transcripts_v3'
    if not os.path.exists(os.path.join(path, '_DONE')):
        import shutil
        from yargy_ray.sources.transcripts import write_transcripts
        shutil.rmtree(path, ignore_errors=True)
        write_transcripts(path, max(200, n // 10), giant_every=997,
                          giant_factor=10)
        open(os.path.join(path, '_DONE'), 'w').close()
    texts = []
    for name in sorted(os.listdir(path)):
        if not name.endswith('.parquet'):
            continue
        texts.extend(pq.read_table(
            os.path.join(path, name), columns=['text'])
            .column('text').to_pylist())
        if len(texts) >= n:
            break
    return texts[:n]


def run_side(make_parser, grammars, texts):
    """Returns (elapsed_sec, {grammar: set((text_idx, start, stop))})."""
    parsers = {name: make_parser(g) for name, g in grammars.items()}
    spans = {name: set() for name in grammars}
    start = time.time()
    for i, text in enumerate(texts):
        for name, parser in parsers.items():
            for match in parser.findall(text):
                spans[name].add((i, match.span.start, match.span.stop))
    return time.time() - start, spans


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    texts = load_texts(n)

    from yargy_ray.kernel import Parser as OurParser
    from yargy_ray.kernel.tokenizer import Tokenizer as OurTokenizer
    ours_t, ours = run_side(
        lambda g: OurParser(g, tokenizer=OurTokenizer()),
        our_grammars(), texts)

    ref_spec = reference_grammars()
    from yargy import Parser as RefParser          # noqa: import after path
    from yargy.tokenizer import Tokenizer as RefTokenizer
    ref_t, ref = run_side(
        lambda g: RefParser(g, tokenizer=RefTokenizer()),
        ref_spec, texts)

    per_grammar = {}
    tp = fp = fn = 0
    for name in ref:
        hit = len(ours[name] & ref[name])
        tp += hit
        fp += len(ours[name] - ref[name])
        fn += len(ref[name] - ours[name])
        per_grammar[name] = {
            'ref_matches': len(ref[name]),
            'our_matches': len(ours[name]),
            'exact': ours[name] == ref[name],
        }
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0

    out = {
        'metric': 'reference_parity',
        'n_texts': len(texts),
        'precision': round(precision, 6),
        'recall': round(recall, 6),
        'grammars': per_grammar,
        'reference_texts_per_sec': round(len(texts) / ref_t, 1),
        'our_texts_per_sec': round(len(texts) / ours_t, 1),
        'speedup_vs_reference': round(ref_t / ours_t, 2),
        'note': 'morph-free grammar subset; single process, same texts; '
                'reference morphology stack needs pymorphy2 (absent here)',
    }
    print(json.dumps(out, ensure_ascii=False))


if __name__ == '__main__':
    main()
