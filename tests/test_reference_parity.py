"""Live parity vs the actual reference implementation (when present).

Runs the reference's own parser side by side with our kernel on a
slice of the synthetic corpus and asserts EXACT equality of (span,
fact-JSON) sets — both for morph-free grammars (reference plain
Tokenizer path) and for the full morphology stack (fake pymorphy2
backed by the shared embedded lexicon; see
scripts/reference_parity_morph.py). Skipped when /root/reference is
not available (e.g. running this repo standalone).
"""

import json
import os
import sys

import pytest

REFERENCE = '/root/reference'
SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'yargy')),
    reason='reference repo not available')


def _texts(n=400):
    from yargy_ray.sources.transcripts import generate_conversation
    texts = []
    conv = 0
    while len(texts) < n:
        texts.extend(r['text'] for r in generate_conversation(conv))
        conv += 1
    return texts[:n]


def test_parity_morph_free():
    sys.path.insert(0, SCRIPTS)
    import reference_parity as harness
    texts = _texts()

    from yargy_ray.kernel import Parser as OurParser
    from yargy_ray.kernel.tokenizer import Tokenizer as OurTokenizer
    _, ours = harness.run_side(
        lambda g: OurParser(g, tokenizer=OurTokenizer()),
        harness.our_grammars(), texts)

    ref_spec = harness.reference_grammars()
    from yargy import Parser as RefParser
    from yargy.tokenizer import Tokenizer as RefTokenizer
    _, ref = harness.run_side(
        lambda g: RefParser(g, tokenizer=RefTokenizer()),
        ref_spec, texts)

    total = 0
    for name in ref:
        assert ours[name] == ref[name], name
        total += len(ref[name])
    assert total > 0  # the corpus must actually exercise the grammars


def test_parity_full_morph_stack():
    sys.path.insert(0, SCRIPTS)
    import reference_parity_morph as harness
    texts = _texts()

    ns, parser_cls = harness.our_ns()
    _, ours = harness.run_side(parser_cls, harness.build_grammars(ns), texts)

    rns, ref_parser_cls = harness.reference_ns()
    _, ref = harness.run_side(
        ref_parser_cls, harness.build_grammars(rns), texts)

    total = 0
    for name in ref:
        assert ours[name] == ref[name], (
            name,
            sorted(ref[name] - ours[name])[:2],
            sorted(ours[name] - ref[name])[:2],
        )
        total += len(ref[name])
    assert total > 0
