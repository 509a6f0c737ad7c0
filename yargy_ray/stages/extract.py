"""Extraction stage: transcript turns -> mention rows -> triple rows.

The hot path of the engine. Design (SURVEY §2.7, §3):

* ``MentionExtractor`` is a callable CLASS for
  ``map_batches(MentionExtractor, concurrency=(a, b), batch_size=B,
  batch_format='pyarrow')`` — all expensive state (compiled grammars,
  morphology analyzer + LRU, gazetteer indexes) is built once per actor
  in ``__init__`` and amortized over every batch (actor pool, not tasks).
* Grammars arrive as factory dotted-names (strings) — cheap to pickle,
  compiled inside the actor; ``custom()`` functions stay importable.
* Per turn the text is tokenized + morph-analyzed ONCE and the token
  list shared by all grammars; each grammar is gated by a cheap regex
  precondition so most grammar×turn pairs never start an Earley chart.
* A per-document state budget bounds worst-case parse work; capped
  turns are reported as ``rule='_capped'`` rows (counted by manifests,
  excluded from triples) instead of failing the job.
* Output is built with Arrow arrays directly — no pandas detour.

Extraction is per-turn (the reference semantics is per-document over a
single string; BASELINE's per-row invariant is per-turn text equality),
so NO shuffle is needed before extraction — the only wide stages are
downstream dedup/canonicalization.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from yargy_ray.grammars import DEFAULT_FACTORIES, build_specs
from yargy_ray.kernel import Parser, StateOverflow
from yargy_ray.kernel.interp import Fact
from yargy_ray.kernel.tokenizer import MorphTokenizer

MENTION_SCHEMA = pa.schema([
    ('conv_id', pa.string()),
    ('turn_idx', pa.int32()),
    ('rule', pa.string()),
    ('span_start', pa.int32()),
    ('span_stop', pa.int32()),
    ('tokens', pa.list_(pa.string())),
    ('fact_json', pa.string()),
])

TRIPLE_SCHEMA = pa.schema([
    ('subj', pa.string()),
    ('pred', pa.string()),
    ('obj', pa.string()),
    ('conv_id', pa.string()),
    ('turn_idx', pa.int32()),
    ('rule', pa.string()),
    ('span_start', pa.int32()),
    ('span_stop', pa.int32()),
])

CAPPED_RULE = '_capped'


def fact_payload(value):
    """Interpretation result -> JSON-serializable payload."""
    if isinstance(value, Fact):
        return value.as_json
    return value


class MentionExtractor:
    """pyarrow batch of transcript turns -> pyarrow batch of mentions.

    NOTE: do NOT disable cyclic GC in these actors. It gains ~6%
    single-process, but inside a Ray worker uncollected cycles pin
    deserialized Arrow blocks (plasma-backed buffers), the object store
    fills, and throughput collapses ~4x (measured at 32 cpus).
    """

    def __init__(self, factory_paths=DEFAULT_FACTORIES, max_states=None):
        self.specs = build_specs(factory_paths)
        # one shared tokenizer => one morph pass per turn for all grammars
        self.tokenizer = MorphTokenizer()
        self.parsers = []
        for spec in self.specs:
            parser = Parser(
                spec.rule,
                tokenizer=self.tokenizer,
                max_states=max_states if max_states is not None
                else spec.max_states,
            )
            gate = re.compile(spec.gate) if spec.gate else None
            self.parsers.append((spec, parser, gate))
        self._token_cache = {}
        self._result_cache = {}

    def _tokenize(self, text):
        """Per-turn token list with a small LRU.

        Transcript turns repeat heavily (acknowledgements, tool
        banter), and token lists are treated read-only by the parser
        (scan attaches CONSTRAINED COPIES to leaves, never mutating the
        source tokens), so caching whole turns is safe and mirrors the
        reference's per-word morph LRU one level up.
        """
        cached = self._token_cache.get(text)
        if cached is None:
            cached = list(self.tokenizer(text))
            if len(self._token_cache) >= 4096:
                self._token_cache.clear()
            self._token_cache[text] = cached
        return cached

    def _extract_text(self, text):
        """All (rule, start, stop, tokens, fact_json) rows for one text.

        Memoized per actor: extraction output is TEXT-INTRINSIC (spans,
        rules and facts carry no conv/turn identity), and transcript
        turns repeat heavily (~48% duplicate turns on the synthetic
        corpus; acknowledgement/tool banter dominates real ones), so a
        small LRU halves chart work — the reference's morph-LRU
        philosophy applied one level up.
        """
        cached = self._result_cache.get(text)
        if cached is not None:
            return cached
        rows = []
        tokens = None
        for spec, parser, gate in self.parsers:
            if gate is not None and gate.search(text) is None:
                continue
            if tokens is None:
                tokens = self._tokenize(text)
            try:
                matches = list(parser.findall_tokens(tokens))
            except StateOverflow:
                rows.append((CAPPED_RULE, 0, 0, [],
                             json.dumps({'grammar': spec.name})))
                continue
            for match in matches:
                try:
                    payload = fact_payload(match.fact)
                except TypeError:
                    # mixed-type interpretation — quarantine, don't fail
                    continue
                rows.append((
                    spec.name, match.span.start, match.span.stop,
                    [t.value for t in match.tokens],
                    json.dumps(payload, ensure_ascii=False, sort_keys=True),
                ))
        if len(self._result_cache) >= 4096:
            self._result_cache.clear()
        self._result_cache[text] = rows
        return rows

    def extract_turn(self, conv_id, turn_idx, text, out):
        for rule, start, stop, tokens, payload in self._extract_text(text):
            out.append((conv_id, turn_idx, rule, start, stop, tokens,
                        payload))

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column('conv_id').to_pylist()
        turn_idxs = batch.column('turn_idx').to_pylist()
        texts = batch.column('text').to_pylist()
        out = []
        for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
            self.extract_turn(conv_id, turn_idx, text, out)
        if out:
            columns = list(zip(*out))
        else:
            columns = [[] for _ in MENTION_SCHEMA]
        arrays = [
            pa.array(col, type=field.type)
            for col, field in zip(columns, MENTION_SCHEMA)
        ]
        return pa.Table.from_arrays(arrays, schema=MENTION_SCHEMA)


class TripleProjector:
    """Stateless-ish mention -> triple projection (fuses with extraction).

    Needs the grammar specs only for their ``to_triples`` functions;
    construction is cheap but still done once per actor.
    """

    def __init__(self, factory_paths=DEFAULT_FACTORIES):
        self.emitters = {s.name: s.to_triples for s in build_specs(factory_paths)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rules = batch.column('rule').to_pylist()
        conv_ids = batch.column('conv_id').to_pylist()
        turn_idxs = batch.column('turn_idx').to_pylist()
        starts = batch.column('span_start').to_pylist()
        stops = batch.column('span_stop').to_pylist()
        facts = batch.column('fact_json').to_pylist()
        out = []
        for rule, conv_id, turn_idx, start, stop, payload in zip(
                rules, conv_ids, turn_idxs, starts, stops, facts):
            emit = self.emitters.get(rule)
            if emit is None:  # _capped and unknown rules carry no facts
                continue
            value = json.loads(payload)
            if not isinstance(value, dict):
                continue
            for subj, pred, obj in emit(value, conv_id, turn_idx):
                out.append((str(subj), str(pred), str(obj),
                            conv_id, turn_idx, rule, start, stop))
        if out:
            columns = list(zip(*out))
        else:
            columns = [[] for _ in TRIPLE_SCHEMA]
        arrays = [
            pa.array(col, type=field.type)
            for col, field in zip(columns, TRIPLE_SCHEMA)
        ]
        return pa.Table.from_arrays(arrays, schema=TRIPLE_SCHEMA)


class IntTokenExtractor:
    """Earley extraction of every INT token from a text column.

    The smallest possible grammar (``rule(type('INT'))``) — exists so
    the Earley path itself is oracle-checkable against a SQL
    ``regexp_extract_all(text, '\\d+')`` on the same rows.
    """

    def __init__(self, id_column='event_id', text_column='props'):
        from yargy_ray.kernel import rule
        from yargy_ray.kernel.predicates import type_
        from yargy_ray.kernel.tokenizer import Tokenizer
        self.id_column = id_column
        self.text_column = text_column
        self.parser = Parser(rule(type_('INT')), tokenizer=Tokenizer())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        out_id, out_val = [], []
        for row_id, text in zip(ids, texts):
            for match in self.parser.findall(text):
                out_id.append(row_id)
                out_val.append(match.tokens[0].value)
        return pa.table({
            self.id_column: pa.array(out_id, type=pa.int64()),
            'value': pa.array(out_val, type=pa.string()),
        })


def extract_mentions(turns_ds, factory_paths=DEFAULT_FACTORIES,
                     concurrency=(1, 8), batch_size=128):
    """turns Dataset -> mentions Dataset (actor-pool map_batches)."""
    return turns_ds.map_batches(
        MentionExtractor,
        fn_constructor_kwargs={'factory_paths': tuple(factory_paths)},
        batch_format='pyarrow',
        batch_size=batch_size,
        concurrency=concurrency,
    )


_PROJECTOR_CACHE = {}


def _project_batch_fn(factory_paths):
    """Task-based projection: a plain function (no actor pool to starve
    the extraction actors); the projector is built once per worker
    process and cached — construction is just grammar-factory imports."""
    paths = tuple(factory_paths)

    def project(batch: pa.Table) -> pa.Table:
        projector = _PROJECTOR_CACHE.get(paths)
        if projector is None:
            projector = TripleProjector(paths)
            _PROJECTOR_CACHE[paths] = projector
        return projector(batch)

    return project


def project_triples(mentions_ds, factory_paths=DEFAULT_FACTORIES,
                    batch_size=4096):
    """mentions Dataset -> triples Dataset (fuses with upstream map)."""
    return mentions_ds.map_batches(
        _project_batch_fn(factory_paths),
        batch_format='pyarrow',
        batch_size=batch_size,
    )
