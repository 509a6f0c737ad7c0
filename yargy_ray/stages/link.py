"""Gazetteer-backed entity linking (north_rule component).

Maps mention surface forms to canonical entity ids with
morph_pipeline semantics (reference: pipelines.py:53-75 — keys match
on per-token LEMMAS, so every inflected variant of a phrase links to
the same canonical entry; yargy_ray.kernel.gazetteer reimplements the
same normalization for in-grammar use).

Scale design: the gazetteer is built ONCE driver-side and broadcast
with ``ray.put`` — every actor reads the same object-store copy in
``__init__``; it is never re-shipped per batch. The linking stage is a
stateful actor pool (morph analyzer + phrase index built once per
actor), streaming over Arrow batches. Unlinked mentions keep their
normalized surface form with ``linked=False`` — at 100TB scale you
never drop rows silently.
"""

from __future__ import annotations

import pyarrow as pa

from yargy_ray.kernel.tokenizer import MorphTokenizer


def normalize_phrase(tokenizer, phrase):
    """Lemma-join key for a phrase: one sorted lemma choice per token.

    Deterministic: for ambiguous tokens the lexicographically-first
    lemma is used on BOTH the gazetteer side and the mention side, so
    lookups are stable across processes (same requirement as the
    deterministic prediction order in kernel/gazetteer.py).
    """
    keys = []
    for token in tokenizer(phrase):
        forms = getattr(token, 'forms', None)
        if forms:
            keys.append(min(f.normalized for f in forms))
        else:
            keys.append(token.value.lower())
    return ' '.join(keys)


def build_gazetteer(entities):
    """{canonical_id: [phrase, ...]} -> broadcastable lemma-key index.

    Run driver-side once; pass the result (or its ``ray.put`` ref) to
    :func:`link_entities`.
    """
    tokenizer = MorphTokenizer()
    index = {}
    for entity_id in sorted(entities):
        for phrase in entities[entity_id]:
            key = normalize_phrase(tokenizer, phrase)
            # first writer wins deterministically (sorted entity order)
            index.setdefault(key, entity_id)
    return index


class EntityLinker:
    """Actor: adds ``entity_id`` + ``linked`` columns for one column.

    ``index_ref`` may be a plain dict (tests) or a ``ray.ObjectRef``
    from ``ray.put`` (the broadcast path — resolved once per actor).
    """

    # surface forms repeat heavily (same insight as the extraction LRU,
    # stages/extract.py): cache the tokenize+lemma key per distinct
    # surface, bounded per actor
    _CACHE_MAX = 100_000

    def __init__(self, index_ref, column='obj'):
        try:
            import ray
            if isinstance(index_ref, ray.ObjectRef):
                index_ref = ray.get(index_ref)
        except ImportError:  # pure-kernel contexts
            pass
        self.index = index_ref
        self.column = column
        self.tokenizer = MorphTokenizer()
        self._key_cache = {}

    def _key_of(self, value):
        key = self._key_cache.get(value)
        if key is None:
            key = normalize_phrase(self.tokenizer, value)
            if len(self._key_cache) >= self._CACHE_MAX:
                self._key_cache.clear()
            self._key_cache[value] = key
        return key

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = batch.column(self.column).to_pylist()
        ids = []
        linked = []
        for value in values:
            key = self._key_of(value or '')
            hit = self.index.get(key)
            if hit is None:
                ids.append(key)
                linked.append(False)
            else:
                ids.append(hit)
                linked.append(True)
        return (
            batch.append_column('entity_id', pa.array(ids, pa.string()))
            .append_column('linked', pa.array(linked, pa.bool_()))
        )


def link_entities(ds, gazetteer, column='obj', concurrency=(1, 4),
                  batch_size=4096):
    """Dataset + {id: [phrases]} -> Dataset with entity_id/linked.

    Broadcasts the compiled index via ``ray.put`` so N actors share one
    object-store copy instead of N pickled copies in their constructor
    args.
    """
    import ray
    index = gazetteer if isinstance(gazetteer, ray.ObjectRef) else None
    if index is None:
        compiled = (gazetteer if all(
            isinstance(v, str) for v in gazetteer.values())
            else build_gazetteer(gazetteer))
        index = ray.put(compiled)
    return ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={'index_ref': index, 'column': column},
        batch_format='pyarrow',
        batch_size=batch_size,
        concurrency=concurrency,
    )
