"""Document reconstruction from shuffled turn rows + per-row invariant.

The one wide shuffle before anything document-scoped: group turns by
``conv_id``, restore stable order by ``turn_idx``, concatenate. Giant
conversations (the built-in skew in the synthetic corpus) are handled by
SALTING: level 1 groups on ``(conv_id, turn_idx // window)`` so no
single group exceeds ``window`` turns, level 2 merges the ordered
window-partials per conversation — two bounded shuffles instead of one
unbounded group (SURVEY §2.12).

Per-row invariant (BASELINE.json input_hint): every turn's text must be
byte-identical after reconstruction, under stable turn ordering. Proven
without a join: an order-insensitive per-conversation checksum (sum of
per-turn hashes) computed from the raw rows must equal the checksum
recomputed from the reconstructed document.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

TURN_SEP = '\n'


def _turn_hash(conv_id, turn_idx, text):
    """md5-arithmetic turn hash, reproducible in DuckDB as
    ``md5_number_lower(conv_id || chr(31) || turn_idx || chr(31) || text)
    % 2**63`` (md5_number_lower == bytes [8:16) little-endian)."""
    digest = hashlib.md5(
        f'{conv_id}\x1f{turn_idx}\x1f{text}'.encode()).digest()
    return int.from_bytes(digest[8:16], 'little') % (2**63)


def _window_concat(group: pa.Table) -> pa.Table:
    """Level-1 map_groups: one (conv_id, window) group -> one partial row."""
    idxs = group.column('turn_idx').to_pylist()
    texts = group.column('text').to_pylist()
    conv_id = group.column('conv_id')[0].as_py()
    window = group.column('window')[0].as_py()
    order = sorted(range(len(idxs)), key=lambda i: idxs[i])
    checksum = 0
    for i in order:
        checksum = (checksum + _turn_hash(conv_id, idxs[i], texts[i])) % (2**63)
    return pa.table({
        'conv_id': pa.array([conv_id], type=pa.string()),
        'window': pa.array([window], type=pa.int64()),
        'first_turn': pa.array([min(idxs)], type=pa.int32()),
        'n_turns': pa.array([len(idxs)], type=pa.int64()),
        'text': pa.array([TURN_SEP.join(texts[i] for i in order)],
                         type=pa.string()),
        'checksum': pa.array([checksum], type=pa.int64()),
    })


def _merge_windows(group: pa.Table) -> pa.Table:
    windows = group.column('window').to_pylist()
    texts = group.column('text').to_pylist()
    counts = group.column('n_turns').to_pylist()
    sums = group.column('checksum').to_pylist()
    conv_id = group.column('conv_id')[0].as_py()
    order = sorted(range(len(windows)), key=lambda i: windows[i])
    return pa.table({
        'conv_id': pa.array([conv_id], type=pa.string()),
        'n_turns': pa.array([sum(counts)], type=pa.int64()),
        'text': pa.array([TURN_SEP.join(texts[i] for i in order)],
                         type=pa.string()),
        'checksum': pa.array([sum(sums) % (2**63)], type=pa.int64()),
    })


def reconstruct_documents(turns_ds, window=512):
    """turns Dataset -> documents Dataset (salted two-level groupby)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        win = pc.cast(
            pc.floor(pc.divide(
                pc.cast(batch.column('turn_idx'), pa.float64()), window)),
            pa.int64())
        return batch.append_column('window', win)

    salted = turns_ds.map_batches(add_salt, batch_format='pyarrow')
    partials = salted.groupby(['conv_id', 'window']).map_groups(
        _window_concat, batch_format='pyarrow')
    return partials.groupby('conv_id').map_groups(
        _merge_windows, batch_format='pyarrow')


def _raw_checksums(batch: pa.Table) -> pa.Table:
    """Map-side partial of the order-insensitive invariant checksum."""
    sums = {}
    counts = {}
    for conv_id, idx, text in zip(
            batch.column('conv_id').to_pylist(),
            batch.column('turn_idx').to_pylist(),
            batch.column('text').to_pylist()):
        sums[conv_id] = (sums.get(conv_id, 0)
                         + _turn_hash(conv_id, idx, text)) % (2**63)
        counts[conv_id] = counts.get(conv_id, 0) + 1
    return pa.table({
        'conv_id': pa.array(list(sums), type=pa.string()),
        'checksum': pa.array(list(sums.values()), type=pa.int64()),
        'n_turns': pa.array([counts[c] for c in sums], type=pa.int64()),
    })


def verify_documents(turns_ds, docs_ds):
    """Count conversations whose reconstruction violates the invariant.

    Both sides reduce to one small row per conversation before the
    compare; nothing big crosses the driver.
    """
    expected = (
        turns_ds.map_batches(_raw_checksums, batch_format='pyarrow')
        .groupby('conv_id').sum(['checksum', 'n_turns'])
    )
    exp = {
        r['conv_id']: (r['sum(checksum)'] % (2**63), r['sum(n_turns)'])
        for r in expected.iter_rows()
    }
    bad = 0
    for row in docs_ds.select_columns(
            ['conv_id', 'checksum', 'n_turns']).iter_rows():
        want = exp.pop(row['conv_id'], None)
        if want is None or want != (row['checksum'], row['n_turns']):
            bad += 1
    return bad + len(exp)


def extract_document_mentions(docs_ds, factory_paths=None,
                              concurrency=(1, 8), batch_size=16):
    """Document-scope extraction: reference semantics on whole documents.

    The reference's native unit is one document string (parser.findall
    over the full text); this runs exactly that over RECONSTRUCTED
    documents, with doc-relative spans and ``turn_idx = -1`` marking
    document scope. Matches cannot silently cross turn boundaries: the
    turn separator tokenizes as an EOL token, which no default grammar
    accepts, so doc-scope output equals per-turn output with shifted
    spans (pinned by tests/test_ray_pipeline.py::test_docscope_extraction).
    ``batch_size`` is small because rows are whole conversations, not
    turns.
    """
    import numpy as np

    from yargy_ray.grammars import DEFAULT_FACTORIES
    from yargy_ray.stages.extract import extract_mentions

    if factory_paths is None:
        factory_paths = DEFAULT_FACTORIES

    def adapt(batch: pa.Table) -> pa.Table:
        return pa.table({
            'conv_id': batch.column('conv_id'),
            'turn_idx': pa.array(
                np.full(batch.num_rows, -1, dtype=np.int32)),
            'text': batch.column('text'),
        })

    turns_like = docs_ds.map_batches(adapt, batch_format='pyarrow')
    return extract_mentions(turns_like, factory_paths,
                            concurrency=concurrency, batch_size=batch_size)
