"""JSONL transcripts source — the other common chat-log format.

Reads newline-delimited JSON conversation logs into the engine's
canonical transcripts schema (``conv_id, turn_idx, role, text, tool,
ts`` — BASELINE input_hint). Missing optional fields are normalized:
``tool`` defaults to '' and ``ts`` to epoch, so every downstream stage
sees one schema regardless of source format.

Scale note: ``ray.data.read_json`` streams files exactly like
``read_parquet`` (block per file chunk, lazy); only the normalization
map runs per batch, vectorized at the Arrow level.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from yargy_ray.sources.transcripts import TRANSCRIPT_SCHEMA

_EPOCH = pa.scalar(0, pa.timestamp('us'))


def _normalize(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    names = set(batch.column_names)

    def col(name, typ, default):
        if name in names:
            # per-row nulls happen too (field present in some lines only)
            return pc.cast(batch.column(name), typ).fill_null(default)
        return pa.nulls(n, typ).fill_null(default)

    ts = (pc.cast(batch.column('ts'), pa.timestamp('us'))
          if 'ts' in names else pa.nulls(n, pa.timestamp('us')))
    return pa.table({
        'conv_id': col('conv_id', pa.string(), ''),
        'turn_idx': col('turn_idx', pa.int32(), 0),
        'role': col('role', pa.string(), ''),
        'text': col('text', pa.string(), ''),
        'tool': col('tool', pa.string(), ''),
        'ts': ts.fill_null(_EPOCH),
    }, schema=TRANSCRIPT_SCHEMA)


def read_transcripts_jsonl(paths, **read_kwargs):
    """JSONL file(s)/dir(s) -> transcripts Dataset in canonical schema."""
    import ray.data
    ds = ray.data.read_json(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format='pyarrow')
