"""CSV transcripts source — the third common chat-log export format.

Reads CSV conversation logs into the engine's canonical transcripts
schema (``conv_id, turn_idx, role, text, tool, ts`` — BASELINE
input_hint), sharing the normalization map with the JSONL source so
every downstream stage sees one schema regardless of origin.

Scale note: ``ray.data.read_csv`` streams files exactly like
``read_parquet`` (block per file chunk, lazy, pyarrow CSV reader);
only the vectorized normalization map runs per batch.
"""

from __future__ import annotations

from yargy_ray.sources.jsonl import _normalize


def read_transcripts_csv(paths, **read_kwargs):
    """CSV file(s)/dir(s) -> transcripts Dataset in canonical schema.

    Timestamps parse from ISO strings (pyarrow CSV auto-detects) or
    epoch integers; missing optional columns are filled like the JSONL
    source.
    """
    import ray.data
    ds = ray.data.read_csv(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format='pyarrow')
