"""Per-stage lineage manifests + checkpoint/resume.

Every materialized stage writes its output as hash-partitioned parquet
plus a ``_MANIFEST.json`` recording the input fingerprint, stage
parameters and per-partition row counts. A rerun with the same
fingerprint skips the stage (stage-boundary checkpointing); a different
fingerprint invalidates and recomputes. Designed up front because
idempotent partitioned writes are hard to retrofit (SURVEY §7 hard
part 6).

At 100 TB the manifest stays tiny (one row per partition), the data
never flows through the driver, and a failed run resumes by skipping
every stage whose manifest already matches.
"""

from __future__ import annotations

import hashlib
import time

from yargy_ray.state import storage

MANIFEST_NAME = '_MANIFEST.json'


def fingerprint(*parts) -> str:
    """Stable fingerprint of stage inputs/params."""
    h = hashlib.sha256()
    for part in parts:
        h.update(repr(part).encode())
        h.update(b'\x00')
    return h.hexdigest()[:16]


def manifest_path(out_dir):
    return storage.join(out_dir, MANIFEST_NAME)


def load_manifest(out_dir):
    return storage.read_json(manifest_path(out_dir))


def write_manifest(out_dir, stage, input_fingerprint, partitions,
                   extra=None):
    """``partitions``: list of dicts with partition_id / rows / etc."""
    storage.makedirs(out_dir)
    payload = {
        'stage': stage,
        'input_fingerprint': input_fingerprint,
        'written_at': time.time(),
        'rows_out': sum(p.get('rows', 0) for p in partitions),
        'partitions': partitions,
    }
    if extra:
        payload.update(extra)
    storage.write_json_atomic(manifest_path(out_dir), payload)
    return payload


def stage_is_complete(out_dir, input_fingerprint):
    manifest = load_manifest(out_dir)
    return (
        manifest is not None
        and manifest.get('input_fingerprint') == input_fingerprint
    )


def run_stage(stage, out_dir, input_fingerprint, producer, resume=True):
    """Run ``producer(out_dir) -> partitions`` unless already checkpointed.

    ``producer`` must write partitioned output under ``out_dir`` and
    return the per-partition manifest rows — or a ``(partitions,
    extra)`` tuple to record additional manifest fields. Idempotent:
    reruns with the same fingerprint are skipped; stale outputs are
    overwritten.
    """
    if resume and stage_is_complete(out_dir, input_fingerprint):
        return load_manifest(out_dir)
    # a crashed attempt leaves partial part-files with unique names; a
    # rerun's write_parquet would APPEND next to them and downstream
    # reads would double-count — clear the stage dir first (the
    # manifest is only written after a fully successful produce, so
    # anything present here without a matching manifest is garbage)
    storage.rmtree(out_dir)
    partitions = producer(out_dir)
    extra = None
    if isinstance(partitions, tuple):
        partitions, extra = partitions
    return write_manifest(out_dir, stage, input_fingerprint, partitions,
                          extra=extra)
