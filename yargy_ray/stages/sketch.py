"""Distinct-count sketching: KMV (k-minimum-values).

The classic cardinality sketch (Bar-Yossef et al. 2002): hash every
distinct value into [0, 1), keep the k smallest hashes; with R = the
k-th smallest, D ≈ (k-1) / R. Mergeable (union of k-min sets, re-take
k smallest) and — unlike HLL implementations — EXACTLY reproducible in
SQL when the hash is md5: the DuckDB oracle recomputes the same k-min
set with ``ORDER BY md5 LIMIT k`` and the same one-division estimate,
so even the sketch is bit-exact-checkable.

Scale shape: each batch contributes at most k rows (its local k-min
over per-batch DISTINCT values), one constant-key reduce takes the
global k smallest — driver sees ONE row. Hashing runs on per-batch
distinct values only (md5 IS the operator — the accepted per-row-md5
class, same as hash_split / exact dedup)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SCALE = float(1 << 60)   # hashes are the first 60 bits of md5


def _batch_kmins(batch: pa.Table, column, k) -> pa.Table:
    vals = batch.column(column)
    distinct = vals.unique()
    hs = np.sort(np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
         for v in distinct.to_pylist()),
        dtype=np.int64, count=len(distinct)))[:k]
    return pa.table({'hv': pa.array(hs, type=pa.int64())})


def kmv_distinct(ds, column, k=64):
    """One-row Arrow table: (k, n_mins, kth, estimate).

    ``estimate`` is exact when fewer than k distinct values were seen
    (the k-min set IS the value set), else ``(k-1) * 2^60 / kth`` —
    the arithmetic the SQL oracle repeats verbatim.
    """
    partials = ds.map_batches(
        lambda b: _batch_kmins(b, column, k), batch_format='pyarrow')

    def merge(table: pa.Table) -> pa.Table:
        hs = np.unique(
            table.column('hv').to_numpy(zero_copy_only=False))[:k]
        return pa.table({'hv': pa.array(hs, type=pa.int64())})

    from yargy_ray.stages.exchange import partitioned_reduce

    def keyed(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            'zero', pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    merged = partitioned_reduce(
        partials.map_batches(keyed, batch_format='pyarrow'),
        'zero', merge, 1, coalesce='auto')
    rows = merged.take_all()                    # bounded: <= k rows
    hs = sorted(r['hv'] for r in rows)[:k]
    n = len(hs)
    if n == 0:
        est, kth = 0.0, 0
    elif n < k:
        est, kth = float(n), hs[-1]
    else:
        kth = hs[-1]
        est = (k - 1) * _SCALE / kth
    return pa.table({
        'k': pa.array([k], type=pa.int64()),
        'n_mins': pa.array([n], type=pa.int64()),
        'kth': pa.array([kth], type=pa.int64()),
        'estimate': pa.array([est], type=pa.float64()),
    })
