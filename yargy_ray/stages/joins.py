"""Join strategies.

* ``broadcast_join`` — the small side is collected once, ``ray.put``
  into the object store, and every map task reads it zero-copy from the
  local store; the big side streams through ``map_batches`` with a
  vectorized dictionary lookup. No shuffle at all — the right tool
  whenever one side fits in a worker (dimension tables, gazetteers).
* For big-big joins the engine composes groupby-cogroup manually; at
  this round the KG pipeline needs none (dedup/canonicalization are
  groupbys), so broadcast is the only join shipped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BroadcastLookup:
    """map_batches callable joining a batch against a broadcast dict."""

    def __init__(self, table_ref, big_key, columns):
        import ray
        small = ray.get(table_ref) if not isinstance(table_ref, dict) \
            else table_ref
        self.mapping = small
        self.big_key = big_key
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.big_key).to_pylist()
        rows = [self.mapping.get(k) for k in keys]
        mask = np.array([r is not None for r in rows], dtype=bool)
        batch = batch.filter(pa.array(mask))
        kept = [r for r in rows if r is not None]
        for i, col in enumerate(self.columns):
            batch = batch.append_column(
                col, pa.array([r[i] for r in kept]))
        return batch


def broadcast_join(big_ds, small_ds, big_key, small_key, columns,
                   concurrency=(1, 4)):
    # autoscaling (min, max) pool: a fixed-size pool would reserve its
    # CPUs up front and can starve upstream read tasks on small hosts
    """Inner join: big side streams, small side broadcast once.

    ``columns``: the small-side columns to attach to matching rows.
    """
    import ray
    mapping = {}
    for row in small_ds.iter_rows():
        mapping[row[small_key]] = tuple(row[c] for c in columns)
    table_ref = ray.put(mapping)
    return big_ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={
            'table_ref': table_ref, 'big_key': big_key,
            'columns': list(columns)},
        batch_format='pyarrow',
        concurrency=concurrency,
    )
