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

import pyarrow as pa


class BroadcastLookup:
    """map_batches callable: per-batch Arrow hash join against the
    broadcast small-side table (read ONCE per actor from the local
    object store; the probe is pyarrow's vectorized hash join)."""

    def __init__(self, table_ref, big_key, small_key):
        import ray
        self.small = ray.get(table_ref)
        self.big_key = big_key
        self.small_key = small_key

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.big_key,
                          right_keys=self.small_key, join_type='inner')


def broadcast_join(big_ds, small_ds, big_key, small_key, columns,
                   concurrency=(1, 4)):
    # autoscaling (min, max) pool: a fixed-size pool would reserve its
    # CPUs up front and can starve upstream read tasks on small hosts
    """Inner join: big side streams, small side broadcast once.

    The small side is collected as ONE Arrow table (block refs fetched
    in parallel, no per-row driver RPC), ``ray.put`` once, and every
    actor joins each streaming batch against it with
    ``pyarrow.Table.join`` — no shuffle, no per-row Python.

    ``columns``: the small-side columns to attach to matching rows.
    Assumes small-side keys are unique (dimension-table contract).
    """
    import ray
    small = pa.concat_tables(
        ray.get(small_ds.select_columns(
            [small_key] + list(columns)).to_arrow_refs()),
        promote_options='default')
    table_ref = ray.put(small)
    return big_ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={
            'table_ref': table_ref, 'big_key': big_key,
            'small_key': small_key},
        batch_format='pyarrow',
        concurrency=concurrency,
    )
