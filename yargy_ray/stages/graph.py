"""Distributed graph operators over pair/edge tables.

``connected_components`` turns near-duplicate PAIRS (the dedup family's
output) into duplicate CLUSTERS — the step a real dedup pipeline needs
before choosing survivors. Min-label propagation: every node starts
labeled with itself; each round every node takes the min label among
itself and its neighbors; fixpoint = components labeled by their min
node id.

Scale shape: an iterative algorithm is a driver-coordinated LOOP of
exchanges (Ray Data has no native iteration). Per round: one
co-partitioning exchange of (labels ∪ edges) keyed by source emits
min-label messages along edges, one exchange keyed by node min-reduces
them; a pointer-jump exchange (label <- label(label)) then doubles the
propagation distance, so rounds = O(log diameter), not O(diameter) —
safe for long-chain graphs, not just shallow dedup clusters.
Labels are materialized per round (bounded: one row per node); edges
re-shuffle each round, which a longer-lived job would avoid by
persisting edge partitions once (same manifest machinery as the IVF
index) — documented trade-off, not a correctness issue. Convergence is
detected by the monotone label-sum invariant: per-node labels only ever
decrease, so an unchanged global sum == fixpoint (no join needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _symmetrize(batch: pa.Table, a: str, b: str) -> pa.Table:
    src = pa.concat_arrays([
        pc.cast(batch.column(a), pa.int64()).combine_chunks(),
        pc.cast(batch.column(b), pa.int64()).combine_chunks(),
    ])
    dst = pa.concat_arrays([
        pc.cast(batch.column(b), pa.int64()).combine_chunks(),
        pc.cast(batch.column(a), pa.int64()).combine_chunks(),
    ])
    return pa.table({'src': src, 'dst': dst})


def connected_components(pairs_ds, a='a', b='b', num_partitions=64,
                         max_rounds=50, pointer_jump=True):
    """(a, b) undirected pair table -> (node, component) — component is
    the min node id reachable from the node. Only nodes appearing in
    pairs are returned (isolated nodes are their own components by
    definition and never ship through the exchanges).

    ``pointer_jump`` adds a label<-label(label) exchange per round:
    ~30% more per-round cost, but rounds drop from O(diameter) to
    O(log diameter). Keep it on unless the graph is known-shallow
    (tight dup clusters), where False saves the extra exchange."""
    import ray.data

    from yargy_ray.stages.exchange import partitioned_reduce

    edges = pairs_ds.map_batches(
        lambda t: _symmetrize(t, a, b), batch_format='pyarrow')

    def init_labels(batch: pa.Table) -> pa.Table:
        node = batch.column('src')
        return pa.table({'node': node, 'label': node})

    def dedup_nodes(table: pa.Table) -> pa.Table:
        df = table.select(['node', 'label']).to_pandas()
        df = df.groupby('node', sort=False, as_index=False)['label'].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    labels = partitioned_reduce(
        edges.map_batches(init_labels, batch_format='pyarrow'),
        'node', dedup_nodes, num_partitions,
        coalesce='auto').materialize()

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if side == 0:   # labels: key on node
                return pa.table({
                    'key': batch.column('node'),
                    'other': batch.column('label'),
                    'side': pa.array(np.zeros(n, dtype=np.int8)),
                })
            return pa.table({  # edges: key on src
                'key': batch.column('src'),
                'other': batch.column('dst'),
                'side': pa.array(np.ones(n, dtype=np.int8)),
            })
        return fn

    def propagate(table: pa.Table) -> pa.Table:
        """One co-partitioned round: per src, message min(label) to
        every neighbor, plus keep (node, label) itself."""
        df = table.select(['key', 'other', 'side']).to_pandas()
        lab = df[df['side'] == 0]
        edg = df[df['side'] == 1]
        msgs = edg.merge(
            lab.rename(columns={'key': 'src', 'other': 'label'}),
            left_on='key', right_on='src', how='inner')
        out_node = np.concatenate([lab['key'].to_numpy(),
                                   msgs['other'].to_numpy()])
        out_label = np.concatenate([lab['other'].to_numpy(),
                                    msgs['label'].to_numpy()])
        return pa.table({
            'node': pa.array(out_node, type=pa.int64()),
            'label': pa.array(out_label, type=pa.int64()),
        })

    def tag_req(batch: pa.Table) -> pa.Table:
        # shortcut request: keyed by the node's CURRENT label
        n = batch.num_rows
        return pa.table({
            'key': batch.column('label'),
            'other': batch.column('node'),
            'side': pa.array(np.zeros(n, dtype=np.int8)),
        })

    def shortcut(table: pa.Table) -> pa.Table:
        """Pointer jump: label(node) <- label(label(node)). Labels only
        ever decrease (label(label) <= label), so the sum invariant is
        preserved; co-partitioning on ``key`` lines each request up
        with its label's own label row."""
        df = table.select(['key', 'other', 'side']).to_pandas()
        req = df[df['side'] == 0]
        lut = df[df['side'] == 1]
        merged = req.merge(
            lut.rename(columns={'other': 'label2'}),
            on='key', how='inner')
        return pa.table({
            'node': pa.array(merged['other'].to_numpy(dtype=np.int64),
                             type=pa.int64()),
            'label': pa.array(merged['label2'].to_numpy(dtype=np.int64),
                              type=pa.int64()),
        })

    prev_sum = None
    for _ in range(max_rounds):
        # 1) neighbor propagation (min label along edges)
        tagged = (labels.map_batches(tag(0), batch_format='pyarrow')
                  .union(edges.map_batches(tag(1),
                                           batch_format='pyarrow')))
        msgs = partitioned_reduce(tagged, 'key', propagate,
                                  num_partitions, coalesce='auto')
        labels = partitioned_reduce(msgs, 'node', dedup_nodes,
                                    num_partitions,
                                    coalesce='auto').materialize()
        # 2) pointer jump (label-of-label) — doubles the propagation
        # distance per round, so rounds = O(log diameter) not O(diameter)
        if not pointer_jump:
            cur_sum = labels.sum('label')
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
            continue
        jump_tagged = (labels.map_batches(tag_req,
                                          batch_format='pyarrow')
                       .union(labels.map_batches(tag(0),
                                                 batch_format='pyarrow')
                              .map_batches(
                                  lambda t: t.set_column(
                                      2, 'side', pa.array(
                                          np.ones(t.num_rows,
                                                  dtype=np.int8))),
                                  batch_format='pyarrow')))
        labels = partitioned_reduce(jump_tagged, 'key', shortcut,
                                    num_partitions,
                                    coalesce='auto').materialize()
        cur_sum = labels.sum('label')
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(['node', 'component'])

    return labels.map_batches(rename, batch_format='pyarrow')
