"""Scale stress for the round-2 operators: multi-million-row inputs,
single node, 32 cpus — verifies the exchange shapes hold when the
fixed per-exchange cost stops dominating and records throughput.

* asof_join: N left rows against N/4 right rows across 50k keys.
* connected_components: planted chain graph (100k chains x 4 nodes)
  -> must converge in few rounds and return exactly 100k components.
* hopping_window: N events, 3h/1h windows.

Usage: python scripts/stress_ops.py [N_events_millions]
Appends a block to BASELINE.md when run with --record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402


def make_events(n, seed=3):
    rng = np.random.RandomState(seed)
    base = np.datetime64('2024-01-01T00:00:00', 'us')
    ts = base + rng.randint(0, 90 * 24 * 3600, n).astype('timedelta64[s]')
    return pa.table({
        'event_id': pa.array(np.arange(n), type=pa.int64()),
        'user_id': pa.array(rng.randint(0, 50_000, n), type=pa.int64()),
        'ts': pa.array(ts.astype('datetime64[us]')),
        'event_type': pa.array(
            np.asarray(['click', 'view', 'purchase'], dtype=object)[
                rng.randint(0, 3, n)], type=pa.string()),
        'value': pa.array(rng.rand(n) * 100),
    })


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, log_to_driver=False)
    import ray.data

    from yargy_ray.stages.graph import connected_components
    from yargy_ray.stages.joins import asof_join
    from yargy_ray.stages.windows import hopping_window

    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 and \
        not sys.argv[1].startswith('-') else 4_000_000
    out = {'n_events': n}

    events = ray.data.from_arrow(make_events(n)).repartition(128)
    events = events.materialize()  # exclude generation from timings

    import __ray_entry__ as entrymod
    left = events.select_columns(['event_id', 'user_id', 'ts'])
    right = entrymod._sum_by_user_ts(
        events.filter(expr="event_type == 'purchase'")
        .select_columns(['user_id', 'ts', 'value']), 'pv',
        num_partitions=128)
    start = time.time()
    n_joined = asof_join(left, right, by='user_id', on='ts',
                         num_partitions=128).count()
    el = time.time() - start
    out['asof_join'] = {'rows': n_joined, 'sec': round(el, 1),
                       'rows_per_sec': round(n_joined / el)}

    start = time.time()
    n_win = hopping_window(events, size_hours=3, hop_hours=1).count()
    el = time.time() - start
    out['hopping_window'] = {'windows': n_win, 'sec': round(el, 1),
                             'events_per_sec': round(n / el)}

    # chain graph: 100k chains of 4 nodes (diameter forces 3+ rounds)
    k = 100_000
    a = np.concatenate([np.arange(k) * 4, np.arange(k) * 4 + 1,
                        np.arange(k) * 4 + 2])
    pairs = ray.data.from_arrow(pa.table({
        'a': pa.array(a, type=pa.int64()),
        'b': pa.array(a + 1, type=pa.int64()),
    })).repartition(64)
    start = time.time()
    comps = connected_components(pairs, num_partitions=64)
    n_comp = comps.groupby('component').count().count()
    el = time.time() - start
    assert n_comp == k, n_comp
    out['connected_components'] = {
        'nodes': 4 * k, 'components': n_comp, 'sec': round(el, 1)}

    # co-mention: 300k conversations x 8 entities from a 10k pool
    # -> 8.4M raw pair emissions through two exchanges
    n_convs, ents_per = 300_000, 8
    rng = np.random.RandomState(7)
    conv = np.repeat(np.arange(n_convs), ents_per)
    pool = np.array([f'ent-{i:05d}' for i in range(10_000)], dtype=object)
    trip = ray.data.from_arrow(pa.table({
        'conv_id': pa.array(np.char.mod('c%07d', conv.astype(np.int64)),
                            type=pa.string()),
        'subj': pa.array(np.char.mod('c%07d:0', conv.astype(np.int64)),
                         type=pa.string()),
        'pred': pa.array(['mentions_person'] * len(conv),
                         type=pa.string()),
        'obj': pa.array(pool[rng.randint(0, len(pool), len(conv))],
                        type=pa.string()),
    })).repartition(64).materialize()
    from yargy_ray.pipelines.kg import co_mention_edges
    start = time.time()
    n_edges = co_mention_edges(trip, num_partitions=64).count()
    el = time.time() - start
    out['co_mention_edges'] = {
        'convs': n_convs, 'edges': n_edges, 'sec': round(el, 1),
        'pairs_per_sec': round(n_convs * ents_per * (ents_per - 1) / 2
                               / el)}

    # two-hop: 2M random edges over 500k nodes (avg degree 4 -> ~32M
    # candidate pairs through the mid-join)
    from yargy_ray.stages.graph import two_hop_counts
    m, nn = 2_000_000, 500_000
    g = ray.data.from_arrow(pa.table({
        'src': pa.array(np.char.mod('n%06d',
                                    rng.randint(0, nn, m)),
                        type=pa.string()),
        'dst': pa.array(np.char.mod('n%06d',
                                    rng.randint(0, nn, m)),
                        type=pa.string()),
    })).repartition(64).materialize()
    start = time.time()
    n_nodes = two_hop_counts(g, num_partitions=64).count()
    el = time.time() - start
    out['two_hop_counts'] = {
        'edges': m, 'nodes_out': n_nodes, 'sec': round(el, 1),
        'edges_per_sec': round(m / el)}

    print(json.dumps(out))
    if '--record' in sys.argv:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'BASELINE.md')
        with open(path, 'a') as f:
            f.write('\n## Operator stress ({}) — scripts/stress_ops.py'
                    '\n\n`{}`\n'.format(
                        time.strftime('%Y-%m-%d %H:%M:%S'),
                        json.dumps(out)))
    ray.shutdown()


if __name__ == '__main__':
    main()
