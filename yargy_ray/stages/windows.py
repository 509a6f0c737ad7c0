"""Windowed / sessionized aggregation over the events stream table.

Ray Data has no native session windows; both operators here are the
canonical composition: hash-partition by key (groupby) + in-group sort
by time — each group is one user's events, bounded and local. At
10^12-event scale the groupby is the one shuffle; tumbling windows
pre-aggregate map-side (per-batch partial counts) before the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _sessionize_group(group: pa.Table, gap_us: int) -> pa.Table:
    user = group.column('user_id')[0].as_py()
    ts = group.column('ts').to_pylist()
    eids = group.column('event_id').to_pylist()
    values = group.column('value').to_pylist()
    order = sorted(range(len(ts)), key=lambda i: (ts[i], eids[i]))
    rows = []
    session = -1
    prev = None
    start = end = None
    n = 0
    total = 0.0
    for i in order:
        t = ts[i]
        if prev is None or (t - prev).total_seconds() * 1e6 > gap_us:
            if session >= 0:
                rows.append((user, session, n, start, end, total))
            session += 1
            n = 0
            total = 0.0
            start = t
        n += 1
        total += values[i]
        end = t
        prev = t
    if session >= 0:
        rows.append((user, session, n, start, end, total))
    return pa.table({
        'user_id': pa.array([r[0] for r in rows], type=pa.int64()),
        'session_id': pa.array([r[1] for r in rows], type=pa.int64()),
        'n_events': pa.array([r[2] for r in rows], type=pa.int64()),
        'start_ts': pa.array([r[3] for r in rows], type=pa.timestamp('us')),
        'end_ts': pa.array([r[4] for r in rows], type=pa.timestamp('us')),
        'sum_value': pa.array([r[5] for r in rows], type=pa.float64()),
    })


def sessionize(events_ds, gap_minutes=30):
    """Gap-based sessions per user: one groupby, in-group time sort."""
    gap_us = int(gap_minutes * 60 * 1e6)

    def fn(group):
        return _sessionize_group(group, gap_us)

    return events_ds.groupby('user_id').map_groups(fn,
                                                   batch_format='pyarrow')


def _tumbling_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine: (event_type, hour) partial counts and sums."""
    hours = pc.floor_temporal(batch.column('ts'), unit='hour')
    tbl = pa.table({
        'event_type': batch.column('event_type'),
        'window_start': hours,
        'n': pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        'sum_value': batch.column('value'),
    })
    # aggregate within the batch before the shuffle
    return pa.TableGroupBy(tbl, ['event_type', 'window_start']).aggregate(
        [('n', 'sum'), ('sum_value', 'sum')]
    ).rename_columns(['event_type', 'window_start', 'n', 'sum_value'])


def tumbling_window(events_ds, unit='hour'):
    """Per (event_type, hour) event count + value sum."""
    partial = events_ds.map_batches(_tumbling_partial,
                                    batch_format='pyarrow')
    return (
        partial.groupby(['event_type', 'window_start'])
        .sum(['n', 'sum_value'])
        .rename_columns({'sum(n)': 'n_events',
                         'sum(sum_value)': 'sum_value'})
    )
