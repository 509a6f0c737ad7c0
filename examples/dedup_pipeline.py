"""End-to-end example: the training-data dedup path on this engine.

documents -> SimHash near-dup PAIRS -> connected-component CLUSTERS ->
min-id survivors -> deterministic train/val/test split of survivors.

Every stage is a scale-shaped Ray Data composition (bucketed
exchanges, vectorized verifies, no per-group UDFs) — the same code
path a 100 TB corpus would stream through.

Run:  python examples/dedup_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(address='local', num_cpus=8, include_dashboard=False,
             log_to_driver=False)

import pyarrow as pa  # noqa: E402
import ray.data  # noqa: E402

from yargy_ray.stages.dedup import simhash_near_dups  # noqa: E402
from yargy_ray.stages.graph import connected_components  # noqa: E402
from yargy_ray.stages.sampling import hash_split  # noqa: E402

# -- a corpus with planted near-duplicates ---------------------------------
base = [
    'платеж проведен успешно через шлюз номер {} в штатном режиме',
    'отчет о доставке сформирован для клиента {} без замечаний',
    'система мониторинга зафиксировала событие {} в кластере логов',
]
rows = []
for i in range(300):
    text = base[i % 3].format(i // 3)
    rows.append({'doc_id': i, 'text': text})
    if i % 10 == 0:  # plant a near-dup: small suffix edit
        rows.append({'doc_id': 1000 + i, 'text': text + ' повторно'})
docs = ray.data.from_arrow(pa.Table.from_pylist(rows))

# -- pairs -> clusters -> survivors ----------------------------------------
pairs = simhash_near_dups(docs, max_hamming=3)
comps = connected_components(pairs, num_partitions=8)

# survivor = min doc_id of each cluster; docs not in any pair survive too
comp_df = comps.to_pandas()          # small: one row per clustered doc
dupes = set(comp_df.loc[comp_df['node'] != comp_df['component'], 'node'])
survivors = docs.filter(lambda r: r['doc_id'] not in dupes)

# -- deterministic split of the survivors ----------------------------------
split = hash_split(survivors.select_columns(['doc_id']), 'doc_id')
counts = split.groupby('split').count().to_pandas()

n_pairs = pairs.count()
n_clusters = comp_df['component'].nunique()
print(f'{docs.count()} docs -> {n_pairs} near-dup pairs '
      f'-> {n_clusters} clusters -> {survivors.count()} survivors')
print(counts.to_string(index=False))

ray.shutdown()
