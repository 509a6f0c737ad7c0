"""Decontamination at realistic benchmark scale (VERDICT r4 #8).

The decontam operator broadcasts the DISTINCT benchmark n-gram set
once (``ray.put``) and streams the training corpus through vectorized
``is_in``. The r4 driver query exercises a toy benchmark; this stress
builds a ~10M-distinct-3-gram benchmark (hundreds of MB as one Arrow
string array — the size of a real multi-benchmark eval suite) and
measures (a) the broadcast set's bytes, (b) set-build time, (c) count
throughput over a 400k-doc training stream, and (d) object-store
spill. Planted contamination verifies counts end-to-end at scale.

Usage: python scripts/stress_decontam.py [n_bench_docs_thousands]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

VOCAB = 40_000
BENCH_TOKS = 30
TRAIN_TOKS = 50


def _doc_table(rng, n_docs, n_toks, tokens, start_id=0):
    mat = rng.randint(0, VOCAB, (n_docs, n_toks))
    flat = pa.array(tokens[mat.ravel()], type=pa.string())
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = pa.array(np.arange(0, n_docs * n_toks + 1, n_toks,
                                 dtype=np.int32))
    texts = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), ' ')
    return pa.table({
        'doc_id': pa.array(np.arange(start_id, start_id + n_docs),
                           type=pa.int64()),
        'text': texts,
    })


def main():
    import ray
    import ray.data

    from yargy_ray.stages.decontam import (
        benchmark_ngram_set,
        contamination_counts,
    )

    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, log_to_driver=False)

    n_bench = (int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1
               else 350_000)
    rng = np.random.RandomState(7)
    tokens = np.array([f't{i:05d}' for i in range(VOCAB)])

    bench_tbl = _doc_table(rng, n_bench, BENCH_TOKS, tokens)
    bench = ray.data.from_arrow(bench_tbl).repartition(64).materialize()

    t0 = time.time()
    grams = benchmark_ngram_set(bench, n=3)
    t_build = time.time() - t0
    gram_bytes = sum(b.size for b in grams.buffers() if b is not None)

    # training corpus: 400k docs; every 100th doc gets a bench doc's
    # exact text appended -> each contributes BENCH_TOKS-2 hits plus
    # one stitch gram (unlikely to collide) and random background hits
    n_train = 400_000
    train_tbl = _doc_table(rng, n_train, TRAIN_TOKS, tokens,
                           start_id=10_000_000)
    texts = train_tbl.column('text').to_pylist()
    bench_texts = bench_tbl.column('text').to_pylist()
    planted = list(range(0, n_train, 100))
    for i in planted:
        texts[i] = texts[i] + ' ' + bench_texts[i % n_bench]
    train_tbl = pa.table({
        'doc_id': train_tbl.column('doc_id'),
        'text': pa.array(texts, type=pa.string()),
    })
    train = ray.data.from_arrow(train_tbl).repartition(128).materialize()

    t0 = time.time()
    pool = max(4, int(os.environ.get('RAY_GRAFT_CPUS', '32')) - 8)
    out = contamination_counts(train, bench, n=3, concurrency=pool)

    def reduce_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            'docs': pa.array([batch.num_rows], pa.int64()),
            'contaminated_docs': pa.array(
                [_pc.sum(_pc.greater(
                    batch.column('n_contaminated'), 0)).as_py() or 0],
                pa.int64()),
            'hits': pa.array(
                [_pc.sum(batch.column('n_contaminated')).as_py() or 0],
                pa.int64()),
        })

    parts = out.map_batches(reduce_part, batch_format='pyarrow') \
        .take_all()
    t_count = time.time() - t0
    docs = sum(p['docs'] for p in parts)
    contaminated = sum(p['contaminated_docs'] for p in parts)
    hits = sum(p['hits'] for p in parts)

    assert docs == n_train, docs
    # every planted doc carries >= BENCH_TOKS-2 guaranteed hits
    assert contaminated >= len(planted), (contaminated, len(planted))
    assert hits >= len(planted) * (BENCH_TOKS - 2), hits

    os.environ.setdefault('GRAFT_SF_DIR', '/root/testdata/sf0.1')
    import bench
    spilled = bench.spilled_mib()
    print(json.dumps({
        'bench_docs': n_bench,
        'distinct_grams': len(grams),
        'gram_set_mib': round(gram_bytes / 2**20, 1),
        'set_build_sec': round(t_build, 2),
        'train_docs': docs,
        'count_sec': round(t_count, 2),
        'train_docs_per_sec': int(docs / t_count),
        'contaminated_docs': contaminated,
        'planted_docs': len(planted),
        'spilled_mib': spilled,
    }))
    ray.shutdown()


if __name__ == '__main__':
    main()
