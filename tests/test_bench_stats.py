"""bench.py stats parsing: pin the Dataset.stats() format assumptions
(per-operator rows/bytes extraction + shuffle-op classification)."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    'bench', os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'bench.py'))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


STATS = """Operator 1 ReadParquet->SplitBlocks(5): 5 tasks executed
* Output num rows per block: 10 min, 20 max, 15 mean, 42208 total
* Output size bytes per block: 1 min, 2 max, 1 mean, 4527016 total
Operator 2 MapBatches(TripleExtractor): 12 tasks executed
* Output num rows per block: 1 min, 2 max, 1 mean, 52044 total
* Output size bytes per block: 1 min, 2 max, 1 mean, 5610320 total
Operator 3 Repartition: executed in 1s
	Suboperator 0 RepartitionSplit: 12 tasks executed
	* Output num rows per block: 1 min, 2 max, 1 mean, 52044 total
	* Output size bytes per block: 1 min, 2 max, 1 mean, 5604173 total
	Suboperator 1 RepartitionReduce: 8 tasks executed
	* Output num rows per block: 1 min, 2 max, 1 mean, 52044 total
	* Output size bytes per block: 1 min, 2 max, 1 mean, 5551028 total
Operator 4 Sort: executed in 1s
	Suboperator 0 SortMap: 8 tasks
	* Output num rows per block: 1 min, 2 max, 1 mean, 52044 total
	* Output size bytes per block: 1 min, 2 max, 1 mean, 5759204 total
"""


def test_parse_stage_stats():
    stages, shuffle = bench.parse_stage_stats(STATS)
    by_op = {s['op']: s for s in stages}
    assert by_op['ReadParquet->SplitBlocks(5)']['rows'] == 42208
    assert by_op['MapBatches(TripleExtractor)']['bytes'] == 5610320
    # exchange suboperators counted, map operators not
    assert shuffle == 5604173 + 5551028 + 5759204
    # parent AllToAll headers carry no totals themselves
    assert by_op['Repartition']['bytes'] is None


def test_parse_empty_stats():
    stages, shuffle = bench.parse_stage_stats('')
    assert stages == [] and shuffle == 0
