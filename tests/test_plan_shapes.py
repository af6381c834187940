"""Optimizer-shape regression gate over EVERY gated query plan: no
accidental cartesian products, nested-loop joins only where declared
(the brute-force cosine baseline and BM25's one-row stats broadcast).
Per-row Python absence is covered by test_no_query_uses_row_python."""

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available")

#: queries whose plan legitimately contains a BroadcastNestedLoopJoin
NLJ_ALLOWED = {
    "ann_cosine_topk",    # the declared exactness baseline: full cross join
    "bm25_search",        # crossJoin(broadcast(<one-row corpus stats>))
    "ann_bucketed_topk",  # n x K centroid scoring: broadcast of K=8 rows
}


def test_no_cartesian_and_nlj_only_where_declared(spark):
    import __spark_entry__ as entry_mod
    for name, fn in sorted(entry_mod.queries().items()):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in NLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, name
