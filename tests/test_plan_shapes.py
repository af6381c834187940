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
    "bigram_pmi",         # crossJoin(broadcast(<one-row unigram total>))
}


def test_no_cartesian_and_nlj_only_where_declared(spark):
    import __spark_entry__ as entry_mod
    for name, fn in sorted(entry_mod.queries().items()):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in NLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, name


def _round_sorted(pattern):
    """Artifacts sorted by ROUND NUMBER, not lexicographically: 'r10' <
    'r4' as a string, which would silently validate a stale artifact."""
    import glob
    import re

    root = os.path.dirname(os.path.abspath(__file__ + "/.."))
    return sorted(
        glob.glob(os.path.join(root, pattern)),
        key=lambda p: int(re.search(r"_r0*(\d+)", p).group(1)))


def test_correctness_artifact_covers_all_queries():
    """Gate-completeness (VERDICT r3 #2 + r4 advice #1): the driver's
    newest CORRECTNESS_r*.json rotates a query subset, so (a) any
    artifact row for a REMOVED query fails (stale gate), and (b) any
    query that was gated in a PRIOR driver artifact but is absent from
    the newest one must at least appear in the newest committed
    PARITY_r*.json (coverage may rotate, it must never silently
    shrink). Queries newer than every artifact warn only."""
    import json
    import warnings

    import __spark_entry__ as entry_mod

    arts = _round_sorted("CORRECTNESS_r*.json")
    if not arts:
        pytest.skip("no driver correctness artifact yet")
    with open(arts[-1]) as fh:
        gated = set(json.load(fh))
    qkeys = set(entry_mod.queries())
    stale = gated - qkeys
    assert not stale, "artifact rows for removed queries: %s" % stale
    ever_gated = set()
    for p in arts[:-1]:
        with open(p) as fh:
            ever_gated |= set(json.load(fh))
    parity = _round_sorted("PARITY_r*.json")
    covered_by_parity = set()
    if parity:
        with open(parity[-1]) as fh:
            covered_by_parity = set(json.load(fh))
    dropped = (ever_gated & qkeys) - gated - covered_by_parity
    assert not dropped, (
        "queries gated in a prior round are covered by NEITHER the "
        "newest driver artifact nor the newest PARITY_r*.json: %s"
        % sorted(dropped))
    missing = qkeys - gated - ever_gated - covered_by_parity
    if missing:
        warnings.warn(
            "queries not covered by any committed artifact yet (added "
            "mid-round? regenerate PARITY with tools/check_parity.py "
            "--json-out): %s" % sorted(missing))


def test_parity_artifact_is_complete_and_green():
    """VERDICT r4 #3: the committed full-coverage parity artifact
    (PARITY_r{N}.json, self-run via tools/check_parity.py --json-out)
    must list EVERY registered query and every listed row must be
    green (hash-matched, or rows-only for the declared non-SQL ops)."""
    import json

    import __spark_entry__ as entry_mod

    parity = _round_sorted("PARITY_r*.json")
    if not parity:
        pytest.skip("no committed parity artifact yet (first round)")
    with open(parity[-1]) as fh:
        rec = json.load(fh)
    qkeys = set(entry_mod.queries())
    missing = qkeys - set(rec)
    assert not missing, (
        "%s does not cover: %s — rerun tools/check_parity.py --json-out"
        % (os.path.basename(parity[-1]), sorted(missing)))
    bad = [n for n, r in rec.items()
           if not (r.get("rows_only") or r.get("hash_match"))]
    assert not bad, "non-green parity rows: %s" % sorted(bad)
