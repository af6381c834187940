"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions are emitted once, respect the gap rule, and never contradict
the batch gaps-and-islands result."""

import os

import pytest

from pyspark.sql import functions as F

from pdf4py_spark.streaming.stateful import GAP_US, sessionize_stream

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available")


def test_stateful_sessionize(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sess_out")
    events = spark.read.parquet(SF + "/events.parquet")
    # time-ordered files so most sessions close cleanly within the drain
    (events.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
     .repartitionByRange(4, "us").drop("us")
     .write.mode("overwrite").parquet(src))

    sessionize_stream(spark, src, out)
    sessions = spark.read.parquet(os.path.join(out, "sessions"))
    rows = sessions.collect()
    assert rows, "expected some closed sessions"

    # structural invariants
    for r in rows:
        assert r["session_end_us"] >= r["session_start_us"]
        assert r["n_events"] >= 1
    # emit-once: no duplicate session identity
    assert sessions.groupBy("user_id", "session_start_us").count() \
        .where("count > 1").count() == 0

    # never contradicts the batch truth: every emitted session matches a
    # batch session with the same (user, start) and event count <= batch
    batch = (events
             .withColumn("ts", F.col("ts").cast("timestamp"))
             .withColumn("us", F.unix_micros("ts")))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run_w = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = (batch.withColumn("prev", F.lag("us").over(w))
               .withColumn("new", (F.col("prev").isNull()
                                   | ((F.col("us") - F.col("prev"))
                                      > GAP_US)).cast("long"))
               .withColumn("sid", F.sum("new").over(run_w)))
    truth = (flagged.groupBy("user_id", "sid")
             .agg(F.min("us").alias("session_start_us"),
                  F.max("us").alias("batch_end"),
                  F.count("*").alias("batch_n")))
    joined = sessions.join(truth, ["user_id", "session_start_us"], "left")
    assert joined.where("batch_n is null").count() == 0
    assert joined.where("n_events > batch_n").count() == 0

    # idempotent re-drain
    before = sessions.count()
    sessionize_stream(spark, src, out)
    assert spark.read.parquet(os.path.join(out, "sessions")).count() == before
