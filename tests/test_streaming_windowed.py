"""Watermarked windowed streaming: finalized windows match the batch
aggregation; late-arriving data beyond the watermark is handled by the
append-once contract."""

import os

import pytest

from pyspark.sql import functions as F

from pdf4py_spark.streaming.windowed import run_windowed_stream

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available")


def test_windowed_counts_match_batch_for_closed_windows(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "agg_out")
    events = spark.read.parquet(SF + "/events.parquet")
    # several files -> several micro-batches -> the watermark advances
    events.repartition(4).write.mode("overwrite").parquet(src)

    run_windowed_stream(spark, src, out)

    streamed = spark.read.parquet(os.path.join(out, "counts"))
    batch = (events.withColumn("ts", F.col("ts").cast("timestamp"))
             .groupBy(F.window("ts", "1 hour")["start"].alias("hour_start"),
                      "event_type")
             .agg(F.count("*").alias("n_events")))

    # append-once: each finalized window emitted exactly once
    assert streamed.count() > 0
    assert streamed.groupBy("hour_start", "event_type").count() \
        .where("count > 1").count() == 0
    # a window never counts more than the batch truth (late rows beyond
    # the watermark are dropped, never double-counted), and every emitted
    # window exists in the batch result
    joined = streamed.alias("s").join(
        batch.alias("b"), ["hour_start", "event_type"], "left")
    assert joined.where("b.n_events is null").count() == 0
    assert joined.where("s.n_events > b.n_events").count() == 0

    # idempotent drain: no new data -> nothing new emitted
    before = streamed.count()
    run_windowed_stream(spark, src, out)
    after = spark.read.parquet(os.path.join(out, "counts")).count()
    assert after == before
