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


def test_append_gate_boundary_semantics(spark, tmp_path):
    """Pins the closed-window boundary the gated events_hourly_stream
    oracle relies on: with watermark delay D, a window is emitted iff
    window_end <= max(ts) - D, INCLUSIVE at equality. Data: events at
    00:30..04:30 plus one at exactly 05:00 -> watermark 03:00 -> windows
    h0,h1,h2 emit (h2 ends exactly AT the watermark), h3+ do not."""
    import datetime

    from pdf4py_spark.streaming.windowed import EVENTS_SCHEMA

    import glob
    import shutil

    src = str(tmp_path / "ev_in")
    staged = str(tmp_path / "staged")
    rows = [(h, datetime.datetime(2026, 1, 1, h, 30), 1, "c", 1.0, "")
            for h in range(5)]
    rows.append((99, datetime.datetime(2026, 1, 1, 5, 0), 1, "c", 1.0, ""))
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(staged)
    # the gated query scans <sf_dir>/events.parquet (a single FILE, like
    # the driver testdata layout)
    os.makedirs(src)
    shutil.copy(glob.glob(staged + "/part-*.parquet")[0],
                src + "/events.parquet")

    from pdf4py_spark.operators.streaming_queries import events_hourly_stream
    got = sorted(r["hour_start_us"] for r in
                 events_hourly_stream(spark, src).collect())
    epoch = datetime.datetime(1970, 1, 1)
    us = [int((datetime.datetime(2026, 1, 1, h) - epoch).total_seconds()
              * 1_000_000) for h in range(3)]
    assert got == us
