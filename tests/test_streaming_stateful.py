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

    # accounting: emitted events never exceed the user's total (file
    # arrival order is not time order, so streamed session BOUNDARIES may
    # legitimately differ from the batch gaps-and-islands result; the
    # count bound and emit-once are the operator's guarantees)
    per_user_total = {r["user_id"]: r["n"] for r in
                      events.groupBy("user_id")
                      .agg(F.count("*").alias("n")).collect()}
    emitted = {}
    for r in rows:
        emitted[r["user_id"]] = emitted.get(r["user_id"], 0) + r["n_events"]
    for uid, n in emitted.items():
        assert n <= per_user_total[uid], uid
    assert GAP_US > 0  # sanity: constant imported and meaningful

    # idempotent re-drain
    before = sessions.count()
    sessionize_stream(spark, src, out)
    assert spark.read.parquet(os.path.join(out, "sessions")).count() == before


def _write_ordered_files(spark, df, src, preds):
    """One parquet file per predicate, mtimes ascending, so the file
    source replays them in that order."""
    import shutil
    for i, pred in enumerate(preds):
        part_dir = src + "_tmp"
        shutil.rmtree(part_dir, ignore_errors=True)
        df.where(pred).coalesce(1).write.parquet(part_dir)
        os.makedirs(src, exist_ok=True)
        name = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, "f%d.parquet" % i)
        shutil.copy(os.path.join(part_dir, name), dst)
        os.utime(dst, (1_000_000 + i * 10, 1_000_000 + i * 10))
        shutil.rmtree(part_dir)


def test_stateful_gate_semantics_and_timeout_boundary(spark, tmp_path):
    """Pins the THREE facts the sessions_stream oracle relies on:

    1. the terminal no-data batch fires event-time timers, so a user's
       last session emits when its deadline has passed the final
       watermark (u101's 12:00 lone event, u102);
    2. the timer comparison is STRICT — deadline == final watermark
       stays open (u104: last event 18:30, deadline 19:00:00.000 equals
       watermark max(20:00) - 1h exactly, must NOT emit);
    3. a session past the watermark horizon stays open (u103 at the max
       event time itself).
    """
    from pyspark.sql import functions as F

    src, out = str(tmp_path / "in"), str(tmp_path / "bout")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = [
            (1, 101, "t", "2024-01-01 10:00:00", 1.0),
            (2, 101, "t", "2024-01-01 10:10:00", 1.0),
            (3, 102, "t", "2024-01-01 10:05:00", 1.0),
            (4, 101, "t", "2024-01-01 12:00:00", 1.0),
            (5, 104, "t", "2024-01-01 18:30:00", 1.0),
            (6, 103, "t", "2024-01-01 20:00:00", 1.0),
        ]
        df = (spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, "
                  "ts_s string, value double")
            .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
            .select("event_id", "user_id", "event_type", "ts", "value"))
        _write_ordered_files(spark, df, src, [
            "event_id <= 3", "event_id in (4, 5)", "event_id = 6"])
        sessionize_stream(spark, src, out)
        got = sorted(
            (r["user_id"], r["session_start_us"] // 1_000_000,
             r["n_events"])
            for r in spark.read.parquet(
                os.path.join(out, "sessions")).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    base = 1704103200  # 2024-01-01 10:00:00 UTC
    assert got == [
        (101, base, 2),          # gap-closed by the 12:00 event
        (101, base + 7200, 1),   # timeout via the terminal no-data batch
        (102, base + 300, 1),    # timeout
        # u103 (open at max ts) and u104 (deadline == watermark) withheld
    ]


def test_dedup_stream_watermark_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark evidence: co-timed duplicates
    collapse to one row; a duplicate arriving AFTER the watermark passed
    its event time is late data and is dropped (not re-emitted), so the
    sink stays exactly-once even though the key's state was evicted."""
    import os as _os

    from pyspark.sql import functions as F

    src, out = str(tmp_path / "din"), str(tmp_path / "dout")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = [
            (1, "same-A", "2024-01-01 10:00:00"),   # file 0
            (2, "same-A", "2024-01-01 10:00:00"),   # file 0 (co-timed dup)
            (3, "only-B", "2024-01-01 10:05:00"),   # file 0
            (4, "only-C", "2024-01-01 14:00:00"),   # file 1: wm -> 13:30
            (5, "same-A", "2024-01-01 10:00:00"),   # file 2: late dup
            (6, "only-D", "2024-01-01 15:00:00"),   # file 2
        ]
        df = (spark.createDataFrame(
            rows, "doc_id bigint, text string, ts_s string")
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
            .select("doc_id", "text", "ts"))
        _write_ordered_files(spark, df, src, [
            "doc_id <= 3", "doc_id = 4", "doc_id >= 5"])
        stream = (spark.readStream
                  .schema("doc_id bigint, text string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("text_hash", F.md5("text"))
                  .withWatermark("ts", "30 minutes")
                  .dropDuplicatesWithinWatermark(["text_hash"]))
        q = (stream.select("text", "text_hash")
             .writeStream.outputMode("append").format("parquet")
             .option("checkpointLocation", _os.path.join(out, "_chk"))
             .option("path", _os.path.join(out, "hashes"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = sorted(r["text"] for r in spark.read.parquet(
            _os.path.join(out, "hashes")).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got == ["only-B", "only-C", "only-D", "same-A"], got
