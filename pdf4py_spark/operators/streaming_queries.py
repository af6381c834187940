"""Gated Structured Streaming queries: the streaming legs of batch
operators, drained with trigger(availableNow) so the result is a finite,
oracle-checkable DataFrame.

``events_hourly_stream`` is the streaming twin of
``relational.events_hourly`` in its PRODUCTION shape (r2 verdict):
readStream -> event-time watermark -> tumbling-window aggregation ->
APPEND-mode parquet sink with a checkpoint. Append + watermark is the
scale-safe configuration — state is bounded (windows older than the
watermark are evicted after emitting exactly once) and results land in
storage, not driver memory. The price is the streaming contract itself:
only CLOSED windows are emitted, so the SQL oracle restricts to windows
whose end <= max(ts) - watermark delay (boundary pinned INCLUSIVE by
tests/test_streaming_windowed.py::test_append_gate_boundary_semantics).
The complete-mode + memory-sink variant survives only in tests as a
tiny-fixture convenience, not as the gated query.

n_users is omitted (distinct aggregates are unsupported in streaming);
window arithmetic runs on event-time cast from TIMESTAMP_NTZ under an
explicitly pinned UTC session timezone (set for the duration of the
eager stream drain, then restored) and is emitted as epoch micros, so
the output is timezone-independent like the batch twin."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from . import QuerySpec

#: late-data horizon: windows are finalized once the watermark
#: (max event time - delay) passes their end
WATERMARK_DELAY = "2 hours"


def events_hourly_stream(spark, sf_dir):
    from ..streaming.windowed import EVENTS_SCHEMA

    out = "/tmp/pdf4py_spark_stream/%s" % uuid.uuid4().hex[:12]
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    # watermarks require TimestampType; pin the session tz for the NTZ
    # cast so wall time == absolute time while the drain runs
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        agg = (stream
               .withColumn("ts", F.col("ts").cast("timestamp"))
               .withWatermark("ts", WATERMARK_DELAY)
               .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count("*").alias("n_events"),
                    F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                            .cast("double"), 2).alias("value_sum"))
               .select(F.col("w.start").alias("hs"),
                       "event_type", "n_events", "value_sum"))
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("checkpointLocation", os.path.join(out, "_checkpoint"))
             .option("path", os.path.join(out, "counts"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    # hs was written as an absolute instant (UTC wall == NTZ wall);
    # unix_micros is timezone-independent on read-back
    return (spark.read.parquet(os.path.join(out, "counts"))
            .select(F.expr("unix_micros(hs)").alias("hour_start_us"),
                    "event_type", "n_events", "value_sum"))


EVENTS_HOURLY_STREAM_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS value_sum
FROM events
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
      <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
GROUP BY 1, 2
"""


QUERIES = {
    "events_hourly_stream": QuerySpec(events_hourly_stream,
                                      EVENTS_HOURLY_STREAM_SQL),
}
