"""Gated Structured Streaming queries: the streaming legs of batch
operators, drained with trigger(availableNow) so the result is a finite,
oracle-checkable DataFrame.

``events_hourly_stream`` is the streaming twin of
``relational.events_hourly``: same tumbling 1-hour windows over the same
events table, executed through readStream -> stateful aggregation ->
memory sink. COMPLETE output mode makes every window visible at drain
time so the batch SQL oracle is total (production uses append mode +
watermark — streaming/windowed.py — where only closed windows emit;
n_users is omitted because distinct aggregates are unsupported in
streaming). Window arithmetic stays on TIMESTAMP_NTZ and is emitted as
epoch micros, exactly like the batch twin."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from . import QuerySpec


def events_hourly_stream(spark, sf_dir):
    from ..streaming.windowed import EVENTS_SCHEMA

    name = "ev_hourly_" + uuid.uuid4().hex[:10]
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    agg = (stream.groupBy(
        F.window("ts", "1 hour")["start"].alias("hs"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double"), 2).alias("value_sum")))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.expr("timestampdiff(MICROSECOND, "
                           "TIMESTAMP_NTZ '1970-01-01 00:00:00', hs)")
                    .alias("hour_start_us"),
                    "event_type", "n_events", "value_sum"))


EVENTS_HOURLY_STREAM_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS value_sum
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "events_hourly_stream": QuerySpec(events_hourly_stream,
                                      EVENTS_HOURLY_STREAM_SQL),
}
