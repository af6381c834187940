"""Watermarked windowed aggregation over the events stream.

Demonstrates the late-data contract: tumbling 1-hour windows with a
2-hour watermark; in append mode a window row is emitted exactly once,
when the watermark passes its end. The same aggregation shape as the
batch operator `operators.relational.events_hourly`, so the batch query
doubles as the finalized-window oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampNTZType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def windowed_event_counts(stream_df):
    """The aggregation plan (shared by stream and its batch oracle).
    Watermarks require TimestampType; the NTZ column is cast against the
    session timezone (pin spark.sql.session.timeZone=UTC for stability).
    """
    return (stream_df
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events"))


def run_windowed_stream(spark: SparkSession, source_dir: str,
                        output_dir: str) -> None:
    """Drain the source with availableNow; append-mode emits each
    finalized window exactly once across restarts (checkpointed)."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    query = (windowed_event_counts(stream)
             .writeStream.outputMode("append")
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .start(os.path.join(output_dir, "counts")))
    query.awaitTermination()
