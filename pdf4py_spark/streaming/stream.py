"""Streaming extraction: file-source stream over a pages directory,
Arrow kernel applied per micro-batch, parquet sink, exactly-once via
checkpointed offsets + idempotent batch ids."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..plans.pipeline import extract_pages
from ..sources.pages import PAGES_SCHEMA


def extraction_stream(spark: SparkSession, source_dir: str, output_dir: str,
                      checkpoint_dir: str = None, passwords=None,
                      num_partitions: int = None):
    """Build (unstarted) the streaming query: new parquet files appearing
    under ``source_dir`` are extracted and appended to ``output_dir``."""
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 16)
              .parquet(source_dir))

    def handle_batch(batch_df, batch_id: int):
        result = extract_pages(batch_df, num_partitions=num_partitions,
                               passwords=passwords)
        (result.write.mode("append")
         .parquet(os.path.join(output_dir, "extracted")))

    return (stream.writeStream
            .foreachBatch(handle_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def run_stream_once(spark: SparkSession, source_dir: str, output_dir: str,
                    **kwargs) -> None:
    """Drain everything currently in the source (availableNow trigger) and
    stop — the batch-shaped invocation used by tests."""
    query = extraction_stream(spark, source_dir, output_dir, **kwargs).start()
    query.awaitTermination()
