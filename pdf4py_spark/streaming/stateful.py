"""Custom stateful streaming operator: session assembly with
applyInPandasWithState.

Keeps one open session per user in group state; emits a session row when
a 30-minute silence closes it (either a later event arrives past the gap,
or the event-time timeout fires once the watermark passes). This is the
streaming twin of the batch gaps-and-islands query
(operators.relational.sessionize).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = ("user_id bigint, session_start_us bigint, "
                 "session_end_us bigint, n_events bigint")
STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint"


def assemble_sessions(key, batches, state: GroupState):
    """Fold this micro-batch's events for one user into the open-session
    state; yield every session closed by a gap, keep the rest in state."""
    (user_id,) = key
    stamps = []
    for pdf in batches:
        # ndarray.tolist() converts the whole int64 column to Python ints
        # in C (r6) — the per-element int(v) generator was the hot line of
        # the stateful kernel at 1M events/drain; values are identical
        stamps.extend(pdf["us"].to_numpy().tolist())
    closed = []

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
        state.remove()
    else:
        stamps.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        for us in stamps:
            if start_us is None:
                start_us, last_us, n = us, us, 1
            elif us - last_us > GAP_US:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = us, us, 1
            else:
                # an out-of-order event (us <= last_us, possible across
                # micro-batches) joins the open session without running
                # the clock backwards
                n += 1
                if us < start_us:
                    start_us = us
                if us > last_us:
                    last_us = us
        if start_us is not None:
            state.update((start_us, last_us, n))
            # close via event-time timeout once the watermark passes the
            # gap; never earlier than the current watermark (a group whose
            # last event trails the watermark must still get a valid timer)
            deadline_ms = last_us // 1000 + GAP_US // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1000))

    if closed:
        yield pd.DataFrame(closed, columns=[
            "user_id", "session_start_us", "session_end_us", "n_events"])


def sessionize_stream(spark: SparkSession, source_dir: str, output_dir: str,
                      files_per_trigger: int = 1):
    """availableNow drain: file stream -> watermark -> stateful session
    assembly -> parquet append (checkpointed, emit-once).

    ``files_per_trigger`` groups several mtime-ordered replay files into
    one micro-batch; the emitted session set is batch-boundary-invariant
    (gap closures depend only on per-user event order; timer closures on
    the FINAL watermark), pinned by tests and the r6 cross-width result
    hashes."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(source_dir)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withWatermark("ts", "1 hour")
              .withColumn("us", F.unix_micros("ts")))
    sessions = (stream.groupBy("user_id").applyInPandasWithState(
        assemble_sessions, OUTPUT_SCHEMA, STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout))
    query = (sessions.writeStream.outputMode("append")
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .start(os.path.join(output_dir, "sessions")))
    query.awaitTermination()
