"""Streaming sessionization: native session windows over the event stream.

The batch twin is ``corpus.events_sessionize`` (LAG + running-SUM
gaps-and-islands); here Structured Streaming's ``session_window`` maintains
the same gap semantics incrementally — a user's session stays open while
events keep arriving within the gap, closes (and is emitted, in append
mode) once the watermark passes session_end + gap.  State is per open
session per user, bounded by the watermark: the store never holds closed
sessions, which is what makes this viable on an unbounded 10^12-event
stream where the batch window form would need the full history.

Session identity note: a batch re-run numbers sessions 1..k per user
(dense session_no); the streaming emission identifies sessions by their
(start, end) interval instead — stable under restarts, no global per-user
counter.  tests/test_streaming.py asserts the INTERVALS agree exactly
with the batch operator's rollup.

Boundary semantics (MEASURED, pinned by the parity test): an event
arriving EXACTLY at session_end (= last_event + gap) still merges —
session_window coalesces touching windows.  The batch twin
(corpus.events_sessionize) therefore splits only on gap > 30 min
(open boundary), compared in exact integer microseconds; the parity
test pins this with exactly-at-gap and gap±1µs fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])

SESSION_GAP = "30 minutes"


def streaming_sessions(
    spark: SparkSession,
    input_location: str,
    watermark: str = "30 minutes",
    gap: str = SESSION_GAP,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream → per-(user, session) rollups.

    Append mode emits a session only once it can no longer grow (watermark
    past its end + gap), so every output row is final — the exactly-once
    analog of the batch rollup row.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_location)
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
        .select("user_id", "session_start", "session_end", "n_events")
    )
