"""Event-time windowed aggregation with watermarking (SURVEY.md §2.13; the
driver brief's "watermarks + windowed aggs for late data" leg).

Batch analogs (`w4_top3_per_page`, `f2_recurring_keys`) group by calendar
day; this is the streaming-native form: tumbling event-time windows over a
continuously-arriving event table, with a watermark bounding how late a
row may arrive and still be counted.  State is O(open windows × keys) and
the watermark is what lets Spark finalize + evict windows — without it,
state grows unboundedly at 10^12-event scale.

``outputMode("append")`` emits a window's counts exactly once, when the
watermark passes its end — the semantics a downstream consumer of
"finalized" per-window stats wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, user_id long, event_type string, "
                 "ts timestamp, value double")


def windowed_event_counts(
    spark: SparkSession,
    input_location: str,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (window_start, window_end, event_type, n_events, sum_value):
    one row per finalized tumbling window per event type.

    Rows later than ``watermark`` behind the max observed event time are
    dropped (late-data policy); everything else lands in its event-time
    window regardless of arrival order.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_location)
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             # decimal accumulator for order-independent exact sums; scale 6
             # so sub-cent values are summed, not quantized away per row
             # (decimal(18,2) rounded each ROW — a 0.004-per-event stream
             # summed to 0.00)
             F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
              .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )
