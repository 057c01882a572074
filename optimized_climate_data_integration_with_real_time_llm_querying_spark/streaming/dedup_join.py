"""Streaming ingest dedup + stream-stream interval join.

Two more incremental shapes a training-data pipeline runs
continuously (net-new vs the reference, whose pipelines are batch
notebooks — SURVEY.md §2.9):

- **Ingest dedup**: at-least-once transports (Kafka, file drops,
  retried uploads) deliver duplicate events; dedup at ingest with
  ``dropDuplicatesWithinWatermark`` keeps state bounded by the
  watermark (state ~ #distinct keys inside the lateness horizon, not
  the stream's lifetime — the unbounded-state mistake a plain
  ``dropDuplicates`` would make).
- **Interval join**: correlate two event streams per user within a
  time window (click -> purchase attribution, doc-fetch ->
  doc-process lineage). Both sides carry watermarks and the join
  condition bounds event time on both sides, so Spark can evict
  state; the join itself is a hash equi-join on the key with a range
  predicate, shuffling each side once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate events arriving within the watermark horizon.

    ``keys`` defaults to ``[event_id]``. State holds one entry per
    distinct key seen inside the horizon and is evicted as the
    watermark advances — safe to run forever.
    """
    keys = keys or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Join events of two streams per ``key`` where the right event
    happens in (left.ts, left.ts + within]. Returns one row per
    matched pair with both timestamps and event types.

    Both inputs get watermarks and the condition bounds ``r_ts``
    relative to ``l_ts`` on both sides — the requirements for Spark
    to bound join state in append mode.
    """
    l = (
        left.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col(ts_col).alias("l_ts"),
            F.col("event_type").alias("l_type"),
            F.col("event_id").alias("l_id"),
        )
    )
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col(ts_col).alias("r_ts"),
            F.col("event_type").alias("r_type"),
            F.col("event_id").alias("r_id"),
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key), "l_id", "l_type", "l_ts", "r_id", "r_type", "r_ts"
    )
