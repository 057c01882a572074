"""Streaming sessionization: ``session_window`` with a gap timeout —
the incremental twin of the batch lag-window sessionization
(``queries.streaming_shapes.user_sessionization``).

The batch form needs the whole per-user history to compute lag();
the streaming form holds only OPEN sessions as state: a session's
window extends while events keep arriving within ``gap``, and the
watermark evicts sessions once no on-time event can extend them —
state size ~ #active-users, independent of stream length. This is
the shape a 100 TB/day clickstream actually runs; the batch query
exists to backfill and to cross-check (streaming == batch asserted
in tests/test_streaming_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import read_event_stream


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """One row per (user, session): session bounds + event count.
    Sessions merge transitively — any two events within ``gap`` chain
    into one session, exactly like the batch lag() > gap rule."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_sessions_available_now(
    spark: SparkSession,
    source_path: str,
    query_name: str = "sessions_out",
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """Drive the session rollup over all currently-available files
    (availableNow) into a memory sink and return per-user totals
    (user_id, n_sessions, n_events) — the exact projection of the
    batch user_sessionization query, for streaming == batch tests."""
    sessions = session_rollup(read_event_stream(spark, source_path), gap, watermark)
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
