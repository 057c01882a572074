"""Streaming rollup: file-source event stream -> watermark ->
tumbling-window aggregation -> sink.

This is the incremental form of the reference's A6 group-mean shape
(ERA5 monthly city means, ``ERA5_preprocessing.ipynb:cell8``): at
scale the monthly climate rollup runs as a continuous query with a
watermark bounding state for late station reports, instead of a
nightly batch over everything.

Scale notes:
- state is keyed by (window, key): bounded by watermark eviction,
  so state size ~ #keys x #open-windows, independent of input volume.
  That bound holds in APPEND/UPDATE output modes, where the watermark
  finalizes and evicts closed windows (the production pattern —
  tests/test_streaming_restart.py drives it with a checkpoint across
  restarts); in COMPLETE mode watermarks are inert and every window
  stays in state, which is acceptable only for the availableNow
  memory-sink test drivers below;
- the pre-shuffle partial aggregation means the shuffle carries one
  row per (partition, window, key), not per event;
- ``available_now`` triggers let the same query run as incremental
  batch catch-up (kappa-style backfill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLE_SCHEMAS


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of event parquet (schema must be declared —
    streaming sources cannot infer). In production the same DataFrame
    comes from Kafka; every transformation downstream is source-
    agnostic."""
    reader = spark.readStream.schema(TABLE_SCHEMAS["events"]).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def tumbling_rollup(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Tumbling-window count/sum/avg per event_type with a watermark
    for late data. Mirrors queries.streaming_shapes.events_tumbling_daily
    so batch and streaming results are comparable."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    spark: SparkSession,
    source_path: str,
    query_name: str = "rollup_out",
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """TEST DRIVER: run the rollup over all currently-available files
    (availableNow trigger), synchronously, into an in-memory sink;
    returns the result as a DataFrame for streaming == batch asserts.
    Complete mode is deliberate HERE ONLY: it returns every window
    including the not-yet-finalized tail, at the cost of making the
    watermark inert (state grows with open windows). The production
    shape is append mode + a real sink + checkpoint, where the
    watermark actually evicts — see the restart test."""
    events = read_event_stream(spark, source_path)
    agg = tumbling_rollup(events, window, watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def anomaly_rollup(
    events: DataFrame,
    climatology: DataFrame,
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming twin of queries.streaming_shapes.diurnal_anomaly_
    profile: every event's departure from a FROZEN hour-of-day
    climatology, aggregated per (event_type, day) under a watermark.

    The climatology arrives as a STATIC broadcast frame (event_type,
    hod, clim) — the production pattern for any slowly-reprocessed
    reference surface (a monthly ERA5 climatology is recomputed
    out-of-band and swapped in; a stream-static broadcast join keeps
    ZERO state for it, so streaming state stays #types x #open-days
    regardless of input volume). Column names and rounding mirror the
    batch query exactly so streaming == batch is assertable cell for
    cell."""
    base = events.withWatermark("ts", watermark).select(
        "event_type", F.hour("ts").alias("hod"), "ts", "value"
    )
    joined = base.join(F.broadcast(climatology), ["event_type", "hod"])
    return (
        joined.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.avg(F.col("value") - F.col("clim")), 4) + F.lit(0.0)).alias(
                "mean_anomaly"
            ),
            F.round(F.avg(F.abs(F.col("value") - F.col("clim"))), 4).alias(
                "mean_abs_anomaly"
            ),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "mean_anomaly",
            "mean_abs_anomaly",
        )
    )


def run_anomaly_available_now(
    spark: SparkSession,
    source_path: str,
    climatology: DataFrame,
    query_name: str = "anomaly_out",
    watermark: str = "2 days",
) -> DataFrame:
    """TEST DRIVER: drive the anomaly rollup over all currently-
    available files (availableNow) into a memory sink; returns the
    result frame for streaming == batch assertions. Same complete-
    mode caveat as :func:`run_available_now` — the watermark is inert
    in complete mode, so this is NOT the bounded-state production
    pattern; that is the append+checkpoint drive in
    tests/test_streaming_restart.py."""
    events = read_event_stream(spark, source_path)
    agg = anomaly_rollup(events, climatology, watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
