"""Streaming window semantics: native session_window and
watermark-driven late-data handling across micro-batches."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    TABLE_SCHEMAS,
    load_table,
)


def test_sessionize_module_matches_batch_query(spark, sf_small):
    """The packaged streaming sessionizer (streaming/sessionize.py)
    must reproduce the registered batch user_sessionization query
    exactly: same per-user session and event counts."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.sessionize import (
        run_sessions_available_now,
    )

    stream_dir = tempfile.mkdtemp(prefix="ev_sess_mod_")
    try:
        load_table(spark, sf_small, "events").write.mode("overwrite").parquet(stream_dir)
        streamed = run_sessions_available_now(spark, stream_dir, query_name="sess_mod")
        batch = all_queries()["user_sessionization"].builder(spark, sf_small)
        s = sorted(tuple(r) for r in streamed.collect())
        b = sorted(tuple(r) for r in batch.collect())
        assert len(s) > 0
        assert s == b
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_session_window_stream_matches_lag_batch(spark, sf_small):
    """session_window(ts, 30 min) row counts per user must equal the
    batch lag-gap sessionization (queries.streaming_shapes)."""
    events = load_table(spark, sf_small, "events")
    stream_dir = tempfile.mkdtemp(prefix="ev_sw_")
    try:
        events.write.mode("overwrite").parquet(stream_dir)
        stream = spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(stream_dir)
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("sessions_sw")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = (
            spark.sql("SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events FROM sessions_sw GROUP BY user_id")
            .collect()
        )
        got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in streamed}

        from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
            all_queries,
        )

        batch = all_queries()["user_sessionization"].builder(spark, sf_small).collect()
        truth = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch}
        assert got == truth
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_watermark_drops_late_rows_in_append_mode(spark, sf_small):
    """Append-mode windowed agg with a short watermark: a second
    micro-batch far older than the advanced watermark must not
    produce new finalized windows for its (dropped) rows."""
    events = load_table(spark, sf_small, "events")
    stream_dir = tempfile.mkdtemp(prefix="ev_wm_")
    try:
        import glob
        import os
        import shutil as sh

        recent = events.orderBy(F.col("ts").desc()).limit(200)
        # late batch: the oldest rows, arriving AFTER the recent ones
        late = events.orderBy(F.col("ts").asc()).limit(200)
        recent.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/f0")
        late.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/f1")

        def land(src: str, name: str) -> None:
            sh.copy(glob.glob(src + "/part-*.parquet")[0], os.path.join(stream_dir, name))

        land(stream_dir + "/f0", "b0.parquet")  # only the recent file at start
        stream = spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(
            stream_dir + "/b*.parquet"
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("wm_out")
            .start()
        )
        q.processAllAvailable()  # batch 0: recent rows advance watermark
        land(stream_dir + "/f1", "b1.parquet")  # late rows arrive afterwards
        q.processAllAvailable()  # batch 1: all below watermark -> dropped
        q.stop()
        out = spark.sql("SELECT * FROM wm_out").collect()
        emitted_windows = {r["w"]["start"] for r in out}
        recent_min = recent.agg(F.min("ts")).collect()[0][0]
        # The late batch (all older than the watermark advanced by the
        # recent batch) must be dropped: no finalized window may exist
        # before the recent batch's earliest hour.
        late_only = {
            w
            for w in emitted_windows
            if w < recent_min.replace(minute=0, second=0, microsecond=0)
        }
        assert late_only == set(), f"late windows leaked: {sorted(late_only)[:3]}"
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_ohlc_matches_batch_query(spark, sf_small):
    """The OHLC downsample runs as a STREAMING aggregation too: per
    (user, 1-day window) min_by/max_by over struct(ts, event_id)
    pick deterministic open/close under any arrival order — the
    declarative twin of the batch query's row_number pick. Cell-for-
    cell equality against the registered batch events_ohlc_daily."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    events = load_table(spark, sf_small, "events")
    stream_dir = tempfile.mkdtemp(prefix="ev_ohlc_")
    try:
        events.write.mode("overwrite").parquet(stream_dir)
        stream = spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(stream_dir)
        tiebreak = F.struct(F.col("ts"), F.col("event_id"))
        agg = (
            stream.groupBy("user_id", F.window("ts", "1 day").alias("w"))
            .agg(
                F.round(F.min_by("value", tiebreak), 2).alias("open_v"),
                F.round(F.max("value"), 2).alias("high_v"),
                F.round(F.min("value"), 2).alias("low_v"),
                F.round(F.max_by("value", tiebreak), 2).alias("close_v"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "user_id",
                F.expr("unix_micros(w.start) div 86400000000").alias("day"),
                "open_v",
                "high_v",
                "low_v",
                "close_v",
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("ohlc_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        s = sorted(tuple(r) for r in spark.table("ohlc_stream").collect())
        batch = all_queries()["events_ohlc_daily"].builder(spark, sf_small)
        b = sorted(tuple(r) for r in batch.collect())
        assert len(s) > 0
        assert s == b
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_streaming_anomaly_matches_batch_query(spark, sf_small):
    """The streaming anomaly rollup (frozen broadcast climatology +
    watermarked daily aggregate) must reproduce the registered batch
    diurnal_anomaly_profile cell for cell, modulo column order:
    day/event_type keys, counts, signed and absolute mean anomalies
    on the same rounding grid."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.rollup import (
        run_anomaly_available_now,
    )

    events = load_table(spark, sf_small, "events")
    clim = (
        events.select("event_type", F.hour("ts").alias("hod"), "value")
        .groupBy("event_type", "hod")
        .agg(F.round(F.avg("value"), 6).alias("clim"))
    )
    stream_dir = tempfile.mkdtemp(prefix="ev_anom_")
    try:
        events.write.mode("overwrite").parquet(stream_dir)
        streamed = run_anomaly_available_now(spark, stream_dir, clim)
        batch = all_queries()["diurnal_anomaly_profile"].builder(spark, sf_small)
        s = sorted(
            (str(r["day"]), r["event_type"], r["n_events"], r["mean_anomaly"], r["mean_abs_anomaly"])
            for r in streamed.collect()
        )
        b = sorted(
            (str(r["day"]), r["event_type"], r["n_events"], r["mean_anomaly"], r["mean_abs_anomaly"])
            for r in batch.collect()
        )
        assert len(s) > 0
        assert s == b
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
