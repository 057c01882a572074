"""Streaming ingest dedup and stream-stream interval join ==
their batch equivalents on the same data."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.dedup_join import (
    stream_interval_join,
    streaming_dedup,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.rollup import (
    read_event_stream,
)


def _run_append(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_streaming_dedup_drops_redelivered_events(spark, sf_small):
    # Simulate at-least-once delivery: the same event files land twice.
    stream_dir = tempfile.mkdtemp(prefix="events_dup_")
    try:
        ev = load_table(spark, sf_small, "events")
        ev.write.mode("overwrite").parquet(stream_dir)
        ev.write.mode("append").parquet(stream_dir)
        assert spark.read.parquet(stream_dir).count() == 2 * ev.count()

        deduped = streaming_dedup(read_event_stream(spark, stream_dir))
        _run_append(deduped, "t_dedup")
        got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
        assert got["n"] == ev.count()
        assert got["d"] == ev.select("event_id").distinct().count()
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_stream_interval_join_matches_batch(spark, sf_small):
    stream_dir = tempfile.mkdtemp(prefix="events_join_")
    try:
        ev = load_table(spark, sf_small, "events")
        ev.write.mode("overwrite").parquet(stream_dir)

        left = read_event_stream(spark, stream_dir).filter(F.col("event_type") == "view")
        right = read_event_stream(spark, stream_dir).filter(
            F.col("event_type") == "purchase"
        )
        joined = stream_interval_join(left, right, within="1 day")
        _run_append(joined, "t_ivj")
        streamed = {
            (r["l_id"], r["r_id"]) for r in spark.sql("SELECT * FROM t_ivj").collect()
        }

        b = ev.select("event_id", "user_id", "event_type", "ts")
        bl = b.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("l_id"), F.col("user_id").alias("k"), F.col("ts").alias("l_ts")
        )
        br = b.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("r_id"), F.col("user_id").alias("k"), F.col("ts").alias("r_ts")
        )
        batch = {
            (r["l_id"], r["r_id"])
            for r in bl.join(br, "k")
            .filter(
                (F.col("r_ts") > F.col("l_ts"))
                & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 day"))
            )
            .collect()
        }
        assert streamed, "expected at least one view->purchase pair"
        assert streamed == batch
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
