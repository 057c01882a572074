"""Checkpoint-restart resilience: a streaming query stopped and
restarted against the SAME checkpoint must (a) not reprocess files it
already committed, and (b) restore dedup state, so redelivered events
inside the watermark horizon stay suppressed across the restart —
the exactly-once contract a production ingest relies on when
executors die or the job is redeployed."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.dedup_join import (
    streaming_dedup,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.rollup import (
    read_event_stream,
)

NEW_ID_OFFSET = 10_000_000


def _run_to_parquet(spark, source_dir, sink_dir, ckpt_dir):
    events = read_event_stream(spark, source_dir)
    deduped = streaming_dedup(events)  # event_id key, 2-day watermark
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_state_survives_restart(spark, sf_small):
    source = tempfile.mkdtemp(prefix="events_src_")
    sink = tempfile.mkdtemp(prefix="events_sink_")
    ckpt = tempfile.mkdtemp(prefix="events_ckpt_")
    try:
        ev = load_table(spark, sf_small, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        n_all = ev.count()
        max_ts = ev.agg(F.max("ts")).collect()[0][0]

        # Run 1: the full history lands and is committed.
        ev.write.mode("overwrite").parquet(source)
        _run_to_parquet(spark, source, sink, ckpt)
        out1 = spark.read.parquet(sink)
        assert out1.count() == n_all  # source has unique event_ids

        # Between runs: an at-least-once transport redelivers the most
        # recent events (inside the 2-day watermark horizon, so their
        # dedup state MUST still be alive in the checkpoint) and
        # delivers genuinely new events after max_ts.
        recent = ev.filter(
            F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 1 DAY")
        )
        n_recent = recent.count()
        assert n_recent > 0, "testdata must span > 1 day"
        fresh = recent.select(
            (F.col("event_id") + NEW_ID_OFFSET).alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        n_fresh = fresh.count()
        recent.unionByName(fresh).write.mode("append").parquet(source)

        # Run 2: a FRESH query object against the same checkpoint.
        _run_to_parquet(spark, source, sink, ckpt)
        out2 = spark.read.parquet(sink)

        # Exactly-once across the restart: only the fresh events were
        # appended; every redelivered id stayed suppressed.
        assert out2.count() == n_all + n_fresh
        assert (
            out2.groupBy("event_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
            == 0
        )
        n_new_ids = out2.filter(F.col("event_id") >= NEW_ID_OFFSET).count()
        assert n_new_ids == n_fresh
    finally:
        for d in (source, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_anomaly_rollup_windows_finalize_once_across_restart(spark, sf_small):
    """Watermarked AGGREGATION state survives a restart: run 1 (full
    history, append mode) emits every anomaly window the watermark
    has passed; run 2 — a fresh query object on the same checkpoint,
    after later-day events arrive — advances the watermark,
    finalizes the remaining windows EXACTLY once (no re-emission of
    run-1 windows), and every emitted day matches the batch anomaly
    computed over the same climatology."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.rollup import (
        anomaly_rollup,
        read_event_stream,
    )

    source = tempfile.mkdtemp(prefix="anom_src_")
    sink = tempfile.mkdtemp(prefix="anom_sink_")
    ckpt = tempfile.mkdtemp(prefix="anom_ckpt_")
    try:
        ev = load_table(spark, sf_small, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        clim = (
            ev.select("event_type", F.hour("ts").alias("hod"), "value")
            .groupBy("event_type", "hod")
            .agg(F.round(F.avg("value"), 6).alias("clim"))
        )

        def run():
            agg = anomaly_rollup(read_event_stream(spark, source), clim)
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        ev.write.mode("overwrite").parquet(source)
        run()
        out1 = spark.read.parquet(sink)
        n1 = out1.count()
        # the last 2 days' windows are inside the watermark horizon:
        # not finalized yet
        batch_days = ev.select(F.col("ts").cast("date").alias("day")).distinct().count()
        assert 0 < n1 < batch_days * ev.select("event_type").distinct().count()

        # later-day events arrive: watermark advances past the old tail
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        late = ev.limit(50).select(
            (F.col("event_id") + 90_000_000).alias("event_id"),
            (F.lit(max_ts) + F.expr("INTERVAL 5 DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        late.write.mode("append").parquet(source)
        run()
        out2 = spark.read.parquet(sink)
        # exactly once: no (day, type) window emitted twice
        dups = (
            out2.groupBy("day", "event_type")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dups == 0
        assert out2.count() > n1  # the held-back windows finalized
        # every ORIGINAL-span emitted window matches the batch anomaly
        # over the same frozen climatology
        base = ev.select(
            "event_type", F.hour("ts").alias("hod"),
            F.col("ts").cast("date").alias("day"), "value",
        ).join(F.broadcast(clim), ["event_type", "hod"])
        batch = (
            base.groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.round(F.avg(F.col("value") - F.col("clim")), 4) + F.lit(0.0)).alias("mean_anomaly"),
                F.round(F.avg(F.abs(F.col("value") - F.col("clim"))), 4).alias("mean_abs_anomaly"),
            )
        )
        got = {
            (str(r["day"]), r["event_type"]): (r["n_events"], r["mean_anomaly"], r["mean_abs_anomaly"])
            for r in out2.collect()
        }
        want = {
            (str(r["day"]), r["event_type"]): (r["n_events"], r["mean_anomaly"], r["mean_abs_anomaly"])
            for r in batch.collect()
        }
        for k, v in got.items():
            if k in want:  # skip the synthetic late day
                assert v == want[k], k
    finally:
        for d in (source, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)
