"""Stateful running means: multi-batch state accumulation converges
to the batch ground truth."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    TABLE_SCHEMAS,
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.stateful import (
    running_monthly_means,
)


def test_running_means_converge_to_batch(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    stream_dir = tempfile.mkdtemp(prefix="ev_state_")
    try:
        # Two files -> two micro-batches (maxFilesPerTrigger=1), so
        # state genuinely accumulates across batches.
        half = events.filter(F.col("event_id") % 2 == 0)
        other = events.filter(F.col("event_id") % 2 == 1)
        half.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/a")
        other.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/b")
        import glob
        import os
        import shutil as sh

        for i, f in enumerate(sorted(glob.glob(stream_dir + "/*/part-*.parquet"))):
            sh.copy(f, os.path.join(stream_dir, f"batch_{i}.parquet"))

        stream = (
            spark.readStream.schema(TABLE_SCHEMAS["events"])
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        q = (
            running_monthly_means(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("running_means")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        updates = spark.sql("SELECT * FROM running_means").collect()
        assert len(updates) > 0

        # Last update per key must equal the batch mean over ALL events.
        last = {}
        for r in updates:  # memory sink appends in batch order
            last[(r["event_type"], r["month"])] = (r["n"], r["mean"])
        truth = {
            (r["event_type"], r["month"]): (r["n"], r["mean"])
            for r in events.groupBy(
                "event_type", F.date_format("ts", "yyyy-MM").alias("month")
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("mean"))
            .collect()
        }
        assert last.keys() == truth.keys()
        mism = {k: (last[k], truth[k]) for k in truth if last[k] != truth[k]}
        assert not mism, f"first mismatches: {dict(list(mism.items())[:3])}"
        # State really accumulated: some keys got >1 update.
        from collections import Counter

        counts = Counter((r["event_type"], r["month"]) for r in updates)
        assert max(counts.values()) > 1
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
