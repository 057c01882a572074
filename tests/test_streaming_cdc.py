"""Merge-on-read CDC: a streamed delta log resolved against the base
snapshot equals the batch copy-on-write merge cell-for-cell, ops for
one key split across micro-batches still resolve last-writer-wins,
and replayed appends are absorbed by the resolve-side dedup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.warehouse import (
    cdc_change_log,
    cdc_tagged_orders,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.cdc_apply import (
    delta_writer,
    resolve_snapshot,
    run_cdc_apply_available_now,
)


def _canon(rows):
    return sorted((r.o_orderkey, r.o_custkey, r.price, r.version) for r in rows)


def test_streamed_mor_equals_batch_cow(spark, sf_oracle, tmp_path):
    tagged = cdc_tagged_orders(spark, sf_oracle)
    base = tagged.where(F.col("b") != 0).drop("b")
    log = cdc_change_log(tagged)

    # Land the change log as 2 file drops SPLITTING each key's ops:
    # seq=1 rows arrive in drop 0, seq=2 rows in drop 1 — so the
    # double-update keys exercise cross-batch last-writer-wins.
    drops = str(tmp_path / "drops")
    log.where(F.col("seq") == 1).write.mode("append").parquet(drops)
    log.where(F.col("seq") == 2).write.mode("append").parquet(drops)

    delta = str(tmp_path / "delta")
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, op string, seq int, new_cents long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(drops)
    )
    run_cdc_apply_available_now(stream, delta, str(tmp_path / "ckpt"))

    resolved = _canon(resolve_snapshot(spark, base, delta).collect())
    batch = _canon(
        all_queries()["cdc_snapshot_merge"].builder(spark, sf_oracle).collect()
    )
    assert resolved == batch


def test_replayed_delta_append_is_absorbed(spark, sf_oracle, tmp_path):
    tagged = cdc_tagged_orders(spark, sf_oracle)
    base = tagged.where(F.col("b") != 0).drop("b")
    log = cdc_change_log(tagged)
    delta = str(tmp_path / "delta")
    writer = delta_writer(delta)
    writer(log, 0)
    before = _canon(resolve_snapshot(spark, base, delta).collect())
    writer(log, 0)  # at-least-once replay of the same micro-batch
    after = _canon(resolve_snapshot(spark, base, delta).collect())
    assert before == after
