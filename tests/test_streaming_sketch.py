"""Streaming HLL register maintenance: streamed == batch exactly,
and the append-only protocol is idempotent under replay (the
MAX-merge algebra absorbs at-least-once duplicates).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.sketch_maintenance import (
    batch_registers,
    estimate_from_registers,
    register_writer,
    run_hll_maintenance_available_now,
)


def _drain(spark, drops, registers, ckpt):
    stream = (
        spark.readStream.schema("o_orderpriority string, o_custkey long")
        .option("maxFilesPerTrigger", "1")
        .parquet(drops)
    )
    run_hll_maintenance_available_now(
        stream, registers, ckpt, grp_col="o_orderpriority", key_col="o_custkey"
    )


def test_streamed_hll_equals_batch(spark, sf_oracle, tmp_path):
    o = load_table(spark, sf_oracle, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    drops = str(tmp_path / "drops")
    for i in range(3):  # three "event file" arrivals
        o.filter(F.col("o_custkey") % 3 == i).write.mode("append").parquet(drops)

    registers = str(tmp_path / "registers")
    _drain(spark, drops, registers, str(tmp_path / "ckpt1"))
    assert os.path.isdir(registers)

    streamed = {
        r.grp: r.hll_estimate
        for r in estimate_from_registers(spark, registers).collect()
    }
    batch = {
        r.priority: r.hll_estimate
        for r in all_queries()["hll_distinct_md5"].builder(spark, sf_oracle).collect()
    }
    assert streamed == batch  # exact equality: same registers, same formula

    # Merged streamed registers == one-shot batch registers, cell for cell.
    merged = {
        (r.grp, r.bucket): r.m
        for r in spark.read.parquet(registers)
        .groupBy("grp", "bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    }
    direct = {
        (r.grp, r.bucket): r.m
        for r in batch_registers(o, "o_orderpriority", "o_custkey").collect()
    }
    assert merged == direct


def test_replayed_batch_is_idempotent(spark, sf_oracle, tmp_path):
    o = load_table(spark, sf_oracle, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    registers = str(tmp_path / "registers")
    writer = register_writer(registers, "o_orderpriority", "o_custkey")
    half = o.filter(F.col("o_custkey") % 2 == 0)
    writer(half, 0)
    before = {
        r.grp: r.hll_estimate
        for r in estimate_from_registers(spark, registers).collect()
    }
    writer(half, 0)  # at-least-once replay of the SAME micro-batch
    after = {
        r.grp: r.hll_estimate
        for r in estimate_from_registers(spark, registers).collect()
    }
    assert before == after  # MAX-merge absorbs the duplicate append


def test_streamed_cms_equals_batch_and_keyed_writes_are_idempotent(
    spark, sf_oracle, tmp_path
):
    """SUM-merged Count-Min maintained with batch-id-KEYED overwrites:
    streamed point estimates equal the batch sketch exactly, and
    replaying a micro-batch (rewriting its own directory) changes
    nothing — the write-discipline counterpart of HLL's MAX-merge
    idempotence."""
    from pyspark.sql import functions as F2

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.sketch_maintenance import (
        cms_batch_cells,
        cms_cell_writer,
        cms_point_estimates,
        run_cms_maintenance_available_now,
    )

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    drops = str(tmp_path / "drops")
    for i in range(3):
        # One part-file per drop: the replay step below rewrites batch
        # 0 with drop 0's FULL contents, which is only the same input
        # the stream saw for batch 0 if each drop is a single file
        # under maxFilesPerTrigger=1.
        d.filter(F2.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(drops)

    cells = str(tmp_path / "cells")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(drops)
    )
    run_cms_maintenance_available_now(stream, cells, str(tmp_path / "ckpt"))

    batch_rows = all_queries()["cms_heavy_hitters"].builder(spark, sf_oracle).collect()
    toks = spark.createDataFrame(
        [(r.token,) for r in batch_rows], "token string"
    )
    streamed = {
        r.token: r.cms_estimate
        for r in cms_point_estimates(spark, cells, toks).collect()
    }
    for r in batch_rows:
        assert streamed[r.token] == r.cms_estimate, r.token

    # Replay: rewrite batch 0's directory with the same micro-batch.
    writer = cms_cell_writer(cells)
    writer(d.filter(F2.col("doc_id") % 3 == 0), 0)
    after = {
        r.token: r.cms_estimate
        for r in cms_point_estimates(spark, cells, toks).collect()
    }
    assert after == streamed
