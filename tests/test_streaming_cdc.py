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


def test_restart_after_interrupted_batch_absorbs_replay(spark, sf_oracle, tmp_path):
    """Kill-and-restart exactly-once for the merge-on-read path: the
    crash window in an append-only MOR sink is "delta parquet append
    landed, checkpoint commit marker not yet written". Simulate it by
    deleting the last commit marker and restarting against the SAME
    checkpoint — Structured Streaming re-runs that micro-batch with
    the SAME batch_id, foreachBatch appends the same (batch_id, seq)
    rows again, and the resolve-side DISTINCT must absorb them: the
    resolved snapshot still equals the batch copy-on-write merge
    cell-for-cell. Counterpart of test_streaming_restart.py for the
    CDC sink (VERDICT r8 item 5)."""
    import os

    tagged = cdc_tagged_orders(spark, sf_oracle)
    base = tagged.where(F.col("b") != 0).drop("b")
    log = cdc_change_log(tagged)

    drops = str(tmp_path / "drops")
    delta = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(
            "o_orderkey long, o_custkey long, op string, seq int, new_cents long"
        ).parquet(drops)
        run_cdc_apply_available_now(stream, delta, ckpt)

    # Batch 0: the seq=1 ops. Batch 1: the seq=2 ops.
    log.where(F.col("seq") == 1).write.mode("append").parquet(drops)
    run()
    log.where(F.col("seq") == 2).write.mode("append").parquet(drops)
    run()
    committed = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    assert committed == ["0", "1"], committed
    n_delta_rows = spark.read.parquet(delta).count()

    # Crash simulation: batch 1's append landed but its commit marker
    # was lost. Restart re-runs batch 1 (same batch_id) from the
    # offsets log and re-appends its rows. (The .crc checksum shadow
    # must go too, or Hadoop's ChecksumFileSystem fails the re-write
    # with FileAlreadyExists — surfaced as a bogus "multiple
    # streaming queries" error.)
    os.remove(f"{ckpt}/commits/1")
    crc = f"{ckpt}/commits/.1.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    raw = spark.read.parquet(delta)
    n_seq2 = log.where(F.col("seq") == 2).count()
    assert raw.count() == n_delta_rows + n_seq2  # replay really appended
    assert raw.distinct().count() == n_delta_rows  # exact (batch_id, seq) dups

    resolved = _canon(resolve_snapshot(spark, base, delta).collect())
    batch = _canon(
        all_queries()["cdc_snapshot_merge"].builder(spark, sf_oracle).collect()
    )
    assert resolved == batch


def test_as_of_batch_time_travel(spark, sf_oracle, tmp_path):
    """Resolving the delta log AS OF an earlier batch reconstructs
    the table as it stood then: after only the seq=1 drop, the
    double-update keys must show the FIRST update's price; the full
    log must then show the second's."""
    tagged = cdc_tagged_orders(spark, sf_oracle)
    base = tagged.where(F.col("b") != 0).drop("b")
    log = cdc_change_log(tagged)
    delta = str(tmp_path / "delta")
    writer = delta_writer(delta)
    writer(log.where(F.col("seq") == 1), 0)
    writer(log.where(F.col("seq") == 2), 1)

    double_keys = {
        r.o_orderkey
        for r in tagged.where(F.col("b") == 2).select("o_orderkey").collect()
    }
    assert double_keys
    cents = {
        r.o_orderkey: r.cents
        for r in tagged.where(F.col("b") == 2)
        .select("o_orderkey", "cents")
        .collect()
    }
    as_of_0 = {
        r.o_orderkey: r.price
        for r in resolve_snapshot(spark, base, delta, as_of_batch=0).collect()
        if r.o_orderkey in double_keys
    }
    full = {
        r.o_orderkey: r.price
        for r in resolve_snapshot(spark, base, delta).collect()
        if r.o_orderkey in double_keys
    }
    for k in double_keys:
        assert round(as_of_0[k] * 100) == (cents[k] * 110) // 100  # first update
        assert round(full[k] * 100) == (cents[k] * 120) // 100     # second wins
