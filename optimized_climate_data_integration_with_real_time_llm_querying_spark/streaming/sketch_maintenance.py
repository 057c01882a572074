"""Streaming maintenance of mergeable sketches (HyperLogLog).

The batch HLL (queries/sketches.py ``hll_distinct_md5``) computes
per-group registers in one aggregation. Real pipelines maintain the
same registers CONTINUOUSLY as events arrive; HLL's defining
property — registers merge by element-wise MAX — makes that cheap
and, more interestingly, makes an APPEND-ONLY maintenance protocol
semantically exactly-once under at-least-once delivery: a replayed
micro-batch appends duplicate (group, bucket, rho) rows, and the
MAX-merge at read time is idempotent to duplicates. No transactional
sink, no dedup state — the algebra of the sketch absorbs retries.
(Contrast the MinHash index maintenance next door, which relies on
pair-level dedup downstream, and SUM-merged sketches like Count-Min,
which would double-count on replay and DO need batch-id keyed
writes.)

Each micro-batch computes registers over ONLY its own rows (one
narrow aggregation) and appends them; the estimate reader re-merges
with MAX and applies the identical Flajolet correction, so
``streamed == batch`` exactly — proven cell-for-cell in
tests/test_streaming_sketch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Identical constants/formulas to queries/sketches.py hll_distinct_md5
# (p=8 -> 256 buckets, 24-bit remainder, alpha_256).
_M = 256
_REM = 16777216  # 2^24
_RHO_MAX = 25
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _h32(col: F.Column) -> F.Column:
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")


def batch_registers(
    df: DataFrame, grp_col: str, key_col: str
) -> DataFrame:
    """(grp, bucket, m) register rows for ONE batch of rows — the
    map-reduce half of HLL; merging across batches is MAX."""
    h = df.select(F.col(grp_col).alias("grp"), _h32(F.col(key_col)).alias("h32"))
    rem = F.col("h32") % _REM
    rho = F.when(rem == 0, F.lit(_RHO_MAX)).otherwise(
        _RHO_MAX - F.length(F.bin(rem))
    )
    return (
        h.select(
            "grp",
            F.floor(F.col("h32") / _REM).cast("long").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def register_writer(registers_path: str, grp_col: str, key_col: str):
    """foreachBatch function: append this micro-batch's registers.
    Append-only is enough — see the module docstring for why replays
    are harmless under MAX-merge."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_registers(batch_df, grp_col, key_col).write.mode(
            "append"
        ).parquet(registers_path)

    return write_batch


def run_hll_maintenance_available_now(
    stream: DataFrame,
    registers_path: str,
    checkpoint_path: str,
    grp_col: str,
    key_col: str,
) -> None:
    """Drain an availableNow stream through the register writer."""
    q = (
        stream.writeStream.foreachBatch(
            register_writer(registers_path, grp_col, key_col)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def estimate_from_registers(
    spark: SparkSession, registers_path: str
) -> DataFrame:
    """MAX-merge all appended register rows and apply the identical
    estimate formula as the batch query: (grp, hll_estimate)."""
    reg = (
        spark.read.parquet(registers_path)
        .groupBy("grp", "bucket")
        .agg(F.max("m").alias("m"))
    )
    z = reg.groupBy("grp").agg(
        (_M - F.count(F.lit(1))).cast("long").alias("v"),
        (
            (_M - F.count(F.lit(1))) * F.lit(1.0)
            + F.sum(F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), m)"))
        ).alias("zsum"),
    )
    est = z.select(
        "grp",
        "v",
        (F.lit(_ALPHA) * _M * _M / F.col("zsum")).alias("e_raw"),
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * _M) & (F.col("v") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("v")),
    ).otherwise(F.col("e_raw"))
    return est.select("grp", F.round(corrected, 2).alias("hll_estimate"))
