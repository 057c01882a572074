"""Streaming maintenance of mergeable sketches (HLL + Count-Min).

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
pair-level dedup downstream, and the SUM-merged Count-Min in the
second half of this module, which would double-count on replay and
therefore uses batch-id-KEYED overwrites instead.)

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


# ------------------------------------------------------------------
# Count-Min maintenance — the SUM-merged counterpart
# ------------------------------------------------------------------
# CMS cells merge by SUM, so the HLL append-only protocol above is
# NOT replay-safe here: a re-delivered micro-batch would double-count
# every cell. The standard fix is batch-id-KEYED writes — each batch
# OVERWRITES its own partition directory, so replays converge to the
# same bytes instead of accumulating. This pair of modules is the
# worked contrast: idempotence from sketch algebra (MAX) vs
# idempotence from write discipline (keyed overwrite).

_CMS_ROWS = 4
_CMS_WIDTH = 512


def cms_batch_cells(batch_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(r, bucket, cell) partial sketch for ONE micro-batch — same
    md5 row-hash family as the batch cms_heavy_hitters query, so
    summed partials equal the one-shot sketch exactly."""
    from ..operators.text import tokens

    tc = (
        batch_df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hashed = tc.select(
        "n",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_ROWS)])).alias("r"),
        "token",
    ).withColumn(
        "bucket",
        _h32(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("token")))
        % _CMS_WIDTH,
    )
    return hashed.groupBy("r", "bucket").agg(F.sum("n").alias("cell"))


def cms_cell_writer(cells_path: str, text_col: str = "text"):
    """foreachBatch function: OVERWRITE this batch's own partition
    directory (cells_path/batch_id=N). Replays rewrite the same
    directory with the same deterministic bytes — idempotent by
    write discipline, since SUM-merge cannot absorb duplicates."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cms_batch_cells(batch_df, text_col).write.mode("overwrite").parquet(
            f"{cells_path}/batch_id={batch_id}"
        )

    return write_batch


def run_cms_maintenance_available_now(
    stream: DataFrame, cells_path: str, checkpoint_path: str
) -> None:
    q = (
        stream.writeStream.foreachBatch(cms_cell_writer(cells_path))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_point_estimates(
    spark: SparkSession, cells_path: str, tokens_df: DataFrame
) -> DataFrame:
    """SUM-merge all batch partials, then point-query the given
    (token) rows: (token, cms_estimate)."""
    merged = (
        spark.read.parquet(cells_path)
        .groupBy("r", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    probes = tokens_df.select(
        "token",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_ROWS)])).alias("r"),
    ).withColumn(
        "bucket",
        _h32(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("token")))
        % _CMS_WIDTH,
    )
    return (
        probes.join(merged, ["r", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("cms_estimate"))
    )
