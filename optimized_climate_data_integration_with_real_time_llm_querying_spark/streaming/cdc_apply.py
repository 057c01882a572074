"""Streaming CDC apply — MERGE-ON-READ.

The batch query ``cdc_snapshot_merge`` is copy-on-write: one job
reads the snapshot, applies the whole change log, and rewrites. A
streaming pipeline cannot rewrite the snapshot per micro-batch; the
lakehouse answer is merge-on-read: micro-batches APPEND change rows
(tagged with their batch id) to a delta log, and readers resolve
(base snapshot ∪ delta log) with a last-writer-wins window ordered
by (seq, batch_id) per key — seq is the log's total change order, so
resolution does not depend on micro-batch arrival order — deletes drop, the latest upsert wins,
untouched base rows pass through. Compaction (folding the delta log
back into the base — exactly the batch merge) can then run on ANY
schedule without blocking ingest; this is the Delta/Hudi/Iceberg MOR
design expressed as two plain relational pieces.

Correctness contract: resolving base + a streamed delta log equals
the batch ``cdc_snapshot_merge`` output exactly when the same change
log is streamed in arrival order — proven cell-for-cell in
tests/test_streaming_cdc.py, along with ordering-robustness (ops for
one key split across micro-batches still resolve last-writer-wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def delta_writer(delta_path: str):
    """foreachBatch function: append the micro-batch's change rows
    (o_orderkey, o_custkey, op, seq, new_cents) stamped with the
    batch id that orders them across batches. Replays re-append the
    SAME (batch_id, seq) rows; the resolve window dedups them with a
    DISTINCT, so at-least-once delivery is safe."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(delta_path)

    return write_batch


def run_cdc_apply_available_now(
    changes_stream: DataFrame, delta_path: str, checkpoint_path: str
) -> None:
    q = (
        changes_stream.writeStream.foreachBatch(delta_writer(delta_path))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def resolve_snapshot(
    spark: SparkSession,
    base: DataFrame,
    delta_path: str,
    as_of_batch: int | None = None,
) -> DataFrame:
    """Merge-on-read resolve: (o_orderkey, o_custkey, price, version)
    with the same semantics as the batch cdc_snapshot_merge output.

    ``base`` columns: o_orderkey, o_custkey, cents. Base rows enter
    the window as (seq=-1, batch_id=-1, op='B') so any delta row for
    the same key outranks them; rn=1 per key wins; 'D' winners drop.

    ``as_of_batch`` is TIME TRAVEL for free: because the delta log is
    append-only and batch-id-stamped, resolving with only rows where
    ``batch_id <= as_of_batch`` reconstructs the table exactly as it
    stood after that micro-batch — no snapshots were ever stored.
    This is the query-side half of what lakehouse formats call
    version-as-of; compaction bounds how far back it reaches.
    """
    delta = spark.read.parquet(delta_path).distinct()  # replay dedup
    if as_of_batch is not None:
        delta = delta.where(F.col("batch_id") <= as_of_batch)
    b = base.select(
        "o_orderkey",
        "o_custkey",
        F.lit("B").alias("op"),
        F.lit(-1).alias("seq"),
        F.col("cents").alias("new_cents"),
        F.lit(-1).cast("long").alias("batch_id"),
    )
    d = delta.select(
        "o_orderkey", "o_custkey", "op", "seq", "new_cents", "batch_id"
    )
    allrows = b.unionByName(d)
    # Last-writer-wins on (seq desc, batch_id desc): seq is the
    # change log's per-key TOTAL change order (globally monotonic per
    # key by construction — cdc_change_log stamps it), so resolution
    # is independent of which micro-batch a change arrived in.
    # Ordering batch_id first would require FileStreamSource to pick
    # up drops in seq order — files landing within one mtime
    # granularity can batch out of order, and a key's seq=2 update
    # would lose to its seq=1 insert. batch_id desc remains as the
    # tie-break for replays of the same seq (post-DISTINCT duplicates
    # carry identical payloads, so the pick is value-stable either
    # way). Base rows enter at seq=-1 and lose to any delta row.
    w = W.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("batch_id").desc()
    )
    latest = (
        allrows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    kept = latest.where(F.col("op") != "D")
    # Inserts carry their own custkey/cents; updates keep the base
    # custkey (same value — custkey never changes in this log) and
    # take the new cents; base rows pass through.
    return kept.select(
        "o_orderkey",
        "o_custkey",
        (
            F.round(F.col("new_cents").cast("double") / 100.0, 2) + F.lit(0.0)
        ).alias("price"),
        F.when(F.col("op") == "U", "updated")
        .when(F.col("op") == "I", "inserted")
        .otherwise("unchanged")
        .alias("version"),
    )
