"""As-of join: for each left row, the latest right row at-or-before
its timestamp, per key.

Spark has no native as-of join (the common OLAP gap — see the
pyspark guide's pattern list). The scalable implementation here is
the union+window technique: tag both sides, union, and take a running
max of the right-side timestamp over (key, time) order. One shuffle
on the key, no range-join explosion, no per-group pandas — works at
any key cardinality and survives skew via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_last_ts(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
) -> DataFrame:
    """Attach ``asof_ts`` = max(right.ts) with right.ts <= left.ts and
    right.key == left.key. NULL when no right row qualifies.

    Union trick: right rows sort before left rows at equal
    timestamps (kind 0 < 1), so an event exactly at the left
    timestamp is included — the conventional inclusive as-of.
    """
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        *left_cols,
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        r.unionByName(l)
        .withColumn("asof_ts", F.max(F.when(F.col("_kind") == 0, F.col("_ts"))).over(w))
        .filter(F.col("_kind") == 1)
        .select(*left_cols, F.col("_ts").alias(left_ts), "asof_ts")
    )
