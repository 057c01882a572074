"""Skew-aware aggregation: two-phase salted groupBy.

For hot grouping keys (a handful of keys holding most rows — the
norm in web-scale corpora: one domain, one language, one template),
a plain groupBy sends every hot-key row to one reducer. Salting
splits each key into ``n_salts`` subkeys for a parallel partial
aggregate, then re-aggregates the partials — two small shuffles
instead of one skewed one.

AQE's skew-join splitting handles joins; this covers the aggregation
side, and doubles as the documented pattern for manual salting.
Results are bit-identical to the unsalted groupBy for algebraic
aggregates (sum/count/min/max), which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) with salted two-phase
    execution. ``salt_source`` defaults to a deterministic hash of the
    whole row's value column (never rand(): resumable + testable)."""
    salt = (
        F.pmod(F.xxhash64(salt_source if salt_source is not None else F.col(value_col)), F.lit(n_salts))
    ).alias("_salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )
