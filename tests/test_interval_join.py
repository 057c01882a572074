"""Bucketed interval join: the bucketing must be invisible in the
result (equivalence to the naive range join) and visible in the plan
(equi-join on (key, bucket), no key-only hash join fan-out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.asof import (
    interval_join_bucketed,
)

WINDOW_US = 3_600_000_000


def _frames(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "events")
    base = e.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    return base, purchases


def test_bucketed_equals_naive_range_join(spark, sf_oracle):
    base, purchases = _frames(spark, sf_oracle)
    bucketed = interval_join_bucketed(
        purchases, base, key="user_id", left_ts_us="t_us", right_ts_us="t_us",
        window_us=WINDOW_US,
    )
    got = sorted(
        (r.l_event_id, r.r_event_id) for r in bucketed.collect()
    )
    l = purchases.select(
        F.col("event_id").alias("l_event_id"),
        F.col("user_id").alias("l_user_id"),
        F.col("t_us").alias("l_t_us"),
    )
    naive = l.join(
        base,
        (F.col("l_user_id") == F.col("user_id"))
        & (F.col("t_us") > F.col("l_t_us"))
        & (F.col("t_us") <= F.col("l_t_us") + WINDOW_US),
    )
    want = sorted((r.l_event_id, r.event_id) for r in naive.collect())
    assert got == want and got, (len(got), len(want))


def test_bucketed_interval_join_equi_join_shape(spark, sf_oracle):
    """The executed plan must join hash-partitioned on BOTH the key
    and the bucket (SortMergeJoin/ShuffledHashJoin keys include _b),
    never a BroadcastNestedLoop/Cartesian fallback."""
    base, purchases = _frames(spark, sf_oracle)
    out = interval_join_bucketed(
        purchases, base, key="user_id", left_ts_us="t_us", right_ts_us="t_us",
        window_us=WINDOW_US,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_b" in plan and "_rb" in plan, "bucket keys absent from the join"


def test_bucket_size_invariance(spark, sf_oracle):
    """Changing the bucket granularity must not change the result —
    only the replication/population trade-off."""
    base, purchases = _frames(spark, sf_oracle)
    a = interval_join_bucketed(
        purchases, base, key="user_id", left_ts_us="t_us", right_ts_us="t_us",
        window_us=WINDOW_US, bucket_us=WINDOW_US,
    )
    b = interval_join_bucketed(
        purchases, base, key="user_id", left_ts_us="t_us", right_ts_us="t_us",
        window_us=WINDOW_US, bucket_us=WINDOW_US // 4,
    )
    ra = sorted((r.l_event_id, r.r_event_id) for r in a.collect())
    rb = sorted((r.l_event_id, r.r_event_id) for r in b.collect())
    assert ra == rb
