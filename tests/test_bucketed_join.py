"""Bucketing: co-located joins without a shuffle.

The 100 TB pattern for repeated joins on the same key: write both
sides bucketed by the join key (`bucketBy` + saveAsTable); Spark then
sort-merge-joins bucket-to-bucket with NO Exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_small, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # External tables (explicit path): bucket metadata lives in the
    # session catalog, data under tmp — warehouse.dir is static config.
    load_table(spark, sf_small, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", str(wh / "b_orders")).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_small, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", str(wh / "b_lineitem")).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # merge hint: at test scale Spark would broadcast instead (valid,
    # but then bucketing isn't exercised); at 100 TB SMJ is the
    # strategy this layout exists for.
    joined = (
        spark.table("b_orders")
        .hint("merge")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # The join itself must read co-located buckets: no Exchange
    # between the scans and the SortMergeJoin.
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_section, plan[:2000]
    # And it's correct.
    n = joined.count()
    truth = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert n == truth > 0
