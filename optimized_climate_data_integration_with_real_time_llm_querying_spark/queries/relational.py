"""Relational operator parity queries (SURVEY.md §2.1–§2.8).

Each query re-expresses one reference operator shape on the driver
test tables, Spark-first: declarative DataFrame plans so Catalyst
does pushdown/pruning/broadcast (SURVEY.md §4). Reference citations
in each docstring point at the operator being paralleled.

Scale notes (100 TB habits, verified via .explain on local[32]):
- filters/projections sit in the parquet scan (PushedFilters/ReadSchema);
- dimension joins are broadcast (no shuffle of the fact side);
- top-k is ORDER BY + LIMIT -> TakeOrderedAndProject (no full sort);
- aggregates are partial+final hash aggregates (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation shapes (A1–A3, A8)
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A8 client-side group-and-total (EDGARclient.py:318-359) as one "
    "hash aggregate; TPC-H Q1 shape. Partial+final agg, filter pushed to scan.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-03").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "count_with_filter",
    """
    SELECT COUNT(*) AS n_customers
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_nationkey = 3
    """,
    doc="A1 filtered COUNT(*) existence probe (era5client.py:67).",
)
def count_with_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") == 3))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "scalar_sum_year",
    """
    SELECT ROUND(SUM(o_totalprice), 2) AS total_1994
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1994
    """,
    doc="A2/A3 scalar SUM with year filter (EDGARclient.py:233-246; "
    "noaa_disaster_db.ipynb:cell9). Year-column addressing becomes a "
    "year() predicate on long form (SURVEY.md §1.2).",
)
def scalar_sum_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") == 1994)
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_1994"))
    )


@register(
    "group_mean_monthly",
    """
    SELECT event_type,
           EXTRACT(YEAR FROM ts)  AS year,
           EXTRACT(MONTH FROM ts) AS month,
           ROUND(AVG(value), 4)   AS avg_value,
           COUNT(*)               AS n_events
    FROM events
    GROUP BY event_type, EXTRACT(YEAR FROM ts), EXTRACT(MONTH FROM ts)
    """,
    doc="A6 ERA5-style monthly group-mean (ERA5_preprocessing.ipynb:cell8 "
    "groupby(['City','date']).mean()) on the events table.",
)
def group_mean_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
        )
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Filters & predicates (P3–P10)
# --------------------------------------------------------------------------

@register(
    "eq_filter_project",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    doc="P3 string equality + column pruning (EDGARclient.py:293; "
    "Disaster dollar/server.py:87). Projection reaches the parquet scan.",
)
def eq_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "case_insensitive_eq",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    WHERE UPPER(n_name) = UPPER('GeRmAnY')
    """,
    doc="P4 case-insensitive equality (era5client.py:67,268).",
)
def case_insensitive_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.filter(F.upper(F.col("n_name")) == F.upper(F.lit("GeRmAnY")))


@register(
    "comparison_predicates",
    """
    SELECT COUNT(*)                                              AS n_rows,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)     AS revenue
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_returnflag = 'R'
    """,
    doc="P5/P9 NL-phrase comparison operators AND-joined "
    "(Disaster dollar/client.py:47-50,216-228; server.py:63-87).",
)
def comparison_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_returnflag") == "R")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "year_range_between",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
           COUNT(*)                       AS n_orders,
           ROUND(SUM(o_totalprice), 2)    AS total_price
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) BETWEEN 1993 AND 1995
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
    doc="P6 Year BETWEEN range (new_disaster_c.py:249-251; "
    "Disaster dollar/client.py:167-194).",
)
def year_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate").between(1993, 1995))
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "in_list_filter",
    """
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_name IN ('BRAZIL', 'CANADA', 'JAPAN', 'GERMANY')
    """,
    doc="P7 IN-list predicate (EDGARclient.py:234-237, HFC substance group).",
)
def in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").isin("BRAZIL", "CANADA", "JAPAN", "GERMANY")).select(
        "n_nationkey", "n_name"
    )


@register(
    "month_bucket_prefix",
    """
    SELECT o_orderstatus,
           COUNT(*)                    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') = '1995-04'
    GROUP BY o_orderstatus
    """,
    doc="P8 date-prefix LIKE 'YYYY-MM%' month bucket (era5client.py:267-268) "
    "done properly on a parsed date: year()==y AND month()==m.",
)
def month_bucket_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 4))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Distinct / dedup shapes (A4, A5, A7)
# --------------------------------------------------------------------------

@register(
    "distinct_single_column",
    "SELECT DISTINCT c_mktsegment FROM customer",
    doc="A4 SELECT DISTINCT one column (Billion_Dollar/server.py:89; "
    "era5client.py:125).",
)
def distinct_single_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "distinct_pairs",
    """
    SELECT o_orderstatus, o_orderpriority
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="A5 GROUP BY as pair dedup (EDGARclient.py:91-97 Name/code pairs); "
    "A7 drop_duplicates on a projection.",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").dropDuplicates()


# --------------------------------------------------------------------------
# Sort / limit / top-k (O1–O4)
# --------------------------------------------------------------------------

@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice_r
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="O1/O2 ORDER BY + LIMIT 20 top-k (new_disaster_c.py:256-259); "
    "Catalyst plans TakeOrderedAndProject (no full sort at scale). "
    "o_orderkey tie-break keeps the k-set deterministic across engines.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice_r"))
    )


@register(
    "first_n_preview",
    """
    SELECT * FROM nation ORDER BY n_nationkey LIMIT 5
    """,
    doc="O3 LIMIT-5 sample scan (era5server.py:83) made deterministic by "
    "key order; O4 first-25 prompt cap is the same shape.",
)
def first_n_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "nation").orderBy("n_nationkey").limit(5)


# --------------------------------------------------------------------------
# Joins (SURVEY.md §2.3 — reference has none; Spark gives them natively)
# --------------------------------------------------------------------------

@register(
    "broadcast_dim_join",
    """
    SELECT r.r_name,
           COUNT(*)                    AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Un-sharding join: reference shards by country/gas tables "
    "(era5client.py:21-30, emissions_mcp.py:8-13); here dims are "
    "broadcast-joined so the fact side never shuffles for the join.",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_agg_topk",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE)                           AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="Fact-fact join + agg + top-k (TPC-H Q3 shape) — replaces the "
    "reference's client-side Cartesian fan-out (era5client.py:246-277) "
    "with ONE plan. AQE picks broadcast for the filtered small side.",
)
def join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    # Direct timestamp comparisons (not cast-to-date) so the
    # predicates reach the parquet scan as PushedFilters and prune
    # row groups; CAST(col AS DATE) op literal defeats pushdown.
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-03-16").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


@register(
    "anti_join_no_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders. "
    "Net-new vs the reference (no joins at all, SURVEY.md §2.3).",
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "semi_join_active_parts",
    """
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45
    )
    """,
    doc="Left-semi join (EXISTS): parts with any high-quantity lineitem.",
)
def semi_join_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


# --------------------------------------------------------------------------
# Window functions (SURVEY.md §2.5 — net-new capability)
# --------------------------------------------------------------------------

@register(
    "window_yoy_delta",
    """
    WITH yearly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
             ROUND(SUM(o_totalprice), 2)    AS total_price
      FROM orders
      GROUP BY EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT year, total_price,
           ROUND(total_price - LAG(total_price) OVER (ORDER BY year), 2) AS yoy_delta
    FROM yearly
    """,
    doc="Year-over-year delta via lag() window — the natural upgrade of "
    "the reference's per-year point queries (SURVEY.md §2.5).",
)
def window_yoy_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    yearly = (
        o.groupBy(F.year("o_orderdate").alias("year"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )
    # Unpartitioned window is safe ONLY because the input is already
    # aggregated to year grain (~tens of rows at any SF); on raw data
    # this would serialize on one task — partitionBy a coarse key first.
    w = W.orderBy("year")
    return yearly.withColumn(
        "yoy_delta",
        F.round(F.col("total_price") - F.lag("total_price").over(w), 2),
    )


@register(
    "window_topk_per_group",
    """
    SELECT n_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT c.c_nationkey AS n_nationkey, c.c_custkey, c.c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rn
      FROM customer c
    )
    WHERE rn <= 3
    """,
    doc="Top-3 customers per nation via row_number() — net-new ranking "
    "window (SURVEY.md §2.5). Deterministic via c_custkey tie-break.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("c_nationkey").alias("n_nationkey"), "c_custkey", "c_acctbal")
    )


@register(
    "moving_avg_frame",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(SUM(o_totalprice), 2) AS day_total
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
      GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT day, day_total,
           ROUND(AVG(day_total) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 2) AS ma7
    FROM daily
    """,
    doc="Frame-based window (ROWS BETWEEN 6 PRECEDING): 7-day moving "
    "average of daily order totals — the rolling-metric shape for "
    "climate time series (SURVEY.md §2.5 net-new).",
)
def moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    daily = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    # Unpartitioned window is safe ONLY because the input is one
    # year's daily aggregate (<=366 rows at any SF); rolling frames
    # over raw data need partitionBy (e.g. by year) or a range join.
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.withColumn("ma7", F.round(F.avg("day_total").over(w), 2))


@register(
    "grouping_sets_status_year",
    """
    SELECT o_orderstatus,
           EXTRACT(YEAR FROM o_orderdate) AS year,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (EXTRACT(YEAR FROM o_orderdate)))
    """,
    doc="Explicit GROUPING SETS (by-status and by-year totals in one "
    "pass) — the general form behind rollup/cube.",
)
def grouping_sets_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               YEAR(o_orderdate) AS year,
               COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (YEAR(o_orderdate)))
        """
    )


# --------------------------------------------------------------------------
# Pivot / unpivot — the reference's wide<->long duality (SURVEY.md §7.4)
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

@register(
    "pivot_wide_by_priority",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
           ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'        THEN o_totalprice END), 2) AS "1-URGENT",
           ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH'          THEN o_totalprice END), 2) AS "2-HIGH",
           ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'        THEN o_totalprice END), 2) AS "3-MEDIUM",
           ROUND(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
           ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW'           THEN o_totalprice END), 2) AS "5-LOW"
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
    doc="Wide/pivoted year-column shape of the reference's emissions and "
    "disaster tables (SURVEY.md §1.1) reproduced as a pivot view over "
    "canonical long form. Explicit pivot values avoid the extra "
    "distinct-values job at scale.",
)
def pivot_wide_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").alias("year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum("o_totalprice"))
    )
    return wide.select("year", *[F.round(F.col(f"`{p}`"), 2).alias(p) for p in _PRIORITIES])


@register(
    "unpivot_long_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS value
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey < 100
    )
    """,
    doc="Unpivot (stack) wide measure columns to canonical long form — "
    "the ingest-side melt of the reference's per-year columns "
    "(SURVEY.md §1.2 'normalized to long form').",
)
def unpivot_long_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'extendedprice', l_extendedprice, 'discount', l_discount, 'tax', l_tax)"
            " AS (measure, value)"
        ),
    )


# --------------------------------------------------------------------------
# Rollup / set ops (§2.4 note, §2.7)
# --------------------------------------------------------------------------

@register(
    "rollup_region_nation",
    """
    SELECT r.r_name, n.n_name,
           COUNT(c.c_custkey)          AS n_customers,
           ROUND(SUM(c.c_acctbal), 2)  AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP region->nation->grand-total — the 'compare across all "
    "types/years' upgrade noted in SURVEY.md §2.4.",
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "union_accounts",
    """
    SELECT 'customer' AS kind, c_custkey AS acct_key, c_name AS name,
           c_nationkey AS nationkey, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier', s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    """,
    doc="§2.7 set op: the reference's probe-all-14-tables city search "
    "(era5client.py:63-82) is semantically a union materialized once.",
)
def union_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("acct_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("acct_key"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionAll(s)


# --------------------------------------------------------------------------
# Guarded raw-SQL passthrough (S9)
# --------------------------------------------------------------------------

def run_guarded_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """S9 read-only SQL passthrough with the statement-type guard the
    reference applies (SELECT/PRAGMA only — Billion_Dollar/server.py:37-39,
    era5server.py:46-48; emissions_mcp.py:35-48 notably lacks it).

    A prefix check alone is bypassable: Spark's grammar allows CTEs
    before DML, so ``WITH x AS (SELECT 1) INSERT OVERWRITE DIRECTORY
    ...`` starts with WITH yet writes files. So SELECT/WITH statements
    must additionally parse as a *pure query*: we probe-analyze
    ``SELECT * FROM ( <stmt> )`` — legal iff the statement is a query
    expression, a parse error for any DML/DDL — then execute the
    original statement (the probe is analysis-only, never executed,
    so it can't perturb ORDER BY semantics).
    """
    from ..catalog import register_views

    stripped = sql.strip().rstrip(";").strip()
    head = stripped.split(None, 1)[0].upper() if stripped else ""
    if head not in {"SELECT", "WITH", "DESCRIBE", "SHOW"}:
        raise ValueError(f"only read-only queries are allowed, got: {head or '<empty>'}")
    register_views(spark, sf_dir)
    if head in {"SELECT", "WITH"}:
        try:
            # Forces parse+analysis of the wrapped form; no job runs.
            # Newlines around the statement so a trailing `-- comment`
            # terminates before the closing paren instead of eating it.
            probe = spark.sql(f"SELECT * FROM (\n{stripped}\n) AS __guard_probe__")
            probe.schema
        except Exception as exc:
            raise ValueError(
                "statement is not a pure read-only query "
                f"(rejected by query-shape probe): {type(exc).__name__}"
            ) from exc
        # A pure query shape can still smuggle side effects through
        # expressions callable from SELECT: reflect()/java_method()
        # (both lower to CallMethodViaReflection) invoke arbitrary
        # static JVM methods. Walk the analyzed plan's expression-node
        # classes — NOT its rendered text, where a string literal
        # containing "reflect(" would false-positive.
        import json as _json

        def _classes(node):
            if isinstance(node, dict):
                cls = node.get("class")
                if isinstance(cls, str):
                    yield cls
                for v in node.values():
                    yield from _classes(v)
            elif isinstance(node, list):
                for v in node:
                    yield from _classes(v)

        plan_tree = _json.loads(probe._jdf.queryExecution().analyzed().toJSON())
        for cls in _classes(plan_tree):
            if cls.endswith("CallMethodViaReflection"):
                raise ValueError(
                    "read-only guard: reflect()/java_method() can invoke "
                    "arbitrary JVM methods and is not allowed"
                )
    return spark.sql(stripped)


@register(
    "guarded_sql_passthrough",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    GROUP BY o_orderpriority
    """,
    doc="S9 guarded raw-SQL surface exercised end-to-end through "
    "spark.sql over registered views.",
)
def guarded_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_guarded_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE YEAR(o_orderdate) = 1996
        GROUP BY o_orderpriority
        """,
    )


@register(
    "fuzzy_name_match_pairs",
    """
    WITH n AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_name
    ), p AS (
      SELECT p_name, cnt,
             string_split(p_name, ' ')[1]  AS w1,
             string_split(p_name, ' ')[-1] AS w2
      FROM n
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS lev_dist,
           a.cnt AS n_a, b.cnt AS n_b
    FROM p a JOIN p b
      ON (a.w1 = b.w1 OR a.w2 = b.w2) AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="Fuzzy entity matching (record linkage): near-identical part "
    "names found by BLOCKING on either word of the name, then exact "
    "Levenshtein verification at distance <= 2 — the scalable "
    "re-expression of the reference's difflib fuzzy-city ladder "
    "(new_disaster_c.py get_close_matches 0.8 / resolve.py:122): "
    "instead of scoring the query against EVERY candidate, only "
    "pairs sharing a blocking key are scored, the LSH idea with "
    "lexical keys. Engine plan: dedupe names first (the match runs "
    "on the name vocabulary, not the row count), two equi-joins "
    "(one per blocking key) unioned then distinct — never an OR-join "
    "cartesian — and codegen'd levenshtein on the survivors only. "
    "Output carries per-name row counts so a merge step knows the "
    "blast radius of each match.",
)
def fuzzy_name_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    n = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    words = F.split(F.col("p_name"), " ")
    p = n.select(
        "p_name",
        "cnt",
        words.getItem(0).alias("w1"),
        F.element_at(words, -1).alias("w2"),
    )
    a = p.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("n_a"),
        "w1",
        "w2",
    )
    b = p.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("n_b"),
        F.col("w1").alias("v1"),
        F.col("w2").alias("v2"),
    )
    blocked = (
        a.join(b, F.col("w1") == F.col("v1"))
        .select("name_a", "name_b", "n_a", "n_b")
        .unionAll(
            a.join(b, F.col("w2") == F.col("v2")).select(
                "name_a", "name_b", "n_a", "n_b"
            )
        )
        .filter(F.col("name_a") < F.col("name_b"))
        .distinct()
    )
    lev = F.levenshtein("name_a", "name_b")
    return blocked.filter(lev <= 2).select(
        "name_a", "name_b", lev.alias("lev_dist"), "n_a", "n_b"
    )
