"""Invariant tests for the event/order analytics battery
(queries/analytics.py) beyond oracle parity: funnel monotonicity,
SCD2 interval integrity, reconciliation totals."""

from __future__ import annotations

from collections import defaultdict

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)

from conftest import SF_ORACLE

QS = all_queries()


def test_funnel_is_monotone(spark):
    rows = {r.stage: r for r in QS["funnel_conversion"].builder(spark, SF_ORACLE).collect()}
    assert set(rows) == {"1_signup", "2_view", "3_purchase"}
    assert rows["1_signup"].n_users >= rows["2_view"].n_users >= rows["3_purchase"].n_users
    assert rows["1_signup"].conv_rate == 1.0
    for r in rows.values():
        assert r.conv_rate is None or 0.0 <= r.conv_rate <= 1.0


def test_scd2_intervals_are_contiguous_and_versioned(spark):
    rows = QS["scd2_priority_history"].builder(spark, SF_ORACLE).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.custkey].append(r)
    assert by_cust
    for cust, hist in by_cust.items():
        hist.sort(key=lambda r: r.version_no)
        # versions are 1..n dense; exactly one current row; each
        # interval ends where the next begins; no zero-length or
        # same-value adjacent runs
        assert [r.version_no for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.is_current for r in hist) == 1
        assert hist[-1].is_current == 1 and hist[-1].valid_to is None
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from, cust
            assert a.priority != b.priority, cust


def test_reconcile_partitions_all_orders(spark):
    import duckdb

    rows = QS["orders_lineitem_reconcile"].builder(spark, SF_ORACLE).collect()
    n_orders = duckdb.sql(
        f"""SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM read_parquet('{SF_ORACLE}/orders.parquet')
              FULL OUTER JOIN (
                SELECT DISTINCT l_orderkey
                FROM read_parquet('{SF_ORACLE}/lineitem.parquet')
              ) ON o_orderkey = l_orderkey)"""
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.total_gap >= 0 and r.avg_gap >= 0
        if r.status == "match":
            assert r.avg_gap <= 0.01
