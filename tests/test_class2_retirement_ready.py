"""Class-2 retirement readiness — built AHEAD of any exercise
(the round-15/16 pre-registration discipline applied to the
round-17 post-#5 displacement policy, __spark_entry__.py).

The policy's clause (c): a class-2 retiree must KEEP a direct
cross-engine pytest pinning builder == oracle cell-exactly at the
driver SF, so cell-level evidence never leaves the suite when the
driver row retires. This file IS that pytest for all four ranked
candidates, registry-INDEPENDENT by construction: builders are
imported directly from their modules and the oracle SQL is held
here verbatim (byte-identical today to the registered oracle —
pinned below — so the strings cannot drift while the entries are
still registered). When a candidate retires, its registry entry
disappears from the parity sweep and THIS test keeps the pin; until
then the byte-equality assertion keeps the two copies honest.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.relational import (
    count_with_filter,
    distinct_single_column,
    eq_filter_project,
    scalar_sum_year,
)

# Ranked class-2 order from the policy block (__spark_entry__.py):
# (name, builder, subsuming still-registered entry, oracle SQL).
_CANDIDATES = [
    (
        "count_with_filter",
        count_with_filter,
        "pricing_summary",
        """
    SELECT COUNT(*) AS n_customers
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_nationkey = 3
    """,
    ),
    (
        "scalar_sum_year",
        scalar_sum_year,
        "year_range_between",
        """
    SELECT ROUND(SUM(o_totalprice), 2) AS total_1994
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1994
    """,
    ),
    (
        "eq_filter_project",
        eq_filter_project,
        "case_insensitive_eq",
        """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    ),
    (
        "distinct_single_column",
        distinct_single_column,
        "distinct_pairs",
        "SELECT DISTINCT c_mktsegment FROM customer",
    ),
]

_TABLES = ["customer", "orders"]


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<nan>" if math.isnan(v) else f"{v + 0.0:.6f}"
    return str(v)


@pytest.mark.parametrize("name,builder,subsumer,oracle", _CANDIDATES)
def test_class2_candidate_pin(name, builder, subsumer, oracle, spark, sf_oracle):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    qs = all_queries()
    # The subsuming entry must still be registered AND full-oracled —
    # clause (a)'s precondition; a class-2 retirement is invalid if
    # its subsumer ever retires first.
    assert subsumer in qs and qs[subsumer].oracle is not None

    # While the candidate is still registered, this file's oracle
    # copy must be byte-identical to the registered one (no drift).
    if name in qs and qs[name].oracle is not None:
        assert qs[name].oracle == oracle, f"{name}: oracle copies diverged"

    sdf = builder(spark, sf_oracle)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    got = sorted(tuple(_canon(r[i]) for i in so) for r in srows)

    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_oracle}/{t}.parquet')"
        )
    rel = con.sql(oracle)
    dcols = list(rel.columns)
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    want = sorted(tuple(_canon(r[i]) for i in do) for r in rel.fetchall())

    assert sorted(scols) == sorted(dcols)
    assert got == want
