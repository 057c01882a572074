"""S9 guarded raw-SQL passthrough: read-only guard must hold even for
statements that *start* read-only (ADVICE r1 high: Spark's grammar
allows CTEs before DML, so a prefix check alone is bypassable)."""

from __future__ import annotations

import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.relational import (
    run_guarded_sql,
)


def test_plain_select_allowed(spark, sf_small):
    out = run_guarded_sql(spark, sf_small, "SELECT COUNT(*) AS n FROM nation")
    assert out.collect()[0]["n"] == 25


def test_cte_select_allowed(spark, sf_small):
    out = run_guarded_sql(
        spark,
        sf_small,
        "WITH r AS (SELECT r_regionkey FROM region) SELECT COUNT(*) AS n FROM r",
    )
    assert out.collect()[0]["n"] == 5


def test_describe_allowed(spark, sf_small):
    assert run_guarded_sql(spark, sf_small, "DESCRIBE nation").count() > 0


def test_dml_prefix_rejected(spark, sf_small):
    with pytest.raises(ValueError):
        run_guarded_sql(spark, sf_small, "DROP TABLE nation")
    with pytest.raises(ValueError):
        run_guarded_sql(spark, sf_small, "INSERT INTO nation VALUES (1, 'x', 1, 'y')")


def test_cte_dml_bypass_rejected(spark, sf_small, tmp_path):
    # The round-1 hole: starts with WITH, writes files.
    stmt = (
        "WITH x AS (SELECT 1 AS a) "
        f"INSERT OVERWRITE DIRECTORY '{tmp_path}/pwned' USING parquet SELECT * FROM x"
    )
    with pytest.raises(ValueError):
        run_guarded_sql(spark, sf_small, stmt)
    assert not (tmp_path / "pwned").exists()


def test_multi_statement_rejected(spark, sf_small):
    with pytest.raises(ValueError):
        run_guarded_sql(spark, sf_small, "SELECT 1; DROP TABLE nation")


def test_trailing_line_comment_allowed(spark, sf_small):
    # ADVICE r2 medium: a trailing `--` comment must not swallow the
    # probe's closing paren and reject a legitimate query.
    out = run_guarded_sql(
        spark, sf_small, "SELECT COUNT(*) AS n FROM nation -- note"
    )
    assert out.collect()[0]["n"] == 25


def test_reflect_rejected(spark, sf_small):
    # ADVICE r2 low: reflect()/java_method() invoke arbitrary static
    # JVM methods from inside a pure-query shape.
    with pytest.raises(ValueError, match="reflect"):
        run_guarded_sql(
            spark,
            sf_small,
            "SELECT reflect('java.lang.System', 'getProperty', 'user.dir')",
        )
    with pytest.raises(ValueError, match="java_method"):
        run_guarded_sql(
            spark,
            sf_small,
            "SELECT java_method('java.lang.Thread', 'currentThread')",
        )


def test_reflect_in_string_literal_allowed(spark, sf_small):
    # The ban scans the analyzed plan, not raw text: the word
    # "reflect(" inside a string literal is data, not an expression.
    out = run_guarded_sql(
        spark, sf_small, "SELECT 'uses reflect( in prose' AS s"
    )
    assert out.count() == 1
