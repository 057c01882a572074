"""P11 bbox filter, U13 reverse-geocode join, F2/F8 scalar functions,
S6/S7 catalog introspection."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark import catalog
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    climate,
)


def test_bbox_filter_crops(spark):
    era5 = climate.build_era5_monthly(spark, years=(2020, 2020))
    # Crop to the subcontinent's north: keeps Delhi (28.61, 77.21),
    # drops Colombo (6.93, 79.85).
    boxed = climate.bbox_filter(era5, (20.0, 40.0), (60.0, 95.0))
    cities = {r["city"] for r in boxed.select("city").distinct().collect()}
    assert "Delhi" in cities and "Colombo" not in cities


def test_reverse_geocode_join(spark):
    pts = spark.createDataFrame(
        [(28.7, 77.1), (6.95, 79.9), (24.9, 67.1)], "latitude double, longitude double"
    )
    out = climate.reverse_geocode_join(pts, climate.city_gazetteer(spark))
    got = {(r["latitude"], r["longitude"]): r["nearest_city"] for r in out.collect()}
    assert got[(28.7, 77.1)] == "Delhi"
    assert got[(6.95, 79.9)] == "Colombo"
    assert got[(24.9, 67.1)] == "Karachi"
    assert out.count() == 3  # exactly one row per point


def test_initcap_and_format(spark):
    # F2 title-case country names (CH4/N2O/F-gas ETL str.title());
    # F8 currency formatting (new_disaster_c.py:313-317).
    df = spark.createDataFrame([("brazil", 12.3456)], "name string, cost double")
    out = df.select(
        F.initcap("name").alias("name"),
        F.format_string("$%.1f billion", F.col("cost")).alias("pretty"),
    ).collect()[0]
    assert out["name"] == "Brazil"
    assert out["pretty"] == "$12.3 billion"


def test_catalog_introspection(spark, sf_small):
    # S6: list tables; S7: schema rendering for the LLM prompt.
    catalog.register_views(spark, sf_small)
    tables = catalog.list_tables(spark)
    assert set(catalog.TABLES) <= set(tables)
    s = catalog.describe_table(spark, sf_small, "nation")
    assert "n_nationkey" in s and "struct" in s


def test_unknown_table_raises(spark, sf_small):
    import pytest

    with pytest.raises(KeyError, match="unknown table"):
        catalog.load_table(spark, sf_small, "no_such_table")
