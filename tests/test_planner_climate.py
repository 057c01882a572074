"""QuerySpec planner semantics + climate wide<->long ETL round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.plans import (
    QuerySpec,
    compile_spec,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    climate,
)


@pytest.fixture(scope="module")
def disasters(spark):
    return climate.build_disasters_yearly(spark).cache()


@pytest.fixture(scope="module")
def fema(spark):
    return climate.build_fema_assistance(spark).cache()


def test_filters_dict_semantics(fema):
    # The reference's advanced_query shapes (server.py:63-87):
    # scalar equality, (op, value), [(op, value), ...], IN-list.
    spec = QuerySpec(
        dataset="fema_assistance",
        metrics=["year", "state", "ihp_total"],
        filters={
            "state": ["TX", "FL"],
            "ihp_total": [(">", 1e6), ("<", 4e8)],
            "incident_type": "Hurricane",
        },
    )
    plan, dropped = compile_spec(spec, fema)
    assert dropped == []
    rows = plan.collect()
    truth = fema.filter(
        F.col("state").isin("TX", "FL")
        & (F.col("ihp_total") > 1e6)
        & (F.col("ihp_total") < 4e8)
        & (F.col("incident_type") == "Hurricane")
    ).count()
    assert len(rows) == truth > 0


def test_unknown_fields_dropped_and_reported(fema):
    spec = QuerySpec(dataset="fema_assistance", filters={"bogus_col": 1, "state": "TX"})
    plan, dropped = compile_spec(spec, fema)
    assert dropped == ["bogus_col"]
    assert plan.filter(F.col("state") != "TX").count() == 0


def test_case_insensitive_filter(fema):
    spec = QuerySpec(
        dataset="fema_assistance",
        filters={"state": "tx"},
        case_insensitive=frozenset({"state"}),
    )
    plan, _ = compile_spec(spec, fema)
    assert plan.count() > 0
    assert plan.filter(F.col("state") != "TX").count() == 0


def test_year_range_and_agg(disasters):
    spec = QuerySpec(
        dataset="disasters_yearly",
        metrics=["cost"],
        year_range=(1990, 1995),
        group_by=["year"],
        agg="sum",
        order_by=[("year", True)],
    )
    plan, _ = compile_spec(spec, disasters)
    rows = plan.collect()
    assert [r["year"] for r in rows] == list(range(1990, 1996))


def test_spec_validation():
    with pytest.raises(ValueError, match="mutually exclusive"):
        QuerySpec(dataset="x", year=2000, year_range=(1990, 2000)).validate()
    with pytest.raises(ValueError, match="unknown agg"):
        QuerySpec(dataset="x", agg="median").validate()


# ------------------------------------------------------------- wide <-> long

def test_disasters_wide_long_roundtrip(disasters):
    wide = climate.disasters_wide(disasters)
    # Wide has the reference's schema: '<Type> Count/Cost' + totals.
    assert "Tropical Cyclone Cost" in wide.columns
    assert "Total_Disaster_Count" in wide.columns
    back = climate.melt_disasters(wide)
    a = sorted(map(tuple, disasters.collect()))
    b = sorted(map(tuple, back.select("year", "disaster_type", "count", "cost").collect()))
    assert a == b


def test_disasters_wide_totals(disasters):
    wide = climate.disasters_wide(disasters).filter(F.col("year") == 1980).collect()[0]
    long_1980 = disasters.filter(F.col("year") == 1980).collect()
    assert wide["Total_Disaster_Count"] == sum(r["count"] for r in long_1980)
    assert wide["Total_Disaster_Cost"] == pytest.approx(
        sum(r["cost"] for r in long_1980), abs=0.11
    )


def test_emissions_wide_year_columns(spark):
    em = climate.build_emissions(spark)
    wide = climate.emissions_wide(em, [2019, 2020])
    # P2 year-as-column projection (EDGARclient.py:291-294).
    assert "2019" in wide.columns and "2020" in wide.columns
    brazil_co2 = wide.filter(
        (F.col("country") == "Brazil") & (F.col("substance") == "CO2")
    ).collect()[0]
    truth = em.filter(
        (F.col("country") == "Brazil") & (F.col("substance") == "CO2") & (F.col("year") == 2020)
    ).collect()[0]["value"]
    assert brazil_co2["2020"] == truth


def test_era5_wide_has_metric_columns(spark):
    era5 = climate.build_era5_monthly(spark, years=(2020, 2020))
    wide = climate.era5_wide(era5)
    for m in ("skin_temperature", "total_precipitation"):
        assert m in wide.columns
    n_cities = sum(len(v) for v in climate.ERA5_CITIES.values())
    assert wide.count() == n_cities * 12
