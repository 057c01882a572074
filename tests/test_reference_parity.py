"""Parity against the reference's REAL SQLite databases (read-only at
/root/reference): ingest through the engine's bridges, assert the
measured golden values from FIXTURES.md, and answer the reference's
own demo questions over the real data.

Skipped automatically when the reference checkout isn't present.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    reference_ingest as ri,
)

pytestmark = pytest.mark.skipif(
    not ri.reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def noaa(spark):
    return ri.load_noaa_disasters(spark).cache()


@pytest.fixture(scope="module")
def emissions(spark):
    return ri.load_edgar_emissions(spark).cache()


def test_noaa_shape_and_golden_1980(noaa):
    # 45 years x 7 types; golden: 1 drought in 1980 (FIXTURES §6.1).
    assert noaa.count() == 45 * 7
    row = noaa.filter((F.col("year") == 1980) & (F.col("disaster_type") == "Drought")).collect()[0]
    assert row["count"] == 1


def test_noaa_melt_consistent_with_stored_totals(spark, noaa):
    # The melted long form must re-sum to the DB's own total columns.
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_sqlite,
    )

    wide = read_sqlite(
        spark, f"{ri.REFERENCE_ROOT}/Billion_Dollar/disaster_data.db", "disaster_records"
    ).select("Year", "Total_Disaster_Count", "Total_Disaster_Cost")
    resum = noaa.groupBy("year").agg(
        F.sum("count").alias("c"), F.round(F.sum("cost"), 1).alias("k")
    )
    joined = wide.join(resum, wide.Year == resum.year)
    bad = joined.filter(
        (F.col("Total_Disaster_Count") != F.col("c"))
        | (F.abs(F.col("Total_Disaster_Cost") - F.col("k")) > 0.2)
    )
    assert bad.count() == 0


def test_fema_shape_and_dates(spark):
    fema = ri.load_fema_assistance(spark)
    assert fema.count() == 1235
    assert fema.select("state").distinct().count() == 57
    parsed = fema.filter(F.col("incident_start").isNotNull()).count()
    assert parsed == 1235  # every M/D/YYYY string parses
    years_match = fema.filter(F.year("incident_start") != F.col("year")).count()
    # incident year column and parsed start date agree for nearly all
    # rows (the DB has a handful of multi-year events)
    assert years_match < 30


def test_edgar_shape_and_spot_value(spark, emissions):
    import sqlite3

    assert emissions.select("gas").distinct().count() == 4
    con = sqlite3.connect(f"{ri.REFERENCE_ROOT}/GHG_Emissions/co2_emissions.db")
    name, truth = con.execute(
        'SELECT Name, "2020" FROM emissions WHERE "2020" IS NOT NULL LIMIT 1'
    ).fetchone()
    con.close()
    got = emissions.filter(
        (F.col("gas") == "CO2")
        & (F.col("country") == name.title())
        & (F.col("year") == 2020)
    ).collect()[0]["value"]
    assert got == pytest.approx(truth)


def test_reference_demo_questions_over_real_data(spark, noaa, emissions):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.nl.pipeline import (
        ClimateEngine,
    )

    eng = ClimateEngine(
        spark,
        tables={
            "disasters_yearly": noaa,
            "fema_assistance": ri.load_fema_assistance(spark),
            "emissions": emissions,
        },
    )
    # Reference demo question 1 (new_disaster_c.py:431), real answer.
    a = eng.ask("How many droughts occurred in 1980?")
    rows = a.result.collect()
    assert len(rows) == 1 and rows[0]["count"] == 1

    # Reference demo: CO2 in Brazil in 2020 (README.md:83) — equals
    # the DB's own year-column cell.
    a = eng.ask("What were the CO2 emissions in Brazil in 2020?")
    got = a.result.collect()
    assert len(got) == 1
    import sqlite3

    con = sqlite3.connect(f"{ri.REFERENCE_ROOT}/GHG_Emissions/co2_emissions.db")
    truth = con.execute(
        "SELECT \"2020\" FROM emissions WHERE Name = 'Brazil'"
    ).fetchone()[0]
    con.close()
    assert got[0]["value"] == pytest.approx(truth)

    # Multi-year methane (README.md:222).
    a = eng.ask("Methane emissions in Brazil from 2015 to 2020")
    ys = [r["year"] for r in a.result.collect()]
    assert ys == list(range(2015, 2021))


def test_full_dimension_breadth_over_real_data(spark, noaa, emissions):
    """U4/U8 breadth: a non-top-10 state (Ohio) and a non-top-10
    country (Indonesia) resolve and return the real DB's values,
    mirroring Disaster dollar/client.py:89-100 and
    EDGARclient.py:71-167."""
    import sqlite3

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.nl.pipeline import (
        ClimateEngine,
    )

    fema = ri.load_fema_assistance(spark)
    eng = ClimateEngine(
        spark,
        tables={
            "disasters_yearly": noaa,
            "fema_assistance": fema,
            "emissions": emissions,
        },
    )
    a = eng.ask("List flood incidents in Ohio")
    rows = a.result.collect()
    assert rows and all(r["state"] == "OH" for r in rows)
    truth_n = fema.filter(
        (F.col("state") == "OH") & (F.col("incident_type") == "Flood")
    ).count()
    assert len(rows) == min(truth_n, 25)  # prompt cap

    a = eng.ask("What were the CO2 emissions in Indonesia in 2020?")
    got = a.result.collect()
    con = sqlite3.connect(f"{ri.REFERENCE_ROOT}/GHG_Emissions/co2_emissions.db")
    truth = con.execute(
        "SELECT \"2020\" FROM emissions WHERE Name = 'Indonesia'"
    ).fetchone()[0]
    con.close()
    assert len(got) == 1 and got[0]["value"] == pytest.approx(truth)

    # And the synthetic default (no injected tables) carries the same
    # breadth: West Virginia must not resolve to Virginia.
    eng2 = ClimateEngine(spark)
    _, spec = eng2.build_spec("List severe storm incidents in West Virginia")
    assert spec.filters.get("state") == "WV"
    _, spec = eng2.build_spec("ihp total in Ohio in 2010")
    assert spec.filters.get("state") == "OH"
