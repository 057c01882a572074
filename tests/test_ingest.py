"""Ingest bridges: CSV round-trip, SQLite read + guard, stub seams,
partitioned parquet sink with partition pruning."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    ingest,
)


def test_csv_with_schema(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("year,name,cost\n2020,Alpha,1.5\n2021,Beta,2.5\n")
    schema = T.StructType(
        [
            T.StructField("year", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("cost", T.DoubleType()),
        ]
    )
    df = ingest.read_csv(spark, str(p), schema)
    assert df.schema == schema
    assert df.count() == 2


def test_sqlite_roundtrip(spark, tmp_path):
    db = str(tmp_path / "ref.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE emissions (Name TEXT, Substance TEXT, y2020 REAL)")
    con.executemany(
        "INSERT INTO emissions VALUES (?,?,?)",
        [("Brazil", "CO2", 450.1), ("India", "CO2", 2600.2)],
    )
    con.commit()
    con.close()
    df = ingest.read_sqlite(spark, db, "emissions")
    rows = {r["Name"]: r["y2020"] for r in df.collect()}
    assert rows == {"Brazil": 450.1, "India": 2600.2}


def test_sqlite_unknown_table_guard(spark, tmp_path):
    db = str(tmp_path / "g.db")
    sqlite3.connect(db).execute("CREATE TABLE t (a INT)")
    with pytest.raises(ValueError, match="not in"):
        ingest.read_sqlite(spark, db, "nope; DROP TABLE t")


def test_excel_netcdf_seams(spark):
    with pytest.raises(NotImplementedError, match="openpyxl"):
        ingest.read_excel(spark, "/nonexistent.xlsx")
    with pytest.raises(NotImplementedError, match="xarray"):
        ingest.read_netcdf(spark, "/nonexistent.nc")


def test_partitioned_sink_prunes(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        climate,
    )

    out = str(tmp_path / "emissions_parquet")
    em = climate.build_emissions(spark).filter(F.col("year") >= 2020)
    ingest.write_parquet(em, out, partition_by=["gas"])
    assert os.path.isdir(os.path.join(out, "gas=CO2"))
    back = spark.read.parquet(out).filter(F.col("gas") == "CO2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(gas" in plan  # partition pruning
    assert back.count() == em.filter(F.col("gas") == "CO2").count()
