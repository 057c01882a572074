"""Ingest the reference's REAL SQLite databases into the engine's
canonical long-form model.

This is the migration path for an actual user of the reference: point
these loaders at the four module databases and every wide/sharded
table lands in the normalized shapes the engine queries
(SURVEY.md §1.2). The transforms are the engine's own operators —
stack() melts for year-columns and type-column families, to_date for
the M/D/YYYY strings, union for the per-gas database shards.

Reference schemas handled (measured; FIXTURES.md):
- `disaster_records` (Billion_Dollar/disaster_data.db): 1 row/year,
  '<Type> Count'/'<Type> Cost' columns -> (year, disaster_type,
  count, cost);
- `disaster_dollar_db` (Disaster dollar/disaster_fema_hud.db): 1
  row/event, M/D/YYYY date strings -> typed DateType;
- `emissions` x 4 gas databases (GHG_Emissions/*.db): 1 row/country-
  substance, one REAL column per year -> (gas, ..., year, value).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .climate import DISASTER_TYPES
from .ingest import read_sqlite

REFERENCE_ROOT = "/root/reference"

GAS_DB_FILES = {
    "CO2": "GHG_Emissions/co2_emissions.db",
    "CH4": "GHG_Emissions/methane_emissions.db",
    "N2O": "GHG_Emissions/N2o_emissions.db",
    "F-gas": "GHG_Emissions/Flourinated_gas_emissions.db",
}


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    return os.path.exists(os.path.join(root, "Billion_Dollar", "disaster_data.db"))


def load_noaa_disasters(spark: SparkSession, root: str = REFERENCE_ROOT) -> DataFrame:
    """disaster_records (wide) -> canonical long (year, disaster_type,
    count, cost)."""
    wide = read_sqlite(
        spark, os.path.join(root, "Billion_Dollar", "disaster_data.db"), "disaster_records"
    )
    stack_args = ", ".join(f"'{t}', `{t} Count`, `{t} Cost`" for t in DISASTER_TYPES)
    return wide.select(
        F.col("Year").cast("int").alias("year"),
        F.expr(
            f"stack({len(DISASTER_TYPES)}, {stack_args}) AS (disaster_type, count, cost)"
        ),
    ).select(
        "year",
        "disaster_type",
        F.col("count").cast("int").alias("count"),
        F.col("cost").cast("double").alias("cost"),
    )


def load_fema_assistance(spark: SparkSession, root: str = REFERENCE_ROOT) -> DataFrame:
    """disaster_dollar_db with real typed dates. The DB stores
    M/D/YYYY strings; the upstream CSV revision used ISO — parse both
    (SURVEY.md §1.2 date-format inconsistency, resolved at ingest)."""
    raw = read_sqlite(
        spark,
        os.path.join(root, "Disaster dollar", "disaster_fema_hud.db"),
        "disaster_dollar_db",
    )

    def parse(col: str):
        # try_to_date: the real DB holds sentinel strings too
        # ('On-going' in incident_end) -> NULL, kept as missing.
        c = F.col(col).cast("string")
        return F.coalesce(
            F.expr(f"try_to_date(`{col}`, 'M/d/yyyy')"),
            F.expr(f"try_to_date(`{col}`, 'yyyy-MM-dd')"),
        ).alias(col)

    return raw.select(
        F.col("year").cast("int").alias("year"),
        "event",
        F.col("incident_number").cast("int").alias("incident_number"),
        parse("incident_start"),
        parse("incident_end"),
        "state",
        "incident_type",
        *[
            F.col(c).cast("double").alias(c)
            for c in (
                "valid_ihp_applications",
                "eligible_ihp_applications",
                "ihp_total",
                "pa_total",
                "cdbg_dr_allocation",
                "pa_projects_count",
            )
        ],
    )


def load_edgar_emissions(spark: SparkSession, root: str = REFERENCE_ROOT) -> DataFrame:
    """The four per-gas databases un-sharded + year columns melted:
    (gas, ipcc_annex, country_code, country, substance, year, value)."""
    out: DataFrame | None = None
    for gas, rel in GAS_DB_FILES.items():
        wide = read_sqlite(spark, os.path.join(root, rel), "emissions")
        year_cols = sorted(c for c in wide.columns if c.isdigit())
        stack_args = ", ".join(f"'{y}', `{y}`" for y in year_cols)
        long_df = wide.select(
            F.lit(gas).alias("gas"),
            F.col("IPCC_annex").alias("ipcc_annex"),
            F.col("Country_code_A3").alias("country_code"),
            F.initcap(F.col("Name")).alias("country"),
            F.col("Substance").alias("substance"),
            F.expr(f"stack({len(year_cols)}, {stack_args}) AS (year, value)"),
        ).select(
            "gas",
            "ipcc_annex",
            "country_code",
            "country",
            "substance",
            F.col("year").cast("int").alias("year"),
            F.col("value").cast("double").alias("value"),
        )
        out = long_df if out is None else out.unionByName(long_df)
    return out
