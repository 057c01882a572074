"""Ingest bridges: CSV, SQLite, Excel, NetCDF -> DataFrame/Parquet.

The reference's ETL is pandas notebooks writing SQLite (SURVEY.md
§2.1 S2-S5). Here ingest is explicit-schema Spark where a native
reader exists (CSV), and a chunked pandas/xarray bridge at the edge
where one doesn't (SQLite via stdlib sqlite3, Excel via openpyxl,
NetCDF via xarray) — data becomes Parquet immediately and everything
downstream is columnar.

Scale note: the bridge readers are single-process by design — they
exist for small operational sources (the reference's SQLite files are
<2 MB). Big data arrives as CSV/Parquet and uses the distributed
readers; a 100 TB NetCDF archive would get a DataSource V2 or a
conversion fleet, not this bridge (SURVEY.md §7.3 'custom Catalyst —
optional only').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """S2: CSV with a declared schema — never inferSchema in
    production (extra pass + type drift)."""
    return spark.read.csv(path, header=header, schema=schema, mode="FAILFAST")


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    batch_size: int = 50_000,
) -> DataFrame:
    """S1: read a SQLite table (the reference's storage engine) via
    the stdlib driver, batched through Arrow into a DataFrame.

    Identifier is quoted + validated against sqlite_master — the same
    list-tables guard the reference's servers apply before
    interpolating a table name (era5server.py:43-45).
    """
    import sqlite3

    import pandas as pd

    con = sqlite3.connect(db_path)
    try:
        tables = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        if table not in tables:
            raise ValueError(f"table {table!r} not in {db_path}: {sorted(tables)}")
        frames = []
        q = f'SELECT * FROM "{table}"'
        for chunk in pd.read_sql_query(q, con, chunksize=batch_size):
            frames.append(chunk)
        pdf = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.read_sql_query(q, con)
        )
    finally:
        con.close()
    return spark.createDataFrame(pdf)


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """S3: Excel bridge (NOAA/EDGAR xlsx). Needs openpyxl, which this
    environment does not ship — the seam raises cleanly so deployments
    with the dependency get the real reader."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:
        raise NotImplementedError(
            "Excel ingest needs openpyxl (not in this environment); "
            "pre-convert to CSV/Parquet or install it"
        ) from e
    return spark.createDataFrame(pd.read_excel(path, sheet_name=sheet))


def read_netcdf(spark: SparkSession, path: str) -> DataFrame:
    """S4: NetCDF bridge (ERA5 .nc). Needs xarray+netcdf4 — same
    explicit seam as read_excel. The reference's equivalent is
    xarray.open_dataset(...).to_dataframe() (ERA5_preprocessing
    notebook cell2-4)."""
    try:
        import xarray as xr
    except ImportError as e:
        raise NotImplementedError(
            "NetCDF ingest needs xarray/netcdf4 (not in this environment); "
            "pre-convert to Parquet or install them"
        ) from e
    pdf = xr.open_dataset(path).to_dataframe().reset_index()
    return spark.createDataFrame(pdf)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S5: the sink — normalized Parquet, optionally hive-partitioned
    (e.g. by country/gas/year) so downstream filters partition-prune."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
