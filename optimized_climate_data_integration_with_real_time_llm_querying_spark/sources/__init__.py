"""Sources: ingest bridges + the climate domain tables.

The reference ingests CSV/Excel/NetCDF with pandas/xarray notebooks
into SQLite (SURVEY.md §2.1 S2-S5); here ingest lands normalized
long-form DataFrames/Parquet with explicit schemas, and the
domain-shaped tables (disasters, FEMA assistance, ERA5 monthly,
emissions) are first-class.
"""
