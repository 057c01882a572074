"""The reference's FULL ERA5 lifecycle, end to end in this engine:
a classic NetCDF file (assembled from the format spec) -> pure-stdlib
decode -> Spark frame -> reverse-geocode join against the gazetteer
(U13) -> monthly per-city rollup into the era5_monthly long form ->
the NL pipeline answers a question over it.

The reference does this across ERA5_preprocessing.ipynb (xarray
open_dataset + reverse_geocode) plus era5client/era5server point
queries; here it is one ingest pipeline + one grouped plan, with the
final answer checked against a Python recompute from the very bytes
that went into the .nc file.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import test_netcdf_classic as ncb
from optimized_climate_data_integration_with_real_time_llm_querying_spark.nl.pipeline import (
    ClimateEngine,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    climate,
    ingest,
)

SCALE, OFFSET = 0.01, 270.0
LATS = [23.81, 28.61]
LONS = [77.21, 90.41]
N_MONTHS = 12


def _raw(m: int, i: int, j: int) -> int:
    # deterministic packed int16: varies by month and grid point
    return 100 * (m + 1) + 10 * i + j


def _era5_nc_bytes() -> bytes:
    dims = [("valid_time", 0), ("latitude", 2), ("longitude", 2)]
    records = [
        [_raw(m, i, j) for i in range(2) for j in range(2)] for m in range(N_MONTHS)
    ]
    variables = [
        ("latitude", [1], [], ncb.NC_DOUBLE, LATS),
        ("longitude", [2], [], ncb.NC_DOUBLE, LONS),
        ("valid_time", [0], [], ncb.NC_INT, [[m] for m in range(N_MONTHS)]),
        (
            "skt",
            [0, 1, 2],
            [
                ("scale_factor", ncb.NC_DOUBLE, [SCALE]),
                ("add_offset", ncb.NC_DOUBLE, [OFFSET]),
            ],
            ncb.NC_SHORT,
            records,
        ),
    ]
    return ncb._build_classic(1, N_MONTHS, dims, [], variables)


def _nearest_city(lat: float, lon: float) -> str:
    return min(
        climate.CITY_COORDS.items(),
        key=lambda kv: ((lat - kv[1][0]) ** 2 + (lon - kv[1][1]) ** 2, kv[0]),
    )[0]


def test_nc_to_nl_answer(spark, tmp_path):
    p = tmp_path / "skt_2020.nc"
    p.write_bytes(_era5_nc_bytes())

    # 1. Ingest (stdlib classic decoder behind the same read_netcdf).
    grid = ingest.read_netcdf(spark, str(p))
    assert grid.columns == ["valid_time", "latitude", "longitude", "skt"]
    assert grid.count() == N_MONTHS * 4

    # 2. U13 reverse-geocode each grid point to its nearest city.
    located = climate.reverse_geocode_join(grid, climate.city_gazetteer(spark))

    # 3. Roll up to the era5_monthly long form (one metric).
    cities = spark.createDataFrame(
        [(c, city) for c, cs in climate.ERA5_CITIES.items() for city in cs],
        "country string, city string",
    )
    fam, unit = climate.ERA5_METRICS["skin_temperature"]
    monthly = (
        located.groupBy(F.col("nearest_city").alias("city"), "valid_time")
        .agg(F.avg("skt").alias("value"))
        .select(
            "city",
            F.add_months(F.lit("2020-01-01").cast("date"), F.col("valid_time")).alias(
                "date"
            ),
            "value",
        )
        .join(cities, "city")
    )
    lat = F.create_map(
        *[x for c, (la, lo) in climate.CITY_COORDS.items() for x in (F.lit(c), F.lit(la))]
    )
    lon = F.create_map(
        *[x for c, (la, lo) in climate.CITY_COORDS.items() for x in (F.lit(c), F.lit(lo))]
    )
    era5 = monthly.select(
        "country",
        "city",
        "date",
        lat[F.col("city")].alias("latitude"),
        lon[F.col("city")].alias("longitude"),
        F.lit("skin_temperature").alias("metric"),
        F.lit(fam).alias("family"),
        F.lit(unit).alias("unit"),
        "value",
    )

    # 4. Ask the NL engine over the ingested table.
    eng = ClimateEngine(spark, tables={"era5_monthly": era5})
    a = eng.ask("Average skin temperature in Dhaka in 2020")
    assert a.domain == "era5"
    rows = a.result.collect()
    assert len(rows) == 1 and rows[0]["city"] == "Dhaka"

    # 5. Truth: recompute from the exact bytes that built the file.
    vals = [
        _raw(m, i, j) * SCALE + OFFSET
        for m in range(N_MONTHS)
        for i in range(2)
        for j in range(2)
        if _nearest_city(LATS[i], LONS[j]) == "Dhaka"
    ]
    assert vals, "grid must contain Dhaka-nearest points"
    assert rows[0]["value"] == pytest.approx(sum(vals) / len(vals))

    # Sanity on the geocode itself: exact-coordinate points hit their
    # own city, off-diagonal points their nearest.
    hits = {
        (r.latitude, r.longitude): r.nearest_city
        for r in located.select("latitude", "longitude", "nearest_city")
        .distinct()
        .collect()
    }
    assert hits[(23.81, 90.41)] == "Dhaka"
    assert hits[(28.61, 77.21)] == "Delhi"
    # Off-diagonal points go to their true nearest (Thimphu beats
    # Dhaka for (28.61, 90.41)) — the python truth side agrees.
    assert hits[(28.61, 90.41)] == _nearest_city(28.61, 90.41) == "Thimphu"
    # Every month survives the geocode join (the pre-fix operator
    # collapsed repeated coordinates to one row per (lat, lon)).
    assert located.count() == N_MONTHS * 4


@pytest.mark.parametrize("container", ["classic", "hdf5"])
def test_grid_export_roundtrip(spark, tmp_path, container):
    """The reverse half of the lifecycle: the engine hands a grid
    BACK to netCDF-consuming tooling — in BOTH containers (classic
    CDF-1 and, since round 12, netCDF-4/HDF5). Ingest the classic
    file, repack the unpacked doubles to CF int16 with the same
    scale/offset, export through the pure-stdlib writer (valid_time
    as the record dimension, like the source), re-ingest, and demand
    cell-for-cell equality with the original frame — the writer/
    reader pair must preserve the reference's packed-ERA5
    representation exactly."""
    import numpy as np

    if container == "classic":
        from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf_writer import (
            write_netcdf_classic as writer,
        )
    else:
        from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf4_writer import (
            write_netcdf4 as writer,
        )

    p = tmp_path / "skt_src.nc"
    p.write_bytes(_era5_nc_bytes())
    grid = ingest.read_netcdf(spark, str(p))
    pdf = (
        grid.toPandas()
        .sort_values(["valid_time", "latitude", "longitude"])
        .reset_index(drop=True)
    )
    times = sorted(pdf["valid_time"].unique())
    lats = sorted(pdf["latitude"].unique())
    lons = sorted(pdf["longitude"].unique())
    skt = pdf["skt"].to_numpy().reshape(len(times), len(lats), len(lons))
    raw = np.round((skt - OFFSET) / SCALE).astype("<i2")
    p2 = tmp_path / ("skt_export.nc" if container == "classic" else "skt_export.nc4")
    writer(
        str(p2),
        dims=[
            ("valid_time", None),
            ("latitude", len(lats)),
            ("longitude", len(lons)),
        ],
        variables=[
            {
                "name": "valid_time",
                "nc_type": 4,
                "dims": ["valid_time"],
                "values": np.asarray(times, "i4"),
            },
            {
                "name": "latitude",
                "nc_type": 6,
                "dims": ["latitude"],
                "values": np.asarray(lats),
            },
            {
                "name": "longitude",
                "nc_type": 6,
                "dims": ["longitude"],
                "values": np.asarray(lons),
            },
            {
                "name": "skt",
                "nc_type": 3,
                "dims": ["valid_time", "latitude", "longitude"],
                "values": raw,
                "attrs": {"scale_factor": SCALE, "add_offset": OFFSET},
            },
        ],
        gattrs={"title": "engine export"},
    )
    back = (
        ingest.read_netcdf(spark, str(p2))
        .toPandas()
        .sort_values(["valid_time", "latitude", "longitude"])
        .reset_index(drop=True)
    )
    assert list(back.columns) == list(pdf.columns)
    for c in pdf.columns:
        np.testing.assert_array_equal(
            back[c].to_numpy(), pdf[c].to_numpy(), err_msg=c
        )


def test_nc_to_nl_trend_answer(spark, tmp_path):
    """Round-10 lifecycle extension: the SAME .nc ingest path now
    feeds the NL trend intent — a 3-year classic file rolls up to
    era5_monthly and 'skin temperature trend in Dhaka' fits the Holt
    recursion over the ingested yearly means, replayed here from the
    very bytes that built the file."""
    from decimal import ROUND_HALF_UP, Decimal

    n_months = 36  # 2020-2022
    dims = [("valid_time", 0), ("latitude", 2), ("longitude", 2)]
    records = [
        [_raw(m, i, j) for i in range(2) for j in range(2)] for m in range(n_months)
    ]
    variables = [
        ("latitude", [1], [], ncb.NC_DOUBLE, LATS),
        ("longitude", [2], [], ncb.NC_DOUBLE, LONS),
        ("valid_time", [0], [], ncb.NC_INT, [[m] for m in range(n_months)]),
        (
            "skt",
            [0, 1, 2],
            [
                ("scale_factor", ncb.NC_DOUBLE, [SCALE]),
                ("add_offset", ncb.NC_DOUBLE, [OFFSET]),
            ],
            ncb.NC_SHORT,
            records,
        ),
    ]
    p = tmp_path / "skt_2020_2022.nc"
    p.write_bytes(ncb._build_classic(1, n_months, dims, [], variables))

    grid = ingest.read_netcdf(spark, str(p))
    located = climate.reverse_geocode_join(grid, climate.city_gazetteer(spark))
    cities = spark.createDataFrame(
        [(c, city) for c, cs in climate.ERA5_CITIES.items() for city in cs],
        "country string, city string",
    )
    fam, unit = climate.ERA5_METRICS["skin_temperature"]
    era5 = (
        located.groupBy(F.col("nearest_city").alias("city"), "valid_time")
        .agg(F.avg("skt").alias("value"))
        .select(
            "city",
            F.add_months(F.lit("2020-01-01").cast("date"), F.col("valid_time")).alias(
                "date"
            ),
            "value",
        )
        .join(cities, "city")
        .select(
            "country",
            "city",
            "date",
            F.lit(0.0).alias("latitude"),
            F.lit(0.0).alias("longitude"),
            F.lit("skin_temperature").alias("metric"),
            F.lit(fam).alias("family"),
            F.lit(unit).alias("unit"),
            "value",
        )
    )

    eng = ClimateEngine(spark, tables={"era5_monthly": era5})
    a = eng.ask("What is the skin temperature trend in Dhaka?")
    assert a.domain == "era5"
    assert a.spec.year_range == (2020, 2022)
    rows = a.result.collect()
    assert [r.series for r in rows] == ["Dhaka skin_temperature"]

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    # Truth from the raw packed ints: monthly Dhaka mean -> yearly
    # mean (6 dp, matching the trend planner) -> the Holt recursion.
    monthly = []
    for m in range(n_months):
        vals = [
            _raw(m, i, j) * SCALE + OFFSET
            for i in range(2)
            for j in range(2)
            if _nearest_city(LATS[i], LONS[j]) == "Dhaka"
        ]
        monthly.append(sum(vals) / len(vals))
    series = [
        r6(sum(monthly[y * 12 : (y + 1) * 12]) / 12) for y in range(3)
    ]
    l, b = float(series[0]), float(series[1] - series[0])
    for y in series[1:]:
        l_new = r6(0.75 * y + 0.25 * (l + b))
        b = r6(0.25 * (l_new - l) + 0.75 * b)
        l = l_new
    assert (rows[0].level, rows[0].trend, rows[0].forecast_next) == (
        r6(l),
        r6(b),
        r6(l + b),
    )
    # The raw series grows 100 packed units/month = 1.0 K/month after
    # CF unpacking -> exactly +12/year once the state converges.
    assert rows[0].trend == pytest.approx(12.0)


def test_nc4_to_nl_answer(spark, tmp_path):
    """Round-10: the SAME lifecycle through the netCDF-4/HDF5
    container — a chunked+deflate HDF5 file (assembled from the spec
    by tests/test_hdf5_min.py's builder) ingests via the stdlib HDF5
    reader and the NL engine answers over it, with the answer checked
    against a Python recompute from the packed ints."""
    import numpy as np

    from test_hdf5_min import build_nc4

    records = np.array(
        [
            [[_raw(m, i, j) for j in range(2)] for i in range(2)]
            for m in range(N_MONTHS)
        ],
        "<i2",
    )
    p = tmp_path / "skt_2020.nc4"
    p.write_bytes(
        build_nc4(
            chunked_t2m=True,
            lat_vals=LATS,
            lon_vals=LONS,
            t2m=records,
            scale=SCALE,
            offset=OFFSET,
            var_name="skt",
            with_elevation=False,
        )
    )

    grid = ingest.read_netcdf(spark, str(p)).select(
        F.col("time").alias("valid_time"),
        F.col("lat").alias("latitude"),
        F.col("lon").alias("longitude"),
        "skt",
    )
    assert grid.count() == N_MONTHS * 4
    located = climate.reverse_geocode_join(grid, climate.city_gazetteer(spark))
    cities = spark.createDataFrame(
        [(c, city) for c, cs in climate.ERA5_CITIES.items() for city in cs],
        "country string, city string",
    )
    fam, unit = climate.ERA5_METRICS["skin_temperature"]
    era5 = (
        located.groupBy(F.col("nearest_city").alias("city"), "valid_time")
        .agg(F.avg("skt").alias("value"))
        .select(
            "city",
            F.add_months(F.lit("2020-01-01").cast("date"), F.col("valid_time")).alias(
                "date"
            ),
            "value",
        )
        .join(cities, "city")
        .select(
            "country",
            "city",
            "date",
            F.lit(0.0).alias("latitude"),
            F.lit(0.0).alias("longitude"),
            F.lit("skin_temperature").alias("metric"),
            F.lit(fam).alias("family"),
            F.lit(unit).alias("unit"),
            "value",
        )
    )
    eng = ClimateEngine(spark, tables={"era5_monthly": era5})
    a = eng.ask("Average skin temperature in Dhaka in 2020")
    rows = a.result.collect()
    assert len(rows) == 1 and rows[0]["city"] == "Dhaka"
    vals = [
        _raw(m, i, j) * SCALE + OFFSET
        for m in range(N_MONTHS)
        for i in range(2)
        for j in range(2)
        if _nearest_city(LATS[i], LONS[j]) == "Dhaka"
    ]
    assert rows[0]["value"] == pytest.approx(sum(vals) / len(vals))


def test_nc4_many_variable_dense_root_ingests(spark, tmp_path):
    """The real-file trigger for DENSE group storage: a netCDF-4 file
    with more than ~8 root variables under LIBVER_LATEST stores its
    root group as a fractal heap + link-name B-tree (any
    many-variable ERA5 export — ERA5_preprocessing.ipynb cell2-4's
    file shape). The stdlib HDF5 reader must ingest it directly, no
    xarray fallback (none is installed here, so a fallback would
    fail loudly)."""
    import numpy as np

    from test_hdf5_min import build_nc4

    records = np.array(
        [
            [[_raw(m, i, j) for j in range(2)] for i in range(2)]
            for m in range(N_MONTHS)
        ],
        "<i2",
    )
    p = tmp_path / "skt_dense_2020.nc4"
    p.write_bytes(
        build_nc4(
            modern=True,
            dense_root="direct",
            extra_vars=5,  # 10 root links total: past the compact threshold
            lat_vals=LATS,
            lon_vals=LONS,
            t2m=records,
            scale=SCALE,
            offset=OFFSET,
            var_name="skt",
            with_elevation=False,
        )
    )
    grid = ingest.read_netcdf(spark, str(p))
    assert {f"aux{i}" for i in range(5)} <= set(grid.columns)
    rows = grid.orderBy("time", "lat", "lon").collect()
    assert len(rows) == N_MONTHS * 4
    assert rows[0]["skt"] == pytest.approx(_raw(0, 0, 0) * SCALE + OFFSET)
