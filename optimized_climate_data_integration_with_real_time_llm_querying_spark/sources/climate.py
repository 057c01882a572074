"""Reference-shaped climate datasets + dimension tables.

Shapes follow FIXTURES.md (measured from the reference's shipped
SQLite databases): NOAA disasters_yearly, FEMA fema_assistance, ERA5
era5_monthly, EDGAR emissions — all in canonical LONG form
(SURVEY.md §1.2: long is canonical, wide is a pivot view), un-sharded
(country/gas are columns, not table/database names — reverses
``era5client.py:21-30`` and ``emissions_mcp.py:8-13``).

Data is generated deterministically (fixed LCG seed) so golden tests
are stable; a production deployment would replace ``build_*`` with
the real CSV/Excel/NetCDF ingest (see ``.ingest`` module) — every
schema and transform stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DISASTER_TYPES = [
    "Drought",
    "Flooding",
    "Freeze",
    "Severe Storm",
    "Tropical Cyclone",
    "Wildfire",
    "Winter Storm",
]

# U1 keyword->canonical type map (new_disaster_c.py:19-34 semantics).
DISASTER_SYNONYMS = {
    "drought": "Drought",
    "droughts": "Drought",
    "flood": "Flooding",
    "floods": "Flooding",
    "flooding": "Flooding",
    "freeze": "Freeze",
    "freezes": "Freeze",
    "storm": "Severe Storm",
    "storms": "Severe Storm",
    "hurricane": "Tropical Cyclone",
    "hurricanes": "Tropical Cyclone",
    "cyclone": "Tropical Cyclone",
    "cyclones": "Tropical Cyclone",
    "typhoon": "Tropical Cyclone",
    "wildfire": "Wildfire",
    "wildfires": "Wildfire",
    "fire": "Wildfire",
    "fires": "Wildfire",
    "winter storm": "Winter Storm",
    "blizzard": "Winter Storm",
}

FEMA_INCIDENT_TYPES = [
    "Coastal Storm", "Dam or Levee Break", "Earthquake", "Fire", "Flood",
    "Freezing", "Hurricane", "Mud/Landslide", "Severe Ice Storm",
    "Severe Storm", "Snowstorm", "Straight-Line Winds", "Tornado",
    "Tropical Storm", "Tsunami", "Typhoon", "Volcanic Eruption",
    "Winter Storm", "Other",
]

# Full dimension breadth (57 states/territories, 223 EDGAR
# countries) lives in .vocab; re-exported here so every consumer
# (NL resolution, synthetic builders, dimension tables) sees the
# complete vocabularies, matching the real databases.
from .vocab import GHG_COUNTRIES, US_STATES  # noqa: F401

ERA5_COUNTRIES = ["india", "nepal", "bhutan", "pakistan", "bangladesh", "srilanka", "afghanistan"]

ERA5_CITIES = {
    "india": ["Delhi", "Mumbai", "Chennai"],
    "nepal": ["Kathmandu", "Pokhara"],
    "bhutan": ["Thimphu"],
    "pakistan": ["Karachi", "Lahore"],
    "bangladesh": ["Dhaka", "Chittagong"],
    "srilanka": ["Colombo", "Kandy"],
    "afghanistan": ["Kabul", "Herat"],
}

# (lat, lon) per city — the gazetteer the reverse-geocode join uses
# (coordinates approximate, public knowledge).
CITY_COORDS = {
    "Delhi": (28.61, 77.21), "Mumbai": (19.08, 72.88), "Chennai": (13.08, 80.27),
    "Kathmandu": (27.72, 85.32), "Pokhara": (28.21, 83.99),
    "Thimphu": (27.47, 89.64),
    "Karachi": (24.86, 67.00), "Lahore": (31.55, 74.34),
    "Dhaka": (23.81, 90.41), "Chittagong": (22.36, 91.78),
    "Colombo": (6.93, 79.85), "Kandy": (7.29, 80.64),
    "Kabul": (34.56, 69.21), "Herat": (34.35, 62.20),
}

# Metric families mirror the reference's _df0/_df1 vertical split
# (era5client.py:33-34); family is metadata here, not a table name.
ERA5_METRICS = {
    "high_vegetation_cover": ("df0", "fraction"),
    "surface_pressure": ("df0", "Pa"),
    "total_ozone": ("df0", "atm-cm"),
    "wind_speed": ("df0", "m/s"),
    "skin_temperature": ("df0", "K"),
    "uv_radiation": ("df1", "W/m2"),
    "snowfall": ("df1", "m"),
    "net_thermal_radiation": ("df1", "W/m2"),
    "total_precipitation": ("df1", "m"),
    "convective_rain_rate": ("df1", "kg/m2/s"),
    "mean_evaporation_rate": ("df1", "kg/m2/s"),
    "mean_moisture_divergence": ("df1", "kg/m2/s"),
    "mean_precipitation_rate": ("df1", "kg/m2/s"),
}

FGAS_SUBSTANCES = [
    "HFC-125", "HFC-134a", "HFC-143a", "HFC-152a", "HFC-227ea", "HFC-23",
    "HFC-236fa", "HFC-245fa", "HFC-32", "HFC-365mfc", "HFC-43-10-mee",
    "SF6", "NF3", "CF4", "C2F6", "c-C4F8",
]


def _lcg(col, lo: float, hi: float):
    """Deterministic pseudo-random double in [lo, hi) from an integer
    column — xxhash64 as the mixer so generation is pure Spark."""
    u = (F.abs(F.xxhash64(col)) % 1_000_000) / 1_000_000.0
    return lo + u * (hi - lo)


def build_disasters_yearly(spark: SparkSession) -> DataFrame:
    """Long form of NOAA `disaster_records` (45 years x 7 types):
    (year, disaster_type, count, cost)."""
    years = spark.range(1980, 2025).select(F.col("id").cast("int").alias("year"))
    types = spark.createDataFrame(
        [(t,) for t in DISASTER_TYPES], "disaster_type string"
    )
    base = years.crossJoin(types)
    seed = F.concat(F.col("year").cast("string"), F.lit("|"), F.col("disaster_type"))
    return base.select(
        "year",
        "disaster_type",
        F.floor(_lcg(seed, 0, 8)).cast("int").alias("count"),
        F.round(_lcg(F.concat(seed, F.lit("c")), 0.0, 60.0), 1).alias("cost"),
    )


def disasters_wide(long_df: DataFrame) -> DataFrame:
    """The reference's wide shape: one row per year, '<Type> Count' /
    '<Type> Cost' columns plus totals (schema of disaster_data.db)."""
    counts = (
        long_df.groupBy("year")
        .pivot("disaster_type", DISASTER_TYPES)
        .agg(F.first("count"))
        .select("year", *[F.col(f"`{t}`").alias(f"{t} Count") for t in DISASTER_TYPES])
    )
    costs = (
        long_df.groupBy("year")
        .pivot("disaster_type", DISASTER_TYPES)
        .agg(F.first("cost"))
        .select("year", *[F.col(f"`{t}`").alias(f"{t} Cost") for t in DISASTER_TYPES])
    )
    wide = counts.join(costs, "year")
    total_count = sum(F.col(f"`{t} Count`") for t in DISASTER_TYPES)
    total_cost = sum(F.col(f"`{t} Cost`") for t in DISASTER_TYPES)
    return wide.select(
        "*",
        total_count.alias("Total_Disaster_Count"),
        F.round(total_cost, 1).alias("Total_Disaster_Cost"),
    )


def melt_disasters(wide_df: DataFrame) -> DataFrame:
    """Wide -> canonical long via stack() — the ingest-side melt
    (SURVEY.md §1.2). Inverse of disasters_wide."""
    stack_args = ", ".join(
        f"'{t}', `{t} Count`, `{t} Cost`" for t in DISASTER_TYPES
    )
    return wide_df.select(
        "year",
        F.expr(
            f"stack({len(DISASTER_TYPES)}, {stack_args}) AS (disaster_type, count, cost)"
        ),
    )


def build_fema_assistance(spark: SparkSession, n_rows: int = 6000) -> DataFrame:
    """FEMA/HUD `disaster_dollar_db` shape: one row per disaster event
    (year, event, incident_number, dates, state, incident_type, ihp/pa
    dollar columns). Dates are real DateType — the reference stores
    M/D/YYYY strings (FIXTURES.md §2); parsing happens at ingest."""
    rows = spark.range(n_rows).select(F.col("id").alias("i"))
    states = list(US_STATES.values())
    types = FEMA_INCIDENT_TYPES
    year = (2003 + F.col("i") % 22).cast("int")
    state = F.array(*[F.lit(s) for s in states])[(F.abs(F.xxhash64(F.col("i"))) % len(states)).cast("int")]
    itype = F.array(*[F.lit(t) for t in types])[(F.abs(F.xxhash64(F.col("i") + 7)) % len(types)).cast("int")]
    start = F.make_date(year, (F.abs(F.xxhash64(F.col("i") + 3)) % 12 + 1).cast("int"),
                        (F.abs(F.xxhash64(F.col("i") + 5)) % 28 + 1).cast("int"))
    return rows.select(
        year.alias("year"),
        F.concat(state, F.lit(" "), itype, F.lit(" #"), F.col("i").cast("string")).alias("event"),
        (1000 + F.col("i")).cast("int").alias("incident_number"),
        start.alias("incident_start"),
        F.date_add(start, (F.abs(F.xxhash64(F.col("i") + 11)) % 30 + 1).cast("int")).alias("incident_end"),
        state.alias("state"),
        itype.alias("incident_type"),
        F.round(_lcg(F.col("i") + 13, 0, 50000), 0).alias("valid_ihp_applications"),
        F.round(_lcg(F.col("i") + 17, 0, 40000), 0).alias("eligible_ihp_applications"),
        F.round(_lcg(F.col("i") + 19, 0, 5e8), 2).alias("ihp_total"),
        F.round(_lcg(F.col("i") + 23, 0, 2e9), 2).alias("pa_total"),
        F.round(_lcg(F.col("i") + 29, 0, 1e9), 2).alias("cdbg_dr_allocation"),
        F.floor(_lcg(F.col("i") + 31, 0, 500)).cast("double").alias("pa_projects_count"),
    )


def build_era5_monthly(spark: SparkSession, years: tuple[int, int] = (2019, 2022)) -> DataFrame:
    """ERA5 monthly city means, un-sharded and LONG on metric:
    (country, city, date, metric, family, unit, value).

    The reference's 14 `{country}_df{0,1}` tables collapse here; the
    per-metric-family split survives as the `family` column."""
    city_rows = [
        (c, city) for c, cities in ERA5_CITIES.items() for city in cities
    ]
    cities = spark.createDataFrame(city_rows, "country string, city string")
    months = spark.sql(
        f"SELECT explode(sequence(to_date('{years[0]}-01-01'), "
        f"to_date('{years[1]}-12-01'), interval 1 month)) AS date"
    )
    metrics = spark.createDataFrame(
        [(m, fam, unit) for m, (fam, unit) in ERA5_METRICS.items()],
        "metric string, family string, unit string",
    )
    base = cities.crossJoin(months).crossJoin(metrics)
    seed = F.concat_ws("|", "city", F.col("date").cast("string"), "metric")
    lat = F.create_map(*[x for c, (la, lo) in CITY_COORDS.items() for x in (F.lit(c), F.lit(la))])
    lon = F.create_map(*[x for c, (la, lo) in CITY_COORDS.items() for x in (F.lit(c), F.lit(lo))])
    return base.select(
        "country",
        "city",
        "date",
        lat[F.col("city")].alias("latitude"),
        lon[F.col("city")].alias("longitude"),
        "metric",
        "family",
        "unit",
        F.round(_lcg(seed, 0.0, 300.0), 3).alias("value"),
    )


def era5_wide(long_df: DataFrame) -> DataFrame:
    """Wide-on-metric view (one column per metric) — the reference's
    table shape, via pivot with explicit values."""
    metrics = list(ERA5_METRICS)
    return (
        long_df.groupBy("country", "city", "date")
        .pivot("metric", metrics)
        .agg(F.first("value"))
    )


def build_emissions(spark: SparkSession) -> DataFrame:
    """EDGAR emissions, un-sharded and LONG on year:
    (gas, ipcc_annex, country_code, country, substance, year, value).

    The reference's 4 per-gas databases and 54 per-year REAL columns
    (FIXTURES.md §3) become two ordinary columns."""
    country_rows = [(name, code) for name, code in GHG_COUNTRIES.items()]
    countries = spark.createDataFrame(country_rows, "country string, country_code string")
    gas_substances = (
        [("CO2", "CO2"), ("CH4", "CH4"), ("N2O", "N2O")]
        + [("F-gas", s) for s in FGAS_SUBSTANCES]
    )
    gases = spark.createDataFrame(gas_substances, "gas string, substance string")
    years = spark.range(1970, 2024).select(F.col("id").cast("int").alias("year"))
    base = countries.crossJoin(gases).crossJoin(years)
    # F-gas reporting starts 1990 in the reference DB.
    base = base.filter(~((F.col("gas") == "F-gas") & (F.col("year") < 1990)))
    seed = F.concat_ws("|", "country_code", "substance", F.col("year").cast("string"))
    return base.select(
        "gas",
        F.when(F.col("country").isin("United States", "Germany", "Japan", "Canada", "Australia"), "Annex_I")
        .otherwise("Non-Annex_I")
        .alias("ipcc_annex"),
        "country_code",
        "country",
        "substance",
        "year",
        F.round(_lcg(seed, 0.0, 5000.0), 3).alias("value"),
    )


def emissions_wide(long_df: DataFrame, years: list[int]) -> DataFrame:
    """Year-as-column view (`SELECT "2020" FROM emissions` shape,
    EDGARclient.py:291-294) for the requested years."""
    return (
        long_df.groupBy("gas", "ipcc_annex", "country_code", "country", "substance")
        .pivot("year", years)
        .agg(F.first("value"))
    )


def bbox_filter(
    df: DataFrame,
    lat_range: tuple[float, float],
    lon_range: tuple[float, float],
) -> DataFrame:
    """P11 bounding-box geo filter (the ETL's South-Asia crop,
    ``ERA5_preprocessing.ipynb:cell7`` df.query on lat/lon ranges) —
    a 4-way between that pushes to the scan, and prunes partitions
    outright if the sink partitioned by a geo grid."""
    return df.filter(
        F.col("latitude").between(*lat_range) & F.col("longitude").between(*lon_range)
    )


def reverse_geocode_join(points: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """U13: (lat, lon) -> nearest gazetteer city, as a broadcast join
    + rank instead of the reference's per-row reverse_geocode call
    (``ERA5_preprocessing.ipynb:cell6,cell8``).

    Broadcast the (small) gazetteer against every point, score by
    squared euclidean distance in degree space, keep the argmin per
    point — a map-side join however many billions of points there
    are. For planetary gazetteers swap in a geohash-bucketed join
    (equi-join on cell + neighbor probe).
    """
    from pyspark.sql import Window as W

    g = gazetteer.select(
        F.col("name").alias("_city"),
        F.col("lat").alias("_glat"),
        F.col("lon").alias("_glon"),
    )
    d2 = (F.col("latitude") - F.col("_glat")) ** 2 + (F.col("longitude") - F.col("_glon")) ** 2
    # Geocode the DISTINCT coordinates, then map back: coordinates
    # repeat heavily (every time step of a grid shares them — the
    # ERA5 file shape), so ranking over the raw join would both do
    # |rows| x |gazetteer| distance work AND collapse repeated
    # coordinates to a single surviving row (row_number picks one
    # winner per (lat, lon) partition across ALL rows — a bug the
    # .nc-to-NL lifecycle test pins). Distinct-first is also the
    # scale-correct plan: |distinct coords| is grid-sized, not
    # corpus-sized, so the argmin table broadcasts back.
    w = W.partitionBy("latitude", "longitude").orderBy(F.col("_d2"), F.col("_city"))
    nearest = (
        points.select("latitude", "longitude")
        .distinct()
        .join(F.broadcast(g))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("latitude", "longitude", F.col("_city").alias("nearest_city"))
    )
    return points.join(F.broadcast(nearest), ["latitude", "longitude"])


def city_gazetteer(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c, la, lo) for c, (la, lo) in CITY_COORDS.items()],
        "name string, lat double, lon double",
    )


# --------------------------------------------------------------------------
# Dimension tables (replace the reference's hard-coded dicts,
# SURVEY.md §7.1).
# --------------------------------------------------------------------------

def build_dimensions(spark: SparkSession) -> dict[str, DataFrame]:
    states = spark.createDataFrame(
        [(n, a) for n, a in US_STATES.items()], "name string, abbr string"
    )
    countries = spark.createDataFrame(
        [(n, c) for n, c in GHG_COUNTRIES.items()], "name string, code_a3 string"
    )
    metrics = spark.createDataFrame(
        [(m, fam, unit) for m, (fam, unit) in ERA5_METRICS.items()],
        "name string, family string, unit string",
    )
    cities = spark.createDataFrame(
        [(city, c) for c, cs in ERA5_CITIES.items() for city in cs],
        "name string, country string",
    )
    synonyms = spark.createDataFrame(
        [(k, v) for k, v in DISASTER_SYNONYMS.items()],
        "keyword string, canonical string",
    )
    return {
        "states": states,
        "countries": countries,
        "metrics": metrics,
        "cities": cities,
        "disaster_type_synonyms": synonyms,
    }


def register_climate_views(spark: SparkSession) -> dict[str, DataFrame]:
    """Build all domain tables + dims and register them as temp views
    for the SQL surface. Returns the DataFrames by name."""
    dfs = {
        "disasters_yearly": build_disasters_yearly(spark),
        "fema_assistance": build_fema_assistance(spark),
        "era5_monthly": build_era5_monthly(spark),
        "emissions": build_emissions(spark),
        **build_dimensions(spark),
    }
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
