"""Schema registry + table loading.

The reference re-discovers schema at query time with
``sqlite_master`` / ``PRAGMA table_info`` (SURVEY.md §1.3 — e.g.
reference ``Billion_Dollar/server.py:17-30``, ``new_disaster_c.py:166-193``).
Here schemas are declared once, and introspection (S6/S7 in SURVEY.md
§2.1) is served from the Spark catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Explicit StructTypes for the driver test tables (TESTDATA.md).
# Declaring them (instead of relying on parquet footer inference) keeps
# readers schema-stable across scale factors and documents the model.
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = list(TABLE_SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries must also work on a caller-provided vanilla session
    (e.g. the grading driver builds its own): these are runtime SQL
    confs, so set them at load time rather than relying on
    session.get_spark having built the session.

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which the
      reader otherwise rejects outright;
    - ICU case mapping off: ICU's internal locks serialize executor
      threads (see session.py);
    - UTC: deterministic year()/month()/date_format vs the oracle.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.icu.caseMappings.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # locked static conf on some deployment: best effort


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """Load one table as a DataFrame (columnar parquet scan; Catalyst
    pushes filters/projections down — SURVEY.md §4 pushdown rows).

    ``rebalance=True`` redistributes row-group-starved inputs across
    the cluster before compute-heavy map work (regex scoring, hashing,
    shingling). The test files are single-row-group, so without this
    every scan is one task no matter how many cores exist. Guarded to
    only fire when input partitions < default parallelism — on a real
    multi-file 100 TB table (splits >> cores) it is a no-op, so the
    shuffle is never paid at scale.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Timestamp columns arrive in whichever physical shape the parquet
    # writer chose: TIMESTAMP(NANOS) reads as long (see session.py
    # nanosAsLong config), and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # reads as TIMESTAMP_NTZ. Normalize both to the declared
    # TimestampType — with the session timezone pinned to UTC the NTZ
    # cast is instant-preserving.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    declared = {f.name: f.dataType for f in TABLE_SCHEMAS[name].fields}
    for f in df.schema.fields:
        if not isinstance(declared.get(f.name), TimestampType):
            continue
        if isinstance(f.dataType, LongType):
            # Integer `div`, NOT `/`: ns-since-epoch (~1.7e18) exceeds
            # double's 53-bit mantissa, so floor(col / 1000) can land
            # 1µs off DuckDB's integer truncation for sub-second values.
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000")))
        elif isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(TimestampType()))
    if rebalance:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so the SQL surface
    (reference S9 raw-SQL passthrough) works over the same data."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession) -> list[str]:
    """S6 catalog introspection (reference ``Billion_Dollar/server.py:56-74``)."""
    return sorted(t.name for t in spark.catalog.listTables())


def describe_table(spark: SparkSession, sf_dir: str, name: str) -> str:
    """S7 schema introspection: render a schema string for prompts
    (replaces ``schema://main`` DDL resource, ``server.py:17-30``)."""
    return load_table(spark, sf_dir, name).schema.simpleString()
