"""SparkSession factory tuned for this engine.

Local mode is one JVM with N threads; on a real cluster the same
configs hold (AQE handles post-shuffle coalescing and skew joins, so
``spark.sql.shuffle.partitions`` is a ceiling, not a fixed cost).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ocdi-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Settings chosen for 100 TB-scale habits that also behave on
    local[32]:

    - AQE on: runtime coalescing of small post-shuffle partitions,
      skew-join splitting, and dynamic join-strategy switching.
    - shuffle.partitions ~= cores locally; AQE coalesces down, and on
      a big cluster this would be raised (or left to AQE advisory
      sizes).
    - Arrow on: every Pandas UDF / toPandas crosses the JVM<->Python
      boundary in columnar batches.
    - UTC session timezone: deterministic timestamp semantics and
      parity with DuckDB oracle comparisons.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in catalog.load_table
        # (micro-truncation matches DuckDB's ns->us behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4 routes lower()/upper() under UTF8_BINARY through ICU
        # case mapping; ICU's internal locks serialize all executor
        # threads (observed: 32 tasks blocked ~90s in
        # CollationSupport$Lower.execBinaryICU). JVM case mapping is
        # lock-free and identical for the data handled here.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
