"""The grading driver builds its OWN SparkSession — the contract must
work without session.get_spark's configs. Regression for the
TIMESTAMP(NANOS) crash: runs entry() + an events-based query in a
subprocess with a vanilla session."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
import __spark_entry__ as ep
assert len(ep.entry(spark).collect()) > 0
qs = ep.queries()
assert len(qs["events_tumbling_daily"](spark, "/root/testdata/sf0.001").collect()) > 0
# r10: the maintenance gate writes+compacts+reads parquet — prove the
# whole write path also works on a vanilla session.
assert len(qs["compaction_roundtrip"](spark, "/root/testdata/sf0.001").collect()) > 0
print("VANILLA_OK")
"""


def test_contract_works_on_vanilla_session():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert "VANILLA_OK" in r.stdout, r.stderr[-2000:]
