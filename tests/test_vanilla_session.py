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


def test_driver_window_rotation_invariants():
    """The window machinery in __spark_entry__.py must stay
    consistent as rounds rotate it: _PROMOTE is exactly the 50-slot
    driver window (the first 50 registry entries in insertion
    order), _PROMOTE + _DEMOTE partition the registry exactly (no
    dups, no strays, nothing unrotated), and the registry respects
    the 200-entry growth budget the cadence policy sets."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_mod", "/root/repo/__spark_entry__.py"
    )
    ep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ep)

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    qs = all_queries()
    P, D = ep._PROMOTE, ep._DEMOTE
    assert len(P) == 50
    assert len(P + D) == len(set(P + D)), "duplicate names in rotation lists"
    assert set(P + D) == set(qs), "rotation lists must partition the registry"
    assert len(qs) <= 200, "registry past the cadence policy's growth budget"
    ordered = list(ep._ordered_queries().keys())
    assert ordered[:50] == P
