#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries.

Usage: python scripts/capture_plans.py SUFFIX name1 name2 ...
Writes plans/r17/<name>_<SUFFIX>.txt. SPARK_GRAFT_SF_DIR selects the
data directory (default sf0.1 — the bench scale, where TRAIN_CAP
stride engages, so the captured plan is the benched plan).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.session import (
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r17")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    qs = all_queries()
    spark = get_spark("plan-capture")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name].builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        # release any persisted handles the builder attached
        for h in getattr(df, "cache_handles", []):
            try:
                h.unpersist()
            except Exception:
                pass
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
