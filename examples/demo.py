#!/usr/bin/env python
"""End-to-end demo: the reference's own demo questions (FIXTURES.md
§6) answered by the engine — one compiled DataFrame plan per
question, grounded template answers (pass an HTTP transport for real
LLM phrasing).

Run: python examples/demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optimized_climate_data_integration_with_real_time_llm_querying_spark.nl.pipeline import (
    ClimateEngine,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.session import (
    get_spark,
)

QUESTIONS = [
    "How many droughts occurred in 1980?",
    "What was the total disaster cost in 1983?",
    "Compare the flooding and tropical cyclone cost between 1980-1984",
    "What was the IHP total for Texas hurricanes in 2012?",
    "List tornado incidents in Florida from 2005 to 2010",
    "Skin temperature in Delhi in April 2022",
    "Compare precipitation in Dhaka and Colombo in 2020",
    "What were the CO2 emissions in Brazil in 2020?",
    "Methane emissions in Brazil from 2015 to 2020",
    "HFC emissions in India in 2019",
]


def main() -> None:
    spark = get_spark("ocdi-demo", cpus=8)
    engine = ClimateEngine(spark)
    for q in QUESTIONS:
        a = engine.ask(q)
        print(f"\n=== [{a.domain}] {q}")
        for line in a.text.splitlines()[:6]:
            print("   ", line)
        if a.dropped_fields:
            print("    (ignored unknown fields:", a.dropped_fields, ")")


if __name__ == "__main__":
    main()
