"""Streaming rollup == batch rollup on the same data."""

from __future__ import annotations

import shutil
import tempfile

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.rollup import (
    run_available_now,
)


def test_streaming_rollup_matches_batch(spark, sf_small):
    # Stage the events into a stream-source directory (file streams
    # watch directories; also normalizes the ns->us timestamp once).
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    try:
        load_table(spark, sf_small, "events").write.mode("overwrite").parquet(stream_dir)

        streamed = run_available_now(spark, stream_dir, query_name="t_rollup")
        batch = all_queries()["events_tumbling_daily"].builder(spark, sf_small)

        s = sorted(tuple(str(x) for x in r) for r in streamed.collect())
        b = sorted(tuple(str(x) for x in r) for r in batch.collect())
        assert streamed.columns == batch.columns
        assert len(s) > 0
        assert s == b
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
