"""Small-file compaction: correctness (content-identical rewrite),
sizing (file count tracks target_bytes), and the sorted variant's
footer-pruning survival."""

from __future__ import annotations

import glob
import os

import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.ingest import (
    compact_small_files,
)

from conftest import SF_ORACLE


@pytest.fixture()
def fragmented_events(spark, tmp_path):
    """Write the events table as ~64 tiny files (the streaming-sink
    aftermath this operator exists to clean up)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )

    src = str(tmp_path / "fragmented")
    load_table(spark, SF_ORACLE, "events").repartition(64).write.parquet(src)
    return src


def _rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(tuple(r) for r in df.collect()), df.columns


def test_compaction_preserves_content_and_shrinks(spark, fragmented_events, tmp_path):
    out = str(tmp_path / "compacted")
    stats = compact_small_files(
        spark, fragmented_events, out, target_bytes=1 * 1024 * 1024
    )
    assert stats["files_before"] == 64
    assert stats["files_after"] < stats["files_before"]
    # sizing: ceil(bytes/target) files requested
    import math

    expected = max(1, math.ceil(stats["bytes_total"] / (1 * 1024 * 1024)))
    assert stats["files_after"] == expected
    before, cols_b = _rows(spark, fragmented_events)
    after, cols_a = _rows(spark, out)
    assert cols_b == cols_a
    assert before == after


def test_compaction_sorted_variant_keeps_pruning(spark, fragmented_events, tmp_path):
    out = str(tmp_path / "compacted_sorted")
    compact_small_files(
        spark,
        fragmented_events,
        out,
        target_bytes=256 * 1024,
        preserve_order_cols=["user_id"],
    )
    files = [
        f
        for f in glob.glob(os.path.join(out, "*.parquet"))
        if os.path.isfile(f)
    ]
    assert len(files) > 1, "need >1 file to demonstrate pruning"
    # each output file's user_id range must be disjoint from the rest
    # (that is what lets parquet footer min/max skip files)
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min, f"overlapping file ranges {ranges}"
    before, _ = _rows(spark, fragmented_events)
    after, _ = _rows(spark, out)
    assert before == after
