"""chunk_spans: span arithmetic, overlap coverage, edge docs."""

from __future__ import annotations

import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.text import (
    chunk_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_single_chunk(spark):
    out = chunk_spans(
        _df(spark, [(1, "a b c")]), chunk_tokens=64, overlap=16
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_idx"], r["start_tok"], r["end_tok"], r["chunk_len"]) == (0, 0, 3, 3)


def test_empty_doc_yields_no_chunks(spark):
    assert chunk_spans(_df(spark, [(1, "   ")]), 64, 16).count() == 0


def test_long_doc_spans_cover_with_overlap(spark):
    n = 150
    textval = " ".join(f"t{i}" for i in range(n))
    out = sorted(
        chunk_spans(_df(spark, [(1, textval)]), chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 48: ceil((150-64)/48)+1 = 3 chunks
    assert [r["start_tok"] for r in out] == [0, 48, 96]
    assert [r["end_tok"] for r in out] == [64, 112, 150]
    # Full coverage: consecutive chunks overlap by exactly `overlap`
    # except possibly the last, which still starts inside the previous.
    for a, b in zip(out, out[1:]):
        assert b["start_tok"] < a["end_tok"]
    assert out[-1]["end_tok"] == n
    assert all(r["chunk_len"] == r["end_tok"] - r["start_tok"] for r in out)


def test_exact_budget_boundary(spark):
    textval = " ".join(f"t{i}" for i in range(64))
    out = chunk_spans(_df(spark, [(1, textval)]), chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1 and out[0]["end_tok"] == 64


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_spans(_df(spark, [(1, "x")]), chunk_tokens=16, overlap=16)
