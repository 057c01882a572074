"""Property-based tests (hypothesis) for the driver-side compilers —
the reference has zero property tests (SURVEY.md §5); these cover the
input spaces its regexes were fragile in, plus sampling invariants.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from optimized_climate_data_integration_with_real_time_llm_querying_spark.nl.timeparse import (
    extract_time,
)

years = st.integers(min_value=1900, max_value=2099)


@given(y=years)
@settings(max_examples=50, deadline=None)
def test_single_year_always_extracted(y):
    t = extract_time(f"What happened in {y}?")
    assert t.year == y and t.year_range is None


@given(a=years, b=years)
@settings(max_examples=50, deadline=None)
def test_between_range_ordered(a, b):
    lo, hi = min(a, b), max(a, b)
    t = extract_time(f"compare costs between {lo} and {hi}")
    if lo == hi:
        # degenerate phrasing: falls back to single-year extraction
        assert t.year == lo or t.year_range == (lo, hi)
    else:
        assert t.year_range == (lo, hi)
        assert t.year is None


@given(y=st.integers(min_value=2200, max_value=9999))
@settings(max_examples=20, deadline=None)
def test_out_of_bounds_years_ignored(y):
    t = extract_time(f"data for {y}", bounds=(1900, 2100))
    assert t.year is None and t.year_range is None


@given(text=st.text(max_size=120))
@settings(max_examples=100, deadline=None, suppress_health_check=[HealthCheck.filter_too_much])
def test_timeparse_never_crashes(text):
    t = extract_time(text)
    if t.year is not None:
        assert 1900 <= t.year <= 2100
    if t.year_range is not None:
        assert t.year_range[0] <= t.year_range[1]


# ---------------------------------------------------------------- sampling

@pytest.fixture(scope="module")
def docs(spark, sf_small):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )

    return load_table(spark, sf_small, "documents").cache()


def test_stratified_sample_deterministic_and_bounded(docs):
    from pyspark.sql import functions as F

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
        stratified_sample,
    )

    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    s1 = stratified_sample(docs, "source", rates, key_col="doc_id", default_rate=0.2)
    s2 = stratified_sample(docs, "source", rates, key_col="doc_id", default_rate=0.2)
    a = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert a == b  # deterministic
    per = {
        r["source"]: r["n"]
        for r in s1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per.get("src0") == totals["src0"]  # rate 1.0 keeps all
    assert "src2" not in per  # rate 0.0 drops all
    # rate 0.5: binomial bound, generous at n=25
    assert 0.15 * totals["src1"] <= per.get("src1", 0) <= 0.85 * totals["src1"]
    # subset property: sampled ids are real ids from the right strata
    assert s1.join(docs, "doc_id", "left_anti").count() == 0


def test_sample_is_partitioning_invariant(docs):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
        stratified_sample,
    )

    rates = {"src3": 0.4}
    base = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "source", rates, key_col="doc_id")
        .select("doc_id")
        .collect()
    )
    shuffled = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), "source", rates, key_col="doc_id")
        .select("doc_id")
        .collect()
    )
    assert base == shuffled


# ---------------------------------------------------------------- chunk spans


def _expected_spans(n_tokens: int, chunk: int, overlap: int) -> list[tuple[int, int]]:
    """Pure-Python mirror of chunk_spans' arithmetic."""
    import math as m

    if n_tokens <= 0:
        return []
    stride = chunk - overlap
    n_chunks = 1 if n_tokens <= chunk else m.ceil((n_tokens - chunk) / stride) + 1
    return [(i * stride, min(i * stride + chunk, n_tokens)) for i in range(n_chunks)]


@given(
    n_tokens=st.integers(min_value=0, max_value=5000),
    chunk=st.integers(min_value=2, max_value=512),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_chunk_span_arithmetic_invariants(n_tokens, chunk, data):
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    spans = _expected_spans(n_tokens, chunk, overlap)
    if n_tokens == 0:
        assert spans == []
        return
    # Full coverage, in order, within bounds, budget respected.
    assert spans[0][0] == 0 and spans[-1][1] == n_tokens
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 == e0 - overlap  # exact stride (== e0 when overlap=0)
        assert s1 <= e0  # never a gap
    for s, e in spans:
        assert 0 < e - s <= chunk


# ---------------------------------------------------------------- corpus split


def test_split_corpus_partitions_and_proportions(spark, sf_small):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
        split_corpus,
    )

    d = load_table(spark, sf_small, "documents")
    n = d.count()
    out = split_corpus(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    # Weights sum to 1 -> a full partition: every doc in exactly one split.
    assert out.count() == n
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / n > 0.8  # 90% nominal, hash noise at n=500
    # Deterministic: a second evaluation assigns identically.
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in split_corpus(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()
    )
    assert a == b
    # Remainder is dropped when weights sum below 1.
    half = split_corpus(d, "doc_id", {"train": 0.5})
    assert 0 < half.count() < n


def test_split_bounds_inexact_weights_cover_every_bucket():
    """Three 1/3 weights don't multiply to an exact bucket count:
    truncation would end the last range at 999_999 and silently drop
    any doc hashing into the top bucket. The last split's upper bound
    is pinned to the denominator when weights sum to 1."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
        _DENOM,
        split_bounds,
    )

    for weights in (
        {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3},
        {"train": 0.9, "val": 0.05, "test": 0.05},
        {"x": 0.7, "y": 0.2, "z": 0.1},
    ):
        bounds = split_bounds(weights)
        # Contiguous from 0 and covering the full bucket space.
        assert bounds[0][1] == 0 and bounds[-1][2] == _DENOM
        for (_, _, hi_prev), (_, lo, _) in zip(bounds, bounds[1:]):
            assert hi_prev == lo
    # The registered 90/5/5 oracle hard-codes 900000/950000 boundaries;
    # keep the engine's arithmetic pinned to them.
    assert split_bounds({"train": 0.9, "val": 0.05, "test": 0.05}) == [
        ("train", 0, 900000),
        ("val", 900000, 950000),
        ("test", 950000, 1000000),
    ]
    # Sub-1 totals keep a genuine remainder gap.
    partial = split_bounds({"train": 0.5})
    assert partial == [("train", 0, 500000)]


def test_weighted_jaccard_equals_set_jaccard_without_repeats(spark):
    """On repeat-free documents the multiset Jaccard reduces to set
    Jaccard; with repeated shingles the two diverge and the weighted
    form sees the repetition."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.dedup import (
        ngram_jaccard_pairs,
        weighted_jaccard_pairs,
    )

    # Repeat-free: every 3-gram in each doc is unique.
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d e f x y"),
            (2, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    w = {
        (r.id_a, r.id_b): r.w_jaccard
        for r in weighted_jaccard_pairs(docs, max_shingle_df=None).collect()
    }
    s = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, max_shingle_df=None, min_jaccard=0.0).collect()
    }
    assert w and w == s

    # Repetition: doc 1 repeats doc 0's template 3x. Set Jaccard says
    # near-identical; weighted Jaccard sees the count mismatch.
    rep = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c d a b c d a b c d"),
        ],
        "doc_id long, text string",
    )
    wr = weighted_jaccard_pairs(rep, max_shingle_df=None).collect()[0].w_jaccard
    sr = (
        ngram_jaccard_pairs(rep, max_shingle_df=None, min_jaccard=0.0)
        .collect()[0]
        .jaccard
    )
    assert wr < sr, (wr, sr)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=0,
        max_size=14,
    ),
    threshold=st.sampled_from([0.4, 0.6, 0.8, 1.0]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_allpairs_prefix_filter_equals_bruteforce(spark, texts, threshold):
    """Prefix-filtering theorem, property form: on ADVERSARIAL tiny-
    vocabulary corpora (maximum shingle collision, the regime where a
    subtle ceil/epsilon bug would first lose a pair) the filtered
    plan equals the unfiltered quadratic join at every threshold."""
    from pyspark.sql import functions as F

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.dedup import (
        allpairs_jaccard_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in allpairs_jaccard_pairs(df, threshold=threshold).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, min_jaccard=0.0, max_shingle_df=None)
        .filter(
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double")
            >= F.lit(float(threshold))
        )
        .collect()
    }
    assert fast == brute


# ---------------------------------------------------------------- HDF5 heaps

_names = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=12,
    unique=True,
)


@given(
    names=_names,
    shape=st.sampled_from(["direct", "indirect", "nested"]),
    corder=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_dense_group_roundtrip_property(names, shape, corder, seed):
    """Every random set of links pushed through each fractal-heap
    shape (root direct / root indirect / nested indirect) and a
    random B-tree record permutation comes back exactly: creation
    order when tracked, name order otherwise — the heap-ID offset
    arithmetic and the doubling-table walk are exercised over
    arbitrary object sizes and placements."""
    import random

    from test_hdf5_min import H5Builder, dense_root_messages

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _F,
        _dense_group_children,
    )

    entries = [(nm, 1000 + i) for i, nm in enumerate(names)]
    order = list(range(len(entries)))
    random.Random(seed).shuffle(order)
    b = H5Builder()
    (li,) = dense_root_messages(
        b, entries, shape=shape, track_corder=corder, hash_order=order
    )
    kids = _dense_group_children(_F(bytes(b.buf)), li[4:])
    assert kids == (entries if corder else sorted(entries))


# -------------------------------------------------------- netCDF-4 writer

_nc_dims = st.lists(
    st.tuples(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda t: t[0],
)


@given(dims=_nc_dims, nc_type=st.sampled_from([1, 3, 4, 5, 6]), data=st.data())
@settings(max_examples=50, deadline=None)
def test_netcdf4_writer_reader_roundtrip_property(dims, nc_type, data):
    """Arbitrary dim sets and dtypes through the writer must come
    back EXACTLY through the spec-pinned reader: same dims (ordered
    by dimid), same values, same dimids — the writer is fuzzed
    against the format via the reader, not against itself."""
    import numpy as np

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        parse_netcdf4,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf4_writer import (
        _TYPES,
        write_netcdf4,
    )

    shape = tuple(ln for _, ln in dims)
    n = int(np.prod(shape))
    if nc_type in (1, 3, 4):
        info = np.iinfo(_TYPES[nc_type])
        vals = data.draw(
            st.lists(
                st.integers(min_value=int(info.min), max_value=int(info.max)),
                min_size=n,
                max_size=n,
            )
        )
    else:
        vals = data.draw(
            st.lists(
                st.floats(
                    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
                ),
                min_size=n,
                max_size=n,
            )
        )
    arr = np.asarray(vals, dtype=_TYPES[nc_type]).reshape(shape)
    blob = write_netcdf4(
        None,
        dims=list(dims),
        variables=[
            {
                "name": "zvar",
                "nc_type": nc_type,
                "dims": [d for d, _ in dims],
                "values": arr,
            }
        ],
    )
    got_dims, _, varlist = parse_netcdf4(blob)
    assert got_dims == [(d, ln) for d, ln in dims]
    by = {v.name: v for v in varlist}
    assert by["zvar"].dimids == list(range(len(dims)))
    np.testing.assert_array_equal(by["zvar"].data, arr)
