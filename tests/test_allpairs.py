"""Prefix-filtered exact all-pairs Jaccard (AllPairs/PPJoin family).

The registry entry `allpairs_jaccard_exact` is oracle-checked against
a brute-force DuckDB join in test_oracle_parity; these tests prove
the same no-false-negative theorem engine-side for the PRODUCTION
xxhash64 family, and pin the claims the operator's doc makes (no
stop-shingle df cap, exactness at threshold=1.0, edge shapes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


BOILER = "terms of service apply to all content on this site"


@pytest.fixture(scope="module")
def corpus(spark):
    # Near-dups, exact dups, boilerplate-heavy docs, a short doc, and
    # unrelated filler — every branch of the operator.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " + BOILER),
        (2, "the quick brown fox jumps over the lazy cat " + BOILER),
        (3, "completely unrelated text about spark shuffles and joins " + BOILER),
        (4, "completely unrelated text about spark shuffles and joins " + BOILER),
        (5, "tiny doc"),
        (6, "tiny doc"),
        (7, BOILER),
        (8, "numbers one two three four five six seven eight nine ten"),
        (9, "numbers one two three four five six seven eight nine ten eleven"),
        (10, "a b c d e f g h i j k l m n o p"),
    ]
    return _docs(spark, rows)


def _pairs(df):
    return {
        (r.id_a, r.id_b, r.jaccard)
        for r in df.select("id_a", "id_b", "jaccard").collect()
    }


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_equals_bruteforce_xxhash(spark, corpus, threshold):
    """Prefix filtering loses nothing: the filtered plan equals the
    full quadratic join (df cap disabled) at every threshold, with the
    production hash family."""
    fast = dedup.allpairs_jaccard_pairs(corpus, threshold=threshold)
    brute = dedup.ngram_jaccard_pairs(
        corpus, min_jaccard=0.0, max_shingle_df=None
    ).filter(
        F.col("n_common")
        / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double")
        >= F.lit(float(threshold))
    )
    assert _pairs(fast) == _pairs(brute)


def test_threshold_one_is_exact_dup(spark, corpus):
    got = _pairs(dedup.allpairs_jaccard_pairs(corpus, threshold=1.0))
    assert got == {(3, 4, 1.0), (5, 6, 1.0)}


def test_no_df_cap_keeps_boilerplate_overlap(spark, corpus):
    """The df-capped ngram path APPROXIMATES: a cap of 1 drops every
    shingle shared by 2+ docs, so high-overlap pairs vanish. The
    prefix-filtered path needs no cap and keeps them exactly."""
    capped = dedup.ngram_jaccard_pairs(corpus, min_jaccard=0.6, max_shingle_df=1)
    assert capped.count() == 0
    exact = dedup.allpairs_jaccard_pairs(corpus, threshold=0.6)
    assert (3, 4, 1.0) in _pairs(exact)


def test_short_and_empty_docs(spark):
    df = _docs(
        spark,
        [(1, "one two"), (2, "one two"), (3, ""), (4, "   "), (5, "solo words here")],
    )
    got = _pairs(dedup.allpairs_jaccard_pairs(df, threshold=0.5))
    assert got == {(1, 2, 1.0)}


def test_empty_frame(spark):
    df = _docs(spark, [(1, "x y z")]).filter(F.lit(False))
    assert dedup.allpairs_jaccard_pairs(df, threshold=0.5).count() == 0


def test_threshold_validation(spark, corpus):
    with pytest.raises(ValueError):
        dedup.allpairs_jaccard_pairs(corpus, threshold=0.0)
    with pytest.raises(ValueError):
        dedup.allpairs_jaccard_pairs(corpus, threshold=1.5)


def test_md5_family_matches_xxhash_results(spark, corpus):
    """Hash family changes join-key bytes, not semantics: pair sets
    and scores agree (64-bit vs 32-bit collision regimes are both
    negligible at test size)."""
    x = _pairs(dedup.allpairs_jaccard_pairs(corpus, threshold=0.6))
    m = _pairs(
        dedup.allpairs_jaccard_pairs(
            corpus, threshold=0.6, hash_family=dedup.md5_hash64
        )
    )
    assert x == m
