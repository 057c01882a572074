"""Winnowing fingerprint properties (Schleimer et al., SIGMOD 2003).

The theorem under test: with char k-grams and a w-wide window, any
shared substring of length >= t = k + w - 1 between two documents
guarantees at least one shared fingerprint, and the expected density
of selected grams is 2/(w+1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    winnow,
)

K, W = 8, 4
T = K + W - 1  # guarantee threshold: 11 chars


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_shared_substring_guarantees_shared_fingerprint(spark):
    # 40-char shared block (>= t) embedded in different contexts.
    shared = "the quick brown fox jumps over the lazy "
    df = _docs(
        spark,
        [
            "prefix one " + shared + " and a suffix here",
            "totally different lead-in " + shared + " trailing words",
            "no overlap with anything else at all in this one",
        ],
    )
    pairs = winnow.winnow_match_pairs(
        df, k=K, window=W, min_shared=1, max_fp_df=None
    ).collect()
    matched = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in matched
    assert all(p == (0, 1) for p in matched)


def test_density_near_two_over_w_plus_one(spark):
    import random

    rng = random.Random(11)
    words = ["alpha", "bravo", "carol", "delta", "echos", "fox", "golf", "hotel"]
    texts = [" ".join(rng.choice(words) for _ in range(120)) for _ in range(20)]
    df = _docs(spark, texts)
    n_grams = df.select(
        F.sum(F.length("text") - (K - 1)).alias("n")
    ).collect()[0].n
    n_fp = winnow.winnow_fingerprints(df, k=K, window=W).count()
    density = n_fp / n_grams
    # Expected 2/(w+1) = 0.4 before the DISTINCT dedup of repeated
    # (pos, hash) selections; allow a generous band.
    assert 0.15 < density < 0.7, density


def test_degenerate_docs_yield_single_fingerprint(spark):
    df = _docs(spark, ["tiny", "exactly8", "nine char", ""])
    fps = winnow.winnow_fingerprints(df, k=K, window=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r)
    # "tiny" (<k chars): whole text is one gram, fingerprint at pos 1.
    assert len(by_doc[0]) == 1 and by_doc[0][0].fp_pos == 1
    # "exactly8" (1 gram) and "nine char" (2 grams): < w grams each.
    assert len(by_doc[1]) == 1
    assert len(by_doc[2]) == 1 and by_doc[2][0].fp_pos in (1, 2)
    # Empty doc contributes nothing.
    assert 3 not in by_doc


def test_fingerprints_are_subset_of_gram_hashes(spark):
    df = _docs(spark, ["some reasonably long text for winnowing checks"])
    grams = (
        df.select(
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (K - 1))
            ).alias("p"),
            "text",
        )
        .select(F.xxhash64(F.expr(f"substring(text, p, {K})")).alias("gh"))
        .collect()
    )
    gram_hashes = {r.gh for r in grams}
    fps = winnow.winnow_fingerprints(df, k=K, window=W).collect()
    assert fps and all(r.fp in gram_hashes for r in fps)
