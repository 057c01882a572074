"""Sequence packing: budget respected, all docs packed, deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.packing import (
    pack_sequences,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.text import (
    token_count,
)

BUDGET = 256


def _packed(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return docs, pack_sequences(docs, budget=BUDGET, num_partitions=4)


def test_all_docs_packed_once(spark, sf_small):
    docs, packed = _packed(spark, sf_small)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_budget_respected(spark, sf_small):
    _, packed = _packed(spark, sf_small)
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.first("pack_total").alias("reported"))
        .filter((F.col("tot") > BUDGET) | (F.col("tot") != F.col("reported")))
    )
    # singleton packs may exceed the budget only if the doc itself does
    singleton_over = (
        packed.groupBy("pack_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tot"))
        .filter((F.col("tot") > BUDGET) & (F.col("n") > 1))
    )
    assert singleton_over.count() == 0
    assert over.filter(F.col("tot") != F.col("reported")).count() == 0


def test_packing_deterministic(spark, sf_small):
    _, p1 = _packed(spark, sf_small)
    _, p2 = _packed(spark, sf_small)
    a = sorted(map(tuple, p1.collect()))
    b = sorted(map(tuple, p2.collect()))
    assert a == b


def test_empty_partitions_survive(spark, sf_small):
    # 3 docs over 32 default partitions -> most partitions empty; the
    # mapInPandas packer must yield nothing for them, not crash on
    # pd.concat([]) (ADVICE r1 medium).
    docs = (
        load_table(spark, sf_small, "documents")
        .select("doc_id", token_count("text").alias("n_tokens"))
        .limit(3)
    )
    packed = pack_sequences(docs, budget=BUDGET)  # default num_partitions
    assert packed.count() == 3


def test_packs_are_reasonably_full(spark, sf_small):
    _, packed = _packed(spark, sf_small)
    fill = (
        packed.select("pack_id", "pack_total")
        .distinct()
        .agg(F.avg("pack_total"))
        .collect()[0][0]
    )
    # greedy first-fit should fill packs well past half the budget
    assert fill > BUDGET * 0.5


# ------------------------------------------------ canonical variant


def _canonical(spark, sf_small, df=None, **kw):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.packing import (
        pack_sequences_canonical,
    )

    docs = df
    if docs is None:
        docs = load_table(spark, sf_small, "documents").select(
            "doc_id", token_count("text").alias("n_tokens")
        )
    return docs, pack_sequences_canonical(docs, budget=BUDGET, n_buckets=8, **kw)


def test_canonical_all_docs_packed_budget_respected(spark, sf_small):
    docs, packed = _canonical(spark, sf_small)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    bad = (
        packed.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.count(F.lit(1)).alias("n_docs"),
            F.first("pack_total").alias("reported"),
        )
        .filter(
            (F.col("tot") != F.col("reported"))
            | ((F.col("tot") > BUDGET) & (F.col("n_docs") > 1))
        )
    )
    assert bad.count() == 0  # overflow only as oversized singletons


def test_canonical_is_partitioning_independent(spark, sf_small):
    """The whole point of the canonical variant: identical assignment
    regardless of how the input happens to be partitioned (the
    partition-local pack_sequences keys packs on spark_partition_id
    and cannot promise this)."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )

    def cells(df):
        return sorted(
            (r.pack_id, r.doc_id, r.n_tokens, r.pack_total) for r in df.collect()
        )

    _, one = _canonical(spark, sf_small, df=docs.repartition(1))
    _, many = _canonical(spark, sf_small, df=docs.repartition(13))
    assert cells(one) == cells(many)


def test_canonical_next_fit_recurrence(spark, sf_small):
    """Pack sequence numbers within a bucket follow the documented
    next-fit walk: replay the recurrence in Python from the sorted
    (n_tokens desc, doc_id) order and demand identical membership."""
    from collections import defaultdict

    docs, packed = _canonical(spark, sf_small)
    rows = packed.collect()
    by_bucket = defaultdict(list)
    for r in rows:
        b, seq = r.pack_id[1:].split("_")
        by_bucket[int(b)].append((r.n_tokens, r.doc_id, int(seq)))
    for b, items in by_bucket.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        seq, run = -1, None
        for n, _doc, got_seq in items:
            if run is None or run + n > BUDGET:
                seq, run = seq + 1, n
            else:
                run += n
            assert got_seq == seq, (b, _doc, got_seq, seq)


def test_canonical_custom_id_col(spark, sf_small):
    """id_col other than 'doc_id' must work (the bucket hash reads
    the post-rename column; round-9 review finding)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.packing import (
        pack_sequences_canonical,
    )

    docs = load_table(spark, sf_small, "documents").select(
        F.col("doc_id").alias("docid"), token_count("text").alias("ntok")
    )
    out = pack_sequences_canonical(
        docs, budget=BUDGET, n_buckets=8, id_col="docid", tokens_col="ntok"
    )
    assert out.count() == docs.count()
    assert out.columns == ["pack_id", "doc_id", "n_tokens", "pack_total"]
