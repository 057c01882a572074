"""int8 embedding quantization: exact round-trip contract + bounded
cosine distortion vs the float originals."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    similarity,
)


def test_quantize_shapes_and_range(spark, sf_small):
    e = load_table(spark, sf_small, "embeddings")
    q = similarity.quantize_int8(e)
    rows = q.collect()
    assert len(rows) == e.count()
    for r in rows[:50]:
        assert len(r["q"]) == 64
        assert all(-127 <= v <= 127 for v in r["q"])
        assert r["scale"] >= 0


def test_cosine_distortion_bounded(spark, sf_small):
    # Dequantized vectors must preserve cosine geometry: per-component
    # error <= scale/2, so for 64-dim unit-ish vectors the cosine to
    # the original stays near 1. Measured mean distortion is ~1e-4;
    # 0.01 is far outside what a correct quantizer can produce.
    e = load_table(spark, sf_small, "embeddings")
    q = similarity.quantize_int8(e)
    joined = e.join(q, "vec_id").select(
        "vec_id",
        similarity.cosine(
            F.col("embedding"), similarity.dequantize(F.col("q"), F.col("scale"))
        ).alias("cos"),
    )
    stats = joined.agg(
        F.min("cos").alias("mn"), F.avg("cos").alias("avg")
    ).collect()[0]
    print(f"cosine(original, dequantized): min={stats['mn']:.6f} avg={stats['avg']:.6f}")
    assert stats["mn"] > 0.99
    assert stats["avg"] > 0.999


def test_int8_topk_recall_vs_float(spark, sf_small):
    # Cosine is scale-invariant, so ranking over quantized vectors
    # differs from the float ranking only by quantization error —
    # recall@10 must be near-perfect.
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    qs = all_queries()
    exact = {r["vec_id"] for r in qs["embedding_cosine_topk"].builder(spark, sf_small).collect()}
    quant = {r["vec_id"] for r in qs["embedding_cosine_topk_int8"].builder(spark, sf_small).collect()}
    recall = len(exact & quant) / len(exact)
    print(f"int8 topk recall@10: {recall:.3f}")
    assert recall >= 0.9


def test_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
    assert rows[1]["q"] == [0, 0, 0, 0] and rows[1]["scale"] == 0.0
    assert rows[2]["q"][1] == -127  # max-magnitude component pins to +/-127
    assert math.isclose(rows[2]["scale"], 2.0 / 127.0, rel_tol=1e-4)
