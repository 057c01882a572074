"""Semantics of exact-substring span removal (Lee et al. rewrite):
length conservation, pass-through of untouched docs, and an
injected-duplicate end-to-end where a known shared span must vanish
from every carrier. Cross-engine equality is covered by the parity
suite; these prove the rewrite itself is the intended one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    dedup,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)


def test_span_removal_conservation_and_passthrough(spark, sf_small):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }
    out = {
        r.doc_id: r
        for r in all_queries()["duplicate_span_removal"]
        .builder(spark, sf_small)
        .collect()
    }
    assert set(out) == set(docs)
    for doc_id, r in out.items():
        # Removed + kept chars account for the whole document.
        assert r.clean_len + r.removed_chars == len(docs[doc_id])
        assert r.clean_len == len(r.clean_text)
        if r.n_spans == 0:
            assert r.clean_text == docs[doc_id]
        else:
            assert r.removed_chars >= 50 or len(docs[doc_id]) < 50


def test_span_removal_cuts_injected_duplicate(spark, tmp_path):
    shared = "x" * 30 + "THIS EXACT SPAN IS COPIED VERBATIM ACROSS DOCS" + "y" * 30
    assert len(shared) >= 50
    rows = [
        (1, "alpha one unique prefix " + "a" * 60 + shared + "b" * 60),
        (2, "beta two other opening words " + "c" * 60 + shared + "d" * 60),
        (3, "gamma totally unrelated text " + "e" * 120),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/docs.parquet"
    )
    df = spark.read.parquet(f"{tmp_path}/docs.parquet")
    out = {
        r.doc_id: r
        for r in dedup.remove_duplicate_spans(
            df, k=50, hash_family=dedup.md5_hash64
        ).collect()
    }
    # The shared sentence is gone from both carriers...
    assert "COPIED VERBATIM" not in out[1].clean_text
    assert "COPIED VERBATIM" not in out[2].clean_text
    assert out[1].n_spans >= 1 and out[2].n_spans >= 1
    # ...while unique openings survive and doc 3 is untouched.
    assert out[1].clean_text.startswith("alpha one unique prefix")
    assert out[2].clean_text.startswith("beta two other opening words")
    assert out[3].n_spans == 0 and out[3].clean_text == rows[2][1]
    # Run-of-'a' filler: doc1's a*60 block collides with nothing in
    # doc2 (different letters), so only the shared region (plus any
    # same-letter run overlap) is removed — doc-local length holds.
    for r in out.values():
        assert r.clean_len == len(r.clean_text)


def test_incremental_merge_equals_direct(spark, sf_small):
    # The oracle proves merge == DuckDB recompute; this proves
    # merge == SPARK recompute too (pure partial-aggregate algebra).
    merged = {
        (r.l_returnflag, r.l_linestatus): r
        for r in all_queries()["incremental_agg_merge"]
        .builder(spark, sf_small)
        .collect()
    }
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    direct = {
        (r.l_returnflag, r.l_linestatus): r
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.to_date("l_shipdate")).alias("first_ship"),
            F.max(F.to_date("l_shipdate")).alias("last_ship"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k, m in merged.items():
        d = direct[k]
        assert m.sum_qty == d.sum_qty and m.cnt == d.cnt
        assert m.first_ship == d.first_ship and m.last_ship == d.last_ship
    # The cutoff actually splits the data (both partial sides active).
    n_before = li.filter(F.to_date("l_shipdate") < F.lit("1997-01-01")).count()
    assert 0 < n_before < li.count()


def test_brand_catalog_order(spark, sf_small):
    parts = spark.read.parquet(f"{sf_small}/part.parquet").collect()
    by_brand = {}
    for p in parts:
        by_brand.setdefault(p.p_brand, []).append(p)
    out = {
        r.p_brand: r
        for r in all_queries()["brand_part_catalog"].builder(spark, sf_small).collect()
    }
    assert set(out) == set(by_brand)
    for brand, ps in by_brand.items():
        ps.sort(key=lambda p: (-p.p_retailprice, p.p_name))
        expected = ", ".join(p.p_name for p in ps[:5])
        assert out[brand].top_parts == expected
        assert out[brand].n_top == min(5, len(ps))
