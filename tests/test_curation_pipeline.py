"""End-to-end curation DAG: every stage's contract holds on the
final output, composed as one plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    dedup,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.composed import (
    curation_end_to_end,
)


def test_curation_end_to_end_contracts(spark, sf_small):
    # Direct call: the registry entry retired in round 17 (displacement
    # policy #5) but the DAG's contracts stay pinned here.
    out = curation_end_to_end(spark, sf_small)
    spans = out.collect()
    assert spans, "pipeline must produce training spans"
    surviving = {r["doc_id"] for r in spans}

    d = load_table(spark, sf_small, "documents")
    heldout = d.filter(F.col("doc_id") % 97 == 0)

    # 1. No held-out doc leaks into the training spans.
    held_ids = {r["doc_id"] for r in heldout.select("doc_id").collect()}
    assert not (surviving & held_ids)

    # 2. No two surviving docs share an exact fingerprint.
    surv_df = d.join(
        spark.createDataFrame([(i,) for i in surviving], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    fps = dedup.exact_duplicates(surv_df)
    assert fps.filter(F.col("n_copies") > 1).count() == 0

    # 3. No surviving doc shares a 5-gram with the held-out set
    #    (decontamination ran last, so this must hold exactly).
    _, contaminated = dedup.decontaminate(surv_df, heldout)
    assert contaminated.count() == 0

    # 4. Spans respect the chunk budget.
    assert all(0 < r["chunk_len"] <= 64 for r in spans)
