"""Streaming MinHash-index maintenance == batch index, and the
incremental dedup run against the STREAMED index == the batch run —
closing the loop between the streaming ingest path and cross-batch
curation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    dedup,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.streaming.index_maintenance import (
    run_index_maintenance_available_now,
)


def test_streamed_index_equals_batch_index(spark, sf_oracle, tmp_path):
    d = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text", "source"
    )
    # Split the old corpus into 3 "crawl drops" landing as files.
    drops = str(tmp_path / "drops")
    is_new = dedup.md5_hash64(F.lit("inc"), F.col("doc_id")) % 5 == 0
    old_docs = d.filter(~is_new)
    for i in range(3):
        old_docs.filter(F.col("doc_id") % 3 == i).write.mode(
            "append"
        ).parquet(drops)

    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(drops)
    )
    run_index_maintenance_available_now(stream, idx, ckpt)
    assert os.path.isdir(idx)

    streamed = spark.read.parquet(idx)
    batch = dedup.minhash_index(old_docs)
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and got

    # And the streamed index drives incremental dedup to the same
    # result as an index built in one batch.
    new_docs = d.filter(is_new)
    inc = dedup.incremental_minhash_near_duplicates(
        streamed, old_docs, new_docs, min_jaccard=0.5
    )
    from_stream = sorted((r.id_a, r.id_b, r.jaccard) for r in inc.collect())
    for h in inc.cache_handles:
        h.unpersist()
    inc2 = dedup.incremental_minhash_near_duplicates(
        batch, old_docs, new_docs, min_jaccard=0.5
    )
    from_batch = sorted((r.id_a, r.id_b, r.jaccard) for r in inc2.collect())
    for h in inc2.cache_handles:
        h.unpersist()
    assert from_stream == from_batch and from_stream
