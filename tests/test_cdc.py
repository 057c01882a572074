"""Content-defined chunking properties: exact reconstruction, and the
property CDC exists for — edit robustness (an insertion shifts only
its own chunk; later chunks stay bit-identical, unlike fixed-size
blocks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
    load_table,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.dedup import (
    cdc_chunks,
)


def _chunks_of(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {}
    for r in cdc_chunks(df).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    return {k: [c for _, c in sorted(v)] for k, v in out.items()}


def test_chunks_reconstruct_documents(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    ch = cdc_chunks(docs)
    rec = ch.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))).getField(
                "chunk"
            ),
            "",
        ).alias("rtx")
    )
    j = rec.join(docs.select("doc_id", F.trim("text").alias("tx")), "doc_id")
    assert j.filter(F.col("rtx") != F.col("tx")).count() == 0
    assert j.count() == docs.filter(F.length(F.trim("text")) > 0).count()


def test_edit_shifts_only_local_chunks(spark, sf_oracle):
    """Insert a marker early in a real document: the chunk multisets
    of original and edited doc must share every chunk after the
    edited region — CDC's defining robustness. A fixed-block scheme
    would shift everything. (The shared suffix is guaranteed once the
    rolling gate re-synchronizes, i.e. from the first boundary at or
    after the edit.)"""
    txt = (
        load_table(spark, sf_oracle, "documents")
        .filter(F.length("text") > 200)
        .select(F.trim("text").alias("t"))
        .first()["t"]
    )
    edited = txt[:10] + "XYZQ" + txt[10:]
    ch = _chunks_of(spark, [txt, edited])
    orig, ed = ch[0], ch[1]
    assert "".join(orig) == txt and "".join(ed) == edited
    # Compare chunk sequences from the tail: everything after the
    # re-sync point is identical.
    n_shared_tail = 0
    for a, b in zip(reversed(orig), reversed(ed)):
        if a != b:
            break
        n_shared_tail += 1
    assert n_shared_tail >= max(1, len(orig) - 3), (
        f"edit perturbed {len(orig) - n_shared_tail} of {len(orig)} chunks"
    )


def test_short_docs_single_chunk(spark):
    ch = _chunks_of(spark, ["tiny", "a b"])
    assert ch[0] == ["tiny"] and ch[1] == ["a b"]
