"""Sequence packing: group documents into token-budgeted packs for
LLM training batches.

Greedy first-fit packing is inherently sequential, so it runs
per-partition (Arrow-batched mapInPandas): documents are first
hash-repartitioned, each partition packs its own documents into packs
of <= ``budget`` tokens, and pack ids are made globally unique by
prefixing the partition id. This trades global optimality for
embarrassing parallelism — the standard production choice, since
pack quality differences between partition-local and global packing
are marginal at corpus scale while global packing would serialize.

Determinism: partitioning is hash(doc_id) and each partition sorts by
doc_id before packing, so pack membership is stable across runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_total", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a pack with sum(n_tokens) <= budget.

    Documents longer than the budget get a singleton pack (the
    caller decides whether to chunk them upstream). Output has one
    row per document: (pack_id, doc_id, n_tokens, pack_total).
    """

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # An iterator is always truthy — materialize and check, else an
        # empty partition hits pd.concat([]) -> ValueError.
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        part = int(pdf["_part"].iloc[0])
        packs: list[list[int]] = []  # open pack indices into rows
        totals: list[int] = []
        assign: list[int] = []
        for _, row in pdf.iterrows():
            n = int(row["n_tokens"])
            placed = False
            # first-fit over open packs
            for i in range(len(totals)):
                if totals[i] + n <= budget:
                    totals[i] += n
                    assign.append(i)
                    placed = True
                    break
            if not placed:
                totals.append(n)
                assign.append(len(totals) - 1)
        yield pd.DataFrame(
            {
                "pack_id": [f"p{part}_{i}" for i in assign],
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "pack_total": [totals[i] for i in assign],
            }
        )

    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).cast("long").alias("n_tokens")
    )
    n_parts = num_partitions or prepared.sparkSession.sparkContext.defaultParallelism
    prepared = prepared.repartition(n_parts, "doc_id").withColumn(
        "_part", F.spark_partition_id()
    )
    return prepared.mapInPandas(pack_partition, PACK_SCHEMA)
