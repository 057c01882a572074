"""Streaming maintenance of the MinHash LSH index.

The batch side of incremental curation
(``operators.dedup.incremental_minhash_near_duplicates``) consumes a
persisted (id, band, bucket) index; this module keeps that index
CURRENT as new documents stream in. Each micro-batch computes the
signatures/buckets of ONLY its own documents (signatures are
per-document, so a batch never needs the rest of the corpus) and
appends them to the index directory — the foreachBatch pattern for
maintaining derived artifacts a plain streaming sink can't express.

Exactly-once note: foreachBatch is at-least-once under retries; the
append is idempotent at the reader because the incremental dedup path
dedups candidate PAIRS (a re-appended (id, band, bucket) row creates
no new pair ids). For byte-level idempotence, production would write
per-batch subdirectories keyed by batch_id and clean on replay — the
same recipe as the checkpoint-restart test in
tests/test_streaming_restart.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import dedup


def index_update_writer(
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    hash_family=None,
):
    """A foreachBatch function appending each micro-batch's
    (id, band, bucket) rows to the Parquet index at ``index_path``.
    Pass to ``writeStream.foreachBatch``. ``hash_family=None`` uses
    the production xxhash64 family."""
    from pyspark.sql import functions as F

    fam = hash_family if hash_family is not None else F.xxhash64

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = dedup.minhash_index(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            k=k,
            hash_family=fam,
        )
        rows.write.mode("append").parquet(index_path)

    return write_batch


def ivf_index_update_writer(
    index_path: str,
    coarse_index: list[tuple[int, int, float]],
    pq_index: list[tuple[int, int, int, float]],
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim_perm: list[int] | None = None,
):
    """The ANN twin of :func:`index_update_writer`: a foreachBatch
    function appending each micro-batch's vectors to a stored
    inverted-list index (``operators.ivf_index``) — FAISS
    ``add()`` as a STREAM. Coding is frozen against the codebooks
    the index was bootstrapped with
    (:func:`~..operators.ivf_index.bootstrap_ivf_index` runs first,
    by the scheduled build job; every append validates against the
    stored sidecars and refuses foreign codebooks), so a batch never
    needs the rest of the corpus and the searchable index is current
    the moment the micro-batch commits. Retraining is NOT a streaming
    operation: it is the scheduled rebuild the churn audit prices
    (BASELINE.md round-17 maintenance section).

    Same at-least-once caveat as the MinHash writer above: a
    re-appended (id, sub, code) row is harmless to search results
    only if the reader dedups; for byte-level idempotence write
    per-batch subdirectories keyed by batch_id."""
    from ..operators.ivf_index import write_ivf_index

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_ivf_index(
            batch_df,
            index_path,
            coarse_index,
            pq_index,
            m=m,
            vec_col=vec_col,
            id_col=id_col,
            mode="append",
            dim_perm=dim_perm,
        )

    return write_batch


def run_ivf_maintenance_available_now(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    coarse_index: list[tuple[int, int, float]],
    pq_index: list[tuple[int, int, int, float]],
    **index_kwargs,
) -> None:
    """Drain an availableNow vector stream through the IVF index
    writer. ``vec_stream`` is a streaming DataFrame of (id, vector)
    rows; the index at ``index_path`` must be bootstrapped (or
    already built) with these codebooks."""
    q = (
        vec_stream.writeStream.foreachBatch(
            ivf_index_update_writer(
                index_path, coarse_index, pq_index, **index_kwargs
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_index_maintenance_available_now(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    **index_kwargs,
) -> None:
    """Drain an availableNow document stream through the index
    writer. ``docs_stream`` is a streaming DataFrame of documents
    (e.g. ``spark.readStream.schema(...).parquet(dir)``)."""
    q = (
        docs_stream.writeStream.foreachBatch(
            index_update_writer(index_path, **index_kwargs)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
