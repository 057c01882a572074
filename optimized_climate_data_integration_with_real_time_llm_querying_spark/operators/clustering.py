"""Embedding clustering + semantic dedup (SemDeDup-style).

Two operators a pretraining-data pipeline runs over its embedding
table (the reference has no embedding operators at all — net-new
LLM-pipeline capability, same family as ``operators/similarity.py``):

- :func:`kmeans_assign` — distributed Lloyd's k-means, made fully
  DETERMINISTIC so it sits under the cross-engine DuckDB oracle:
  seeds are the k lowest-id vectors (no RNG), distances and centroids
  are rounded to a fixed grid each iteration, and argmin ties break
  on the lowest cluster id. The centroid set (k x dim doubles) lives
  on the driver between iterations — the same shape MLlib uses —
  while every per-vector computation is a distributed join+aggregate.
- :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): k-means first, then exact pairwise cosine ONLY
  within each cluster, dropping the higher id of any pair above the
  threshold. The clustering bounds the quadratic: k scales with
  corpus size to hold cluster size ~constant, so the pair stage costs
  O(n * cluster_size) instead of O(n^2).

Scale notes: the assignment join broadcasts k x dim centroid cells
and shuffles one (vec_id, cluster) scalar row per vector per cluster
after map-side partial aggregation; the exploded vector frame is
persisted once and reused by every iteration (released via the
``cache_handles`` contract). No HOF lambdas in the hot path — the
explode/join/groupBy shape is fully codegen'd (see
``similarity.exploded_pairwise_cosine`` for the measured 3-8x HOF
penalty this avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import exploded_pairwise_cosine


def _exploded(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, dim, val) long form; val accumulated in double."""
    return df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    ).select(F.col(id_col), "dim", F.col("val").cast("double").alias("val"))


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic k-means: returns (id, cluster, dist2) — the
    assignment of every vector to its nearest centroid after
    ``n_iter`` Lloyd iterations, with the squared L2 distance.

    Determinism contract (what makes the DuckDB oracle possible):
    seeds = the ``k`` lowest-id vectors, cluster ids 0..k-1 in id
    order; every centroid component and every distance is rounded to
    6 dp; nearest-centroid ties break on the lowest cluster id.
    Clusters that lose all members simply disappear (both engines
    drop them identically).

    The returned frame carries ``cache_handles`` (the persisted
    exploded-vector frame) for post-materialization release.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    e = _exploded(df, vec_col, id_col).persist()

    def assign(cent_rows: list[tuple[int, int, float]]) -> DataFrame:
        cent = spark.createDataFrame(
            cent_rows, "cluster int, dim int, cval double"
        )
        dist = (
            e.join(F.broadcast(cent), "dim")
            .groupBy(id_col, "cluster")
            .agg(
                F.round(
                    F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                    6,
                ).alias("dist2")
            )
        )
        # min(struct) = lexicographic (dist2, cluster): nearest
        # centroid, ties to the lowest cluster id — deterministic.
        return dist.groupBy(id_col).agg(
            F.min(F.struct("dist2", "cluster")).alias("m")
        ).select(id_col, F.col("m.cluster").alias("cluster"), F.col("m.dist2").alias("dist2"))

    # The per-iteration collect()s can fail mid-run (task loss, OOM);
    # release the persisted exploded frame on ANY exit that won't hand
    # it to the caller via cache_handles — mirroring the finally-based
    # hygiene in graph.connected_components.
    try:
        # Seed centroids = the k lowest-id vectors, rounded through
        # Spark's F.round (HALF_UP, matching DuckDB ROUND) — NOT
        # Python's round(), whose banker's rounding could diverge at
        # .5 ulp.
        seeded = (
            df.select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col)
            .limit(k)
            .withColumn(
                "cluster", (F.row_number().over(W.orderBy(id_col)) - 1).cast("int")
            )
        )
        centroids = [
            (int(r["cluster"]), int(r["dim"]), float(r["cval"]))
            for r in (
                seeded.select(
                    "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
                )
                .select(
                    "cluster",
                    "dim",
                    F.round(F.col("val").cast("double"), 6).alias("cval"),
                )
                .collect()
            )
        ]

        for _ in range(n_iter):
            a = assign(centroids)
            centroids = [
                (int(r["cluster"]), int(r["dim"]), float(r["cval"]))
                for r in (
                    a.join(e, id_col)
                    .groupBy("cluster", "dim")
                    .agg(F.round(F.avg("val"), 6).alias("cval"))
                    .collect()
                )
            ]

        out = assign(centroids)
    except BaseException:
        e.unpersist()
        raise
    out.cache_handles = [e]
    return out


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.92,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup: (id, cluster, is_kept) — k-means partition, then
    exact cosine pairs within each cluster only; any pair at or above
    ``threshold`` drops its higher id. The survivor set keeps one
    representative (the lowest id) per semantic-duplicate chain.

    The pair stage self-joins on the cluster key, so candidate volume
    is sum over clusters of size^2, not corpus^2 — the SemDeDup
    bargain. Cosines run through the codegen'd posexplode twin, and
    the drop set is tiny (broadcast anti-join shape).
    """
    assign = kmeans_assign(df, k, n_iter, vec_col, id_col)
    m = assign.select(id_col, "cluster").join(
        df.select(F.col(id_col), F.col(vec_col)), id_col
    )
    a = m.select(
        F.col("cluster"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = m.select(
        F.col("cluster"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    scored = exploded_pairwise_cosine(pairs)
    drops = (
        scored.filter(F.col("cosine_sim") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    out = (
        assign.select(id_col, "cluster")
        .join(F.broadcast(drops), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.col("is_dup").isNull().cast("int").alias("is_kept"),
        )
    )
    out.cache_handles = list(getattr(assign, "cache_handles", []))
    return out
