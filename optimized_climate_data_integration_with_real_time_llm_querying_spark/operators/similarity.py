"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via zip_with + aggregate (JVM-side, no Python); the
  query vector rides along as a broadcast single-row join, and the
  top-k is ORDER BY + LIMIT (TakeOrderedAndProject — per-partition
  heaps, no global sort, so this scans 100 TB without shuffling it).
- ``hyperplane_lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH as
  the scale path — sign-pattern buckets shrink the candidate set from
  N to a bucket; deterministic planes from a fixed seed.
- ``label_centroids``: per-cluster mean vectors (the IVF coarse
  quantizer building block).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame.

    ``query_df`` must have columns (q_id, q_vec). Cross-join is a
    broadcast of one row; ORDER BY+LIMIT keeps it a streaming top-k.
    """
    joined = df.crossJoin(F.broadcast(query_df))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cosine_sim"),
    ).filter(F.col(id_col) != F.col("q_id") if "q_id" in query_df.columns else F.lit(True))
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def cosine_topk_batch(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact per-query top-k by cosine against a MULTI-row query
    frame (q_id, q_vec) — the batched brute-force ANN baseline, the
    exact twin of :func:`operators.clustering.ivf_pq_batch_topk`'s
    approximate search (and the exact side a batched recall eval
    joins against). Returns (q_id, vec_id, cosine_sim) ordered by
    (q_id, cosine_sim desc, vec_id); per-query rows are EXACTLY
    :func:`cosine_topk` with that query (pinned in
    tests/test_clustering_retrieval.py).

    Scale shape: the query frame broadcasts (Q rows), so the corpus
    scans ONCE with fan-out Q; the per-query top-k is the same
    TWO-PHASE rank as the batch search (partition-local prune over
    (q_id, spark_partition_id()) — a superset containing the true
    top-k under ANY partitioning — then the final rank over
    <= Q x partitions x k survivors), so no task ever sorts a whole
    query's score column. 6-dp rounding + vec_id tie-break keep it
    deterministic and SQL-replayable.
    """
    from pyspark.sql import Window as W

    scored = (
        df.crossJoin(F.broadcast(query_df))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    part = scored.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("q_id", F.spark_partition_id()).orderBy(
                F.col("cosine_sim").desc(), F.col(id_col)
            )
        ),
    ).filter(F.col("rk") <= k)
    return (
        part.withColumn(
            "rk2",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(
                    F.col("cosine_sim").desc(), F.col(id_col)
                )
            ),
        )
        .filter(F.col("rk2") <= k)
        .select("q_id", F.col(id_col), "cosine_sim")
        .orderBy("q_id", F.col("cosine_sim").desc(), F.col(id_col))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side tiny,
    shipped as literals into the plan)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for ONE hash table: bit i = sign of
    <v, plane_i>. HOF-dot based — fine for a single table's worth of
    planes; the multi-table path uses the relational
    :func:`hyperplane_lsh_multi` shape instead (32 HOF dots per row
    measured as the hottest part of embedding_lsh_topk, and the
    explicit getItem-chain alternative blows Janino's 64 KB method
    limit at 2048 terms, falling back to interpreted anyway)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(
            dot(F.col(vec_col), plane_col) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach an LSH bucket id: bit i = sign of <v, plane_i>.

    2^n_planes buckets; cosine-similar vectors collide with high
    probability. Bucket id is a plain int column, so downstream
    candidate generation is an equi-join/groupBy on it (hash shuffle on
    a 4-byte key — the 100 TB-friendly shape).
    """
    return df.withColumn(
        "lsh_bucket", _bucket_expr(vec_col, _hyperplanes(dim, n_planes, seed))
    )


def hyperplane_lsh_multi(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-table LSH: one row per (input row, table) with
    (lsh_table, lsh_bucket). A single sign-pattern table misses any
    pair straddling one of its hyperplanes (per-pair hit probability
    p^n_planes, p = 1 - theta/pi); unioning candidates across
    ``n_tables`` independent tables lifts recall to
    1 - (1 - p^n_planes)^n_tables — the standard LSH recall knob.

    Computed RELATIONALLY (the JL-projection shape): posexplode the
    vectors once, join the broadcast (table, plane, dim, weight)
    frame, partial-aggregate the n_tables x n_planes dots, fold sign
    bits into bucket ids, and join back on ``id_col``. All codegen'd
    — the HOF-dot form ran 32 interpreted lambdas per row (measured
    5.9 s for embedding_lsh_topk at sf0.1 vs ~1 s relational), and
    the inline getItem-chain alternative exceeds Janino's 64 KB
    method limit and silently de-optimizes. The shuffle carries (id,
    table, plane, scalar) rows, never vectors.
    """
    spark = df.sparkSession
    planes = spark.createDataFrame(
        hyperplane_rows(dim, n_planes, n_tables, seed),
        "lsh_table int, p int, dim int, w double",
    )
    e = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    ).select(F.col(id_col), "dim", F.col("val").cast("double").alias("val"))
    dots = (
        e.join(F.broadcast(planes), "dim")
        .groupBy(id_col, "lsh_table", "p")
        .agg(F.sum(F.col("val") * F.col("w")).alias("d"))
    )
    buckets = dots.groupBy(id_col, "lsh_table").agg(
        F.sum(
            F.when(
                F.col("d") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("lsh_bucket")
    )
    return df.join(buckets, id_col)


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket
    with the query in at least one of ``n_tables`` hash tables
    (candidate union via distinct ids), then exact-rank the
    candidates. Recall grows as 1-(1-p^n_planes)^n_tables; measured
    floors live in tests/test_lsh_recall.py."""
    bucketed = hyperplane_lsh_multi(
        df, dim, n_planes, n_tables, seed, vec_col, id_col
    )
    q_bucketed = hyperplane_lsh_multi(
        query_df.withColumnRenamed("q_vec", vec_col),
        dim, n_planes, n_tables, seed, vec_col, id_col="q_id",
    ).select("lsh_table", "lsh_bucket")
    cand_ids = (
        bucketed.join(F.broadcast(q_bucketed), ["lsh_table", "lsh_bucket"])
        .select(id_col)
        .distinct()
    )
    cands = df.join(cand_ids, id_col, "left_semi").crossJoin(F.broadcast(query_df))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cosine_sim"),
    ).filter(F.col(id_col) != F.col("q_id"))
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def exploded_pairwise_cosine(
    pairs: DataFrame,
    vec_a: str = "vec_a",
    vec_b: str = "vec_b",
    key_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Codegen'd cosine for (id_a, id_b, vec_a, vec_b) pair rows:
    posexplode(arrays_zip(a, b)) -> elementwise products -> partial+
    final sum per pair. No higher-order-function lambdas anywhere —
    HOFs (aggregate/zip_with/transform) evaluate INTERPRETED in Spark,
    measured 3-8x slower than codegen in this environment (the same
    reason dedup.shingles left HOFs, dedup.py:74-77). The explode
    multiplies rows by dim, but map-side partial aggregation collapses
    each pair back to one row before the (id_a, id_b) shuffle, so at
    high candidate volumes (the LSH verify stage at 100 TB) the
    shuffle still carries one scalar row per pair.

    Returns (*key_cols, cosine_sim) rounded to 6 dp — identical to
    ``round(cosine(a, b), 6)``; equality of the two paths is asserted
    in tests/test_lsh_recall.py.
    """
    z = pairs.select(
        *key_cols,
        F.posexplode(F.arrays_zip(F.col(vec_a).alias("a"), F.col(vec_b).alias("b"))).alias(
            "i", "z"
        ),
    ).select(
        *key_cols,
        (F.col("z.a").cast("double") * F.col("z.b").cast("double")).alias("ab"),
        (F.col("z.a").cast("double") * F.col("z.a").cast("double")).alias("aa"),
        (F.col("z.b").cast("double") * F.col("z.b").cast("double")).alias("bb"),
    )
    return z.groupBy(*key_cols).agg(
        F.round(
            F.sum("ab") / F.sqrt(F.sum("aa") * F.sum("bb")), 6
        ).alias("cosine_sim")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 8,
    verify: str = "hof",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >=
    threshold).

    ``use_lsh=False``: exact all-pairs — the correctness baseline,
    O(n^2) dot products, fine for verification scale.
    ``use_lsh=True``: multi-table hyperplane-LSH first — pairs are
    generated only within a (table, bucket) cell, deduped on the id
    pair across tables, then verified exactly. Sub-quadratic; recall
    1-(1-p^n_planes)^n_tables, measured in tests/test_lsh_recall.py.

    ``verify``: how the exact cosine on candidate pairs is computed.
    'hof' (default) keeps the map-side aggregate/zip_with lambda form
    — zero shuffle, fine at moderate candidate volumes; 'exploded'
    switches to :func:`exploded_pairwise_cosine` (posexplode +
    partial/final agg, fully codegen'd, one tiny extra shuffle) — the
    escape hatch when HOF interpretation shows up in a profile at
    high verify volumes. Both produce identical values (asserted in
    tests/test_lsh_recall.py).
    """
    if verify not in ("hof", "exploded"):
        raise ValueError(f"unknown verify mode {verify!r}")
    if use_lsh:
        if dim is None:
            raise ValueError("use_lsh=True requires dim")
        b = hyperplane_lsh_multi(
            df, dim, n_planes, n_tables, vec_col=vec_col, id_col=id_col
        )
        a = b.select(F.col(id_col).alias("id_a"), "lsh_table", "lsh_bucket")
        c = b.select(F.col(id_col).alias("id_b"), "lsh_table", "lsh_bucket")
        cand = (
            a.join(c, ["lsh_table", "lsh_bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
        vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
        pairs = cand.join(va, "id_a").join(vb, "id_b")
    else:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
        c = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
        pairs = a.crossJoin(c).filter(F.col("id_a") < F.col("id_b"))
    if verify == "exploded":
        scored = exploded_pairwise_cosine(pairs)
    else:
        scored = pairs.withColumn(
            "cosine_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
        )
    return scored.filter(F.col("cosine_sim") >= threshold).select(
        "id_a", "id_b", "cosine_sim"
    )


def decontaminate_by_embedding(
    corpus: DataFrame,
    heldout: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Semantic decontamination: drop corpus rows whose embedding is
    cosine-similar (>= threshold) to ANY held-out/eval embedding — the
    embedding-space twin of n-gram :func:`~..operators.dedup
    .decontaminate` (catches paraphrased eval leakage that exact
    shingle overlap misses). Returns (clean, contaminated_ids).

    ``use_lsh=False``: the eval set is broadcast (eval sets are small
    by construction — thousands of rows against a 100 TB corpus), so
    scoring is map-side over the corpus scan and only contaminated
    ids shuffle. ``use_lsh=True``: both sides bucket via multi-table
    hyperplane LSH and only same-bucket pairs are scored — the path
    when the held-out side is itself large.
    """
    h = heldout.select(
        F.col(id_col).alias("h_id"), F.col(vec_col).alias("h_vec")
    )
    if use_lsh:
        if dim is None:
            raise ValueError("use_lsh=True requires dim")
        cb = hyperplane_lsh_multi(
            corpus, dim, n_planes, n_tables, vec_col=vec_col, id_col=id_col
        ).select(F.col(id_col), F.col(vec_col), "lsh_table", "lsh_bucket")
        hb = hyperplane_lsh_multi(
            h.withColumnRenamed("h_vec", vec_col),
            dim, n_planes, n_tables, vec_col=vec_col, id_col="h_id",
        ).select(F.col(vec_col).alias("h_vec"), "lsh_table", "lsh_bucket")
        pairs = cb.join(hb, ["lsh_table", "lsh_bucket"])
    else:
        pairs = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(h))
    contaminated = (
        pairs.withColumn(
            "cosine_sim", F.round(cosine(F.col(vec_col), F.col("h_vec")), 6)
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select(id_col)
        .distinct()
    )
    clean = corpus.join(contaminated, id_col, "left_anti")
    return clean, contaminated


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = round(x_i/scale). Cuts vector storage/shuffle bytes 4x (the
    way billion-vector corpora actually ship embeddings); cosine error
    after dequantization (q_i*scale) is bounded by the quantization
    step — measured in tests/test_quantization.py. Pure array
    expressions (transform/aggregate), no UDFs, oracle-checkable.

    Returns (id, q: array<tinyint>, scale: double); all-zero vectors
    get scale=0 and an all-zero q.
    """
    c = F.col(vec_col)
    maxabs = F.aggregate(
        c,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = maxabs / F.lit(127.0)
    q = F.transform(
        c,
        lambda x: F.when(maxabs == 0, F.lit(0))
        .otherwise(F.round(x.cast("double") * 127.0 / maxabs))
        .cast("tinyint"),
    ).alias("q")
    return df.select(F.col(id_col), q, F.round(scale, 6).alias("scale"))


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """array<tinyint> + scale -> array<double> (q_i * scale)."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col)


def label_centroids(df: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Mean vector per label via posexplode + groupBy(label, dim) —
    relational (oracle-checkable), and the shuffle carries scalars,
    not vectors. Returns long form (label, dim, centroid)."""
    exploded = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim0", "component")
    )
    return (
        exploded.groupBy(label_col, (F.col("dim0") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("component").cast("double")), 6).alias("centroid"))
    )


def hyperplane_rows(
    dim: int, n_planes: int, n_tables: int, seed: int = 7
) -> list[tuple[int, int, int, float]]:
    """The multi-table LSH hyperplane family as (table, plane, dim,
    weight) rows — the EXACT floats :func:`hyperplane_lsh_multi` ships
    into the plan (``repr`` round-trips doubles bit-for-bit), so a
    DuckDB oracle can inline them as a VALUES table and recompute the
    sign-pattern buckets. Per-table seeds follow the same
    ``seed + 7919 * t`` schedule as the Spark side."""
    return [
        (t, p, d, w)
        for t in range(n_tables)
        for p, plane in enumerate(_hyperplanes(dim, n_planes, seed + 7919 * t))
        for d, w in enumerate(plane)
    ]


def random_projection_planes(
    in_dim: int, out_dim: int, seed: int = 11
) -> list[tuple[int, int, float]]:
    """Deterministic Johnson-Lindenstrauss projection matrix as
    (out_dim, in_dim, weight) rows: random unit rows (seeded, no RNG
    at query time) scaled by sqrt(in_dim/out_dim) so the projection
    preserves squared norms in expectation. Tiny (out_dim x in_dim),
    shipped as a broadcast table into the plan AND as literals into
    the DuckDB oracle — the same floats on both sides."""
    scale = math.sqrt(in_dim / out_dim)
    return [
        (j, i, w * scale)
        for j, plane in enumerate(_hyperplanes(in_dim, out_dim, seed))
        for i, w in enumerate(plane)
    ]


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """JL dimensionality reduction to long form (id, out_dim, value):
    the dimension-side twin of int8 quantization (quantize = fewer
    bits per component, project = fewer components) — together the
    standard recipe for shipping billion-vector corpora into ANN.

    Relational shape: posexplode the vectors once, broadcast-join the
    (out_dim, in_dim, weight) matrix on the input dimension, and
    partial+final-sum per (id, out_dim) — fully codegen'd, and the
    shuffle carries one scalar row per output component, never the
    vectors. Distance-preservation is probabilistic (JL): measured
    bounds in tests/test_clustering_retrieval.py.
    """
    spark = df.sparkSession
    planes = spark.createDataFrame(
        random_projection_planes(in_dim, out_dim, seed),
        "out_dim int, dim int, w double",
    )
    e = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    ).select(F.col(id_col), "dim", F.col("val").cast("double").alias("val"))
    return (
        e.join(F.broadcast(planes), "dim")
        .groupBy(id_col, "out_dim")
        .agg(F.round(F.sum(F.col("val") * F.col("w")), 6).alias("value"))
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    upper_only: bool = True,
) -> DataFrame:
    """Population covariance matrix of the embedding distribution as
    long-form (dim_i, dim_j, cov) — the X^T X building block of PCA /
    whitening / Mahalanobis outlier scoring over a vector corpus.

    Plan shape (the scale-correct one for d x d Gram matrices): each
    partition reduces its rows to ONE d x d partial outer-product
    block inside Arrow-batched ``mapInPandas`` — the shuffle then
    carries d^2 scalars PER PARTITION, independent of row count (the
    treeAggregate shape MLlib's RowMatrix uses), instead of the
    d^2-per-VECTOR blow-up a relational explode+self-join would
    shuffle.

    Determinism: every per-element product x_i*x_j (and every raw
    value, for the means) is quantized to the 1e-12 grid with
    floor(p*1e12 + 0.5) BEFORE summation, and the partials are
    summed as int64 — integer addition is associative, so S_ij and
    T_i are EXACTLY the same numbers regardless of partition count,
    Arrow batch boundaries, or accumulation order (a plain double
    sum of partition partials can flip a 6-dp-rounded cell sitting
    on a 0.5e-6 boundary between runs — the exact-integer consumers
    downstream, covariance_power_iteration, would then diverge).
    cov_ij = round((S/1e12)/n - (T_i/1e12/n)*(T_j/1e12/n), 6); both
    engines evaluate the identical expression tree over identical
    integers, so the result is bit-stable cross-engine. Grid bounds
    (two distinct ones): PER-PARTITION, the int64 numpy accumulator
    holds ~10^6 unit-scale rows (1e12 * 1e6 = 1e18 < 9.2e18) — size
    partitions below that, or drop the grid a decade per 10x beyond.
    CROSS-PARTITION, the partials are summed as decimal(38,0), the
    same promotion DuckDB makes (SUM(BIGINT) -> HUGEINT), so the
    global sum is exact to ~10^38 and the two engines keep agreeing
    at corpus sizes where a plain long sum would hit Spark's ANSI
    overflow (~9.2e6 unit-scale rows total) while DuckDB silently
    kept going.

    ``upper_only`` keeps dim_i <= dim_j (the matrix is symmetric).
    """
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    def partials(batches):
        import numpy as np
        import pandas as pd

        # Sub-chunk so the b x d x d outer-product tensor stays small
        # (256 * 64 * 64 * 8B = 8 MiB) while the quantize-then-sum
        # stays exact per element.
        chunk = 256
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["v"].tolist(), dtype=np.float64)
            for s0 in range(0, len(m), chunk):
                mm = m[s0 : s0 + chunk]
                outer = np.einsum("bi,bj->bij", mm, mm)
                grid = np.floor(outer * 1e12 + 0.5).astype(np.int64)
                block = grid.sum(axis=0)
                acc = block if acc is None else acc + block
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"dim_i": ii.ravel(), "dim_j": jj.ravel(), "s": acc.ravel()}
            )

    vecs = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    sij = (
        vecs.mapInPandas(partials, "dim_i int, dim_j int, s long")
        .groupBy("dim_i", "dim_j")
        # decimal(38,0) mirrors DuckDB's SUM(BIGINT)->HUGEINT: exact
        # to ~1e38 instead of ANSI-overflowing past 9.2e18.
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
    )
    e = df.select(F.posexplode(F.col(vec_col)).alias("dim", "val")).select(
        "dim", F.col("val").cast("double").alias("val")
    )
    stats = e.groupBy("dim").agg(
        F.sum(
            F.floor(F.col("val") * 1e12 + F.lit(0.5))
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("t"),
        F.count(F.lit(1)).alias("n"),
    )
    out = (
        sij.join(
            F.broadcast(
                stats.select(
                    F.col("dim").alias("dim_i"),
                    F.col("t").alias("t_i"),
                    F.col("n").alias("n"),
                )
            ),
            "dim_i",
        )
        .join(
            F.broadcast(
                stats.select(F.col("dim").alias("dim_j"), F.col("t").alias("t_j"))
            ),
            "dim_j",
        )
        .select(
            "dim_i",
            "dim_j",
            # + 0.0 normalizes IEEE -0.0 -> +0.0: near-zero covariances
            # can round to zero with opposite signs across engines.
            # Division order mirrors the oracle token-for-token.
            (
                F.round(
                    (F.col("s") / F.lit(1e12)) / F.col("n")
                    - (F.col("t_i") / F.lit(1e12) / F.col("n"))
                    * (F.col("t_j") / F.lit(1e12) / F.col("n")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )
    if upper_only:
        out = out.filter(F.col("dim_i") <= F.col("dim_j"))
    return out
