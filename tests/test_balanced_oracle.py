"""Cross-engine (DuckDB) oracle for the balanced coarse quantizer —
closing VERDICT r13's one remaining minor: kmeans_assign_balanced was
pytest-proven but never replayed in SQL. The registry keeps the plain
quantizer by documented design (plans stay byte-stable, and the
multi-round driver-side loop is awkward in one statement), so the
oracle lives HERE instead, at the fixed configuration the mechanism
needs: ONE split round (max_rounds=1), split_factor=1.1 (the driver
embeddings corpus peaks at max/mean ~1.14, so real splits trigger),
k=8, n_iter=2.

The SQL replays the ENTIRE round end-to-end on top of the shared
_kmeans_cte trajectory: occupancy counts -> hot-cell selection
(n > split_factor x mean over NON-EMPTY cells) -> per-hot-cell q80
distance threshold + lowest-id-past-threshold seed (far==lo falls
back to the two lowest ids, kmeans_assign's default) -> a VECTORIZED
per-parent 2-means (2 Lloyd iterations + final assignment, same 6-dp
grid and (dist2, cluster) tie-break) -> degenerate-split detection on
the ITERATION-2 assignment (sub.centroids' cluster set, which is what
the Spark loop checks) -> next_id relabelling in ascending-parent
order over non-degenerate splits only.

Reference shape: FAISS imbalanced-IVF guidance (hot-list splitting);
operator at operators/clustering.py::kmeans_assign_balanced.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
SPLIT_FACTOR = 1.1
K, N_ITER = 8, 2


def _balanced_round_sql() -> str:
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.clustering import (
        _kmeans_cte,
    )

    sub_iters = []
    for i in range(1, N_ITER + 1):
        sub_iters.append(
            f""", sa{i} AS (
      SELECT m.parent, m.vec_id, c.sub,
             ROUND(SUM((m.val - c.cval) * (m.val - c.cval)), 6) AS dist2
      FROM m JOIN sc{i - 1} c ON c.parent = m.parent AND c.dim = m.dim
      GROUP BY m.parent, m.vec_id, c.sub
    ), sb{i} AS (
      SELECT parent, vec_id, sub, dist2 FROM sa{i}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY parent, vec_id ORDER BY dist2, sub) = 1
    ), sc{i} AS (
      SELECT b.parent, b.sub, m.dim, ROUND(AVG(m.val), 6) AS cval
      FROM sb{i} b JOIN m ON m.parent = b.parent AND m.vec_id = b.vec_id
      GROUP BY b.parent, b.sub, m.dim
    )"""
        )
    return (
        _kmeans_cte(K, N_ITER)
        + f"""
    , occ AS (SELECT cluster, COUNT(*) AS n FROM bfinal GROUP BY cluster)
    , tot AS (SELECT SUM(n) AS n_total, COUNT(*) AS n_cells FROM occ)
    , hot AS (
      SELECT o.cluster FROM occ o, tot t
      WHERE o.n > {SPLIT_FACTOR} * (t.n_total / t.n_cells)
    ), thr AS (
      SELECT b.cluster, MIN(b.vec_id) AS lo,
             quantile_cont(b.dist2, 0.8) AS q80
      FROM bfinal b JOIN hot h ON h.cluster = b.cluster
      GROUP BY b.cluster
    ), farr AS (
      SELECT b.cluster, MIN(b.vec_id) AS far
      FROM bfinal b JOIN thr t ON t.cluster = b.cluster
      WHERE b.dist2 >= t.q80
      GROUP BY b.cluster
    ), lo2t AS (
      SELECT b.cluster, MIN(b.vec_id) AS lo2
      FROM bfinal b JOIN thr t ON t.cluster = b.cluster AND b.vec_id > t.lo
      GROUP BY b.cluster
    ), seeds2 AS (
      SELECT t.cluster AS parent, t.lo AS s1,
             CASE WHEN f.far <> t.lo THEN f.far ELSE l.lo2 END AS s2
      FROM thr t
      JOIN farr f ON f.cluster = t.cluster
      LEFT JOIN lo2t l ON l.cluster = t.cluster
    ), m AS (
      SELECT b.cluster AS parent, e.vec_id, e.dim, e.val
      FROM e JOIN bfinal b ON b.vec_id = e.vec_id
      JOIN hot h ON h.cluster = b.cluster
    ), sc0 AS (
      SELECT s.parent, 0 AS sub, e.dim, ROUND(e.val, 6) AS cval
      FROM seeds2 s JOIN e ON e.vec_id = s.s1
      UNION ALL
      SELECT s.parent, 1, e.dim, ROUND(e.val, 6)
      FROM seeds2 s JOIN e ON e.vec_id = s.s2
      WHERE s.s2 IS NOT NULL
    )"""
        + "".join(sub_iters)
        + f""", safinal AS (
      SELECT m.parent, m.vec_id, c.sub,
             ROUND(SUM((m.val - c.cval) * (m.val - c.cval)), 6) AS dist2
      FROM m JOIN sc{N_ITER} c ON c.parent = m.parent AND c.dim = m.dim
      GROUP BY m.parent, m.vec_id, c.sub
    ), sbfinal AS (
      SELECT parent, vec_id, sub, dist2 FROM safinal
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY parent, vec_id ORDER BY dist2, sub) = 1
    ), ndeg AS (
      -- the Spark loop's degeneracy check reads sub.centroids, i.e.
      -- the cluster set of the LAST Lloyd update (iteration {N_ITER})
      SELECT parent FROM sb{N_ITER}
      GROUP BY parent HAVING COUNT(DISTINCT sub) >= 2
    ), ranked AS (
      SELECT parent, ROW_NUMBER() OVER (ORDER BY parent) - 1 AS r
      FROM ndeg
    )
    SELECT b.vec_id, b.cluster, b.dist2
    FROM bfinal b
    WHERE b.cluster NOT IN (SELECT parent FROM ndeg)
    UNION ALL
    SELECT s.vec_id, CAST({K} + 2 * r.r + s.sub AS INT) AS cluster, s.dist2
    FROM sbfinal s JOIN ranked r ON r.parent = s.parent
    """
    )


@pytest.fixture(scope="module")
def oracle_rows():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    return con.sql(_balanced_round_sql()).fetchall()


def _canon(rows):
    return sorted(
        (int(v), int(c), round(float(d), 6)) for v, c, d in rows
    )


def test_balanced_quantizer_matches_duckdb_replay(spark, oracle_rows):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.clustering import (
        kmeans_assign_balanced,
    )

    emb = load_table(spark, SF, "embeddings", rebalance=True)
    out = kmeans_assign_balanced(
        emb, K, N_ITER, split_factor=SPLIT_FACTOR, max_rounds=1
    )
    got = _canon([(r["vec_id"], r["cluster"], r["dist2"]) for r in out.collect()])
    for h in out.cache_handles:
        h.unpersist()
    want = _canon(oracle_rows)
    assert len(got) == len(want) == 500
    # real splits must have happened for the test to prove anything
    n_cells = len({c for _, c, _ in got})
    assert n_cells > K, f"no split triggered (cells={n_cells}) — raise SPLIT_FACTOR sensitivity"
    assert got == want


def test_balanced_oracle_centroid_contract(spark):
    """The centroids attribute must cover exactly the final cell ids
    the assignment uses (the probe side of every IVF search depends
    on this contract)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.clustering import (
        kmeans_assign_balanced,
    )

    emb = load_table(spark, SF, "embeddings", rebalance=True)
    out = kmeans_assign_balanced(
        emb, K, N_ITER, split_factor=SPLIT_FACTOR, max_rounds=1
    )
    assigned = {r["cluster"] for r in out.collect()}
    cent_cells = {c for c, _, _ in out.centroids}
    for h in out.cache_handles:
        h.unpersist()
    assert assigned <= cent_cells
