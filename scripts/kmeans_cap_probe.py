"""Output-quality cost of TRAIN_CAP for the clustering-OUTPUT family
(VERDICT r14 ask #4).

The round-14 TRAIN_CAP change deliberately left kmeans_embedding_clusters
and semantic_dedup_prune on FULL training: their output IS the
clustering, so a capped training changes the deliverable, not just an
index in front of an exact re-rank. But at 100 TB their Lloyd
iterations are the same corpus-proportional scan TRAIN_CAP removed
elsewhere. This probe measures what the cap would actually cost on the
scale twins, the analogue of the round-14 recall table:

- WALL per variant (full vs capped training), both run in ONE session
  back-to-back (the same-session pairing discipline this host's
  phase-of-session drift forces — see BASELINE.md benching notes);
- INERTIA (sum of final-assignment dist2) per variant and the delta %
  — the k-means objective itself;
- ASSIGNMENT CHURN under the OPTIMAL cluster-label matching: the two
  trainings may converge to permuted (or genuinely different) label
  sets, so raw label disagreement overstates churn; with k = 8 the
  8 x 8 contingency table is exact driver-side data and brute-force
  permutation matching (8! = 40320) finds the true maximum-overlap
  alignment. churn = 1 - matched_overlap / n.

Usage:
  python scripts/kmeans_cap_probe.py [--dir .scale/sf10] [--cpus 32]
      [--k 8] [--n-iter 2]

Prints one JSON line; pin the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/sf10")
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--n-iter", type=int, default=2)
    args = ap.parse_args()

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.catalog import (
        load_table,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.clustering import (
        kmeans_assign,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries.clustering import (
        TRAIN_CAP,
    )
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.session import (
        get_spark,
    )

    spark = get_spark("kmeans-cap-probe", cpus=args.cpus)
    sf_dir = os.path.abspath(args.dir)
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    n = emb.count()
    stride = max(1, math.ceil(n / TRAIN_CAP))

    def run(train_stride: int):
        t0 = time.monotonic()
        out = kmeans_assign(
            emb, k=args.k, n_iter=args.n_iter, train_stride=train_stride
        )
        rows = {r.vec_id: (r.cluster, r.dist2) for r in out.collect()}
        wall = time.monotonic() - t0
        for h in getattr(out, "cache_handles", []):
            h.unpersist()
        return rows, wall

    # Warm-up pass so the full-vs-capped pair compares steady state,
    # not parquet cold-read + codegen compile of whoever runs first.
    run(1)
    full, wall_full = run(1)
    capped, wall_capped = run(stride)
    assert set(full) == set(capped) and len(full) == n

    inertia_full = sum(d for _, d in full.values())
    inertia_capped = sum(d for _, d in capped.values())

    # 8 x 8 contingency, then exact optimal label matching.
    cont: dict[tuple[int, int], int] = {}
    for vid, (cf, _) in full.items():
        cc = capped[vid][0]
        cont[(cf, cc)] = cont.get((cf, cc), 0) + 1
    f_labels = sorted({a for a, _ in cont})
    c_labels = sorted({b for _, b in cont})
    # pad to a square assignment over the larger label set
    size = max(len(f_labels), len(c_labels))
    best = 0
    for perm in itertools.permutations(range(size)):
        tot = 0
        for i, fl in enumerate(f_labels):
            j = perm[i]
            if j < len(c_labels):
                tot += cont.get((fl, c_labels[j]), 0)
        best = max(best, tot)
    churn = 1.0 - best / n

    print(
        json.dumps(
            {
                "metric": "kmeans_train_cap_probe",
                "dir": args.dir,
                "n": n,
                "k": args.k,
                "n_iter": args.n_iter,
                "train_cap": TRAIN_CAP,
                "stride": stride,
                "wall_full_sec": round(wall_full, 2),
                "wall_capped_sec": round(wall_capped, 2),
                "inertia_full": round(inertia_full, 3),
                "inertia_capped": round(inertia_capped, 3),
                "inertia_delta_pct": round(
                    100.0 * (inertia_capped - inertia_full) / inertia_full, 2
                ),
                "matched_churn_frac": round(churn, 4),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
