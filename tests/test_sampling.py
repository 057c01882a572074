"""Sampling-operator properties (priority sampling, DLT estimator).

Covers pkg/operators/sampling.py: weight-proportional selection,
determinism, and the Duffield-Lund-Thorup tau/est_weight path.
"""

from __future__ import annotations

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
    priority_sample,
)


def test_priority_sample_weight_proportional(spark):
    """Priority sampling must keep heavier rows proportionally more
    often: with weights 10 vs 1 at a 20% sample rate, the heavy
    class's keep-rate should dominate decisively."""
    rows = [(i, 10 if i % 2 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w int")
    kept = priority_sample(df, weight_col="w", key_col="id", n=200).collect()
    heavy = sum(1 for r in kept if r.w == 10)
    light = len(kept) - heavy
    assert len(kept) == 200
    assert heavy > 3 * light, (heavy, light)
    # Determinism: a second run keeps the identical set.
    kept2 = priority_sample(df, weight_col="w", key_col="id", n=200).collect()
    assert sorted(r.id for r in kept) == sorted(r.id for r in kept2)


def test_priority_sample_with_tau_estimator(spark):
    """with_tau=True keeps the same top-n rows, exposes tau = the
    (n+1)-th priority as a constant column, and weights survivors by
    max(w, tau) — the DLT near-optimal subset-sum estimator. The
    estimator's defining property: E[sum(est_weight)] = sum(w); for a
    fixed seed we only check structural invariants plus that the
    estimate lands within a loose factor of the true total."""
    rows = [(i, 10 if i % 2 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w int")
    n = 200
    plain = priority_sample(df, weight_col="w", key_col="id", n=n).collect()
    taued = priority_sample(
        df, weight_col="w", key_col="id", n=n, with_tau=True
    ).collect()
    assert len(taued) == n
    # Same kept set as the plain path.
    assert sorted(r.id for r in taued) == sorted(r.id for r in plain)
    taus = {r.tau for r in taued}
    assert len(taus) == 1, "tau must be constant across survivors"
    tau = taus.pop()
    # tau is 2x the (n+1)-th priority (weight-scale threshold for the
    # (0,2) u-span), so tau/2 sits below every kept priority
    # (priorities are distinct here — distinct keys, exact division).
    assert all(r.priority >= tau / 2 for r in taued)
    assert tau > 0
    # est_weight = max(w, tau), and the DLT estimate is in the right
    # ballpark of the true total sum(w) = 500*10 + 500*1 = 5500.
    for r in taued:
        assert r.est_weight == round(max(float(r.w), tau), 6)
    est = sum(r.est_weight for r in taued)
    assert 0.5 * 5500 <= est <= 2.0 * 5500, est


def test_priority_sample_with_tau_small_frame(spark):
    """When the frame has <= n rows there is no (n+1)-th priority:
    every row is kept, tau = 0, est_weight = w (estimator exact)."""
    df = spark.createDataFrame([(1, 5), (2, 7)], "id long, w int")
    out = priority_sample(
        df, weight_col="w", key_col="id", n=10, with_tau=True
    ).collect()
    assert len(out) == 2
    assert all(r.tau == 0.0 for r in out)
    assert sorted(r.est_weight for r in out) == [5.0, 7.0]
