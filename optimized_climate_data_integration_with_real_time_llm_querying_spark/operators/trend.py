"""Holt linear-trend state recursion (double exponential smoothing),
factored out of the ``holt_forecast_daily`` registry query so other
surfaces — notably the NL planner's "which X is trending up?" path —
can target the same operator.

The recursion l_t = a*y_t + (1-a)*(l+b); b_t = b*(l_t - l_{t-1}) +
(1-b)*b_{t-1} is inherently sequential, so it is UNROLLED: one tiny
keyed join per step over the (key, rn, cnt) sequence frame, each step
re-rounded to the 6-dp grid (with the default DYADIC constants
0.75/0.25 the products round deterministically on every engine — the
property the registry oracle replays as generated CTEs). Each step is
``coalesce(1).localCheckpoint(eager=True)``: left lazy, the two-
reference state recurrence doubles the plan per step (the unigram
lesson — measured analyzer timeout); the checkpointed frame is
key-count-sized, so the per-step cost is fixed and corpus-independent.

Scale: the corpus appears only through whatever aggregate produced
the sequence frame (a daily count, a yearly count); the recursion
itself touches |keys| rows per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_linear_state(
    seq: DataFrame,
    key_col: str,
    n_steps: int,
    alpha: float = 0.75,
    beta: float = 0.25,
    series_desc: str = "steps",
) -> DataFrame:
    """(key, l, b) after ``n_steps`` Holt steps over ``seq``.

    ``seq`` columns: ``key_col``, ``rn`` (dense 1..n_steps per key),
    ``cnt``. Initial state from the first two observations:
    l_1 = y_1, b_1 = y_2 - y_1 (the standard initialization) — so the
    recursion NEEDS at least two observations, and a key missing some
    rn would silently drop out of a stepped join. Both preconditions
    are guarded HERE, loudly (one small collect over the per-key
    counts at build time), so no caller can forget them; callers that
    persisted ``seq`` should wrap this call to unpersist on raise.
    ``series_desc`` names the step unit in the error ("days",
    "years") so the message reads in the caller's domain.
    """
    if n_steps < 2:
        raise ValueError(
            f"holt_linear_state: need at least 2 {series_desc} "
            f"(got n_steps={n_steps}) — initialization uses the first "
            "two observations"
        )
    counts = [
        r[0] for r in seq.groupBy(key_col).count().select("count").collect()
    ]
    if not counts or min(counts) != n_steps or max(counts) != n_steps:
        raise ValueError(
            f"holt_linear_state: expected exactly {n_steps} "
            f"{series_desc} per {key_col}, got {sorted(set(counts))}"
        )
    a, b_ = alpha, beta
    y1 = seq.where(F.col("rn") == 1).select(key_col, F.col("cnt").alias("y1"))
    y2 = seq.where(F.col("rn") == 2).select(key_col, F.col("cnt").alias("y2"))
    state = y1.join(y2, key_col).select(
        key_col,
        F.col("y1").cast("double").alias("l"),
        (F.col("y2") - F.col("y1")).cast("double").alias("b"),
    )
    for t in range(2, n_steps + 1):
        yt = seq.where(F.col("rn") == t).select(key_col, "cnt")
        stepped = state.join(yt, key_col).select(
            key_col,
            F.round(a * F.col("cnt") + (1 - a) * (F.col("l") + F.col("b")), 6).alias(
                "l_new"
            ),
            "l",
            "b",
        )
        state = (
            stepped.select(
                key_col,
                F.col("l_new").alias("l"),
                F.round(
                    b_ * (F.col("l_new") - F.col("l")) + (1 - b_) * F.col("b"), 6
                ).alias("b"),
            )
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    return state
