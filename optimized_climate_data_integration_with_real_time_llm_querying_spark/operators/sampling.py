"""Deterministic corpus sampling.

Random sampling (`df.sample`) is seed-stable within one Spark version
but opaque and partitioning-sensitive; training-data curation wants
sampling that is (a) reproducible across runs AND engines, (b)
per-stratum tunable, (c) expressible as a filter so it pushes into
scans. Hash-mod sampling delivers all three: keep a row iff
xxhash64(key) mod D < D * rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_sample_predicate(key: Column, rate: float, seed: int = 0) -> Column:
    """Deterministic keep-predicate: stable for a given (key, seed),
    independent of partitioning and row order."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), key), F.lit(_DENOM))
    return bucket < int(rate * _DENOM)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a crawl
    source, keep all of a curated one). Rows in strata without an
    explicit rate get ``default_rate``. One map-side filter, no
    shuffle, no state."""
    rate_expr: Column = F.lit(float(default_rate))
    for value, rate in rates.items():
        rate_expr = F.when(F.col(strata_col) == value, float(rate)).otherwise(rate_expr)
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(_DENOM))
    return df.filter(bucket < (rate_expr * _DENOM).cast("long"))
