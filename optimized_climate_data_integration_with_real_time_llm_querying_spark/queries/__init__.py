"""Named query registry.

Every implemented operator from SURVEY.md §2 (plus the
LLM-training-pipeline operators) registers here as a :class:`Query`:
a DataFrame builder ``(spark, sf_dir) -> DataFrame`` and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL twin. The
driver hash-compares builder output against the oracle at sf=0.01
(order-insensitive, column-name-sorted), so builders alias every
computed column to exactly the oracle's alias and keep float outputs
rounded.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a builder to the global registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect populates the registry.
    from . import advanced, composed, llm_pipeline, relational, streaming_shapes  # noqa: F401

    return dict(_REGISTRY)
