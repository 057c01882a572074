"""QuerySpec: the declarative question IR.

Every NL question the reference answers reduces to this shape
(SURVEY.md §3): a dataset, some metric columns, conjunctive filters,
an optional time constraint, optional grouping/aggregation, and an
optional order/limit. No OR, no NOT, no nesting — the reference's NL
compilers only emit conjunctions (SURVEY.md §2.2 note), and keeping
the IR that small keeps every compiled plan pushdown-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# A filter value in the reference's filters-dict IR
# (Disaster dollar/server.py:63-87):
#   42                  -> equality
#   ("<=", 42)          -> single comparison
#   [(">", 1), ("<", 9)] -> conjunction of comparisons
#   ["a", "b"]          -> IN-list (P7)
FilterValue = object

COMPARISON_OPS = {"=", "==", ">", ">=", "<", "<=", "!="}


@dataclass
class QuerySpec:
    dataset: str
    # Columns to return/aggregate. Empty -> all columns (SELECT *).
    metrics: list[str] = field(default_factory=list)
    # Conjunctive typed filters, the reference's VALID_FIELDS-checked
    # dict (P3/P5/P7/P9).
    filters: dict[str, FilterValue] = field(default_factory=dict)
    # Case-insensitive string-equality columns (P4: UPPER(City)=UPPER(x)).
    case_insensitive: frozenset[str] = frozenset()
    # Time constraints (P6/P8): either a single year, an inclusive
    # range, and/or a month list on the dataset's date/year column.
    year: int | None = None
    year_range: tuple[int, int] | None = None
    months: list[int] | None = None
    # Aggregation: group_by + agg ("sum" | "avg" | "count" | "none").
    group_by: list[str] = field(default_factory=list)
    agg: str = "none"
    # Presentation (O1-O4).
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (col, ascending)
    limit: int | None = None

    def validate(self) -> None:
        if self.agg not in {"none", "sum", "avg", "count"}:
            raise ValueError(f"unknown agg {self.agg!r}")
        if self.agg != "none" and not self.metrics and self.agg != "count":
            raise ValueError(f"agg={self.agg!r} needs metrics")
        if self.year is not None and self.year_range is not None:
            raise ValueError("year and year_range are mutually exclusive")
