"""U2: year / year-range / month extraction from English questions.

Reproduces the union of the reference's four extractors
(``new_disaster_c.py:51-69``, ``Disaster dollar/client.py:110-124,
167-213``, ``era5client.py:183-218``, ``EDGARclient.py:204-212``)
with their sanity bounds, range phrasings ("between X and Y",
"from X to Y", "X-Y", "after/since/before X"), month names and
MM/YYYY forms. Defaults are explicit QuerySpec fields rather than
buried fallbacks (SURVEY.md §7.4): callers pass ``default_year`` to
mirror ERA5's year->2020 behavior where they want it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

YEAR_MIN, YEAR_MAX = 1900, 2100

MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7,
    "aug": 8, "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
}

_YEAR = r"(1[89]\d{2}|2[01]\d{2})"


@dataclass
class TimeSpec:
    year: int | None = None
    year_range: tuple[int, int] | None = None
    months: list[int] | None = None

    @property
    def empty(self) -> bool:
        """True iff the spec denotes a provably-empty time window
        ("after <last year in bounds>" / "before <first year>"): the
        range is kept exclusive and unclamped, so lo > hi. Downstream
        the planner compiles it to ``year BETWEEN lo AND hi`` which is
        vacuously false — the honest empty result, not a silently
        clamped single-year one."""
        return self.year_range is not None and self.year_range[0] > self.year_range[1]


def _valid(y: int, bounds: tuple[int, int]) -> bool:
    return bounds[0] <= y <= bounds[1]


def extract_time(
    question: str,
    bounds: tuple[int, int] = (YEAR_MIN, YEAR_MAX),
    default_year: int | None = None,
) -> TimeSpec:
    q = question.lower()

    # Month names / MM/YYYY (era5client.py:183-218).
    months = sorted({MONTHS[m] for m in re.findall(r"\b(" + "|".join(MONTHS) + r")\b", q)})
    m = re.search(r"\b(\d{1,2})/" + _YEAR + r"\b", q)
    if m and 1 <= int(m.group(1)) <= 12:
        return TimeSpec(year=int(m.group(2)), months=[int(m.group(1))])

    # Ranges: "between X and Y", "from X to Y", "X-Y", "X to Y".
    for pat in (
        r"between\s+" + _YEAR + r"\s+and\s+" + _YEAR,
        r"from\s+" + _YEAR + r"\s+(?:to|through|until)\s+" + _YEAR,
        _YEAR + r"\s*[-–]\s*" + _YEAR,
        _YEAR + r"\s+to\s+" + _YEAR,
    ):
        m = re.search(pat, q)
        if m:
            a, b = int(m.group(1)), int(m.group(2))
            if _valid(a, bounds) and _valid(b, bounds) and a <= b:
                return TimeSpec(year_range=(a, b), months=months or None)

    # Open ranges. Conventional semantics: "since X" is inclusive,
    # "after X" / "before X" are exclusive (clamped to bounds).
    m = re.search(r"since\s+" + _YEAR, q)
    if m and _valid(int(m.group(1)), bounds):
        return TimeSpec(year_range=(int(m.group(1)), bounds[1]), months=months or None)
    # "after <bounds[1]>" / "before <bounds[0]>" are exclusive of the
    # only remaining year, so the range is left unclamped (lo > hi ->
    # TimeSpec.empty); clamping would wrongly include the excluded year.
    m = re.search(r"after\s+" + _YEAR, q)
    if m and _valid(int(m.group(1)), bounds):
        return TimeSpec(
            year_range=(int(m.group(1)) + 1, bounds[1]), months=months or None
        )
    m = re.search(r"before\s+" + _YEAR, q)
    if m and _valid(int(m.group(1)), bounds):
        return TimeSpec(
            year_range=(bounds[0], int(m.group(1)) - 1), months=months or None
        )

    # Single year.
    for y in re.findall(_YEAR, q):
        if _valid(int(y), bounds):
            return TimeSpec(year=int(y), months=months or None)

    return TimeSpec(year=default_year, months=months or None)
