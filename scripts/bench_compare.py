#!/usr/bin/env python
"""Recompute every round-over-round bench claim from two SHIPPED
bench files (VERDICT r9 item 2 discipline: no undisclosed runs).

Usage:
    python scripts/bench_compare.py BENCH_r09_clean_local.json \
        BENCH_r10_clean_local.json [BENCH_r01.json]

Prints the shared-query totals and delta, per-query regressions past
the >30% + 0.3 s bar (and improvements past the mirror bar), and —
when the round-1 driver file is given — the r1-bar subset sum and its
ratio to the 44.136 s bar recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import sys

BAR_SECONDS = 44.136  # reference single-node total, BASELINE.md


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    prev = json.load(open(sys.argv[1]))["queries"]
    curr = json.load(open(sys.argv[2]))["queries"]
    shared = sorted(set(prev) & set(curr))
    tp, tc = sum(prev[q] for q in shared), sum(curr[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {tp:.1f}s -> {tc:.1f}s "
        f"({(tc - tp) / tp * 100:+.1f}%)"
    )
    reg = [(q, prev[q], curr[q]) for q in shared if curr[q] > prev[q] * 1.3 + 0.3]
    imp = [(q, prev[q], curr[q]) for q in shared if curr[q] < prev[q] * 0.7 - 0.3]
    print(f"regressions past >30%+0.3s: {len(reg)}")
    for q, a, b in sorted(reg, key=lambda r: r[2] - r[1], reverse=True):
        print(f"  {q}: {a:.2f} -> {b:.2f}")
    print(f"improvements past the mirror bar: {len(imp)}")
    for q, a, b in sorted(imp, key=lambda r: r[1] - r[2], reverse=True):
        print(f"  {q}: {a:.2f} -> {b:.2f}")
    only_new = sorted(set(curr) - set(prev))
    if only_new:
        print(f"new this round ({len(only_new)}):")
        for q in only_new:
            print(f"  {q}: {curr[q]:.2f}")
    if len(sys.argv) > 3:
        bar_keys = json.load(open(sys.argv[3]))["parsed"]["queries"]
        keys = [k for k in bar_keys if k in curr]
        s = sum(curr[k] for k in keys)
        print(
            f"r1-bar subset ({len(keys)} queries): {s:.2f}s "
            f"= {s / BAR_SECONDS:.3f}x of the {BAR_SECONDS}s bar"
        )


if __name__ == "__main__":
    main()
