#!/usr/bin/env python
"""Recompute every round-over-round bench claim from two SHIPPED
bench files (VERDICT r9 item 2 discipline: no undisclosed runs).

Usage:
    python scripts/bench_compare.py BENCH_r09_clean_local.json \
        BENCH_r10_clean_local.json [BENCH_r01.json]
    python scripts/bench_compare.py --driver BENCH_r10.json \
        BENCH_r10_clean_local.json

Prints the shared-query totals and delta, per-query regressions past
the >30% + 0.3 s bar (and improvements past the mirror bar), and —
when the round-1 driver file is given — the r1-bar subset sum and its
ratio to the 44.136 s bar recorded in BASELINE.md.

--driver mode (VERDICT r10 item 5): quantify the co-tenant contention
in the DRIVER's bench run as a number instead of prose — per-query
driver/clean time ratios, their distribution (median / p90 / max),
and the most-inflated queries. Driver files record only the output
tail, so queries are regex-recovered from it; the subset size is
printed so the table is honest about coverage.
"""

from __future__ import annotations

import json
import re
import sys

BAR_SECONDS = 44.136  # reference single-node total, BASELINE.md


def _load_clean(path: str) -> dict:
    """A clean bench capture. Since round 13 bench.py prints TWO
    JSON lines (the full per-query record, then a tail-window-sized
    compact summary for the driver's parser); pick the record with
    the most queries so both old single-line and new two-line files
    load."""
    recs = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not recs:
        sys.exit(f"{path}: no JSON record found")
    return max(recs, key=lambda r: len(r.get("queries", {})))


def _driver_queries(path: str) -> dict[str, float]:
    """Per-query seconds from a driver bench file: parsed.queries when
    the driver parsed the JSON line, else regex-recovered from the
    recorded output tail (the tail may start mid-dict, so this is a
    subset of the run)."""
    blob = json.load(open(path))
    parsed = blob.get("parsed")
    if parsed and parsed.get("queries"):
        return dict(parsed["queries"])
    tail = blob.get("tail", "")
    out: dict[str, float] = {}
    for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
        k, v = m.group(1), float(m.group(2))
        if k not in ("sf", "value", "load_1m_before", "load_1m_after", "ncpu",
                     "driver_cpu_sec", "wall_sec"):
            out[k] = v
    return out


def _driver_mode(driver_path: str, clean_path: str) -> None:
    drv = _driver_queries(driver_path)
    cln = _load_clean(clean_path)["queries"]
    shared = sorted(set(drv) & set(cln))
    ratios = sorted((drv[q] / cln[q], q) for q in shared if cln[q] > 0)
    if not ratios:
        sys.exit("no shared queries between driver and clean files")
    vals = [r for r, _ in ratios]
    def pct(p: float) -> float:
        return vals[min(len(vals) - 1, int(p * len(vals)))]
    print(
        f"driver/clean ratio over {len(shared)} recovered queries "
        f"(driver file records the output tail only): "
        f"median {pct(0.5):.2f}x  p90 {pct(0.9):.2f}x  max {vals[-1]:.2f}x"
    )
    ds, cs = sum(drv[q] for q in shared), sum(cln[q] for q in shared)
    print(f"shared-subset totals: driver {ds:.1f}s vs clean {cs:.1f}s = {ds / cs:.2f}x")
    print("most inflated:")
    for r, q in ratios[-5:][::-1]:
        print(f"  {q}: {drv[q]:.2f}s vs {cln[q]:.2f}s = {r:.2f}x")


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--driver":
        if len(sys.argv) != 4:
            sys.exit(__doc__)
        _driver_mode(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    prev_rec = _load_clean(sys.argv[1])
    curr_rec = _load_clean(sys.argv[2])
    prev, curr = prev_rec["queries"], curr_rec["queries"]
    shared = sorted(set(prev) & set(curr))
    tp, tc = sum(prev[q] for q in shared), sum(curr[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {tp:.1f}s -> {tc:.1f}s "
        f"({(tc - tp) / tp * 100:+.1f}%)"
    )
    # Intra-run drift band (round-15 sentinel): each file's own
    # measured host-phase drift over the identical 3-query probe at
    # bench start vs end. Any cross-file delta inside this band is
    # host phase, not code.
    drifts = [
        r.get("sentinel_drift_pct")
        for r in (prev_rec, curr_rec)
        if r.get("sentinel_drift_pct") is not None
    ]
    if drifts:
        band = max(abs(d) for d in drifts)
        print(
            "intra-run drift sentinel: "
            + ", ".join(f"{d:+.1f}%" for d in drifts)
            + f" — deltas within ±{band:.1f}% are host phase, not code"
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
