#!/usr/bin/env python3
"""Name-for-name comparison of two bench JSON records.

Usage: python tools/bench_compare.py OLD.json NEW.json [--ratio R]

Prints the common-query subtotals, per-query ratios beyond the
threshold (default 1.3x either direction), and the entries only one
side has. The box's documented steal signature is UNIFORM inflation —
so read a drift that moves every common query together as
measurement context, and only per-query outliers against a flat field
as plan suspects (see BENCH.md "Round-6 closure" for the standing
closure method: git -G on the function + in-bench minimums for
sub-second queries; steal-gated isolated reps only for multi-second
ones).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict[str, float]:
    """Accept both bench.py's raw JSON line and the driver's BENCH_r{N}
    wrapper (which nests the parsed line under 'parsed')."""
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and "queries" not in d:
        d = d["parsed"]
    return d["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    sub_old = sum(old[k] for k in common)
    sub_new = sum(new[k] for k in common)
    if not common or sub_old == 0:
        # ADVICE r6: disjoint query sets (or an all-zero common
        # subtotal) must not ZeroDivisionError before reporting
        print(f"common {len(common)} queries, old subtotal {sub_old:.2f}s: "
              "no comparable field ratio")
        return
    print(
        f"common {len(common)} queries: {sub_old:.2f}s -> {sub_new:.2f}s "
        f"({sub_new / sub_old:.2f}x uniform-field ratio)"
    )

    flagged = []
    for k in common:
        if old[k] <= 0 or new[k] <= 0:
            continue
        r = new[k] / old[k]
        if r >= args.ratio or r <= 1 / args.ratio:
            flagged.append((r, k))
    for r, k in sorted(flagged, reverse=True):
        print(f"  {k}: {old[k]:.3f}s -> {new[k]:.3f}s ({r:.2f}x)")
    if not flagged:
        print(f"  no per-query drift beyond {args.ratio}x")

    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("only in OLD:", ", ".join(only_old))
    if only_new:
        tot = sum(new[k] for k in only_new)
        print(f"only in NEW ({tot:.2f}s):", ", ".join(only_new))


if __name__ == "__main__":
    main()
