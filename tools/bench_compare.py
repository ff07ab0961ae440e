#!/usr/bin/env python3
"""Compare two BENCH_FULL-style artifacts per query.

Usage: bench_compare.py OLD.json NEW.json [ratio_floor]
Prints queries whose NEW/OLD time ratio exceeds the floor (default 1.5)
or improved by the inverse, plus totals over the common set.
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_old / t_new:.2f}x)")
    rows = []
    for q in common:
        if old[q] <= 0 or new[q] <= 0:
            continue
        r = new[q] / old[q]
        if r >= floor or r <= 1 / floor:
            rows.append((r, q, old[q], new[q]))
    for r, q, a, b in sorted(rows):
        print(f"{q:28s} {a:6.2f} -> {b:6.2f}  ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new:", ", ".join(f"{q}={new[q]:.2f}" for q in only_new))


if __name__ == "__main__":
    main()
