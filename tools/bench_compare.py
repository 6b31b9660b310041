"""Diff two BENCH_DETAIL_r{N}.json files query by query.

Usage:
    python tools/bench_compare.py BENCH_DETAIL_r10.json BENCH_DETAIL_r11.json
    python tools/bench_compare.py --threshold 1.3 old.json new.json

Prints regressions (new/old >= threshold), improvements (<= 1/threshold),
adds/removes, and the common-subset totals -- the round-over-round signal
the one-line driver summary can't carry.  Sub-second queries are noise-
dominated on a shared box, so they are listed only past 2x.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regs, imps = [], []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0:
            continue
        f = n / o
        # sub-second pairs are scheduling noise until they move 2x
        gate = args.threshold if max(o, n) >= 1.0 else max(args.threshold, 2.0)
        if f >= gate:
            regs.append((f, name, o, n))
        elif f <= 1.0 / gate:
            imps.append((f, name, o, n))

    to = sum(old[n] for n in common)
    tn = sum(new[n] for n in common)
    print(
        f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s "
        f"({tn / to:.2f}x)" if to else "no common queries"
    )
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"REMOVED ({len(removed)}): " + ", ".join(removed))

    for label, rows in (("regressions", sorted(regs, reverse=True)),
                        ("improvements", sorted(imps))):
        if rows:
            print(f"{label}:")
            for f, name, o, n in rows:
                print(f"  {f:5.2f}x  {name}: {o}s -> {n}s")
    return 1 if removed else 0


if __name__ == "__main__":
    sys.exit(main())
