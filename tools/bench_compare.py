"""Diff two BENCH_DETAIL_r{N}.json files query by query.

Usage:
    python tools/bench_compare.py BENCH_DETAIL_r10.json BENCH_DETAIL_r11.json
    python tools/bench_compare.py --threshold 1.3 old.json new.json

Prints regressions (new/old >= threshold), improvements (<= 1/threshold),
adds/removes, and the common-subset totals -- the round-over-round signal
the one-line driver summary can't carry.  Sub-second queries are noise-
dominated on a shared box, so they are listed only past 2x.

When both files carry a "bands" map ({name: {min, spread}}, written since
round 11), a mover is flagged only if the two [min, min+spread] bands do
NOT overlap -- overlapping bands mean the ratio is within the measured
run-to-run jitter and is noise, not a plan change.
"""

from __future__ import annotations

import argparse
import json
import sys


def _bands_overlap(old_band: dict | None, new_band: dict | None) -> bool:
    """True when the [min, min+spread] intervals intersect (=> noise)."""
    if not old_band or not new_band:
        return False  # no band data: fall back to ratio-only flagging
    o_lo, o_hi = old_band["min"], old_band["min"] + old_band["spread"]
    n_lo, n_hi = new_band["min"], new_band["min"] + new_band["spread"]
    return o_lo <= n_hi and n_lo <= o_hi


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    old_doc = json.load(open(args.old))
    new_doc = json.load(open(args.new))
    old, new = old_doc["queries"], new_doc["queries"]
    old_bands = old_doc.get("bands", {})
    new_bands = new_doc.get("bands", {})
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regs, imps, noise = [], [], []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0:
            continue
        f = n / o
        # sub-second pairs are scheduling noise until they move 2x
        gate = args.threshold if max(o, n) >= 1.0 else max(args.threshold, 2.0)
        if f >= gate or f <= 1.0 / gate:
            if _bands_overlap(old_bands.get(name), new_bands.get(name)):
                noise.append((f, name, o, n))
            elif f >= gate:
                regs.append((f, name, o, n))
            else:
                imps.append((f, name, o, n))

    # ADVICE r10: branch on len(common), not on the old total being 0.0 --
    # common queries whose timings are all zero are still common queries.
    if common:
        to = sum(old[n] for n in common)
        tn = sum(new[n] for n in common)
        ratio = f" ({tn / to:.2f}x)" if to else ""
        print(f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s{ratio}")
    else:
        print("no common queries")
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"REMOVED ({len(removed)}): " + ", ".join(removed))

    for label, rows in (("regressions", sorted(regs, reverse=True)),
                        ("improvements", sorted(imps)),
                        ("within measured jitter (bands overlap)",
                         sorted(noise, reverse=True))):
        if rows:
            print(f"{label}:")
            for f, name, o, n in rows:
                print(f"  {f:5.2f}x  {name}: {o}s -> {n}s")
    return 1 if removed else 0


if __name__ == "__main__":
    sys.exit(main())
