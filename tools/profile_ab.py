"""A/B-profile a subset of queries with optional extra session confs.

Usage:
    python tools/profile_ab.py [--sf DIR] [--conf k=v]... [--passes 2] q1 q2 ...

Same methodology as bench.py (warm pass, clearCache + System.gc before
each timed pass, min of N), but a fresh session with `--conf` overrides so
config candidates can be measured without touching session.py.  Prints one
line per query: name, min, spread.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_scala_offline_data_clean_spark.queries import all_queries  # noqa: E402
from bigdata_scala_offline_data_clean_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = build_session(app_name="profile_ab", extra_conf=extra)
    specs = all_queries()
    for name in args.queries:
        if name not in specs:
            print(f"unknown: {name}", file=sys.stderr)
            continue
        specs[name].spark(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        passes = []
        for _ in range(args.passes):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            specs[name].spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            passes.append(time.time() - t0)
        print(
            f"RESULT {name} min={min(passes):.3f} "
            f"spread={max(passes) - min(passes):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
