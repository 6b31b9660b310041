"""Dump ``explain("formatted")`` for named queries to plans/r<N>/.

Usage:
    python tools/explain_dump.py --tag before --round 17 [--sf DIR] q1 q2 ...

Writes ``plans/r<N>/<query>_<tag>.txt`` for each query: the physical plan
the optimizer produces at the given SF (default sf0.1, the bench SF).
Composite queries that execute eagerly inside their callable (index
lifecycles, streaming foreachBatch) still run that work; the captured
plan is the final returned frame's, which is what the bench times as the
noop write.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_scala_offline_data_clean_spark.queries import all_queries  # noqa: E402
from bigdata_scala_offline_data_clean_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", type=int, default=17)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    out_dir = Path(__file__).resolve().parent.parent / "plans" / f"r{args.round}"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="explain_dump")
    specs = all_queries()
    rc = 0
    from bigdata_scala_offline_data_clean_spark.operators import ordering

    for name in args.queries:
        if name not in specs:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        # Round 18 (VERDICT r17): pins truncate dumped plans to
        # `Scan ExistingRDD` stubs, so composite lifecycles were
        # unauditable from plans/.  With the env flag set, pin_frame
        # records each frame's plan BEFORE checkpointing; those pre-pin
        # trees land in a companion `_prepin.txt`.
        ordering.PREPIN_PLANS.clear()
        import os

        os.environ["SPARK_GRAFT_EXPLAIN_PREPIN"] = "1"
        try:
            df = specs[name].spark(spark, args.sf)
        finally:
            os.environ.pop("SPARK_GRAFT_EXPLAIN_PREPIN", None)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(plan + "\n")
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        if ordering.PREPIN_PLANS:
            sep = "\n" + "=" * 72 + "\n"
            pre = sep.join(
                f"-- pinned frame {i + 1} of {len(ordering.PREPIN_PLANS)} --\n"
                + p
                for i, p in enumerate(ordering.PREPIN_PLANS)
            )
            ppath = out_dir / f"{name}_{args.tag}_prepin.txt"
            ppath.write_text(pre + "\n")
            print(
                f"wrote {ppath} ({len(ordering.PREPIN_PLANS)} pinned frames, "
                f"{pre.count('Exchange')} Exchange refs)"
            )
    spark.stop()
    return rc


if __name__ == "__main__":
    main()
