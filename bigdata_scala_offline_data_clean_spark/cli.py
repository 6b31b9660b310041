"""Command-line job runner -- the spark-submit surface.

The reference ships each job as a ``main(args)`` object invoked via
spark-submit (e.g. ``CouponUseDataClean.main``); here every job is runnable
by name against any warehouse root:

    python -m bigdata_scala_offline_data_clean_spark list
    python -m bigdata_scala_offline_data_clean_spark job customer_inf \
        --warehouse /data/wh [--delta-root /data/delta] [--etl-date 20221001]

On a cluster: ``spark-submit --master yarn <this module> job ...`` -- the
session builder honors an existing SparkSession, so spark-submit's master
and conf win.
"""

from __future__ import annotations

import argparse
import sys

from .pipelines import JOBS, run_job
from .session import build_session, stop_session
from .sources.catalog import Warehouse


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="bigdata_scala_offline_data_clean_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list the 12 reference jobs")

    jp = sub.add_parser("job", help="run one job by name")
    jp.add_argument("name", choices=sorted(JOBS))
    jp.add_argument("--warehouse", required=True, help="warehouse root path")
    jp.add_argument("--delta-root", default=None, help="offline-supplement dir (archetype C)")
    jp.add_argument("--etl-date", default=None, help="target partition (archetype D)")
    jp.add_argument("--user", default="user1", help="audit user stamp")
    jp.add_argument("--master", default=None, help="spark master (default: env/local)")

    args = parser.parse_args(argv)

    if args.cmd == "list":
        for name, cfg in sorted(JOBS.items()):
            print(f"{cfg.archetype}  {name:26s} ods={cfg.ods_table or '-':20s} "
                  f"dwd={cfg.dwd_table or cfg.dws_table or '-'}")
        return 0

    spark = build_session(app_name=f"{args.name} offline data clean", master=args.master)
    try:
        wh = Warehouse(spark, args.warehouse)
        etl = run_job(
            wh, args.name,
            delta_root=args.delta_root, user=args.user, etl_date=args.etl_date,
        )
        print(f"{args.name}: processed etl_date={etl}")
        return 0
    finally:
        stop_session(spark)


if __name__ == "__main__":
    raise SystemExit(main())
