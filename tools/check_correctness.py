"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, name-sorted schema, and
order-insensitive values (exact equality on sorted rows -- strictly stronger
than the driver's value hash).

Usage: python tools/check_correctness.py [--hostile] [--json PATH] [sf_dir] [query ...]

``--json PATH`` additionally writes per-query results in the driver's
CORRECTNESS_r{N}.json shape, so a full local sweep can be committed as
evidence for the queries beyond the driver's per-round slot budget.

``--hostile`` runs with a driver-like SparkSession instead of this repo's
``build_session``: America/New_York timezone, stock configs, default
shuffle partitions.  The external driver uses its own session, so every
query must pass hostile too -- queries pin UTC/nanosAsLong at runtime via
``queries/_util.load_table``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_scala_offline_data_clean_spark.queries import all_queries  # noqa: E402
from bigdata_scala_offline_data_clean_spark.session import build_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .appName("check_correctness_hostile")
            .getOrCreate()
        )
    else:
        spark = build_session(app_name="check_correctness")
    specs = all_queries()
    unknown = only - set(specs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 1
    failures = []
    n_run = 0
    report: dict[str, dict] = {}
    for name, spec in specs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {type(e).__name__}",
            }
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only {len(srows)} rows ({time.time()-t0:.1f}s)")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        try:
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}",
            }
            continue
        problems = []
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = False
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not schema_match:
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            hash_match = a == b
            if not hash_match:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ (first at sorted-row {diff}):\n"
                    f"    spark: {a[diff] if diff is not None else '?'}\n"
                    f"    duck : {b[diff] if diff is not None else '?'}"
                )
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
        }
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} green")
    if json_path:
        import json

        Path(json_path).write_text(json.dumps(report, indent=2) + "\n")
        print(f"wrote {json_path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
