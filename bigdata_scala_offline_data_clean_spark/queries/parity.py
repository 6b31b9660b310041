"""Parity queries: one driver-checked query per SURVEY.md §2 operator row.

Each entry exercises the reference operator on the driver testdata and ships
an ANSI-SQL twin for the DuckDB oracle (SURVEY.md §5 mapping table).
Reference sites are cited per query; column aliases match the oracle exactly
(the driver hashes values under name-sorted columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.etl import (
    dedup_latest,
    merge_full_outer,
    rename_prefix,
    scd1_upsert,
    stamp_audit,
    star_denormalize,
)
from . import QuerySpec
from ._util import day_str, load_table, register_views, ts_str

PIN_TS = "2022-10-01 00:00:00"  # pinned run timestamp (reference regex date
# 20221001, OrderMasterDataClean.scala:30; fixed so oracle hashes match)
OLD_TS = "2022-09-30 00:00:00"

ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]

# ---------------------------------------------------------------------------
# q01 -- A2 + P6 + S1: latest-partition scan via uncorrelated scalar subquery
#        (OrderMasterDataClean.scala:70-71: WHERE etl_date = (SELECT max(...)))
# ---------------------------------------------------------------------------


def q01_latest_day_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority,
               date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate,
               date_format(o_orderdate, 'yyyyMMdd') AS etl_date
        FROM orders
        WHERE date_format(o_orderdate, 'yyyyMMdd') =
              (SELECT max(date_format(o_orderdate, 'yyyyMMdd')) FROM orders)
        """
    )


Q01_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderpriority,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       strftime(o_orderdate, '%Y%m%d') AS etl_date
FROM orders
WHERE strftime(o_orderdate, '%Y%m%d') =
      (SELECT max(strftime(o_orderdate, '%Y%m%d')) FROM orders)
"""

# ---------------------------------------------------------------------------
# q02 -- P3/P4 + F1/F2 + A1/S12: audit-stamped append clean (archetype A,
#        SimpleDataCleanUtils.scala:19-30) with pinned run timestamp
# ---------------------------------------------------------------------------


def q02_audit_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # A1/S12: driver-side scalar fetch of the latest "partition"
    latest = li.agg(F.max(day_str("l_shipdate"))).first()[0]
    part = li.where(day_str("l_shipdate") == latest).withColumn(
        "l_shipdate", ts_str("l_shipdate")
    )
    return stamp_audit(part, user="user1", ts=F.lit(PIN_TS), etl_date=latest)


Q02_SQL = f"""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate,
       'user1' AS dwd_insert_user, '{PIN_TS}' AS dwd_insert_time,
       'user1' AS dwd_modify_user, '{PIN_TS}' AS dwd_modify_time,
       strftime(l_shipdate, '%Y%m%d') AS etl_date
FROM lineitem
WHERE strftime(l_shipdate, '%Y%m%d') =
      (SELECT max(strftime(l_shipdate, '%Y%m%d')) FROM lineitem)
"""

# ---------------------------------------------------------------------------
# q03 -- P2/S2: rename projection (SELECT c AS hive_c ...,
#        OrderMasterDataClean.scala:42-73)
# ---------------------------------------------------------------------------


def q03_rename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", ts_str("o_orderdate")
    )
    return rename_prefix(o, "hive_")


Q03_SQL = """
SELECT o_orderkey AS hive_o_orderkey, o_custkey AS hive_o_custkey,
       o_orderstatus AS hive_o_orderstatus, o_totalprice AS hive_o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS hive_o_orderdate,
       o_orderpriority AS hive_o_orderpriority
FROM orders
"""

# ---------------------------------------------------------------------------
# q04 -- W1 + P7 + P5: SCD-1 window dedup, newest event per user
#        (CustomerInfDataClean.scala:41-45) with deterministic tie-break (Q3)
# ---------------------------------------------------------------------------


def q04_scd1_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = dedup_latest(ev, "user_id", "ts", tiebreak="event_id")
    return out.select(
        "user_id", "event_id", "event_type", "value", "props", ts_str("ts").alias("ts")
    )


Q04_SQL = """
SELECT user_id, event_id, event_type, value, props,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""

# ---------------------------------------------------------------------------
# q05 -- U1 + P3: unionByName of differently-ordered projections
#        (CustomerInfDataClean.scala:32-37)
# ---------------------------------------------------------------------------


def q05_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    neg = c.where(F.col("c_acctbal") < 0).select(
        "c_custkey", "c_acctbal", "c_name"
    ).withColumn("data_source", F.lit("neg"))
    pos = c.where(F.col("c_acctbal") >= 0).select(
        "c_name", "c_custkey", "c_acctbal"
    ).withColumn("data_source", F.lit("pos"))
    return neg.unionByName(pos)


Q05_SQL = """
SELECT c_custkey, c_acctbal, c_name, 'neg' AS data_source
FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT c_custkey, c_acctbal, c_name, 'pos' AS data_source
FROM customer WHERE c_acctbal >= 0
"""

# ---------------------------------------------------------------------------
# q06 -- J1 + J3 + F3: full-outer join + per-column coalesce merge
#        (OrderMasterDataClean.scala:157-180; Q1 fixed -- key coalesced too)
# ---------------------------------------------------------------------------


def q06_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", ts_str("o_orderdate")
    )
    base = o.where(F.col("o_orderkey") % 3 != 0)
    delta = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_orderpriority", F.lit("DELTA-SUPPLEMENT"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    )
    return merge_full_outer(base, delta, "o_orderkey", prefer="base")


Q06_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
         o_orderpriority
  FROM orders WHERE o_orderkey % 3 <> 0
), delta AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
         'DELTA-SUPPLEMENT' AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT COALESCE(b.o_orderkey, d.o_orderkey)           AS o_orderkey,
       COALESCE(b.o_custkey, d.o_custkey)             AS o_custkey,
       COALESCE(b.o_orderstatus, d.o_orderstatus)     AS o_orderstatus,
       COALESCE(b.o_totalprice, d.o_totalprice)       AS o_totalprice,
       COALESCE(b.o_orderdate, d.o_orderdate)         AS o_orderdate,
       COALESCE(b.o_orderpriority, d.o_orderpriority) AS o_orderpriority
FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
"""

# ---------------------------------------------------------------------------
# q07 -- J2: star denormalisation via chained left joins, dims broadcast
#        (CustomerAddrLevelAggrDataClean.scala:28-30)
# ---------------------------------------------------------------------------


def q07_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    r = load_table(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    out = star_denormalize(c, [(n, "c_nationkey"), (r, "n_regionkey")])
    return out.select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name", "r_name"
    )


Q07_SQL = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name, r.r_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""

# ---------------------------------------------------------------------------
# q08 -- U1 + W1 + F4 composite: full SCD-1 upsert with CASE-preserved audit
#        times (archetype B, CustomerInfDataClean.scala:27-61)
# ---------------------------------------------------------------------------


def q08_scd1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old_ts = F.lit(OLD_TS).cast("timestamp")
    ods = dedup_latest(
        ev.where(F.col("event_id") % 2 == 1), "user_id", "ts", tiebreak="event_id"
    )
    dwd = (
        dedup_latest(
            ev.where(F.col("event_id") % 2 == 0), "user_id", "ts", tiebreak="event_id"
        )
        .withColumn("dwd_insert_user", F.lit("user1"))
        .withColumn("dwd_insert_time", old_ts)
        .withColumn("dwd_modify_user", F.lit("user1"))
        .withColumn("dwd_modify_time", old_ts)
    )
    out = scd1_upsert(
        ods,
        dwd,
        key="user_id",
        order_col="ts",
        user="user1",
        ts=F.lit(PIN_TS).cast("timestamp"),
        etl_date="20221001",
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "props",
        ts_str("ts").alias("ts"),
        "dwd_insert_user",
        ts_str("dwd_insert_time").alias("dwd_insert_time"),
        "dwd_modify_user",
        ts_str("dwd_modify_time").alias("dwd_modify_time"),
        "etl_date",
    )


Q08_SQL = f"""
WITH ods AS (
  SELECT * FROM events WHERE event_id % 2 = 1
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), dwd AS (
  SELECT * FROM events WHERE event_id % 2 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), combined AS (
  SELECT event_id, ts, user_id, event_type, value, props,
         'ods' AS data_source,
         CAST(NULL AS TIMESTAMP) AS dwd_insert_time,
         CAST(NULL AS TIMESTAMP) AS dwd_modify_time
  FROM ods
  UNION ALL
  SELECT event_id, ts, user_id, event_type, value, props,
         'dwd' AS data_source,
         TIMESTAMP '{OLD_TS}' AS dwd_insert_time,
         TIMESTAMP '{OLD_TS}' AS dwd_modify_time
  FROM dwd
), merged AS (
  SELECT * FROM combined
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, data_source DESC, event_id DESC) = 1
)
SELECT user_id, event_id, event_type, value, props,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       'user1' AS dwd_insert_user,
       strftime(CASE WHEN data_source = 'ods' THEN TIMESTAMP '{PIN_TS}'
                     ELSE dwd_insert_time END, '%Y-%m-%d %H:%M:%S') AS dwd_insert_time,
       'user1' AS dwd_modify_user,
       strftime(CASE WHEN data_source = 'ods' THEN TIMESTAMP '{PIN_TS}'
                     ELSE dwd_modify_time END, '%Y-%m-%d %H:%M:%S') AS dwd_modify_time,
       '20221001' AS etl_date
FROM merged
"""

# ---------------------------------------------------------------------------
# q09 -- P8/S5: regex predicate (rowkey RowFilter stand-in,
#        OrderMasterDataClean.scala:29-30,80-82)
# ---------------------------------------------------------------------------


def q09_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("props").rlike("7}$")).select(
        "event_id", "user_id", "event_type", "value", "props", ts_str("ts").alias("ts")
    )


Q09_SQL = """
SELECT event_id, user_id, event_type, value, props,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events WHERE regexp_matches(props, '7}$')
"""

# ---------------------------------------------------------------------------
# q10 -- S1 + P1 + P6: single-partition star scan via equality filter
# ---------------------------------------------------------------------------


def q10_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type", "value", "props", ts_str("ts").alias("ts")
    )


Q10_SQL = """
SELECT event_id, user_id, event_type, value, props,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events WHERE event_type = 'click'
"""

# ---------------------------------------------------------------------------
# q11 -- A1/S12: scalar MAX aggregates (SimpleDataCleanUtils.scala:19)
# ---------------------------------------------------------------------------


def q11_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.max("o_totalprice").alias("max_totalprice"),
        F.max(day_str("o_orderdate")).alias("max_day"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q11_SQL = """
SELECT max(o_totalprice) AS max_totalprice,
       max(strftime(o_orderdate, '%Y%m%d')) AS max_day,
       count(*) AS n_orders
FROM orders
"""

# ---------------------------------------------------------------------------
# q12 -- P9 + F4: selectExpr projection with CASE WHEN
#        (CustomerInfDataClean.scala:46-61)
# ---------------------------------------------------------------------------


def q12_selectexpr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "CASE WHEN c_acctbal < 0 THEN 'delinquent' ELSE 'good' END AS bal_flag",
        "'user1' AS dwd_insert_user",
    )


Q12_SQL = """
SELECT c_custkey, c_name, c_acctbal,
       CASE WHEN c_acctbal < 0 THEN 'delinquent' ELSE 'good' END AS bal_flag,
       'user1' AS dwd_insert_user
FROM customer
"""


# ---------------------------------------------------------------------------
# q13 -- semi/anti joins (beyond the reference's join set: the existence
# queries every warehouse needs)
# ---------------------------------------------------------------------------


def q13_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    buyers = c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name").withColumn("has_orders", F.lit(True))
    lurkers = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name").withColumn("has_orders", F.lit(False))
    return buyers.unionByName(lurkers)


Q13_SQL = """
SELECT c_custkey, c_name, TRUE AS has_orders
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, c_name, FALSE AS has_orders
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# q14 -- as-of join (custom operator: union-window composition, one shuffle;
# oracle = DuckDB's native ASOF JOIN)
# ---------------------------------------------------------------------------


def q14_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_event_id", "click_ts", "click_value"],
    )
    return out.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts"),
        "value",
        "click_event_id",
        ts_str("click_ts").alias("click_ts"),
        "click_value",
    )


Q14_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts, p.value,
       c.event_id AS click_event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
"""

# ---------------------------------------------------------------------------
# q15 -- range (interval-containment) join via coarse time buckets
# ---------------------------------------------------------------------------


def q15_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
        F.col("event_id").alias("purchase_event_id"),
    )
    out = range_join_bucketed(
        errors,
        windows,
        on="user_id",
        left_ts="ts",
        range_start="win_start",
        range_end="win_end",
        payload=["purchase_event_id"],
        bucket_seconds=3600,
    )
    return out.select(
        "user_id", "event_id", ts_str("ts").alias("ts"), "purchase_event_id"
    )


Q15_SQL = """
SELECT e.user_id, e.event_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       p.event_id AS purchase_event_id
FROM events e
JOIN events p
  ON e.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error'
"""


# ---------------------------------------------------------------------------
# q16 -- set operations: INTERSECT / EXCEPT (distinct semantics)
# ---------------------------------------------------------------------------


def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    buyers = o.select(F.col("o_custkey").alias("custkey"))
    rich = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    both = rich.intersect(buyers).withColumn("set_op", F.lit("rich_buyer"))
    only_rich = rich.exceptAll(buyers.distinct()).withColumn(
        "set_op", F.lit("rich_no_orders")
    )
    return both.unionByName(only_rich)


Q16_SQL = """
WITH buyers AS (SELECT o_custkey AS custkey FROM orders),
     rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
SELECT custkey, 'rich_buyer' AS set_op FROM (SELECT custkey FROM rich INTERSECT SELECT custkey FROM buyers)
UNION ALL
SELECT custkey, 'rich_no_orders' AS set_op FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM buyers)
"""


# ---------------------------------------------------------------------------
# q17 -- heterogeneous-schema union (U1 extended): unionByName with
# allowMissingColumns merges entity frames whose columns only partially
# overlap; absent columns null-fill.  The schema-evolution staple when an
# upstream adds columns mid-history.
# ---------------------------------------------------------------------------


def q17_union_mixed_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),  # customer side lacks this
    )
    return c.unionByName(s, allowMissingColumns=True)


Q17_SQL = """
SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
       'customer' AS kind, c_mktsegment AS mktsegment,
       CAST(NULL AS INT) AS nationkey
FROM customer
UNION ALL
SELECT s_suppkey, s_name, s_acctbal, 'supplier', CAST(NULL AS VARCHAR),
       s_nationkey
FROM supplier
"""


# ---------------------------------------------------------------------------
# q18 -- null-safe equi-join (<=>): NULL keys match each other, the
# semantics SQL '=' silently drops.  Fixture nulls every 7th segment on one
# side and every 3rd on the other so both null-null matches and null-drop
# differences are exercised.
# ---------------------------------------------------------------------------


def q18_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    left = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    ).where(F.col("c_custkey") <= 60)
    right = (
        c.select(
            F.when(F.col("c_custkey") % 3 == 0, F.lit(None))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
        .where(F.col("c_custkey") <= 30)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    return left.join(right, left["seg"].eqNullSafe(right["seg"])).select(
        "c_custkey", left["seg"].alias("seg"), "n_right"
    )


Q18_SQL = """
WITH l AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer WHERE c_custkey <= 60
), r AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS seg,
         count(*) AS n_right
  FROM customer WHERE c_custkey <= 30
  GROUP BY 1
)
SELECT l.c_custkey, l.seg, r.n_right
FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
"""


# ---------------------------------------------------------------------------
# q19 -- correlated EXISTS / NOT EXISTS in SQL form.  Catalyst rewrites
# both to semi/anti joins (RewritePredicateSubquery) -- the q13 DataFrame
# forms, reached from SQL.  Customers with an urgent order but no F order.
# ---------------------------------------------------------------------------


def q19_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderstatus = 'F')
        """
    )


Q19_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


QUERIES: dict[str, QuerySpec] = {
    "q01_latest_day_orders": QuerySpec(q01_latest_day_orders, Q01_SQL),
    "q17_union_mixed_schemas": QuerySpec(q17_union_mixed_schemas, Q17_SQL),
    "q18_null_safe_join": QuerySpec(q18_null_safe_join, Q18_SQL),
    "q19_exists_subquery": QuerySpec(q19_exists_subquery, Q19_SQL),
    "q13_semi_anti_join": QuerySpec(q13_semi_anti_join, Q13_SQL),
    "q14_asof_join": QuerySpec(q14_asof_join, Q14_SQL),
    "q15_range_join": QuerySpec(q15_range_join, Q15_SQL),
    "q16_set_ops": QuerySpec(q16_set_ops, Q16_SQL),
    "q02_audit_stamp": QuerySpec(q02_audit_stamp, Q02_SQL),
    "q03_rename_projection": QuerySpec(q03_rename_projection, Q03_SQL),
    "q04_scd1_dedup": QuerySpec(q04_scd1_dedup, Q04_SQL),
    "q05_union_by_name": QuerySpec(q05_union_by_name, Q05_SQL),
    "q06_full_outer_coalesce": QuerySpec(q06_full_outer_coalesce, Q06_SQL),
    "q07_star_join": QuerySpec(q07_star_join, Q07_SQL),
    "q08_scd1_upsert": QuerySpec(q08_scd1_upsert, Q08_SQL),
    "q09_regex_filter": QuerySpec(q09_regex_filter, Q09_SQL),
    "q10_partition_scan": QuerySpec(q10_partition_scan, Q10_SQL),
    "q11_scalar_max": QuerySpec(q11_scalar_max, Q11_SQL),
    "q12_selectexpr_case": QuerySpec(q12_selectexpr_case, Q12_SQL),
}
