"""Round-9d queries: five more classic decision-support shapes (TPC-H
Q4/Q6/Q9/Q10/Q19 re-expressed over the testdata schema) plus positional
boilerplate detection for the curation side.

a181 late-order priority census (Q4: EXISTS against a late-shipment
lineitem decorrelates to a semi join with a compound equi + range
condition, then a quarter x priority rollup), a182 disjunctive band
revenue (Q19: three OR'd brand/size/quantity bands -- the disjunction
stresses predicate pushdown and stays one broadcast join + one scan),
a183 returned-item top customers (Q10: returnflag slice -> customer
rollup -> top-20 TakeOrdered with a total-order tie-break), a184
discount-band revenue forecast (Q6: pure scan-side band filters, scalar
agg -- the pushdown showcase), a185 product profit by supplier nation x
order year (Q9: profit = revenue - retailprice*quantity, all exact
decimal), a186 positional boilerplate (most frequent FIRST and LAST
token per source with its share -- the template/boilerplate screen a
crawl-curation pipeline runs; both ends via one union'd agg).

Scale notes: dims broadcast, facts scan once per query, tops are
TakeOrdered-bounded, the only window (a186 mode pick) is partitioned by
(source, position).  Floats follow the repo rule: decimal-exact sums,
IEEE division last, ``round(., 6)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import REV_SQL as _REV_SQL
from ._util import dec2 as _dec
from ._util import load_table
from ._util import rev_term as _rev

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# a181 -- TPC-H Q4 shape: orders with at least one LATE lineitem
# (shipped > 60 days after the order date), counted per order-quarter x
# priority.  The EXISTS decorrelates to a LEFT SEMI hash join on
# l_orderkey with the lateness range as a residual condition -- one scan
# of each table, no per-row rescan.
# ---------------------------------------------------------------------------


def a181_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(
            F.date_format(
                F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd"
            ).alias("order_quarter"),
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("order_quarter", "o_orderpriority")
    )


A181_SQL = """
SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
         AS order_quarter,
       o_orderpriority,
       count(*) AS n_late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["a181_late_order_priority"] = QuerySpec(
    a181_late_order_priority, A181_SQL
)


# ---------------------------------------------------------------------------
# a182 -- TPC-H Q19 shape: revenue from three OR'd (brand, size band,
# quantity band) slices.  One broadcast part join; the disjunction is a
# single residual filter -- Catalyst can still push the common
# l_quantity range bound to the scan while the per-brand arms evaluate
# post-join.
# ---------------------------------------------------------------------------

_A182_ARMS = (
    ("Brand#1", 1, 10, 1, 20),
    ("Brand#2", 11, 20, 10, 30),
    ("Brand#3", 21, 30, 20, 40),
)


def a182_disjunctive_band_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = None
    for brand, s_lo, s_hi, q_lo, q_hi in _A182_ARMS:
        cond = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        arm = cond if arm is None else (arm | cond)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(arm)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _a182_arm_sql(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> str:
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
    )


A182_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(_a182_arm_sql(*arm) for arm in _A182_ARMS)}
"""

QUERIES["a182_disjunctive_band_revenue"] = QuerySpec(
    a182_disjunctive_band_revenue, A182_SQL
)


# ---------------------------------------------------------------------------
# a183 -- TPC-H Q10 shape: top 20 customers by revenue lost to returns
# (l_returnflag = 'R'), with nation context.  The returnflag slice
# filters the fact first; nation broadcasts; top-20 is TakeOrdered with
# c_custkey as the total-order tie-break.
# ---------------------------------------------------------------------------


def a183_returned_top_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_rev()).cast("double").alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


A183_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS lost_revenue,
       count(*) AS n_returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""

QUERIES["a183_returned_top_customers"] = QuerySpec(
    a183_returned_top_customers, A183_SQL
)


# ---------------------------------------------------------------------------
# a184 -- TPC-H Q6 shape: forecast revenue delta from a discount band x
# quantity band x trailing-year slice.  Pure scan-side filters + scalar
# agg: the discount/quantity bands push to the parquet scan; the date
# band anchors at max(l_shipdate) (broadcast 1-row frame, the a59/a178
# pattern).  sum(extendedprice * discount) is the exact-decimal delta.
# ---------------------------------------------------------------------------


def a184_discount_band_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_shipdate").alias("__mx"))
    delta = F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double")
    return (
        li.where(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .crossJoin(F.broadcast(mx))
        .where(
            F.col("l_shipdate") >= F.col("__mx") - F.expr("INTERVAL 365 DAYS")
        )
        .agg(
            delta.alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


A184_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue_delta,
       count(*) AS n_items
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
  AND l_shipdate >= (SELECT max(l_shipdate) FROM lineitem)
                    - INTERVAL 365 DAY
"""

QUERIES["a184_discount_band_revenue"] = QuerySpec(
    a184_discount_band_revenue, A184_SQL
)


# ---------------------------------------------------------------------------
# a185 -- TPC-H Q9 shape: product profit per supplier nation x order
# year over one part-name slice.  Profit = revenue - retailprice *
# quantity, every term exact decimal (the testdata has no
# ps_supplycost; p_retailprice is the cost stand-in).  Part slice and
# nation broadcast; orders joins for the year.
# ---------------------------------------------------------------------------


def a185_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    parts = p.where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.sum(
        _rev() - _dec("p_retailprice") * _dec("l_quantity")
    ).cast("double")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(profit.alias("profit"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("supp_nation", F.desc("o_year"))
    )


A185_SQL = f"""
SELECT n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM({_REV_SQL}
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
       count(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY supp_nation, o_year DESC
"""

QUERIES["a185_product_profit"] = QuerySpec(a185_product_profit, A185_SQL)


# ---------------------------------------------------------------------------
# a186 -- positional boilerplate: the most frequent FIRST and LAST token
# per source, with its share of the source's documents.  A high share
# means templated scaffolding (headers/footers) -- the cheap screen a
# crawl pipeline runs before boilerplate stripping.  One union'd token
# agg; the mode pick is a (source, position)-partitioned top-1 window
# (WindowGroupLimit prunes before the sort).
# ---------------------------------------------------------------------------


def a186_positional_boilerplate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.split("text", " ").alias("__tl"))
    first = toks.select(
        "source",
        F.lit("first").alias("position"),
        F.element_at("__tl", 1).alias("token"),
    )
    last = toks.select(
        "source",
        F.lit("last").alias("position"),
        F.element_at("__tl", -1).alias("token"),
    )
    counts = (
        first.unionByName(last)
        .groupBy("source", "position", "token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("__tot"))
    w = Window.partitionBy("source", "position").orderBy(
        F.desc("n_docs"), F.asc("token")
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "position",
            "token",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("__tot").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("source", "position")
    )


A186_SQL = """
WITH toks AS (
  SELECT source, string_split(text, ' ') AS tl FROM documents
), ends AS (
  SELECT source, 'first' AS position, tl[1] AS token FROM toks
  UNION ALL
  SELECT source, 'last' AS position, tl[-1] AS token FROM toks
), counts AS (
  SELECT source, position, token, count(*) AS n_docs
  FROM ends GROUP BY ALL
), totals AS (
  SELECT source, count(*) AS tot FROM documents GROUP BY source
), ranked AS (
  SELECT source, position, token, n_docs,
         row_number() OVER (PARTITION BY source, position
                            ORDER BY n_docs DESC, token) AS rn
  FROM counts
)
SELECT r.source, r.position, r.token, r.n_docs,
       round(CAST(r.n_docs AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM ranked r JOIN totals t ON r.source = t.source
WHERE rn = 1
ORDER BY r.source, r.position
"""

QUERIES["a186_positional_boilerplate"] = QuerySpec(
    a186_positional_boilerplate, A186_SQL
)
