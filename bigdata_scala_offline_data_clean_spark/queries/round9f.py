"""Round-9f queries: the last three TPC-H shapes (Q11, Q12, Q16).

With these the registry covers all 22 TPC-H query SHAPES (round-9c/9d
added Q2/Q4-Q10/Q13-Q15/Q17-Q22; Q1/Q3 have been in since analytics.py).
As everywhere in this family, shapes are re-expressed over the driver
testdata schema -- there is no partsupp table, so the part<->supplier
"supply catalog" is derived as the DISTINCT (l_partkey, l_suppkey)
relation, exactly as a174 (Q2 shape) already does:

a188 important parts (Q11: group-sum HAVING against a global
scalar-subquery fraction -- the only TPC-H shape where the HAVING
comparator is a scalar over the SAME aggregate), a189 priority line
counts (Q12: fact-fact equi-join + CASE-conditional counts per group
over an anchored trailing window), a190 supplier-relation census (Q16:
COUNT(DISTINCT) over a derived relation with a NOT-IN exclusion
subquery; the "customer complaints" comment filter has no comment
column here, so the exclusion stand-in is s_acctbal < 3000 --
deterministic and non-empty at sf0.01).

Scale notes: a188's threshold compare is exact-decimal on BOTH sides
(``val * 1000 > total`` -- no IEEE boundary row can flip between
engines); a189's lineitem-orders join shuffles both facts on
l_orderkey/o_orderkey (the canonical co-partitioned Q12 plan -- orders
is NOT broadcast, it scales with lineitem); a190's exclusion is a
broadcast LEFT ANTI against the supplier dim and its part filters are
applied to the dim BEFORE the fact join so the scan prunes.  Floats
follow the repo rule: decimal-exact sums, cast to double only on output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# a188 -- TPC-H Q11 shape: parts whose supply value within one region
# exceeds a fixed fraction of the region's total supply value.  Value is
# extendedprice * quantity (the ps_supplycost * ps_availqty analog on
# the derived catalog).  The HAVING is a scalar subquery over the same
# aggregate; both sides stay exact decimal (val*1000 > total), so no
# borderline row can disagree between Spark and DuckDB.
# ---------------------------------------------------------------------------

_A188_REGION = 0  # r_regionkey filter (region names are REGION_<k>)
_A188_FRAC_INV = 1000  # part kept iff val > total / 1000


def a188_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    val = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .where(F.col("n_regionkey") == _A188_REGION)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("__val"))
    )
    total = per_part.agg(F.sum("__val").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__val") * F.lit(_A188_FRAC_INV) > F.col("__total"))
        .select(
            "l_partkey",
            F.col("__val").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_A188_VAL_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_quantity AS DECIMAL(18,2))"
)

A188_SQL = f"""
WITH v AS (
  SELECT l_partkey, SUM({_A188_VAL_SQL}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = {_A188_REGION}
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val * {_A188_FRAC_INV} > (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, l_partkey
"""

QUERIES["a188_important_parts"] = QuerySpec(a188_important_parts, A188_SQL)


# ---------------------------------------------------------------------------
# a189 -- TPC-H Q12 shape: per-group CASE-conditional order-priority
# counts over a trailing 1-year window anchored at max(l_shipdate) (the
# a59/a178 anchoring pattern).  The testdata has no l_shipmode, so the
# group is l_returnflag.  lineitem JOIN orders is the canonical
# co-partitioned fact-fact shuffle on the order key -- orders grows with
# lineitem and must NOT be broadcast.
# ---------------------------------------------------------------------------

_A189_HIGH = ("1-URGENT", "2-HIGH")


def a189_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    mx = li.agg(F.max("l_shipdate").alias("__mx"))
    high = F.col("o_orderpriority").isin(*_A189_HIGH).cast("bigint")
    return (
        li.crossJoin(F.broadcast(mx))
        .where(
            F.col("l_shipdate") >= F.col("__mx") - F.expr("INTERVAL 365 DAYS")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


A189_SQL = f"""
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('{_A189_HIGH[0]}', '{_A189_HIGH[1]}')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('{_A189_HIGH[0]}', '{_A189_HIGH[1]}')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= (SELECT max(l_shipdate) FROM lineitem)
                    - INTERVAL 365 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

QUERIES["a189_priority_line_counts"] = QuerySpec(
    a189_priority_line_counts, A189_SQL
)


# ---------------------------------------------------------------------------
# a190 -- TPC-H Q16 shape: how many distinct suppliers can supply parts
# of each (brand, type, size), over the derived DISTINCT
# (l_partkey, l_suppkey) relation, excluding a supplier blocklist via
# NOT IN (here: s_acctbal < 3000 -- the comment-LIKE stand-in).  Spark
# runs the exclusion as a broadcast LEFT ANTI (same semantics:
# s_suppkey is never NULL); part filters are pushed onto the dim before
# the fact join.
# ---------------------------------------------------------------------------

_A190_BAD_BAL = 3000
_A190_EXCL_BRAND = "Brand#13"
_A190_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def a190_supplier_relation_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.where(F.col("s_acctbal") < _A190_BAD_BAL).select("s_suppkey")
    p_keep = p.where(
        (F.col("p_brand") != _A190_EXCL_BRAND)
        & F.col("p_size").isin(*_A190_SIZES)
    )
    return (
        ps.join(
            F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p_keep), ps.l_partkey == p_keep.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


A190_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < {_A190_BAD_BAL})
  AND p_brand <> '{_A190_EXCL_BRAND}'
  AND p_size IN {_A190_SIZES}
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

QUERIES["a190_supplier_relation_census"] = QuerySpec(
    a190_supplier_relation_census, A190_SQL
)
