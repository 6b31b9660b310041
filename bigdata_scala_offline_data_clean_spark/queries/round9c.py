"""Round-9c queries: the classic decision-support shapes the registry was
still missing, mapped onto the driver testdata schema.

TPC-H is the public benchmark every warehouse engine (including the
reference's Hive/Spark deployment model) is exercised against; six of its
query SHAPES had no counterpart here yet.  The testdata has no partsupp /
p_mfgr / o_comment columns, so each shape is re-expressed faithfully over
what exists (noted per query):

a174 min-cost supplier (Q2: correlated-min over a supply catalog -- the
catalog is derived as min lineitem price per (part, supplier), the min is
decimal-exact so the equality join both engines do is bit-safe), a175
bilateral shipping volume (Q7: two nation roles on one fact row, both
directions of one nation pair, revenue per ship-year), a176 market share
(Q8: target-nation revenue share within a region per order-year --
CASE-sum over total-sum, both exact decimal before one IEEE division),
a177 customer order-count distribution (Q13: LEFT join so zero-order
customers survive, then a distribution over the counts), a178 top
supplier (Q15: revenue over a max-anchored trailing window, winners by
exact-decimal equality with the max -- no LIMIT, ties all surface), a179
promo revenue share (Q14: CASE-share per ship-month, p_type='PROMO' is a
real category in the testdata), a180 BM25 top terms (Okapi BM25 --
retrieval-grade keyword extraction for training-data curation; the
length-normalized upgrade of a50's TF-IDF).

Scale notes: every dimension join broadcasts (region/nation always;
part/supplier/customer prune first where the shape filters them); facts
never self-join; tops are TakeOrdered-bounded or exact-equality-bounded;
the only windows are per-doc (a180) -- nothing data-sized and
unpartitioned.  Floats follow the repo rule (``_util`` docstring):
decimal-exact sums, one final IEEE op, ``round(., 6)``.
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
# a174 -- TPC-H Q2 shape: min-cost supplier per part within a region.
# The supply catalog (partsupp stand-in) is min(extendedprice) per
# (l_partkey, l_suppkey): decimal-exact, so "cost == per-part min" is a
# bit-safe equality in both engines.  Part filter prunes the catalog
# BEFORE the per-part min (the min is per part, so pruning parts first
# never changes it); region prunes suppliers before the catalog join.
# Plan: catalog groupBy is the one fact-sized shuffle; part / supplier /
# nation / region all broadcast; top-100 is TakeOrdered-bounded with a
# total order (catalog keys are unique per (part, supplier)).
# ---------------------------------------------------------------------------


def a174_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    parts = p.where(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_name"
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    catalog = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
    )
    from pyspark.sql import Window

    sc = catalog.join(F.broadcast(eu_supp), catalog.l_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("p_partkey")
    return (
        sc.withColumn("__min_cost", F.min("supply_cost").over(w))
        .where(F.col("supply_cost") == F.col("__min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


A174_SQL = """
WITH catalog AS (
  SELECT p_partkey, p_name, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD'
  GROUP BY p_partkey, p_name, l_suppkey
), sc AS (
  SELECT c.*, s_acctbal, s_name, n_name
  FROM catalog c
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM sc
WHERE supply_cost = (
  SELECT MIN(sc2.supply_cost) FROM sc sc2 WHERE sc2.p_partkey = sc.p_partkey
)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""

QUERIES["a174_min_cost_supplier"] = QuerySpec(a174_min_cost_supplier, A174_SQL)


# ---------------------------------------------------------------------------
# a175 -- TPC-H Q7 shape: bilateral shipping volume between one nation
# pair, by ship-year.  The two-name nation slice broadcasts onto supplier
# and customer FIRST, so the fact joins are semi-filtering (only rows
# touching the pair survive the first join); the cross-pair OR is applied
# on the two role columns after both joins.
# ---------------------------------------------------------------------------

_A175_N1, _A175_N2 = "NATION_3", "NATION_8"


def a175_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    pair = n.where(F.col("n_name").isin(_A175_N1, _A175_N2))
    supp = s.join(F.broadcast(pair), s.s_nationkey == pair.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(pair), c.c_nationkey == pair.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .where(
            (
                (F.col("supp_nation") == _A175_N1)
                & (F.col("cust_nation") == _A175_N2)
            )
            | (
                (F.col("supp_nation") == _A175_N2)
                & (F.col("cust_nation") == _A175_N1)
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


A175_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{_A175_N1}' AND n2.n_name = '{_A175_N2}')
   OR (n1.n_name = '{_A175_N2}' AND n2.n_name = '{_A175_N1}')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["a175_volume_shipping"] = QuerySpec(a175_volume_shipping, A175_SQL)


# ---------------------------------------------------------------------------
# a176 -- TPC-H Q8 shape: market share of one supplier nation within one
# customer region, per order-year, over one part type.  Numerator and
# denominator are the same exact-decimal sum (CASE-gated vs not); the one
# IEEE division happens after both, then round(6).  Part filter prunes
# the fact first (broadcast); the ASIA customer slice broadcasts too.
# ---------------------------------------------------------------------------

_A176_REGION, _A176_NATION, _A176_TYPE = "ASIA", "NATION_2", "ECONOMY"


def a176_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")

    parts = p.where(F.col("p_type") == _A176_TYPE).select("p_partkey")
    region_nations = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == _A176_REGION)
        .select("n_nationkey")
    )
    cust = c.join(
        F.broadcast(region_nations), c.c_nationkey == region_nations.n_nationkey
    ).select("c_custkey")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,2)") * F.lit(0).cast("decimal(18,2)")
    target = F.when(F.col("supp_nation") == _A176_NATION, _rev()).otherwise(zero)
    per_year = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target).alias("__tgt"),
            F.sum(_rev()).alias("__tot"),
        )
    )
    return per_year.select(
        "o_year",
        F.round(
            F.col("__tgt").cast("double") / F.col("__tot").cast("double"), 6
        ).alias("mkt_share"),
        F.col("__tgt").cast("double").alias("target_revenue"),
        F.col("__tot").cast("double").alias("total_revenue"),
    ).orderBy("o_year")


A176_SQL = f"""
WITH per_year AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         SUM(CASE WHEN n2.n_name = '{_A176_NATION}' THEN {_REV_SQL}
                  ELSE CAST(0 AS DECIMAL(18,2)) * CAST(0 AS DECIMAL(18,2))
             END) AS tgt,
         SUM({_REV_SQL}) AS tot
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{_A176_REGION}' AND p_type = '{_A176_TYPE}'
  GROUP BY 1
)
SELECT o_year,
       round(CAST(tgt AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS mkt_share,
       CAST(tgt AS DOUBLE) AS target_revenue,
       CAST(tot AS DOUBLE) AS total_revenue
FROM per_year
ORDER BY o_year
"""

QUERIES["a176_market_share"] = QuerySpec(a176_market_share, A176_SQL)


# ---------------------------------------------------------------------------
# a177 -- TPC-H Q13 shape: distribution of per-customer order counts.
# LEFT join so zero-order customers land in the c_count = 0 bucket (the
# whole point of Q13); the priority filter stands in for Q13's comment
# NOT LIKE (the testdata has no o_comment).  count("o_orderkey") counts
# only matched rows, exactly like the SQL COUNT(o_orderkey).
# ---------------------------------------------------------------------------


def a177_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    kept = o.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(kept, c.c_custkey == kept.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


A177_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

QUERIES["a177_custdist"] = QuerySpec(a177_custdist, A177_SQL)


# ---------------------------------------------------------------------------
# a178 -- TPC-H Q15 shape: top supplier(s) by revenue over the trailing
# 90 days, anchored at max(l_shipdate) (the a59 anchoring pattern -- the
# testdata has no fixed quarter boundary).  Winner-by-equality against
# the broadcast max of exact decimals: ties all surface, no LIMIT.
# ---------------------------------------------------------------------------


def a178_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    mx = li.agg(F.max("l_shipdate").alias("__mx"))
    rev = (
        li.crossJoin(F.broadcast(mx))
        .where(F.col("l_shipdate") >= F.col("__mx") - F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("__rev"))
    )
    best = rev.agg(F.max("__rev").alias("__best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .where(F.col("__rev") == F.col("__best"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


A178_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS r
  FROM lineitem
  WHERE l_shipdate >= (SELECT max(l_shipdate) FROM lineitem)
                      - INTERVAL 90 DAY
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
ORDER BY s_suppkey
"""

QUERIES["a178_top_supplier"] = QuerySpec(a178_top_supplier, A178_SQL)


# ---------------------------------------------------------------------------
# a179 -- TPC-H Q14 shape: promo revenue share per ship-month.  The
# testdata's p_type really has a 'PROMO' category, so the CASE is
# literal Q14.  One broadcast part join, one month agg; share = one IEEE
# division over two exact-decimal sums.
# ---------------------------------------------------------------------------


def a179_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)") * F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    per_month = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
                "ship_month"
            )
        )
        .agg(F.sum(promo).alias("__promo"), F.sum(_rev()).alias("__tot"))
    )
    return per_month.select(
        "ship_month",
        F.round(
            F.lit(100.0)
            * F.col("__promo").cast("double")
            / F.col("__tot").cast("double"),
            6,
        ).alias("promo_share"),
        F.col("__promo").cast("double").alias("promo_revenue"),
        F.col("__tot").cast("double").alias("total_revenue"),
    ).orderBy("ship_month")


A179_SQL = f"""
WITH per_month AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
         SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                  ELSE CAST(0 AS DECIMAL(18,2)) * CAST(0 AS DECIMAL(18,2))
             END) AS promo,
         SUM({_REV_SQL}) AS tot
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT ship_month,
       round(100.0 * CAST(promo AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS promo_share,
       CAST(promo AS DOUBLE) AS promo_revenue,
       CAST(tot AS DOUBLE) AS total_revenue
FROM per_month
ORDER BY ship_month
"""

QUERIES["a179_promo_share"] = QuerySpec(a179_promo_share, A179_SQL)


# ---------------------------------------------------------------------------
# a180 -- Okapi BM25 top terms per document (operators/text.bm25_top_terms):
# the length-normalized retrieval score a curation pipeline uses for
# keyword extraction / query-relevance labeling.  Same shuffle shape as
# a50 TF-IDF plus the broadcast corpus-scalar frame.
# ---------------------------------------------------------------------------

_A180_K1, _A180_B = 1.2, 0.75


def a180_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_top_terms

    d = load_table(spark, sf_dir, "documents")
    return bm25_top_terms(d, k=5, k1=_A180_K1, b=_A180_B)


A180_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tl FROM documents
), corpus AS (
  SELECT COUNT(*) AS nd, SUM(len(tl)) AS sumdl FROM toks
), tf AS (
  SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM toks
), tfc AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM tf GROUP BY ALL
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS dft FROM tfc GROUP BY term
), scored AS (
  SELECT t.doc_id, t.term, t.tf, t.dl,
         round(ln((CAST(nd AS DOUBLE) - dft + 0.5) / (dft + 0.5) + 1.0), 9)
         * (CAST(t.tf AS DOUBLE) * CAST({_A180_K1} + 1.0 AS DOUBLE))
           / (t.tf + {_A180_K1} * ((1.0 - {_A180_B})
              + {_A180_B} * t.dl / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE))))
           AS score
  FROM tfc t JOIN dfreq USING (term), corpus
), ranked AS (
  SELECT doc_id, term, tf, dl, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
       round(score, 6) AS bm25, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""

QUERIES["a180_bm25_topk"] = QuerySpec(a180_bm25_topk, A180_SQL)
