"""Round-9c pins: the TPC-H-shape batch (a174-a179) + BM25 (a180).

Tiny hand-checkable frames, asserting the exact semantic each shape
exists for -- the min-equality winner set (Q2/Q15), the zero-order
bucket Q13's LEFT join preserves, the CASE-share arithmetic (Q8/Q14),
and the BM25 length normalization that distinguishes it from TF-IDF.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.text import bm25_top_terms


def test_bm25_matches_closed_form(spark):
    # two docs: "a a b" (dl=3) and "a c" (dl=2); N=2, avgdl=2.5.
    # df(a)=2, df(b)=df(c)=1.  k1=1.2, b=0.75.
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.term): r
        for r in bm25_top_terms(docs, k=10, k1=1.2, b=0.75).collect()
    }

    def idf(df_t, n=2):
        return round(math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0), 9)

    def tfc(tf, dl, avgdl=2.5, k1=1.2, b=0.75):
        return tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

    assert out[(1, "a")].tf == 2 and out[(1, "a")].dl == 3
    assert out[(1, "a")].bm25 == pytest.approx(
        round(idf(2) * tfc(2, 3), 6), abs=1e-9
    )
    assert out[(1, "b")].bm25 == pytest.approx(
        round(idf(1) * tfc(1, 3), 6), abs=1e-9
    )
    assert out[(2, "c")].bm25 == pytest.approx(
        round(idf(1) * tfc(1, 2), 6), abs=1e-9
    )
    # length normalization: same (tf=1, df=1) term scores HIGHER in the
    # shorter doc -- the property TF-IDF lacks
    assert out[(2, "c")].bm25 > out[(1, "b")].bm25


def test_bm25_rank_is_per_doc_and_capped(spark):
    docs = spark.createDataFrame(
        [(1, "x y z w v"), (2, "x")], "doc_id long, text string"
    )
    out = bm25_top_terms(docs, k=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    assert sorted(by_doc[1]) == [1, 2, 3]  # capped at k=3 of 5 terms
    assert sorted(by_doc[2]) == [1]


def test_custdist_left_join_keeps_zero_order_customers(spark, tmp_path):
    # Q13's defining property: customers with NO surviving order appear
    # in the c_count = 0 bucket.
    from bigdata_scala_offline_data_clean_spark.queries.round9c import (
        a177_custdist,
    )

    _write_mini_warehouse(spark, tmp_path)
    out = {r.c_count: r.custdist for r in a177_custdist(spark, str(tmp_path)).collect()}
    # cust 1: two kept orders; cust 2: only an URGENT order (filtered ->
    # bucket 0); cust 3: no orders at all (bucket 0)
    assert out == {2: 1, 0: 2}


def test_top_supplier_ties_all_surface(spark, tmp_path):
    # Q15's winner set is by exact-decimal equality with the max: two
    # suppliers with identical revenue must BOTH appear.
    from bigdata_scala_offline_data_clean_spark.queries.round9c import (
        a178_top_supplier,
    )

    _write_mini_warehouse(spark, tmp_path)
    out = a178_top_supplier(spark, str(tmp_path)).collect()
    assert [r.s_suppkey for r in out] == [1, 2]
    assert out[0].total_revenue == out[1].total_revenue == 100.0


def test_min_cost_supplier_equality_winner_set(spark, tmp_path):
    # Q2's winner is every supplier achieving the per-part min cost --
    # exact decimal equality, ties included.
    from bigdata_scala_offline_data_clean_spark.queries.round9c import (
        a174_min_cost_supplier,
    )

    _write_mini_warehouse(spark, tmp_path)
    out = a174_min_cost_supplier(spark, str(tmp_path)).collect()
    # part 1: supplier 1 at 50.00 and supplier 2 at 50.00 tie; supplier 3
    # (100.00) loses.  Both winners are EUROPE suppliers.
    got = {(r.p_partkey, r.s_name) for r in out}
    assert got == {(1, "S1"), (1, "S2")}
    assert all(r.supply_cost == 50.0 for r in out)


def _write_mini_warehouse(spark, tmp_path) -> None:
    """Minimal parquet warehouse with the columns round9c queries touch."""
    base = str(tmp_path)
    spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    ).write.mode("overwrite").parquet(f"{base}/region.parquet")
    spark.createDataFrame(
        [(0, "NATION_3", 0), (1, "NATION_8", 0), (2, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.mode("overwrite").parquet(f"{base}/nation.parquet")
    spark.createDataFrame(
        [
            (1, "S1", 0, 10.0),
            (2, "S2", 1, 20.0),
            (3, "S3", 2, 30.0),
        ],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.mode("overwrite").parquet(f"{base}/supplier.parquet")
    spark.createDataFrame(
        [
            (1, "C1", 0, 5.0, "BUILDING"),
            (2, "C2", 1, 5.0, "BUILDING"),
            (3, "C3", 2, 5.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{base}/customer.parquet")
    spark.createDataFrame(
        [(1, "small ring", "B1", "STANDARD", 10, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{base}/part.parquet")
    # orders: timestamps as ns-longs (the driver testdata layout is
    # TIMESTAMP(NANOS); load_table reads ns-long -> us).  Plain parquet
    # written from Spark stores timestamp[us], which load_table also
    # accepts -- use timestamps directly for simplicity.
    spark.sql(
        """
        SELECT * FROM VALUES
          (101, CAST(1 AS BIGINT), 'O', 10.0,
           TIMESTAMP '2001-01-01 00:00:00', '5-LOW'),
          (102, CAST(1 AS BIGINT), 'O', 10.0,
           TIMESTAMP '2001-01-02 00:00:00', '5-LOW'),
          (103, CAST(2 AS BIGINT), 'O', 10.0,
           TIMESTAMP '2001-01-03 00:00:00', '1-URGENT')
        AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority)
        """
    ).write.mode("overwrite").parquet(f"{base}/orders.parquet")
    # lineitem: suppliers 1 and 2 tie at 100.00 revenue inside the
    # trailing-90-day window; supplier 3 ships earlier (outside).
    # For a174: part 1 costs 50.00 via s1 and s2, 100.00 via s3.
    spark.sql(
        """
        SELECT * FROM VALUES
          (101, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 1.0, 100.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (102, CAST(1 AS BIGINT), CAST(2 AS BIGINT), 1, 1.0, 100.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2001-06-10 00:00:00'),
          (103, CAST(1 AS BIGINT), CAST(3 AS BIGINT), 1, 1.0, 100.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2000-01-01 00:00:00'),
          (101, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 2, 1.0, 50.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2000-06-01 00:00:00'),
          (102, CAST(1 AS BIGINT), CAST(2 AS BIGINT), 2, 1.0, 50.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2000-06-10 00:00:00')
        AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate)
        """
    ).write.mode("overwrite").parquet(f"{base}/lineitem.parquet")
