"""Round-9d pins: Q4 lateness boundary, Q19 band arms, Q6 band edges,
and the positional-boilerplate mode pick.

Tiny hand-checkable frames (the shared mini-warehouse from
test_round9c), asserting each shape's defining semantic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_round9c import _write_mini_warehouse


def test_late_order_priority_boundary(spark, tmp_path):
    # Exactly-60-days is NOT late (strict >); order 103 has no lineitem.
    from bigdata_scala_offline_data_clean_spark.queries.round9d import (
        a181_late_order_priority,
    )

    _write_mini_warehouse(spark, tmp_path)
    out = a181_late_order_priority(spark, str(tmp_path)).collect()
    # mini warehouse: order 101 (2001-01-01) has lineitems shipped
    # 2001-06-01 (late) and 2000-06-01 (early -- before the order, not
    # late); order 102 (2001-01-02) shipped 2001-06-10 (late); order 103
    # has no lineitem rows -> can't be late.
    assert {(r.order_quarter, r.o_orderpriority, r.n_late_orders) for r in out} == {
        ("2001-01-01", "5-LOW", 2)
    }


def test_positional_boilerplate_mode_and_share(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.queries.round9d import (
        a186_positional_boilerplate,
    )

    base = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "hello world end", "en", "s1", 10),
            (2, "hello again stop", "en", "s1", 10),
            (3, "bye now end", "en", "s1", 10),
            (4, "solo", "en", "s2", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    out = {
        (r.source, r.position): r
        for r in a186_positional_boilerplate(spark, base).collect()
    }
    # s1: first tokens hello/hello/bye -> mode 'hello' share 2/3;
    # last tokens end/stop/end -> mode 'end' share 2/3.
    assert out[("s1", "first")].token == "hello"
    assert out[("s1", "first")].n_docs == 2
    assert abs(out[("s1", "first")].share - round(2 / 3, 6)) < 1e-9
    assert out[("s1", "last")].token == "end"
    # single-token doc: first == last == the token, share 1.0
    assert out[("s2", "first")].token == "solo"
    assert out[("s2", "last")].token == "solo"
    assert out[("s2", "last")].share == 1.0


def test_disjunctive_bands_are_exclusive_or(spark, tmp_path):
    # A lineitem matching brand of arm 1 but quantity of arm 2 must NOT
    # count: the arms are conjunctions, the disjunction is across arms.
    from bigdata_scala_offline_data_clean_spark.queries.round9d import (
        a182_disjunctive_band_revenue,
    )

    base = str(tmp_path)
    _write_mini_warehouse(spark, tmp_path)
    spark.createDataFrame(
        [
            (1, "p1", "Brand#1", "STANDARD", 5, 1.0),
            (2, "p2", "Brand#2", "STANDARD", 15, 1.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{base}/part.parquet")
    spark.sql(
        """
        SELECT * FROM VALUES
          (1, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 10.0, 100.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (2, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 2, 25.0, 100.0, 0.0,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (3, CAST(2 AS BIGINT), CAST(1 AS BIGINT), 1, 25.0, 200.0, 0.5,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00')
        AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate)
        """
    ).write.mode("overwrite").parquet(f"{base}/lineitem.parquet")
    row = a182_disjunctive_band_revenue(spark, base).first()
    # row 1: Brand#1, size 5 in [1,10], qty 10 in [1,20] -> in, rev 100.
    # row 2: Brand#1 arm needs qty<=20 (25 fails); Brand#2 arm needs
    #        Brand#2 -> out.
    # row 3: Brand#2, size 15 in [11,20], qty 25 in [10,30] -> in,
    #        rev 200*(1-0.5)=100.
    assert row.n_items == 2
    assert row.revenue == 200.0


def test_discount_band_edges_inclusive(spark, tmp_path):
    # BETWEEN is inclusive on both discount edges; qty < 24 is strict.
    from bigdata_scala_offline_data_clean_spark.queries.round9d import (
        a184_discount_band_revenue,
    )

    base = str(tmp_path)
    _write_mini_warehouse(spark, tmp_path)
    spark.sql(
        """
        SELECT * FROM VALUES
          (1, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 10.0, 100.0, 0.05,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (2, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 10.0, 100.0, 0.07,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (3, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 10.0, 100.0, 0.08,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00'),
          (4, CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, 24.0, 100.0, 0.06,
           0.0, 'N', 'O', TIMESTAMP '2001-06-01 00:00:00')
        AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate)
        """
    ).write.mode("overwrite").parquet(f"{base}/lineitem.parquet")
    row = a184_discount_band_revenue(spark, base).first()
    # rows 1 (0.05) and 2 (0.07) are in; 3 (0.08) out; 4 (qty 24) out.
    assert row.n_items == 2
    assert row.revenue_delta == 100.0 * 0.05 + 100.0 * 0.07
