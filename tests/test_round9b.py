"""Round-9b operator pins: hard-negative mining, char-class census,
cross-source leakage, norm outliers.

Each test builds a tiny hand-checkable frame and asserts the exact
semantic the query family depends on -- same style as test_round9.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.similarity import (
    hard_negative_topk,
    l2_norm,
)
from bigdata_scala_offline_data_clean_spark.operators.text import (
    char_class_profile,
)


def test_hard_negative_excludes_same_label(spark):
    # q0 (label 0) is identical to n1 (label 0) and n2 (label 1): the
    # same-label twin must never appear; the cross-label twin ranks first.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),  # same label, cosine 1.0 -- excluded
        (2, [1.0, 0.0], 1),  # different label, cosine 1.0 -- rank 1
        (3, [0.0, 1.0], 1),  # orthogonal, rank 2
        (4, [-1.0, 0.0], 2),  # opposite, rank 3
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negative_topk(e, e.where("vec_id = 0"), k=10).collect()
    assert [r.n_id for r in out] == [2, 3, 4]
    assert all(r.n_label != r.q_label for r in out)
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine == 1.0


def test_hard_negative_k_and_tiebreak(spark):
    # four equal-cosine negatives: ties break on n_id ascending, k caps.
    rows = [(0, [1.0, 0.0], 0)] + [(i, [1.0, 0.0], 1) for i in range(1, 5)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negative_topk(e, e.where("vec_id = 0"), k=2).collect()
    assert [r.n_id for r in out] == [1, 2]


def test_char_class_counts_partition_text(spark):
    df = spark.createDataFrame(
        [(1, "ab1 2!"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in char_class_profile(df).collect()}
    r1 = out[1]
    assert (r1.n_alpha, r1.n_digit, r1.n_space, r1.n_other) == (2, 2, 1, 1)
    assert r1.n_alpha + r1.n_digit + r1.n_space + r1.n_other == r1.n_chars_cls
    r2 = out[2]
    assert (r2.n_chars_cls, r2.n_other) == (0, 0)


def test_l2_norm_matches_math(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    got = df.select(l2_norm(F.col("embedding")).alias("n")).first().n
    assert got == pytest.approx(5.0, abs=1e-12)


def test_cross_source_leakage_counts(spark):
    # "dup" appears in src_a and src_b (leaked); "solo" twice within src_a
    # only (NOT leaked -- same-source dups are a03's job, not leakage).
    rows = [
        (1, "dup", "src_a"),
        (2, "dup", "src_b"),
        (3, "solo", "src_a"),
        (4, "solo", "src_a"),
        (5, "only_b", "src_b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    h = d.select("source", F.md5(F.col("text")).alias("__h"))
    spread = h.groupBy("__h").agg(F.countDistinct("source").alias("ns"))
    per_src = (
        h.join(spread, "__h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("ns") >= 2, 1).otherwise(0)).alias("n_leaked"),
        )
        .collect()
    )
    got = {r.source: (r.n_docs, r.n_leaked) for r in per_src}
    assert got == {"src_a": (3, 1), "src_b": (2, 1)}


def test_norm_outlier_flagging(spark):
    # 9 unit vectors + one 100x whale: the whale is the only 3-MAD outlier.
    from bigdata_scala_offline_data_clean_spark.operators.ordering import (
        grouped_exact_percentiles,
    )

    rows = [(i, [1.0, float(i % 3) * 1e-3], 0) for i in range(9)]
    rows.append((9, [100.0, 0.0], 0))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).select("label", F.round(l2_norm(F.col("embedding")), 9).alias("norm"))
    med = grouped_exact_percentiles(e, ["label"], "norm", [0.5]).select(
        "label", F.col("value").alias("med")
    )
    dev = e.join(F.broadcast(med), "label").withColumn(
        "d", F.abs(F.col("norm") - F.col("med"))
    )
    mad = grouped_exact_percentiles(dev, ["label"], "d", [0.5]).select(
        "label", F.col("value").alias("mad")
    )
    out = (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_out")
        )
        .first()
    )
    assert out.n_out == 1


def test_m_estimate_shrinks_small_sources():
    # pure-math pin of the a167 smoothing rule: a 2-doc source with
    # perfect quality must rank below a 1000-doc source at 0.9 once the
    # m=50 prior (global mean ~0.5) shrinks it.
    m, prior = 50, 0.5
    small = (2 * 1.0 + m * prior) / (2 + m)
    large = (1000 * 0.9 + m * prior) / (1000 + m)
    assert small < large
    assert math.isclose(small, 27.0 / 52.0)


def test_waiting_suppliers_semantics(spark, tmp_path):
    # Order 1 (status F, 2 suppliers, only supplier 10 late)  -> counts.
    # Order 2 (status F, 2 suppliers, both late)              -> excluded
    #   (another supplier was also late).
    # Order 3 (status F, 1 supplier, late)                    -> excluded
    #   (single-supplier order).
    # Order 4 (status O, 2 suppliers, one late)               -> excluded
    #   (status filter).
    from bigdata_scala_offline_data_clean_spark.queries.round9b import (
        a170_waiting_suppliers,
    )

    sf = str(tmp_path)
    orders = spark.createDataFrame(
        [
            (1, "F", "2024-01-01 00:00:00"),
            (2, "F", "2024-01-01 00:00:00"),
            (3, "F", "2024-01-01 00:00:00"),
            (4, "O", "2024-01-01 00:00:00"),
        ],
        "o_orderkey long, o_orderstatus string, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_orderstatus", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate"
    )
    late, ontime = "2024-06-01 00:00:00", "2024-01-15 00:00:00"
    li = spark.createDataFrame(
        [
            (1, 10, late),
            (1, 11, ontime),
            (2, 10, late),
            (2, 12, late),
            (3, 13, late),
            (4, 10, late),
            (4, 14, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_suppkey", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
    )
    supp = spark.createDataFrame(
        [(i, f"S{i}") for i in (10, 11, 12, 13, 14)],
        "s_suppkey long, s_name string",
    )
    orders.write.parquet(f"{sf}/orders.parquet")
    li.write.parquet(f"{sf}/lineitem.parquet")
    supp.write.parquet(f"{sf}/supplier.parquet")
    out = {r.s_suppkey: r.numwait for r in a170_waiting_suppliers(spark, sf).collect()}
    assert out == {10: 1}


def test_decontamination_identical_vector_is_contaminated(spark):
    # eval vec 0 has an exact twin in train (vec 1): max_cos == 1.0 >= any
    # threshold; eval vec 20 is orthogonal to everything in train.
    from bigdata_scala_offline_data_clean_spark.operators.similarity import (
        l2_norm,
    )

    rows = [
        (0, [1.0, 0.0], 0),   # eval (0 % 20 == 0)
        (20, [0.0, 1.0], 1),  # eval, orthogonal to train vec below
        (1, [1.0, 0.0], 0),   # train twin of eval 0
        (2, [1.0, 0.0], 1),   # train
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    ev = e.where("vec_id % 20 = 0").select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    tr = e.where("vec_id % 20 != 0").select(
        F.col("embedding").alias("cv"), l2_norm(F.col("embedding")).alias("cn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    got = {
        r.q_id: r.mx
        for r in tr.crossJoin(F.broadcast(ev))
        .withColumn("cos", F.round(dot / (F.col("qn") * F.col("cn")), 6))
        .groupBy("q_id")
        .agg(F.max("cos").alias("mx"))
        .collect()
    }
    assert got[0] == 1.0
    assert got[20] == 0.0


def test_knn_majority_suspect_rule():
    # integer rule: 2 * n_disagree >= k flags a majority (k=5 -> 3+).
    k = 5
    assert not (2 * 2 >= k)
    assert 2 * 3 >= k


def test_entropy_l_stricter_than_distinct_l():
    # [99x v1, 1x v2, 1x v3]: 3 distinct values (distinct-3 passes) but
    # entropy well under log2(3) (entropy-3 fails) -- the c61 rationale.
    import math as m

    cnts, n = [99, 1, 1], 101
    ent = m.log2(n) - sum(c * m.log2(c) for c in cnts) / n
    assert len(cnts) >= 3
    assert ent < m.log2(3)


def test_tv_distance_includes_absent_values(spark):
    # group A holds only v0 while the global distribution is 50/50 over
    # {v0, v1}: TV must be 0.5 (|1-.5| + |0-.5| halved), which requires
    # counting the ABSENT v1 via the 1 - sum_present(p) identity.
    rows = [("A", 0), ("A", 0), ("B", 0), ("B", 1), ("B", 1), ("B", 0)]
    c = spark.createDataFrame(rows, "g string, v long")
    counts = c.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    gtot = counts.groupBy("g").agg(F.sum("cnt").alias("gn"))
    gv = counts.groupBy("v").agg(F.sum("cnt").alias("vcnt"))
    n = counts.agg(F.sum("cnt").alias("N"))
    j = (
        counts.join(gtot, "g")
        .join(F.broadcast(gv), "v")
        .crossJoin(F.broadcast(n))
    )
    pg, p = F.col("cnt") / F.col("gn"), F.col("vcnt") / F.col("N")
    out = {
        r.g: r.tv
        for r in j.groupBy("g")
        .agg(
            F.sum(F.round(F.abs(pg - p), 9).cast("decimal(28,9)")).alias("s1"),
            F.sum(F.round(p, 9).cast("decimal(28,9)")).alias("s2"),
        )
        .select(
            "g",
            F.round(
                0.5
                * (
                    F.col("s1").cast("double")
                    + (1.0 - F.col("s2").cast("double"))
                ),
                6,
            ).alias("tv"),
        )
        .collect()
    }
    # global p(v0)=2/3, p(v1)=1/3. A: |1 - 2/3| + |0 - 1/3| = 2/3 -> TV 1/3.
    # B: p_B(v0)=1/2 -> (|1/2-2/3| + |1/2-1/3|)/2 = 1/6.
    assert out["A"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["B"] == pytest.approx(1 / 6, abs=1e-6)


def test_dp_noise_is_deterministic_and_key_dependent(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round9b import (
        c63_dp_noisy_counts,
    )

    sf = "/root/testdata/sf0.001"
    a = {
        (r.c_nationkey, r.c_mktsegment): r.noisy_count
        for r in c63_dp_noisy_counts(spark, sf).collect()
    }
    b = {
        (r.c_nationkey, r.c_mktsegment): r.noisy_count
        for r in c63_dp_noisy_counts(spark, sf).collect()
    }
    assert a == b  # seeded, not drawn
    # noise actually varies across keys (not a constant offset)
    errs = {
        round(r.abs_error, 6)
        for r in c63_dp_noisy_counts(spark, sf).collect()
    }
    assert len(errs) > 1


def test_item_cf_cosine_and_support(spark, tmp_path):
    # baskets o1:{1,2}, o2:{1,2}, o3:{1,3}: pair (1,2) has co_count 2 and
    # sim 2/sqrt(pop1*pop2) = 2/sqrt(6); (1,3) dies on min support 2.
    from bigdata_scala_offline_data_clean_spark.queries.round9b import (
        a173_item_cf,
    )

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)],
        "l_orderkey long, l_partkey long",
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    out = a173_item_cf(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.co_count, r.pop_u, r.pop_v) == (1, 2, 2, 3, 2)
    assert r.cosine_sim == round(2 / (6 ** 0.5), 6)


def test_stream_dp_release_deterministic(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round9b import (
        s15_stream_dp_release,
    )

    sf = "/root/testdata/sf0.001"
    a = {r.event_type: r.noisy_count for r in s15_stream_dp_release(spark, sf).collect()}
    b = {r.event_type: r.noisy_count for r in s15_stream_dp_release(spark, sf).collect()}
    assert a == b
    t = {r.event_type: r.true_count for r in s15_stream_dp_release(spark, sf).collect()}
    assert all(a[k] != t[k] for k in t)  # noise is never exactly zero


def test_hard_negative_empty_query_batch(spark):
    e = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    assert hard_negative_topk(e, e.where("vec_id < 0"), k=3).count() == 0


def test_char_class_profile_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = char_class_profile(df)
    assert out.count() == 0
    assert {"n_chars_cls", "n_alpha", "n_digit", "n_space", "n_other"} <= set(
        out.columns
    )


def test_erasure_cascade_counts(spark, tmp_path):
    # subject 7: 1 customer row, 2 orders, 3 cascaded lineitems, 1 event;
    # customer 8 is untouched.
    from bigdata_scala_offline_data_clean_spark.queries.round9b import (
        c64_erasure_cascade_plan,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(7,), (8,)], "c_custkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(100, 7), (101, 7), (102, 8)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(100, 1), (100, 2), (101, 1), (102, 1)],
        "l_orderkey long, l_linenumber long",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 7), (2, 8), (3, 1007)], "event_id long, user_id long"
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.table_name: r.rows_to_erase
        for r in c64_erasure_cascade_plan(spark, sf).collect()
    }
    assert got == {
        "customer": 1,
        "orders": 2,
        "lineitem_cascade": 3,
        "events": 2,  # user 1007 also matches % 1000 == 7 -- the cohort rule
    }
