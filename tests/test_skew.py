"""Skew-mitigation helpers: salted aggregation and salted join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (0) with 10k rows, 10 cold keys with 10 each
    hot = spark.range(10_000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(100).select(
        (F.col("id") % 10 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.s, r.c, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.c, r.mx)
        for r in salted_aggregate(
            skewed, ["k"], {"s": "sum:v", "c": "count:*", "mx": "max:v"}, buckets=8
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(spark, skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": "median:v"})


def test_salted_aggregate_salt_cols_deterministic(spark, skewed):
    a = salted_aggregate(skewed, ["k"], {"s": "sum:v"}, buckets=4, salt_cols=["v"])
    b = salted_aggregate(skewed, ["k"], {"s": "sum:v"}, buckets=4, salt_cols=["v"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(11)], ["k", "name"]
    )
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = {r.k: r.name for r in salted_join(big, dim, "k", how="left").collect()}
    assert out == {1: "one", 99: None}
