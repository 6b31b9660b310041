"""Golden fixtures for the core ETL operators (SURVEY.md §5).

These pin the semantics the reference only eyeballed with show(false):
tie-break determinism (Q3), CASE-preserved audit times (F4), full-outer
coalesce incl. delta-only rows (Q1), and the positional etl_date contract
(Q4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.etl import (
    dedup_latest,
    merge_full_outer,
    rename_prefix,
    scd1_upsert,
    stamp_audit,
    star_denormalize,
)

PIN = "2022-10-01 00:00:00"
OLD = "2022-09-30 00:00:00"


def test_stamp_audit_adds_four_cols_and_trailing_etl_date(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    out = stamp_audit(df, user="user1", ts=F.lit(PIN), etl_date="20221001")
    assert out.columns == [
        "id",
        "v",
        "dwd_insert_user",
        "dwd_insert_time",
        "dwd_modify_user",
        "dwd_modify_time",
        "etl_date",
    ]
    row = out.first()
    assert row.dwd_insert_user == "user1"
    assert row.dwd_insert_time == PIN
    assert row.etl_date == "20221001"


def test_stamp_audit_does_not_duplicate_etl_date(spark):
    """Q4: the reference appended a second etl_date to a SELECT * that
    already had one (SimpleDataCleanUtils.scala:20), breaking positional
    insertInto."""
    df = spark.createDataFrame([(1, "20220101")], ["id", "etl_date"])
    out = stamp_audit(df, ts=F.lit(PIN), etl_date="20221001")
    assert out.columns.count("etl_date") == 1
    assert out.columns[-1] == "etl_date"
    assert out.first().etl_date == "20221001"


def test_stamp_audit_dws_layer(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = stamp_audit(df, layer="dws", ts=F.lit(PIN))
    assert "dws_insert_user" in out.columns
    assert "dwd_insert_user" not in out.columns


def test_dedup_latest_keeps_newest(spark):
    df = spark.createDataFrame(
        [(1, "2022-01-01", "old"), (1, "2022-01-02", "new"), (2, "2022-01-01", "x")],
        ["k", "t", "v"],
    )
    out = dedup_latest(df, "k", "t").orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "new"), (2, "x")]


def test_dedup_latest_tie_break_deterministic(spark):
    """Q3: reference ordered only by modified_time; equal timestamps picked
    arbitrarily.  With a tiebreak the winner is stable across shuffles."""
    rows = [(1, "2022-01-01", f"v{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "t", "v"]).repartition(4)
    for _ in range(3):
        out = dedup_latest(df, "k", "t", tiebreak="v").collect()
        assert [(r.k, r.v) for r in out] == [(1, "v9")]  # 'v9' max desc


def test_scd1_upsert_case_preserved_audit_times(spark):
    """F4 (CustomerInfDataClean.scala:55,58): surviving DWD rows keep BOTH
    stored audit times; ODS rows get the run timestamp for both."""
    ods = spark.createDataFrame(
        [(1, "2022-01-02", "updated"), (3, "2022-01-01", "brand-new")],
        ["k", "t", "v"],
    )
    dwd = (
        spark.createDataFrame(
            [(1, "2022-01-01", "stale"), (2, "2022-01-01", "untouched")],
            ["k", "t", "v"],
        )
        .withColumn("dwd_insert_user", F.lit("user1"))
        .withColumn("dwd_insert_time", F.lit(OLD).cast("timestamp"))
        .withColumn("dwd_modify_user", F.lit("user1"))
        .withColumn("dwd_modify_time", F.lit(OLD).cast("timestamp"))
    )
    out = scd1_upsert(
        ods, dwd, key="k", order_col="t",
        ts=F.lit(PIN).cast("timestamp"), etl_date="20221001",
    )
    got = {r.k: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].v == "updated"
    assert str(got[1].dwd_insert_time) == PIN  # ODS row: refreshed
    assert str(got[1].dwd_modify_time) == PIN
    assert got[2].v == "untouched"
    assert str(got[2].dwd_insert_time) == OLD  # DWD row: preserved
    assert str(got[2].dwd_modify_time) == OLD  # ADVICE fix: modify_time too
    assert got[3].v == "brand-new"
    assert str(got[3].dwd_insert_time) == PIN
    assert all(r.etl_date == "20221001" for r in got.values())


def test_scd1_upsert_tie_prefers_ods(spark):
    """Q3 fix: on equal order_col the ODS row must win (fresh data)."""
    ods = spark.createDataFrame([(1, "2022-01-01", "from-ods")], ["k", "t", "v"])
    dwd = (
        spark.createDataFrame([(1, "2022-01-01", "from-dwd")], ["k", "t", "v"])
        .withColumn("dwd_insert_user", F.lit("user1"))
        .withColumn("dwd_insert_time", F.lit(OLD).cast("timestamp"))
        .withColumn("dwd_modify_user", F.lit("user1"))
        .withColumn("dwd_modify_time", F.lit(OLD).cast("timestamp"))
    )
    out = scd1_upsert(ods, dwd, key="k", order_col="t", ts=F.lit(PIN).cast("timestamp"))
    assert out.first().v == "from-ods"


def test_scd1_upsert_first_run_no_dwd(spark):
    ods = spark.createDataFrame([(1, "2022-01-01", "a")], ["k", "t", "v"])
    out = scd1_upsert(ods, None, key="k", order_col="t", ts=F.lit(PIN).cast("timestamp"))
    assert out.count() == 1
    assert str(out.first().dwd_insert_time) == PIN


def test_merge_full_outer_base_wins_and_delta_fills(spark):
    """Q1 intent (OrderMasterDataClean.scala:157-180): full outer on the key,
    base (Hive) value preferred, delta fills gaps -- including rows that
    exist only in the delta, whose key must be coalesced."""
    base = spark.createDataFrame([(1, "base1"), (2, "base2")], ["k", "v"])
    delta = spark.createDataFrame([(2, "delta2"), (3, "delta3")], ["k", "v"])
    out = {r.k: r.v for r in merge_full_outer(base, delta, "k").collect()}
    assert out == {1: "base1", 2: "base2", 3: "delta3"}


def test_merge_full_outer_null_in_base_filled_by_delta(spark):
    base = spark.createDataFrame([(1, None)], "k int, v string")
    delta = spark.createDataFrame([(1, "fill")], "k int, v string")
    out = merge_full_outer(base, delta, "k").collect()
    assert out[0].v == "fill"


def test_merge_full_outer_prefer_delta(spark):
    base = spark.createDataFrame([(1, "base")], ["k", "v"])
    delta = spark.createDataFrame([(1, "delta")], ["k", "v"])
    out = merge_full_outer(base, delta, "k", prefer="delta").collect()
    assert out[0].v == "delta"


def test_merge_full_outer_missing_delta_column_raises(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    delta = spark.createDataFrame([(1,)], ["k"])
    try:
        merge_full_outer(base, delta, "k")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing columns" in str(e)


def test_rename_prefix(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    out = rename_prefix(df, "hive_", exclude=("v",))
    assert out.columns == ["hive_id", "v"]


def test_star_denormalize_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], ["id", "dim_id"])
    dim = spark.createDataFrame([(10, "ten")], ["dim_id", "name"])
    out = {r.id: r.name for r in star_denormalize(fact, [(dim, "dim_id")]).collect()}
    assert out == {1: "ten", 2: None}


def test_star_denormalize_broadcasts_dims(spark):
    fact = spark.createDataFrame([(1, 10)], ["id", "dim_id"])
    dim = spark.createDataFrame([(10, "ten")], ["dim_id", "name"])
    plan = star_denormalize(fact, [(dim, "dim_id")])._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_dedup_latest_null_keys_group_together(spark):
    """Window partitionBy groups NULL keys into one partition -- null-key
    rows dedup among themselves (documented semantics)."""
    df = spark.createDataFrame(
        [(None, "2022-01-02", "newest-null"), (None, "2022-01-01", "old-null"),
         (1, "2022-01-01", "keyed")],
        "k int, t string, v string",
    )
    out = {r.v for r in dedup_latest(df, "k", "t").collect()}
    assert out == {"newest-null", "keyed"}


def test_merge_full_outer_null_keys_never_match(spark):
    """Equi-join null keys never match -- null-key rows from BOTH sides
    survive as distinct unmatched rows (standard SQL semantics)."""
    base = spark.createDataFrame([(None, "base-null"), (1, "b1")], "k int, v string")
    delta = spark.createDataFrame([(None, "delta-null"), (1, "d1")], "k int, v string")
    rows = merge_full_outer(base, delta, "k").collect()
    vals = sorted(r.v for r in rows)
    assert vals == ["b1", "base-null", "delta-null"]


def test_incremental_agg_equals_full_recompute(spark):
    from bigdata_scala_offline_data_clean_spark.operators.incremental import (
        finalize_agg,
        merge_partial_aggs,
        partial_agg,
    )

    rows = [(i % 5, float(i) + 0.25, i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, amount double, day int")

    cum = None
    for day in (0, 1, 2):  # fold one partition at a time, out of nothing
        delta = partial_agg(
            df.where(F.col("day") == day), ["k"],
            sum_cols=("amount",), min_cols=("amount",), max_cols=("amount",),
        )
        cum = merge_partial_aggs(cum, delta, ["k"])
    inc = {
        r.k: r
        for r in finalize_agg(cum, avg_of={"avg_amount": "sum_amount"}).collect()
    }

    full = {
        r.k: r
        for r in df.groupBy("k")
        .agg(
            F.sum("amount").alias("s"),
            F.min("amount").alias("mn"),
            F.max("amount").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.avg("amount").alias("avg"),
        )
        .collect()
    }
    for k, r in full.items():
        assert inc[k].sum_amount == pytest.approx(r.s)
        assert inc[k].min_amount == r.mn and inc[k].max_amount == r.mx
        assert inc[k].n_rows == r.n
        assert inc[k].avg_amount == pytest.approx(r.avg)

    # unmergeable column name is an explicit error, not silent corruption
    with pytest.raises(ValueError):
        merge_partial_aggs(
            cum.withColumnRenamed("n_rows", "oops"),
            delta.withColumnRenamed("n_rows", "oops"),
            ["k"],
        )
