"""As-of join and bucketed range join: semantics + plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2022-10-01 10:00:00"), "t1"),
            (1, _ts("2022-10-01 10:05:00"), "t2"),
            (2, _ts("2022-10-01 10:00:00"), "t3"),
        ],
        ["k", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2022-10-01 09:59:00"), 100.0),
            (1, _ts("2022-10-01 10:03:00"), 101.0),
            (1, _ts("2022-10-01 10:05:00"), 102.0),  # equal-ts vs t2
            (2, _ts("2022-10-01 11:00:00"), 999.0),  # only AFTER t3
        ],
        ["k", "qts", "price"],
    )
    return trades, quotes


def test_asof_join_basic(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade: r.price
        for r in asof_join(
            trades, quotes, on="k", left_ts="ts", right_ts="qts", payload=["price"]
        ).collect()
    }
    assert out == {"t1": 100.0, "t2": 102.0, "t3": None}


def test_asof_join_strict_excludes_equal_ts(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade: r.price
        for r in asof_join(
            trades, quotes, on="k", left_ts="ts", right_ts="qts",
            payload=["price"], strict=True,
        ).collect()
    }
    assert out["t2"] == 101.0  # 10:05 quote hidden under strict <


def test_asof_join_single_shuffle_no_nested_loop(spark):
    trades, quotes = _frames(spark)
    plan = asof_join(
        trades, quotes, on="k", left_ts="ts", right_ts="qts", payload=["price"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 1  # one hash exchange on the key


def test_range_join_bucketed(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2022-10-01 10:30:00"), "in-window"),
            (1, _ts("2022-10-01 12:30:00"), "after"),
            (2, _ts("2022-10-01 10:30:00"), "wrong-key"),
        ],
        ["k", "ts", "tag"],
    )
    windows = spark.createDataFrame(
        [(1, _ts("2022-10-01 10:00:00"), _ts("2022-10-01 11:00:00"), "w1")],
        ["k", "ws", "we", "win_id"],
    )
    out = range_join_bucketed(
        events, windows, on="k", left_ts="ts",
        range_start="ws", range_end="we",
        payload=["win_id"], bucket_seconds=3600,
    ).collect()
    assert [(r.tag, r.win_id) for r in out] == [("in-window", "w1")]


def test_range_join_interval_spanning_buckets(spark):
    events = spark.createDataFrame(
        [(1, _ts("2022-10-01 13:59:00"), "late-hit")], ["k", "ts", "tag"]
    )
    windows = spark.createDataFrame(
        [(1, _ts("2022-10-01 10:30:00"), _ts("2022-10-01 14:00:00"), "wide")],
        ["k", "ws", "we", "win_id"],
    )
    out = range_join_bucketed(
        events, windows, on="k", left_ts="ts",
        range_start="ws", range_end="we",
        payload=["win_id"], bucket_seconds=3600,
    ).collect()
    assert [(r.tag, r.win_id) for r in out] == [("late-hit", "wide")]
    # boundary exclusivity: ts == range_end must NOT match
    edge = spark.createDataFrame([(1, _ts("2022-10-01 14:00:00"), "edge")], ["k", "ts", "tag"])
    assert (
        range_join_bucketed(
            edge, windows, on="k", left_ts="ts", range_start="ws",
            range_end="we", payload=["win_id"], bucket_seconds=3600,
        ).count()
        == 0
    )


def test_sessionize_gap_semantics(spark):
    from bigdata_scala_offline_data_clean_spark.operators.sessionize import (
        session_stats,
        sessionize,
    )

    ev = spark.createDataFrame(
        [
            (1, _ts("2022-10-01 10:00:00")),
            (1, _ts("2022-10-01 10:30:00")),  # exactly 1800s gap -> SAME session
            (1, _ts("2022-10-01 11:00:01")),  # 1801s -> new session
            (2, _ts("2022-10-01 10:00:00")),
        ],
        ["user_id", "ts"],
    )
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800)
    got = sorted((r.user_id, str(r.ts), r.session_id) for r in s.collect())
    assert got == [
        (1, "2022-10-01 10:00:00", 0),
        (1, "2022-10-01 10:30:00", 0),
        (1, "2022-10-01 11:00:01", 1),
        (2, "2022-10-01 10:00:00", 0),
    ]
    stats = {(r.user_id, r.session_id): r for r in session_stats(ev, "user_id", "ts", 1800).collect()}
    assert stats[(1, 0)].n_events == 2 and stats[(1, 0)].duration_sec == 1800
    assert stats[(1, 1)].n_events == 1 and stats[(1, 1)].duration_sec == 0


def test_sessionize_single_exchange(spark):
    from bigdata_scala_offline_data_clean_spark.operators.sessionize import sessionize

    ev = spark.createDataFrame([(1, _ts("2022-10-01 10:00:00"))], ["user_id", "ts"])
    plan = sessionize(ev, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # both windows share one partitioning
