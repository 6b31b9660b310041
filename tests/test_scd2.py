"""SCD-2 operators: changelog collapse and incremental merge."""

from __future__ import annotations

from bigdata_scala_offline_data_clean_spark.operators.scd2 import (
    scd2_from_changelog,
    scd2_merge,
)


def test_scd2_from_changelog_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, 10, "a", 100),
            (1, 20, "a", 101),  # no change -> merges into first interval
            (1, 30, "b", 102),  # change -> closes [10,30), opens [30,)
            (2, 15, "x", 103),
        ],
        "k int, ts int, v string, eid int",
    )
    rows = sorted(
        scd2_from_changelog(log, "k", ["v"], "ts", tiebreak="eid").collect(),
        key=lambda r: (r["k"], r["effective_from"]),
    )
    assert [(r["k"], r["v"], r["effective_from"], r["effective_to"], r["is_current"])
            for r in rows] == [
        (1, "a", 10, 30, False),
        (1, "b", 30, None, True),
        (2, "x", 15, None, True),
    ]


def test_scd2_changelog_single_exchange_single_sort(spark):
    """Both window passes share (partitionBy key, orderBy ts, tiebreak):
    Catalyst must reuse one exchange and one sort -- no second shuffle."""
    log = spark.createDataFrame(
        [(i % 7, i, str(i % 3), i) for i in range(1000)],
        "k int, ts int, v string, eid int",
    )
    plan = (
        scd2_from_changelog(log, "k", ["v"], "ts", tiebreak="eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") == 1


def test_scd2_from_changelog_null_attr_not_a_change(spark):
    log = spark.createDataFrame(
        [(1, 10, None, 1), (1, 20, None, 2), (1, 30, "a", 3)],
        "k int, ts int, v string, eid int",
    )
    out = scd2_from_changelog(log, "k", ["v"], "ts", tiebreak="eid").collect()
    assert len(out) == 2  # NULL -> NULL merged; NULL -> 'a' is a change


def test_scd2_merge_close_insert_noop(spark):
    dim = spark.createDataFrame(
        [
            (1, "a", 10, 30, False),
            (1, "b", 30, None, True),
            (2, "x", 15, None, True),
        ],
        "k int, v string, effective_from int, effective_to int, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "c", 50),  # changed -> close 'b', open 'c'
            (2, "x", 50),  # identical -> no-op
            (3, "n", 50),  # new key -> insert
        ],
        "k int, v string, ts int",
    )
    out = scd2_merge(dim, updates, "k", ["v"])
    rows = {(r["k"], r["v"]): r for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, "a")]["is_current"] is False  # history untouched
    b = rows[(1, "b")]
    assert (b["effective_to"], b["is_current"]) == (50, False)
    c = rows[(1, "c")]
    assert (c["effective_from"], c["effective_to"], c["is_current"]) == (50, None, True)
    assert rows[(2, "x")]["is_current"] is True
    n = rows[(3, "n")]
    assert (n["effective_from"], n["is_current"]) == (50, True)


def test_scd2_roundtrip_merge_equals_backfill(spark):
    """Applying day-2 updates onto the day-1 history equals rebuilding from
    the concatenated changelog."""
    day1 = [(1, 10, "a", 0), (2, 12, "x", 1), (1, 20, "b", 2)]
    day2 = [(1, 40, "c", 3), (2, 40, "x", 4), (3, 40, "z", 5)]
    schema = "k int, ts int, v string, eid int"
    full = scd2_from_changelog(
        spark.createDataFrame(day1 + day2, schema), "k", ["v"], "ts", "eid"
    )
    merged = scd2_merge(
        scd2_from_changelog(spark.createDataFrame(day1, schema), "k", ["v"], "ts", "eid"),
        spark.createDataFrame(
            [(k, v, ts) for (k, ts, v, _e) in day2], "k int, v string, ts int"
        ),
        "k",
        ["v"],
    )
    key = lambda r: (r["k"], r["v"], r["effective_from"], r["effective_to"], r["is_current"])
    assert sorted(map(key, full.collect())) == sorted(map(key, merged.collect()))
