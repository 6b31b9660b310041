"""Round-8 advice-fix tests.

Pins the four round-7 ADVICE items:

1. ``distributed_ntile``'s null/NaN guard is order-independent: the
   bad-row count is aggregated from the checkpointed value-count table
   and becomes a POISON UNION child of the result (a 1-row frame whose
   filter raises when the count is nonzero), so under full execution
   the raise fires even on an ALL-bad frame (where a filter-based
   guard has no surviving row to evaluate it) and cannot be
   short-circuited by an optimizer reordering inferred IsNotNull
   conjuncts ahead of it.  (Round 9 added a per-row raise gate on the
   data rows as well, covering incremental-limit executions that never
   schedule the poison partition -- tests/test_round9.py pins that.)
2. ``equidepth_histogram`` excludes NULLs up front instead of letting a
   NULL value group inflate ``n_total`` while vanishing through the
   slice equi-join (which shifted every bucket boundary).
3. ``merge_into(strict=True)`` applies Delta's duplicate-match rule
   CONDITIONS INCLUDED: duplicates excluded by ``update_cond``/
   ``delete_cond`` are legal, commuting all-delete duplicates are
   legal, and the surviving matched target row is emitted exactly once.
4. (plan_audit walk diagnostics are exercised by tools/plan_audit.py
   itself -- no runtime surface here.)
"""
from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F
from pyspark.errors import PySparkException

from bigdata_scala_offline_data_clean_spark.operators.diff import merge_into
from bigdata_scala_offline_data_clean_spark.operators.ordering import (
    distributed_ntile,
    equidepth_histogram,
)

RAISES = (PySparkException, Py4JJavaError)


def test_distributed_ntile_raises_on_all_null_frame(spark):
    # every row bad: a WHERE-based guard has no surviving row to carry
    # the raise -- the gated __ord expression must still fire it
    d = spark.createDataFrame(
        [(i, None) for i in range(5)], "id bigint, v double"
    )
    with pytest.raises(RAISES) as ei:
        distributed_ntile(d, 4, "v", tie_cols=["id"]).collect()
    assert "null/NaN" in str(ei.value)


def test_distributed_ntile_raises_on_all_nan_frame(spark):
    d = spark.createDataFrame(
        [(i, float("nan")) for i in range(5)], "id bigint, v double"
    )
    with pytest.raises(RAISES):
        distributed_ntile(d, 4, "v", tie_cols=["id"]).collect()


def test_distributed_ntile_empty_frame_no_raise(spark):
    d = spark.createDataFrame([], "id bigint, v double")
    assert distributed_ntile(d, 4, "v", tie_cols=["id"]).count() == 0


def test_equidepth_histogram_ignores_nulls(spark):
    # 20 non-null values 0..19 + 5 NULLs: bucket boundaries must match
    # the null-free frame exactly (previously the NULL group inflated
    # n_total to 25 and shifted every boundary)
    with_nulls = spark.createDataFrame(
        [(i,) for i in range(20)] + [(None,)] * 5, "v int"
    )
    without = spark.createDataFrame([(i,) for i in range(20)], "v int")
    got = {
        r.bucket: (r.n_rows, r.lo, r.hi)
        for r in equidepth_histogram(with_nulls, "v", 4).collect()
    }
    want = {
        r.bucket: (r.n_rows, r.lo, r.hi)
        for r in equidepth_histogram(without, "v", 4).collect()
    }
    assert got == want
    assert sum(n for n, _, _ in got.values()) == 20


def _merge_frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k bigint, status string, price double"
    )
    dup_source = spark.createDataFrame(
        [(1, "hi", 9.0), (1, "lo", 0.5)], "k bigint, status string, price double"
    )
    return target, dup_source


def test_merge_strict_duplicates_excluded_by_update_cond(spark):
    # only ONE of the duplicate source rows satisfies the UPDATE clause:
    # Delta accepts this -- exactly one pair modifies the target row
    target, dup = _merge_frames(spark)
    out = merge_into(
        target,
        dup,
        "k",
        update_cond=lambda t, s: s["price"] > t["price"],
        strict=True,
    )
    got = {r.k: (r.status, r.price) for r in out.collect()}
    # k=1 updated from the (hi, 9.0) row ONCE; k=2 untouched
    assert got == {1: ("hi", 9.0), 2: ("b", 2.0)}


def test_merge_strict_raises_when_two_duplicates_modify(spark):
    target, dup = _merge_frames(spark)
    with pytest.raises(RAISES) as ei:
        merge_into(
            target,
            dup,
            "k",
            update_cond=lambda t, s: s["price"] > 0,  # both rows qualify
            strict=True,
        ).count()
    assert "would modify the same target row" in str(ei.value)


def test_merge_strict_allows_commuting_all_delete_duplicates(spark):
    # both duplicate pairs DELETE the same row: commutes, Delta permits
    target, dup = _merge_frames(spark)
    out = merge_into(
        target,
        dup,
        "k",
        update_cond=lambda t, s: F.lit(False),
        delete_cond=lambda t, s: F.lit(True),
        strict=True,
    )
    got = {r.k: (r.status, r.price) for r in out.collect()}
    assert got == {2: ("b", 2.0)}


def test_merge_strict_nonmodifying_duplicates_collapse_to_one_row(spark):
    # neither duplicate satisfies any clause: the matched target row
    # passes through exactly once (lenient mode would emit it twice)
    target, dup = _merge_frames(spark)
    out = merge_into(
        target,
        dup,
        "k",
        update_cond=lambda t, s: F.lit(False),
        strict=True,
    )
    assert out.count() == 2
    got = {r.k: (r.status, r.price) for r in out.collect()}
    assert got == {1: ("a", 1.0), 2: ("b", 2.0)}


def test_merge_strict_mixed_update_delete_duplicates_raise(spark):
    # one pair deletes, the other updates: NOT commuting -> raise
    target, dup = _merge_frames(spark)
    with pytest.raises(RAISES):
        merge_into(
            target,
            dup,
            "k",
            update_cond=lambda t, s: s["status"] == "hi",
            delete_cond=lambda t, s: s["status"] == "lo",
            strict=True,
        ).count()
