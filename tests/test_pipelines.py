"""End-to-end archetype pipeline tests over a scratch Warehouse (SURVEY §3)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.pipelines import (
    JOBS,
    _small_delta_merge,
    run_job,
    yesterday_yyyymmdd,
)
from bigdata_scala_offline_data_clean_spark.sources.catalog import Warehouse

def _pin():
    return F.lit("2022-10-01 00:00:00").cast("timestamp")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_yesterday_yyyymmdd():
    assert yesterday_yyyymmdd(date(2022, 10, 2)) == "20221001"
    assert yesterday_yyyymmdd(date(2022, 1, 1)) == "20211231"


def test_archetype_a_append_clean(spark, wh):
    for d, rows in [("20220930", [(1, "x")]), ("20221001", [(2, "y"), (3, "z")])]:
        wh.append(
            spark.createDataFrame([(k, v, d) for k, v in rows], ["id", "addr", "etl_date"]),
            "ods", "customer_addr",
        )
    etl = run_job(wh, "customer_addr", ts=_pin())
    assert etl == "20221001"
    out = wh.table("dwd", "dim_customer_addr")
    rows = out.collect()
    assert len(rows) == 2  # only the latest partition
    assert set(out.columns) >= {"id", "addr", "dwd_insert_user", "dwd_insert_time",
                                "dwd_modify_user", "dwd_modify_time", "etl_date"}
    assert all(str(r.etl_date) == "20221001" for r in rows)


def test_archetype_b_scd1_two_runs(spark, wh):
    day1 = spark.createDataFrame(
        [(1, "alice", "2022-09-30 10:00:00", "20220930"),
         (2, "bob", "2022-09-30 10:00:00", "20220930")],
        ["customer_id", "name", "modified_time", "etl_date"],
    )
    wh.append(day1, "ods", "customer_inf")
    run_job(wh, "customer_inf", ts=F.lit("2022-09-30 23:00:00").cast("timestamp"))

    day2 = spark.createDataFrame(
        [(1, "alice-renamed", "2022-10-01 09:00:00", "20221001"),
         (3, "carol", "2022-10-01 09:00:00", "20221001")],
        ["customer_id", "name", "modified_time", "etl_date"],
    )
    wh.append(day2, "ods", "customer_inf")
    etl = run_job(wh, "customer_inf", ts=_pin())
    assert etl == "20221001"

    latest = wh.latest("dwd", "dim_customer_inf")
    got = {r.customer_id: r for r in latest.collect()}
    assert {k: v.name for k, v in got.items()} == {
        1: "alice-renamed", 2: "bob", 3: "carol"}
    # updated row: both audit times refreshed; untouched row: preserved
    assert str(got[1].dwd_insert_time) == "2022-10-01 00:00:00"
    assert str(got[2].dwd_insert_time) == "2022-09-30 23:00:00"
    assert str(got[2].dwd_modify_time) == "2022-09-30 23:00:00"
    assert str(got[3].dwd_insert_time) == "2022-10-01 00:00:00"


def test_archetype_c_delta_merge(spark, wh, tmp_path):
    ods = spark.createDataFrame(
        [(1, "base-1", 10.0, "20221001"), (2, "base-2", 20.0, "20221001")],
        ["order_id", "status", "amount", "etl_date"],
    )
    wh.append(ods, "ods", "order_master")
    delta_root = str(tmp_path / "delta")
    spark.createDataFrame(
        [("rk_20221001_2", 2, "delta-2", 99.0),
         ("rk_20221001_5", 5, "delta-5", 50.0),
         ("rk_20220930_9", 9, "stale", 0.0)],
        ["row_key", "order_id", "status", "amount"],
    ).write.parquet(f"{delta_root}/order_master_offline")

    etl = run_job(wh, "order_master", delta_root=delta_root, ts=_pin())
    assert etl == "20221001"
    out = {r.order_id: r for r in wh.table("dwd", "fact_order_master").collect()}
    # base wins on conflict; delta-only row added; stale rowkey filtered out
    assert set(out) == {1, 2, 5}
    assert out[2].status == "base-2" and out[2].amount == 20.0
    assert out[5].status == "delta-5"
    assert str(out[5].etl_date) == "20221001"  # backfilled for delta-only row


def _plan_tree(node):
    """(nodeName, [children]) tree from a py4j SparkPlan node.

    AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) are LeafExecNodes
    whose real subtree hides behind executedPlan()/plan() -- descend through.
    """
    kids = node.children()
    kid_nodes = [kids.apply(i) for i in range(kids.size())]
    if not kid_nodes:
        for meth in ("executedPlan", "plan"):
            try:
                kid_nodes = [getattr(node, meth)()]
                break
            except Exception:
                pass
    return (node.nodeName(), [_plan_tree(k) for k in kid_nodes])


def _subtree_names(tree):
    name, kids = tree
    out = {name}
    for k in kids:
        out |= _subtree_names(k)
    return out


def _broadcast_subtrees(tree, acc=None):
    if acc is None:
        acc = []
    name, kids = tree
    if "BroadcastExchange" in name:
        acc.append(tree)
    for k in kids:
        _broadcast_subtrees(k, acc)
    return acc


def test_small_delta_merge_broadcasts_no_base_shuffle(spark):
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    delta = spark.createDataFrame([(1, 111), (2000, 222)], ["k", "v"])
    merged = _small_delta_merge(base, delta, "k")
    got = {r.k: r.v for r in merged.collect()}
    assert got[1] == 2 and got[5] == 10 and got[2000] == 222
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # Scale gate: no broadcast may carry the raw base.  A BroadcastExchange
    # whose subtree scans the base (Range here) must pre-filter it against
    # the broadcast delta keys (a BroadcastHashJoin inside the subtree), so
    # the broadcast payload is <=|delta| rows regardless of base size.
    tree = _plan_tree(merged._jdf.queryExecution().executedPlan())
    bcasts = _broadcast_subtrees(tree)
    assert bcasts, "expected broadcast exchanges in the fast-path plan"
    for b in bcasts:
        names = _subtree_names(b)
        if any("Range" in n for n in names):
            assert any("BroadcastHashJoin" in n for n in names), (
                "base-derived frame broadcast without a delta-key prefilter: "
                + str(names)
            )


def test_archetype_d_star_aggregate(spark, wh):
    inf = spark.createDataFrame(
        [(1, "alice", "gold", "20221001"), (2, "bob", "silver", "20221001")],
        ["customer_id", "name", "customer_level", "etl_date"],
    )
    addr = spark.createDataFrame(
        [(1, "addr-1", "20221001")], ["customer_id", "address", "etl_date"]
    )
    lvl = spark.createDataFrame(
        [("gold", 0.9, "20221001"), ("silver", 0.95, "20221001")],
        ["customer_level", "discount", "etl_date"],
    )
    wh.overwrite_table(inf, "dwd", "dim_customer_inf")
    wh.overwrite_table(addr, "dwd", "dim_customer_addr")
    wh.overwrite_table(lvl, "dwd", "dim_customer_level_inf")

    etl = run_job(wh, "customer_addr_level_aggr", ts=_pin(), etl_date="20221002")
    assert etl == "20221002"
    out = {r.customer_id: r for r in wh.table("dws", "customer_addr_level_aggr").collect()}
    assert out[1].address == "addr-1" and out[1].discount == 0.9
    assert out[2].address is None and out[2].discount == 0.95
    assert "dws_insert_user" in wh.table("dws", "customer_addr_level_aggr").columns


def test_jobs_registry_complete():
    by_type = {}
    for cfg in JOBS.values():
        by_type.setdefault(cfg.archetype, []).append(cfg.name)
    assert len(JOBS) == 12
    assert len(by_type["A"]) == 5
    assert len(by_type["B"]) == 3
    assert len(by_type["C"]) == 3
    assert len(by_type["D"]) == 1


def test_training_data_pipeline(spark):
    from bigdata_scala_offline_data_clean_spark.pipelines import training_data_pipeline

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),                                   # keeper (rep of dup group)
        (1, base),                                   # exact dup -> dropped
        (2, base.replace("today", "tonight")),       # near dup -> dropped
        (3, "short text"),                           # < min_tokens -> dropped
        (4, "spark spark spark spark spark spark spark spark spark spark spark"),  # low uniq -> dropped
        (5, "completely different content about catalyst optimizer rules and tungsten codegen stages"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = training_data_pipeline(
        docs, min_tokens=5, min_uniq_ratio=0.3, neardup_threshold=0.5, shingle_n=2
    )
    assert {r.doc_id for r in out.collect()} == {0, 5}
