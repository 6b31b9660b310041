"""Snapshot diff, blocked fuzzy linkage, and runtime bloom-filter gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.diff import (
    diff_summary,
    snapshot_diff,
)
from bigdata_scala_offline_data_clean_spark.operators.linkage import (
    blocked_fuzzy_pairs,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_snapshot_diff_classifies_all_states(spark):
    old = _mk(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)], ["k", "s", "v"])
    new = _mk(spark, [(2, "b", 20.0), (3, "c2", None), (4, "d", 40.0)], ["k", "s", "v"])
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert out[1]["diff_status"] == "removed"
    assert out[2]["diff_status"] == "unchanged"
    assert out[3]["diff_status"] == "changed"  # s changed; NULL v is not a change
    assert out[4]["diff_status"] == "added"
    assert out[4]["s_old"] is None and out[4]["s_new"] == "d"


def test_snapshot_diff_null_to_value_is_change(spark):
    old = spark.createDataFrame([(1, None)], "k int, v double")
    new = spark.createDataFrame([(1, 5.0)], "k int, v double")
    assert snapshot_diff(old, new, "k").first()["diff_status"] == "changed"


def test_diff_summary_counts(spark):
    old = _mk(spark, [(1, "a"), (2, "b")], ["k", "v"])
    new = _mk(spark, [(2, "z"), (3, "c")], ["k", "v"])
    s = {r["diff_status"]: r["n_rows"] for r in
         diff_summary(snapshot_diff(old, new, "k")).collect()}
    assert s == {"removed": 1, "changed": 1, "added": 1}


def test_apply_cdc_merge_semantics(spark):
    from bigdata_scala_offline_data_clean_spark.operators.diff import apply_cdc

    base = _mk(spark, [(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    changes = _mk(
        spark,
        [(2, "b2", "U", 1), (3, "x", "D", 1), (4, "d", "I", 1),
         (4, "d2", "U", 2)],  # later op on same key wins
        ["k", "v", "op", "ts"],
    )
    out = {r["k"]: r["v"] for r in
           apply_cdc(base, changes, "k", order_col="ts").collect()}
    assert out == {1: "a", 2: "b2", 4: "d2"}  # 3 deleted, 4 got latest op


def test_apply_cdc_delete_wins_when_latest(spark):
    from bigdata_scala_offline_data_clean_spark.operators.diff import apply_cdc

    base = _mk(spark, [(1, "a")], ["k", "v"])
    changes = _mk(
        spark, [(1, "a2", "U", 1), (1, "a3", "D", 2)], ["k", "v", "op", "ts"]
    )
    assert apply_cdc(base, changes, "k", order_col="ts").count() == 0


def test_apply_cdc_base_does_not_shuffle(spark):
    from bigdata_scala_offline_data_clean_spark.operators.diff import apply_cdc

    base = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS v")
    changes = spark.range(0, 10).selectExpr(
        "id * 100 AS k", "id AS v", "'U' AS op"
    )
    plan = (
        apply_cdc(base, changes, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_blocked_fuzzy_pairs_blocks_and_distance(spark):
    df = _mk(
        spark,
        [
            (1, "B1", "red widget"),
            (2, "B1", "ted widget"),   # dist 1, same (brand, noun) block
            (3, "B1", "red widget"),   # dist 0 vs 1 -> excluded (min_dist=1)
            (4, "B2", "ted widget"),   # other brand -> other block
            (5, "B1", "blue widget"),  # dist 3 vs id 1 -> excluded
        ],
        ["id", "brand", "name"],
    )
    pairs = blocked_fuzzy_pairs(
        df,
        id_col="id",
        text_col="name",
        block_exprs={
            "b": F.col("brand"),
            "n": F.split_part(F.col("name"), F.lit(" "), F.lit(2)),
        },
        max_dist=2,
        min_dist=1,
    )
    got = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in pairs.collect()}
    assert got == {(1, 2): 1, (2, 3): 1}


def test_blocked_fuzzy_pairs_max_block_drops_oversized(spark):
    rows = [(i, "B", "same noun") for i in range(10)] + [(100, "C", "one noun")]
    df = _mk(spark, rows, ["id", "brand", "name"])
    pairs = blocked_fuzzy_pairs(
        df,
        id_col="id",
        text_col="name",
        block_exprs={"b": F.col("brand")},
        max_dist=2,
        min_dist=0,
        max_block=5,
    )
    # the 10-row "B" block exceeds max_block and is dropped entirely
    assert pairs.count() == 0


def test_read_evolved_merges_schema_versions(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.sources.evolution import (
        read_evolved,
    )

    d = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id int, v1 string").write.parquet(
        d, mode="append"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id int, v1 string, v2 double"
    ).write.parquet(d, mode="append")

    merged = read_evolved(spark, d)
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["v2"] is None and rows[2]["v2"] == 9.5

    # explicit-schema path: same result, no footer sweep
    explicit = read_evolved(spark, d, schema=merged.schema)
    assert set(explicit.columns) == {"id", "v1", "v2"}
    assert explicit.count() == 2


def test_runtime_bloom_filter_injects_might_contain(spark):
    """At 100 TB the probe side of a selective join should be pruned by a
    runtime bloom filter built from the build side (AQE runtime filtering).
    Verify the knobs inject might_contain into the physical plan."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .where("o_orderpriority = '1-URGENT'")
        )
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert j.count() >= 1
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_blocked_fuzzy_pairs_max_block_caps_degenerate_block(spark):
    """All rows sharing one (brand, noun) block: without the cap the verify
    join is quadratic; with the cap the hot block is dropped entirely and
    the pair count is bounded."""
    rows = [(i, f"name {i:03d}", "B1") for i in range(40)]
    # one small healthy block alongside the degenerate one
    rows += [(100, "other x1", "B2"), (101, "other x2", "B2")]
    df = spark.createDataFrame(rows, ["id", "name", "brand"])
    kw = dict(
        id_col="id",
        text_col="name",
        block_exprs={
            "blk_brand": F.col("brand"),
            "blk_noun": F.split_part(F.col("name"), F.lit(" "), F.lit(1)),
        },
        max_dist=2,
        min_dist=1,
    )
    uncapped = blocked_fuzzy_pairs(df, **kw).count()
    capped = blocked_fuzzy_pairs(df, max_block=10, **kw)
    got = capped.collect()
    # only the healthy 2-row block survives the cap
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}
    assert uncapped > len(got)
