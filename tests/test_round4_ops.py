"""Round-4 operators: mergeable sketches, fixed-point PageRank,
k-anonymity, OOV rate, PMI collocations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.graph import (
    PR_SCALE,
    pagerank,
)
from bigdata_scala_offline_data_clean_spark.operators.quality import k_anonymity
from bigdata_scala_offline_data_clean_spark.operators.sketches import (
    merge_sketch_rollup,
    partial_sketches,
    sketch_rollup,
    theta_distinct_by,
)
from bigdata_scala_offline_data_clean_spark.operators.text import (
    oov_rate,
    pmi_collocations,
    vocab_build,
)


def _events(spark, n=4000, users=97, days=7):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % users).alias("user_id"),
        F.concat(F.lit("d"), (F.col("id") % days).cast("string")).alias("day"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view")), (F.col("id") % 2 + 1).cast("int")
        ).alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def test_sketch_rollup_within_bounds(spark):
    e = _events(spark)
    rows = {
        r["event_type"]: r
        for r in sketch_rollup(
            e, ["event_type"], "day", "user_id", "value"
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for et, r in rows.items():
        ex = exact[et]
        assert r["n_rows"] == ex["n"]  # counts merge exactly
        assert abs(r["distinct_est"] - ex["nd"]) / ex["nd"] <= 0.05
        # KLL: check the RANK of the estimated median, not the value
        rank = e.where(
            (F.col("event_type") == et) & (F.col("value") <= r["p50_est"])
        ).count() / ex["n"]
        assert 0.45 <= rank <= 0.55


def test_sketch_partials_survive_parquet_and_merge(spark, tmp_path):
    """The stored-partial contract: write per-day sketch rows to parquet,
    read them back, merge -- estimates equal the direct two-level rollup."""
    e = _events(spark)
    partials = partial_sketches(e, ["event_type"], "day", "user_id", "value")
    path = str(tmp_path / "partials")
    partials.write.parquet(path)
    merged = {
        r["event_type"]: r
        for r in merge_sketch_rollup(
            spark.read.parquet(path), ["event_type"]
        ).collect()
    }
    direct = {
        r["event_type"]: r
        for r in sketch_rollup(
            e, ["event_type"], "day", "user_id", "value"
        ).collect()
    }
    assert merged.keys() == direct.keys()
    n_per = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et in merged:
        # HLL union and the row counts are layout-independent ...
        assert merged[et]["distinct_est"] == direct[et]["distinct_est"]
        assert merged[et]["n_rows"] == direct[et]["n_rows"]
        # ... KLL merge is order-sensitive (parquet round-trip changes the
        # partition layout), so assert the rank GUARANTEE, not equality
        rank = e.where(
            (F.col("event_type") == et)
            & (F.col("value") <= merged[et]["p50_est"])
        ).count() / n_per[et]
        assert 0.45 <= rank <= 0.55


def test_theta_estimate_close_to_exact(spark):
    e = _events(spark)
    rows = theta_distinct_by(e, ["event_type"], "user_id").collect()
    for r in rows:
        assert abs(r["theta_distinct_est"] - 97) / 97 <= 0.05


def _pr_model(edges, iters=5):
    """Pure-Python fixed-point PageRank mirror."""
    from collections import defaultdict

    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
    r = {u: PR_SCALE for u in deg}
    base = (PR_SCALE * 15) // 100
    for _ in range(iters):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // deg[u]
        # the node universe is the SOURCE set; no-in-edge nodes keep the
        # (1-d) baseline (mirrors graph.py's left-join backfill)
        r = {u: base + (85 * s[u]) // 100 for u in deg}
    return r


def test_pagerank_matches_python_model(spark):
    half = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    edges = half + [(v, u) for u, v in half]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=5).collect()}
    assert got == _pr_model(edges, iters=5)


def test_pagerank_directed_keeps_no_in_edge_nodes(spark):
    """A node with out-edges but no in-edges must survive every round with
    the (1-d) baseline rank, not silently vanish after iteration 1."""
    edges = [(1, 2), (2, 3), (3, 2)]  # node 1 has no in-edges
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    assert set(got) == {1, 2, 3}
    base = (PR_SCALE * 15) // 100
    assert got[1] == base
    assert got == _pr_model(edges, iters=3)


def test_pagerank_partitioning_invariant(spark):
    """Fixed-point arithmetic: identical BIGINT ranks regardless of layout."""
    half = [(i, (i * 7 + 1) % 50) for i in range(50) if i != (i * 7 + 1) % 50]
    edges = half + [(v, u) for u, v in half]
    df = spark.createDataFrame(edges, ["u", "v"])
    a = {r["node"]: r["pr"] for r in pagerank(df, iters=4).collect()}
    b = {
        r["node"]: r["pr"]
        for r in pagerank(df.repartition(13), iters=4).collect()
    }
    assert a == b
    # rank mass stays near n * SCALE (no overflow, no mass explosion)
    n = len({u for u, _ in edges})
    assert abs(sum(a.values()) - n * PR_SCALE) / (n * PR_SCALE) < 0.2


def test_k_anonymity_flags_small_groups(spark):
    rows = [("a", 1)] * 6 + [("b", 1)] * 3 + [("b", 2)] * 5
    df = spark.createDataFrame(rows, ["seg", "nat"])
    got = {
        (r["seg"], r["nat"]): (r["group_n"], r["k_anon"])
        for r in k_anonymity(df, ["seg", "nat"], k=5).collect()
    }
    assert got == {("a", 1): (6, True), ("b", 1): (3, False), ("b", 2): (5, True)}


def test_oov_rate_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b rare"), (2, "a b zz zz"), (3, "b")],
        ["doc_id", "text"],
    )
    vocab = vocab_build(docs, min_count=3)  # a (4), b (4)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ratio"])
        for r in oov_rate(docs, vocab).collect()
    }
    assert got[1] == (6, 1, round(1 / 6, 6))
    assert got[2] == (4, 2, 0.5)
    assert got[3] == (1, 0, 0.0)


def test_pmi_prefers_exclusive_pairs(spark):
    # "x y" always co-occur and appear nowhere else -> max PMI;
    # "a b" co-occur but a/b are also frequent alone -> lower PMI.
    docs = [(i, "x y a filler" + str(i % 3)) for i in range(6)]
    docs += [(10 + i, "a b a b") for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = pmi_collocations(df, min_count=5, top=5).collect()
    grams = [r["gram"] for r in rows]
    assert "x y" in grams and "a b" in grams
    by = {r["gram"]: r["pmi"] for r in rows}
    assert by["x y"] > by["a b"]
    # exact value: c12=6, c1=c2=6, nb=12*3=36, nt=12*4=48
    assert by["x y"] == round(math.log((6 * 48 * 48) / (36 * 6 * 6)), 6)


def test_delta_join_rows_equals_full_recompute(spark):
    from bigdata_scala_offline_data_clean_spark.operators.incremental import (
        delta_join_rows,
    )

    a = spark.createDataFrame(
        [(i, f"a{i}") for i in range(40)], ["k", "av"]
    )
    b = spark.createDataFrame(
        [(i % 25, f"b{i}") for i in range(60)], ["k", "bv"]
    )
    a_old, da = a.where("k % 4 != 0"), a.where("k % 4 = 0")
    b_old, db = b.where("k % 3 != 0"), b.where("k % 3 = 0")
    maintained = (
        a_old.join(b_old, ["k"])
        .unionByName(delta_join_rows(a_old, da, b_old, db, ["k"]))
    )
    full = a.join(b, ["k"])
    assert maintained.exceptAll(full).isEmpty()
    assert full.exceptAll(maintained).isEmpty()


def test_delta_join_rows_rejects_outer(spark):
    import pytest as _pytest

    from bigdata_scala_offline_data_clean_spark.operators.incremental import (
        delta_join_rows,
    )

    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    with _pytest.raises(ValueError, match="inner-join views only"):
        delta_join_rows(df, df, df, df, ["k"], how="left")


def test_stream_sketch_partials_accumulate(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.operators.sketches import (
        merge_sketch_rollup,
    )
    from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
        stream_sketch_partials,
    )

    src = str(tmp_path / "src")
    _events(spark, n=3000).drop("day").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = str(tmp_path / "partials")
    q = (
        stream_sketch_partials(stream, store, ["event_type"], "user_id", "value")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(store)
    assert partials.select("__batch").distinct().count() >= 2  # multi-batch
    merged = {
        r["event_type"]: r
        for r in merge_sketch_rollup(partials, ["event_type"]).collect()
    }
    assert sum(r["n_rows"] for r in merged.values()) == 3000  # exactly-once
    for r in merged.values():
        assert abs(r["distinct_est"] - 97) / 97 <= 0.05


def test_bitmap_distinct_exact_after_roundtrip(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.operators.sketches import (
        bitmap_distinct_partials,
        merge_bitmap_distinct,
    )

    e = _events(spark, n=5000, users=321)
    partials = bitmap_distinct_partials(e, ["event_type"], "day", "user_id")
    path = str(tmp_path / "bm")
    partials.write.parquet(path)
    got = {
        r["event_type"]: r["distinct_count"]
        for r in merge_bitmap_distinct(
            spark.read.parquet(path), ["event_type"]
        ).collect()
    }
    exact = {
        r["event_type"]: r["nd"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert got == exact  # bitmaps are exact, not estimates


def test_dpp_prunes_fact_partitions(spark, tmp_path):
    """The c33 join must carry a dynamicpruning subquery on the fact
    scan's partition filters -- the run-time analogue of static partition
    pruning, and the gate that matters at warehouse scale."""
    from bigdata_scala_offline_data_clean_spark.sources.catalog import Warehouse

    from pyspark.sql import Window

    wh = Warehouse(spark, str(tmp_path))
    fact = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 250).cast("double").alias("value"),
        F.concat(F.lit("2024010"), (F.col("id") % 8 + 1).cast("string")).alias(
            "etl_date"
        ),
    )
    wh.overwrite_partitions(fact, "dwd", "dpp_events")
    dim = (
        fact.select("etl_date").distinct()
        .withColumn("day_rank", F.row_number().over(Window.orderBy("etl_date")))
    )
    wh.overwrite_table(dim, "dwd", "dpp_days")
    f = wh.table("dwd", "dpp_events")
    d = wh.table("dwd", "dpp_days").where(F.col("day_rank") <= 3)
    j = f.join(F.broadcast(d), "etl_date").groupBy("etl_date").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = {str(r["etl_date"]): r["count"] for r in j.collect()}
    assert got == {"20240101": 125, "20240102": 125, "20240103": 125}


def test_kl_drift_zero_for_identical_distributions(spark):
    from bigdata_scala_offline_data_clean_spark.operators.quality import (
        histogram_kl_drift,
    )

    # every day has the identical value multiset -> KL == 0 exactly
    base = spark.range(200).select(
        F.lit("t").alias("g"),
        F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias("day"),
        (F.floor(F.col("id") / 4) % 50).cast("double").alias("v"),
    )
    rows = histogram_kl_drift(base, ["g"], "day", "v").collect()
    assert len(rows) == 4
    assert all(r["kl_divergence"] == 0.0 for r in rows)


def test_kl_drift_flags_shifted_day(spark):
    from bigdata_scala_offline_data_clean_spark.operators.quality import (
        histogram_kl_drift,
    )

    import pyspark.sql.functions as f

    normal = spark.range(900).select(
        f.lit("t").alias("g"),
        f.concat(f.lit("d"), (f.col("id") % 3).cast("string")).alias("day"),
        (f.col("id") % 100).cast("double").alias("v"),
    )
    # day d9: unit-change bug, values 10x
    bad = spark.range(300).select(
        f.lit("t").alias("g"),
        f.lit("d9").alias("day"),
        ((f.col("id") % 100) * 10.0).alias("v"),
    )
    rows = {
        r["day"]: r["kl_divergence"]
        for r in histogram_kl_drift(normal.unionByName(bad), ["g"], "day", "v").collect()
    }
    # the drifted day dominates (normal days pick up some divergence too:
    # the 10x outliers stretch the shared bucket range)
    worst_normal = max(v for d, v in rows.items() if d != "d9")
    assert rows["d9"] > 3 * worst_normal


def test_binary_segments_byte_exact(spark):
    from bigdata_scala_offline_data_clean_spark.operators.multimodal import (
        binary_segments,
    )
    import hashlib

    payload = bytes(range(256)) * 2 + b"tail"  # 516 bytes, non-UTF8
    df = spark.createDataFrame([(1, payload), (2, b""), (3, b"x")],
                               ["doc_id", "payload"])
    rows = {
        (r["doc_id"], r["seg_id"]): (r["seg_len"], r["seg_md5"])
        for r in binary_segments(df, seg_bytes=256).collect()
    }
    # arbitrary bytes (not valid text) segment byte-exactly
    assert rows[(1, 0)] == (256, hashlib.md5(payload[:256]).hexdigest())
    assert rows[(1, 1)] == (256, hashlib.md5(payload[256:512]).hexdigest())
    assert rows[(1, 2)] == (4, hashlib.md5(b"tail").hexdigest())
    assert rows[(3, 0)] == (1, hashlib.md5(b"x").hexdigest())
    assert not any(k[0] == 2 for k in rows)  # empty payload -> no segments


def test_cdc_chunks_resync_after_insertion(spark):
    """The CDC property fixed windows lack: prefix-inserting text shifts
    every fixed window, but CDC boundaries re-synchronize, so the shifted
    document shares almost all chunk digests with the original."""
    from bigdata_scala_offline_data_clean_spark.operators.dedup import cdc_chunks

    import random

    rng = random.Random(7)
    body = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    shifted = "XYZ-INSERTED-PREFIX " + body
    df = spark.createDataFrame([(1, body), (2, shifted)], ["doc_id", "text"])
    rows = cdc_chunks(df).collect()
    a = {r["seg_md5"] for r in rows if r["doc_id"] == 1}
    b = {r["seg_md5"] for r in rows if r["doc_id"] == 2}
    assert len(a) > 10  # enough chunks for the property to mean something
    # all original chunks except the first (and maybe last) reappear
    assert len(a & b) >= len(a) - 2
    # reassembly invariant: chunk lengths cover the text exactly
    n1 = sum(r["seg_len"] for r in rows if r["doc_id"] == 1)
    assert n1 == len(body)


def test_retract_rows_equals_full_recompute(spark):
    from bigdata_scala_offline_data_clean_spark.operators.incremental import (
        partial_agg,
        retract_rows,
    )

    e = _events(spark, n=2000)
    cum = partial_agg(e, ["event_type"], sum_cols=("value",))
    dele = e.where(F.col("user_id") % 5 == 0)
    got = retract_rows(cum, dele, ["event_type"], sum_cols=("value",))
    want = partial_agg(
        e.where(F.col("user_id") % 5 != 0), ["event_type"], sum_cols=("value",)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_retract_rows_refuses_minmax(spark):
    import pytest as _pytest

    from bigdata_scala_offline_data_clean_spark.operators.incremental import (
        partial_agg,
        retract_rows,
    )

    e = _events(spark, n=100)
    cum = partial_agg(e, ["event_type"], sum_cols=("value",), min_cols=("value",))
    with _pytest.raises(ValueError, match="not retractable"):
        retract_rows(cum, e.limit(5), ["event_type"], sum_cols=("value",))


def test_pareto_frontier_matches_quadratic_model(spark):
    """Window-based skyline == the O(n^2) strict-dominance definition."""
    from bigdata_scala_offline_data_clean_spark.queries.extensions import (
        a85_pareto_frontier,  # noqa: F401  (definition check via operator logic)
    )
    import itertools
    import random

    rng = random.Random(3)
    rows = [
        ("B1", i, round(rng.uniform(1, 50), 2), rng.randint(1, 20))
        for i in range(80)
    ]
    # exact duplicate pair: strict dominance keeps BOTH
    rows += [("B1", 900, 5.0, 5), ("B1", 901, 5.0, 5)]
    df = spark.createDataFrame(
        rows, ["p_brand", "p_partkey", "p_retailprice", "p_size"]
    )

    def dominated(p, q):
        return (
            q[2] <= p[2] and q[3] <= p[3] and (q[2] < p[2] or q[3] < p[3])
        )

    want = {
        p[1]
        for p in rows
        if not any(dominated(p, q) for q in rows if q[1] != p[1])
    }
    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r["p_partkey"] for r in a85_pareto_frontier(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == want
    # exact duplicates: strict dominance keeps both or neither
    assert (900 in got) == (901 in got)


def test_stream_partials_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: running the same batch_id twice must
    not double-count (each batch overwrites its deterministic subdir)."""
    from bigdata_scala_offline_data_clean_spark.operators.sketches import (
        merge_bitmap_distinct,
        merge_sketch_rollup,
    )

    e = _events(spark, n=1000, users=97)
    sk_store = str(tmp_path / "sk")
    bm_store = str(tmp_path / "bm")
    # simulate foreachBatch at-least-once: batch 0 written, then REPLAYED
    # after a failed commit -- same write shape as streaming/jobs.py
    from bigdata_scala_offline_data_clean_spark.operators.sketches import (
        bitmap_distinct_partials,
        partial_sketches,
    )

    def write_sk(batch_df, batch_id):
        p = partial_sketches(
            batch_df.withColumn("__batch", F.lit(batch_id)),
            ["event_type"], "__batch", "user_id", "value",
        )
        p.write.mode("overwrite").parquet(f"{sk_store}/__bid={batch_id}")

    def write_bm(batch_df, batch_id):
        p = bitmap_distinct_partials(
            batch_df.withColumn("__batch", F.lit(batch_id)),
            ["event_type"], "__batch", "user_id",
        )
        p.write.mode("overwrite").parquet(f"{bm_store}/__bid={batch_id}")

    half_a = e.where(F.col("event_id") % 2 == 0)
    half_b = e.where(F.col("event_id") % 2 == 1)
    for batch_df, bid in [(half_a, 0), (half_b, 1), (half_a, 0)]:  # replay 0
        write_sk(batch_df, bid)
        write_bm(batch_df, bid)

    merged = merge_sketch_rollup(spark.read.parquet(sk_store), ["event_type"])
    assert sum(r["n_rows"] for r in merged.collect()) == 1000  # no double count
    bm = merge_bitmap_distinct(spark.read.parquet(bm_store), ["event_type"])
    exact = {
        r["event_type"]: r["nd"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert {r["event_type"]: r["distinct_count"] for r in bm.collect()} == exact
