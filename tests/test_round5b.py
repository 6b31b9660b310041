from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.dedup import containment_pairs
from bigdata_scala_offline_data_clean_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
)


def _counts(spark, rows):
    return spark.createDataFrame(rows, "k string, n bigint")


def test_cms_never_undercounts(spark):
    rows = [(f"key{i}", (i % 7) + 1) for i in range(300)]
    counts = _counts(spark, rows)
    counters = cms_counters(counts, "k", "n")
    est = cms_estimate(counts, counters, "k").collect()
    assert len(est) == 300
    for r in est:
        assert r.cms_est >= r.n, (r.k, r.cms_est, r.n)


def test_cms_counter_table_bounded_and_mass_preserved(spark):
    rows = [(f"key{i}", 5) for i in range(1000)]
    counters = cms_counters(_counts(spark, rows), "k", "n")
    got = counters.collect()
    assert len(got) <= CMS_DEPTH * CMS_WIDTH
    # every depth row holds the full mass: sum over buckets == sum(n)
    per_depth = {r.j: 0 for r in got}
    for r in got:
        per_depth[r.j] += r.cnt
    assert set(per_depth) == set(range(CMS_DEPTH))
    assert all(v == 5000 for v in per_depth.values())


def test_cms_exact_when_no_collisions(spark):
    # 3 keys in 4x256 buckets: collisions across all 4 depths are
    # effectively impossible, so min over depths is exact
    counts = _counts(spark, [("a", 10), ("b", 20), ("c", 30)])
    counters = cms_counters(counts, "k", "n")
    est = {r.k: r.cms_est for r in cms_estimate(counts, counters, "k").collect()}
    assert est == {"a": 10, "b": 20, "c": 30}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_containment_detects_subset_duplicate(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = "intro words here " + short + " and a very long unrelated tail " + (
        "filler " * 20
    ).strip()
    d = _docs(spark, [(1, short), (2, long), (3, "totally different text corpus")])
    out = containment_pairs(d, n=3, threshold=0.9).collect()
    pairs = {(r.a, r.b): r.containment for r in out}
    # every shingle of doc 1 appears in doc 2 -> containment 1.0 that way
    assert pairs[(1, 2)] == 1.0
    # the reverse direction is weak (long doc mostly not in short) -> absent
    assert (2, 1) not in pairs


def test_containment_stop_gram_cap_drops_boilerplate(spark):
    # the same boilerplate gram in every doc; unrelated payloads otherwise
    rows = [(i, f"shared legal boilerplate p{i} q{i} r{i} s{i}") for i in range(6)]
    d = _docs(spark, rows)
    uncapped = containment_pairs(d, n=3, threshold=0.1).collect()
    capped = containment_pairs(d, n=3, threshold=0.1, max_gram_df=3).collect()
    # without the cap the shared gram links all pairs; with it, none survive
    assert len(uncapped) > 0
    assert len(capped) == 0


def test_stream_cms_partials_merge_equals_batch_sketch(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
        stream_cms_partials,
    )

    rows = [(i, i % 17) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, k long")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, k long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = str(tmp_path / "partials")
    q = (
        stream_cms_partials(stream, store, "k")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    merged = {
        (r.j, r.bucket): r.cnt
        for r in spark.read.parquet(store)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    batch = {
        (r.j, r.bucket): r.cnt
        for r in cms_counters(
            df.groupBy("k").agg(F.count(F.lit(1)).alias("n")), "k", "n"
        ).collect()
    }
    # linearity: summed per-batch counters == counters of the full input
    assert merged == batch


def test_debounce_rearms_from_kept_anchor(spark):
    from bigdata_scala_offline_data_clean_spark.operators.pandas_ops import (
        debounce,
    )

    # t = 0, 3, 6 with gap 5: a session window would merge all three
    # (gaps of 3 < 5); debounce keeps {0, 6} because it re-arms from the
    # last KEPT anchor, not the previous event
    df = spark.createDataFrame(
        [(1, 10, 0), (1, 11, 3), (1, 12, 6), (2, 20, 0)],
        "user_id long, event_id long, ts_us long",
    )
    out = {
        r.event_id: r.kept
        for r in debounce(df, "user_id", "ts_us", "event_id", 5).collect()
    }
    assert out == {10: True, 11: False, 12: True, 20: True}


def test_prefix_filter_matches_full_inverted_index(spark):
    from bigdata_scala_offline_data_clean_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "a completely different document about spark plans"),
        (4, "a completely different document about spark physics"),
        (5, "unrelated text with no overlap at all whatsoever here"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    }
    pref = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in prefix_filter_pairs(d, n=3, threshold=0.5).collect()
    }
    # prefix filtering is exact: identical result set to the full index
    assert pref == full
    assert (1, 2) in pref


def test_versioned_warehouse_time_travel(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.sources.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(1, "a2")], "k long, v string")
    assert wh.list_versions("dwd", "t") == []
    v1 = wh.write_version(df1, "dwd", "t")
    v2 = wh.write_version(df2, "dwd", "t")
    assert (v1, v2) == (1, 2)
    assert wh.list_versions("dwd", "t") == [1, 2]
    # old snapshots stay readable after new writes
    assert wh.read_version("dwd", "t", 1).count() == 2
    assert wh.read_version("dwd", "t").count() == 1  # latest


def test_scd3_merge_tracks_only_real_changes(spark):
    from bigdata_scala_offline_data_clean_spark.operators.scd2 import scd3_merge

    dim = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "k long, seg string"
    )
    # 1: real change; 2: same-value update (no churn); 3: no update
    u = spark.createDataFrame([(1, "X"), (2, "B")], "k long, seg string")
    out = {r.k: (r.seg, r.prev_seg) for r in scd3_merge(dim, u, "k", "seg").collect()}
    assert out == {1: ("X", "A"), 2: ("B", None), 3: ("C", None)}
    # second merge: prev only moves on another real change
    dim2 = scd3_merge(dim, u, "k", "seg")
    u2 = spark.createDataFrame([(1, "Y"), (3, "C")], "k long, seg string")
    out2 = {
        r.k: (r.seg, r.prev_seg) for r in scd3_merge(dim2, u2, "k", "seg").collect()
    }
    assert out2 == {1: ("Y", "X"), 2: ("B", None), 3: ("C", None)}
