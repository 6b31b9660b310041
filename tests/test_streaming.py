"""Structured Streaming jobs: incremental archetype A, dedup, windowed agg."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
    run_available_now,
    stream_append_clean,
    stream_dedup,
    stream_windowed_counts,
)


def _write_batch(spark, path, rows):
    from datetime import datetime

    typed = [(k, datetime.fromisoformat(ts), v) for k, ts, v in rows]
    spark.createDataFrame(
        typed, "k int, ts timestamp, v string"
    ).write.mode("append").parquet(path)


def test_stream_append_clean(spark, tmp_path):
    src = str(tmp_path / "drop")
    _write_batch(spark, src, [(1, "2022-10-01 00:00:00", "a")])
    schema = spark.read.parquet(src).schema
    stamped = stream_append_clean(
        spark, src, schema, ts=F.lit("2022-10-01 12:00:00"), etl_date="20221001"
    )
    assert stamped.isStreaming
    out = run_available_now(stamped, spark)
    row = out.first()
    assert row.dwd_insert_user == "user1"
    assert row.etl_date == "20221001"
    assert out.columns[-1] == "etl_date"


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    _write_batch(
        spark,
        src,
        [
            (1, "2022-10-01 00:00:00", "first"),
            (1, "2022-10-01 00:30:00", "dup"),
            (2, "2022-10-01 00:10:00", "only"),
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = run_available_now(stream_dedup(stream, "k", "ts"), spark)
    assert out.count() == 2
    assert {r.k for r in out.collect()} == {1, 2}


def test_stream_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "win_src")
    _write_batch(
        spark,
        src,
        [
            (1, "2022-10-01 00:05:00", "x"),
            (2, "2022-10-01 00:55:00", "x"),
            (3, "2022-10-01 01:05:00", "x"),
            (4, "2022-10-01 01:06:00", "y"),
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    counts = stream_windowed_counts(stream, "ts", "v", "1 hour", "1 hour")
    out = run_available_now(counts, spark)
    got = {
        (str(r.window_start), r.v): r.n_events for r in out.collect()
    }
    assert got[("2022-10-01 00:00:00", "x")] == 2
    assert got[("2022-10-01 01:00:00", "x")] == 1
    assert got[("2022-10-01 01:00:00", "y")] == 1


def test_stream_stateful_counter(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
        stream_stateful_counter,
    )

    src = str(tmp_path / "state_src")
    _write_batch(
        spark,
        src,
        [
            (1, "2022-10-01 00:00:00", "a"),
            (1, "2022-10-01 00:10:00", "b"),
            (2, "2022-10-01 00:20:00", "c"),
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("amount", F.col("k") * 10.0)
    )
    counted = stream_stateful_counter(stream, "k", "amount", "ts")
    out = {r.key: r for r in run_available_now(counted, spark).collect()}
    assert out[1].n_events == 2 and out[1].total == 20.0
    assert out[2].n_events == 1 and out[2].total == 20.0


def test_stream_upsert_scd1_merges_micro_batches(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.sources.catalog import Warehouse
    from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
        stream_upsert_scd1,
    )

    src = str(tmp_path / "upsert_src")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _write_batch(spark, src, [(1, "2022-10-01 00:00:00", "a"),
                              (2, "2022-10-01 00:00:00", "b")])
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        writer = stream_upsert_scd1(
            stream, wh, "dwd", "dim", key="k", order_col="ts",
            ts=F.to_timestamp(F.lit("2022-10-02 00:00:00")), etl_date="20221002",
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()

    run_once()
    assert wh.table("dwd", "dim").count() == 2

    # second drop: key 2 updated (later ts), key 3 new
    _write_batch(spark, src, [(2, "2022-10-03 00:00:00", "b2"),
                              (3, "2022-10-03 00:00:00", "c")])
    run_once()
    rows = {r.k: r for r in wh.table("dwd", "dim").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].v == "b2"  # newest wins per key
    assert rows[1].v == "a"   # untouched key survives the merge


def test_stream_dedup_within_watermark_bounded_state(spark, tmp_path):
    from bigdata_scala_offline_data_clean_spark.streaming.jobs import (
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "ddww_src")
    # key 1 appears twice within the watermark (one survivor) and key 2 once
    _write_batch(spark, src, [
        (1, "2022-10-01 00:00:00", "a"),
        (1, "2022-10-01 00:10:00", "dup"),
        (2, "2022-10-01 00:20:00", "b"),
    ])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = run_available_now(
        stream_dedup_within_watermark(stream, "k", "ts", "1 hour"), spark
    )
    rows = sorted((r.k, r.v) for r in out.collect())
    assert [k for k, _ in rows] == [1, 2]  # one row per key in-horizon
