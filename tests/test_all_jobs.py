"""The switch-over proof: every one of the reference's 12 jobs runs
end-to-end on this engine, against ODS data synthesized from the schema
registry, producing DWD/DWS tables with the positional shape the reference's
``insertInto`` contract requires (data cols + audit cols + etl_date last).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_scala_offline_data_clean_spark.pipelines import JOBS, run_job
from bigdata_scala_offline_data_clean_spark.schemas import (
    ODS_SCHEMAS,
    dwd_schema,
    with_partition,
)
from bigdata_scala_offline_data_clean_spark.sources.catalog import Warehouse

ETL = "20221001"
BASE_TS = datetime(2022, 10, 1, 8, 0, 0)


def _value(field: T.StructField, i: int):
    t = field.dataType
    if isinstance(t, T.IntegerType):
        return i
    if isinstance(t, (T.LongType,)):
        return i
    if isinstance(t, T.DoubleType):
        return i * 1.5
    if isinstance(t, T.TimestampType):
        return BASE_TS + timedelta(minutes=i)
    if field.name.endswith("_time"):  # string-typed time columns
        return (BASE_TS + timedelta(minutes=i)).strftime("%Y-%m-%d %H:%M:%S")
    return f"{field.name}_{i}"


def _rows(schema: T.StructType, n: int = 3):
    return [
        tuple(_value(f, i) for f in schema.fields) + (ETL,) for i in range(n)
    ]


@pytest.fixture(scope="module")
def loaded_wh(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_wh")
    wh = Warehouse(spark, str(root))
    for table, schema in ODS_SCHEMAS.items():
        df = spark.createDataFrame(_rows(schema), with_partition(schema))
        wh.append(df, "ods", table)
    # delta snapshots for the three archetype-C jobs: one row matching the
    # 20221001 rowkey regex (id 99, new), one stale (filtered out)
    for cfg in (c for c in JOBS.values() if c.archetype == "C"):
        schema = ODS_SCHEMAS[cfg.ods_table]
        fresh = tuple(
            99 if f.name == cfg.merge_col else _value(f, 99) for f in schema.fields
        )
        stale = tuple(
            98 if f.name == cfg.merge_col else _value(f, 98) for f in schema.fields
        )
        delta_schema = T.StructType(
            [T.StructField("row_key", T.StringType())] + list(schema.fields)
        )
        df = spark.createDataFrame(
            [("rk_20221001_99",) + fresh, ("rk_20220930_98",) + stale],
            delta_schema,
        )
        df.write.parquet(f"{root}/delta/{cfg.delta_table}")
    return wh, str(root / "delta")


def test_all_twelve_jobs_run(spark, loaded_wh):
    wh, delta_root = loaded_wh
    pin = F.lit("2022-10-01 12:00:00").cast("timestamp")
    # A and B first (D consumes their outputs), then C, then D
    order = ["A", "B", "C", "D"]
    for arch in order:
        for cfg in (c for c in JOBS.values() if c.archetype == arch):
            etl = run_job(wh, cfg.name, delta_root=delta_root, ts=pin, etl_date=ETL)
            assert etl == ETL, cfg.name

    # every DWD target exists with the positional contract
    for cfg in JOBS.values():
        if cfg.archetype == "D":
            continue
        out = wh.table("dwd", cfg.dwd_table)
        expected = [f.name for f in dwd_schema(cfg.ods_table).fields]
        assert out.columns == expected, cfg.name
        assert out.count() >= 3, cfg.name

    # archetype C: delta-only row merged in, stale rowkey dropped
    for cfg in (c for c in JOBS.values() if c.archetype == "C"):
        keys = {
            r[cfg.merge_col]
            for r in wh.table("dwd", cfg.dwd_table).collect()
        }
        assert 99 in keys and 98 not in keys, cfg.name

    # archetype D: dws table with audit cols; every customer present
    dws = wh.table("dws", "customer_addr_level_aggr")
    assert {"dws_insert_user", "dws_insert_time", "etl_date"} <= set(dws.columns)
    assert dws.count() == 3


def test_scd1_second_day_updates(spark, loaded_wh):
    """Day-2 increment over the same warehouse: archetype B upserts."""
    wh, _ = loaded_wh
    schema = ODS_SCHEMAS["customer_inf"]
    day2 = [
        (0, "customer_name_UPDATED", 0, "extend_info_0",
         datetime(2022, 10, 2, 9, 0, 0), "20221002"),
        (7, "customer_name_7", 7, "extend_info_7",
         datetime(2022, 10, 2, 9, 0, 0), "20221002"),
    ]
    wh.append(
        spark.createDataFrame(day2, with_partition(schema)), "ods", "customer_inf"
    )
    pin = F.lit("2022-10-02 12:00:00").cast("timestamp")
    assert run_job(wh, "customer_inf", ts=pin) == "20221002"
    latest = {r.customer_id: r for r in wh.latest("dwd", "dim_customer_inf").collect()}
    assert latest[0].customer_name == "customer_name_UPDATED"
    assert str(latest[0].dwd_modify_time) == "2022-10-02 12:00:00"
    assert latest[7].customer_name == "customer_name_7"  # new key
    assert latest[1].customer_name == "customer_name_1"  # untouched survivor
    assert str(latest[1].dwd_insert_time) == "2022-10-01 12:00:00"  # preserved


def test_all_twelve_jobs_run_against_catalog_names(spark, tmp_path_factory):
    """The reference's user surface: the same 12 jobs run with tables
    addressed as ods.t / dwd.t / dws.t through a real SQL catalog
    (SqlWarehouse), writes flowing through INSERT ... PARTITION statements
    (Constants.scala:9-12, CustomerInfDataClean.scala:70-88)."""
    from bigdata_scala_offline_data_clean_spark.sources.catalog import SqlWarehouse

    root = tmp_path_factory.mktemp("cat_wh")
    wh = SqlWarehouse(spark, db_prefix="tjobs_")
    try:
        for table, schema in ODS_SCHEMAS.items():
            df = spark.createDataFrame(_rows(schema), with_partition(schema))
            wh.append(df, "ods", table)
        for cfg in (c for c in JOBS.values() if c.archetype == "C"):
            schema = ODS_SCHEMAS[cfg.ods_table]
            fresh = tuple(
                99 if f.name == cfg.merge_col else _value(f, 99)
                for f in schema.fields
            )
            delta_schema = T.StructType(
                [T.StructField("row_key", T.StringType())] + list(schema.fields)
            )
            spark.createDataFrame(
                [("rk_20221001_99",) + fresh], delta_schema
            ).write.parquet(f"{root}/delta/{cfg.delta_table}")

        pin = F.lit("2022-10-01 12:00:00").cast("timestamp")
        for arch in ["A", "B", "C", "D"]:
            for cfg in (c for c in JOBS.values() if c.archetype == arch):
                etl = run_job(
                    wh, cfg.name, delta_root=f"{root}/delta", ts=pin, etl_date=ETL
                )
                assert etl == ETL, cfg.name
        for cfg in JOBS.values():
            if cfg.archetype == "D":
                continue
            out = wh.table("dwd", cfg.dwd_table)
            expected = [f.name for f in dwd_schema(cfg.ods_table).fields]
            assert sorted(out.columns) == sorted(expected), cfg.name
            assert out.count() >= 3, cfg.name
        assert wh.table("dws", "customer_addr_level_aggr").count() == 3
    finally:
        wh.drop_all()
