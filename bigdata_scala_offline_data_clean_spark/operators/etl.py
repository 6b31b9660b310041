"""Core ETL operator library (SURVEY.md §2, archetypes A-D).

Each operator is a pure DataFrame -> DataFrame function built from stock
``pyspark.sql.functions`` -- no UDFs, no RDDs -- so every transformation
stays inside whole-stage codegen and Catalyst can push, prune, reorder and
broadcast freely.  Reference semantics are cited per function; the latent
bugs catalogued in SURVEY.md §8 (Q1-Q6) are fixed with the documented intent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P2 -- rename projection
# ---------------------------------------------------------------------------

def rename_prefix(df: DataFrame, prefix: str, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Alias every column to ``<prefix><col>``.

    Reference: the 23-column ``SELECT c AS hive_c ...`` scans
    (OrderMasterDataClean.scala:44-66, OrderDetailDataClean.scala:38-50,
    ProductBrowseDataClean.scala:39-45).  A pure Project node -- zero cost,
    folded into the scan by Catalyst.
    """
    return df.select(
        *[
            F.col(c) if c in exclude else F.col(c).alias(f"{prefix}{c}")
            for c in df.columns
        ]
    )


# ---------------------------------------------------------------------------
# P3/P4 + F1/F2 -- audit stamping
# ---------------------------------------------------------------------------

def stamp_audit(
    df: DataFrame,
    user: str = "user1",
    layer: str = "dwd",
    ts: Column | None = None,
    etl_date: str | None = None,
) -> DataFrame:
    """Append the 4 audit columns (+ optionally ``etl_date`` last).

    Reference: SimpleDataCleanUtils.scala:24-27 stamps
    ``dwd_insert_user/_time, dwd_modify_user/_time`` with ``lit(user1)`` /
    ``current_timestamp()``; OrderMasterDataClean.scala:182-186 and
    CustomerAddrLevelAggrDataClean.scala:34-38 (``dws_*``) are identical.

    ``ts`` is injectable so tests/oracles can pin a deterministic timestamp
    (the reference itself left commented-out fixed literals for this purpose,
    SimpleDataCleanUtils.scala:15-16).

    Fixes Q4: the reference appended a *second* ``etl_date`` to a ``SELECT *``
    that already carried one (SimpleDataCleanUtils.scala:20), breaking
    positional insertInto; here ``etl_date`` is added only if absent (or
    replaced if supplied).
    """
    ts = F.current_timestamp() if ts is None else ts
    out = (
        df.withColumn(f"{layer}_insert_user", F.lit(user))
        .withColumn(f"{layer}_insert_time", ts)
        .withColumn(f"{layer}_modify_user", F.lit(user))
        .withColumn(f"{layer}_modify_time", ts)
    )
    if etl_date is not None:
        out = out.withColumn("etl_date", F.lit(etl_date))
    # keep etl_date as the last column (positional-insert contract,
    # SimpleDataCleanUtils.scala:30)
    if "etl_date" in out.columns:
        rest = [c for c in out.columns if c != "etl_date"]
        out = out.select(*rest, "etl_date")
    return out


# ---------------------------------------------------------------------------
# W1 + P7 + P5 -- SCD-1 window dedup
# ---------------------------------------------------------------------------

def dedup_latest(
    df: DataFrame,
    key: str | list[str],
    order_col: str,
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Keep the newest row per business key.

    Reference: ``row_number() over (partition by <key> order by <order> desc)``
    then ``rank == 1`` and drop (CustomerInfDataClean.scala:41-45,
    ProductInfoDataClean.scala:31-33, CouponInfoDataClean.scala:31-33).

    Fixes Q3 (nondeterministic ties): the reference orders *only* by
    ``modified_time`` desc, so an ODS row and its DWD twin with equal
    timestamps are picked arbitrarily.  ``tiebreak`` columns (desc) make the
    choice deterministic -- pipelines pass ``data_source`` ('ods' > 'dwd'
    lexicographically, so desc prefers fresh ODS rows) plus a stable id.

    Scale: one hash-exchange on ``key`` + per-partition sort -- the minimal
    plan for top-1-per-group.  AQE skew-join/partition-coalescing handles hot
    keys; no collect, no UDF.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in ties]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") == 1)
        .drop("__rank")
    )


# ---------------------------------------------------------------------------
# U1 + W1 + F4 composite -- SCD-1 upsert (archetype B)
# ---------------------------------------------------------------------------

def scd1_upsert(
    ods_df: DataFrame,
    dwd_df: DataFrame | None,
    key: str | list[str],
    order_col: str,
    user: str = "user1",
    ts: Column | None = None,
    etl_date: str | None = None,
    layer: str = "dwd",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Merge the latest ODS partition into the DWD dimension (SCD type 1).

    Reference flow (CustomerInfDataClean.scala:27-61; same in
    ProductInfoDataClean, CouponInfoDataClean):

    1. mark both sides with ``data_source`` ('ods' / 'dwd')       (:32-33)
    2. ``unionByName``                                            (:37)
    3. window-dedup newest per key                                (:41-45)
    4. final projection with CASE-preserved audit times: rows that came
       from DWD keep their original ``insert_time``; ODS rows get the
       current run's timestamp                                    (:46-61)

    Fixes Q3 (deterministic tie -> prefer ODS), Q5 (the reference named its
    run-timestamp column literally ``current_timestamp``, shadowing the SQL
    function; here it is ``__op_ts``), and Q6 (single plan, no double
    computation -- callers persist before multi-action use).

    First-run friendly: ``dwd_df=None`` treats the target as empty.
    """
    ts = F.current_timestamp() if ts is None else ts
    keys = [key] if isinstance(key, str) else list(key)

    data_cols = [c for c in ods_df.columns if c != "etl_date"]
    ods = ods_df.select(*data_cols).withColumn("data_source", F.lit("ods"))
    # synthesize audit cols on the ODS side so the union is schema-aligned
    ods = (
        ods.withColumn(f"{layer}_insert_user", F.lit(user))
        .withColumn(f"{layer}_insert_time", F.lit(None).cast("timestamp"))
        .withColumn(f"{layer}_modify_user", F.lit(user))
        .withColumn(f"{layer}_modify_time", F.lit(None).cast("timestamp"))
    )

    if dwd_df is not None:
        dwd = dwd_df.drop("etl_date").withColumn("data_source", F.lit("dwd"))
        combined = ods.unionByName(dwd)
    else:
        combined = ods

    extra = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    combined = combined.withColumn("__op_ts", ts)
    deduped = dedup_latest(
        combined, keys, order_col, tiebreak=["data_source"] + extra
    )

    # F4: CASE-preserved audit columns (CustomerInfDataClean.scala:55,58).
    # BOTH times are conditional: rows that survived from DWD are unchanged
    # data, so insert_time AND modify_time keep their stored values; ODS rows
    # are new/updated, so both get the run timestamp.
    is_ods = F.col("data_source") == "ods"
    out = (
        deduped.withColumn(
            f"{layer}_insert_time",
            F.when(is_ods, F.col("__op_ts")).otherwise(F.col(f"{layer}_insert_time")),
        )
        .withColumn(
            f"{layer}_modify_time",
            F.when(is_ods, F.col("__op_ts")).otherwise(F.col(f"{layer}_modify_time")),
        )
        .withColumn(f"{layer}_modify_user", F.lit(user))
        .drop("data_source", "__op_ts")
    )
    if etl_date is not None:
        out = out.withColumn("etl_date", F.lit(etl_date))
    return out


# ---------------------------------------------------------------------------
# J1 + J3 -- full-outer coalesce merge (archetype C)
# ---------------------------------------------------------------------------

def merge_full_outer(
    base_df: DataFrame,
    delta_df: DataFrame,
    key: str | list[str],
    prefer: str = "base",
) -> DataFrame:
    """Full-outer join two snapshots on a key, coalescing per column.

    Reference: Hive latest partition FULL OUTER JOIN the HBase delta, then
    ``coalesce(hive_c, c) AS c`` per column so the Hive value wins and the
    delta fills gaps (OrderMasterDataClean.scala:157-180,
    OrderDetailDataClean.scala:105-117, ProductBrowseDataClean.scala:88-94).

    Fixes Q1: the reference renamed every Hive column to ``hive_*`` then
    joined ``USING (order_id)`` -- unresolvable, since the left side has no
    bare ``order_id``.  The clear intent is an equi-join on the key with the
    key itself coalesced; implemented here with explicit prefixes on *both*
    sides so no name collides, then a single coalesce projection.

    Scale: a pure shuffled equi-join -- Spark picks SMJ/shuffled-hash and AQE
    splits skewed keys.  If one side is small (a daily delta usually is),
    callers can pass ``delta_df = F.broadcast(delta)``-wrapped input; the
    pipeline layer does this automatically under a size hint.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = base_df.columns  # both sides must share the data-column set
    missing = [c for c in cols if c not in delta_df.columns]
    if missing:
        raise ValueError(f"delta side missing columns: {missing}")

    left = base_df.select(*[F.col(c).alias(f"__l_{c}") for c in cols])
    right = delta_df.select(*[F.col(c).alias(f"__r_{c}") for c in cols])
    cond = [left[f"__l_{k}"] == right[f"__r_{k}"] for k in keys]
    joined = left.join(right, cond, "full_outer")

    first, second = ("__l_", "__r_") if prefer == "base" else ("__r_", "__l_")
    return joined.select(
        *[
            F.coalesce(F.col(f"{first}{c}"), F.col(f"{second}{c}")).alias(c)
            for c in cols
        ]
    )


# ---------------------------------------------------------------------------
# J2 -- star denormalisation (archetype D)
# ---------------------------------------------------------------------------

def star_denormalize(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Chained left-outer joins of a fact/anchor table against dimensions.

    Reference: ``customer_inf ⟕ customer_addr ON customer_id ⟕
    customer_level_inf ON customer_level``
    (CustomerAddrLevelAggrDataClean.scala:28-30).

    Scale: dimensions are broadcast by default -- at 100 TB the fact side
    never shuffles; each join is a map-side hash join.  Set
    ``broadcast_dims=False`` for dimension tables too big to broadcast and
    let AQE decide.
    """
    out = fact
    for dim, on in dims:
        on_cols = [on] if isinstance(on, str) else list(on)
        dim_side = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(dim_side, on=on_cols, how="left")
    return out


def spread_narrow_scan(df: DataFrame, key: str) -> DataFrame:
    """Widen a byte-split scan before a row-multiplying operator.

    Parquet splits by BYTES (``spark.sql.files.maxPartitionBytes``); a text
    column that explodes ~50x into grams/tokens/chunks can arrive as ONE
    input split and run the whole cascade in one task (measured 2.7s ->
    0.4s at sf0.1).  When the scan is narrower than the core count,
    repartition on ``key`` (a cheap shuffle of the pre-explode rows); on a
    cluster-scale input the scan is already wide and this is a no-op.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism, key)
    return df
