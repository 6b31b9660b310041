"""The four pipeline archetypes + the reference's 12 job configs as data.

The reference is 12 ``main()`` objects that fall into four shapes (SURVEY.md
§0/§3).  Here each shape is one parametrized function over a ``Warehouse``,
and the 12 jobs are rows in ``JOBS`` -- the per-job constants blocks
(e.g. ``CustomerAddrDataClean.scala:9-10``, ``CustomerInfDataClean.scala:16-17``,
``OrderMasterDataClean.scala:24-31``) become plain dataclasses.

Scale notes
-----------
- A: narrow plan, zero shuffles -- scan one partition, project, append.
- B: exactly one shuffle (window over the merge key); the union is logical.
  DWD side reads only its *latest* partition, never table history.
- C: the delta is a daily increment and is typically tiny next to the base
  partition, so the full-outer merge broadcasts the delta when
  ``broadcast_delta`` (default auto from the optimizer's file-size
  estimate vs ``autoBroadcastJoinThreshold`` -- no extra action); Spark
  cannot broadcast a full outer join directly, so the small-delta path is
  decomposed into left-join + anti-join union (same semantics, no full
  shuffle of the base).
- D: dimensions broadcast; the anchor never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.etl import merge_full_outer, scd1_upsert, stamp_audit, star_denormalize
from .sources.catalog import Warehouse
from .sources.delta_snapshot import read_delta_snapshot


def yesterday_yyyymmdd(today: date | None = None) -> str:
    """F5: driver-side date math (CustomerAddrLevelAggrDataClean.scala:17-19)."""
    return ((today or date.today()) - timedelta(days=1)).strftime("%Y%m%d")


# ---------------------------------------------------------------------------
# Archetype A -- simple append clean (SimpleDataCleanUtils.scala:8-33)
# ---------------------------------------------------------------------------


def run_append_clean(
    wh: Warehouse,
    ods_table: str,
    dwd_table: str,
    user: str = "user1",
    ts: Column | None = None,
) -> str:
    """Latest ODS partition -> stamp audit cols -> append to DWD.

    Returns the processed etl_date.  Q4 fixed: exactly one trailing etl_date.
    """
    latest = wh.latest_partition("ods", ods_table)
    if latest is None:
        raise FileNotFoundError(f"ods.{ods_table} has no partitions")
    df = wh.partition("ods", ods_table, latest)
    out = stamp_audit(df, user=user, ts=ts, etl_date=latest)
    wh.append(out, "dwd", dwd_table)
    return latest


# ---------------------------------------------------------------------------
# Archetype B -- SCD-1 merge-dedup upsert (CustomerInfDataClean.scala:20-91)
# ---------------------------------------------------------------------------


def run_scd1_merge(
    wh: Warehouse,
    ods_table: str,
    dwd_table: str,
    merge_col: str,
    order_by_col: str,
    user: str = "user1",
    ts: Column | None = None,
    tiebreak: str | list[str] | None = None,
) -> str:
    """union(latest ODS, latest DWD) -> keep newest per key -> dynamic
    partition overwrite of the DWD table (S9)."""
    latest_ods = wh.latest_partition("ods", ods_table)
    if latest_ods is None:
        raise FileNotFoundError(f"ods.{ods_table} has no partitions")
    ods_df = wh.partition("ods", ods_table, latest_ods)
    latest_dwd = wh.latest_partition("dwd", dwd_table)
    dwd_df = (
        wh.partition("dwd", dwd_table, latest_dwd) if latest_dwd is not None else None
    )
    out = scd1_upsert(
        ods_df,
        dwd_df,
        key=merge_col,
        order_col=order_by_col,
        user=user,
        ts=ts,
        etl_date=latest_ods,
        tiebreak=tiebreak,
    )
    wh.overwrite_partitions(out, "dwd", dwd_table)
    return latest_ods


# ---------------------------------------------------------------------------
# Archetype C -- base ⋈ delta-snapshot merge (OrderMasterDataClean.scala:37-192)
# ---------------------------------------------------------------------------


def run_delta_merge(
    wh: Warehouse,
    ods_table: str,
    dwd_table: str,
    delta_path: str,
    merge_col: str,
    rowkey_regex: str | None = None,
    user: str = "user1",
    ts: Column | None = None,
    broadcast_delta: bool | None = None,
    decoders: dict | None = None,
) -> str:
    """Latest ODS partition FULL-OUTER-merged with the offline delta snapshot
    (the HBase side-channel, S4/S5), base value preferred per column (J3),
    then audit-stamped and appended to DWD.

    Q1 fixed (join resolvable, key coalesced); delta-only rows get the
    target partition's etl_date backfilled.

    Scale: when the delta is small (the normal case -- one day of
    supplements vs the full base partition), a full-outer SMJ shuffles the
    entire base.  Instead: base LEFT JOIN broadcast(delta) (override cols)
    UNION delta-rows-not-in-base (broadcast anti join) -- zero base shuffle.
    Falls back to the plain full-outer for large deltas.
    """
    latest = wh.latest_partition("ods", ods_table)
    if latest is None:
        raise FileNotFoundError(f"ods.{ods_table} has no partitions")
    base = wh.partition("ods", ods_table, latest).drop("etl_date")
    delta = read_delta_snapshot(
        wh.spark, delta_path, rowkey_pattern=rowkey_regex, decoders=decoders
    )
    delta = delta.drop("row_key").drop("snapshot_date")

    missing = [c for c in base.columns if c not in delta.columns]
    if missing:
        raise ValueError(f"delta snapshot missing columns: {missing}")
    delta = delta.select(*base.columns)

    # Route small deltas to the broadcast decomposition WITHOUT an extra
    # action: Catalyst's file-statistics size estimate is a driver-side
    # plan lookup, whereas the previous ``delta.count()`` launched a full
    # scan job before the merge even started.  ``broadcast_delta`` forces
    # the choice either way.
    if broadcast_delta is None:
        est = _estimated_plan_bytes(delta)
        threshold = _parse_bytes(
            wh.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
        broadcast_delta = est is not None and 0 < threshold and est <= threshold
    if broadcast_delta:
        merged = _small_delta_merge(base, delta, merge_col)
    else:
        merged = merge_full_outer(base, delta, merge_col, prefer="base")

    out = stamp_audit(merged, user=user, ts=ts, etl_date=latest)
    wh.append(out, "dwd", dwd_table)
    return latest


_BYTE_SUFFIX = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
                "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Spark size confs come back as '10485760', '10485760b', or '10MB'."""
    s = str(v).strip().lower()
    for suf in sorted(_BYTE_SUFFIX, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _BYTE_SUFFIX[suf])
    return int(float(s))


def _estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (file statistics; no job).

    The decoder/regex projection over a parquet snapshot keeps file-level
    sizeInBytes, so this reflects the on-disk delta size -- exactly the
    signal Spark itself uses for broadcast decisions.  Returns ``None``
    where the estimate is unavailable (Connect, or a non-file source).
    """
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    # Catalyst signals "unknown" with Long.MaxValue-ish sentinels
    return size if 0 < size < (1 << 62) else None


def _small_delta_merge(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Full-outer + per-column coalesce semantics without shuffling the base.

    base ⟕ broadcast(delta): coalesce(base_c, delta_c) per column (base wins,
    J3); plus broadcast left-anti for delta-only rows.  Both joins broadcast
    the delta => the base stays map-side only.
    """
    cols = base.columns
    d = F.broadcast(delta.select(*[F.col(c).alias(f"__d_{c}") for c in cols]))
    left = base.join(d, F.col(key) == F.col(f"__d_{key}"), "left").select(
        *[F.coalesce(F.col(c), F.col(f"__d_{c}")).alias(c) for c in cols]
    )
    # Delta-only rows WITHOUT broadcasting any base-derived frame: the base
    # partition is the huge side (that is why this fast path exists), so
    # broadcasting base.select(key) would OOM at scale exactly when the path
    # matters.  Instead: (1) map-side inner join over the base against the
    # broadcast delta keys -> `matched` has at most |delta| rows; (2) anti-join
    # the delta against broadcast(matched).  Every broadcast is delta-sized and
    # the base never shuffles or collects.
    # distinct() bounds matched to <=|delta| keys even if the base somehow
    # carried duplicate rowkeys; the shuffle it costs is over a delta-sized
    # frame, not the base.
    matched = (
        base.select(key)
        .join(F.broadcast(delta.select(key)), on=key, how="inner")
        .distinct()
    )
    only_delta = delta.join(F.broadcast(matched), on=key, how="left_anti")
    return left.unionByName(only_delta.select(*cols))


# ---------------------------------------------------------------------------
# Archetype D -- DWS star denormalisation
#                (CustomerAddrLevelAggrDataClean.scala:9-47)
# ---------------------------------------------------------------------------


def run_star_aggregate(
    wh: Warehouse,
    anchor: tuple[str, str],
    dims: list[tuple[str, str, str]],
    dws_table: str,
    user: str = "user1",
    ts: Column | None = None,
    etl_date: str | None = None,
) -> str:
    """anchor ⟕ dim1 ⟕ dim2 ... -> stamp dws audit cols + yesterday etl_date
    -> overwrite the DWS table (S10).

    ``anchor``: (layer, table); ``dims``: (layer, table, join_col).
    """
    etl = etl_date or yesterday_yyyymmdd()
    fact = wh.table(*anchor).drop("etl_date")
    # Disambiguate dim columns that collide with the anchor or earlier dims
    # (every reference dim carries modified_time + audit cols): non-key
    # duplicates become <table>_<col>, keeping the denormalized row wide and
    # unambiguous.  Join keys keep their names (USING-join semantics).
    seen = set(fact.columns)
    dim_frames = []
    for layer, tbl, col in dims:
        dim = wh.table(layer, tbl).drop("etl_date")
        keys = {col} if isinstance(col, str) else set(col)
        renames = {
            c: f"{tbl}_{c}" for c in dim.columns if c in seen and c not in keys
        }
        for old, new in renames.items():
            dim = dim.withColumnRenamed(old, new)
        seen |= set(dim.columns)
        dim_frames.append((dim, col))
    joined = star_denormalize(fact, dim_frames)
    out = stamp_audit(joined, user=user, layer="dws", ts=ts, etl_date=etl)
    wh.overwrite_table(out, "dws", dws_table)
    return etl


# ---------------------------------------------------------------------------
# The 12 reference jobs as data
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class JobConfig:
    """One reference job (the constants block at the top of each handler)."""

    name: str
    archetype: str  # A | B | C | D
    ods_table: str | None = None
    dwd_table: str | None = None
    merge_col: str | None = None
    order_by_col: str | None = None
    delta_table: str | None = None  # archetype C: offline-supplement source
    rowkey_regex: str | None = None
    anchor: tuple[str, str] | None = None  # archetype D
    dims: list[tuple[str, str, str]] = field(default_factory=list)
    dws_table: str | None = None


JOBS: dict[str, JobConfig] = {
    # -- archetype A (SimpleDataCleanUtils callers) -------------------------
    "customer_addr": JobConfig(
        "customer_addr", "A", ods_table="customer_addr", dwd_table="dim_customer_addr"
    ),  # CustomerAddrDataClean.scala:9-10
    "customer_login_log": JobConfig(
        "customer_login_log", "A",
        ods_table="customer_login_log", dwd_table="log_customer_login",
    ),  # CustomerLoginLogDataClean.scala
    "customer_level_inf": JobConfig(
        "customer_level_inf", "A",
        ods_table="customer_level_inf", dwd_table="dim_customer_level_inf",
    ),  # CustomerLevelInfDataClean.scala
    "order_cart": JobConfig(
        "order_cart", "A", ods_table="order_cart", dwd_table="fact_order_cart"
    ),  # OrderCartDataClean.scala
    "coupon_use": JobConfig(
        "coupon_use", "A", ods_table="coupon_use", dwd_table="fact_coupon_use"
    ),  # CouponUseDataClean.scala
    # -- archetype B (SCD-1 merge) ------------------------------------------
    "customer_inf": JobConfig(
        "customer_inf", "B",
        ods_table="customer_inf", dwd_table="dim_customer_inf",
        merge_col="customer_id", order_by_col="modified_time",
    ),  # CustomerInfDataClean.scala:14-17
    "product_info": JobConfig(
        "product_info", "B",
        ods_table="product_info", dwd_table="dim_product_info",
        merge_col="product_core", order_by_col="modified_time",
    ),  # ProductInfoDataClean.scala:12-15
    "coupon_info": JobConfig(
        "coupon_info", "B",
        ods_table="coupon_info", dwd_table="dim_coupon_info",
        merge_col="coupon_id", order_by_col="modified_time",
    ),  # CouponInfoDataClean.scala:12-15
    # -- archetype C (delta-snapshot merge; regex = reference's hard-coded
    #    ".*20221001.*", OrderMasterDataClean.scala:29-30) ------------------
    "order_master": JobConfig(
        "order_master", "C",
        ods_table="order_master", dwd_table="fact_order_master",
        merge_col="order_id", delta_table="order_master_offline",
        rowkey_regex=".*20221001.*",
    ),  # OrderMasterDataClean.scala:24-31
    "order_detail": JobConfig(
        "order_detail", "C",
        ods_table="order_detail", dwd_table="fact_order_detail",
        merge_col="order_detail_id", delta_table="order_detail_offline",
        rowkey_regex=".*20221001.*",
    ),  # OrderDetailDataClean.scala:24-28
    "product_browse": JobConfig(
        "product_browse", "C",
        ods_table="product_browse", dwd_table="log_product_browse",
        merge_col="log_id", delta_table="product_browse_offline",
        rowkey_regex=".*20221001.*",
    ),  # ProductBrowseDataClean.scala:24-28
    # -- archetype D (DWS star) ---------------------------------------------
    "customer_addr_level_aggr": JobConfig(
        "customer_addr_level_aggr", "D",
        anchor=("dwd", "dim_customer_inf"),
        dims=[
            ("dwd", "dim_customer_addr", "customer_id"),
            ("dwd", "dim_customer_level_inf", "customer_level"),
        ],
        dws_table="customer_addr_level_aggr",
    ),  # CustomerAddrLevelAggrDataClean.scala:10-30
}


def training_data_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_uniq_ratio: float = 0.3,
    neardup_threshold: float = 0.6,
    shingle_n: int = 2,
) -> DataFrame:
    """The composed LLM-training-data cleaning pipeline:

    quality filter (token count + uniqueness ratio) -> exact dedup (digest
    groupBy, keep smallest id) -> near-dedup (MinHash-LSH pairs; the larger
    id of each verified pair is dropped).

    Every stage is one of this package's operators; the whole chain is
    lazy -- one shuffle per stage, no driver round-trips.
    """
    from .operators.dedup import exact_dedup, minhash_dedup_pairs
    from .operators.text import with_text_stats

    stats = with_text_stats(docs, text_col)
    kept = stats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_uniq_tokens") / F.col("n_tokens") >= min_uniq_ratio)
    ).select(*docs.columns)

    # exact feeds BOTH the near-dup pair mining and the final anti-join;
    # unpersisted, the quality-stats projection + dedup window re-run on
    # each branch (measured ~25% of the pipeline at sf0.1).  At 100 TB
    # prefer writing the exact-deduped corpus once and reading it back.
    exact = exact_dedup(kept, id_col, text_col).persist()

    pairs = minhash_dedup_pairs(
        exact, id_col, text_col, shingle_n=shingle_n, threshold=neardup_threshold
    )
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    return exact.join(drop, on=id_col, how="left_anti")


def run_job(
    wh: Warehouse,
    job: str | JobConfig,
    delta_root: str | None = None,
    user: str = "user1",
    ts: Column | None = None,
    etl_date: str | None = None,
) -> str:
    """Run one reference job by name against a warehouse.

    ``delta_root``: directory holding the offline-supplement parquet tables
    for archetype C (``<delta_root>/<delta_table>``).
    """
    cfg = JOBS[job] if isinstance(job, str) else job
    if cfg.archetype == "A":
        return run_append_clean(wh, cfg.ods_table, cfg.dwd_table, user=user, ts=ts)
    if cfg.archetype == "B":
        return run_scd1_merge(
            wh, cfg.ods_table, cfg.dwd_table, cfg.merge_col, cfg.order_by_col,
            user=user, ts=ts,
        )
    if cfg.archetype == "C":
        if delta_root is None:
            raise ValueError(f"job {cfg.name} needs delta_root")
        return run_delta_merge(
            wh, cfg.ods_table, cfg.dwd_table,
            f"{delta_root}/{cfg.delta_table}", cfg.merge_col,
            rowkey_regex=cfg.rowkey_regex, user=user, ts=ts,
        )
    if cfg.archetype == "D":
        return run_star_aggregate(
            wh, cfg.anchor, cfg.dims, cfg.dws_table,
            user=user, ts=ts, etl_date=etl_date,
        )
    raise ValueError(f"unknown archetype {cfg.archetype}")
