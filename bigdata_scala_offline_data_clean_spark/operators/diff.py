"""Snapshot diff: CDC-style classification of rows between two table versions.

The reference's archetype-C jobs merge a base snapshot with a delta
(OrderMasterDataClean.scala:157-180) but never *report* what changed; any
warehouse operating that merge loop needs the inverse operator -- given two
snapshots of the same table, classify every key as added / removed / changed
/ unchanged and surface the before/after values.  That is the audit query
behind every SCD-1 load, backfill verification, and data-contract check.

Scale: one full-outer shuffled equi-join on the key (Spark picks
SMJ/shuffled-hash; AQE splits skew).  Change detection is a null-safe
column comparison (``<=>``) folded into a single projection -- no second
pass, no per-column joins.  At 100 TB this is exactly one exchange per
side, same as the archetype-C merge it audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
) -> DataFrame:
    """Full-outer join old vs new on ``key`` and classify each row.

    Output: the key columns, ``<c>_old`` / ``<c>_new`` for every compared
    column, and ``status_col`` in {'added','removed','changed','unchanged'}.

    ``compare_cols`` defaults to every shared non-key column.  Comparison is
    null-safe (NULL == NULL is *not* a change), matching what an SCD-1
    loader would treat as "no update".
    """
    keys = [key] if isinstance(key, str) else list(key)
    if compare_cols is None:
        compare_cols = [
            c for c in old_df.columns if c in set(new_df.columns) and c not in keys
        ]

    left = old_df.select(
        *[F.col(k).alias(f"__l_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("__l_present"),
    )
    right = new_df.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("__r_present"),
    )
    cond = [left[f"__l_{k}"] == right[f"__r_{k}"] for k in keys]
    j = left.join(right, cond, "full_outer")

    # any_changed: at least one compared column differs under null-safe
    # equality.  eqNullSafe never returns NULL, so the OR-fold is total.
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))

    status = (
        F.when(F.col("__l_present").isNull(), F.lit("added"))
        .when(F.col("__r_present").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__l_{k}"), F.col(f"__r_{k}")).alias(k)
            for k in keys
        ],
        *[col for c in compare_cols for col in (F.col(f"{c}_old"), F.col(f"{c}_new"))],
        status.alias(status_col),
    )


def apply_cdc(
    base_df: DataFrame,
    changes_df: DataFrame,
    key: str | list[str],
    op_col: str = "op",
    order_col: str | None = None,
    tiebreak: str | list[str] | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply an insert/update/delete change log to a base snapshot
    (MERGE INTO semantics as a batch operator).

    ``changes_df`` carries the base's data columns plus ``op_col`` in
    {'I','U','D'} (and ``order_col`` when a batch can hold several ops per
    key -- the latest wins, deterministically with ``tiebreak``).  Result:
    base rows untouched by any change, plus the surviving I/U rows;
    keys whose final op is 'D' disappear.

    Scale: one window pass over the (small) change batch, then a single
    anti-join of the base against the change keys -- with
    ``broadcast_changes`` (the daily-delta default) the base never shuffles
    (same argument as the archetype-C small-delta path,
    pipelines.run_delta_merge).  Pass ``broadcast_changes=False`` for
    backfill-sized batches and let AQE pick the join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    latest = changes_df
    if order_col is not None:
        from .etl import dedup_latest

        latest = dedup_latest(changes_df, keys, order_col, tiebreak)
    change_keys = latest.select(*keys)
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    untouched = base_df.join(change_keys, keys, "left_anti")
    survivors = latest.where(F.col(op_col) != "D").select(*base_df.columns)
    return untouched.unionByName(survivors)


def diff_summary(
    diff_df: DataFrame, status_col: str = "diff_status"
) -> DataFrame:
    """Per-status row counts over a ``snapshot_diff`` result (one groupBy)."""
    return diff_df.groupBy(status_col).agg(F.count(F.lit(1)).alias("n_rows"))


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    update_cond=None,
    delete_cond=None,
    insert_cond=None,
    strict: bool = False,
) -> DataFrame:
    """Predicate-driven ``MERGE INTO`` (Delta/Iceberg-style) as a batch op.

    The op-code complement of ``apply_cdc``: here actions derive from the
    match status plus WHEN-clause predicates, as in

        MERGE INTO target t USING source s ON t.key = s.key
        WHEN MATCHED AND <delete_cond> THEN DELETE
        WHEN MATCHED AND <update_cond> THEN UPDATE SET * (default: always)
        WHEN NOT MATCHED AND <insert_cond> THEN INSERT * (default: always)

    ``target`` and ``source`` share a schema (key + data columns).  Each
    condition is a callable ``(t, s) -> Column`` where ``t``/``s`` map
    column name -> Column for the target/source side of the matched row
    (``t`` values are null in NOT-MATCHED rows and vice versa).

    Scale: ONE full-outer shuffled equi-join on the key -- both sides
    exchange once, AQE handles skew; with bucketed storage on the key
    (sources/catalog bucketing, c27) the exchange disappears entirely.
    For tiny daily deltas prefer ``apply_cdc`` (broadcast anti-join; the
    base never shuffles).

    Two deliberate divergences from ANSI/Delta MERGE (document-or-assert,
    per round-6 advice):

    - **Duplicate source keys**: Delta/ANSI MERGE raises "multiple source
      rows matched" when several source rows would actually MODIFY one
      target row; the lenient default here instead emits one output row
      PER source row (join multiplicity).  Pass ``strict=True`` to get
      the Delta behavior, clause-conditions included (round-8 advice
      fix -- the previous strict check raised on any duplicate matched
      key even when ``update_cond``/``delete_cond`` excluded the extras):
      ``raise_error`` fires at execution time only when >1 SOURCE row
      satisfies an UPDATE/DELETE clause against the same TARGET ROW --
      UNLESS every such pair is a DELETE (all deletes of one row
      commute, which Delta explicitly permits).  The ambiguity unit is
      the target row, not the key (round-9 advice fix: the previous
      per-KEY counts both spuriously raised when duplicate TARGET keys
      -- legal in SQL MERGE -- were each matched by one modifying source
      row, and silently collapsed duplicate unmodified target rows to
      one): each target row is tagged with a unique id before the join,
      and the counts/dedup partition by (key, target-id).  Matched pairs
      no clause modifies collapse to ONE pass-through row per TARGET
      row, and duplicate NOT-matched keys remain legal multi-row
      inserts, exactly as in SQL MERGE.  The default stays lenient for
      pre-deduplicated CDC feeds where the extra window pass is wasted
      work (dedup upstream with ``etl.dedup_latest``).
    - **Clause precedence is fixed** at DELETE-before-UPDATE (a matched
      row satisfying both conditions is deleted); SQL evaluates WHEN
      clauses in caller-written order.  Callers porting a MERGE whose
      UPDATE clause precedes a DELETE must fold the negated update
      condition into ``delete_cond``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    data_cols = [c for c in target.columns if c not in keys]
    # strict mode tags every TARGET row with a unique id before the join
    # so the duplicate-match analysis partitions per target row, not per
    # key (duplicate target keys are legal; duplicate modifying SOURCE
    # rows per target row are the Delta error).  The id is transient --
    # computed once at the scan, carried through the single join, never
    # output -- so monotonically_increasing_id's partition-layout
    # dependence cannot leak into results.
    tid = [F.monotonically_increasing_id().alias("__tid")] if strict else []
    t_side = target.select(
        *keys, *tid, F.lit(True).alias("__t"), *[F.col(c).alias(f"__t_{c}") for c in data_cols]
    )
    s_side = source.select(
        *keys, F.lit(True).alias("__s"), *[F.col(c).alias(f"__s_{c}") for c in data_cols]
    )
    j = t_side.join(s_side, keys, "full_outer")
    t_map = {c: F.col(f"__t_{c}") for c in data_cols}
    s_map = {c: F.col(f"__s_{c}") for c in data_cols}
    matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
    # SQL MERGE treats a NULL WHEN-clause predicate as NOT satisfied (the
    # row falls through to the next clause) -- coalesce to false so a
    # nullable column in a condition can never silently delete/skip a row
    def _cond(fn, default: bool):
        if fn is None:
            return F.lit(default)
        return F.coalesce(fn(t_map, s_map), F.lit(False))

    upd = _cond(update_cond, True)
    dele = _cond(delete_cond, False)
    ins = _cond(insert_cond, True)
    if strict:
        from pyspark.sql import Window

        # Delta's duplicate-match rule, conditions included (round-8
        # advice fix, re-scoped per TARGET ROW in round 9): a (target,
        # source) pair is MODIFYING when some WHEN MATCHED clause would
        # fire for it.  >1 modifying SOURCE row per TARGET ROW is the
        # ambiguity Delta raises on -- unless every modifying pair is a
        # DELETE (deleting one row twice commutes).  The counts ride
        # windows partitioned by (key, __tid): HashPartitioning on the
        # join key satisfies the clustered distribution of the superset
        # (same key => same partition => same (key, __tid) co-located),
        # so the windows still reuse the full-outer join's exchange --
        # only a within-partition sort is added, no new shuffle.
        # NOT-matched source rows carry a NULL __tid and share a frame
        # per key, but __mod is false for every unmatched pair, so the
        # gate cannot misfire there and the ~matched filter arm keeps
        # them all (NULL-keyed duplicate sources included: NULLs never
        # equi-match, so they fall through as legal multi-row inserts).
        wk = Window.partitionBy(*keys, "__tid")
        j = (
            j.withColumn("__mod", matched & (dele | upd))
            .withColumn("__del", matched & dele)
            .withColumn(
                "__mod_n",
                F.sum(F.when(F.col("__mod"), F.lit(1)).otherwise(F.lit(0))).over(wk),
            )
            .withColumn(
                "__del_n",
                F.sum(F.when(F.col("__del"), F.lit(1)).otherwise(F.lit(0))).over(wk),
            )
        )
        # always-true filter that forces the check expression to evaluate
        # (an unreferenced column would be pruned away)
        j = j.where(
            F.when(
                (F.col("__mod_n") > 1) & (F.col("__mod_n") != F.col("__del_n")),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "merge_into: multiple source rows matched key ("
                        ),
                        F.concat_ws(
                            ", ", *[F.col(k).cast("string") for k in keys]
                        ),
                        F.lit(") and would modify the same target row"),
                    )
                ).isNull(),
            ).otherwise(F.lit(True))
        )
        # Duplicate source rows that pass the gate still fan the matched
        # target row out once per pair; SQL MERGE emits each target row
        # once.  Per TARGET ROW, keep the modifying pair(s) -- at most
        # one unless all are commuting deletes -- else one
        # representative pair (every non-modifying pair projects
        # identical target values, so the row_number pick is
        # content-neutral).  Partitioning by (key, __tid) means distinct
        # unmodified target rows each keep their own representative --
        # duplicate target keys no longer collapse.
        wrn = wk.orderBy(F.col("__mod").desc())
        j = (
            j.withColumn("__rn", F.row_number().over(wrn))
            .where(~matched | F.col("__mod") | (F.col("__rn") == 1))
            .drop("__mod", "__del", "__mod_n", "__del_n", "__rn")
        )
    keep = F.when(matched, ~dele).when(F.col("__s").isNotNull(), ins).otherwise(
        F.lit(True)
    )
    take_source = (matched & ~dele & upd) | (
        F.col("__t").isNull() & F.col("__s").isNotNull()
    )
    out = j.where(keep).select(
        *keys,
        *[
            F.when(take_source, s_map[c]).otherwise(t_map[c]).alias(c)
            for c in data_cols
        ],
    )
    return out.select(*target.columns)
