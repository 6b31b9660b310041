"""Mergeable sketch aggregates: the incremental-rollup path at 100 TB.

Exact ``COUNT(DISTINCT)`` / ``percentile`` over a 100 TB fact table cost a
full shuffle of the distinct keys (or a single-buffer value sort) EVERY time
a report runs.  The production pattern is instead:

1. **partials**: per ingest partition (e.g. per ``etl_date``), aggregate
   once into fixed-size mergeable sketches -- Apache DataSketches HLL for
   distinct counts, KLL for quantiles, Theta for distinct-set algebra
   (union/intersection across dimensions).  A sketch is a few KB regardless
   of input size.
2. **store** the sketch rows next to the rollup (a binary column in the
   warehouse -- ``Warehouse.append`` handles it like any other column).
3. **merge on read**: answering "distinct users all-time / any date range"
   unions the per-partition sketches -- bytes shuffled = O(partitions x
   sketch_size), NOT O(distinct keys).  New partitions just append partials;
   nothing is recomputed (same O(delta) contract as
   ``operators/incremental.py``, which keeps decimal-exact partials for
   algebraic aggregates -- sketches extend it to the non-algebraic ones).

Spark 4's builtin DataSketches functions (``hll_sketch_agg`` /
``hll_union_agg``, ``kll_sketch_agg_double`` / ``kll_merge_agg_double``,
``theta_sketch_agg``) keep everything JVM-side and whole-stage-codegen'd;
the binary sketch columns flow through parquet unchanged.

Estimates are engine-specific, so driver-checked queries pair each estimate
with its exact companion and emit error-bound BOOLEANS the DuckDB oracle
asserts as TRUE (the a27 self-verifying pattern): HLL's relative standard
error at lgK=12 is ~1.6%, so a 5% bound is >3 sigma; KLL's rank error at
k=200 is ~1.7%, bounded at 5 rank points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_LGK = 12  # 2^12 registers, ~1.6% RSE
KLL_K = 200  # ~1.7% one-sided rank error


def partial_sketches(
    df: DataFrame,
    keys: list[str],
    part_col: str,
    distinct_col: str,
    value_col: str,
) -> DataFrame:
    """Per-(keys, partition) sketch partials -- the rows you would STORE.

    One aggregation pass over the partition's rows; output is
    ``keys + [part_col, hll_users, kll_values, n_rows]`` where the sketch
    columns are opaque binary, a few KB each.
    """
    return df.groupBy(*keys, part_col).agg(
        F.hll_sketch_agg(distinct_col, F.lit(HLL_LGK)).alias("hll_users"),
        F.kll_sketch_agg_double(value_col, F.lit(KLL_K)).alias("kll_values"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketch_rollup(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge stored partials into per-``keys`` estimates.

    Shuffles only the sketch rows (O(partitions) of a few KB), never the
    underlying events: ``distinct_est`` from the HLL union, ``p50_est``
    from the KLL merge, exact ``n_rows`` by summing the partial counts.
    """
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("hll_users", F.lit(False))
        ).alias("distinct_est"),
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("kll_values"), F.lit(0.5)
        ).alias("p50_est"),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_rollup(
    df: DataFrame,
    keys: list[str],
    part_col: str,
    distinct_col: str,
    value_col: str,
) -> DataFrame:
    """partials -> merge, end to end: per-``keys`` (distinct_est, p50_est,
    n_rows).  The two-level shape (sketch per partition, union across
    partitions) is asserted equivalent to a one-shot sketch by the unit
    tests -- the mergeability property that makes the stored-partial
    pattern correct."""
    partials = partial_sketches(df, keys, part_col, distinct_col, value_col)
    return merge_sketch_rollup(partials, keys)


def theta_distinct_by(
    df: DataFrame, keys: list[str], distinct_col: str
) -> DataFrame:
    """Per-``keys`` Theta sketch estimates (set-algebra-capable distinct).

    Theta sketches additionally support intersection/difference across
    groups (HLL only unions); emitted here as the estimate per group."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_estimate(F.theta_sketch_agg(distinct_col)).alias(
            "theta_distinct_est"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def bitmap_distinct_partials(
    df: DataFrame, keys: list[str], part_col: str, col: str
) -> DataFrame:
    """EXACT mergeable distinct-count partials via Spark's bitmap aggregates.

    HLL trades ~1.6% error for a fixed few KB; when the distinct column is
    a bounded integer id space, bitmaps give the same store-partials /
    merge-on-read shape with NO error: values hash to (bucket, bit
    position), each (keys, partition, bucket) row holds one bitmap, and
    merging is bitwise OR.  Output rows: ``keys + [part_col, bucket,
    bm]``.
    """
    return df.groupBy(
        *keys, part_col, F.bitmap_bucket_number(F.col(col)).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col(col))).alias("bm")
    )


def merge_bitmap_distinct(partials: DataFrame, keys: list[str]) -> DataFrame:
    """OR-merge stored bitmap partials -> exact ``distinct_count`` per keys.

    Two aggregations: OR within (keys, bucket) -- any partition range,
    incrementally appended -- then bit counts summed per keys.  Unlike the
    HLL path this is oracle-exact: the result equals COUNT(DISTINCT) with
    no tolerance band.
    """
    merged = partials.groupBy(*keys, "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_bits")
    )
    return merged.groupBy(*keys).agg(
        F.sum("n_bits").alias("distinct_count")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency counters for heavy-hitter queries
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # counters per row (one md5 hex byte -> 0..255)


def _cms_bucket(h, j: int, width: int):
    """Bucket for depth ``j``: md5 hex chars (2j+1, 2j+2) as one byte.

    Portable integer arithmetic -- the DuckDB oracle mirrors it with the
    same ascii-nibble CASE used by ``dedup.simhash``.
    """
    val = F.conv(F.substring(h, 2 * j + 1, 2), 16, 10).cast("int")
    return val % width if width < 256 else val


def cms_counters(
    counts: DataFrame,
    key_col: str,
    n_col: str = "n",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min counter table from pre-aggregated (key, n) counts.

    Output: (j, bucket, cnt) -- at most ``depth x width`` rows regardless
    of input size, the mergeable partial for streaming/rollup frequency
    estimation (merge = per-(j, bucket) SUM, same store-partials /
    merge-on-read shape as the HLL/bitmap paths above).  Building from the
    per-key count table (not raw rows) keeps the explode O(distinct keys):
    at 100 TB the raw-event explode would 4x the shuffle for no accuracy
    gain, since CMS adds counts per key anyway.
    """
    h = F.md5(F.col(key_col).cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_bucket(h, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        counts.select(F.col(n_col).alias("__n"), F.explode(rows).alias("r"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("__n").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: adds ``cms_est`` = min over depths of the
    key's counters.  CMS never under-counts, so ``cms_est >= true count``
    deterministically; the width bounds the expected overcount at
    ``e * N / width`` per depth row.

    The counter table is at most ``depth x width`` rows -> broadcast; the
    keys side never shuffles.
    """
    h = F.md5(F.col(key_col).cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_bucket(h, j, width).alias("bucket")
            )
        for j in range(depth)
        ]
    )
    out_cols = keys.columns
    exploded = keys.select(*out_cols, F.explode(rows).alias("r")).select(
        *out_cols, F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket")
    )
    joined = exploded.join(F.broadcast(counters), ["j", "bucket"], "left")
    return joined.groupBy(*out_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


# ---------------------------------------------------------------------------
# Portable deterministic HyperLogLog (round 11).  Unlike the stock
# approx_count_distinct path (Spark-internal sketch, rows-only checkable),
# these registers derive from md5, so any engine recomputes the identical
# estimate -- the a208 oracle checks it exact-match.  256 registers
# (p = 8); rho = 49 - bitlength(next 48 hash bits); harmonic sum kept
# integer-exact as sum(2^(49 - rho)) in BIGINT (max 256 * 2^48 < 2^57).
# ---------------------------------------------------------------------------

HLL_M = 256
HLL_ALPHA_C = 2.6499581405668102e19  # alpha_256 * m^2 * 2^49, exact literal


def hll_registers(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key HLL register table ``keys + (reg, r)`` -- the mergeable
    partial: register tables from disjoint shards merge by ``max(r)``
    per (keys, reg), exactly like any partition-local sketch.

    NULL values are dropped up front (ADVICE r11/r12): COUNT(DISTINCT x)
    ignores NULLs, but md5(NULL) is NULL and would land a (reg=NULL,
    r=NULL) row that inflates ``__filled`` in :func:`hll_estimate`,
    skewing the small-range correction on NULL-bearing columns."""
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    x = F.conv(F.substring(h, 3, 12), 16, 10).cast("bigint")
    rho = F.when(x == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(x)))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a register table into ``keys + (hll_estimate,)`` with the
    HLL++ small-range correction (linear counting when V > 0 and the raw
    estimate <= 2.5m)."""
    per = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__filled"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - r)")).alias("__s"),
    )
    v = F.lit(HLL_M) - F.col("__filled")
    s = F.col("__s") + v.cast("bigint") * F.lit(2**49).cast("bigint")
    e_raw = F.lit(HLL_ALPHA_C) / s.cast("double")
    est = F.when(
        (v > 0) & (e_raw <= 2.5 * HLL_M),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return per.select(*keys, est.alias("hll_estimate"))


# -- Bloom filter (round 16) -------------------------------------------------
#
# The broadcast-membership sketch: k md5-derived positions per id over an
# m-slot space.  The OCCUPIED-POSITION SET (distinct over k x |keys|,
# <= m ints) is the filter's semantic content -- the m-bit bitmap without
# the bit packing -- and is small enough to fold into a corpus scan as a
# literal array (the expr-text fold rule), so the membership screen adds
# ZERO plan nodes beyond the scan: no join, no shuffle.  No false
# negatives by construction; callers rescue false positives with an
# exact verify over the candidates only (a219's broadcast left-semi).
# Positions reuse the a208 HLL md5 idiom, so a DuckDB oracle recomputes
# them bit-identically.


def bloom_pos_sql(id_sql: str, i: int, m: int) -> str:
    """Engine-portable SQL text of hash probe ``i``: 48 md5 bits of
    ``id:i`` mod ``m``.  The DuckDB twin spells the hex cast as
    ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || ':i'), 1, 12)) AS
    BIGINT) % m`` -- identical arithmetic."""
    return (
        f"cast(conv(substring(md5(concat(cast({id_sql} as string), "
        f"':{i}')), 1, 12), 16, 10) as bigint) % {m}"
    )


# bits/key for a 1% false-positive target, times 100: ceil(100 *
# ln(1/0.01) / ln(2)^2) = ceil(958.51) = 959.  Precomputed as an INTEGER
# constant so both engines size m with exact integer arithmetic instead
# of each rounding its own ln() calls (the engine-parity rule).
BLOOM_BITS_PER_KEY_X100 = 959


def bloom_sized_m(n_keys: int) -> int:
    """The production filter width for ``n_keys`` at the 1% FPR target:
    next power of two >= ceil(n_keys * 9.59) bits.  Integer-exact; the
    SQL twin recomputes it as ``(nb * 959 + 99) // 100`` + a min over
    powers of two.  With the fixed k = 3 probes the theoretical FPR at
    this m is (1 - e^(-3/9.59))^3 ~ 0.019 <= 2 * target -- the bound
    a222's census checks against."""
    target = max((n_keys * BLOOM_BITS_PER_KEY_X100 + 99) // 100, 1)
    return 1 << (target - 1).bit_length()


def bloom_setbits(
    keys: DataFrame, id_col: str, m: int = 1024, k: int = 3
) -> list[int]:
    """Build the filter: the sorted occupied-position set, a BOUNDED
    driver fetch (<= m ints) -- the shippable broadcast artifact, like
    a frozen quantizer or a calibrated tau."""
    pos_any = F.explode(
        F.array(*[F.expr(bloom_pos_sql(id_col, i, m)) for i in range(k)])
    )
    return sorted(
        r[0] for r in keys.select(pos_any.alias("p")).distinct().collect()
    )


def bloom_candidate_expr(
    setbits: list[int], id_col: str, m: int = 1024, k: int = 3
) -> Column:
    """Membership screen as ONE parsed expression: candidate iff ALL k
    probe positions are occupied.  Pure expression -- folds into the
    scan, never a join."""
    if not setbits:
        # an empty filter has no occupied positions -> nothing is a
        # candidate.  The literal form would emit array() (type
        # array<null>) and fail analysis against the bigint probe
        # (ADVICE r16).
        return F.lit(False)
    arr = "array(" + ", ".join(str(int(p)) for p in setbits) + ")"
    return F.expr(
        " AND ".join(
            f"array_contains({arr}, {bloom_pos_sql(id_col, i, m)})"
            for i in range(k)
        )
    )
