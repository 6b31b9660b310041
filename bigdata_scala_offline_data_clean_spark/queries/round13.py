"""Round-13 queries: trained-quantizer SemDeDup at production k (the BLAS
scale path as a gated surface) and the mergeable-HLL shard rollup.

a209 (VERDICT r11/r12 task #1): round 11 measured that SemDeDup at a
FIXED k is quadratic in the corpus (126x at 10x) while k ~ sqrt(n) with
the BLAS assignment restores linearity -- but that scale path existed
only as a SCALE.md prose claim.  This registers it: deterministic
trained centroids (canonical-order bounded sample, k = isqrt(n)) +
``semdedup(assign="matmul")`` -- vectorized nearest-centroid assignment
and tiled per-cluster BLAS pair search, whale-cluster capped.  Rows-only
by design (k-means is float-iterative; a207's pinned-seed variant is the
exact-match oracle for the semdedup ALGEBRA -- cluster assign, closure,
keeper choice -- so the SQL-expressible semantics stay covered), with
the quality pin travelling IN the result (keep_rate + keep_ok floor,
the a16 recall_ok pattern) and a differential pytest pinning
matmul == fold on the same trained centroids (tests/test_round13.py).

a210 (VERDICT r11/r12 task #6): the a208 docstring claims the HLL
register table is a mergeable partial -- this query EXERCISES the claim
end to end and oracle-checks it: per-day shard register tables fold by
max(r) into a merged table whose estimate must equal the global
single-pass estimate BIT-EXACTLY (max is associative over any shard
split).  This is the 100 TB rollup shape: daily register tables persist
(256 rows per key per day), and any date-range distinct-count is a
max-merge + fold over sketches, never a rescan of the raw data.

Reference parity note: the reference ETL suite (873 lines,
src/main/scala/com/kanseiu/spark/handler -- warehouse jobs only) has no
ANN/dedup/sketch surface; this family extends the engine into the
training-data domain per the brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_SD_COS = 0.3  # near-dup threshold on the 6dp cosine (a207/a21's tau)
_A209_KEEP_FLOOR = 0.5  # >= half the corpus must survive (paper regime
# removes a minority at tau this high; going under means the quantizer
# or threshold regressed)


def a209_semdedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at production k: trained quantizer (k = isqrt(n)), BLAS
    assignment + tiled per-cluster pair search (assign='matmul')."""
    from ..operators.ordering import pin_frame
    from ..operators.similarity import semdedup, train_ivf_centroids

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(4, math.isqrt(n))
    cents = train_ivf_centroids(
        e, n_clusters=k, sample_size=2048, seed=42, order_col="vec_id"
    )
    out = pin_frame(  # consumed by the stat agg AND the final select
        semdedup(e, cents, threshold=_SD_COS, assign="matmul")
    )
    stats = out.agg(
        F.round(F.avg(F.col("is_kept").cast("double")), 4).alias("keep_rate"),
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("cluster").alias("n_clusters_used"),
    )
    return (
        out.crossJoin(F.broadcast(stats))
        .withColumn("keep_ok", F.col("keep_rate") >= F.lit(_A209_KEEP_FLOOR))
        .select(
            "vec_id",
            "cluster",
            "group_id",
            "d2c",
            "is_kept",
            "keep_rate",
            "n_total",
            "n_clusters_used",
            "keep_ok",
        )
    )


QUERIES["a209_semdedup_trained"] = QuerySpec(a209_semdedup_trained, None)


def a210_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-HLL rollup: per-day shard register tables max-merge into
    the global register table; merged estimate == global estimate."""
    from ..operators.sketches import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    sharded = ev.withColumn("__shard", F.date_format("ts", "yyyy-MM-dd"))
    shard_regs = hll_registers(
        sharded, ["event_type", "__shard"], "user_id"
    )
    merged = shard_regs.groupBy("event_type", "reg").agg(
        F.max("r").alias("r")
    )
    est_m = hll_estimate(merged, ["event_type"]).select(
        "event_type", F.col("hll_estimate").alias("__m")
    )
    est_g = hll_estimate(
        hll_registers(ev, ["event_type"], "user_id"), ["event_type"]
    ).select("event_type", F.col("hll_estimate").alias("__g"))
    shards = sharded.groupBy("event_type").agg(
        F.countDistinct("__shard").alias("n_shards")
    )
    return (
        est_m.join(est_g, "event_type")
        .join(shards, "event_type")
        .select(
            "event_type",
            "n_shards",
            F.round("__m", 6).alias("hll_merged"),
            F.round("__g", 6).alias("hll_global"),
            (F.col("__m") == F.col("__g")).alias("merge_exact"),
        )
    )


def _a210_sql() -> str:
    from ..operators.sketches import HLL_ALPHA_C, HLL_M

    def est(regs: str) -> str:
        return f"""
  SELECT event_type, count(*) AS filled,
         sum(CAST(1 AS BIGINT) << (49 - r)) AS s_filled
  FROM {regs} GROUP BY event_type
"""

    def fold(per: str) -> str:
        return f"""
  SELECT event_type,
         CASE WHEN ({HLL_M} - filled) > 0
                   AND ({HLL_ALPHA_C!r} /
                        CAST(s_filled + ({HLL_M} - filled)
                             * (CAST(1 AS BIGINT) << 49) AS DOUBLE))
                       <= {2.5 * HLL_M}
              THEN CAST({HLL_M} AS DOUBLE)
                   * ln(CAST({HLL_M} AS DOUBLE)
                        / CAST({HLL_M} - filled AS DOUBLE))
              ELSE {HLL_ALPHA_C!r} /
                   CAST(s_filled + ({HLL_M} - filled)
                        * (CAST(1 AS BIGINT) << 49) AS DOUBLE)
         END AS e
  FROM {per}
"""

    return f"""
WITH hashed AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS shard,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
              AS INTEGER) AS reg,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12))
              AS BIGINT) AS x
  FROM events
  WHERE user_id IS NOT NULL  -- mirrors hll_registers' NULL drop
), rhod AS (
  SELECT event_type, shard, reg,
         CASE WHEN x = 0 THEN 49 ELSE 49 - length(bin(x)) END AS rho
  FROM hashed
), shard_regs AS (
  SELECT event_type, shard, reg, max(rho) AS r
  FROM rhod GROUP BY event_type, shard, reg
), merged_regs AS (
  SELECT event_type, reg, max(r) AS r
  FROM shard_regs GROUP BY event_type, reg
), global_regs AS (
  SELECT event_type, reg, max(rho) AS r
  FROM rhod GROUP BY event_type, reg
), per_m AS ({est("merged_regs")}), per_g AS ({est("global_regs")}),
est_m AS ({fold("per_m")}), est_g AS ({fold("per_g")}),
shards AS (
  SELECT event_type, count(DISTINCT shard) AS n_shards
  FROM hashed GROUP BY event_type
)
SELECT m.event_type, CAST(s.n_shards AS BIGINT) AS n_shards,
       round(m.e, 6) AS hll_merged, round(g.e, 6) AS hll_global,
       m.e = g.e AS merge_exact
FROM est_m m JOIN est_g g ON m.event_type = g.event_type
JOIN shards s ON s.event_type = m.event_type
"""


QUERIES["a210_hll_merge"] = QuerySpec(a210_hll_merge, _a210_sql())
