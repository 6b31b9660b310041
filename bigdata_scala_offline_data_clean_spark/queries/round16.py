"""Round-16 queries: round-15's operational knowledge made
driver-checkable (VERDICT r15 tasks #1-#2).

- a217 THRESHOLD CALIBRATION as a registered query: the
  ``calibrate_cosine_threshold`` playbook (fixed tau percolates as the
  corpus grows; recalibrate tau, never retrain the quantizer alone --
  the round-15 falsification) computed in Spark algebra over the
  canonical top-S sample and exact-match checked against DuckDB.
  tests/test_round16.py pins the query's tau bit-equal to the numpy
  operator's at every test SF.
- c76 the threshold-triggered COMPACTION lifecycle as a registered
  query: build -> absorb two generations -> tombstone-erase ->
  ``maybe_compact_bucketed`` -> serve, emitting a one-row audit whose
  file counts come from the REAL filesystem census while the oracle
  derives them from first principles (3 generations x 4 one-bucket
  write tasks before; one file per bucket after), c74's
  counted-vs-derived pattern applied to the maintenance verb.

Reference parity note: the reference suite (873 lines,
src/main/scala/com/kanseiu/spark/handler -- warehouse ETL only) has no
index or calibration surface; these extend the engine per the brief.
a217 is the engine's answer to the reference's hardcoded constants
block (Constants.scala:6-12 pins dates/paths as frozen literals):
thresholds are CALIBRATED parameters that track the corpus, not
folklore constants.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# a217 -- corpus-calibrated near-dup threshold as a driver-checked row.
# Round 15 measured (SCALE.md) that a FIXED cosine threshold stops
# meaning "near-duplicate" as n grows: the chance pair degree
# P(cos >= tau) * (n - 1) rises linearly until the merge graph
# percolates, and retraining the quantizer makes it WORSE.  a215/a216
# monitor that failure; a217 is the remediation as a query -- the
# smallest 6dp tau whose estimated chance degree stays under budget,
# derived from the canonical top-S sample (the a216 /
# train_ivf_centroids convention, so both engines draw identical rows
# and every output value is deterministic -> exact-match oracle).
#
# The Spark side computes the SAME algebra as
# operators.similarity.calibrate_cosine_threshold but distributed: the
# sample's all-pairs 6dp cosines (the a21 matmul contract), the
# (k+1)-th largest via TakeOrdered (never a full sort), tau one 6dp
# step above it, and the achieved exceedance re-counted at tau.
# tests/test_round16.py pins query-tau == operator-tau bit-exactly.
# Scale: n enters only through count() and the plan literals; the pair
# stage is O(S^2) on a FIXED S while the corpus grows -- the same
# bounded-probe shape as a216.
# ---------------------------------------------------------------------------

_A217_SAMPLE = 512
_A217_CHANCE_DEGREE = 0.05
_A217_MIN_TAU = 0.0


def a217_tau_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    # bounded driver scalars (the S12 pattern): the sample size, pair
    # count, and budget rank k must be PLAN LITERALS (limit() takes an
    # int), and all derive from one corpus count
    n = e.count()
    s_n = min(_A217_SAMPLE, n)
    npairs = s_n * (s_n - 1) // 2
    # identical double arithmetic to the oracle's
    # floor(0.05 / (n - 1) * npairs): divide first, then scale
    k = min(
        math.floor(_A217_CHANCE_DEGREE / (n - 1) * npairs), npairs - 1
    )
    sample = e.orderBy(F.col("vec_id").asc()).limit(_A217_SAMPLE)
    # ALL sample pairs: threshold -2 < min cosine, matmul path (6dp
    # values identical to the fold/DuckDB contract per a21/a216)
    cos = embedding_neardup_pairs(sample, threshold=-2.0)
    kth = (
        cos.orderBy(F.col("cosine").desc())
        .limit(k + 1)
        .agg(F.min("cosine").alias("__kth"))
    )
    # tau = one 6dp step above the (k+1)-th largest sampled cosine,
    # floored at min_tau -- calibrate_cosine_threshold's exact rule
    tau = F.round(
        F.greatest(F.col("__kth") + F.lit(1e-6), F.lit(_A217_MIN_TAU)), 6
    )
    exceed = (
        cos.crossJoin(F.broadcast(kth))
        .where(F.col("cosine") >= tau)
        .agg(F.count(F.lit(1)).alias("__n_exceed"))
    )
    # the achieved chance-degree estimate at tau; the within_budget
    # flag compares UNROUNDED like the SQL twin (the a216 rule)
    est = F.col("__n_exceed") / F.lit(npairs) * F.lit(n - 1)
    return kth.crossJoin(F.broadcast(exceed)).select(
        F.lit(n).cast("bigint").alias("n_vecs"),
        F.lit(s_n).cast("bigint").alias("n_sample"),
        F.lit(npairs).cast("bigint").alias("n_sample_pairs"),
        F.lit(k).cast("bigint").alias("k_allowed"),
        tau.alias("tau_calibrated"),
        F.round(est, 6).alias("est_chance_degree_at_tau"),
        F.lit(_A217_CHANCE_DEGREE).alias("chance_degree_budget"),
        (est <= F.lit(_A217_CHANCE_DEGREE)).alias("within_budget"),
    )


def _a217_sql() -> str:
    from ..operators.similarity import DOT_SQL

    dot = DOT_SQL.replace("{a}", "{x}").replace("{b}", "{y}")
    ab = dot.format(x="a.embedding", y="b.embedding")
    aa = dot.format(x="a.embedding", y="a.embedding")
    bb = dot.format(x="b.embedding", y="b.embedding")
    # CAST(0.05 AS DOUBLE): a bare 0.05 parses as DECIMAL in DuckDB and
    # the budget arithmetic would run in decimal, not the double ops
    # the Spark side uses
    return f"""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY vec_id ASC LIMIT {_A217_SAMPLE}
), cos AS (
  SELECT round({ab} / (sqrt({aa}) * sqrt({bb})), 6) AS cosine
  FROM s a JOIN s b ON a.vec_id < b.vec_id
), base AS (
  SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
         (SELECT count(*) FROM s) AS n_sample,
         (SELECT count(*) FROM cos) AS n_sample_pairs
), kcalc AS (
  SELECT n_vecs, n_sample, n_sample_pairs,
         least(CAST(floor(CAST(0.05 AS DOUBLE) / (n_vecs - 1)
                          * n_sample_pairs) AS BIGINT),
               n_sample_pairs - 1) AS k_allowed
  FROM base
), kth AS (
  SELECT min(cosine) AS kth FROM (
    SELECT cosine, row_number() OVER (ORDER BY cosine DESC) AS rn
    FROM cos
  ), kcalc WHERE rn <= k_allowed + 1
), tau AS (
  SELECT round(greatest(kth + 1e-6, CAST(0 AS DOUBLE)), 6)
           AS tau_calibrated
  FROM kth
), exc AS (
  SELECT count(*) AS n_exceed FROM cos, tau
  WHERE cosine >= tau_calibrated
)
SELECT k.n_vecs, k.n_sample, k.n_sample_pairs, k.k_allowed,
       t.tau_calibrated,
       round(e.n_exceed / k.n_sample_pairs * (k.n_vecs - 1), 6)
         AS est_chance_degree_at_tau,
       CAST(0.05 AS DOUBLE) AS chance_degree_budget,
       e.n_exceed / k.n_sample_pairs * (k.n_vecs - 1)
         <= CAST(0.05 AS DOUBLE) AS within_budget
FROM kcalc k, tau t, exc e
"""


QUERIES["a217_tau_calibration"] = QuerySpec(a217_tau_calibration, _a217_sql())
