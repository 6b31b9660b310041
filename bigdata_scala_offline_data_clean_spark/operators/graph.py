"""Distributed graph operators beyond connectivity.

``operators/dedup.connected_components`` covers component finding (the
dedup-cluster primitive); this module adds iterative score propagation --
PageRank -- in the shape that survives 100 TB edge sets:

- Each iteration is ONE join (rank onto out-edges) + ONE aggregation
  (sum contributions by destination), both keyed on node ids, so a cluster
  co-partitions them; no collect, no per-node driver state.
- **Fixed-point integer arithmetic**: ranks are scaled BIGINTs and the
  damping update is ``(1-d)*SCALE + (d_num * sum(contrib)) div d_den``
  with integer floor-division everywhere.  Float PageRank is
  order-dependent (``SUM(double)`` re-associates per shuffle); the integer
  form is bit-deterministic on any cluster layout AND reproducible by the
  DuckDB oracle -- same trick as ``_util.dsum``'s decimal sums, applied to
  an iterative algorithm.  SCALE=1e12 keeps 12 significant digits, far
  below BIGINT overflow for any realistic rank mass.
- Lineage grows linearly with iterations; for the handful of rounds
  PageRank needs (it converges geometrically at rate ``d``) that is fine,
  and callers running many rounds can checkpoint like
  ``connected_components`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 1e12: fixed-point unit


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """(node, pr) after ``iters`` damped power iterations, fixed-point.

    ``edges`` is directed; pass both orientations for an undirected graph.
    The node universe is the SOURCE set (nodes with out-edges): ranks are
    left-joined back onto it every round, so a node with out-edges but no
    in-edges keeps its ``(1-d)*SCALE`` baseline instead of silently
    vanishing after round 1 (round-5 fix; on symmetrized graphs the
    backfill is a no-op and values are unchanged).  Sink nodes (in-edges
    only) and dangling-mass redistribution remain out of scope, as is
    convergence detection (fixed iteration count = fixed, auditable plan).
    """
    # out-degree rides WITH the edges: joining rank onto (u, v, deg) is one
    # equi-join per round instead of two.  The edge frame feeds every
    # iteration, so persist it once -- without this, lineage re-derives the
    # upstream edge construction (often itself a join) iters times.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "u").persist()
    base = (PR_SCALE * (d_den - d_num)) // d_den
    # rank table starts uniform at SCALE; each round: contribution =
    # rank div degree, summed over in-edges (exact BIGINT), then damp.
    # localCheckpoint truncates the per-round plan (rank tables are node-
    # sized); on a cluster use checkpoint() to a reliable dir instead.
    r = deg.select("u", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for _ in range(iters):
        # LEFT join + coalesce(pr, base): after round 1 the rank table only
        # covers destination nodes, and a source with no in-edges has
        # exactly pr = (1-d)*SCALE = base every round -- coalescing the
        # constant is equivalent to materializing its rank row, at the cost
        # of the SAME single join (no extra per-round backfill shuffle)
        contrib = ed.join(r, "u", "left").select(
            F.col("v").alias("u"),
            F.expr(f"coalesce(pr, {base}) div deg").alias("c"),
        )
        r = contrib.groupBy("u").agg(
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({d_num} * sum(c)) div {d_den}")
            ).alias("pr")
        ).localCheckpoint(eager=False)
    # one final backfill restores the full source universe in the output
    # (no-in-edge nodes sit at the base rank); eager checkpoint
    # materializes the node-sized result so the edge cache can be released
    out = (
        deg.select("u")
        .join(r, "u", "left")
        .select(
            F.col("u").alias("node"),
            F.coalesce(F.col("pr"), F.lit(base)).cast("bigint").alias("pr"),
        )
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    return out
