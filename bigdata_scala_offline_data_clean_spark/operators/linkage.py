"""Blocked fuzzy record linkage (entity resolution) over string keys.

The classic two-stage shape: a cheap *blocking* equi-join bounds the
candidate space, then an edit-distance predicate verifies each candidate
pair.  This is the string-field sibling of the MinHash/LSH document path
(operators/dedup.py) and the embedding path (operators/similarity.py):
all three reduce an O(n^2) all-pairs problem to per-block/bucket joins.

Scale: the self-join shuffles each side once on the block key; pair count
is sum over blocks of |block|^2, so block design is the knob that matters
at 100 TB.  ``max_block`` drops oversized blocks (boilerplate values such
as an empty-string name would otherwise quadratically explode), mirroring
``candidate_pairs(max_bucket=)``.  ``levenshtein`` runs JVM-side inside
whole-stage codegen -- no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_exprs: dict[str, Column],
    max_dist: int = 2,
    min_dist: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose block keys all match and whose
    ``text_col`` edit distance lies in [min_dist, max_dist].

    ``block_exprs`` maps block-column name -> expression over ``df``
    (e.g. ``{"blk_brand": F.col("p_brand"), "blk_noun":
    F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))}``).
    ``min_dist=1`` excludes exact duplicates (those belong to exact dedup,
    operators/dedup.py); pass ``min_dist=0`` to include them.
    """
    blocks = list(block_exprs)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        *[expr.alias(name) for name, expr in block_exprs.items()],
    )

    if max_block is not None:
        # one extra aggregation, same shuffle key as the join itself.  The
        # small-block key set is UNBOUNDED (it grows with the entity
        # count), so no forced broadcast (round-9 hardening): the semi-
        # join keys on the same block columns as the downstream self-
        # join, so its exchange is reused, and AQE broadcasts the key set
        # at runtime whenever it measures small.
        sizes = base.groupBy(*blocks).agg(F.count(F.lit(1)).alias("__bn"))
        base = base.join(
            sizes.where(F.col("__bn") <= max_block).drop("__bn"),
            on=blocks,
            how="left_semi",
        )

    a = base.select(
        F.col("__id").alias(f"{id_col}_a"),
        F.col("__txt").alias(f"{text_col}_a"),
        *[F.col(b).alias(f"__a_{b}") for b in blocks],
    )
    b = base.select(
        F.col("__id").alias(f"{id_col}_b"),
        F.col("__txt").alias(f"{text_col}_b"),
        *[F.col(c).alias(f"__b_{c}") for c in blocks],
    )
    cond = [a[f"__a_{c}"] == b[f"__b_{c}"] for c in blocks]
    cond.append(a[f"{id_col}_a"] < b[f"{id_col}_b"])
    # |len(a) - len(b)| <= max_dist is a necessary condition and costs an
    # integer compare -- it prunes candidates before the edit distance
    cond.append(
        F.abs(
            F.length(a[f"{text_col}_a"]) - F.length(b[f"{text_col}_b"])
        )
        <= max_dist
    )
    # bounded (banded) Levenshtein: with the threshold argument the DP
    # explores a 2*max_dist+1 band instead of the full len^2 matrix and
    # returns -1 past the bound -- measured ~2x on the verify stage
    dist = F.levenshtein(
        F.col(f"{text_col}_a"), F.col(f"{text_col}_b"), threshold=max_dist
    )
    return (
        a.join(b, cond)
        .where(dist.between(min_dist, max_dist))
        .select(
            f"{id_col}_a",
            f"{id_col}_b",
            f"{text_col}_a",
            f"{text_col}_b",
            dist.alias("edit_dist"),
        )
    )
