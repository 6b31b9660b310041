"""Round-7 operator tests: distributed_ntile and frontier BFS.

distributed_ntile replaces the unpartitioned ``ntile()`` windows flagged
by the round-6 plan audit (a118/a139); bfs_hops replaces a133's
re-expanding frontier loop.  Both must be row-for-row identical to the
naive formulations.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.graph import bfs_hops
from bigdata_scala_offline_data_clean_spark.operators.ordering import (
    distributed_ntile,
)


def _tiles(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_distributed_ntile_matches_window_heavy_ties(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.choice([1, 1, 1, 2, 2, 3, 5, 8]), rng.random() * 100)
        for i in range(503)
    ]
    df = spark.createDataFrame(rows, "id long, f long, m double")
    for n in (4, 10):
        for col, asc in (("f", True), ("f", False), ("m", False)):
            w = Window.orderBy(
                F.col(col).asc() if asc else F.col(col).desc(),
                F.col("id").asc(),
            )
            exp = _tiles(
                df.select("id", F.ntile(n).over(w).alias("t")), "t"
            )
            got = _tiles(
                distributed_ntile(
                    df, n, col, ascending=asc, tie_cols=["id"]
                ).select("id", F.col("tile").alias("t")),
                "t",
            )
            assert got == exp, (n, col, asc)


def test_distributed_ntile_edge_cases(spark):
    # constant column: every value group straddles -- tie order decides
    const = spark.createDataFrame(
        [(i, 7) for i in range(9)], "id long, v long"
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    exp = _tiles(const.select("id", F.ntile(4).over(w).alias("t")), "t")
    got = _tiles(
        distributed_ntile(const, 4, "v", tie_cols=["id"]).select(
            "id", F.col("tile").alias("t")
        ),
        "t",
    )
    assert got == exp
    # fewer rows than tiles: tile == rank
    small = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "id long, v long"
    )
    got = _tiles(
        distributed_ntile(small, 7, "v", tie_cols=["id"]).select(
            "id", F.col("tile").alias("t")
        ),
        "t",
    )
    assert got == {1: 1, 2: 2, 3: 3}


def test_distributed_ntile_preserves_columns_and_count(spark):
    df = spark.createDataFrame(
        [(i, i % 13, f"x{i}") for i in range(100)],
        "id long, v long, tag string",
    )
    out = distributed_ntile(df, 5, "v", tie_cols=["id"])
    assert out.columns == ["id", "v", "tag", "tile"]
    assert out.count() == 100
    assert out.select("id").distinct().count() == 100


def test_distributed_ntile_guards(spark):
    import pytest

    # non-numeric order column: build-time ValueError (the range slice
    # needs a monotone numeric domain)
    s = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="must be numeric"):
        distributed_ntile(s, 4, "s", tie_cols=["id"])
    # null order value: execution-time raise_error instead of silently
    # dropping the row through the inner value joins
    d = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    with pytest.raises(Exception, match="null/NaN v|USER_RAISED"):
        distributed_ntile(d, 4, "v", tie_cols=["id"]).collect()
    # NaN would mis-slice (sorts last, slices lowest): must also raise
    nan = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id long, v double"
    )
    with pytest.raises(Exception, match="null/NaN v|USER_RAISED"):
        distributed_ntile(nan, 4, "v", tie_cols=["id"]).collect()
    # empty tie_cols: build-time error (straddlers need a total order)
    with pytest.raises(ValueError, match="tie_cols"):
        distributed_ntile(d, 4, "v")


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "u long, v long")


def test_bfs_chain_hop_distances(spark):
    # 0-1-2-3-4-5 chain, seed {0}: hop == distance, capped at max_hops
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, seeds, 3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_dense_component_frontier_shrinks(spark):
    # clique of 8: hop-1 frontier is the 7 other nodes, hop-2 frontier is
    # EMPTY -- the visited-set subtraction stops re-expansion (the round-6
    # implementation re-joined the whole component every hop)
    nodes = list(range(8))
    e = _edges(spark, [(a, b) for a in nodes for b in nodes if a < b])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = bfs_hops(e, seeds, 3)
    per_hop = {
        r.hop: r.n
        for r in out.groupBy("hop").agg(F.count("*").alias("n")).collect()
    }
    # every node appears exactly once, at its min hop; no hop-2/3 rows
    assert per_hop == {0: 1, 1: 7}
    assert out.count() == out.select("node").distinct().count() == 8


def test_merge_into_strict_raises_on_duplicate_source_keys(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from bigdata_scala_offline_data_clean_spark.operators.diff import (
        merge_into,
    )

    target = spark.createDataFrame(
        [(1, "a", 1.0)], "k bigint, status string, price double"
    )
    dup_source = spark.createDataFrame(
        [(1, "b", 2.0), (1, "c", 3.0)], "k bigint, status string, price double"
    )
    # lenient default: join multiplicity -- documented divergence
    assert merge_into(target, dup_source, "k").count() == 2
    # strict: SQL MERGE's "multiple source rows matched" at execution
    with pytest.raises((PySparkException, Py4JJavaError)) as ei:
        merge_into(target, dup_source, "k", strict=True).count()
    assert "multiple source rows matched" in str(ei.value)
    # strict + duplicate keys that match NO target row: legal multi-row
    # INSERT in SQL MERGE, must NOT raise (round-7 review fix)
    ins_dups = spark.createDataFrame(
        [(99, "x", 1.0), (99, "y", 2.0)],
        "k bigint, status string, price double",
    )
    assert merge_into(target, ins_dups, "k", strict=True).count() == 3
    # strict with unique source keys: unchanged result
    uniq = spark.createDataFrame(
        [(1, "b", 2.0), (2, "n", 4.0)], "k bigint, status string, price double"
    )
    got = {
        r.k: (r.status, r.price)
        for r in merge_into(target, uniq, "k", strict=True).collect()
    }
    assert got == {1: ("b", 2.0), 2: ("n", 4.0)}


def test_bfs_multi_seed_min_hop(spark):
    # two seeds at opposite ends of a chain: hops meet in the middle
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    seeds = spark.createDataFrame([(0,), (6,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, seeds, 3).collect()}
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_s14_psi_invariant_to_batch_split(spark):
    """The streamed PSI's correctness argument is batch-split
    INDEPENDENCE (count partials merge linearly, bounds are batch-side
    literals).  Pin it: one giant micro-batch and three micro-batches
    must produce the identical report -- the r16 bench-budget rule's
    precondition for running the bench default at 2 slices (was 4)."""
    import os

    import pytest

    from bigdata_scala_offline_data_clean_spark.queries.round7 import (
        s14_stream_psi,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/orders.parquet"):
        pytest.skip("testdata not present")

    def run(n):
        return sorted(
            map(tuple, s14_stream_psi(spark, sf, n_slices=n).collect())
        )

    one = run(1)
    three = run(3)
    assert one == three and len(one) > 0
