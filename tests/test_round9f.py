"""Round-9f pins: triangle census (degree-oriented), zone-map pruning
classes, and the s16 flush-sentinel left-outer stream join contract.

The triangle tests are differential: the degree-oriented count must
equal a brute-force combinations() count on hand graphs that exercise
the orientation edge cases (ties, hubs, disconnected parts).
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.graph import (
    triangle_census,
)


def _brute(edges: list[tuple[int, int]]) -> tuple[int, int, int, int]:
    nodes = sorted({x for e in edges for x in e})
    es = {tuple(sorted(e)) for e in edges}
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    deg: dict[int, int] = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(nodes), len(es), wedges, tri


CASES = {
    # K4: every orientation tie-break fires (all degrees equal)
    "k4": [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
    # star: a hub whose center must emit ZERO wedges post-orientation
    "star": [(0, i) for i in range(1, 8)],
    # star + one rim edge: exactly one triangle through the hub
    "star_rim": [(0, i) for i in range(1, 8)] + [(1, 2)],
    # two disjoint triangles + a bridge path
    "two_tri": [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
    # triangle-free bipartite-ish grid
    "c4": [(1, 2), (2, 3), (3, 4), (4, 1)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_triangle_census_matches_brute_force(spark, name):
    edges = CASES[name]
    n_nodes, n_edges, wedges, tri = _brute(edges)
    df = spark.createDataFrame(
        [tuple(sorted(e)) for e in edges], "u long, v long"
    )
    row = triangle_census(df).collect()[0]
    assert row.n_nodes == n_nodes
    assert row.n_edges == n_edges
    assert row.n_wedges == wedges
    assert row.n_triangles == tri
    if wedges:
        assert row.global_clustering == pytest.approx(
            round(3.0 * tri / wedges, 6)
        )


def test_zone_map_classes_partition_rows(spark):
    """The three scan classes partition the table exactly: class row
    counts sum to the full row count, pruned zones are disjoint from the
    band, full zones are inside it."""
    import os

    from bigdata_scala_offline_data_clean_spark.queries.round9f import (
        _C66_HI,
        _C66_LO,
        c66_zone_map_pruning,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    from bigdata_scala_offline_data_clean_spark.queries._util import (
        load_table,
    )

    out = {r.scan_class: r for r in c66_zone_map_pruning(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    total = o.count()
    assert sum(r.n_rows for r in out.values()) == total
    # every row in a 'full' partition really passes the band predicate
    if "full" in out:
        full_days = (
            o.groupBy(
                F.date_format(
                    F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd"
                ).alias("d")
            )
            .agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
            .where((F.col("mn") >= _C66_LO) & (F.col("mx") <= _C66_HI))
            .count()
        )
        assert full_days == out["full"].n_partitions
    # 'pruned' partitions contain NO row passing the predicate
    if "pruned" in out:
        leaked = (
            o.groupBy(
                F.date_format(
                    F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd"
                ).alias("d")
            )
            .agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
            .where((F.col("mx") < _C66_LO) | (F.col("mn") > _C66_HI))
            .join(
                o.where(
                    (F.col("o_totalprice") >= _C66_LO)
                    & (F.col("o_totalprice") <= _C66_HI)
                ).select(
                    F.date_format(
                        F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd"
                    ).alias("d")
                ),
                "d",
            )
            .count()
        )
        assert leaked == 0


def test_s16_emits_non_conversions(spark):
    """The flush sentinel must surface null-padded non-conversions (the
    rows an availableNow run withholds without it), and no sentinel row
    may leak into the output."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    from bigdata_scala_offline_data_clean_spark.queries.round9f import (
        s16_stream_left_attribution,
    )

    out = s16_stream_left_attribution(spark, sf_dir)
    rows = out.collect()
    assert all(r.user_id >= 0 for r in rows)
    assert any(r.click_id is None for r in rows)  # non-conversions emitted
    assert any(r.click_id is not None for r in rows)  # conversions too


# ---------------------------------------------------------------------------
# BPE merge induction: differential against a literal Python reference of
# the documented semantics (position-based pair counts over word-type
# freq, lexicographic tie-break, greedy two-pass space-replace merge).
# ---------------------------------------------------------------------------


def _bpe_ref(texts: list[str], rounds: int):
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: " ".join(w) for w in wf}
    out = []
    for r in range(1, rounds + 1):
        cnt: Counter = Counter()
        for w, f in wf.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += f
        if not cnt:
            break
        # tie-break: max count, then SMALLEST (p1, p2)
        top_n = max(cnt.values())
        p1, p2 = min(k for k, v in cnt.items() if v == top_n)
        out.append((r, p1, p2, p1 + p2, top_n))
        pat, rep = f" {p1} {p2} ", f" {p1}{p2} "
        for w in seqs:
            inner = (" " + seqs[w] + " ").replace(pat, rep)
            seqs[w] = (" " + inner + " ").replace(pat, rep).strip()
    return out


@pytest.mark.parametrize(
    "texts",
    [
        # back-to-back merge sites + overlap chain ('aaaa', 'abab')
        ["aaaa abab low lower", "low low lowest abab"],
        # tie-break exercise: two pairs with equal weighted counts
        ["xy xy", "uv uv"],
        # single-char words must not blow up the pair explode
        ["a b c a b", "a a ab"],
    ],
)
def test_bpe_merges_match_reference(spark, texts):
    from bigdata_scala_offline_data_clean_spark.operators.text import (
        bpe_merge_rounds,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
        for r in bpe_merge_rounds(docs, rounds=3).orderBy("round").collect()
    ]
    assert got == _bpe_ref(texts, 3)
