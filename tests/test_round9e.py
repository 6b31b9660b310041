"""Round-9e pins: SimHash hamming census (value-collapsed Manku bands).

Differential test: the banded census must equal a brute-force all-pairs
popcount over the same fingerprints -- the banding is a candidate
superset (pigeonhole), never a filter on true pairs.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from bigdata_scala_offline_data_clean_spark.operators.dedup import (
    simhash,
    simhash_hamming_census,
)


def _brute_census(fps: list[int], k: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for a, b in combinations(fps, 2):
        d = bin(a ^ b).count("1")
        if d <= k:
            out[d] = out.get(d, 0) + 1
    return out


def test_census_matches_brute_force(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # exact dup of 1 -> hamming 0
        (3, "alpha beta gamma epsilon"),  # near 1/2
        (4, "totally different words here"),
        (5, "alpha beta gamma delta"),  # second dup -> 3 zero-pairs
        (6, "zeta eta theta iota kappa"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps = [
        r.simhash for r in simhash(d, bits=32).orderBy("doc_id").collect()
    ]
    got = {
        r.hamming: r.n_pairs
        for r in simhash_hamming_census(
            d, bits=32, max_hamming=3, n_bands=4
        ).collect()
    }
    assert got == _brute_census(fps, 3)
    # the three exact dups alone guarantee C(3,2)=3 zero-distance pairs
    assert got.get(0, 0) >= 3


def test_census_pigeonhole_guards(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_hamming_census(d, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_hamming_census(d, bits=32, max_hamming=3, n_bands=5)


def test_bloom_prejoin_isolates_session_confs(spark):
    # c65 tunes bloom/broadcast confs on a CLONED session; the caller's
    # session must keep its own values, and the returned plan must carry
    # the runtime bloom semi-filter on the fact side.
    from bigdata_scala_offline_data_clean_spark.queries.round9e import (
        c65_bloom_prejoin,
    )

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = c65_bloom_prejoin(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "SortMergeJoin" in plan
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert df.count() > 0
