from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.operators.diff import merge_into
from bigdata_scala_offline_data_clean_spark.operators.temporal import asof_join


def _t(spark, rows):
    return spark.createDataFrame(rows, "k bigint, status string, price double")


def test_merge_into_update_delete_insert(spark):
    target = _t(spark, [(1, "O", 10.0), (2, "F", 20.0), (3, "O", 30.0)])
    source = _t(spark, [(2, "M", 99.0), (3, "M", 5.0), (4, "N", 40.0)])
    out = merge_into(
        target,
        source,
        "k",
        delete_cond=lambda t, s: t["status"] == "F",
        update_cond=lambda t, s: s["price"] > 10.0,
    )
    got = {r.k: (r.status, r.price) for r in out.collect()}
    # 1: untouched; 2: matched + target F -> deleted; 3: matched but source
    # price <= 10 -> target kept; 4: unmatched source -> inserted
    assert got == {1: ("O", 10.0), 3: ("O", 30.0), 4: ("N", 40.0)}


def test_merge_into_insert_condition_filters(spark):
    target = _t(spark, [(1, "O", 10.0)])
    source = _t(spark, [(2, "N", 5.0), (3, "N", 50.0)])
    out = merge_into(
        target, source, "k", insert_cond=lambda t, s: s["price"] < 10.0
    )
    assert {r.k for r in out.collect()} == {1, 2}


def test_merge_into_defaults_update_always_insert_always(spark):
    target = _t(spark, [(1, "O", 10.0)])
    source = _t(spark, [(1, "U", 11.0), (2, "N", 12.0)])
    got = {r.k: (r.status, r.price) for r in merge_into(target, source, "k").collect()}
    assert got == {1: ("U", 11.0), 2: ("N", 12.0)}


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, t bigint, v string")


def test_asof_forward_picks_nearest_after(spark):
    left = _ev(spark, [("a", 10, "L1"), ("a", 25, "L2")])
    right = _ev(spark, [("a", 5, "R0"), ("a", 12, "R1"), ("a", 30, "R2")])
    out = asof_join(
        left,
        right.select("k", "t", F.col("v").alias("rv")),
        on="k",
        left_ts="t",
        right_ts="t",
        payload=["rv"],
        direction="forward",
    )
    got = {r.v: r.rv for r in out.collect()}
    assert got == {"L1": "R1", "L2": "R2"}


def test_asof_forward_equal_ts_included_unless_strict(spark):
    left = _ev(spark, [("a", 10, "L")])
    right = _ev(spark, [("a", 10, "R_eq"), ("a", 11, "R_next")])
    base = dict(on="k", left_ts="t", right_ts="t", payload=["rv"])
    r = right.select("k", "t", F.col("v").alias("rv"))
    nonstrict = asof_join(left, r, direction="forward", **base).collect()
    assert nonstrict[0].rv == "R_eq"
    strict = asof_join(left, r, direction="forward", strict=True, **base).collect()
    assert strict[0].rv == "R_next"


def test_asof_forward_no_future_row_gives_null(spark):
    left = _ev(spark, [("a", 50, "L")])
    right = _ev(spark, [("a", 5, "R_past")])
    out = asof_join(
        left,
        right.select("k", "t", F.col("v").alias("rv")),
        on="k",
        left_ts="t",
        right_ts="t",
        payload=["rv"],
        direction="forward",
    ).collect()
    assert out[0].rv is None


def test_asof_backward_unchanged(spark):
    left = _ev(spark, [("a", 10, "L")])
    right = _ev(spark, [("a", 5, "R1"), ("a", 9, "R2"), ("a", 11, "R3")])
    out = asof_join(
        left,
        right.select("k", "t", F.col("v").alias("rv")),
        on="k",
        left_ts="t",
        right_ts="t",
        payload=["rv"],
    ).collect()
    assert out[0].rv == "R2"


SF_DIR = "/root/testdata/sf0.001"


def test_exact_k_sample_exactly_k_per_stratum(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round6 import (
        _A128_K,
        a128_exact_k_sample,
    )

    out = a128_exact_k_sample(spark, SF_DIR)
    per = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    langs = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for lang, n_total in langs.items():
        assert per[lang] == min(_A128_K, n_total)


def test_generalize_kanon_every_group_resolved(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round6 import (
        _C50_K,
        c50_generalize_kanon,
    )

    rows = c50_generalize_kanon(spark, SF_DIR).collect()
    for r in rows:
        # rungs 0/1 only emit k-satisfying groups; rung 2 reports honestly
        if r.gen_level < 2:
            assert r.k_ok and r.n_rows >= _C50_K, r
        assert r.gen_level in (0, 1, 2)


def test_merge_into_query_consistent_with_clauses(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round6 import c49_merge_into
    from bigdata_scala_offline_data_clean_spark.queries._util import load_table

    out = c49_merge_into(spark, SF_DIR)
    o = load_table(spark, SF_DIR, "orders")
    # matched 'F' targets deleted: no key that is %5==0 with status F survives
    f_matched = {
        r.o_orderkey
        for r in o.where(
            (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderstatus") == "F")
        ).collect()
    }
    surviving = {r.o_orderkey for r in out.collect()}
    assert not (f_matched & surviving)
    # inserted keys (+2000000) all present
    inserts = {
        r.o_orderkey + 2000000
        for r in o.where(F.col("o_orderkey") % 9 == 0).collect()
    }
    assert inserts <= surviving


def test_char_entropy_bounds(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round6 import (
        a110_char_entropy,
    )

    rows = a110_char_entropy(spark, SF_DIR).collect()
    assert rows
    import math

    for r in rows:
        assert 0.0 <= r.entropy_bits <= math.log2(r.distinct_chars) + 1e-6, r


# --- differential test: merge_into vs a Python dict model ----------------

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

MERGE_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_mrow = st.tuples(
    st.integers(0, 5),  # key
    st.sampled_from(["O", "F", "M"]),  # status
    st.integers(0, 40).map(float),  # price
)
# unique keys per side (MERGE requires at most one source row per key)
_mrows = st.lists(_mrow, min_size=0, max_size=8, unique_by=lambda r: r[0])


def _merge_model(target, source):
    out = {k: (s, p) for k, s, p in target}
    for k, s, p in source:
        if k in out:
            if out[k][0] == "F":  # delete_cond: matched target status F
                del out[k]
            elif p > 10.0:  # update_cond: source price > 10
                out[k] = (s, p)
        elif p < 35.0:  # insert_cond: source price < 35
            out[k] = (s, p)
    return out


@pytest.mark.usefixtures("spark")
class TestMergeIntoModel:
    @MERGE_SETTINGS
    @given(target=_mrows, source=_mrows)
    def test_matches_model(self, spark, target, source):
        schema = "k bigint, status string, price double"
        t = spark.createDataFrame(target, schema)
        s = spark.createDataFrame(source, schema)
        got = {
            r.k: (r.status, r.price)
            for r in merge_into(
                t,
                s,
                "k",
                delete_cond=lambda tc, sc: tc["status"] == "F",
                update_cond=lambda tc, sc: sc["price"] > 10.0,
                insert_cond=lambda tc, sc: sc["price"] < 35.0,
            ).collect()
        }
        assert got == _merge_model(target, source)


def test_merge_into_null_condition_is_not_satisfied(spark):
    # SQL MERGE: a NULL WHEN-clause predicate means NOT satisfied -- the
    # row must fall through, never be deleted/skipped
    target = spark.createDataFrame(
        [(1, "O", 10.0)], "k bigint, status string, price double"
    )
    source = spark.createDataFrame(
        [(1, None, 99.0), (2, None, 5.0)], "k bigint, status string, price double"
    )
    out = merge_into(
        target,
        source,
        "k",
        # status is NULL on the source rows -> both conds evaluate NULL
        delete_cond=lambda t, s: s["status"] == "X",
        update_cond=lambda t, s: s["status"] == "Y",
        insert_cond=lambda t, s: s["status"] == "Z",
    )
    got = {r.k: (r.status, r.price) for r in out.collect()}
    # key 1: matched, delete NULL->false, update NULL->false -> target kept;
    # key 2: unmatched, insert NULL->false -> not inserted
    assert got == {1: ("O", 10.0)}


def test_ngram_jaccard_max_gram_df_drops_stop_grams(spark):
    from bigdata_scala_offline_data_clean_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # docs 1/2 share ONLY the ubiquitous gram (in every doc); docs 3/4 are
    # real near-dups sharing rare grams
    stop = "the common gram"
    rows = [
        (1, stop + " alpha beta gamma delta"),
        (2, stop + " epsilon zeta eta theta"),
        (3, "rare unique words here exactly matching mostly " + stop),
        (4, "rare unique words here exactly matching almost " + stop),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped = ngram_jaccard_pairs(d, n=3, threshold=0.05, max_gram_df=3)
    got = {(r.a, r.b) for r in capped.collect()}
    # the 4-doc stop grams are gone: 1-2 no longer pair; 3-4 still do
    assert (1, 2) not in got
    assert (3, 4) in got


def test_kmeans_query_handles_empty_cluster(spark, tmp_path):
    # seed vectors 0..3; all points sit near seed 0 -> clusters 1-3 empty
    # after round 1; the query must not crash or emit phantom clusters
    import os
    rows = []
    for i in range(12):
        base = [0.0] * 8
        base[0] = 1.0 + (i % 3) * 1e-4
        rows.append((i, base, 0))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    p = os.path.join(str(tmp_path), "embeddings.parquet")
    df.write.parquet(p)
    from bigdata_scala_offline_data_clean_spark.queries.round6 import a132_kmeans_fixed

    out = a132_kmeans_fixed(spark, str(tmp_path)).collect()
    assert len(out) == 12
    assert {r.cluster for r in out} <= {0, 1, 2, 3}
    # sizes are consistent with the assignment
    from collections import Counter
    sizes = Counter(r.cluster for r in out)
    for r in out:
        assert r.cluster_size == sizes[r.cluster]


def test_row_digest_checksum_order_independent(spark):
    from bigdata_scala_offline_data_clean_spark.queries.round6 import _row_digest
    from pyspark.sql import functions as F

    rows = [(i, f"name{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "k bigint, v string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "k bigint, v string").repartition(3)
    cols = [F.col("k").cast("string"), F.col("v")]
    ca = a.agg(F.bit_xor(_row_digest(cols)).alias("cs")).first().cs
    cb = b.agg(F.bit_xor(_row_digest(cols)).alias("cs")).first().cs
    assert ca == cb
    # a single changed row flips the checksum
    c = spark.createDataFrame(rows[:-1] + [(99, "tampered")], "k bigint, v string")
    cc = c.agg(F.bit_xor(_row_digest(cols)).alias("cs")).first().cs
    assert cc != ca
