"""Round-10 tests: oracle-checked IVF / PQ ANN cores (VERDICT r9 #2).

The DuckDB oracle already exact-matches both queries end-to-end; these
tests pin the pieces the oracle can't see in isolation:

- full-probe IVF degenerates to the exact brute-force top-k (the same
  equivalence a16 pins for the trained path),
- every IVF candidate really came from one of its query's probed
  buckets,
- the PQ ADC distances equal an independent numpy reimplementation of
  code assignment + asymmetric distance (so the Spark expression tree
  and the SQL twin can't share a common bug).
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_scala_offline_data_clean_spark.queries import round10
from bigdata_scala_offline_data_clean_spark.queries._util import load_table

SF = "/root/testdata/sf0.001"


def test_a199_candidates_come_from_probed_buckets(spark):
    out = round10.a199_ivf_assign(spark, SF).collect()
    assert len(out) == round10._NQ * round10._K
    # recompute each query's probe set with numpy (independent argmin)
    e = load_table(spark, SF, "embeddings")
    rows = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in e.where(
            (F.col("vec_id") < round10._NQ)
            | F.col("vec_id").between(round10._SEED_LO, round10._SEED_HI)
        ).collect()
    }
    cents = np.stack(
        [rows[i] for i in range(round10._SEED_LO, round10._SEED_HI + 1)]
    )
    for q in range(round10._NQ):
        d = ((cents - rows[q]) ** 2).sum(1)
        probed = set((np.argsort(d, kind="stable")[: round10._PROBES] + 1))
        got = {r["n_bucket"] for r in out if r["q_id"] == q}
        assert got <= probed, (q, got, probed)
    # ranks are 1..K per query, cosine within [-1, 1]
    for q in range(round10._NQ):
        ranks = sorted(r["rank"] for r in out if r["q_id"] == q)
        assert ranks == list(range(1, round10._K + 1))
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in out)


def test_a199_full_probe_equals_exact(spark, monkeypatch):
    from bigdata_scala_offline_data_clean_spark.operators.similarity import (
        cosine_topk,
    )

    monkeypatch.setattr(round10, "_PROBES", round10._N_CENT)
    ivf = {
        (r["q_id"], r["n_id"], r["cosine"], r["rank"])
        for r in round10.a199_ivf_assign(spark, SF).collect()
    }
    e = load_table(spark, SF, "embeddings")
    exact = {
        tuple(r)
        for r in cosine_topk(
            e, e.where(F.col("vec_id") < round10._NQ), k=round10._K
        ).collect()
    }
    assert ivf == exact


def test_a200_adc_matches_numpy(spark):
    out = round10.a200_pq_adc(spark, SF).collect()
    assert len(out) == round10._NQ * round10._K
    e = load_table(spark, SF, "embeddings")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in e.collect()
    }
    cents = np.stack(
        [vecs[i] for i in range(round10._SEED_LO, round10._SEED_HI + 1)]
    )
    m, dsub = round10._M, round10._DSUB

    def codes(v):
        return [
            int(
                np.argmin(
                    ((cents[:, j * dsub : (j + 1) * dsub]
                      - v[j * dsub : (j + 1) * dsub]) ** 2).sum(1),
                    # numpy argmin ties -> first index == cid ASC tie-break
                )
            )
            for j in range(m)
        ]

    for r in out:
        qv, nv = vecs[r["q_id"]], vecs[r["n_id"]]
        cs = codes(nv)
        adc = sum(
            ((qv[j * dsub : (j + 1) * dsub]
              - cents[cs[j], j * dsub : (j + 1) * dsub]) ** 2).sum()
            for j in range(m)
        )
        assert r["approx_dist"] == pytest.approx(adc, abs=2e-6), r


def test_round10_registered_with_oracles():
    from bigdata_scala_offline_data_clean_spark.queries import all_queries

    qs = all_queries()
    for name in ("a199_ivf_assign", "a200_pq_adc"):
        assert name in qs and qs[name].oracle is not None
