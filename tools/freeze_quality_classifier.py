"""Train + freeze the a211 rule-distillation quality-classifier weights.

The classifier-based quality filter is a standard curation stage: C4 /
Gopher / Llama-style pipelines first write RULES (length bands,
repetition ratios), then distill them (plus human/LLM labels) into a
small linear model that scores every document cheaply.  a211 is that
stage, Spark-native and oracle-exact: the frozen weights (the
shipped-model pattern of queries/quantizers.py) score each document
from
  - f_len   = n_chars / 1000
  - f_lntok = ln(n_toks) rounded 9dp (the a110/a205 cross-engine-ln rule)
  - f_dup   = distinct/total word-3-gram ratio (the Gopher repetition
              structure, c67's gram construction)
  - 64 hashed bag-of-words buckets tf_b / n_toks (the a205 DSIR hash)
and the label it distills is the c67 rule pass:
  100 <= n_chars <= 2000  AND  5 * (n_grams - n_distinct_grams) < n_grams.

Training provenance (deterministic): full-batch logistic regression
(numpy, zero init, fixed iterations) on the sf0.01 documents; weights
rounded to 9 dp before freezing so both engines fold identical decimals.

Run: python tools/freeze_quality_classifier.py
  (rewrites bigdata_scala_offline_data_clean_spark/queries/classifier_weights.py)
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np

SF_DIR = "/root/testdata/sf0.01"
B = 64  # hash buckets (shared with a205's _DSIR_B)
ITERS, LR = 2000, 2.0
OUT = (
    Path(__file__).resolve().parent.parent
    / "bigdata_scala_offline_data_clean_spark"
    / "queries"
    / "classifier_weights.py"
)

FEATURE_SQL = f"""
WITH toks AS (
  SELECT doc_id, n_chars,
         list_filter(string_split(text, ' '), t -> len(t) > 0) AS t
  FROM '{SF_DIR}/documents.parquet'
), grams AS (
  SELECT doc_id, n_chars, len(g) AS n_grams,
         len(list_distinct(g)) AS n_distinct
  FROM (
    SELECT doc_id, n_chars,
           [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)] AS g
    FROM toks
  ) q
), tb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % {B} AS b
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM '{SF_DIR}/documents.parquet')
)
SELECT g.doc_id, g.n_chars, g.n_grams, g.n_distinct,
       (g.n_chars BETWEEN 100 AND 2000
        AND 5 * (g.n_grams - g.n_distinct) < g.n_grams) AS y,
       list(t.b ORDER BY t.b) AS bs
FROM grams g JOIN tb t USING (doc_id)
GROUP BY ALL ORDER BY g.doc_id
"""


def main() -> None:
    rows = duckdb.sql(FEATURE_SQL).fetchall()
    n_docs = len(rows)
    x = np.zeros((n_docs, B + 3))
    y = np.zeros(n_docs)
    for i, (_, n_chars, n_grams, n_distinct, lab, bs) in enumerate(rows):
        n_toks = len(bs)  # raw-split BoW token count (the a205 tokens)
        x[i, 0] = n_chars / 1000.0
        x[i, 1] = round(float(np.log(n_toks)), 9)
        x[i, 2] = n_distinct / n_grams
        for b in bs:
            x[i, 3 + b] += 1.0
        x[i, 3:] /= n_toks
        y[i] = 1.0 if lab else 0.0
    w = np.zeros(B + 3)
    b0 = 0.0
    for _ in range(ITERS):
        z = x @ w + b0
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (x.T @ g) / n_docs
        b0 -= LR * g.mean()
    wq = [round(float(v), 9) for v in w]
    bq = round(float(b0), 9)
    pred = (1.0 / (1.0 + np.exp(-(x @ np.asarray(wq) + bq)))) >= 0.5
    acc = float((pred == (y == 1.0)).mean())
    base = max(y.mean(), 1 - y.mean())
    body = (
        '"""Frozen a211 quality-classifier weights (generated -- do not '
        'edit).\n\nRegenerate with ``python '
        'tools/freeze_quality_classifier.py``; provenance in that '
        "script's docstring.  Feature order: [n_chars/1000, "
        "round(ln(n_toks), 9), n_distinct_grams/n_grams, 64 hashed-BoW "
        'buckets tf_b/n_toks]; weights rounded to 9 dp so the Spark fold '
        'and the DuckDB oracle consume identical decimals.\n"""\n\n'
        "# fmt: off\n"
        f"A211_BUCKETS = {B}\n"
        f"A211_BIAS = {bq!r}\n"
        f"A211_TRAIN_ACC = {round(acc, 4)!r}  # sf0.01 train set\n"
        f"A211_BASE_RATE = {round(float(base), 4)!r}\n"
        "A211_WEIGHTS = [  # [w_len, w_lntok, w_dupratio, w_bucket0..63]\n"
        + "".join(f"    {v!r},\n" for v in wq)
        + "]\n"
    )
    OUT.write_text(body)
    print(
        f"wrote {OUT} (train acc {acc:.4f}, majority base {base:.4f})"
    )


if __name__ == "__main__":
    main()
