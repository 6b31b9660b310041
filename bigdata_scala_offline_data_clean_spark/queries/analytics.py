"""Analytics queries: grouped aggregates + LLM-training-data operators.

Beyond reference parity (the reference has no GROUP BY at all -- SURVEY.md
§2.4), these are the large-scale data-pipeline operators: text statistics,
exact/near deduplication, fingerprinting, similarity search.  Everything is
stock DataFrame API (hash-partitioned groupBy/join -- the shapes that scale
to 100 TB); oracles use engine-portable primitives (md5, length, integer
arithmetic, exact decimal sums) so DuckDB hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import dsum, load_table

# ---------------------------------------------------------------------------
# a01 -- flagship grouped aggregate (TPC-H Q1 shape) over lineitem.
# Exact decimal sums cast to double => bit-identical across engines.
# ---------------------------------------------------------------------------


def a01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum("l_discount").alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


A01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_discount      AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# a02 -- text statistics (quality-scoring features for a training pipeline):
# char/token counts, distinct-token ratio.  Integer-exact -> portable.
# ---------------------------------------------------------------------------


def a02_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )


A02_SQL = """
SELECT doc_id, lang, source,
       length(text) AS n_chars_calc,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens
FROM documents
"""

# ---------------------------------------------------------------------------
# a03 -- exact deduplication: hash-groupBy on md5(text).  At 100 TB this is
# one hash exchange on the digest (never on the document body).
# ---------------------------------------------------------------------------


def a03_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


A03_SQL = """
SELECT md5(text) AS text_hash,
       min(doc_id) AS rep_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY md5(text)
"""


QUERIES: dict[str, QuerySpec] = {
    "a01_pricing_summary": QuerySpec(a01_pricing_summary, A01_SQL),
    "a02_text_stats": QuerySpec(a02_text_stats, A02_SQL),
    "a03_exact_dedup": QuerySpec(a03_exact_dedup, A03_SQL),
}
