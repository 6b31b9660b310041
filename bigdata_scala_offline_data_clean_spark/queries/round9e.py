"""Round-9e queries: SimHash radius census (value-collapsed Manku
banding) and further curation/scale operators.

a187 counts document pairs at each SimHash hamming distance <= 3 using
the WWW'07 Manku/Jain/Sarma banded scheme, value-collapsed: the banded
self-join runs over DISTINCT 32-bit fingerprints (384 values vs 2500
docs at sf0.01 -- template-heavy corpora collapse hardest), pair counts
multiply group sizes back afterwards.  Completes the dedup family's
candidate-generation trio: MinHash-LSH (Jaccard), prefix filter
(overlap), and now SimHash bands (hamming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_A187_BITS, _A187_K, _A187_BANDS = 32, 3, 4


def a187_simhash_hamming_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import simhash_hamming_census

    d = load_table(spark, sf_dir, "documents")
    return simhash_hamming_census(
        d, bits=_A187_BITS, max_hamming=_A187_K, n_bands=_A187_BANDS
    )


def _a187_sql() -> str:
    bits, k, n_bands = _A187_BITS, _A187_K, _A187_BANDS
    width = bits // n_bands
    mask = (1 << width) - 1
    votes = []
    for i in range(bits):
        pos, shift = i // 4 + 1, i % 4
        nib = f"ascii(substr(h, {pos}, 1))"
        val = f"(CASE WHEN {nib} >= 97 THEN {nib} - 87 ELSE {nib} - 48 END)"
        votes.append(f"SUM((({val} >> {shift}) & 1) * 2 - 1) AS v_{i}")
    votes_sql = ",\n         ".join(votes)
    fp = " + ".join(
        f"(CASE WHEN v_{i} >= 0 THEN {2**i} ELSE 0 END)" for i in range(bits)
    )
    bands = ", ".join(
        f"((sh >> {b * width}) & {mask})" for b in range(n_bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), votes AS (
  SELECT doc_id,
         {votes_sql}
  FROM hashed GROUP BY doc_id
), fps AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS sh FROM votes
), grp AS (
  SELECT sh, count(*) AS cnt FROM fps GROUP BY sh
), zero AS (
  SELECT 0 AS hamming, CAST((cnt * (cnt - 1)) // 2 AS BIGINT) AS n_pairs
  FROM grp
), bands AS (
  SELECT sh, cnt, unnest([{bands}]) AS val,
         unnest([{", ".join(str(b) for b in range(n_bands))}]) AS band
  FROM grp
), cand AS (
  SELECT DISTINCT l.sh AS sh_a, l.cnt AS cnt_a, r.sh AS sh_b, r.cnt AS cnt_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.val = r.val
  WHERE l.sh < r.sh
), nonzero AS (
  SELECT CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming,
         CAST(cnt_a * cnt_b AS BIGINT) AS n_pairs
  FROM cand
  WHERE bit_count(xor(sh_a, sh_b)) <= {k}
), unioned AS (
  SELECT * FROM zero UNION ALL SELECT * FROM nonzero
)
SELECT hamming, SUM(n_pairs) AS n_pairs
FROM unioned
GROUP BY hamming
HAVING SUM(n_pairs) > 0
ORDER BY hamming
"""


QUERIES["a187_simhash_hamming_census"] = QuerySpec(
    a187_simhash_hamming_census, _a187_sql()
)


# ---------------------------------------------------------------------------
# c65 -- runtime-bloom-pruned shuffle join.  The 100 TB pattern: when a
# selective dim slice shuffle-joins a huge fact, Spark's InjectRuntimeFilter
# builds an xxhash64 bloom filter over the creation side's join keys and
# pushes a might_contain() semi-filter onto the FACT SCAN, so rows that
# cannot match never enter the shuffle.  The bloom is a superset filter
# (false positives only) and the join still verifies equality, so the
# result is byte-identical to the plain join -- the oracle is plain SQL.
#
# The conf knobs live on a CLONED SparkSession (spark.newSession(): shared
# catalog/JVM, separate SQLConf), so forcing the shuffle join and lowering
# the injection thresholds to toy scale cannot leak into other queries in
# the same sweep.  Plan-gated: might_contain + SortMergeJoin must appear.
# ---------------------------------------------------------------------------


def c65_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # toy-scale visibility: at 100 TB the defaults (creation side <= 10 MB,
    # application side >= 10 GB) fire on their own; here both sides are KB
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
    )
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    # the bloom pays when the join SHUFFLES (a broadcast join already
    # prunes map-side); model the 100 TB shuffle-join case explicitly
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = load_table(s2, sf_dir, "lineitem")
    o = load_table(s2, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    from ._util import rev_term

    rev = rev_term()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
                "ship_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("ship_month")
    )


C65_SQL = """
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
       count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
ORDER BY 1
"""

QUERIES["c65_bloom_prejoin"] = QuerySpec(c65_bloom_prejoin, C65_SQL)
