"""Round-11 queries: duplicated-span REMOVAL (the curation transform).

VERDICT r10 task #2: round 10 added the winnowing *detector* (a203 match
pairs); this round adds the operator a curation pipeline actually runs --
the cleaned corpus with duplicated spans excised (Lee et al. 2022-style
exact substring dedup, winnowing-localized), plus bytes-removed stats.

Removal is expressed as per-position gram coverage with NO Python:
winnowing windows whose min-gram fingerprint appears in >= 2 distinct
documents mark their character span ``[pos, pos + w + k - 2]`` for
removal (occurrences in the minimum doc_id holding the fingerprint are
kept -- one canonical copy survives); coverage is a difference-array
cumsum over span-edge events; the kept segments re-assemble via
``substring`` + ``array_join``.  DuckDB recomputes the identical
pipeline (string_agg ORDER BY over the same cumsum), so the full
cleaned text is exact-match checked, not just the stats.

Guarantee (pytest-pinned): a shared substring of >= w + k - 1 chars is
FULLY removed from every non-keeper document -- every fully-inside
window's min is shared, and their spans union to the whole substring.
Windows straddling the boundary may drag up to w + k - 2 neighboring
chars along (winnowing granularity; documented tradeoff).

Scale (100 TB): per-document gram explode + window min (one repartition
by doc); consecutive same-fp windows collapse to runs inside the same
doc partition (lag + running sum, no extra shuffle) before the
fingerprint join; duplicated-fp detection is a plain fp groupBy -- no
self-join, so no df_cap is needed and ubiquitous boilerplate is REMOVED
rather than whale-capped.  Coverage events are 2 per removal run (never
per-character); per-doc aggregate state is bounded by the kept-interval
list, at most the size of the document row itself.

Reference parity note: the reference ETL suite has no text curation ops
(src/main/scala/com/kanseiu/spark/handler -- warehouse jobs only); this
family extends the engine into the training-data domain per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_SD_K, _SD_W = 5, 4  # winnowing params, shared with a203


def a204_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus after duplicated-span removal over ``documents``:
    every span covered by a cross-document winnowing fingerprint is
    excised except in its canonical (minimum doc_id) holder."""
    from ..operators.text import winnow_span_dedup

    d = load_table(spark, sf_dir, "documents")
    return winnow_span_dedup(
        d, k=_SD_K, w=_SD_W, keep="first", min_doc_freq=2
    )


def _a204_sql() -> str:
    k, w = _SD_K, _SD_W
    span = w + k - 2
    return f"""
WITH grams AS (
  SELECT doc_id, p AS pos, md5(substr(text, p, {k})) AS h,
         length(text) - {k} + 1 AS n
  FROM documents,
       LATERAL unnest(generate_series(1,
           greatest(length(text) - {k} + 1, 0))) AS t(p)
), winmin AS (
  SELECT doc_id, pos, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS fp
  FROM grams
), wins AS (
  -- full windows only (WHERE runs before window functions in DuckDB,
  -- so the filter wraps the windowed subquery -- same note as a203)
  SELECT doc_id, pos, fp FROM winmin WHERE pos <= n - {w} + 1
), dup AS (
  SELECT fp, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, fp FROM wins)
  GROUP BY fp HAVING count(*) >= 2
), rem AS (
  SELECT w.doc_id, w.pos AS s, w.pos + {span} AS e
  FROM wins w JOIN dup USING (fp)
  WHERE w.doc_id <> dup.keeper
), ev AS (
  SELECT doc_id, s AS pos, 1 AS d FROM rem
  UNION ALL SELECT doc_id, e + 1 AS pos, -1 AS d FROM rem
  UNION ALL SELECT DISTINCT doc_id, 1 AS pos, 0 AS d FROM rem
), agg AS (
  SELECT doc_id, pos, sum(d) AS d FROM ev GROUP BY doc_id, pos
), cum AS (
  SELECT doc_id, pos,
         sum(d) OVER (PARTITION BY doc_id ORDER BY pos) AS cov,
         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM agg
), cum2 AS (
  SELECT doc_id, pos, cov, nxt,
         coalesce(lag(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0)
           AS prevcov
  FROM cum
), segs AS (
  SELECT c.doc_id,
         string_agg(
           CASE WHEN cov = 0
                THEN substr(d.text, pos,
                            coalesce(nxt - 1, length(d.text)) - pos + 1)
                ELSE '' END, '' ORDER BY pos) AS clean,
         sum(CASE WHEN cov > 0 AND prevcov = 0 THEN 1 ELSE 0 END)
           AS n_spans
  FROM cum2 c JOIN documents d USING (doc_id)
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(s.clean, d.text) AS clean_text,
       CAST(length(d.text) AS BIGINT) AS orig_len,
       CAST(length(coalesce(s.clean, d.text)) AS BIGINT) AS kept_len,
       CAST(length(d.text) - length(coalesce(s.clean, d.text)) AS BIGINT)
         AS removed_chars,
       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans
FROM documents d LEFT JOIN segs s USING (doc_id)
"""


QUERIES["a204_span_dedup"] = QuerySpec(a204_span_dedup, _a204_sql())
