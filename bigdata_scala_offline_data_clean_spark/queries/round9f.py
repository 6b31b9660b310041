"""Round-9f queries: the last three TPC-H shapes (Q11, Q12, Q16), the
degree-oriented triangle census (a191), zone-map pruning audit (c66),
the left-outer stream join with flush sentinel (s16), BPE merge
induction (a192), and EWMA/CUSUM ordered-recursion monitors (a193).

With the TPC-H trio the registry covers all 22 TPC-H query SHAPES (9c/9d
added Q2/Q4-Q10/Q13-Q15/Q17-Q22; Q1/Q3 have been in since analytics.py).
As everywhere in this family, shapes are re-expressed over the driver
testdata schema -- there is no partsupp table, so the part<->supplier
"supply catalog" is derived as the DISTINCT (l_partkey, l_suppkey)
relation, exactly as a174 (Q2 shape) already does:

a188 important parts (Q11: group-sum HAVING against a global
scalar-subquery fraction -- the only TPC-H shape where the HAVING
comparator is a scalar over the SAME aggregate), a189 priority line
counts (Q12: fact-fact equi-join + CASE-conditional counts per group
over an anchored trailing window), a190 supplier-relation census (Q16:
COUNT(DISTINCT) over a derived relation with a NOT-IN exclusion
subquery; the "customer complaints" comment filter has no comment
column here, so the exclusion stand-in is s_acctbal < 3000 --
deterministic and non-empty at sf0.01).

Scale notes: a188's threshold compare is exact-decimal on BOTH sides
(``val * 1000 > total`` -- no IEEE boundary row can flip between
engines); a189's lineitem-orders join shuffles both facts on
l_orderkey/o_orderkey (the canonical co-partitioned Q12 plan -- orders
is NOT broadcast, it scales with lineitem); a190's exclusion is a
broadcast LEFT ANTI against the supplier dim and its part filters are
applied to the dim BEFORE the fact join so the scan prunes.  Floats
follow the repo rule: decimal-exact sums, cast to double only on output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import dec2 as _dec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# a188 -- TPC-H Q11 shape: parts whose supply value within one region
# exceeds a fixed fraction of the region's total supply value.  Value is
# extendedprice * quantity (the ps_supplycost * ps_availqty analog on
# the derived catalog).  The HAVING is a scalar subquery over the same
# aggregate; both sides stay exact decimal (val*1000 > total), so no
# borderline row can disagree between Spark and DuckDB.
# ---------------------------------------------------------------------------

_A188_REGION = 0  # r_regionkey filter (region names are REGION_<k>)
_A188_FRAC_INV = 1000  # part kept iff val > total / 1000


def a188_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    val = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .where(F.col("n_regionkey") == _A188_REGION)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("__val"))
    )
    total = per_part.agg(F.sum("__val").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__val") * F.lit(_A188_FRAC_INV) > F.col("__total"))
        .select(
            "l_partkey",
            F.col("__val").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_A188_VAL_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_quantity AS DECIMAL(18,2))"
)

A188_SQL = f"""
WITH v AS (
  SELECT l_partkey, SUM({_A188_VAL_SQL}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = {_A188_REGION}
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val * {_A188_FRAC_INV} > (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, l_partkey
"""

QUERIES["a188_important_parts"] = QuerySpec(a188_important_parts, A188_SQL)


# ---------------------------------------------------------------------------
# a189 -- TPC-H Q12 shape: per-group CASE-conditional order-priority
# counts over a trailing 1-year window anchored at max(l_shipdate) (the
# a59/a178 anchoring pattern).  The testdata has no l_shipmode, so the
# group is l_returnflag.  lineitem JOIN orders is the canonical
# co-partitioned fact-fact shuffle on the order key -- orders grows with
# lineitem and must NOT be broadcast.
# ---------------------------------------------------------------------------

_A189_HIGH = ("1-URGENT", "2-HIGH")


def a189_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    mx = li.agg(F.max("l_shipdate").alias("__mx"))
    # when/otherwise, NOT isin().cast(): a NULL priority must count as
    # LOW (the oracle's CASE ... ELSE 1), not vanish from both sums
    high = F.when(
        F.col("o_orderpriority").isin(*_A189_HIGH), F.lit(1)
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        li.crossJoin(F.broadcast(mx))
        .where(
            F.col("l_shipdate") >= F.col("__mx") - F.expr("INTERVAL 365 DAYS")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


A189_SQL = f"""
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('{_A189_HIGH[0]}', '{_A189_HIGH[1]}')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('{_A189_HIGH[0]}', '{_A189_HIGH[1]}')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= (SELECT max(l_shipdate) FROM lineitem)
                    - INTERVAL 365 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

QUERIES["a189_priority_line_counts"] = QuerySpec(
    a189_priority_line_counts, A189_SQL
)


# ---------------------------------------------------------------------------
# a190 -- TPC-H Q16 shape: how many distinct suppliers can supply parts
# of each (brand, type, size), over the derived DISTINCT
# (l_partkey, l_suppkey) relation, excluding a supplier blocklist via
# NOT IN (here: s_acctbal < 3000 -- the comment-LIKE stand-in).  Spark
# runs the exclusion as a broadcast LEFT ANTI (same semantics:
# s_suppkey is never NULL); part filters are pushed onto the dim before
# the fact join.
# ---------------------------------------------------------------------------

_A190_BAD_BAL = 3000
_A190_EXCL_BRAND = "Brand#13"
_A190_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def a190_supplier_relation_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.where(F.col("s_acctbal") < _A190_BAD_BAL).select("s_suppkey")
    p_keep = p.where(
        (F.col("p_brand") != _A190_EXCL_BRAND)
        & F.col("p_size").isin(*_A190_SIZES)
    )
    return (
        ps.join(
            F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p_keep), ps.l_partkey == p_keep.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


A190_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < {_A190_BAD_BAL})
  AND p_brand <> '{_A190_EXCL_BRAND}'
  AND p_size IN {_A190_SIZES}
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

QUERIES["a190_supplier_relation_census"] = QuerySpec(
    a190_supplier_relation_census, A190_SQL
)


# ---------------------------------------------------------------------------
# a191 -- global triangle census on the co-purchase graph (a162's edge
# fixture).  Complements a69 (per-node triangle top-20 via the naive
# canonical 3-way join) the way LSH complements exact dedup: a191 IS the
# scale path.  Spark runs degree-ORIENTED enumeration (Suri &
# Vassilvitskii WWW'11 -- out-degree bounded by O(sqrt(m)), so a hub
# node emits zero wedges from its center and no "last reducer" exists);
# the oracle runs the canonical u<v three-way join, legal at toy scale,
# and the counts agree exactly because triangle count is
# orientation-invariant.  Clustering coefficient = 3*tri/wedges is the
# one IEEE division, rounded to 6.
# ---------------------------------------------------------------------------

_A191_SUPPORT = 2


def a191_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import co_purchase_edges, triangle_census

    li = load_table(spark, sf_dir, "lineitem")
    edges = co_purchase_edges(
        li.select("l_orderkey", "l_partkey"), min_support=_A191_SUPPORT
    )
    return triangle_census(edges)


def _a191_sql() -> str:
    from ..operators.graph import co_edges_cte

    return f"""
WITH {co_edges_cte("e", min_support=_A191_SUPPORT)},
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) s
  GROUP BY 1
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg)
         AS n_wedges,
       n_triangles,
       round(3.0 * n_triangles
             / (SELECT SUM((deg * (deg - 1)) // 2) FROM deg), 6)
         AS global_clustering
FROM tri
"""


QUERIES["a191_triangle_census"] = QuerySpec(a191_triangle_census, _a191_sql())


# ---------------------------------------------------------------------------
# c66 -- zone-map pruning audit: per-day partition min/max "zone maps"
# over orders.o_totalprice, then each partition classified against a
# band predicate the way a parquet/Delta reader's data-skipping pass
# would -- 'pruned' (zone disjoint from the band: file never opened),
# 'full' (zone inside the band: rows need no re-filter), 'partial'
# (file opened and filtered).  The summary per class (partition count +
# row count) is the standard layout-health readout deciding whether a
# table needs clustering (see operators/layout.zorder_layout for the
# fix this audit motivates).  One day-keyed aggregate + one class-keyed
# aggregate; no join.
# ---------------------------------------------------------------------------

_C66_LO, _C66_HI = 50_000, 150_000


def c66_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    zm = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias(
            "part_day"
        )
    ).agg(
        F.min("o_totalprice").alias("__mn"),
        F.max("o_totalprice").alias("__mx"),
        F.count(F.lit(1)).alias("__n"),
    )
    cls = (
        F.when(
            (F.col("__mx") < _C66_LO) | (F.col("__mn") > _C66_HI), "pruned"
        )
        .when(
            (F.col("__mn") >= _C66_LO) & (F.col("__mx") <= _C66_HI), "full"
        )
        .otherwise("partial")
    )
    return (
        zm.select(cls.alias("scan_class"), "__n")
        .groupBy("scan_class")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("__n").alias("n_rows"),
        )
        .orderBy("scan_class")
    )


C66_SQL = f"""
WITH zm AS (
  SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS part_day,
         min(o_totalprice) AS mn, max(o_totalprice) AS mx,
         count(*) AS n
  FROM orders GROUP BY 1
)
SELECT CASE WHEN mx < {_C66_LO} OR mn > {_C66_HI} THEN 'pruned'
            WHEN mn >= {_C66_LO} AND mx <= {_C66_HI} THEN 'full'
            ELSE 'partial' END AS scan_class,
       count(*) AS n_partitions,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM zm
GROUP BY 1
ORDER BY 1
"""

QUERIES["c66_zone_map_pruning"] = QuerySpec(c66_zone_map_pruning, C66_SQL)


# ---------------------------------------------------------------------------
# s16 -- watermarked stream-stream LEFT OUTER interval join (attribution
# with explicit non-conversions: every view emits exactly once, either
# with its attributed click or null-padded).  Structured Streaming emits
# outer results ONLY when the watermark passes left_ts + within, via the
# engine's no-data batch -- so an availableNow run would withhold every
# view inside the final watermark horizon and never match the batch
# oracle.  The production fix is the FLUSH SENTINEL (heartbeat) pattern:
# one view + one click event at max(ts) + 1 day under the reserved
# user_id -1, dropped into the source dir next to the real file.  The
# sentinel advances both sides' watermarks past every real row, the
# no-data batch evicts and emits all state, and the sentinel rows
# themselves are filtered from the output.  The oracle is then the plain
# batch LEFT JOIN over the ORIGINAL events -- full-strength equality.
# ---------------------------------------------------------------------------


def _s16_source_dir(spark: SparkSession, sf_dir: str) -> str:
    """Scratch drop dir: events.parquet symlink + the sentinel file,
    written once (idempotent via a done-marker).  The sentinel parquet is
    built with pyarrow against the file's EXACT arrow schema, so both
    testdata vintages (ns-int64 and timestamp[us]) round-trip; its max-ts
    anchor is one bounded driver fetch from a Spark aggregate."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ._util import _pin_session

    # pin nanosAsLong/UTC BEFORE the raw read: on ns-vintage testdata a
    # fresh (driver) session would otherwise throw ILLEGAL_PARQUET_TYPE
    # here, making the is_integer branch below unreachable
    _pin_session(spark)

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    # key the scratch dir on (path, mtime, size) so a regenerated
    # testdata file gets a FRESH dir -- a stale sentinel below the new
    # max(ts) would silently stop flushing the outer-join tail
    st = os.stat(src)
    path_h = hashlib.md5(src.encode()).hexdigest()[:12]
    vint_h = hashlib.md5(
        f"{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    drop_dir = os.path.join(
        tempfile.gettempdir(), f"stream_flush_{path_h}_{vint_h}"
    )
    # prune stale vintages of THIS source only (ADVICE r9): regenerated
    # testdata changes the vintage hash, so older dirs for the same path
    # would otherwise leak in the system tempdir forever.  Dirs keyed on
    # OTHER paths (a different sf dir live in the same session) are left
    # alone; the legacy single-hash naming (no path component) is also
    # swept since those can never be revalidated.
    import glob
    import shutil
    import time

    # ADVICE r10: a concurrent session (older code with the legacy naming,
    # or another user mid-flush) may still be writing one of these dirs --
    # only reap dirs idle past a grace period, never an active one.
    _GRACE_S = 3600
    now = time.time()
    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), f"stream_flush_{path_h}_*")
    ) + [
        p
        for p in glob.glob(os.path.join(tempfile.gettempdir(), "stream_flush_*"))
        if len(os.path.basename(p)) == len("stream_flush_") + 12
    ]:
        if os.path.abspath(stale) == os.path.abspath(drop_dir):
            continue
        try:
            idle = now - os.stat(stale).st_mtime
        except OSError:
            continue  # raced: someone else already removed it
        if idle > _GRACE_S:
            shutil.rmtree(stale, ignore_errors=True)
    done = os.path.join(drop_dir, ".sentinel_done")
    if os.path.exists(done):
        return drop_dir
    os.makedirs(drop_dir, exist_ok=True)
    link = os.path.join(drop_dir, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass
    schema = pq.read_schema(src)
    ts_type = schema.field("ts").type
    raw = spark.read.parquet(src)
    mx = raw.agg(F.max("ts").alias("mx")).collect()[0]["mx"]  # 1-row fetch
    day_us = 86_400 * 10**6
    if pa.types.is_integer(ts_type):  # TIMESTAMP(NANOS) vintage, ns-long
        sent_ts = [int(mx) + day_us * 1000] * 2
        ts_arr = pa.array(sent_ts, type=ts_type)
    else:
        import datetime

        bump = datetime.timedelta(days=1)
        ts_arr = pa.array([mx + bump, mx + bump], type=ts_type)
    cols = []
    for f in schema:
        if f.name == "ts":
            cols.append(ts_arr)
        elif f.name == "event_id":
            cols.append(pa.array([-1, -2], type=f.type))
        elif f.name == "user_id":
            cols.append(pa.array([-1, -1], type=f.type))
        elif f.name == "event_type":
            cols.append(pa.array(["view", "click"], type=f.type))
        else:
            cols.append(pa.nulls(2, type=f.type))
    # write-then-rename so a concurrent query never streams a partial
    # sentinel file; the done-marker rename is the commit point
    tmp = os.path.join(drop_dir, f".sentinel_{os.getpid()}.tmp")
    pq.write_table(pa.Table.from_arrays(cols, schema=pa.schema(list(schema))), tmp)
    os.replace(tmp, os.path.join(drop_dir, "sentinel.parquet"))
    tmp_done = os.path.join(drop_dir, f".done_{os.getpid()}.tmp")
    open(tmp_done, "w").close()
    os.replace(tmp_done, done)
    return drop_dir


def s16_stream_left_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.jobs import run_available_now, stream_stream_join
    from ._util import ts_str

    drop_dir = _s16_source_dir(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")  # pins session confs
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev = spark.readStream.schema(raw_schema).parquet(drop_dir)
    for c, t in ev.dtypes:
        if c == "ts" and t == "bigint":
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif t == "timestamp_ntz":
            ev = ev.withColumn(c, F.col(c).cast("timestamp"))
    ev = ev.select(*batch.columns)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    joined = stream_stream_join(
        views,
        clicks,
        "user_id",
        "view_ts",
        "click_ts",
        "1 hour",
        "15 minutes",
        how="left_outer",
    )
    return (
        run_available_now(joined, spark)
        .where(F.col("user_id") >= 0)  # drop the flush sentinel
        .select(
            "user_id",
            "view_id",
            "click_id",
            ts_str("view_ts").alias("view_ts"),
            ts_str("click_ts").alias("click_ts"),
        )
    )


S16_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM events v
LEFT JOIN events c
  ON v.user_id = c.user_id
 AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 15 MINUTE
WHERE v.event_type = 'view'
"""

QUERIES["s16_stream_left_attribution"] = QuerySpec(
    s16_stream_left_attribution, S16_SQL
)


# ---------------------------------------------------------------------------
# a192 -- distributed BPE merge induction (Sennrich ACL'16): the first 3
# tokenizer merges learned from the corpus.  Pair statistics ride the
# word-TYPE frequency table (the classic BPE scale trick -- types, not
# tokens), each round's argmax is a 1-row broadcast back into a literal
# two-pass replace merge; the oracle unrolls the identical three rounds
# as a CTE chain, so the greedy variant is bit-identical across engines
# (see operators/text.bpe_merge_rounds for the two-pass rationale).
# ---------------------------------------------------------------------------

_A192_ROUNDS = 3


def a192_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_merge_rounds

    d = load_table(spark, sf_dir, "documents")
    return bpe_merge_rounds(d, rounds=_A192_ROUNDS)


def _a192_sql() -> str:
    merge_once = (
        "replace(concat(' ', {s}, ' '),"
        " concat(' ', (SELECT p1 FROM top{r}), ' ', (SELECT p2 FROM top{r}), ' '),"
        " concat(' ', (SELECT p1 FROM top{r}), (SELECT p2 FROM top{r}), ' '))"
    )
    stages = [
        """wf AS (
  SELECT w, CAST(SUM(1) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents) s
  WHERE length(w) > 0 GROUP BY 1
),
seq0 AS (
  SELECT freq, array_to_string(regexp_extract_all(w, '.'), ' ') AS seq
  FROM wf
)"""
    ]
    arms = []
    for r in range(1, _A192_ROUNDS + 1):
        p = r - 1
        inner = merge_once.format(s="seq", r=r)
        two_pass = merge_once.format(s=inner, r=r)
        stages.append(
            f"""z{r} AS (
  SELECT freq, unnest(list_zip(syms, syms[2:])) AS z
  FROM (SELECT freq, string_split(seq, ' ') AS syms FROM seq{p}) t
),
pairs{r} AS (
  SELECT z[1] AS p1, z[2] AS p2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM z{r} WHERE z[2] IS NOT NULL GROUP BY 1, 2
),
top{r} AS (
  SELECT p1, p2, cnt FROM pairs{r} ORDER BY cnt DESC, p1, p2 LIMIT 1
),
seq{r} AS (
  SELECT freq, trim({two_pass}) AS seq FROM seq{p}
)"""
        )
        arms.append(
            f"""SELECT {r} AS round,
       p1 AS left_sym, p2 AS right_sym,
       p1 || p2 AS merged_sym, cnt AS pair_count
FROM top{r}"""
        )
    return "WITH " + ",\n".join(stages) + "\n" + "\nUNION ALL\n".join(arms)


QUERIES["a192_bpe_merges"] = QuerySpec(a192_bpe_merges, _a192_sql())


# ---------------------------------------------------------------------------
# a193 -- EWMA + one-sided CUSUM over the daily event-volume series, per
# event type: the two classic ORDERED-RECURSION monitors (smoothing and
# changepoint drift) that a plain window sum cannot express (EWMA's
# closed form overflows for long series; CUSUM's max(0, .) reset is
# inherently recursive).  The pattern: collect the ordered prefix frame
# into a list (bounded -- the series is CALENDAR-sized per type, never
# data-sized) and FOLD with the recursion, identical lambda in both
# engines, so the IEEE operation order is pinned and results are
# bit-identical.  The CUSUM target is the per-type mean, decimal-exact
# (integer count sum / day count -- one IEEE division).
# ---------------------------------------------------------------------------

_A193_ALPHA = 0.3


def a193_ewma_cusum_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        (
            F.sum("n_events").cast("double") / F.count(F.lit(1))
        ).alias("__mean")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a = _A193_ALPHA
    d = daily.join(F.broadcast(stats), "event_type").withColumn(
        "__xs", F.collect_list(F.col("n_events").cast("double")).over(w)
    )
    ewma = F.expr(
        f"aggregate(slice(__xs, 2, size(__xs) - 1),"
        f" CAST(__xs[0] AS DOUBLE),"
        f" (acc, v) -> {1 - a}D * acc + {a}D * v)"
    )
    cusum = F.expr(
        "aggregate(__xs, CAST(0 AS DOUBLE),"
        " (acc, v) -> greatest(CAST(0 AS DOUBLE), acc + v - __mean))"
    )
    return d.select(
        "event_type",
        "day",
        "n_events",
        F.round(ewma, 6).alias("ewma"),
        F.round(cusum, 6).alias("cusum_pos"),
    ).orderBy("event_type", "day")


A193_SQL = f"""
WITH daily AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_n
  FROM daily GROUP BY 1
), framed AS (
  SELECT d.event_type, d.day, d.n_events, s.mean_n,
         list(CAST(d.n_events AS DOUBLE)) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
  FROM daily d JOIN stats s USING (event_type)
)
SELECT event_type, day, n_events,
       round(CAST(list_reduce(xs,
             (acc, v) -> {1 - _A193_ALPHA} * acc + {_A193_ALPHA} * v)
             AS DOUBLE), 6) AS ewma,
       round(CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
             (acc, v) -> greatest(CAST(0 AS DOUBLE), acc + v - mean_n))
             AS DOUBLE), 6) AS cusum_pos
FROM framed
ORDER BY event_type, day
"""

QUERIES["a193_ewma_cusum_volume"] = QuerySpec(
    a193_ewma_cusum_volume, A193_SQL
)


# ---------------------------------------------------------------------------
# a194 -- Gini concentration of customer spend within each nation: the
# standard inequality readout (used in curation to flag sources where a
# few whales dominate the data).  Gini = sum((2 r_i - n - 1) x_i) /
# (n * sum(x)) over values ranked ascending within the nation.  The rank
# window is PARTITIONED by nation (key-bounded -- customers per nation,
# never raw facts); spend aggregates once from orders before ranking.
# Weighted terms follow the repo float rule: round(term, 9) ->
# DECIMAL(28,9) sum -> one final IEEE division.
# ---------------------------------------------------------------------------


def a194_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("__spend"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "o_custkey", "__spend")
    )
    w = Window.partitionBy("n_name").orderBy("__spend", "o_custkey")
    term = (
        (F.lit(2) * F.row_number().over(w) - F.count(F.lit(1)).over(
            Window.partitionBy("n_name")
        ) - F.lit(1)).cast("decimal(28,9)")
        * F.col("__spend").cast("decimal(28,9)")
    )
    ranked = spend.select(
        "n_name",
        F.round(term, 9).cast("decimal(38,9)").alias("__term"),
        "__spend",
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("__term").alias("__num"),
            F.sum("__spend").alias("__tot"),
        )
        .select(
            "n_name",
            "n_customers",
            F.round(
                F.col("__num").cast("double")
                / (
                    F.col("n_customers").cast("double")
                    * F.col("__tot").cast("double")
                ),
                6,
            ).alias("gini"),
        )
        .orderBy("n_name")
    )


A194_SQL = """
WITH spend AS (
  SELECT n_name, o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT n_name, spend,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY spend, o_custkey) AS r,
         count(*) OVER (PARTITION BY n_name) AS n
  FROM spend
)
SELECT n_name,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       round(CAST(SUM(CAST(round((2 * r - n - 1)
                    * CAST(spend AS DECIMAL(28,9)), 9)
                    AS DECIMAL(38,9))) AS DOUBLE)
             / (MAX(n) * CAST(SUM(spend) AS DOUBLE)), 6) AS gini
FROM ranked
GROUP BY n_name
ORDER BY n_name
"""

QUERIES["a194_spend_gini"] = QuerySpec(a194_spend_gini, A194_SQL)
