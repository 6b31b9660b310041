"""Round-15 queries: the persisted-index lifecycle completed with its
missing verbs (VERDICT r14 tasks #1-#3), plus the serve matrix's last
cells and the threshold-percolation monitoring pair.

The module's eight queries, by role:

- c71  tombstone ERASURE on the MinHash band index (build -> absorb ->
       erase -> serve, exact oracle over the live documents)
- c72  persisted PERCEPTUAL-fingerprint index serving (the c70 pattern
       on the a213 average-hash; verify needs no corpus re-read)
- c73  PHYSICAL erasure on the cell-partitioned IVF index (targeted
       partition rewrite; recall audited over the live corpus)
- c74  the GDPR erasure CASCADE executed across all three indexes with
       a read-back count audit (first-principles count oracle)
- c75  SemDeDup SERVING off the cell-partitioned vector index (the
       dedup gate counterpart of c69's ANN serving)
- s17  STREAMING serve-then-absorb ingest (foreachBatch; exact oracle
       via batch-split independence)
- a215 near-dup PERCOLATION health report (exact form; quadratic by
       contract) and
- a216 its linear bounded-sample form -- the monitored shape of the
       round's falsified-remediation finding (SCALE.md: fixed tau
       percolates as n grows; recalibrate tau, retraining k alone makes
       it worse).

c71 -- ERASURE from the incremental MinHash index: build -> absorb ->
erase a document set -> serve, with the erase implemented as
merge-on-read tombstones (``Warehouse.append_tombstones`` /
``read_bucketed_live``): deletion is an O(|erased|) id append, honoring
it is a broadcast anti-join that PRESERVES the bucketed scan's
distribution (still zero index-side exchanges -- pytest-pinned), and
physical removal folds into the next compaction
(``Warehouse.compact_bucketed``, also pytest-pinned to leave serve
output identical while collapsing the absorb-append file generations).
A 100 TB corpus under retention/GDPR needs exactly this: remove
documents from the dedup index without rebuilding it.  Reference-parity
anchor: the reference's whole point is incremental upsert semantics
(CustomerInfDataClean.scala:41-45 keep-newest); deletion is the third
verb its pattern implies but never shipped.

c72 -- the c70 build-once/serve-pruned pattern applied to the
PERCEPTUAL fingerprints (a213): the corpus' average-hash band rows are
themselves the index payload (``dedup.hash64_band_rows``), persisted
bucketed on the band join key; each day's delta decodes ITS OWN images
only and band-joins the index.  Because the index rows carry the full
64-bit hash, the Hamming verify needs NO corpus re-read at all --
unlike the MinHash serve, whose exact-Jaccard check re-reads bounded
candidate texts.  This unifies all three modalities (vectors c69, text
c70, perceptual c72) on one persisted-index abstraction.

Oracles: fingerprints/signatures are deterministic functions of the
content, so build-then-(absorb-erase-)serve is ALGEBRAICALLY the
full-corpus pair pipeline over the LIVE (non-erased) documents
restricted to delta-involved pairs -- the DuckDB twins are exactly
that (a07's / a213's SQL wrapped in the membership filters), keeping
the whole lifecycle exact-match checked.

Reference parity note: the reference ETL suite (873 lines,
src/main/scala/com/kanseiu/spark/handler -- warehouse jobs only) has no
dedup/index surface; this extends the engine per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

# c71 membership split (mod-10 on doc_id so the oracle recomputes it):
#   day-0 corpus  rem not in {DELTA, ABSORB}   -> built into the index
#   day-1 absorb  rem == ABSORB                -> appended band rows
#   erase set     rem == ERASE (subset of day-0) -> tombstoned
#   day-2 delta   rem == DELTA                 -> served
# rems chosen so the erase is DIFFERENTIALLY visible at every test SF
# (it removes >= 1 delta-involved pair at sf0.001/0.01/0.1: 1/1/7),
# never emptying the answer (kept pairs 2/7/41).
_C71_MOD = 10
_C71_DELTA_REM = 5
_C71_ABSORB_REM = 9
_C71_ERASE_REM = 7
_C71_BUCKETS = 8


def c71_minhash_index_erase(
    spark: SparkSession, sf_dir: str, *, reliable_pins: bool | None = None
) -> DataFrame:
    """The full incremental-index lifecycle including the DELETE verb:
    build the corpus band index, absorb day-1, tombstone-erase a doc
    set, serve day-2 against the live index.  Output: the (a, b,
    jaccard) near-dup pairs involving at least one delta document, over
    the corpus WITHOUT the erased documents.

    Scale: erase cost is O(|erased|) at write time (an id append) plus
    a broadcast anti-join at serve time that adds no exchange; nothing
    is re-shingled, no index file is rewritten until the next scheduled
    compaction folds the tombstones in physically.  The absorb step
    runs first so the serve demonstrably honors BOTH pending states --
    multiple file generations AND tombstones -- at once.
    """
    if reliable_pins is None:  # production default: reliable iff a
        from ..operators.ordering import auto_reliable_pins

        reliable_pins = auto_reliable_pins(spark)  # checkpoint dir is set
    import shutil
    import tempfile

    from ..operators.dedup import minhash_band_index, serve_minhash_band_index
    from ..sources.catalog import Warehouse
    from ._util import freeze_result
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE, _MH_THRESHOLD

    d = load_table(spark, sf_dir, "documents")
    rem = F.pmod(F.col("doc_id"), F.lit(_C71_MOD))
    day0 = d.where(~rem.isin(_C71_DELTA_REM, _C71_ABSORB_REM))
    day1 = d.where(rem == _C71_ABSORB_REM)
    delta = d.where(rem == _C71_DELTA_REM)
    erased = d.where(rem == _C71_ERASE_REM)
    live_corpus = d.where(
        ~rem.isin(_C71_DELTA_REM, _C71_ERASE_REM)
    )  # what the serve may verify against: indexed minus erased
    kw = dict(shingle_n=_MH_SHINGLE, num_hashes=_MH_N, bands=_MH_BANDS)
    scratch = tempfile.mkdtemp(prefix="ods_spark_c71_")
    try:
        wh = Warehouse(spark, scratch)
        spec = dict(
            bucket_cols=["band_id", "band_sig"],
            buckets=_C71_BUCKETS,
            sort_cols=["band_id", "band_sig"],
        )
        # ERASE overlaps the build+absorb chain (r18, guide §2.6): the
        # tombstone append writes only the side table, which nothing
        # reads until the serve below
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            f_tomb = pool.submit(
                wh.append_tombstones, erased.select("doc_id"),
                "dwd", "c71_idx",
            )
            # BUILD (amortized once at 100 TB)
            wh.write_bucketed(
                minhash_band_index(day0, **kw), "dwd", "c71_idx", **spec
            )
            # ABSORB day 1: append band rows under the same bucket spec
            wh.write_bucketed(
                minhash_band_index(day1, **kw),
                "dwd", "c71_idx", **spec, mode="append",
            )
            f_tomb.result()
        # SERVE day 2 against the LIVE index (broadcast anti-join over
        # the bucketed scan -- still zero index-side exchanges)
        out = serve_minhash_band_index(
            wh.read_bucketed_live("dwd", "c71_idx"),
            delta,
            live_corpus,
            threshold=_MH_THRESHOLD,
            reliable_pins=reliable_pins,
            **kw,
        )
        return freeze_result(out)  # pre-DROP/rmtree, executor-side
    finally:
        spark.sql("DROP TABLE IF EXISTS dwd_c71_idx")
        shutil.rmtree(scratch, ignore_errors=True)


def _c71_sql() -> str:
    # signatures are deterministic in the text, so
    # build+absorb+erase+serve == the a07 pipeline over the LIVE
    # documents restricted to delta-involved pairs
    from .analytics import _a07_sql

    return f"""
WITH live AS (
  SELECT * FROM documents WHERE doc_id % {_C71_MOD} <> {_C71_ERASE_REM}
)
SELECT a, b, jaccard FROM ({_a07_sql("live")})
WHERE a % {_C71_MOD} = {_C71_DELTA_REM}
   OR b % {_C71_MOD} = {_C71_DELTA_REM}
"""


QUERIES["c71_minhash_index_erase"] = QuerySpec(
    c71_minhash_index_erase, _c71_sql()
)


# ---------------------------------------------------------------------------
# c72 -- persisted PERCEPTUAL-fingerprint index serving
# ---------------------------------------------------------------------------

_C72_MOD, _C72_DELTA_REM = 10, 8  # >= 1 delta-involved a213 pair at
# every test SF (3 / 2 / 21 at sf0.001/0.01/0.1)
_C72_BUCKETS = 8


def c72_phash_index_serve(
    spark: SparkSession, sf_dir: str, *, reliable_pins: bool | None = None
) -> DataFrame:
    """Build the corpus' average-hash band index once (bucketed on the
    (band, val) join key), then dedup the delta's images against it:
    (a, b, hamming) near-dup pairs with at least one delta side.

    Scale: the expensive pass -- synthesis + REAL P6 decode + avg-hash
    (one Arrow stage) -- runs corpus-wide ONCE at build; each serve
    decodes only the delta.  The index is 4 narrow rows per document
    carrying the full 64-bit hash, so the verify is closed over the
    join output (no corpus re-read of any kind).  Index side plans zero
    exchanges off its bucket spec; the delta side shuffles its 4 rows
    per new document.
    """
    if reliable_pins is None:  # production default: reliable iff a
        from ..operators.ordering import auto_reliable_pins

        reliable_pins = auto_reliable_pins(spark)  # checkpoint dir is set
    import shutil
    import tempfile

    from ..operators.dedup import hash64_band_rows, serve_hash64_band_index
    from ..sources.catalog import Warehouse
    from ._util import freeze_result
    from .round14 import _A213_MAX_HAMMING, _a213_hashes

    d = load_table(spark, sf_dir, "documents")
    is_delta = (
        F.pmod(F.col("doc_id"), F.lit(_C72_MOD)) == _C72_DELTA_REM
    )
    corpus, delta = d.where(~is_delta), d.where(is_delta)
    scratch = tempfile.mkdtemp(prefix="ods_spark_c72_")
    try:
        wh = Warehouse(spark, scratch)
        # BUILD: one corpus-wide decode+hash pass, band rows persisted
        # bucketed+sorted on the join key (absorb = the same
        # write_bucketed(mode="append") as c70/c71; erase = the same
        # tombstone path -- one abstraction, three modalities)
        wh.write_bucketed(
            hash64_band_rows(_a213_hashes(corpus)),
            "dwd",
            "c72_phash_index",
            ["band", "val"],
            buckets=_C72_BUCKETS,
            sort_cols=["band", "val"],
        )
        out = serve_hash64_band_index(
            wh.bucketed_table("dwd", "c72_phash_index"),
            _a213_hashes(delta),
            _A213_MAX_HAMMING,
            reliable_pins=reliable_pins,
        )
        return freeze_result(out)  # pre-DROP/rmtree, executor-side
    finally:
        spark.sql("DROP TABLE IF EXISTS dwd_c72_phash_index")
        shutil.rmtree(scratch, ignore_errors=True)


def _c72_sql() -> str:
    # fingerprints are deterministic in the content, so build-then-serve
    # == the full-corpus a213 pair pipeline restricted to delta-involved
    # pairs
    from .round14 import _a213_sql

    return f"""
SELECT a, b, hamming FROM ({_a213_sql()})
WHERE a % {_C72_MOD} = {_C72_DELTA_REM}
   OR b % {_C72_MOD} = {_C72_DELTA_REM}
"""


QUERIES["c72_phash_index_serve"] = QuerySpec(
    c72_phash_index_serve, _c72_sql()
)


# ---------------------------------------------------------------------------
# c73 -- PHYSICAL erasure from the persisted IVF (vector) index: the c71
# DELETE verb on the third modality, in its physically-targeted form.
# The cell-partitioned layout makes a surgical delete possible: only
# partitions containing erased vectors are rewritten
# (Warehouse.erase_partition_rows -- untouched cells keep byte-identical
# files, an emptied cell disappears; pytest-pinned in
# tests/test_round15.py), then the serve path runs unchanged and the
# recall audit recomputes its exact reference over the LIVE corpus -- a
# stale cell (serving an erased vector) or an over-delete (missing
# neighbor) breaks the exact-match oracle.  Completes the erasure story:
# tombstone/merge-on-read where rows are bucket-scattered (c71 text,
# same machinery for c72 perceptual), partition-targeted physical
# rewrite where the layout co-locates them (vectors by cell).
# ---------------------------------------------------------------------------

# disjoint from the query set (vec_id < 5); differentially visible --
# the erase changes the top-k answer at every test SF (checked in
# DuckDB at sf0.001/0.01/0.1 during development)
_C73_ERASE_MOD, _C73_ERASE_REM = 25, 7


def c73_ivf_index_erase_serve(
    spark: SparkSession, sf_dir: str, *, reliable_pins: bool | None = None
) -> DataFrame:
    if reliable_pins is None:  # production default: reliable iff a
        from ..operators.ordering import auto_reliable_pins

        reliable_pins = auto_reliable_pins(spark)  # checkpoint dir is set
    from .round13 import _ivf_index_lifecycle

    return _ivf_index_lifecycle(
        spark,
        sf_dir,
        erase_mod=_C73_ERASE_MOD,
        erase_rem=_C73_ERASE_REM,
        reliable_pins=reliable_pins,
    )


def _c73_sql() -> str:
    # the physically-erased index serves exactly the a16 candidate
    # algebra over the live corpus: re-point every scan at the live view
    from .analytics import _a16_sql

    live = (
        "(SELECT * FROM embeddings "
        f"WHERE vec_id % {_C73_ERASE_MOD} <> {_C73_ERASE_REM})"
    )
    return _a16_sql(live)


QUERIES["c73_ivf_index_erase_serve"] = QuerySpec(
    c73_ivf_index_erase_serve, _c73_sql()
)


# ---------------------------------------------------------------------------
# s17 -- STREAMING absorb into the persisted MinHash index: the c70/c71
# daily loop as a Structured Streaming ingest.  Each micro-batch of new
# documents is SERVED against the live index (near-dup gate) and then
# ABSORBED (band rows appended under the same bucket spec) inside one
# foreachBatch -- the pattern a continuously-ingesting 100 TB corpus
# runs instead of a nightly job.
#
# Exactness without fixing the batch schedule: serve-before-absorb means
# a pair (x in batch i, y in batch j, i < j) is emitted exactly once --
# at batch j, when x is already in the index -- and within-batch pairs
# come from the serve's delta self-join.  The UNION of per-batch serve
# outputs over ANY partition of the delta into batches therefore equals
# the full-corpus pair pipeline restricted to delta-involved pairs: the
# output is batch-order-INDEPENDENT, so the oracle is exact even though
# the file source's batch order is not contractual.  (The same c70
# oracle SQL -- computed incrementally under a stream checkpoint.)
# ---------------------------------------------------------------------------

# 2 slices since round 16 (bench-budget rule: the smallest SF-visible
# split -- split-invariance is the pinned property, not the slice
# count; test_s17_output_invariant_to_batch_split compares 1 vs 3)
_S17_MOD, _S17_DELTA_REM, _S17_SLICES = 10, 5, 2


def s17_stream_index_absorb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.dedup import minhash_band_index, serve_minhash_band_index
    from ..sources.catalog import Warehouse
    from ._util import freeze_result
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE, _MH_THRESHOLD

    d = load_table(spark, sf_dir, "documents")
    rem = F.pmod(F.col("doc_id"), F.lit(_S17_MOD))
    corpus0, delta = d.where(rem != _S17_DELTA_REM), d.where(
        rem == _S17_DELTA_REM
    )
    kw = dict(shingle_n=_MH_SHINGLE, num_hashes=_MH_N, bands=_MH_BANDS)
    spec = dict(
        bucket_cols=["band_id", "band_sig"], buckets=8,
        sort_cols=["band_id", "band_sig"],
    )
    scratch = tempfile.mkdtemp(prefix="ods_spark_s17_")
    try:
        wh = Warehouse(spark, scratch)
        src = f"{scratch}/arrivals"

        # Round 18 (guide §2.6): the corpus index build and the arrival
        # staging write touch disjoint outputs and share only read-only
        # inputs -- run them as two concurrent driver jobs.  The slice
        # appends stay SEQUENTIAL among themselves: they share one
        # parquet directory, and two concurrent appends would collide
        # in its _temporary staging dir.
        def build_index() -> None:
            # BUILD: the pre-existing corpus index
            wh.write_bucketed(
                minhash_band_index(corpus0, **kw), "dwd", "s17_idx", **spec
            )

        def write_arrivals() -> None:
            # the arriving delta: one file per "day" slice -> one
            # micro-batch per file under maxFilesPerTrigger=1 (the s07
            # precedent)
            for i in range(_S17_SLICES):
                delta.where(
                    F.pmod(
                        F.floor(F.col("doc_id") / _S17_MOD),
                        F.lit(_S17_SLICES),
                    )
                    == i
                ).select("doc_id", "text").coalesce(1).write.mode(
                    "append"
                ).parquet(src)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [
                pool.submit(build_index), pool.submit(write_arrivals)
            ]:
                f.result()
        results = f"{scratch}/served"

        def serve_then_absorb(batch: DataFrame, batch_id: int) -> None:
            from concurrent.futures import ThreadPoolExecutor

            # Round 18 (guide §1.2 + §2.6): the batch's band rows feed
            # BOTH the serve's index join and the absorb append -- one
            # EAGER pin computes the Arrow band pass once (the lazy
            # default would race the two consumers into materializing
            # it concurrently).  With the bands pinned, the absorb
            # writes executor-stored blocks and never reads the index
            # table, so serve and absorb are independent driver jobs
            # and run CONCURRENTLY: serve-before-absorb semantics are
            # preserved because a serve overlap-reading its own batch's
            # freshly-appended rows can only produce within-batch pairs
            # the serve's delta self-join already emits (then distinct),
            # and the corpus-text fetch anti-joins the batch ids out.
            bands = minhash_band_index(batch, **kw).localCheckpoint(
                eager=True
            )

            def serve() -> None:
                # corpus_texts is plain `d`: the serve only touches it
                # through a left-semi join on candidate ids that are
                # ALREADY anti-joined against the batch ids inside
                # serve_minhash_band_index, so the former per-batch
                # `d.join(batch, left_anti)` re-scan was redundant (r18)
                serve_minhash_band_index(
                    wh.bucketed_table("dwd", "s17_idx"),
                    batch,
                    d,
                    threshold=_MH_THRESHOLD,
                    delta_bands=bands,
                    **kw,
                ).write.mode("append").parquet(results)

            def absorb() -> None:
                wh.write_bucketed(
                    bands, "dwd", "s17_idx", **spec, mode="append"
                )

            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [pool.submit(serve), pool.submit(absorb)]
                for f in futs:
                    f.result()

        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(serve_then_absorb)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{scratch}/ckpt")
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.schema("a bigint, b bigint, jaccard double")
            .parquet(results)
            .distinct()
        )
        return freeze_result(out)  # pre-DROP/rmtree, executor-side
    finally:
        spark.sql("DROP TABLE IF EXISTS dwd_s17_idx")
        shutil.rmtree(scratch, ignore_errors=True)


def _s17_sql() -> str:
    # batch-order-independent union == the full pipeline restricted to
    # delta-involved pairs (the c70 identity, computed incrementally)
    from .analytics import _a07_sql

    return f"""
SELECT a, b, jaccard FROM ({_a07_sql()})
WHERE a % {_S17_MOD} = {_S17_DELTA_REM}
   OR b % {_S17_MOD} = {_S17_DELTA_REM}
"""


QUERIES["s17_stream_index_absorb"] = QuerySpec(
    s17_stream_index_absorb, _s17_sql()
)


# ---------------------------------------------------------------------------
# a215 -- near-dup PERCOLATION health report: the one-row probe a
# production semantic-dedup runs BEFORE trusting its threshold.  Round
# 15's measured finding (SCALE.md): at a fixed tau the chance pair
# degree P(cos >= tau) * (n - 1) grows linearly with the corpus, and
# once it crosses ~1 the transitive-closure merge graph percolates into
# a giant component -- semdedup then deletes the corpus, and no
# quantizer retrain can save it (a finer quantizer finds MORE of the
# chance pairs).  This query turns that failure mode into a monitored
# number: exact pair count at the production tau, observed mean pair
# degree, group census, keep rate, and the giant-component fraction
# with an explicit percolation flag (giant > n/2).  At sf0.01 the
# report is already alarming (keep 0.036) and at sf0.1 terminal (keep
# 0.0005) -- the cue to run `calibrate_cosine_threshold`.
# Scale: the exact pair stage is the a21 matmul baseline (quadratic --
# the health probe runs on a SAMPLE at 100 TB; the LSH-bucketed path is
# the estimator there), CC is the O(log n) star contraction, and the
# report is three 1-row broadcast aggregates.
# ---------------------------------------------------------------------------


def a215_neardup_percolation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import connected_components
    from ..operators.ordering import pin_frame
    from ..operators.similarity import embedding_neardup_pairs
    from .analytics import _ND_THRESHOLD

    e = load_table(spark, sf_dir, "embeddings")
    pairs = pin_frame(  # feeds the pair count AND the closure
        embedding_neardup_pairs(e, threshold=_ND_THRESHOLD)
    )
    cc = connected_components(pairs)
    nv = e.agg(F.count(F.lit(1)).alias("n_vecs"))
    np_ = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    comp = cc.groupBy("component").agg(F.count(F.lit(1)).alias("__sz"))
    cagg = comp.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("__n_comp"),
        F.coalesce(F.sum("__sz"), F.lit(0)).alias("__n_nodes"),
        F.coalesce(F.max("__sz"), F.lit(0)).alias("__giant"),
    )
    row = nv.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(cagg))
    n = F.col("n_vecs").cast("double")
    n_groups = (
        F.col("n_vecs") - F.col("__n_nodes") + F.col("__n_comp")
    ).cast("bigint")
    return row.select(
        "n_vecs",
        "n_pairs",
        F.round(F.lit(2.0) * F.col("n_pairs") / n, 6).alias("pair_degree"),
        n_groups.alias("n_groups"),
        F.round(n_groups.cast("double") / n, 4).alias("keep_rate"),
        F.round(F.col("__giant").cast("double") / n, 4).alias("giant_frac"),
        (F.col("__giant").cast("double") / n >= 0.5).alias("percolated"),
    )


def _a215_sql() -> str:
    from ..operators.similarity import DOT_SQL
    from .analytics import _ND_THRESHOLD

    dot = DOT_SQL.replace("{a}", "{x}").replace("{b}", "{y}")
    ab = dot.format(x="a.embedding", y="b.embedding")
    aa = dot.format(x="a.embedding", y="a.embedding")
    bb = dot.format(x="b.embedding", y="b.embedding")
    return f"""
WITH RECURSIVE v AS (SELECT vec_id, embedding FROM embeddings),
pairs AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a.vec_id AS a, b.vec_id AS b,
           round({ab} / (sqrt({aa}) * sqrt({bb})), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
  ) WHERE cosine >= {_ND_THRESHOLD}
), sym AS (
  SELECT a AS u, w FROM (SELECT a, b AS w FROM pairs)
  UNION
  SELECT b AS u, a AS w FROM pairs
), nodes AS (SELECT DISTINCT u AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.w = reach.node
), comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
), sizes AS (
  SELECT component, count(*) AS sz FROM comp GROUP BY component
), cagg AS (
  SELECT COALESCE(count(*), 0) AS n_comp,
         COALESCE(sum(sz), 0) AS n_nodes,
         COALESCE(max(sz), 0) AS giant
  FROM sizes
), base AS (
  SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
         (SELECT count(*) FROM pairs) AS n_pairs
)
SELECT b.n_vecs, b.n_pairs,
       round(2.0 * b.n_pairs / b.n_vecs, 6) AS pair_degree,
       CAST(b.n_vecs - c.n_nodes + c.n_comp AS BIGINT) AS n_groups,
       round(CAST(b.n_vecs - c.n_nodes + c.n_comp AS DOUBLE) / b.n_vecs, 4)
         AS keep_rate,
       round(CAST(c.giant AS DOUBLE) / b.n_vecs, 4) AS giant_frac,
       CAST(c.giant AS DOUBLE) / b.n_vecs >= 0.5 AS percolated
FROM base b CROSS JOIN cagg c
"""


QUERIES["a215_neardup_percolation_report"] = QuerySpec(
    a215_neardup_percolation_report, _a215_sql()
)


# ---------------------------------------------------------------------------
# a216 -- the percolation probe's LINEAR-SCALE form: the same report as
# a215 estimated from a bounded canonical sample.  a215's exact pair
# stage is quadratic by contract (wall tracks the pair count -- 79s on
# the 10x replica as 1.58M pairs emerge); at 100 TB nobody runs that.
# Percolation is decided by the mean CHANCE pair degree, and a sample's
# pair-exceedance rate estimates it: degree_hat = pairs_s / (S*(S-1)/2)
# * (n-1).  The sample is the canonical top-S by vec_id (the
# train_ivf_centroids/calibrate_cosine_threshold convention) so both
# engines draw the identical rows and the estimate is deterministic --
# exact-match oracle, not a tolerance check.  Cost: O(S^2 + n) -- the
# corpus contributes only its count.
# ---------------------------------------------------------------------------

_A216_SAMPLE = 256


def a216_percolation_probe_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import embedding_neardup_pairs
    from .analytics import _ND_THRESHOLD

    e = load_table(spark, sf_dir, "embeddings")
    # canonical bounded sample: top-S by vec_id (TakeOrderedAndProject,
    # never a full sort); at 100 TB S stays fixed while n grows
    sample = e.orderBy(F.col("vec_id").asc()).limit(_A216_SAMPLE)
    pairs = embedding_neardup_pairs(sample, threshold=_ND_THRESHOLD)
    nv = e.agg(F.count(F.lit(1)).alias("n_vecs"))
    ns = sample.agg(F.count(F.lit(1)).alias("n_sample"))
    np_ = pairs.agg(F.count(F.lit(1)).alias("n_sample_pairs"))
    s = F.col("n_sample").cast("double")
    # the risk flag compares the UNROUNDED ratio, exactly like the SQL
    # twin (ADVICE r15: comparing the 6dp-rounded value would diverge
    # from the oracle for a ratio in [1 - 5e-7, 1)); rounding is applied
    # only to the REPORTED column, in both engines
    degree_hat = (
        F.col("n_sample_pairs") / (s * (s - 1) / 2.0)
        * (F.col("n_vecs") - 1)
    )
    return (
        nv.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_vecs",
            "n_sample",
            "n_sample_pairs",
            F.round(degree_hat, 6).alias("pair_degree_hat"),
            (degree_hat >= 1.0).alias("percolation_risk"),
        )
    )


def _a216_sql() -> str:
    from ..operators.similarity import DOT_SQL
    from .analytics import _ND_THRESHOLD

    dot = DOT_SQL.replace("{a}", "{x}").replace("{b}", "{y}")
    ab = dot.format(x="a.embedding", y="b.embedding")
    aa = dot.format(x="a.embedding", y="a.embedding")
    bb = dot.format(x="b.embedding", y="b.embedding")
    return f"""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY vec_id ASC LIMIT {_A216_SAMPLE}
), pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM s a JOIN s b ON a.vec_id < b.vec_id
  WHERE round({ab} / (sqrt({aa}) * sqrt({bb})), 6) >= {_ND_THRESHOLD}
), base AS (
  SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
         (SELECT count(*) FROM s) AS n_sample,
         (SELECT count(*) FROM pairs) AS n_sample_pairs
)
SELECT n_vecs, n_sample, n_sample_pairs,
       round(n_sample_pairs / (n_sample * (n_sample - 1.0) / 2.0)
             * (n_vecs - 1), 6) AS pair_degree_hat,
       n_sample_pairs / (n_sample * (n_sample - 1.0) / 2.0)
         * (n_vecs - 1) >= 1.0 AS percolation_risk
FROM base
"""


QUERIES["a216_percolation_probe_sampled"] = QuerySpec(
    a216_percolation_probe_sampled, _a216_sql()
)


# ---------------------------------------------------------------------------
# c74 -- the GDPR erasure CASCADE executed across every index the corpus
# maintains, with a read-back audit.  c64 plans erasure (dry-run row
# counts per table); c71/c72/c73 gave each index its delete verb; c74
# is the operation a data-protection request actually triggers: one
# subject set erased from the TEXT band index and the PERCEPTUAL band
# index (tombstone/merge-on-read -- rows are bucket-scattered) and its
# vectors from the IVF index (partition-targeted physical rewrite --
# the cell layout co-locates them), then an audit row per index with
# rows_before / rows_erased / rows_after COUNTED FROM THE REAL STORAGE
# (the built tables, the live views, the rewritten partitions).  The
# DuckDB twin derives the same counts from first principles (exactly
# 8 band rows per doc, 4 phash rows per doc, 1 IVF row per vector), so
# a tombstone that misses rows, an anti-join that drops live rows, or a
# partition rewrite that serves stale data breaks the exact match.
# Scale: three index builds (each the already-audited amortized shape)
# + erase verbs that are O(|erased|) / O(affected cells) + six 1-row
# count aggregates -- the audit itself is metadata-sized.
# ---------------------------------------------------------------------------

_C74_DOC_MOD, _C74_DOC_REM = 10, 7  # subject documents
_C74_VEC_MOD, _C74_VEC_REM = 25, 7  # subject vectors (c73's set)


def c74_index_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.dedup import hash64_band_rows, minhash_band_index
    from ..sources.catalog import Warehouse
    from ._util import freeze_result
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE
    from .round14 import _a213_hashes

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    erase_docs = d.where(
        F.pmod(F.col("doc_id"), F.lit(_C74_DOC_MOD)) == _C74_DOC_REM
    ).select("doc_id")
    erase_vecs = e.where(
        F.pmod(F.col("vec_id"), F.lit(_C74_VEC_MOD)) == _C74_VEC_REM
    ).select(F.col("vec_id").alias("n_id"))
    scratch = tempfile.mkdtemp(prefix="ods_spark_c74_")
    try:
        wh = Warehouse(spark, scratch)
        # BUILD all three indexes (amortized at 100 TB; real here so the
        # audit counts actual storage) -- independent writes to disjoint
        # tables/paths, run concurrently (guide §2.6, the c77 pattern)
        from concurrent.futures import ThreadPoolExecutor

        from ..operators.similarity import argmin_struct_sql, l2_fold_sql
        from .quantizers import A16_CENTROIDS

        def build_text():
            wh.write_bucketed(
                minhash_band_index(
                    d, shingle_n=_MH_SHINGLE, num_hashes=_MH_N,
                    bands=_MH_BANDS,
                ),
                "dwd", "c74_text", ["band_id", "band_sig"], buckets=8,
                sort_cols=["band_id", "band_sig"],
            )

        def build_phash():
            wh.write_bucketed(
                hash64_band_rows(_a213_hashes(d)),
                "dwd", "c74_phash", ["band", "val"], buckets=8,
                sort_cols=["band", "val"],
            )

        def build_ivf():
            cell = F.expr(
                argmin_struct_sql(
                    [l2_fold_sql("embedding", c) for c in A16_CENTROIDS]
                )
                + ".cid"
            ).cast("int")
            e.select(
                F.col("vec_id").alias("n_id"), cell.alias("cell")
            ).write.partitionBy("cell").parquet(f"{scratch}/c74_ivf")

        with ThreadPoolExecutor(max_workers=3) as pool:
            for fut in [
                pool.submit(build_text),
                pool.submit(build_phash),
                pool.submit(build_ivf),
            ]:
                fut.result()

        def before_and_hit(t: DataFrame) -> tuple[int, int]:
            # one pass for rows_before + rows_erased (r17, guide §1.2):
            # a broadcast-marked left join counts both in one aggregate
            # (was count() + semi-join count() = two scans)
            r = t.select("doc_id").join(
                F.broadcast(erase_docs.withColumn("__er", F.lit(1))),
                "doc_id",
                "left",
            ).agg(
                F.count(F.lit(1)).alias("b"), F.count("__er").alias("e")
            ).collect()[0]
            return r["b"], r["e"]

        # TEXT bands: tombstone erase, live view must drop exactly the
        # subject docs' 8 rows each
        def text_leg():
            t = wh.bucketed_table("dwd", "c74_text")
            n_before, n_hit = before_and_hit(t)
            wh.append_tombstones(erase_docs, "dwd", "c74_text")
            return (
                "minhash_bands", "bucketed(band_id,band_sig)", "tombstone",
                n_before, n_hit,
                wh.read_bucketed_live("dwd", "c74_text").count(),
            )

        # PERCEPTUAL bands: same verb, 4 rows per doc
        def phash_leg():
            p = wh.bucketed_table("dwd", "c74_phash")
            p_before, p_hit = before_and_hit(p)
            wh.append_tombstones(erase_docs, "dwd", "c74_phash")
            return (
                "phash_bands", "bucketed(band,val)", "tombstone",
                p_before, p_hit,
                wh.read_bucketed_live("dwd", "c74_phash").count(),
            )

        # IVF cells: physical targeted-partition rewrite
        def ivf_leg():
            ivf_before = spark.read.parquet(f"{scratch}/c74_ivf").count()
            v_hit = erase_vecs.count()
            Warehouse(spark, scratch).erase_partition_rows(
                "", "c74_ivf", "cell", erase_vecs, "n_id"
            )
            return (
                "ivf_vectors", "partitioned(cell)", "partition_rewrite",
                ivf_before, v_hit,
                spark.read.parquet(f"{scratch}/c74_ivf").count(),
            )

        # the three erasure legs touch disjoint tables/paths -- run them
        # as concurrent driver jobs (guide §2.6, the c77 pattern);
        # results collected in fixed order, output unchanged
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(text_leg),
                pool.submit(phash_leg),
                pool.submit(ivf_leg),
            ]
            rows = [f.result() for f in futs]
        out = spark.createDataFrame(
            rows,
            "index_name string, layout string, verb string, "
            "rows_before bigint, rows_erased bigint, rows_after bigint",
        )
        return freeze_result(out)
    finally:
        spark.sql("DROP TABLE IF EXISTS dwd_c74_text")
        spark.sql("DROP TABLE IF EXISTS dwd_c74_phash")
        shutil.rmtree(scratch, ignore_errors=True)


def _c74_sql() -> str:
    from .analytics import _MH_BANDS

    return f"""
WITH n AS (
  SELECT count(*) AS nd,
         count(*) FILTER (WHERE doc_id % {_C74_DOC_MOD} = {_C74_DOC_REM})
           AS ed
  FROM documents
), v AS (
  SELECT count(*) AS nv,
         count(*) FILTER (WHERE vec_id % {_C74_VEC_MOD} = {_C74_VEC_REM})
           AS ev
  FROM embeddings
)
SELECT 'minhash_bands' AS index_name,
       'bucketed(band_id,band_sig)' AS layout, 'tombstone' AS verb,
       CAST({_MH_BANDS} * nd AS BIGINT) AS rows_before,
       CAST({_MH_BANDS} * ed AS BIGINT) AS rows_erased,
       CAST({_MH_BANDS} * (nd - ed) AS BIGINT) AS rows_after
FROM n
UNION ALL
SELECT 'phash_bands', 'bucketed(band,val)', 'tombstone',
       CAST(4 * nd AS BIGINT), CAST(4 * ed AS BIGINT),
       CAST(4 * (nd - ed) AS BIGINT)
FROM n
UNION ALL
SELECT 'ivf_vectors', 'partitioned(cell)', 'partition_rewrite',
       CAST(nv AS BIGINT), CAST(ev AS BIGINT), CAST(nv - ev AS BIGINT)
FROM v
"""


QUERIES["c74_index_erasure_audit"] = QuerySpec(
    c74_index_erasure_audit, _c74_sql()
)


# ---------------------------------------------------------------------------
# c75 -- semantic-dedup SERVING against the persisted vector index: the
# missing cell of the serve matrix.  c70/c72 serve text/perceptual
# DEDUP from their band indexes and c69 serves vector ANN QUERIES from
# the cell-partitioned index -- c75 serves the vector DEDUP gate from
# the same cell layout: the corpus' (vector, norm, cluster) rows persist
# partitioned by their frozen-quantizer cell; a delta assigns ITS OWN
# vectors (the same literal folds), reads ONLY its clusters' partitions
# (planning-time pruning, the c69 mechanism), and emits the
# delta-involved within-cluster cosine near-dup pairs an ingest gate
# acts on.  Oracle-exact: assignment and the fold-path cosine are
# deterministic, so serve == the a209 frozen-quantizer pair algebra
# restricted to delta-involved pairs.
# Scale: serve cost is O(delta folds) + the probed-cells scan + the
# within-cluster pair join the SemDeDup contract bounds by quantizer
# granularity; the corpus is never re-assigned.
# ---------------------------------------------------------------------------

_C75_MOD, _C75_DELTA_REM = 10, 6  # >= 15 delta-involved pairs at every
# test SF (29 / 33 / 360 at sf0.001/0.01/0.1, tau = _SD_COS)


def c75_semdedup_index_serve(
    spark: SparkSession, sf_dir: str, *, reliable_pins: bool | None = None
) -> DataFrame:
    if reliable_pins is None:  # production default: reliable iff a
        from ..operators.ordering import auto_reliable_pins

        reliable_pins = auto_reliable_pins(spark)  # checkpoint dir is set
    import shutil
    import tempfile

    from ..operators.ordering import pin_frame
    from ..operators.similarity import (
        _norm,
        argmin_struct_sql,
        dot_product,
        l2_fold_sql,
    )
    from ._util import freeze_result
    from .quantizers import A209_CENTROIDS
    from .round13 import _SD_COS

    e = load_table(spark, sf_dir, "embeddings")
    is_delta = F.pmod(F.col("vec_id"), F.lit(_C75_MOD)) == _C75_DELTA_REM
    corpus, delta = e.where(~is_delta), e.where(is_delta)
    cell = F.expr(
        argmin_struct_sql(
            [l2_fold_sql("embedding", c) for c in A209_CENTROIDS]
        )
        + ".cid"
    ).cast("int")
    scratch = tempfile.mkdtemp(prefix="ods_spark_c75_")
    try:
        # BUILD: one corpus assignment pass, persisted cell-partitioned
        par = spark.sparkContext.defaultParallelism
        corpus.repartition(par).select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("__c_vec"),
            _norm(F.col("embedding")).alias("__c_norm"),
            cell.alias("cell"),
        ).write.partitionBy("cell").parquet(f"{scratch}/sd_index")
        # SERVE: the delta assigns itself with the same literal folds
        d = pin_frame(  # feeds the cell list AND both pair joins
            delta.select(
                F.col("vec_id").alias("d_id"),
                F.col("embedding").alias("__d_vec"),
                _norm(F.col("embedding")).alias("__d_norm"),
                cell.alias("cell"),
            ),
            reliable=reliable_pins,
        )
        # probed-cell list: bounded driver fetch (<= k ints) so the
        # IN-filter is a PLAN LITERAL the scan prunes partitions with
        cells = sorted({r["cell"] for r in d.select("cell").collect()})
        idx = (
            spark.read.parquet(f"{scratch}/sd_index")
            .withColumn("cell", F.col("cell").cast("int"))
            .where(F.col("cell").isin(cells))
        )
        cos_ci = F.round(
            dot_product(F.col("__d_vec"), F.col("__c_vec"))
            / (F.col("__d_norm") * F.col("__c_norm")),
            6,
        )
        cross = (
            d.join(idx, "cell")
            .where(cos_ci >= _SD_COS)
            .select(
                F.least("d_id", "c_id").alias("a"),
                F.greatest("d_id", "c_id").alias("b"),
                cos_ci.alias("cosine"),
            )
        )
        d2 = d.select(
            F.col("d_id").alias("e_id"),
            F.col("__d_vec").alias("__e_vec"),
            F.col("__d_norm").alias("__e_norm"),
            "cell",
        )
        cos_dd = F.round(
            dot_product(F.col("__d_vec"), F.col("__e_vec"))
            / (F.col("__d_norm") * F.col("__e_norm")),
            6,
        )
        within = (
            d.join(d2, "cell")
            .where((F.col("d_id") < F.col("e_id")) & (cos_dd >= _SD_COS))
            .select(
                F.col("d_id").alias("a"),
                F.col("e_id").alias("b"),
                cos_dd.alias("cosine"),
            )
        )
        return freeze_result(cross.unionByName(within))  # pre-rmtree
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _c75_sql() -> str:
    from ..operators.similarity import DOT_SQL as dot

    from .analytics import _quantizer_values_sql
    from .quantizers import A209_CENTROIDS
    from .round10 import _l2_seg_sql
    from .round13 import _SD_COS

    dim = len(A209_CENTROIDS[0])
    seeds = _quantizer_values_sql(
        [(i + 1, c) for i, c in enumerate(A209_CENTROIDS)], "t(cid, cv)"
    )
    l2 = _l2_seg_sql("e.embedding", "s.cv", "0", dim)
    ab = dot.format(a="x.embedding", b="y.embedding")
    aa = dot.format(a="x.embedding", b="x.embedding")
    bb = dot.format(a="y.embedding", b="y.embedding")
    return f"""
WITH seeds AS (SELECT * FROM {seeds}),
assign AS MATERIALIZED (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, s.cid,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {l2} ASC, s.cid ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
), v AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, e.embedding
  FROM assign a JOIN embeddings e USING (vec_id)
)
SELECT x.vec_id AS a, y.vec_id AS b,
       round({ab} / (sqrt({aa}) * sqrt({bb})), 6) AS cosine
FROM v x JOIN v y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
WHERE round({ab} / (sqrt({aa}) * sqrt({bb})), 6) >= {_SD_COS}
  AND (x.vec_id % {_C75_MOD} = {_C75_DELTA_REM}
       OR y.vec_id % {_C75_MOD} = {_C75_DELTA_REM})
"""


QUERIES["c75_semdedup_index_serve"] = QuerySpec(
    c75_semdedup_index_serve, _c75_sql()
)
