"""Sequence packing: assign documents to fixed-size context windows.

The standard concat-and-chunk construction for LLM pretraining batches:
documents are concatenated in a deterministic order and the token stream is
cut every ``ctx_len`` tokens; each document lands at a byte-exact offset, so
the mapping (doc -> chunk ids it occupies) is a pure function of the corpus.

Scale shape: packing is per-SHARD (``shard_col``) -- each shard's stream is
independent, so the cumulative-sum window partitions by shard and the work
distributes.  A single global stream (``shard_col=None``) forces every row
through one partition's window; that is provided for small corpora and
parity checks only.  At 100 TB you shard by a hash of the doc id (or by
source file) exactly as real pipelines do, and the only cost is one hash
exchange + per-partition sort.

Integer token arithmetic only -> the DuckDB oracle reproduces chunk ids
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    ctx_len: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Chunk assignment for concat-and-chunk packing.

    Adds, per document (ordered by ``id_col`` within its shard):

    - ``stream_offset``: tokens before this doc in its shard's stream
    - ``chunk_id``: context window holding the doc's FIRST token
    - ``chunk_id_end``: window holding the doc's LAST token
    - ``spans_boundary``: doc crosses a context-window edge (its loss mask
      spans two training sequences)
    """
    if shard_col is None:
        w = Window.orderBy(id_col)
    else:
        w = Window.partitionBy(shard_col).orderBy(id_col)
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    tokens = F.col(token_col).cast("bigint")
    offset = F.coalesce(F.sum(tokens).over(before), F.lit(0).cast("bigint"))
    out = df.withColumn("stream_offset", offset)
    first_chunk = F.floor(F.col("stream_offset") / ctx_len)
    last_chunk = F.floor(
        (F.col("stream_offset") + F.greatest(tokens, F.lit(1)) - 1) / ctx_len
    )
    return (
        out.withColumn("chunk_id", first_chunk)
        .withColumn("chunk_id_end", last_chunk)
        .withColumn("spans_boundary", F.col("chunk_id") != F.col("chunk_id_end"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking: overlapping fixed-width token chunks.

    The RAG / long-context prep step: chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_tokens)`` with ``stride = chunk_tokens -
    overlap``; the final partial chunk is kept so no token is dropped.
    ``n_chunks = 1 + ceil(max(0, n_tokens - chunk_tokens) / stride)`` --
    a document shorter than one chunk yields exactly one chunk.

    Pure column arithmetic + one posexplode: O(tokens / stride) output
    rows, zero shuffles, chunk ids stable (a pure function of position).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.lit(1) + (
        (F.greatest(F.size(toks) - chunk_tokens, F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    # materialize chunk arrays before the explode (inlined, the transform
    # re-evaluates per output row -> O(chunks^2) per doc)
    from .etl import spread_narrow_scan

    return (
        spread_narrow_scan(df, id_col)
        .select(id_col, F.size(toks).alias("__nt"), chunks.alias("__chunks"))
        .select(id_col, "__nt", F.posexplode("__chunks").alias("pos", "chunk"))
        .select(
            id_col,
            F.col("pos").cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", F.col("chunk")).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens),
                F.col("__nt") - F.col("pos") * stride,
            ).cast("bigint").alias("n_tokens"),
        )
    )
