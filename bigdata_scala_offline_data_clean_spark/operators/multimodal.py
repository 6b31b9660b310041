"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested -- binary columns, Arrow-batched
``mapInPandas`` with explicit output schemas, partition-stable processing.
The actual media *decoding* is stubbed: the image/audio libraries are not in
this container, so ``decode_image`` raises ``NotImplementedError`` unless a
decoder is injected, and ``fake_feature_extract`` provides a deterministic
stand-in the tests and oracle can verify (byte length, md5, fixed-shape
pseudo-features).

At 100 TB the pattern is: keep payloads in parquet binary columns (or
pointers to object-store blobs), ``repartition`` to bound batch memory,
``mapInPandas`` with a schema-typed generator, and never collect payloads to
the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("payload_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize a binary column (testdata stand-in: utf-8 bytes of a
    string column; production: parquet binary / object-store fetch)."""
    return df.withColumn(out_col, F.encode(F.col(source_col), "utf-8"))


def extract_binary_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata per payload via Arrow-batched ``mapInPandas``.

    Python is unavoidable for real codecs, so this is the sanctioned slow
    path: Arrow batches in, vectorized pandas ops, typed batches out.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(len).astype("int64"),
                    "payload_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, META_SCHEMA)


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """Decode an image payload.  STUB: no imaging library ships in this
    environment -- inject ``decoder`` (e.g. PIL.Image.open) in production."""
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an injected decoder (e.g. PIL); "
            "this environment ships none"
        )
    return decoder(payload)


def resize_image(
    payload: bytes,
    size: tuple[int, int],
    decoder=None,
    resizer=None,
):
    """Resize an image payload.  STUB: inject ``decoder``/``resizer``
    (e.g. PIL) in production; no imaging library ships here."""
    img = decode_image(payload, decoder)
    if resizer is None:
        raise NotImplementedError("resize requires an injected resizer")
    return resizer(img, size)


def resample_audio(
    payload: bytes,
    target_rate: int,
    decoder: Callable[[bytes], object] | None = None,
    resampler=None,
):
    """Resample an audio payload to ``target_rate`` Hz.  STUB: no audio
    library ships in this environment -- inject ``decoder`` (e.g.
    soundfile.read) and ``resampler`` (e.g. librosa.resample) in
    production.  The Spark-side plumbing (binary column in, mapInPandas
    batch shape, typed metadata out) is the same as the image path and is
    covered by its tests."""
    if decoder is None:
        raise NotImplementedError(
            "audio decoding requires an injected decoder; this environment "
            "ships none"
        )
    audio = decoder(payload)
    if resampler is None:
        raise NotImplementedError("resample requires an injected resampler")
    return resampler(audio, target_rate)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 3,
) -> DataFrame:
    """Deterministic frame sampling plumbing for video payloads.

    Real codecs are injected in production; the stand-in slices the payload
    into ``n_frames`` evenly-spaced byte windows, exercising the exact
    explode shape (one output row per sampled frame) a real sampler uses.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, offsets = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(raw) - 1, 0))
                    ids.append(doc_id)
                    offsets.append(off)
                    frames.append(raw[off : off + step])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_offset": offsets, "frame": frames}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_offset", LongType()),
            StructField("frame", BinaryType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(gen, schema)


def fake_feature_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_features: int = 4,
) -> DataFrame:
    """Deterministic stand-in for a media feature extractor (embedding /
    spectrogram / frame stats): fixed-shape features derived from the
    payload digest.  Exercises the exact batch shape a real extractor uses.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    int(hashlib.md5(bytes(b) + bytes([i])).hexdigest()[:8], 16)
                    / 0xFFFFFFFF
                    for i in range(n_features)
                ]
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, FEATURE_SCHEMA)


def binary_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    seg_bytes: int = 256,
) -> DataFrame:
    """Fixed-size byte segmentation of a binary payload column.

    The audio/video chunking primitive: a media blob splits into
    ``seg_bytes`` windows (sample frames, transport-stream chunks) as pure
    column arithmetic -- ``substring`` works on BINARY with byte semantics,
    so the segments never round-trip through strings or Python.  Output:
    (id, seg_id, seg_len, seg_md5), one row per segment, the final partial
    segment kept.  Zero shuffles; a payload shorter than one segment
    yields exactly one row, an empty payload none.
    """
    n_segs = F.ceil(F.length(F.col(payload_col)) / F.lit(seg_bytes)).cast(
        "int"
    )
    # sequence(0, -1) would count DOWN (Spark auto-negates the step), so an
    # empty payload needs an explicit empty array, not sequence arithmetic
    idx = F.when(n_segs > 0, F.sequence(F.lit(0), n_segs - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = df.select(
        id_col,
        F.col(payload_col),
        F.posexplode(idx).alias("seg_id", "_i"),
    )
    seg = F.expr(f"substring({payload_col}, seg_id * {seg_bytes} + 1, {seg_bytes})")
    return segs.select(
        id_col,
        F.col("seg_id").cast("bigint").alias("seg_id"),
        F.length(seg).cast("bigint").alias("seg_len"),
        F.md5(seg).alias("seg_md5"),
    )
