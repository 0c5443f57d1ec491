"""Multimodal-column operators (SURVEY.md §7 M5).

Images/audio/video in a 100 TB training pipeline are opaque ``binary``
columns plus typed metadata; the engine's job is the *plumbing* — schema,
batching, partition sizing — not the codecs. The fixture has no media
files, so the payload here is ``encode(text)`` bytes; the decode step is
a clearly-marked stub (`decode_image`) while everything Spark-side is
real and tested: binary metadata as codegen'd column expressions, and
Arrow-batched ``mapInPandas`` feature extraction with an explicit output
schema.

Scale notes: binaries ride in parquet as BYTE_ARRAY — keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition of
blobs fits executor memory; mapInPandas streams Arrow record batches, so
per-batch peak memory is bounded by the batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), not the partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.catalog import register
from ._util import t

N_HIST_BINS = 16


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_digest,
           substr(text, 1, 4) AS magic
    FROM documents
    """,
    tags=("multimodal",),
    doc="Typed metadata over an opaque binary payload: byte length, "
    "content digest, leading 'magic' bytes — all JVM-side expressions. "
    "The payload is encode(text) standing in for image/audio bytes.",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = F.encode(F.col("text"), "UTF-8")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_digest"),
        F.substring("text", 1, 4).alias("magic"),
    )


# --- Arrow-batched feature extraction (mapInPandas) -------------------------

HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)


def byte_histogram_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-document byte histogram (N_HIST_BINS bins).

    Stands in for decode/feature-extract: same signature, batching, and
    memory profile as a real image featurizer (bytes in → fixed-shape
    vector out), but computable without media libraries.
    """
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "histogram": pdf["payload"].map(_histogram16),
        }
        yield pd.DataFrame(out)


def _histogram16(payload: bytes) -> list[int]:
    hist = [0] * N_HIST_BINS
    for b in payload:
        hist[b >> 4] += 1
    return hist


@register(
    "mm_byte_histogram",
    oracle=None,  # python-kernel op; exactness is pinned by unit tests
    tags=("multimodal", "udf"),
    doc="Arrow-batched feature extraction over binary payloads via "
    "mapInPandas with an explicit StructType output schema — the real "
    "plumbing a decode/featurize stage uses at scale. Rows-only driver "
    "check; tests/test_multimodal.py pins exact values against a local "
    "recomputation.",
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(byte_histogram_batches, schema=HISTOGRAM_SCHEMA)


# --- Decode stub ------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Decode an image payload to (width, height, channels).

    STUB: real decoding needs an image library (Pillow/libvips) that is
    not in this environment. The Spark-side contract (binary in, typed
    struct out, called from decode_image_batches) is the real interface.
    """
    raise NotImplementedError(
        "image decoding requires an image library; use fake_decode_image "
        "for plumbing tests"
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: derives a plausible (w, h, c) from
    the payload bytes so the mapInPandas plumbing is testable."""
    n = len(payload)
    return (16 + n % 64, 16 + (n // 64) % 64, 3)


def decode_image_batches(
    batches: Iterator[pd.DataFrame], decoder=fake_decode_image
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(decoder)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": decoded.map(lambda d: d[0]).astype("int32"),
                "height": decoded.map(lambda d: d[1]).astype("int32"),
                "n_channels": decoded.map(lambda d: d[2]).astype("int32"),
            }
        )


@register(
    "mm_decode_meta",
    oracle=None,  # stubbed decoder; plumbing pinned by unit tests
    tags=("multimodal", "udf"),
    doc="Decode-stage plumbing: binary payload → typed (width, height, "
    "channels) via mapInPandas. The decoder itself is a deterministic "
    "stub (decode_image raises NotImplementedError; fake_decode_image "
    "drives tests) — swapping in a real codec changes one function.",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(decode_image_batches, schema=DECODED_SCHEMA)


# --- Resize stub ------------------------------------------------------------


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload to (width, height).

    STUB: needs an image library (Pillow/libvips) not present here; the
    deterministic fake below exercises the identical Spark-side contract.
    """
    raise NotImplementedError(
        "image resizing requires an image library; use fake_resize_image"
    )


def fake_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: returns a byte string whose length scales
    with the target area, derived from the payload (so tests can assert
    content-dependence and size-dependence without a codec)."""
    area = max(width * height // 64, 1)
    seed = payload[:16] or b"\0"
    reps = area // len(seed) + 1
    return (seed * reps)[:area]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def resize_batches(
    batches: Iterator[pd.DataFrame], width: int = 64, height: int = 64, resizer=fake_resize_image
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = pdf["payload"].map(lambda p: resizer(p, width, height))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "resized": resized,
                "n_bytes": resized.map(len).astype("int32"),
            }
        )


@register(
    "mm_resize",
    oracle=None,  # stubbed codec; plumbing pinned by unit tests
    tags=("multimodal", "udf"),
    doc="Resize-stage plumbing: binary in → binary out via mapInPandas "
    "(batch-shape identical to a real thumbnailer). Codec stubbed "
    "(resize_image raises; fake_resize_image drives tests).",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


# --- Frame sampling (video-shaped payloads) ---------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

N_FRAMES = 4


def sample_frames(payload: bytes, n_frames: int = N_FRAMES) -> list[bytes]:
    """Deterministic frame sampler: treat the payload as a 'video' and cut
    n equally-spaced fixed-width slices ('frames'). A real implementation
    decodes containers + keyframes; the row-explosion shape (1 payload →
    n typed frames) and batching are what the engine owns."""
    if not payload:
        return []
    stride = max(len(payload) // n_frames, 1)
    return [payload[i * stride : i * stride + 16] for i in range(min(n_frames, len(payload)))]


def frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i, fr in enumerate(sample_frames(payload)):
                ids.append(doc_id)
                idxs.append(i)
                frames.append(fr)
        yield pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "frame_idx": pd.Series(idxs, dtype="int32"),
             "frame": pd.Series(frames, dtype=object)}
        )


@register(
    "mm_frame_sample",
    oracle=None,  # python-kernel fan-out; exactness pinned by unit tests
    tags=("multimodal", "udf"),
    doc="Frame sampling: one binary 'video' fans out to N typed frame "
    "rows through mapInPandas (row-generating kernel — the multimodal "
    "analogue of explode). Deterministic slicer stands in for a real "
    "keyframe decoder.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA)
