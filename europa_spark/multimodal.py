"""Multimodal column plumbing — image/audio/video as opaque BINARY columns.

The reference's media pipeline is: type-identify -> decode -> canonicalize
-> signature (SimilarImageFinder.cs:122-218 with the processor cascade,
MagicScalerImageProcessor.cs / LibVipsImageProcessor.cs /
LibRawImageProcessor.cs). On Spark the same shape is: a typed-metadata
projection + Arrow-batched ``mapInPandas`` feature extraction over a
``media BINARY`` column.

The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED: ``decode_media`` parses a deterministic fake header (our
fixture format) and ``NotImplementedError`` is raised for real codecs. The
Spark-side plumbing — schema, batch iteration, partitioning, signature
join-ability — is real and tested; swapping in PIL/libvips later only
replaces the numpy body of ``_decode_bytes``.

Fake media format (deterministic, used by tests):
  b"FAKE" + width(u16 be) + height(u16 be) + payload bytes
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, media binary, media_type string, width int, height int, "
    "n_bytes long"
)

SIG_DIM = 64


def make_fake_media(width: int, height: int, payload: bytes) -> bytes:
    return b"FAKE" + struct.pack(">HH", width, height) + payload


def _decode_bytes(b: bytes) -> tuple[int, int, np.ndarray]:
    """Stub decoder. Real deployment: PIL/libvips/ffmpeg body here."""
    if b[:4] == b"FAKE":
        w, h = struct.unpack(">HH", b[4:8])
        payload = np.frombuffer(b[8:], dtype=np.uint8)
        return w, h, payload
    raise NotImplementedError(
        "real image/audio codecs are not available in this container; "
        "only the FAKE fixture format decodes (see module docstring)"
    )


def with_media_metadata(df: DataFrame) -> DataFrame:
    """Cheap typed-metadata projection without decoding: media_type from
    magic bytes (the FileTypeIdentifier cascade analog, F4), byte length."""
    magic = F.substring(F.col("media"), 1, 4)
    media_type = (
        F.when(magic == F.lit(b"FAKE"), F.lit("fake"))
        .when(magic == F.lit(bytes([0x89]) + b"PNG"), F.lit("png"))
        .when(F.substring(F.col("media"), 1, 3) == F.lit(b"\xff\xd8\xff"), F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn("media_type", media_type).withColumn(
        "n_bytes", F.length("media").cast("long")
    )


def media_signatures(df: DataFrame) -> DataFrame:
    """Decode + canonicalize + signature over Arrow batches (the H3->H4
    pipeline shape): returns (url, width, height, sig ARRAY<FLOAT>).

    The stub signature is a deterministic 64-d feature from the payload's
    byte histogram — structurally identical to a real perceptual embedding
    (fixed dim, L2-normalized) so downstream ANN plumbing (europa_spark.ann)
    composes with it unchanged.
    """
    out_schema = (
        "url string, width int, height int, sig array<float>"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["media"]):
                try:
                    w, h, payload = _decode_bytes(bytes(blob))
                except NotImplementedError:
                    continue  # quarantine path: undecodable media skipped
                hist = np.bincount(payload % SIG_DIM, minlength=SIG_DIM).astype(
                    np.float32
                )
                n = float(np.linalg.norm(hist))
                sig = (hist / n if n else hist).tolist()
                rows.append((url, int(w), int(h), sig))
            yield pd.DataFrame(rows, columns=["url", "width", "height", "sig"])

    return df.select("url", "media").mapInPandas(compute, out_schema)


def media_exact_dups(df: DataFrame) -> DataFrame:
    """Byte-identical media groups — the Blake3 exact pipeline applied to a
    binary column (sha2 works on BINARY directly)."""
    hashed = df.select(
        "url", F.sha2(F.col("media"), 256).alias("media_hash")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("media_hash")
    return (
        hashed.withColumn("group_size", F.count("*").over(w))
        .withColumn("group_id", F.min("url").over(w))
        .filter(F.col("group_size") > 1)
    )
