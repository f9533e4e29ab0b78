"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (`mapInPandas`).

The Spark-side machinery here — schemas, batch iteration, partitioning
behavior — is real and tested. The actual media decoding is STUBBED
(this container has no image/audio libraries): `decode_image_meta`
computes deterministic pseudo-metadata from the bytes (length, md5,
fake width/height derived from the digest), and `decode_image_pixels`
raises NotImplementedError to mark exactly where a real decoder (PIL /
torchvision / ffmpeg) plugs in. At 100 TB the shape is what matters:
binary columns never explode, batches stream through Arrow, and the
decode stage is embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat each document's UTF-8 bytes as
    an opaque media payload (a deterministic stand-in for real image
    bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_image_meta(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    STUB decode: width/height are derived deterministically from the
    md5 digest (first/second byte + 1) instead of parsing a real image
    header. The Arrow batch shape, schema, and parallelism are the real
    production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": digests,
                    "width": [int(d[0:2], 16) + 1 for d in digests],
                    "height": [int(d[2:4], 16) + 1 for d in digests],
                }
            )

    return media.mapInPandas(run, META_SCHEMA)


def decode_image_pixels(media: DataFrame) -> DataFrame:
    """Real pixel decode — requires an imaging library not present in
    this container. The signature and schema are the contract."""
    raise NotImplementedError(
        "pixel decode needs PIL/libvips; wire it into the mapInPandas loop "
        "of decode_image_meta with an ArrayType(IntegerType) output column"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling placeholder — same contract pattern."""
    raise NotImplementedError("frame sampling needs ffmpeg bindings")
