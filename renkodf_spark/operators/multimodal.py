"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (`mapInPandas`).

The Spark-side machinery — schemas, batch iteration, partitioning
behavior — is real and tested, and so is the image *header* decode:
`decode_image_meta` parses PNG/GIF/BMP/JPEG dimensions straight from
the magic bytes with the stdlib `struct` module (no imaging library
needed). Payloads in no known format fall back to deterministic
pseudo-metadata (md5-derived width/height, format='unknown') so the
plumbing stays exercisable with text-as-bytes fixtures. Full *pixel*
decode and video frame-sampling still require libraries absent from
this container (PIL / ffmpeg) and remain explicit NotImplementedError
contracts. At 100 TB the shape is what matters: binary columns never
explode, batches stream through Arrow, and the decode stage is
embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

import struct
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
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

# SOFn markers that carry frame dimensions (C4=DHT, C8=JPG ext, CC=DAC
# are not frame headers)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the header bytes of PNG / GIF / BMP /
    JPEG payloads, None when no known magic matches. Pure stdlib-struct
    parsing — safe to run per-row inside an Arrow batch loop."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    if len(data) >= 22 and data[:2] == b"BM":
        (dib_size,) = struct.unpack("<I", data[14:18])
        if dib_size >= 40 and len(data) >= 26:  # BITMAPINFOHEADER+
            w, h = struct.unpack("<ii", data[18:26])
            return ("bmp", abs(w), abs(h))  # negative height = top-down rows
        if dib_size == 12:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", data[18:22])
            return ("bmp", w, h)
        return None
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        return _parse_jpeg(data)
    return None


def _parse_jpeg(data: bytes) -> tuple[str, int, int] | None:
    """Walk JPEG marker segments to the first SOFn frame header
    (height/width big-endian at +3/+5 into the segment payload)."""
    i, n = 2, len(data)
    while i + 2 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte
            i -= 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers: no length field
        if marker == 0xD9 or i + 2 > n:
            return None  # EOI before any SOF / truncated
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        if marker in _JPEG_SOF:
            if i + 7 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 3 : i + 7])
            return ("jpeg", w, h)
        i += seglen
    return None


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat each document's UTF-8 bytes as
    an opaque media payload (a deterministic stand-in for real image
    bytes; exercises the format='unknown' fallback path)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# -------------------------------------------------- synthetic payloads
# Minimal but structurally valid image files, used as gate/test fixtures
# (deterministic: DuckDB can recompute the expected dimensions from the
# id arithmetic without parsing bytes).

def synth_png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"  # bit depth 8, truecolor
        + b"\x00\x00\x00\x00"  # CRC (unchecked by header parsers)
    )


def synth_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"


def synth_bmp(w: int, h: int) -> bytes:
    return (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)  # file header
        + struct.pack("<Iii", 40, w, h)  # BITMAPINFOHEADER prefix
        + struct.pack("<HH", 1, 24)
    )


def synth_jpeg(w: int, h: int) -> bytes:
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01\x11\x00\x00"  # SOF0, 1 component
        + b"\xff\xd9"  # EOI
    )


_SYNTH = (
    (synth_png, "image/png"),
    (synth_gif, "image/gif"),
    (synth_bmp, "image/bmp"),
    (synth_jpeg, "image/jpeg"),
)


def synthetic_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image corpus: id -> a real PNG/GIF/BMP/
    JPEG payload (format = id%4) with width = id%200+1, height =
    id*7%200+1. The arithmetic is the point: an independent oracle can
    recompute the expected (format, width, height) without touching the
    bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes = [], []
            for i in pdf[id_col]:
                i = int(i)
                fn, mt = _SYNTH[i % 4]
                payloads.append(fn(i % 200 + 1, i * 7 % 200 + 1))
                mtypes.append(mt)
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "media_type": mtypes, "payload": payloads}
            )

    return ids.select(id_col).mapInPandas(run, MEDIA_SCHEMA)


def _should_sniff(media_type) -> bool:
    """Header sniffing is gated on the declared media_type (ADVICE r3):
    magic-byte parsing runs only for payloads declared as images (or
    with no declared type at all). Without the gate, a text payload
    that happens to start with 'BM' or 'GIF89a' would parse as an image
    with garbage dimensions. 'image/fake' is the documents_as_media
    adapter's marker for text-as-bytes fixtures and is never sniffed."""
    if media_type is None:
        return True  # unknown provenance: sniffing is the best signal
    return isinstance(media_type, str) and media_type.startswith("image/") and media_type != "image/fake"


def decode_image_meta(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    Real header parsing for PNG/GIF/BMP/JPEG (`parse_image_header`),
    gated on the declared media_type (see _should_sniff); unparsed
    payloads get md5-derived pseudo-dimensions and format='unknown' so
    the pipeline never drops rows. The Arrow batch shape, schema, and
    parallelism are the production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests, fmts, widths, heights = [], [], [], []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                d = hashlib.md5(p).hexdigest()
                parsed = parse_image_header(p) if _should_sniff(mt) else None
                if parsed is None:
                    fmt, w, h = "unknown", int(d[0:2], 16) + 1, int(d[2:4], 16) + 1
                else:
                    fmt, w, h = parsed
                digests.append(d)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": digests,
                    "format": fmts,
                    "width": widths,
                    "height": heights,
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
