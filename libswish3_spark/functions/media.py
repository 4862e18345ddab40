"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas``. ``real_decode`` handles
the stdlib-decodable formats (binary PPM/PGM, uncompressed 24-bit BMP)
with pure-Python header + pixel parsing; compressed formats (JPEG/PNG,
audio, video) need a codec library this container doesn't ship, so
``auto_decode`` falls back to the deterministic md5 ``fake_decode`` for
those — keeping schema, partitioning, UDF signature, and batch shape
real end-to-end either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decode_error", StringType()),
    ]
)

FEATURE_DIM = 16


def real_decode(content: bytes, media_type: str) -> list[float]:
    """Real pixel decoder for stdlib-decodable image formats.

    Supports binary PPM/PGM (``P6``/``P5``, maxval 255) and
    uncompressed 24-bit BMP — no codec libraries needed. Compressed
    formats (JPEG/PNG/audio/video) still require an injected codec and
    raise NotImplementedError; route through :func:`auto_decode` to
    fall back to :func:`fake_decode` for those.

    Feature layout (FEATURE_DIM = 16):
      [0]  width            [1]  height
      [2..4]   mean R,G,B   / 255
      [5..7]   min  R,G,B   / 255
      [8..10]  max  R,G,B   / 255
      [11..14] quadrant luminance means (TL, TR, BL, BR) / 255
      [15] overall luminance mean / 255
    """
    data = bytes(content or b"")
    if not data:
        raise ValueError("empty media blob")
    magic = data[:2]
    if magic in (b"P6", b"P5"):
        w, h, channels, px = _parse_pnm(data)
    elif magic == b"BM":
        w, h, channels, px = _parse_bmp(data)
    else:
        raise NotImplementedError(
            f"no stdlib decoder for this format ({media_type}); "
            "inject a codec or use auto_decode/fake_decode"
        )
    return _pixel_features(w, h, channels, px)


def auto_decode(content: bytes, media_type: str, codec=None) -> list[float]:
    """Real decode when the format is stdlib-decodable; otherwise the
    injected ``codec`` callable if one is provided (the seam for
    JPEG/PNG/audio/video libraries this container doesn't ship —
    signature ``codec(content, media_type) -> list[float]``), else the
    deterministic md5 fake. Keeps the package stdlib-pure while proving
    the production wiring: a deployment passes its codec once and every
    format routes through the same batch kernel."""
    try:
        return real_decode(content, media_type)
    except NotImplementedError:
        if codec is not None:
            return codec(content, media_type)
        return fake_decode(content, media_type)


def make_auto_decoder(codec=None):
    """Decoder callable for :func:`extract_media_features`: stdlib
    formats decode for real, everything else goes to the injected
    ``codec`` (or the md5 fake when none is given)."""

    def decode(content: bytes, media_type: str) -> list[float]:
        return auto_decode(content, media_type, codec)

    return decode


def _parse_pnm(data: bytes) -> tuple[int, int, int, bytes]:
    """Binary PPM (P6, RGB) / PGM (P5, gray) header + pixel parse."""
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            if nl == -1:
                raise ValueError("truncated PNM header")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        raise ValueError("invalid PNM dimensions")
    if maxval != 255:
        raise ValueError("only maxval=255 PNM supported")
    channels = 3 if data[:2] == b"P6" else 1
    need = w * h * channels
    px = data[pos : pos + need]
    if len(px) < need:
        raise ValueError("truncated PNM pixel data")
    return w, h, channels, px


def _parse_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 24-bit BMP → RGB row-major bytes."""
    import struct

    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    _, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down, h = h < 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError("invalid BMP dimensions")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        row = data[off + src_y * stride : off + src_y * stride + w * 3]
        if len(row) < w * 3:
            raise ValueError("truncated BMP pixel data")
        # BGR → RGB
        rows.append(
            bytes(v for bgr in zip(row[2::3], row[1::3], row[0::3]) for v in bgr)
        )
    return w, h, 3, b"".join(rows)


def _pixel_features(w: int, h: int, channels: int, px: bytes) -> list[float]:
    n = w * h
    if channels == 1:
        chans = (px, px, px)
    else:
        chans = (px[0::3], px[1::3], px[2::3])
    sums = [sum(c) for c in chans]
    mins = [min(c) for c in chans]
    maxs = [max(c) for c in chans]
    # quadrant luminance sums: per row, left/right halves; (r+g+b)/3 per
    # pixel, so a quadrant's byte-sum / (3 * npix) is its mean luminance
    row_w = w * channels
    split = (w // 2) * channels
    qsum, qn = [0, 0, 0, 0], [0, 0, 0, 0]
    for y in range(h):
        row = px[y * row_w : (y + 1) * row_w]
        top = 0 if y < (h + 1) // 2 else 2
        qsum[top] += sum(row[:split])
        qsum[top + 1] += sum(row[split:])
        qn[top] += w // 2
        qn[top + 1] += w - w // 2
    denom = 255 * (3 if channels == 3 else 1)
    quad = [qsum[i] / (qn[i] * denom) if qn[i] else 0.0 for i in range(4)]
    return [
        float(w),
        float(h),
        *[s / (n * 255) for s in sums],
        *[m / 255 for m in mins],
        *[m / 255 for m in maxs],
        *quad,
        sum(sums) / (3 * n * 255),
    ]


def fake_decode(content: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in feature extractor.

    Produces a FEATURE_DIM-vector from the md5 of the bytes so tests and
    benchmarks exercise real Arrow batch shapes end-to-end.
    """
    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def media_feature_batches(decoder=fake_decode):
    """mapInPandas kernel: (media_ref, media_type, content) → features.

    Batch-shaped: one pandas DataFrame in, one out; the decoder runs
    per element but over Arrow-transferred bytes (no per-row Python UDF
    serialization). Decode failures land in ``decode_error`` instead of
    failing the task — at 10^12 scale a poisoned blob must not kill a
    partition.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats, errs = [], []
            for content, mtype in zip(pdf["content"], pdf["media_type"]):
                try:
                    feats.append(decoder(content, mtype))
                    errs.append(None)
                except NotImplementedError as e:  # codec missing
                    feats.append(None)
                    errs.append(str(e))
                except Exception as e:  # poisoned blob
                    feats.append(None)
                    errs.append(f"decode failed: {e}")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return fn


def synthesize_ppm(docs_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary-PPM corpus from an id column (test/oracle
    generator): width = 2 + id%4, height = 1 + id%3, pixel byte j =
    (id*7 + j*13) % 256 — pure arithmetic, so a SQL oracle can compute
    the expected channel statistics without decoding anything."""

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            contents = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 2 + did % 4, 1 + did % 3
                px = bytes((did * 7 + j * 13) % 256 for j in range(w * h * 3))
                contents.append(b"P6\n%d %d\n255\n" % (w, h) + px)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[id_col].astype(str),
                    "media_type": "image/x-portable-pixmap",
                    "content": contents,
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return docs_df.select(id_col).mapInPandas(synth, schema=MEDIA_SCHEMA)


def extract_media_features(media_df: DataFrame, decoder=fake_decode) -> DataFrame:
    """media table → feature table. Narrow map, no shuffle; partition
    count should track total bytes, not row count (blobs are the skew
    unit — repartition upstream by size class like mega-documents).

    Missing optional columns default to NULL at SELECT time — the
    kernel indexes ``media_type``/``content`` unconditionally, so a
    frame lacking one used to die with a KeyError inside the executor
    instead of decoding (the fake/auto decoders accept None)."""
    if "media_ref" not in media_df.columns:
        raise ValueError("media_df needs a media_ref column")
    cols = [F.col("media_ref")]
    for c, typ in (("media_type", "string"), ("content", "binary")):
        cols.append(
            F.col(c) if c in media_df.columns else F.lit(None).cast(typ).alias(c)
        )
    return media_df.select(*cols).mapInPandas(
        media_feature_batches(decoder), schema=MEDIA_FEATURES_SCHEMA
    )
