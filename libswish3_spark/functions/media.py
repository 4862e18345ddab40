"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas``. ``real_decode`` handles
the stdlib-decodable formats:

* **image** — binary PPM/PGM, uncompressed 24-bit BMP (pure-Python
  header + pixel parsing) → pixel-statistics features;
* **audio** — RIFF/WAVE PCM (8-bit unsigned / 16-bit signed, any
  channel count; hand-parsed chunks, no deprecated ``audioop``) →
  amplitude/energy features;
* **video** — a concatenated PPM/PGM frame stream (the raw-frame
  pipe format tools like ffmpeg's ``image2pipe`` emit) →
  frame-SAMPLED luminance features (every ``FRAME_STRIDE``-th frame
  decodes; the rest are header-skipped, the 100 TB move: sampling
  cost is O(frames/stride), not O(frames)).

Compressed formats (JPEG/PNG/MP3/H.264 …) need a codec library this
container doesn't ship, so ``auto_decode`` falls back to the injected
codec or the deterministic md5 ``fake_decode`` for those — keeping
schema, partitioning, UDF signature, and batch shape real end-to-end
either way.
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

    Supports binary PPM/PGM (``P6``/``P5``, maxval 255) — a single
    frame as an image, a concatenated stream of them as a frame-sampled
    video — uncompressed 24-bit BMP, and RIFF/WAVE PCM audio; no codec
    libraries needed. Compressed formats (JPEG/PNG/MP3 …) still require
    an injected codec and raise NotImplementedError; route through
    :func:`auto_decode` to fall back to :func:`fake_decode` for those.

    Image feature layout (FEATURE_DIM = 16):
      [0]  width            [1]  height
      [2..4]   mean R,G,B   / 255
      [5..7]   min  R,G,B   / 255
      [8..10]  max  R,G,B   / 255
      [11..14] quadrant luminance means (TL, TR, BL, BR) / 255
      [15] overall luminance mean / 255
    Audio and video layouts: :func:`audio_features`,
    :func:`video_features`.
    """
    data = bytes(content or b"")
    if not data:
        raise ValueError("empty media blob")
    magic = data[:2]
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return audio_features(data)
    if magic in (b"P6", b"P5"):
        w, h, channels, px, end = _parse_pnm(data)
        if data[end : end + 2] in (b"P6", b"P5"):
            return video_features(data)  # concatenated frame stream
        return _pixel_features(w, h, channels, px)
    if magic == b"BM":
        w, h, channels, px = _parse_bmp(data)
        return _pixel_features(w, h, channels, px)
    raise NotImplementedError(
        f"no stdlib decoder for this format ({media_type}); "
        "inject a codec or use auto_decode/fake_decode"
    )


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


def _parse_pnm(data: bytes, at: int = 0) -> tuple[int, int, int, bytes, int]:
    """Binary PPM (P6, RGB) / PGM (P5, gray) header + pixel parse
    starting at offset ``at``; returns (w, h, channels, pixels,
    end_offset) so concatenated frame streams can advance."""
    magic = data[at : at + 2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PNM frame")
    pos, vals = at + 2, []
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
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    px = data[pos : pos + need]
    if len(px) < need:
        raise ValueError("truncated PNM pixel data")
    return w, h, channels, px, pos + need


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


# below this many pixel bytes the scalar path (C-speed reductions over
# ``bytes``) beats numpy's per-call overhead — measured crossover on
# 768-byte video frames (vectorized-only was 1.9× SLOWER end-to-end)
# vs 8 KB+ images (vectorized is ~10-20× faster)
_VECTORIZE_MIN_BYTES = 4096


def _pixel_features(w: int, h: int, channels: int, px: bytes) -> list[float]:
    """Pixel statistics; scalar and numpy paths are bit-identical.

    Both accumulate exact integer sums (numpy promotes uint8 reductions
    to 64-bit) followed by the same single divisions, so features — and
    the SQL oracles replaying them — do not depend on which path ran;
    a pytest pins scalar == vectorized on random images.
    """
    if len(px) >= _VECTORIZE_MIN_BYTES:
        return _pixel_features_np(w, h, channels, px)
    return _pixel_features_py(w, h, channels, px)


def _pixel_features_py(w: int, h: int, channels: int, px: bytes) -> list[float]:
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


def _pixel_features_np(w: int, h: int, channels: int, px: bytes) -> list[float]:
    import numpy as np

    n = w * h
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, channels)
    flat = img.reshape(n, channels)
    sums3 = [int(v) for v in flat.sum(axis=0, dtype=np.int64)]
    mins3 = [int(v) for v in flat.min(axis=0)]
    maxs3 = [int(v) for v in flat.max(axis=0)]
    if channels == 1:
        sums3, mins3, maxs3 = sums3 * 3, mins3 * 3, maxs3 * 3
    # quadrant luminance sums: top/bottom row halves × left/right column
    # halves over ALL channel bytes; a quadrant's byte-sum / (channels *
    # 255 * npix) is its mean luminance ((r+g+b)/3 per pixel for RGB)
    half_h, split_w = (h + 1) // 2, w // 2
    qsum = [
        int(img[:half_h, :split_w].sum(dtype=np.int64)),
        int(img[:half_h, split_w:].sum(dtype=np.int64)),
        int(img[half_h:, :split_w].sum(dtype=np.int64)),
        int(img[half_h:, split_w:].sum(dtype=np.int64)),
    ]
    qn = [
        half_h * split_w,
        half_h * (w - split_w),
        (h - half_h) * split_w,
        (h - half_h) * (w - split_w),
    ]
    denom = 255 * (3 if channels == 3 else 1)
    quad = [qsum[i] / (qn[i] * denom) if qn[i] else 0.0 for i in range(4)]
    return [
        float(w),
        float(h),
        *[s / (n * 255) for s in sums3],
        *[m / 255 for m in mins3],
        *[m / 255 for m in maxs3],
        *quad,
        sum(sums3) / (3 * n * 255),
    ]


FRAME_STRIDE = 2  # video: decode every FRAME_STRIDE-th frame


def _parse_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WAVE chunk walk → (sample_rate, channels, bits, pcm bytes).

    Hand-parsed with ``struct`` (the stdlib ``audioop`` helpers are
    deprecated): iterates chunks honouring declared sizes + odd-size
    padding, so files with LIST/INFO/fact chunks between ``fmt `` and
    ``data`` parse correctly. PCM only (format tag 1), 8-bit unsigned
    or 16-bit signed — the shapes ``wave.open`` writes."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f"only 8/16-bit PCM WAVE supported (tag={tag}, bits={bits})")
    return rate, channels, bits, pcm


def audio_features(data: bytes) -> list[float]:
    """WAV PCM → FEATURE_DIM amplitude/energy features.

    Layout (amplitudes normalized to [-1, 1] full scale):
      [0] sample_rate      [1] channels
      [2] frames (per channel)   [3] duration_ms
      [4] mean |amplitude|  [5] peak |amplitude|
      [6] RMS              [7] zero-crossing rate (channel 0)
      [8..15] 8-segment mean-|amplitude| envelope

    Integer sums accumulate exactly (numpy int64), each followed by
    ONE double division — so an oracle can reproduce [4]/[5]/[6] in
    closed form over synthetic samples (see ``synthesize_wav``)."""
    import numpy as np

    rate, channels, bits, pcm = _parse_wav(data)
    if bits == 8:
        x = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64) - 128
        full = 128.0
    else:
        x = np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2").astype(np.int64)
        full = 32768.0
    frames = len(x) // channels
    if frames == 0:
        raise ValueError("empty WAVE data chunk")
    x = x[: frames * channels]
    n = len(x)
    ax = np.abs(x)
    mean_abs = int(ax.sum()) / (n * full)
    peak = int(ax.max()) / full
    rms = float(np.sqrt(int((x * x).sum()) / n)) / full
    ch0 = x[::channels]
    sign = np.sign(ch0)
    nz = sign[sign != 0]
    crossings = int((nz[1:] != nz[:-1]).sum()) if len(nz) > 1 else 0
    zcr = crossings / (frames - 1) if frames > 1 else 0.0
    env = []
    for s in range(8):
        lo, hi = s * frames // 8, (s + 1) * frames // 8
        seg = ax[lo * channels : hi * channels]
        env.append(int(seg.sum()) / (len(seg) * full) if len(seg) else 0.0)
    return [
        float(rate),
        float(channels),
        float(frames),
        frames * 1000.0 / rate,
        mean_abs,
        peak,
        rms,
        zcr,
        *env,
    ]


def iter_pnm_frames(data: bytes):
    """Yield (w, h, channels, pixels, start, end) per frame of a
    concatenated binary-PNM stream. The pixel slice is zero-copy on
    the input bytes; the real cost a caller skips by striding is the
    per-pixel feature pass, not this header walk."""
    pos = 0
    while pos < len(data) and data[pos : pos + 2] in (b"P6", b"P5"):
        w, h, c, px, end = _parse_pnm(data, pos)
        yield w, h, c, px, pos, end
        pos = end
    if pos < len(data):
        raise ValueError(f"trailing non-PNM bytes at offset {pos}")


def video_features(data: bytes, stride: int = FRAME_STRIDE) -> list[float]:
    """Concatenated-PNM frame stream → FEATURE_DIM frame-sampled
    features. Every frame's HEADER parses (frame count and stream
    integrity are exact) but only frames ``0, stride, 2·stride …``
    pay the pixel pass — the sampling discipline a real video column
    needs at scale, where decode cost dominates.

    Layout:
      [0] n_frames   [1] n_sampled   [2] width₀   [3] height₀
      [4] mean luminance over sampled frames
      [5] first-sampled luminance    [6] last-sampled luminance
      [7] mean |Δ luminance| between consecutive sampled frames
      [8..15] per-sampled-frame luminance (first 8, zero-padded)
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    lums, dims, n_frames = [], None, 0
    for w, h, c, px, _start, _end in iter_pnm_frames(data):
        if n_frames % stride == 0:
            if dims is None:
                dims = (w, h)
            # mean luminance directly — the only feature video needs
            # per frame; bit-identical to _pixel_features(...)[15]
            # (sum(px)/(n·255·c) and Σsums3/(3·n·255) are the same
            # exact-integer ratio, and IEEE division of equal exact
            # ratios rounds identically; pinned by pytest)
            lums.append(sum(px) / (w * h * 255 * c))
        n_frames += 1
    if not lums:
        raise ValueError("no PNM frames in stream")
    deltas = [abs(b - a) for a, b in zip(lums, lums[1:])]
    pad = (lums + [0.0] * 8)[:8]
    return [
        float(n_frames),
        float(len(lums)),
        float(dims[0]),
        float(dims[1]),
        sum(lums) / len(lums),
        lums[0],
        lums[-1],
        sum(deltas) / len(deltas) if deltas else 0.0,
        *pad,
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


def synthesize_wav(docs_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 8-bit mono PCM WAV corpus from an id column
    (test/oracle generator): rate 8000, frames = 64 + id%32, sample
    byte j = (id*7 + j*13) % 256 — pure arithmetic, so a SQL oracle
    computes expected mean/peak/RMS amplitude without decoding."""
    import struct

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            contents, durs = [], []
            for did in pdf[id_col]:
                did = int(did)
                n = 64 + did % 32
                pcm = bytes((did * 7 + j * 13) % 256 for j in range(n))
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + n)
                    + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                    + b"data"
                    + struct.pack("<I", n)
                )
                contents.append(hdr + pcm)
                durs.append(n * 1000 // 8000)
            yield pd.DataFrame(
                {
                    "media_ref": "wav://" + pdf[id_col].astype(str),
                    "media_type": "audio/wav",
                    "content": contents,
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return docs_df.select(id_col).mapInPandas(synth, schema=MEDIA_SCHEMA)


def synthesize_video(docs_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic concatenated-PPM 'video' corpus from an id column:
    frames = 2 + id%3, every frame w = 2 + id%4 by h = 1 + id%3, pixel
    byte j of frame f = (id*7 + f*11 + j*13) % 256 — closed-form for
    the SQL oracle's sampled-luminance check."""

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            contents = []
            for did in pdf[id_col]:
                did = int(did)
                w, h, nf = 2 + did % 4, 1 + did % 3, 2 + did % 3
                frames = []
                for f in range(nf):
                    px = bytes(
                        (did * 7 + f * 11 + j * 13) % 256 for j in range(w * h * 3)
                    )
                    frames.append(b"P6\n%d %d\n255\n" % (w, h) + px)
                contents.append(b"".join(frames))
            yield pd.DataFrame(
                {
                    "media_ref": "vid://" + pdf[id_col].astype(str),
                    "media_type": "video/x-ppm-stream",
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
