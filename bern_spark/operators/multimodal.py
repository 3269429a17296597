"""Multimodal columns: opaque binary media + typed metadata plumbing.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. Decode is REAL for PNG images (pure-Python
signature + IHDR parse with CRC validation, plus a byte-histogram
feature — no libraries needed); every other format still raises
NotImplementedError in this container (no image/audio libs), and
``fake=True`` keeps the deterministic md5-driven stand-in for tests that
only exercise the Spark-side plumbing (schemas, batch shapes,
partitioning).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        # decoded dimensions — populated by the real decode path only
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_FEATURE_DIM = 16


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: md5-expanded unit-scale floats."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.md5(seed).digest()
    while len(out) < _FEATURE_DIM:
        for i in range(0, len(h), 2):
            out.append(int.from_bytes(h[i : i + 2], "little") / 65535.0)
            if len(out) == _FEATURE_DIM:
                break
        h = hashlib.md5(h).digest()
    return out


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes) -> dict:
    """Parse the PNG signature + IHDR chunk (PNG spec §11.2.2, public
    W3C/ISO format): width, height, bit depth, color type — with the
    chunk CRC validated (zlib.crc32 over type+data), so corrupt headers
    fail loudly instead of yielding garbage dimensions."""
    if len(data) < 33 or data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", data[8:12])
    if data[12:16] != b"IHDR" or length != 13:
        raise ValueError("PNG: first chunk is not a 13-byte IHDR")
    (crc,) = struct.unpack(">I", data[29:33])
    if zlib.crc32(data[12:29]) & 0xFFFFFFFF != crc:
        raise ValueError("PNG: IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[16:26])
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def _decode_real(payload: bytes, kind: str) -> dict:
    """Real decode: PNG images are parsed natively (pure Python); other
    formats require media libraries not present in this environment and
    raise — the remaining honest stub."""
    data = bytes(payload or b"")
    if kind == "image" and data[:8] == _PNG_MAGIC:
        return _decode_png(data)
    raise NotImplementedError(
        f"decode for kind={kind!r} (non-PNG) requires image/audio "
        "libraries not present in this environment; PNG decodes natively, "
        "fake=True gives the deterministic test path for the rest"
    )


def _real_feature(payload: bytes) -> list[float]:
    """16-bin byte histogram (mass-normalized): a real, deterministic,
    library-free content feature over the decoded payload."""
    data = bytes(payload or b"")
    if not data:
        return [0.0] * _FEATURE_DIM
    bins = [0] * _FEATURE_DIM
    for byte in data:
        bins[byte >> 4] += 1
    n = float(len(data))
    return [b / n for b in bins]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow batches
    arrive as pandas DataFrames; one output row per media row.

    ``fake=False``: the REAL path — per-row header decode (PNG natively;
    anything else raises NotImplementedError) populating width/height,
    plus the byte-histogram content feature. ``fake=True``: deterministic
    md5 stand-in features, width/height null."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = pdf["payload"].map(lambda p: _fake_feature(bytes(p or b"")))
                width = pd.Series([None] * len(pdf), index=pdf.index, dtype="object")
                height = width
            else:
                decoded = [
                    _decode_real(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                ]
                feats = pdf["payload"].map(_real_feature)
                width = pd.Series([d["width"] for d in decoded], index=pdf.index)
                height = pd.Series([d["height"] for d in decoded], index=pdf.index)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")).astype("int64"),
                    "feature": feats,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Relational frame-sampling plan for video rows: one row per sampled
    frame timestamp (the decode of each frame is the stubbed kernel).
    Pure Catalyst — sequence + explode."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
