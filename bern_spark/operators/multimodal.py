"""Multimodal columns: opaque binary media + typed metadata plumbing.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBS in this
container (no image/audio libs): ``decode_media`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
md5-driven fake produces stable features — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
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


def _decode_real(payload: bytes, kind: str):  # pragma: no cover - stub
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; run with fake=True for the deterministic test path"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow batches
    arrive as pandas DataFrames; one output row per media row."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["payload"].map(lambda p: _decode_real(p, None))
            feats = pdf["payload"].map(lambda p: _fake_feature(bytes(p or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")).astype("int64"),
                    "feature": feats,
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
