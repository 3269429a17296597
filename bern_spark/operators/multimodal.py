"""Multimodal columns: opaque binary media + typed metadata plumbing.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. Decode is REAL for every kind: PNG and JPEG
images (signature + IHDR parse with CRC validation; SOFn marker scan),
WAV audio (RIFF/fmt/data parse → duration), and MP4 video (ISO-BMFF
box walk: ftyp/moov/mvhd/tkhd → duration + track dimensions) — all
pure-Python header parses from the public format specs, no codec
libraries needed — plus a byte-histogram content feature. ``fake=True``
keeps the deterministic md5-driven stand-in for tests that only exercise
the Spark-side plumbing (schemas, batch shapes, partitioning).
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
        # decoded audio length — real WAV decode path only
        T.StructField("duration_ms", T.LongType()),
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


_JPEG_SOI = b"\xff\xd8"
# SOFn markers carry frame dimensions; 0xC4/0xC8/0xCC in the 0xC0-0xCF
# range are DHT/JPG/DAC tables, not frames (JPEG spec ITU-T T.81 §B.1.1.3)
_JPEG_NON_SOF = frozenset({0xC4, 0xC8, 0xCC})


def _decode_jpeg(data: bytes) -> dict:
    """Scan JPEG marker segments for the first SOFn frame header
    (ITU-T T.81 §B.2.2, public spec): precision, height, width, number
    of components. Pure byte-walk, no codec."""
    if len(data) < 4 or data[:2] != _JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI marker")
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            raise ValueError(f"JPEG: marker desync at offset {i}")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone, no length
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if i + 4 > n:
            break
        (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
        if seg_len < 2:
            raise ValueError("JPEG: segment length < 2")
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if seg_len < 8 or i + 10 > n:
                raise ValueError("JPEG: truncated SOF segment")
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", data[i + 4 : i + 10]
            )
            return {
                "width": width,
                "height": height,
                "bit_depth": precision,
                "color_type": ncomp,
            }
        i += 2 + seg_len
    raise ValueError("JPEG: no SOF frame header found")


def _decode_wav(data: bytes) -> dict:
    """Parse the RIFF/WAVE container (public Microsoft/IBM spec): the
    ``fmt `` chunk's sample layout and the ``data`` chunk size give
    channels, sample rate, and duration_ms. Chunks are word-aligned."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    i = 12
    n = len(data)
    byte_rate = channels = sample_rate = data_size = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        (csize,) = struct.unpack("<I", data[i + 4 : i + 8])
        if cid == b"fmt ":
            if csize < 16 or i + 24 > n:
                raise ValueError("WAV: truncated fmt chunk")
            _fmt, channels, sample_rate, byte_rate = struct.unpack(
                "<HHII", data[i + 8 : i + 20]
            )
        elif cid == b"data":
            # a truncated payload may claim more data bytes than exist
            # past the header; trusting the header would overstate
            # duration_ms — raise like the fmt-chunk truncation path
            if i + 8 + csize > n:
                raise ValueError(
                    f"WAV: truncated data chunk (header claims {csize} "
                    f"bytes, {n - i - 8} present)"
                )
            data_size = csize
        i += 8 + csize + (csize & 1)
    if byte_rate is None or data_size is None:
        raise ValueError("WAV: missing fmt or data chunk")
    duration_ms = (data_size * 1000) // byte_rate if byte_rate else 0
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "duration_ms": duration_ms,
    }


def _iter_boxes(data: bytes, start: int, end: int):
    """Walk ISO BMFF boxes in data[start:end] (ISO/IEC 14496-12 §4.2):
    yields (type, payload_start, box_end). Handles 64-bit ``largesize``
    (size==1) and to-end-of-enclosing boxes (size==0); a box claiming
    past the buffer raises (truncation, like the WAV data-chunk path)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("MP4: truncated largesize box header")
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            hdr = 16
        elif size == 0:  # extends to the end of the enclosing box
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(
                f"MP4: box {btype!r} claims {size} bytes, {end - i} present"
            )
        yield btype, i + hdr, i + size
        i += size


def _decode_mp4(data: bytes) -> dict:
    """Parse the MP4/ISO-BMFF container (ISO/IEC 14496-12, public spec):
    ``ftyp`` then a ``moov`` walk — ``mvhd`` gives timescale+duration
    (→ duration_ms), the first ``trak``/``tkhd`` with non-zero 16.16
    fixed-point dimensions gives width/height (audio tracks carry 0x0).
    Pure byte-walk over box headers; no codec, no sample data read."""
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")
    duration_ms = width = height = None
    for btype, s, e in _iter_boxes(data, 0, n):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _iter_boxes(data, s, e):
            if ctype == b"mvhd":
                if cs >= ce:  # empty payload: data[cs] would over-read
                    raise ValueError("MP4: empty mvhd box")
                ver = data[cs]
                if ver == 1:  # vf(4) creation(8) modification(8) ts(4) dur(8)
                    if cs + 32 > ce:
                        raise ValueError("MP4: truncated mvhd v1")
                    timescale, duration = struct.unpack(">IQ", data[cs + 20 : cs + 32])
                else:  # v0: vf(4) creation(4) modification(4) ts(4) dur(4)
                    if cs + 20 > ce:
                        raise ValueError("MP4: truncated mvhd v0")
                    timescale, duration = struct.unpack(">II", data[cs + 12 : cs + 20])
                if timescale == 0:
                    raise ValueError("MP4: mvhd timescale is zero")
                duration_ms = (duration * 1000) // timescale
            elif ctype == b"trak" and not width:
                for ttype, ts_, te in _iter_boxes(data, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    # width/height are the last 8 bytes of tkhd: 16.16
                    # fixed point, after vf + times/ids + layer/volume +
                    # the 36-byte matrix (v0 offset 76, v1 offset 88)
                    if ts_ >= te:  # empty payload: data[ts_] over-reads
                        raise ValueError("MP4: empty tkhd box")
                    off = ts_ + (88 if data[ts_] == 1 else 76)
                    if off + 8 > te:
                        raise ValueError("MP4: truncated tkhd")
                    w_fx, h_fx = struct.unpack(">II", data[off : off + 8])
                    if w_fx and h_fx:
                        width, height = w_fx >> 16, h_fx >> 16
        break
    if duration_ms is None:
        raise ValueError("MP4: no moov/mvhd box found")
    return {"width": width, "height": height, "duration_ms": duration_ms}


def _decode_real(payload: bytes, kind: str) -> dict:
    """Real decode dispatch — uniform keys (width, height, duration_ms;
    None where the modality has no such axis). PNG/JPEG images, WAV
    audio, and MP4 video all parse natively (pure-Python header walks
    over the public format specs; no codec libraries)."""
    data = bytes(payload or b"")
    if kind == "image":
        if data[:8] == _PNG_MAGIC:
            d = _decode_png(data)
        elif data[:2] == _JPEG_SOI:
            d = _decode_jpeg(data)
        else:
            raise ValueError("image payload is neither PNG nor JPEG")
        return {"width": d["width"], "height": d["height"], "duration_ms": None}
    if kind == "audio":
        if data[:4] == b"RIFF":
            d = _decode_wav(data)
            return {"width": None, "height": None, "duration_ms": d["duration_ms"]}
        raise ValueError("audio payload is not RIFF/WAV")
    if kind == "video":
        if len(data) >= 8 and data[4:8] == b"ftyp":
            return _decode_mp4(data)
        raise ValueError("video payload is not MP4/ISO-BMFF")
    raise ValueError(f"unknown media kind {kind!r}")


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

    ``fake=False``: the REAL path — per-row header decode (PNG/JPEG/WAV/
    MP4, all native) populating width/height/duration_ms, plus the
    byte-histogram content feature.
    ``fake=True``: deterministic md5 stand-in features, decode columns
    null."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = pdf["payload"].map(lambda p: _fake_feature(bytes(p or b"")))
                width = pd.Series([None] * len(pdf), index=pdf.index, dtype="object")
                height = duration = width
            else:
                decoded = [
                    _decode_real(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                ]
                feats = pdf["payload"].map(_real_feature)
                width = pd.Series(
                    [d["width"] for d in decoded], index=pdf.index, dtype="object"
                )
                height = pd.Series(
                    [d["height"] for d in decoded], index=pdf.index, dtype="object"
                )
                duration = pd.Series(
                    [d["duration_ms"] for d in decoded], index=pdf.index, dtype="object"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")).astype("int64"),
                    "feature": feats,
                    "width": width,
                    "height": height,
                    "duration_ms": duration,
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
