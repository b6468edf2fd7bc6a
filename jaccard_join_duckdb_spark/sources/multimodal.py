"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched (``mapInPandas``) decode / feature /
frame-sample stages.

Beyond-reference surface. Real image/audio/video codec LIBRARIES
are NOT in this container, so the decode kernels default to STUBBED:
with ``fake=True`` they produce deterministic pseudo-decodes derived
from the payload bytes (so the Spark-side plumbing — schema,
batching, partitioning — is fully real and testable). The
``fake=False`` paths are REAL wherever a header parse suffices
without a codec — PNG/BMP/GIF/JPEG image dimensions
(:func:`_real_dims`) and WAV (RIFF) audio layout
(:func:`_wav_audio`) — and raise ``NotImplementedError`` only where
an actual codec (PIL/ffmpeg/soundfile) would be required
(compressed audio, video frames).

Scale notes: payloads stay in executors as Arrow batches end-to-end;
never collect binary columns. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "ASSET_SCHEMA",
    "make_asset_table",
    "decode_image_meta",
    "decode_audio_meta",
    "extract_features",
    "sample_frames",
]

# Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

_FEATURE_DIM = 16
_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def make_asset_table(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Build a deterministic asset table from any text table (test
    fixture: payload = utf-8 bytes of the text)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(
            F.lit("origin"), F.lit("synthetic"),
        ).alias("meta"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dimensions derived from a digest
    of the payload (stands in for a real codec)."""
    d = hashlib.md5(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4


# PNG color type → sample channels (PNG spec, IHDR color byte).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# JPEG frame markers carrying dimensions: SOF0-SOF15 minus the
# non-frame C-range markers DHT (C4), JPG (C8), DAC (CC).
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
# Standalone markers with no length field: TEM (01), RST0-7 (D0-D7).
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}


def _jpeg_dims(payload: bytes) -> tuple[int, int, int]:
    """JPEG marker walk to the first SOF frame header (JPEG/JFIF
    spec): after SOI, each segment is 0xFF, a marker byte, then a
    big-endian length that includes itself; SOFn's payload is
    precision(1) height(2) width(2) components(1). Dimensions must
    precede the scan data, so the walk stops at SOS/EOI."""
    n = len(payload)
    i = 2  # past SOI
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise NotImplementedError("corrupt JPEG marker stream")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        i += 2
        if marker in _JPEG_STANDALONE:
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: no SOF seen
            break
        if i + 2 > n:
            break
        seg_len = struct.unpack(">H", payload[i : i + 2])[0]
        if marker in _JPEG_SOF:
            if i + 8 > n:
                break
            h, w = struct.unpack(">HH", payload[i + 3 : i + 7])
            return int(w), int(h), int(payload[i + 7])
        i += seg_len
    raise NotImplementedError("JPEG without SOF frame header before scan")


def _real_dims(payload: bytes) -> tuple[int, int, int]:
    """Stdlib-only header parse for the formats whose dimensions are
    recoverable without a codec — PNG (IHDR), BMP (BITMAPINFOHEADER),
    GIF (logical screen descriptor), and JPEG (SOF marker walk,
    :func:`_jpeg_dims`). Video/audio need real codecs and still raise
    ``NotImplementedError``."""
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        return _jpeg_dims(payload)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: uint16 LE width at 6, height at 8.
        # GIF pixels are palette indices that decode to RGB → 3.
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), 3
    if len(payload) >= 26 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # 8-byte signature, 4-byte chunk length, b"IHDR", then
        # width/height as big-endian uint32 + bit-depth/color bytes.
        if payload[12:16] != b"IHDR":
            raise NotImplementedError("PNG without leading IHDR chunk")
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return int(w), int(h), _PNG_CHANNELS.get(color_type, 1)
    if len(payload) >= 30 and payload[:2] == b"BM":
        # 14-byte file header, then BITMAPINFOHEADER: int32 LE width
        # at 18, int32 LE height at 22 (negative = top-down rows),
        # uint16 LE bits-per-pixel at 28.
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        return int(w), abs(int(h)), max(1, bpp // 8)
    raise NotImplementedError(
        "real decode implemented for PNG/BMP/GIF/JPEG headers only; "
        "other formats require PIL/ffmpeg (not in container)"
    )


def decode_image_meta(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode stage → (asset_id, width, height,
    channels, n_bytes). The ``fake`` kernel is the deterministic
    oracle-graded path; ``fake=False`` parses real PNG/BMP headers
    stdlib-only (:func:`_real_dims`) and raises for formats that need
    an actual codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_dims if fake else _real_dims
        for pdf in batches:
            dims = [
                decode(p) if p is not None else (None, None, None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(kernel, _DECODE_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("bits_per_sample", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

_FAKE_RATES = (8000, 16000, 22050, 44100)


def _fake_audio(payload: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic pseudo-decode (md5-derived, engine-reproducible
    — the DuckDB twin reproduces every field from the same digest
    bytes)."""
    d = hashlib.md5(payload).digest()
    channels = 1 + d[0] % 2
    rate = _FAKE_RATES[d[1] % 4]
    bits = 8 * (1 + d[2] % 2)
    n_samples = 1000 + (d[3] * 256 + d[4]) % 100000
    # duration is the RAW double quotient — bit-identical to the
    # oracle's DOUBLE division (a rounded value would expose Python
    # banker's-rounding vs SQL half-away ties).
    return channels, rate, bits, n_samples, n_samples / rate


def _wav_audio(payload: bytes) -> tuple[int, int, int, int, float]:
    """REAL WAV (RIFF) header parse — stdlib-only, no codec needed
    (unlike compressed audio): walk the chunk list for ``fmt `` (PCM
    layout: channels, sample rate, block align, bits per sample) and
    ``data`` (payload size → sample count). Compressed formats
    (MP3/OGG/FLAC/AAC) genuinely need a codec library and raise
    ``NotImplementedError``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "real audio decode implemented for WAV (RIFF) headers only; "
            "compressed formats require soundfile/ffmpeg (not in container)"
        )
    i, n = 12, len(payload)
    channels = rate = bits = block_align = None
    data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, rate = struct.unpack("<HI", payload[i + 10 : i + 16])
            block_align, bits = struct.unpack("<HH", payload[i + 20 : i + 24])
        elif cid == b"data":
            data_size = size
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size & 1)
    if not channels or not rate or not block_align or data_size is None:
        raise NotImplementedError("WAV without fmt/data chunks")
    n_samples = data_size // block_align
    return int(channels), int(rate), int(bits), int(n_samples), n_samples / rate


def decode_audio_meta(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio decode stage → (asset_id, channels,
    sample_rate, bits_per_sample, n_samples, duration_s, n_bytes).
    The ``fake`` kernel is the deterministic oracle-graded path;
    ``fake=False`` parses REAL WAV (RIFF) headers stdlib-only
    (:func:`_wav_audio` — PCM layout needs no codec) and raises for
    compressed formats that do."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_audio if fake else _wav_audio
        for pdf in batches:
            metas = [
                decode(p) if p is not None else (None,) * 5
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "channels": [m[0] for m in metas],
                    "sample_rate": [m[1] for m in metas],
                    "bits_per_sample": [m[2] for m in metas],
                    "n_samples": [m[3] for m in metas],
                    "duration_s": [m[4] for m in metas],
                    "n_bytes": [
                        len(p) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(kernel, _AUDIO_SCHEMA)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction → (asset_id,
    feature: array<float>[16]). Deterministic fake embedding =
    md5-digest bytes scaled to [-1, 1)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model"
                )
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                d = hashlib.md5(p).digest()
                feats.append([(b - 128) / 128.0 for b in d[:_FEATURE_DIM]])
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "feature": feats})

    return assets.mapInPandas(kernel, _FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling stage for video payloads: emits one row per
    sampled frame (asset_id, frame_idx, frame payload). The fake
    kernel slices the payload deterministically."""
    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                n_frames = max(1, len(p) // max(every_n, 1))
                for i in range(0, n_frames, every_n):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(p[i : i + every_n]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(kernel, schema)
