"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side contract is real and tested — schemas, batch shapes,
partitioning, dispatch — while the actual codec work is STUBBED: the
decode libraries (PIL/ffmpeg/torchaudio) are not in this environment, so
`decode_image` raises ``NotImplementedError`` unless a deterministic fake
is injected (tests do exactly that). Swapping in a real decoder changes
one function, not the pipeline.

Design point for 100 TB of media: bytes stay in the `binary` column until
the LAST possible stage; metadata-only operations (sniff, size, group,
dedup-by-digest) never deserialize payloads; per-batch memory is bounded
by `arrow_max_records` (session.py) times the average blob size, so batch
sizing — not row counts — is the operative knob.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), True),   # image/audio/video/unknown
        StructField("format", StringType(), True),       # png/jpeg/wav/...
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),        # sha256 for exact dedup
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("feature", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def sniff_media(data: Optional[bytes]) -> tuple:
    """(media_type, format, width, height) from magic bytes + headers.

    Header parsing is pure byte inspection (PNG IHDR / GIF screen / BMP /
    WAV fmt) — no codec library involved; deterministic.
    """
    if not data:
        return ("unknown", None, None, None)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w = h = None
        if len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
        return ("image", "png", w, h)
    if data[:3] == b"\xff\xd8\xff":
        return ("image", "jpeg", None, None)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w = h = None
        if len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
        return ("image", "gif", w, h)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return ("audio", "wav", None, None)
    if data[:3] == b"ID3" or data[:2] == b"\xff\xfb":
        return ("audio", "mp3", None, None)
    if len(data) > 11 and data[4:8] == b"ftyp":
        return ("video", "mp4", None, None)
    return ("unknown", None, None, None)


def media_metadata(
    df: DataFrame, blob_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """binary column → typed metadata table (no decode, bytes-local)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in MEDIA_META_SCHEMA.fields}
            for mid, raw in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(raw) if raw is not None else None
                mtype, fmt, w, h = sniff_media(data)
                rows["media_id"].append(str(mid))
                rows["media_type"].append(mtype)
                rows["format"].append(fmt)
                rows["n_bytes"].append(len(data) if data else 0)
                rows["digest"].append(
                    hashlib.sha256(data).hexdigest() if data else None
                )
                rows["width"].append(int(w) if w is not None else None)
                rows["height"].append(int(h) if h is not None else None)
                rows["error"].append(None if data else "empty blob")
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def decode_image(data: bytes):
    """bytes → pixel array. STUB: requires an image codec library that is
    not available here; inject a fake via `extract_features(decoder=...)`
    or monkeypatch in tests (the Spark plumbing around it is real)."""
    raise NotImplementedError(
        "image decoding requires PIL/cv2 (not installed in this environment)"
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    decoder: Optional[Callable] = None,
) -> DataFrame:
    """Decode + feature-extract stage (long format: one row per feature).

    `decoder(data: bytes) -> list[(feature, value)]`. With the default
    stub decoder, every row lands as a ('decode_error', nan)-free error
    marker feature so the pipeline shape is exercised end-to-end.
    """
    dec = decoder or (lambda data: (_ for _ in ()).throw(NotImplementedError("stub")))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, vals = [], [], []
            for mid, raw in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    for name, value in dec(data):
                        ids.append(str(mid))
                        feats.append(name)
                        vals.append(float(value))
                except NotImplementedError:
                    ids.append(str(mid))
                    feats.append("decode_unavailable")
                    vals.append(0.0)
            yield pd.DataFrame({"media_id": ids, "feature": feats, "value": vals})

    return df.select(id_col, blob_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def exact_media_dedup(meta: DataFrame) -> DataFrame:
    """Digest-level dedup over the metadata table (never touches bytes)."""
    return (
        meta.filter(F.col("digest").isNotNull())
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_id"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


def frame_sample_plan(
    meta: DataFrame, every_n_seconds: float = 1.0, assumed_fps: float = 25.0
) -> DataFrame:
    """For video rows: a deterministic frame-sampling plan (frame indexes
    to decode later). Planning is metadata-only; the decode stage consumes
    the plan. Duration is unknown without a decoder → plan covers the
    first minute (bounded), flagged `estimated`."""
    n = int(60 / every_n_seconds)
    step = int(assumed_fps * every_n_seconds)
    idxs = F.array(*[F.lit(i * step) for i in range(n)])
    return meta.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(idxs).alias("frame_index"),
        F.lit(True).alias("estimated"),
    )
