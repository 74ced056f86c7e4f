"""Perceptual image hashing + image-level near-dup — dHash over the
pure-stdlib decoders.

The image-side analog of the text near-dup family (dedup.py): exact
image dedup falls out of media_metadata's sha256, but re-encoded /
resized copies need a perceptual fingerprint. dHash (difference hash)
is the standard cheap one: grayscale → nearest-resize to 9×8 → one bit
per adjacent-pixel comparison → 64 bits. Every step here is
integer-exact ((r+g+b)//3 gray, the resize_nearest center rule) so the
fingerprint is closed-form replicable in the DuckDB gate.

The 64 bits are carried as FOUR 16-bit band ints rather than one
bigint — that sidesteps the sign bit AND is exactly the LSH banding
:func:`image_near_dup` needs: pairs within Hamming ≤ h (h < 4) share
at least one identical band (pigeonhole, same argument as
dedup.simhash_near_pairs), so candidates come from four band-keyed
bucket joins — never an all-pairs product — and are verified with an
exact popcount.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from .multimodal import decode_image, resize_nearest

__all__ = ["dhash_bands", "image_dhash", "image_near_dup"]

HASH_W, HASH_H = 8, 8  # 8x8 comparison grid over a 9x8 resample


def dhash_bands(w: int, h: int, ch: int, px: bytes) -> Tuple[int, int, int, int]:
    """(b0, b1, b2, b3) 16-bit bands of the 64-bit dHash."""
    if ch == 1:
        gray = px
    else:
        gray = bytes(
            (px[i] + px[i + 1] + px[i + 2]) // 3
            for i in range(0, w * h * ch, ch)
        )
    g = resize_nearest(gray, w, h, 1, HASH_W + 1, HASH_H)
    bands = [0, 0, 0, 0]
    for gy in range(HASH_H):
        row = gy * (HASH_W + 1)
        for gx in range(HASH_W):
            if g[row + gx + 1] > g[row + gx]:
                i = gy * HASH_W + gx
                bands[i // 16] |= 1 << (i % 16)
    return tuple(bands)  # type: ignore[return-value]


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("b0", IntegerType(), False),
        StructField("b1", IntegerType(), False),
        StructField("b2", IntegerType(), False),
        StructField("b3", IntegerType(), False),
    ]
)


def image_dhash(
    df: DataFrame, blob_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, b0..b3) per decodable image row; undecodable rows are
    skipped like resize_media (their exact-dup story is the metadata
    sha256)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, ch, px = decode_image(bytes(raw))
                except (ValueError, NotImplementedError):
                    continue
                rows.append((str(mid),) + dhash_bands(w, h, ch, px))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in DHASH_SCHEMA.fields]
                )

    return df.select(id_col, blob_col).mapInPandas(run, schema=DHASH_SCHEMA)


def image_near_dup(
    df: DataFrame,
    max_hamming: int = 0,
    blob_col: str = "blob",
    id_col: str = "media_id",
) -> DataFrame:
    """(id_a, id_b, hamming) image pairs with dHash Hamming distance ≤
    ``max_hamming`` (< 4 — the four 16-bit bands are the pigeonhole).
    Candidates come from four band-keyed bucket joins; the popcount
    verify is exact. Scale shape: identical to simhash_near_pairs —
    shuffle keys are the band values, never an all-pairs product."""
    if not 0 <= max_hamming < 4:
        raise ValueError("max_hamming must be in [0, 3] for 4-band pigeonhole")
    fps = image_dhash(df, blob_col, id_col)
    band_rows = fps.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(str(k)), F.col(f"b{k}").cast("string"))
                    for k in range(4)
                ]
            )
        ).alias("band_key"),
    )
    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), "band_key")
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            *[F.col(f"a.b{k}").alias(f"ab{k}") for k in range(4)],
            *[F.col(f"b.b{k}").alias(f"bb{k}") for k in range(4)],
        )
        .distinct()
    )
    ham = sum(
        F.bit_count(F.col(f"ab{k}").bitwiseXOR(F.col(f"bb{k}")))
        for k in range(4)
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
