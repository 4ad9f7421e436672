"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side mechanics are real and tested — binary columns, Arrow-batched
`mapInPandas` with explicit output schemas, partition-sized batches — while
the actual codec work (image decode, resampling, frame extraction) is
STUBBED: the container has no media libraries, so `decode_image` raises
NotImplementedError unless handed the deterministic fake used by tests.
Swapping a real decoder in changes one function, not the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "id bigint, byte_len bigint, prefix_hex string"


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Treat a string column as an opaque utf-8 binary payload (stand-in for
    real media bytes in the test corpus)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def media_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Byte-level metadata via Arrow-batched mapInPandas: (id, byte_len,
    prefix_hex of the first 4 bytes — where a magic-number sniffer would
    run). The Python stage sees whole Arrow batches, never Python rows."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_len": payload.map(len).astype("int64"),
                    "prefix_hex": payload.map(lambda b: bytes(b)[:4].hex().upper()),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, MEDIA_META_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB — image decode. Real deployments plug PIL/libvips here; the
    container ships no codec, so only the deterministic fake path exists
    (returns synthetic dimensions derived from the byte length)."""
    if fake:
        return {"width": len(payload) % 1024, "height": (len(payload) * 7) % 1024, "mode": "FAKE"}
    raise NotImplementedError("no image codec in this environment; pass fake=True in tests")


IMAGE_FEATURES_SCHEMA = "id bigint, width int, height int, mode string"


def image_features(df: DataFrame, id_col: str, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Decode-and-extract plumbing over mapInPandas with the stubbed codec.
    Batch shape, schema, and partitioning are production-real."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(bytes(b), fake=fake) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mode": [f["mode"] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, IMAGE_FEATURES_SCHEMA)
