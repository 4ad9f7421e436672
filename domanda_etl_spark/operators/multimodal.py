"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side mechanics are real and tested — binary columns, Arrow-batched
`mapInPandas` with explicit output schemas, partition-sized batches.  Image
decode is REAL for PNG via the pure-stdlib codec in `png_codec` (zlib +
scanline unfiltering; encode too, so round-trips are self-contained);
formats that genuinely need a codec library the container does not ship
(JPEG etc.) still raise NotImplementedError from `decode_image`, and the
deterministic fake path is kept for the legacy fixtures.  Swapping
PIL/libvips in changes one function, not the plumbing.
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


FRAME_SCHEMA = "id bigint, frame_idx int, frame_len int, frame_md5 string"


def frame_extract(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    stride: int = 1,
) -> DataFrame:
    """Audio/video frame sampling over opaque media bytes: chunk the payload
    into fixed `frame_bytes` frames, keep every `stride`-th one (keyframe
    sampling), fingerprint each (md5 over the frame's uppercase hex — a
    cross-engine-stable stand-in for a perceptual hash). Same Arrow-batched
    mapInPandas plumbing as `media_metadata`; a real decoder (ffmpeg frame
    grab, PCM windowing) replaces only the inner loop. One input row fans
    out to ceil(len/frame_bytes)/stride output rows — partition sizing must
    account for the multiplier, exactly like real frame extraction."""
    import hashlib

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            digests: list[str] = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                bb = bytes(b)
                n_frames = (len(bb) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    fr = bb[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(i)
                    idxs.append(fi)
                    lens.append(len(fr))
                    digests.append(hashlib.md5(fr.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_len": lens, "frame_md5": digests}
            )

    return df.select(id_col, payload_col).mapInPandas(compute, FRAME_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Image decode.  PNG payloads are decoded FOR REAL by the pure-
    stdlib codec in `png_codec` (zlib + scanline unfiltering — no media
    library needed), returning width/height/mode plus the pixel array.
    The deterministic fake path is kept for the legacy fixtures.  Other
    formats (JPEG etc.) genuinely need a codec library this container
    does not ship and still raise; a real deployment swaps PIL/libvips
    in here without touching the mapInPandas plumbing."""
    if fake:
        return {"width": len(payload) % 1024, "height": (len(payload) * 7) % 1024, "mode": "FAKE"}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png_codec import decode_png

        return decode_png(payload)
    raise NotImplementedError(
        "only PNG is decodable without a codec library; got "
        f"magic {bytes(payload[:4]).hex()}"
    )


IMAGE_FEATURES_SCHEMA = "id bigint, width int, height int, mode string"


def image_features(df: DataFrame, id_col: str, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Decode-and-extract plumbing over mapInPandas with the stubbed codec.
    Batch shape, schema, and partitioning are production-real.

    The closure references module-level `decode_image`, which cloudpickle
    ships BY REFERENCE — so the package must be importable inside the
    Python workers (ensure_package_on_executors = programmatic
    --py-files; a vanilla driver session has no repo on its worker
    path)."""
    from ..shipping import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

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


def encode_embedding_png(
    df: DataFrame, id_col: str, vec_col: str, side: int = 8
) -> DataFrame:
    """Render each `side*side`-dim float vector as a real side x side
    grayscale PNG payload (the synthetic stand-in for an image column
    with verifiable ground truth): pixel = clamp(floor((x + 1.0) * 127.5),
    0, 255) computed in float64 — IEEE-exact, so an oracle can recompute
    the quantization from the raw floats.  The per-row scanline filter
    cycles through all five PNG predictors (id % 5) so the decode path's
    every filter branch runs in production, not just in unit tests."""
    import numpy as np

    from ..shipping import ensure_package_on_executors
    from .png_codec import encode_png

    ensure_package_on_executors(df.sparkSession)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, vec in zip(pdf[id_col], pdf[vec_col]):
                a = np.asarray(vec, dtype=np.float64)
                px = np.clip(np.floor((a + 1.0) * 127.5), 0, 255).astype(np.uint8)
                payloads.append(
                    encode_png(px.reshape(side, side), filter_type=int(i) % 5)
                )
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return df.select(id_col, vec_col).mapInPandas(compute, "id bigint, payload binary")


IMAGE_PIXEL_STATS_SCHEMA = (
    "id bigint, width int, height int, mode string, "
    "px_sum bigint, px_min int, px_max int"
)


def image_pixel_stats(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """REAL decode-and-extract over mapInPandas: each payload is decoded
    by the pure-stdlib PNG codec and reduced to exact pixel statistics
    (sum / min / max over every sample of every channel) — lossless-
    codec ground truth an oracle can recompute from the pre-encode
    values.  Same Arrow batch shape and package-shipping needs as
    `image_features`."""
    from ..shipping import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mode": [f["mode"] for f in feats],
                    "px_sum": [int(f["pixels"].astype("int64").sum()) for f in feats],
                    "px_min": [int(f["pixels"].min()) for f in feats],
                    "px_max": [int(f["pixels"].max()) for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, IMAGE_PIXEL_STATS_SCHEMA)
