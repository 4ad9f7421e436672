"""Multimodal plumbing tests: binary payloads through Arrow-batched
mapInPandas with the stubbed codec."""

from __future__ import annotations

import pytest

from domanda_etl_spark.operators import multimodal


def test_media_metadata_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "héllo")], "id long, text string")
    payload = multimodal.with_binary_payload(df, "text")
    out = {r["id"]: r for r in multimodal.media_metadata(payload, "id").collect()}
    assert out[1]["byte_len"] == 5
    assert out[1]["prefix_hex"] == "68656C6C"
    assert out[2]["byte_len"] == 6  # é is 2 bytes in utf-8


def test_image_features_fake_codec(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "id long, text string")
    payload = multimodal.with_binary_payload(df, "text")
    row = multimodal.image_features(payload, "id", fake=True).collect()[0]
    assert (row["width"], row["height"], row["mode"]) == (100, 700, "FAKE")


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_frame_extract_chunks_and_stride(spark):
    from domanda_etl_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "a" * 600), (2, "b" * 256), (3, "")], "id long, text string"
    )
    payload = multimodal.with_binary_payload(df, "text")
    out = multimodal.frame_extract(payload, "id", frame_bytes=256, stride=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["frame_idx"], r["frame_len"]))
    # 600 bytes -> frames 0,1,2 (256,256,88); stride 2 keeps 0 and 2
    assert sorted(by_id[1]) == [(0, 256), (2, 88)]
    assert by_id[2] == [(0, 256)]
    assert 3 not in by_id  # empty payload -> no frames
