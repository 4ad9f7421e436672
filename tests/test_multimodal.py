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
