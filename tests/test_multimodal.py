"""Multimodal plumbing tests: schema, batch shape, determinism, stub codec."""

import pytest
from pyspark.sql import functions as F

from pyrml_spark.kg.datagen import generate_documents
from pyrml_spark.kg.extract import media_spans
from pyrml_spark.ops.multimodal import (
    FAKE_FORMAT_MAGIC,
    decode_payload,
    extract_features,
    resize_images,
    sample_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = generate_documents(spark, 150)
    refs = media_spans(docs).select("media_ref", "kind").distinct()
    return synth_media_table(spark, refs).cache()


def test_media_table_schema_and_metadata(media):
    rows = media.collect()
    assert rows
    for r in rows:
        assert bytes(r["payload"])[:4] == FAKE_FORMAT_MAGIC
        if r["kind"] == "image":
            assert r["width"] >= 32 and r["height"] >= 32
            assert r["sample_rate"] is None
        else:
            assert r["sample_rate"] == 16000 and r["n_samples"] > 0
            assert r["width"] is None


def test_feature_extraction_deterministic(media):
    a = {r["media_ref"]: (tuple(r["feature"]), r["payload_sha1"])
         for r in extract_features(media).collect()}
    b = {r["media_ref"]: (tuple(r["feature"]), r["payload_sha1"])
         for r in extract_features(media.repartition(7)).collect()}
    assert a == b
    dims = {len(f) for f, _ in a.values()}
    assert dims == {16}


def test_decode_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG\r\n\x1a\n....", "image")


def test_resize_and_frame_sample(media):
    rs = resize_images(media, max_side=64).collect()
    for r in rs:
        assert max(r["out_width"], r["out_height"]) <= 64
    fs = sample_frames(media, every_n=4000).collect()
    for r in fs:
        idx = r["sample_indices"]
        assert idx[0] == 0 and all(b - a == 4000 for a, b in zip(idx, idx[1:]))
