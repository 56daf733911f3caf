"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the *codec* step is stubbed
behind a deterministic fake (or ``NotImplementedError`` for real formats) —
but the Spark-side plumbing is real and tested: schemas, batch shapes, UDF
signatures, partition routing. Swapping the fake for PIL/torchaudio changes
one function, not the plan.

Scale design: payloads travel as binary columns (Arrow zero-copy into the
UDF); feature extraction is a narrow map (no shuffle); routing/grouping keys
(media kind, shard) are computed natively before the UDF so Catalyst can
partition-prune without touching payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),        # image | audio
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("width", T.IntegerType()),       # image metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio metadata
        T.StructField("n_samples", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("payload_sha1", T.StringType()),
    ]
)

FAKE_FORMAT_MAGIC = b"FAKE"


def synth_media_table(spark: SparkSession, media_refs: DataFrame) -> DataFrame:
    """Attach deterministic fake payloads to (media_ref, kind) rows.

    Fake format: b"FAKE" + 8-byte xxhash-derived seed + 64 payload bytes —
    enough structure for the decoder stub to validate and 'decode'."""
    seeded = media_refs.withColumn("seed", F.xxhash64("media_ref"))

    @F.pandas_udf(T.BinaryType())
    def make_payload(seed: pd.Series) -> pd.Series:
        out = []
        for s in seed:
            body = hashlib.sha256(str(int(s)).encode()).digest() * 2  # 64 bytes
            out.append(FAKE_FORMAT_MAGIC + struct.pack(">q", int(s)) + body)
        return pd.Series(out)

    dims = seeded.select(
        "media_ref",
        "kind",
        make_payload("seed").alias("payload"),
        F.when(F.col("kind") == "image",
               (F.pmod(F.col("seed"), F.lit(512)) + 32).cast("int")).alias("width"),
        F.when(F.col("kind") == "image",
               (F.pmod(F.col("seed"), F.lit(384)) + 32).cast("int")).alias("height"),
        F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
        F.when(F.col("kind") == "audio",
               (F.pmod(F.col("seed"), F.lit(48000)) + 1600).cast("int"))
        .alias("n_samples"),
    )
    return dims


def decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Codec stub. Real formats raise; the deterministic FAKE format decodes
    to a float vector (what a pixel/waveform array would be)."""
    if payload[:4] != FAKE_FORMAT_MAGIC:
        raise NotImplementedError(
            "real image/audio codecs are not available in this container — "
            "plug PIL/torchaudio here; the FAKE format covers the plumbing"
        )
    body = payload[12:]
    arr = np.frombuffer(body, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """mapInPandas feature extractor: decode (stub) → pooled feature vector.
    Arrow-batched; payload bytes never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = decode_payload(bytes(payload), kind)
                pooled = arr[: (len(arr) // feat_dim) * feat_dim].reshape(
                    -1, feat_dim
                ).mean(axis=0)
                feats.append(pooled.astype(np.float32).tolist())
                shas.append(hashlib.sha1(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_sha1": shas,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize stage: metadata math natively (JVM), payload transform stubbed
    as identity (a real resize would re-encode in the UDF)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.filter(F.col("kind") == "image").select(
        "media_ref",
        "payload",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def sample_frames(media: DataFrame, every_n: int = 4000) -> DataFrame:
    """Frame/sample selection for audio: pick sample indices natively
    (sequence), leaving decode to the UDF stage — partition-prunable."""
    return media.filter(F.col("kind") == "audio").select(
        "media_ref",
        F.sequence(F.lit(0), F.col("n_samples") - 1,
                   F.lit(every_n)).alias("sample_indices"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing query: media refs from the interleaved corpus → fake
    payloads → Arrow-batched feature extraction (rows-only check)."""
    from ..kg.datagen import generate_documents
    from ..kg.extract import media_spans

    docs = generate_documents(spark, 300)
    refs = media_spans(docs).select("media_ref", "kind").distinct()
    media = synth_media_table(spark, refs)
    return extract_features(media).select(
        "media_ref", "kind", "payload_sha1",
        F.round(F.aggregate("feature", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 4)
        .alias("feature_sum"),
    )
