"""Streaming document curation: the text-pipeline ops composed as a
Structured Streaming flow.

A crawl does not arrive as a finished corpus — documents land continuously,
and the curation passes (exact dedup, PII scrub, classifier gate) should run
incrementally rather than as whole-corpus batch jobs. This module wires the
SAME column expressions the batch ops use (``ops.textstats`` helpers — one
implementation, two execution modes) into a file-arrival stream:

1. normalize + fingerprint (md5 of collapsed-whitespace lowercase text);
2. exact dedup via ``withWatermark + dropDuplicatesWithinWatermark`` on the
   fingerprint — duplicates from re-crawls/re-deliveries arrive close
   together, so the dedup state is evicted as the watermark advances and
   stays bounded by the watermark window's distinct-fingerprint count (a
   plain ``dropDuplicates`` would accumulate state forever);
3. PII redaction (narrow map, stateless);
4. linear quality-classifier gate (narrow map, stateless).

Everything except the dedup is stateless, so a micro-batch costs O(arriving
documents); the one stateful op's footprint is watermark-bounded. At
deployment the source is Kafka/cloud-files instead of a directory — the
transforms are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ops.textstats import QC_THRESHOLD, pii_redacted, qc_features

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("ingest_ts", T.TimestampType()),
])


def read_doc_stream(spark: SparkSession, input_dir: str,
                    max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def curate_stream(docs: DataFrame, watermark: str = "10 minutes",
                  threshold: float = QC_THRESHOLD) -> DataFrame:
    """Dedup → redact → gate. Returns the curated stream with the quality
    columns attached; append-mode sink-able (no aggregation)."""
    with_ts = docs.withColumn(
        "ingest_ts", F.coalesce(F.col("ingest_ts"), F.current_timestamp()))
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = with_ts.withColumn("fingerprint", F.md5(norm))
    deduped = (
        fp.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    n, sum_w = qc_features(F.col("text"))
    logit = F.round(sum_w / (n * 1000.0), 6)
    return (
        deduped.withColumn("redacted", pii_redacted(F.col("text")))
        .withColumn("quality_logit", logit)
        .filter(F.col("quality_logit") > threshold)
        .select("doc_id", "lang", "source", "fingerprint",
                "redacted", "quality_logit")
    )


def curate_batch(docs: DataFrame,
                 threshold: float = QC_THRESHOLD) -> DataFrame:
    """The batch-semantics twin of :func:`curate_stream` (keep the
    lowest-doc_id representative per fingerprint) — the equality target the
    stream test pins itself against."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = docs.withColumn("fingerprint", F.md5(norm))
    w_min = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    deduped = fp.join(w_min, ["fingerprint", "doc_id"])
    n, sum_w = qc_features(F.col("text"))
    logit = F.round(sum_w / (n * 1000.0), 6)
    return (
        deduped.withColumn("redacted", pii_redacted(F.col("text")))
        .withColumn("quality_logit", logit)
        .filter(F.col("quality_logit") > threshold)
        .select("doc_id", "lang", "source", "fingerprint",
                "redacted", "quality_logit")
    )
