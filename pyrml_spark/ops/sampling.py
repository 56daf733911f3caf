"""Deterministic stratified sampling over the `documents` table.

A 100 TB training-data pipeline samples constantly — per-language mixture
reweighting, eval-holdout carving, ablation subsets — and it must be
REPRODUCIBLE: the same doc must land in the same split on every run, on any
cluster layout, regardless of partitioning. `df.sample()` is none of those
(seeded per-partition RNG — repartition and membership changes).

The standard fix is content-hash bucketing: bucket = hash(doc_id) mod 100,
keep the doc when bucket < rate(stratum). One narrow map, no shuffle, no
RNG state; rates are exact in expectation and membership is stable under
any re-run. The hash family is md5 (not xxhash64) so the exact sample is
engine-portable and the driver's DuckDB oracle verifies the membership set
value-for-value rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-language keep-rate in percent; strata absent from the map fall back
# to DEFAULT_RATE (the corpus langs are en/es/de/fr/zh — zh exercises the
# fallback on purpose)
SAMPLE_RATES = {"en": 50, "es": 20, "de": 10, "fr": 10}
DEFAULT_RATE = 5


def _hash_bucket(col) -> F.Column:
    """First 8 hex chars of md5(doc_id) as an int in [0, 100)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic hash sample of `documents`.

    Narrow map end to end: the bucket is computed from doc_id alone, the
    rate is a CASE over the stratum column — no shuffle, no broadcast, no
    RNG. At 100 TB this runs at scan speed and prunes rows before anything
    downstream sees them."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = _hash_bucket(F.col("doc_id"))
    rate = F.lit(DEFAULT_RATE)
    for lang, pct in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        docs.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < rate)
        .select("doc_id", "lang", "source", "sample_bucket")
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {pct}"
    for lang, pct in sorted(SAMPLE_RATES.items())
)

ORACLE_SAMPLE = f"""
WITH b AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS sample_bucket
  FROM documents
)
SELECT doc_id, lang, source, sample_bucket
FROM b
WHERE sample_bucket < CASE {_RATE_CASE} ELSE {DEFAULT_RATE} END
"""
