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

from ..scan import read_parquet_parallel

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
    downstream sees them.

    Plain read, NOT the scan-parallelism floor: the per-row work (one hash
    + compare) is cheaper than the floor's rebalance exchange."""
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


# ---------------------------------------------------------------------------
# Deterministic mixture resampling (epoch replication)
# ---------------------------------------------------------------------------

# target replication factor per language: >1 upsamples (a doc appears in
# several training epochs), <1 downsamples. Fractional parts are resolved
# per-doc by an INDEPENDENT hash bucket (second md5 window, so membership
# does not correlate with sample_stratified's bucket).
REPLICATION = {"en": 0.5, "es": 1.25, "de": 2.0, "fr": 2.5}
DEFAULT_REPLICATION = 1.0


def _frac_bucket(col) -> F.Column:
    """Hex chars 9-16 of md5(doc_id) as an int in [0, 100) — independent of
    ``_hash_bucket``'s chars 1-8."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 9, 8), 16, 10)
        .cast("long") % 100
    )


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate each document ``floor(w)`` times plus one more when its
    hash bucket falls under the fractional part of ``w`` — the standard way
    to realize a fractional mixture weight as concrete epoch copies,
    deterministically (same doc → same copy count on every run and layout).

    Narrow map + explode, shuffle-free: the sequence [1..repeats] is built
    per row and exploded; repeats==0 rows yield an empty array, which
    ``explode`` drops (the downsampled docs). At 100 TB the op streams at
    scan speed and emits copies tagged ``epoch_ix`` for the writer to
    route."""
    docs = read_parquet_parallel(spark, f"{sf_dir}/documents.parquet")
    bucket = _frac_bucket(F.col("doc_id"))

    def _repeats_for(w: float) -> F.Column:
        base, frac_pct = int(w), int(round(100 * (w - int(w))))
        return F.lit(base) + (bucket < frac_pct).cast("int")

    repeats = _repeats_for(DEFAULT_REPLICATION)
    for lang, w in sorted(REPLICATION.items()):
        repeats = F.when(F.col("lang") == lang,
                         _repeats_for(w)).otherwise(repeats)
    copies = F.when(repeats > 0, F.sequence(F.lit(1), repeats)) \
        .otherwise(F.array().cast("array<int>"))
    return (
        docs.select("doc_id", "lang", repeats.alias("n_copies"),
                    F.explode(copies).alias("epoch_ix"))
    )


_REPL_CASE = " ".join(
    "WHEN lang = '{l}' THEN {b} + CASE WHEN bucket < {f} THEN 1 ELSE 0 END"
    .format(l=lang, b=int(w), f=int(round(100 * (w - int(w)))))
    for lang, w in sorted(REPLICATION.items())
)

ORACLE_RESAMPLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT % 100
           AS bucket
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         CASE {_REPL_CASE}
              ELSE {int(DEFAULT_REPLICATION)} + CASE WHEN bucket <
                {int(round(100 * (DEFAULT_REPLICATION - int(DEFAULT_REPLICATION))))}
                THEN 1 ELSE 0 END
         END AS n_copies
  FROM b
)
SELECT doc_id, lang, n_copies, CAST(g.e AS INT) AS epoch_ix
FROM r, unnest(generate_series(1, n_copies)) AS g(e)
"""
