"""Sequence packing and corpus-mixture planning over the `documents` table.

The last mile of a pre-training data pipeline: after dedup / filtering /
sampling, documents are (1) packed into fixed-length training sequences
(GPT-style concat-and-chunk: concatenate the token stream, cut every
SEQ_LEN tokens — a doc may span a pack boundary) and (2) mixed across
domains with a temperature-reweighted sampling distribution (the
p^alpha / sum(p^alpha) rule published in the multilingual-BERT / T5 /
PaLM recipes).

Both are manifests, not payload movers: they emit (doc -> pack slot) and
(domain -> weight) tables that a writer/loader consumes, so the 100 TB of
text itself never has to shuffle for planning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scan import read_parquet_parallel
from pyspark.sql.window import Window

SEQ_LEN = 512        # tokens per training sequence
PACK_SHARDS = 16     # independent packing streams (parallelism unit)
MIX_ALPHA = 0.5      # temperature exponent for mixture reweighting


def _shard_of(col) -> F.Column:
    """md5-derived shard in [0, PACK_SHARDS): content-stable, layout-free —
    the same doc lands in the same packing stream on any cluster."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % PACK_SHARDS
    )


def seq_pack(spark: SparkSession, sf_dir: str,
             seq_len: int = SEQ_LEN) -> DataFrame:
    """Concat-and-chunk packing manifest: each shard is an independent
    token stream ordered by doc_id; a running token offset places every
    document, and its first/last pack ids are the offset divided by
    ``seq_len``. Docs crossing a boundary span two (or more) packs — the
    GPT-2/3 packing semantics, not first-fit bin packing.

    Scale shape: ONE hash exchange on `shard` plus a per-shard sort — the
    window never sees more than one shard per task, and shard count is the
    knob that scales with corpus size (packing within a shard is inherently
    sequential; shards are the parallelism unit, like writer tasks). The
    payload through the shuffle is (doc_id, n_tokens), never the text."""
    docs = read_parquet_parallel(spark, f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))
    sized = docs.select(
        "doc_id",
        _shard_of(F.col("doc_id")).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    offset = (cum - F.col("n_tokens")).alias("start_offset")
    # integer division on non-negative longs: cast-truncate == floor
    pack_first = ((cum - F.col("n_tokens")) / seq_len).cast("long")
    pack_last = ((cum - 1) / seq_len).cast("long")
    return sized.select(
        "doc_id", "shard", "n_tokens",
        offset,
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_last - pack_first + 1).alias("packs_spanned"),
    )


ORACLE_SEQ_PACK = f"""
WITH sized AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {PACK_SHARDS} AS shard,
         len(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '))
           AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM sized
)
-- CAST AS BIGINT: DuckDB's windowed sum() yields HUGEINT, and the driver's
-- value hash is type-sensitive (the round-2 events_sessionize lesson) — Spark
-- emits BIGINT, so the oracle must too.
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {SEQ_LEN} AS BIGINT) AS pack_first,
       CAST((cum - 1) // {SEQ_LEN} AS BIGINT) AS pack_last,
       CAST((cum - 1) // {SEQ_LEN} - (cum - n_tokens) // {SEQ_LEN} + 1
            AS BIGINT) AS packs_spanned
FROM placed
"""


def corpus_mixture(spark: SparkSession, sf_dir: str,
                   alpha: float = MIX_ALPHA) -> DataFrame:
    """Per-(lang, source) corpus statistics and the temperature-reweighted
    mixture distribution: mix_weight proportional to n_tokens^alpha, the
    published upsample-the-tail rule (alpha=0.5 here).

    Scale shape: one map-side-combinable groupBy (integer sums — exact, so
    the oracle matches bit-for-bit regardless of aggregation order); the
    normalizing windows then run over the AGGREGATE output (#domains rows,
    not #docs), so the single-task window stage is as cheap as the 16-row
    prefix table. The cross-group sum of per-group sqrt terms goes through
    DECIMAL(38,6) to stay order-independent — the same trick the
    sessionizer uses for its float sums.

    Plain read, NOT the scan-parallelism floor: the groupBy partial-
    aggregates on the scan partitions, so the floor's rebalance shuffled
    the full text column once more just to split it in parallel —
    measured ~1.5x slower than letting the one-partition map side do the
    splits (50k docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))
    grouped = (
        docs.select("lang", "source", n_tokens.alias("t"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("n_tokens"))
    )
    # deterministic per-group score: round BEFORE the cross-group sum, then
    # carry it as an exact decimal so the total is order-independent
    score = F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)), 6) \
        .cast("decimal(38,6)")
    everything = Window.partitionBy()
    scored = grouped.withColumn("score", score)
    tot_tokens = F.sum("n_tokens").over(everything)
    tot_score = F.sum("score").over(everything)
    return scored.select(
        "lang", "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens").cast("double")
                / tot_tokens.cast("double"), 6).alias("token_share"),
        F.round(F.col("score").cast("double")
                / tot_score.cast("double"), 6).alias("mix_weight"),
    )


ORACLE_MIXTURE = f"""
WITH g AS (
  -- CAST AS BIGINT: DuckDB sum() yields HUGEINT; Spark emits BIGINT and the
  -- driver's value hash is type-sensitive.
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(len(string_split(
             regexp_replace(text, '\\s+', ' ', 'g'), ' '))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang, source
),
s AS (
  SELECT *, CAST(CAST(round(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA}), 6)
                      AS VARCHAR) AS DECIMAL(38,6)) AS score
  FROM g
)
SELECT lang, source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE)
             / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
       round(CAST(score AS DOUBLE)
             / CAST(sum(score) OVER () AS DOUBLE), 6) AS mix_weight
FROM s
"""
