"""Driver-facing KG pipeline queries (rows-only checks: the generator +
iterative connected components are not SQL-expressible in DuckDB; per-row
invariants and native/pandas extractor equality are pytest-verified in
tests/test_kg_pipeline.py)."""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .datagen import generate_documents
from .extract import mentions_native, sameas_candidates
from .canonicalize import canonical_mapping
from .pipeline import KGPipelineConfig, run_pipeline

_N_DOCS_CHECK = 300


def kg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule input table itself (deterministic synthesis).

    Returned flattened (one row per span, scalar columns only): the driver's
    canonicalizer sorts with pandas, which cannot hash/sort an
    array<struct<…>> column (round-1 harness crash). Span-sequence equality
    with the nested form is pytest-verified in tests/test_kg_pipeline.py."""
    from pyspark.sql import functions as F

    docs = generate_documents(spark, _N_DOCS_CHECK)
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mentions_native(generate_documents(spark, _N_DOCS_CHECK))


def kg_canonical_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, _N_DOCS_CHECK)
    return canonical_mapping(sameas_candidates(mentions_native(docs)))


def kg_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mkdtemp (not TemporaryDirectory): the checkpoint parquet must outlive
    # this call — the driver re-reads the returned DataFrame lazily
    d = tempfile.mkdtemp(prefix="kg_entry_")
    df = run_pipeline(
        spark, d,
        KGPipelineConfig(n_docs=_N_DOCS_CHECK, use_pandas_extractor=False),
    )
    return df.select("s", "p", "o", "g")


KG_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_documents": kg_documents,
    "kg_mentions": kg_mentions,
    "kg_canonical_mapping": kg_canonical_mapping,
    "kg_pipeline_triples": kg_pipeline_triples,
}

KG_ORACLES: Dict[str, str] = {}
