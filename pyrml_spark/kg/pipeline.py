"""End-to-end KG construction pipeline (the north rule):

    interleaved documents (doc_id, spans[])
      → mention detection (Arrow/pandas UDF or native — both vectorized)
      → triple expansion (deterministic IRI templates)
      → candidate sameAs links → connected-components canonicalization
      → subject/object rewrite through the canonical mapping
      → dedup → partitioned (s,p,o,g) table + N-Quads-ready strings

Every stage is checkpointed + manifest-recorded (resumable); the output
table is partitioned by a subject hash bucket (``pmod(xxhash64(s), N)``) so
downstream point lookups and joins prune partitions. AQE + explicit
repartition sizes handle skew on hot subjects at scale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canonicalize import canonical_mapping
from .datagen import generate_documents
from .extract import (
    assemble_canonical_triples,
    media_spans,
    mentions_native,
    mentions_pandas,
    sameas_candidates,
)
from .lineage import StageRunner, fingerprint


@dataclass
class KGPipelineConfig:
    n_docs: int = 10_000
    use_pandas_extractor: bool = True
    n_subject_buckets: int = 32
    output_partitions: int = 0          # 0 = one file per bucket
    cc_max_iter: int = 25
    collect_partition_lineage: bool = True  # off for pure-throughput benches
    gen_partitions: int = 0                 # fixed datagen partitioning (benches)
    final_repartition: bool = True          # False: skip the bucket exchange
                                            # (fused bench path; dedup's own
                                            # shuffle already colocates rows)
    checkpoint_dir: Optional[str] = None    # stage-parquet location when it
                                            # should differ from work_dir
                                            # (benches: tmpfs; cluster: the
                                            # object-store checkpoint prefix)
    collect_extra_metrics: bool = True      # distinct-subject/graph counts on
                                            # the final table (one extra agg
                                            # job; off for throughput runs)


def _public_input_tag(documents: DataFrame) -> str:
    """Resume identity for a caller-supplied input, from public surface only:
    schema JSON + a WHOLE-dataset order-independent signal (row count + sum
    of per-row xxhash64 — one aggregate job) + a bounded row sample hash.
    The whole-dataset aggregate means an appended/edited input changes the
    tag even when its first rows are identical, so resume can never silently
    serve stale stage checkpoints for a grown dataset. The aggregate is one
    full scan — callers with a real dataset identity (name + version) should
    pass ``input_tag`` and skip it."""
    import hashlib
    import logging

    logging.getLogger(__name__).warning(
        "no input_tag supplied for external documents: deriving one from a "
        "full-scan content hash (count + xxhash64 sum). Pass input_tag="
        "'<dataset>@<version>' to make resume identity explicit and skip "
        "this scan."
    )
    h = hashlib.sha256(documents.schema.json().encode())
    agg = documents.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a long sum of xxhash64 values overflows
        # under ANSI mode on even small inputs
        F.sum(F.xxhash64(F.struct(*documents.columns))
              .cast("decimal(38,0)")).alias("xh"),
    ).collect()[0]
    h.update(f"n={agg['n']};xh={agg['xh']}".encode())
    sample = documents.limit(64).collect()
    for row_repr in sorted(repr(r) for r in sample):
        h.update(row_repr.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def run_pipeline(
    spark: SparkSession,
    work_dir: str,
    config: KGPipelineConfig = KGPipelineConfig(),
    documents: Optional[DataFrame] = None,
    input_tag: Optional[str] = None,
) -> DataFrame:
    """Returns the final (s,p,o,g,subject_bucket) DataFrame; all stages
    checkpointed under ``work_dir`` with manifest lineage."""
    runner = StageRunner(
        spark, work_dir,
        collect_partition_lineage=config.collect_partition_lineage,
        stage_dir=config.checkpoint_dir,
    )
    cfg_fp = fingerprint(
        config.n_docs, config.use_pandas_extractor, config.n_subject_buckets,
        "v1",
    )

    if documents is None:
        docs_fp = fingerprint("docs", cfg_fp)
        docs = runner.run(
            "documents", docs_fp,
            lambda: generate_documents(spark, config.n_docs),
        )
    else:
        # external input: mix an identity of the DataFrame into the
        # fingerprint, else stage fingerprints collide across different
        # caller-supplied inputs and resume would reuse stale checkpoints.
        # Caller should pass input_tag for a stable, resumable identity
        # (dataset name + version). Fallback derives a tag from PUBLIC
        # surface only — schema JSON + a bounded content sample hash (the
        # earlier analyzed-plan string was a private JVM API that breaks
        # under Spark Connect and embeds session-specific expression ids, so
        # the same input never resumed across sessions).
        tag = input_tag or _public_input_tag(documents)
        docs_fp = fingerprint("docs-ext", cfg_fp, tag)
        docs = documents

    extractor = mentions_pandas if config.use_pandas_extractor else mentions_native
    mentions_fp = fingerprint("mentions", docs_fp, config.use_pandas_extractor)
    mentions = runner.run("mentions", mentions_fp, lambda: extractor(docs))

    media_fp = fingerprint("media", docs_fp)
    media = runner.run("media_spans", media_fp, lambda: media_spans(docs))

    edges_fp = fingerprint("edges", mentions_fp)
    edges = runner.run("sameas_edges", edges_fp,
                       lambda: sameas_candidates(mentions))

    mapping_fp = fingerprint("mapping", edges_fp, config.cc_max_iter)
    # the edges stage just ran (or resumed), so its row count is already in
    # the manifest — the same scale gate as run_pipeline_fused costs no job
    edge_rows = runner.stage_rows("sameas_edges", edges_fp)

    def build_mapping() -> DataFrame:
        if edge_rows is not None and edge_rows <= DRIVER_UNION_FIND_MAX_EDGES:
            # small edge set: the distributed min-label loop pays several
            # job round-trips per iteration (~3-4 s at bench scale) which
            # dominate when the edges fit in driver memory; driver
            # union-find produces the identical (entity, canonical) table
            # (same lexicographic-min labels — the fused path's shortcut,
            # equality pinned by tests). Arrow both ways, as in fused mode.
            import pandas as pd

            epdf = edges.toPandas()
            pairs = _driver_union_find(
                zip(epdf["src"].tolist(), epdf["dst"].tolist()))
            runner.record_event(
                "cc_driver_union_find",
                {"edges": int(edge_rows), "labels": len(pairs)})
            return spark.createDataFrame(
                pd.DataFrame(pairs, columns=["entity", "canonical"]),
                schema="entity string, canonical string")
        return canonical_mapping(
            edges,
            max_iter=config.cc_max_iter,
            on_iteration=lambda it, changed: runner.record_event(
                "cc_iteration", {"iteration": it, "labels_changed": changed}
            ),
        )

    mapping = runner.run("canonical_mapping", mapping_fp, build_mapping)
    # manifest already holds the mapping's row count — reuse it for the
    # conditional-broadcast decision instead of a probe job
    mapping_rows = runner.stage_rows("canonical_mapping", mapping_fp)

    triples_fp = fingerprint("triples", mentions_fp, media_fp, mapping_fp)

    def build_triples() -> DataFrame:
        # category-wise assembly: rewrite-then-dedup per disjoint predicate
        # group — equals the old global dropDuplicates with ~4-8× fewer
        # shuffled bytes (see assemble_canonical_triples)
        canon = assemble_canonical_triples(mentions, media, mapping,
                                           mapping_rows=mapping_rows)
        out = canon.withColumn(
            "subject_bucket",
            F.pmod(F.xxhash64("s"), F.lit(config.n_subject_buckets)).cast("int"),
        )
        # cluster rows by bucket before partitionBy: without this every task
        # writes into every bucket dir (tasks × buckets small files).
        # RANGE partitioning on (bucket, s) instead of hash-on-bucket: with
        # only n_buckets distinct values, hash placement collides (birthday)
        # and the biggest write task carried ~3× the rows of the smallest
        # (event-log measured); the range sampler balances row counts while
        # keeping each task inside one bucket (a boundary task may straddle
        # two → at most one extra file per boundary).
        #
        # lazy localCheckpoint first (r9): repartitionByRange SAMPLES its
        # child to pick range bounds, which executed the whole assembly
        # subtree a second time before the write — checkpointed, the
        # sampler and the write share one materialization (guide §1.2)
        out = out.localCheckpoint(eager=False)
        out = out.repartitionByRange(
            config.output_partitions or config.n_subject_buckets,
            "subject_bucket", "s",
        )
        return out

    extra = None
    if config.collect_extra_metrics:
        # ONE multi-aggregate job, not one full-table job per metric
        def extra(df: DataFrame) -> dict:
            row = df.agg(
                F.countDistinct("s").alias("distinct_subjects"),
                F.countDistinct("g").alias("graphs"),
            ).collect()[0]
            return {"distinct_subjects": row["distinct_subjects"],
                    "graphs": row["graphs"]}

    return runner.run(
        "triples", triples_fp, build_triples,
        partition_by=["subject_bucket"],
        extra_metrics=extra,
    )


# ---------------------------------------------------------------------------
# fused mode: one Spark job end-to-end (throughput path)
# ---------------------------------------------------------------------------

# shared with canonicalize.py (moved there r9 so dedup's CC can reuse the
# same crossover); re-exported here for existing importers
from .canonicalize import (  # noqa: E402
    DRIVER_UNION_FIND_MAX_EDGES,
    _driver_union_find,
)


def run_pipeline_fused(
    spark: SparkSession,
    out_dir: str,
    config: KGPipelineConfig = KGPipelineConfig(),
    documents: Optional[DataFrame] = None,
) -> DataFrame:
    """Same logical pipeline as :func:`run_pipeline` but fused into one
    lazy DAG with a single partitioned write: mentions are persisted in
    memory (consumed by both the edge derivation and the triple build), the
    canonical mapping is computed with driver union-find when the edge set
    is small (broadcast back as a mapping table), and no intermediate
    parquet checkpoints are written.

    ``documents`` supplies an external corpus (same shape as
    :func:`~pyrml_spark.kg.datagen.generate_documents`: BASELINE.json's
    input_hint) — omitted, the synthetic corpus is generated. No
    ``input_tag`` parameter: fused mode keeps no checkpoints, so there is
    no resume identity to name.

    Use for throughput benching / one-shot runs; use :func:`run_pipeline`
    when stage-level resumability and lineage are required. Results are
    identical (tests assert it)."""

    if documents is None:
        docs = generate_documents(spark, config.n_docs,
                                  partitions=config.gen_partitions).persist()
    else:
        docs = documents.persist()
    extractor = mentions_pandas if config.use_pandas_extractor else mentions_native
    mentions = extractor(docs).persist()
    edges = sameas_candidates(mentions).persist()
    # size gate BEFORE any collect: a count() proves the set fits (or
    # doesn't) without ever shipping an over-threshold edge list to the
    # driver — collecting first would be the OOM itself at real scale.
    # (A plain count, not limit(N+1).count(): CollectLimit's incremental
    # partition scans bypass and partially populate the persist cache.)
    probe = edges.count()
    if probe <= DRIVER_UNION_FIND_MAX_EDGES:
        import pandas as pd

        # Arrow both ways: .collect()'s per-Row materialization and
        # createDataFrame-from-tuples' per-row pickling are driver-serial
        # costs that Amdahl straight off the scaling efficiency; toPandas /
        # from-pandas move the same data as Arrow record batches.
        epdf = edges.toPandas()
        pairs = _driver_union_find(
            zip(epdf["src"].tolist(), epdf["dst"].tolist()))
        mapping = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["entity", "canonical"]))
        mapping_rows = len(pairs)
    else:  # pragma: no cover - exercised only at true scale
        # Persist the CC fixpoint result BEFORE anything consumes it:
        # unpersisted, maybe_broadcast's size probe would re-run the whole
        # iterative fixpoint once, and the two rewrite joins (s-side and
        # o-side) would run it again each. The count over the persisted
        # table doubles as the broadcast row hint, so no probe job either.
        mapping = canonical_mapping(
            edges, max_iter=config.cc_max_iter).persist()
        mapping_rows = mapping.count()
    canon = assemble_canonical_triples(mentions, media_spans(docs), mapping,
                                       mapping_rows=mapping_rows)
    out = canon.withColumn(
        "subject_bucket",
        F.pmod(F.xxhash64("s"), F.lit(config.n_subject_buckets)).cast("int"),
    )
    if config.final_repartition:
        # range-partitioned for balanced writer tasks (see run_pipeline);
        # lazy checkpoint so the range sampler and the write share one
        # materialization of the assembly
        out = out.localCheckpoint(eager=False)
        out = out.repartitionByRange(
            config.output_partitions or config.n_subject_buckets,
            "subject_bucket", "s")
    out.write.mode("overwrite").partitionBy("subject_bucket").parquet(out_dir)
    edges.unpersist()
    mentions.unpersist()
    docs.unpersist()
    if mapping.is_cached:  # at-scale distributed-CC branch persisted it
        mapping.unpersist()
    return spark.read.parquet(out_dir)
