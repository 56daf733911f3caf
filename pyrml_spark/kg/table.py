"""Partitioned (s,p,o,g) triples-table sink — the north rule's "materialized
graph written as partitioned (subj, pred, obj, graph) Iceberg tables".

Two paths behind one function:

* **Iceberg catalog path** (``DataFrameWriterV2``): when the session has an
  Iceberg catalog configured (``spark.sql.catalog.<name>`` — the public
  ``org.apache.iceberg.spark.SparkCatalog`` setup) and ``target`` is a
  catalog table name, the write goes through ``df.writeTo(target)
  .using("iceberg").partitionedBy(bucket(n, col("s")))`` — hidden-partition
  bucketing on the subject, so point lookups and subject-keyed joins prune
  files without a user-visible bucket column.
* **Path fallback** (this sandbox — no Iceberg runtime jar is installed):
  the SAME layout as an explicit column — ``subject_bucket =
  pmod(xxhash64(s), n)`` — written as ``partitionBy("subject_bucket")``
  parquet, rows repartitioned by bucket first so each bucket gets one
  writer task (an unaligned partitionBy forks tasks×buckets small files
  whose commit is driver-serial).

Both paths cluster by a deterministic subject hash, which is what the
100 TB design needs: downstream per-subject reads touch 1/n of the files,
and re-runs co-locate with previous output for merge/upsert patterns.

Reference: the rdflib ``Dataset.serialize`` sink (pyrml_mapper.py:137-140)
has no table concept at all — this module is new design per SURVEY.md §2.1
S8 / §7 step 7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32

TRIPLE_COLS = ("s", "p", "o", "g")


def iceberg_catalogs(spark: SparkSession) -> list:
    """Names of Iceberg catalogs configured on this session (public conf
    surface: ``spark.sql.catalog.<name> = org.apache.iceberg...``).

    Enumerated from the runtime SQL conf (``SET`` over the session state) —
    not ``sparkContext.getConf()``, which misses catalogs registered after
    session start via ``spark.conf.set`` and does not exist under Spark
    Connect (ADVICE r3)."""
    out = []
    for row in spark.sql("SET").collect():
        k, v = row["key"], (row["value"] or "")
        parts = k.split(".")
        if (len(parts) == 4 and parts[:3] == ["spark", "sql", "catalog"]
                and "iceberg" in v.lower()):
            out.append(parts[3])
    return out


def subject_bucket(n_buckets: int = DEFAULT_BUCKETS):
    """The fallback path's explicit bucket column (deterministic, matches
    re-runs; Iceberg's hidden ``bucket(n, s)`` transform plays this role on
    the catalog path)."""
    return F.pmod(F.xxhash64("s"), F.lit(n_buckets)).cast("int")


def write_triples_table(
    df: DataFrame,
    target: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
    fmt: str | None = None,
) -> None:
    """Write a (s,p,o,g) DataFrame as a subject-bucketed partitioned table.

    ``target``: an Iceberg catalog table name (``catalog.db.tbl``) or a
    filesystem path. ``fmt``: ``"iceberg"``, ``"parquet"``, or None =
    auto — iceberg iff the session has an Iceberg catalog AND ``target``
    names a table in it (no silent downgrade: asking for iceberg without a
    catalog raises).
    """
    missing = [c for c in TRIPLE_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"triples table needs columns {TRIPLE_COLS}; "
                         f"missing {missing}")
    if fmt is None:
        cats = iceberg_catalogs(df.sparkSession)
        fmt = "iceberg" if cats and target.split(".")[0] in cats else "parquet"

    if fmt == "iceberg":
        if not iceberg_catalogs(df.sparkSession):
            raise RuntimeError(
                "fmt='iceberg' but no Iceberg catalog is configured "
                "(spark.sql.catalog.<name>); refusing to downgrade silently")
        writer = (df.select(*TRIPLE_COLS)
                  .writeTo(target)
                  .using("iceberg")
                  .partitionedBy(F.bucket(n_buckets, F.col("s"))))
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported mode {mode!r} for iceberg")
        return

    out = (df.select(*TRIPLE_COLS)
           .withColumn("subject_bucket", subject_bucket(n_buckets))
           .repartition(n_buckets, "subject_bucket"))
    (out.write.mode(mode)
        .partitionBy("subject_bucket")
        .parquet(target))


def read_triples_table(spark: SparkSession, target: str,
                       fmt: str | None = None) -> DataFrame:
    """Read back a triples table written by :func:`write_triples_table`
    (either path), normalized to (s,p,o,g).

    ``fmt`` mirrors the writer: ``"iceberg"`` forces ``spark.read.table``,
    ``"parquet"`` forces a path read, None = auto. Auto treats ``target``
    as a catalog table ONLY when its first dotted segment names a
    configured Iceberg catalog — a relative path like ``out.parquet`` must
    never be routed to the catalog reader (ADVICE r3: it failed with a
    confusing TABLE_OR_VIEW_NOT_FOUND)."""
    if fmt is None:
        first = target.split(".", 1)[0]
        is_table = ("/" not in target and "." in target
                    and first in iceberg_catalogs(spark))
        fmt = "iceberg" if is_table else "parquet"
    df = (spark.read.table(target) if fmt == "iceberg"
          else spark.read.parquet(target))
    return df.select(*TRIPLE_COLS)


def subject_lookup(spark: SparkSession, target: str, subject: str,
                   n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Point lookup demonstrating partition pruning on the fallback layout:
    the bucket predicate prunes to 1/n of the files before the subject
    filter runs (Iceberg's hidden partitioning does this automatically)."""
    df = spark.read.parquet(target)
    if "subject_bucket" in df.columns:
        df = df.filter(
            F.col("subject_bucket")
            == F.pmod(F.xxhash64(F.lit(subject)), F.lit(n_buckets)).cast("int"))
    return df.filter(F.col("s") == subject).select(*TRIPLE_COLS)
