"""Session tuning defaults for the engine — one place for the knobs the
100 TB design cares about (AQE, skew join, shuffle sizing, Arrow)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Row-count ceiling for dimension-table broadcasts (canonical entity mapping,
# small ROM parents). ~4M short string pairs ≈ low hundreds of MB per
# executor — comfortably under a typical 4-8 GB executor heap; beyond it a
# forced broadcast OOMs every executor at once, which is exactly the failure
# mode at the north rule's 10^12-doc scale where the entity→canonical table
# holds billions of aliases.
BROADCAST_MAX_ROWS = 4_000_000


def maybe_broadcast(df: DataFrame, row_hint: int | None = None,
                    max_rows: int = BROADCAST_MAX_ROWS) -> DataFrame:
    """Broadcast ``df`` only when it is provably small.

    ``row_hint``: caller-known row count (e.g. from a checkpoint manifest or a
    driver-side build) — avoids any extra job. When absent, a bounded
    ``limit(max_rows+1).count()`` probe decides: CollectLimit early-exits, so
    the probe touches at most one extra row past the ceiling instead of
    scanning the full table. Above the ceiling the DataFrame is returned
    as-is, letting Catalyst pick a shuffle hash/sort-merge join — with AQE
    skew-split (and :func:`pyrml_spark.plans.salting.salted_join` for
    pathological celebrity keys) carrying the skewed probe side.
    """
    if row_hint is None:
        row_hint = df.limit(max_rows + 1).count()
    if row_hint <= max_rows:
        return F.broadcast(df)
    return df


def build_session(
    app_name: str = "pyrml_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if driver_memory:
        b = b.config("spark.driver.memory", driver_memory)
    return b.getOrCreate()
