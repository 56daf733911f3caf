"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: referencing-object-map join mapping compiled to
a broadcast-join DataFrame plan over sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (RML term maps, joins, conditions, function maps, quads) plus
the training-data-pipeline operators (dedup, similarity, text analysis) and
the north-rule KG pipeline. DuckDB oracles emit byte-identical rows; ops
without a SQL-expressible oracle are rows-only by design (minhash/simhash
banding, iterative connected components).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyrml_spark.testdata_rml import q_orders_customer_join

    return q_orders_customer_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    from pyrml_spark.testdata_rml import RML_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RML_QUERIES)
    try:
        from pyrml_spark.ops import OPS_QUERIES

        out.update(OPS_QUERIES)
    except ImportError:
        pass
    try:
        from pyrml_spark.kg.entry import KG_QUERIES

        out.update(KG_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only check)."""
    from pyrml_spark.testdata_rml import RML_ORACLES

    out: dict[str, str] = {}
    out.update(RML_ORACLES)
    try:
        from pyrml_spark.ops import OPS_ORACLES

        out.update(OPS_ORACLES)
    except ImportError:
        pass
    try:
        from pyrml_spark.kg.entry import KG_ORACLES

        out.update(KG_ORACLES)
    except ImportError:
        pass
    return out
