"""Event sessionization over the `events` stream table — gap-based sessions
via window functions (lag → gap flag → running sum). One shuffle on user_id;
the standard clickstream/session shape a training-data pipeline uses for
behavioral corpora."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..scan import read_parquet_parallel

GAP_MINUTES = 30


def events_sessionize(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = GAP_MINUTES) -> DataFrame:
    ev = read_parquet_parallel(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        (F.unix_timestamp("ts")
         - F.unix_timestamp(F.lag("ts").over(w))) > gap_minutes * 60,
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("new_sess", F.coalesce(gap, F.lit(0)))
        .withColumn("session_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    # sum as decimal(38,9): double addition is order-sensitive and Spark's
    # partition order differs from the oracle's scan order — the last rounded
    # digit flipped on some groups (round-1 red row). Fixed-point addition is
    # exact/commutative, so the aggregate is partition-order independent; the
    # oracle mirrors the cast (double→VARCHAR→DECIMAL matches Spark's
    # double→decimal string-roundtrip semantics).
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 6)
            .cast("double").alias("total_value"),
        )
    )


ORACLE_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- CAST to BIGINT: DuckDB's windowed sum over integers yields HUGEINT,
  -- which the pandas bridge materializes as float64 ("7.0"), breaking the
  -- driver's stringified row hash against Spark's bigint "7" even though
  -- the values are bit-identical (round-2 red row).
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id,
       count(*) AS n_events,
       CAST(round(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,9))), 6)
            AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_id
"""
