"""Replicates the driver's DuckDB-oracle comparison locally at sf0.001:
row count + column names + order-insensitive value equality, PLUS a
column-type compatibility gate the driver's hash is sensitive to.

The type gate exists because the driver hashes values type-sensitively:
DuckDB ``sum()`` silently widens BIGINT/INT to HUGEINT (and windowed sums
likewise), which hash-mismatches Spark's BIGINT even when every value is
identical — this bit round 2 (events_sessionize) and again round 5
(seq_pack / corpus_mixture / text_quality_classifier). Any oracle column
typed HUGEINT/UHUGEINT, or DECIMAL where Spark emits a non-decimal, now
fails HERE before it can go red in the driver artifact."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck_con():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.all_oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.all_queries()[name]
    sql = entry_mod.all_oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con()
    res = con.sql(sql)
    d_cols = res.columns
    d_types = [str(t).upper() for t in res.types]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)

    # Hash-compatibility type gate (see module docstring): the driver's
    # value hash distinguishes HUGEINT/DECIMAL from BIGINT/DOUBLE even when
    # the values are bit-identical.
    s_dtypes = dict(sdf.dtypes)
    for c, dt in zip(d_cols, d_types):
        assert "HUGEINT" not in dt, (
            f"{name}.{c}: oracle column is {dt} (DuckDB sum() widening?) — "
            f"CAST(... AS BIGINT) in the oracle SQL; Spark emits "
            f"{s_dtypes.get(c)}")
        if dt.startswith("DECIMAL") and not s_dtypes.get(c, "").startswith(
                "decimal"):
            raise AssertionError(
                f"{name}.{c}: oracle column is {dt} but Spark emits "
                f"{s_dtypes.get(c)} — cast the oracle column to match")
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    a = _rows_to_set(s_cols, s_rows)
    b = _rows_to_set(d_cols, d_rows)
    if a != b:
        only_a = [r for r in a if r not in set(b)][:5]
        only_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(f"value mismatch\nspark-only: {only_a}\nduck-only: {only_b}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["s", "p", "o", "g"]
