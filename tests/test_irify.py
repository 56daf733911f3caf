"""PyRML.IRIFY-equivalent slug path (T4, pyrml_api.py:500-538)."""

from pyspark.sql import functions as F

from pyrml_spark.terms import irify_full


def vals(spark, col, rows):
    df = spark.createDataFrame([(r,) for r in rows], ["v"])
    return [r["o"] for r in df.select(irify_full(F.col("v")).alias("o")).collect()]


def test_irify_slugs(spark):
    got = vals(spark, "v", [
        "Côte d'Azur (FR)",
        "A  B/C--D",
        "http://already.ok/path",
        "x<y>z",
    ])
    assert got[0] == "cote_dazur_fr"
    assert got[1] == "a_b_c_d"           # spaces/slash → _, -/_ runs collapsed
    assert got[2] == "http://already.ok/path"  # URL guard: untouched
    assert got[3] == "x%3Cy%3Ez"
