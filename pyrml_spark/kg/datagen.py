"""Deterministic interleaved-documents generator (BASELINE.json input_hint):

    doc_id: string, spans: array<struct<kind:string, text:string,
                                        media_ref:string, offset:int>>

Synthesized fully JVM-side from ``spark.range`` + hash recurrences — no
Python in the row path, no RNG (xxhash64-derived content, reproducible at any
scale and parallelism). Text spans carry entity mentions ``PERSON:<name>`` /
``PLACE:<code>`` (FIXTURES.md §1); a deterministic fraction of person
surfaces are alias forms (``P12_aka``, ``P12_aka2``) whose sameAs candidate
links drive the canonicalization stage (multi-hop components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_PERSONS = 500
N_PLACES = 120
MIN_SPANS = 3
MAX_SPANS = 8


def _h_xxhash(*cols) -> Column:
    return F.xxhash64(*cols)


def _h_md5(*cols) -> Column:
    """60-bit hash from md5 over ':'-joined args — identical in DuckDB as
    CAST('0x' || substr(md5(concat_ws(':', ...)), 1, 15) AS BIGINT), which
    lets the driver oracle regenerate the corpus independently."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", *[c.cast("string") if isinstance(c, Column)
                                     else F.lit(str(c)) for c in cols])),
            1, 15),
        16, 10,
    ).cast("long")


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    n_persons: int = N_PERSONS,
    n_places: int = N_PLACES,
    partitions: int = 0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """n_docs rows of (doc_id, spans). Deterministic in content AND in
    row→value mapping (independent of partitioning), so the same call at
    local[8] and local[32] produces the identical table.

    ``hash_family='md5'`` derives all content from md5 instead of xxhash64 —
    slower, but reproducible in any SQL engine: the driver's DuckDB oracle
    regenerates the exact corpus and checks the whole KG chain byte-for-byte
    (xxhash64 stays the default for benches; structure is identical)."""
    _h = _h_md5 if hash_family == "md5" else _h_xxhash
    rng = spark.range(n_docs)
    if partitions:
        rng = rng.repartition(partitions, "id")
    doc = F.col("id")
    n_spans = (F.pmod(_h(doc, F.lit("nspans")), F.lit(MAX_SPANS - MIN_SPANS + 1))
               + MIN_SPANS)

    def span(i: Column) -> Column:
        kind_sel = F.pmod(_h(doc, i, F.lit("kind")), F.lit(5))
        kind = (
            F.when(kind_sel < 3, F.lit("text"))
            .when(kind_sel == 3, F.lit("image"))
            .otherwise(F.lit("audio"))
        )
        person_id = F.pmod(_h(doc, i, F.lit("person")), F.lit(n_persons))
        alias_sel = F.pmod(_h(doc, i, F.lit("alias")), F.lit(6))
        surface = (
            F.when(alias_sel == 0,
                   F.format_string("P%d_aka", person_id))
            .when(alias_sel == 1,
                  F.format_string("P%d_aka2", person_id))
            .otherwise(F.format_string("P%d", person_id))
        )
        place_id = F.pmod(_h(doc, i, F.lit("place")), F.lit(n_places))
        filler = F.pmod(_h(doc, i, F.lit("filler")), F.lit(1000))
        text = F.format_string(
            "report %d notes that PERSON:%s was seen at PLACE:L%d today",
            filler, surface, place_id,
        )
        media_ref = F.format_string("media://doc-%08d/%d", doc, i)
        offset = (i * 64 + F.pmod(_h(doc, i, F.lit("off")), F.lit(50))).cast("int")
        return F.struct(
            kind.alias("kind"),
            F.when(kind == "text", text).alias("text"),
            F.when(kind != "text", media_ref).alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return rng.select(
        F.format_string("doc-%08d", doc).alias("doc_id"),
        spans.alias("spans"),
    )
