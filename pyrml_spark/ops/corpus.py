"""Corpus-level curation operators: per-domain caps, URL dedup, vocabulary
counts, and C4-style boilerplate removal.

Web-scale training pipelines (C4, RefinedWeb, FineWeb, Dolma) all run a
corpus-shaping pass between raw crawl and tokenization:

* **per-domain caps** — no single site may dominate the mixture, so each
  domain keeps at most K documents, chosen deterministically;
* **URL dedup** — the same page crawled under `http://`, `https://`,
  `www.`, tracking-parameter and fragment variants must collapse to one
  canonical URL before content dedup even starts;
* **vocabulary / n-gram counts** — top-k corpus n-grams feed tokenizer
  training (BPE seeding) and contamination reports;
* **boilerplate-chunk removal** — text chunks repeated across many
  documents (navigation, cookie banners, subscribe prompts) are deleted
  from every document that contains them (the C4 "three-sentence dedup").

Each op is a `queries()` entry with a DuckDB oracle that re-derives the
exact rows (value-hash verified by the driver). Where the synthetic corpus
lacks the raw signal (URLs, injected boilerplate) the query materializes a
deterministic derived input in-plan and the oracle performs the identical
derivation — the same pattern as `text_pii_redact`'s synthetic PII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..scan import read_parquet_parallel

# ---------------------------------------------------------------------------
# Per-domain document cap
# ---------------------------------------------------------------------------

CAP_PER_SOURCE = 10
_SALT_SUBS = 32  # phase-1 salt fan-out for hot groups


def _salted_topk(df: DataFrame, part_cols: list, order_cols: list, k: int,
                 salt_on: str, rank_name: str) -> DataFrame:
    """Exact per-group top-k as two bounded window phases: phase 1 ranks
    inside (part_cols, 32-way hash salt of ``salt_on``) and keeps ≤ k rows
    per slice — no reducer ever sees a whole hot group — phase 2 ranks the
    ≤ 32·k survivors per group exactly. Both phases use the same total
    order, so the global top-k is exact (same argument as
    `similarity._two_phase_topk`, which is the struct-aggregate variant of
    this shape for non-window pipelines)."""
    sub = F.pmod(F.xxhash64(salt_on), F.lit(_SALT_SUBS))
    w1 = Window.partitionBy(*part_cols, "sub").orderBy(*order_cols)
    survivors = (
        df.withColumn("sub", sub)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("sub", "_rn1")
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_name, F.row_number().over(w2).cast("int"))
        .filter(F.col(rank_name) <= k)
    )


def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most ``CAP_PER_SOURCE`` documents per source/domain,
    deterministically (the K smallest ``md5(doc_id)`` win — stable across
    runs, partitionings and cluster layouts, unlike ``df.sample``).

    Skew is the whole problem at 100 TB: one hot domain can hold 1e9 rows,
    and a single ``row_number() OVER (PARTITION BY source)`` window funnels
    all of them through ONE reduce task. Phase 1 therefore salts the window
    with a 32-way sub-bucket on doc_id — each (source, sub) reducer ranks
    only its slice and keeps at most K rows, so at most 32·K rows per
    domain reach phase 2, whose exact global window is then trivial. Same
    two-phase shape as the ANN top-k (`similarity._two_phase_topk`);
    both shuffles are bounded, neither depends on domain cardinality.

    Plain read, NOT the scan-parallelism floor: the pre-window work is one
    md5 per row and phase 1 shuffles by (source, sub) immediately — the
    floor's rebalance added a whole extra exchange for no parallel win
    (measured ~2x on this op at 50k docs).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranked = docs.select(
        "doc_id", "source",
        F.md5(F.col("doc_id").cast("string")).alias("rank_key"),
    )
    return _salted_topk(
        ranked, ["source"], ["rank_key"], CAP_PER_SOURCE,
        salt_on="doc_id", rank_name="cap_rank",
    ).select("doc_id", "source", "cap_rank")


ORACLE_CAP_PER_SOURCE = f"""
SELECT doc_id, source, CAST(cap_rank AS INT) AS cap_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR))
         ) AS cap_rank
  FROM documents
)
WHERE cap_rank <= {CAP_PER_SOURCE}
"""


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

# Canonicalization regexes valid in BOTH Java regex (Spark) and RE2 (the
# DuckDB oracle): no lookarounds, no backrefs in the PATTERN (the tracking
# replacement re-emits its boundary capture — "$1" in Java, "\1" in RE2).
# The [?&] boundary keeps `ref=` from matching inside other parameter
# names (`href=...` must survive canonicalization untouched).
_URL_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
_URL_FRAGMENT_RE = r"#.*$"
_URL_TRACKING_RE = r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"
_URL_QRUN_RE = r"\?[?&]+"  # boundary runs left by stripped leading params
_URL_ARUN_RE = r"&&+"      # boundary runs left by stripped middle params
_URL_DANGLING_RE = r"[?&]+$"
_URL_WWW_RE = r"^www\."
_URL_SLASH_RE = r"/+$"


def _synthetic_url(did: F.Column, source: F.Column) -> F.Column:
    """Deterministic URL for a document, with scheme-case / www / tracking /
    fragment / trailing-slash variation so canonicalization has real work:
    docs that share (source, doc_id % 40) collapse to the same canonical
    URL through five different surface forms."""
    scheme = F.when(did % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTP://"))
    www = F.when(did % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/item-"), (did % 40).cast("string"))
    slash = F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(did % 2 == 0, F.lit("?utm_source=feed&utm_medium=rss"))
        .when(did % 3 == 1, F.lit("?ref=homepage"))
        .otherwise(F.lit(""))
    )
    frag = F.when(did % 4 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(
        scheme, www, source, F.lit(".example.com"), path, slash, query, frag
    )


def canonical_url(url: F.Column) -> F.Column:
    """Canonical form of a URL column: scheme stripped, lower-cased,
    fragment dropped, tracking parameters (utm_*/fbclid/gclid/ref) removed,
    dangling ``?``/``&`` cleaned, leading ``www.`` and trailing slashes
    stripped. Pure narrow map — five JVM-side regexp_replace calls."""
    u = F.lower(F.regexp_replace(url, _URL_SCHEME_RE, ""))
    u = F.regexp_replace(u, _URL_FRAGMENT_RE, "")
    u = F.regexp_replace(u, _URL_TRACKING_RE, "$1")
    u = F.regexp_replace(u, _URL_QRUN_RE, "?")
    u = F.regexp_replace(u, _URL_ARUN_RE, "&")
    u = F.regexp_replace(u, _URL_DANGLING_RE, "")
    u = F.regexp_replace(u, _URL_WWW_RE, "")
    return F.regexp_replace(u, _URL_SLASH_RE, "")


def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: canonicalize every document's URL, then keep one
    winner (min doc_id) per canonical URL — the cheapest dedup pass a crawl
    pipeline runs, upstream of any content hashing.

    The canonicalization is a narrow map; the dedup is ONE map-side-
    combinable shuffle keyed on the canonical URL (min/count partial
    aggregates), identical in shape to `dedup_exact` — at 100 TB the
    shuffle carries one slim row per URL variant, never the document
    bodies.

    Plain read, NOT the scan-parallelism floor: the only pre-shuffle work
    is a handful of cheap string ops per row, and the groupBy's map-side
    partial aggregation reduces on the scan partitions anyway — the
    floor's round-robin rebalance would shuffle the full rows once more
    for no parallel win (measured ~+0.5 s at 50k docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_url = docs.select(
        "doc_id",
        _synthetic_url(F.col("doc_id"), F.col("source")).alias("url"),
    )
    return (
        with_url.select("doc_id", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_variants"),
        )
    )


ORACLE_DEDUP_URL = f"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END
         || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || source || '.example.com'
         || '/articles/item-' || CAST(doc_id % 40 AS VARCHAR)
         || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_medium=rss'
                 WHEN doc_id % 3 = 1 THEN '?ref=homepage'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END AS url
  FROM documents
),
c AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       lower(regexp_replace(url, '{_URL_SCHEME_RE}', '')),
                       '{_URL_FRAGMENT_RE}', ''),
                     '{_URL_TRACKING_RE}', '\\1', 'g'),
                   '{_URL_QRUN_RE}', '?'),
                 '{_URL_ARUN_RE}', '&', 'g'),
               '{_URL_DANGLING_RE}', ''),
             '{_URL_WWW_RE}', ''),
           '{_URL_SLASH_RE}', '') AS canonical_url
  FROM u
)
SELECT canonical_url, min(doc_id) AS keep_doc_id, count(*) AS n_variants
FROM c GROUP BY canonical_url
"""


# ---------------------------------------------------------------------------
# Corpus n-gram vocabulary counts (top-k bigrams)
# ---------------------------------------------------------------------------

NGRAM_TOP_K = 100


def corpus_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-``NGRAM_TOP_K`` bigrams with occurrence counts —
    the vocabulary-statistics pass that seeds tokenizer training and
    contamination reports.

    Three bounded stages: (1) bigram explode + count — ONE shuffle keyed
    on the bigram, partial-aggregated map-side so each distinct bigram
    crosses the wire once per map partition; (2) phase-1 top-k inside each
    of 32 hash sub-buckets of the counted table (row_number windows over
    disjoint slices — no single reducer sees the whole vocabulary);
    (3) exact global rank over the ≤ 32·k survivors. Total order is
    (count DESC, ngram ASC) at every phase, so the global top-k is exact
    — same argument as `similarity._two_phase_topk`."""
    docs = read_parquet_parallel(spark, f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), r"\s+")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counted = (
        docs.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return _salted_topk(
        counted, [], [F.col("n_occurrences").desc(), F.col("ngram").asc()],
        NGRAM_TOP_K, salt_on="ngram", rank_name="ngram_rank",
    ).select("ngram", "n_occurrences", "ngram_rank")


ORACLE_NGRAM_COUNTS = f"""
WITH t AS (
  SELECT string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
g AS (
  SELECT toks[CAST(s.i AS INT)] || ' ' || toks[CAST(s.i AS INT) + 1] AS ngram
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS s(i)
),
c AS (
  SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY ngram
)
SELECT ngram, n_occurrences, CAST(ngram_rank AS INT) AS ngram_rank
FROM (
  SELECT ngram, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, ngram) AS ngram_rank
  FROM c
)
WHERE ngram_rank <= {NGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# C4-style boilerplate-chunk removal
# ---------------------------------------------------------------------------

CHUNK_WORDS = 12     # chunk granularity (C4 uses three-sentence spans)
BOILERPLATE_MIN_DOCS = 5  # a chunk in >= this many docs is boilerplate

# Exactly CHUNK_WORDS words each, so injected prefixes stay chunk-aligned
# in every combination (12 and 24 prepended words are whole chunks).
_BOILER_1 = ("subscribe to our newsletter for weekly updates "
             "and never miss a story")
_BOILER_2 = ("accept all cookies now to continue reading this site "
             "uses tracking technology")
assert len(_BOILER_1.split()) == CHUNK_WORDS
assert len(_BOILER_2.split()) == CHUNK_WORDS


def _with_boilerplate(docs: DataFrame) -> DataFrame:
    """Prepend deterministic boilerplate (the synthetic corpus has none):
    a subscribe prompt on doc_id%3==0 and a cookie banner on doc_id%5==0.
    Both are exactly CHUNK_WORDS words, so chunk boundaries stay aligned
    and the injected chunks repeat verbatim across documents."""
    did = F.col("doc_id")
    b1 = F.when(did % 3 == 0, F.lit(_BOILER_1 + " ")).otherwise(F.lit(""))
    b2 = F.when(did % 5 == 0, F.lit(_BOILER_2 + " ")).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(b1, b2, F.col("text")).alias("text"))


def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove text chunks that repeat across >= ``BOILERPLATE_MIN_DOCS``
    documents from EVERY document containing them — C4's cross-document
    span dedup (nav bars, cookie banners, subscribe prompts), at chunk
    granularity of ``CHUNK_WORDS`` words.

    Plan shape at 100 TB: chunking is a narrow map (fixed word windows via
    sequence + slice, all JVM-side); the chunk-frequency aggregate is one
    map-side-combinable shuffle keyed on the chunk hash; the boilerplate
    set is, by definition, small (<= corpus_chunks / MIN_DOCS distinct
    values, in practice a handful of templates) and is broadcast for a
    left_anti prune — same hot-set shape as `dedup.dedup_ngram_jaccard`'s
    hot-shingle broadcast. Reassembly sorts each document's surviving
    chunks by index inside an array (array_sort on (chunk_ix, chunk)
    structs — order restored without an extra sort shuffle beyond the
    groupBy)."""
    docs = _with_boilerplate(
        read_parquet_parallel(spark, f"{sf_dir}/documents.parquet"))
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / CHUNK_WORDS).cast("int")
    chunk_at = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i * CHUNK_WORDS + 1, CHUNK_WORDS), " ")
    chunks = F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk_at)
    exploded = docs.select(
        "doc_id", n_chunks.alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_ix", "chunk"),
    )
    hot = (
        exploded.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .select("chunk")
    )
    kept = exploded.join(F.broadcast(hot), "chunk", "left_anti")
    reassembled = (
        kept.groupBy("doc_id")
        .agg(
            F.first("n_chunks").alias("n_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("chunk_ix", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    return reassembled.select(
        "doc_id", "n_chunks",
        (F.col("n_chunks") - F.col("n_kept")).cast("int").alias("n_removed"),
        "clean_text",
    )


ORACLE_BOILERPLATE = f"""
WITH enriched AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{_BOILER_1} ' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '{_BOILER_2} ' ELSE '' END
         || text AS text
  FROM documents
),
tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM enriched
),
ch AS (
  SELECT doc_id, CAST(s.i AS INT) AS chunk_ix,
         array_to_string(
           toks[(CAST(s.i AS INT) * {CHUNK_WORDS} + 1):
                (CAST(s.i AS INT) * {CHUNK_WORDS} + {CHUNK_WORDS})],
           ' ') AS chunk
  FROM tk,
       unnest(generate_series(
         0, CAST(ceil(len(toks) / {CHUNK_WORDS}.0) AS INT) - 1)) AS s(i)
),
tot AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_chunks FROM ch GROUP BY doc_id
),
hot AS (
  SELECT chunk FROM ch GROUP BY chunk
  HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
),
kept AS (
  SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM hot)
)
SELECT k.doc_id, t.n_chunks,
       CAST(t.n_chunks - count(*) AS INT) AS n_removed,
       string_agg(k.chunk, ' ' ORDER BY k.chunk_ix) AS clean_text
FROM kept k JOIN tot t USING (doc_id)
GROUP BY k.doc_id, t.n_chunks
"""
