"""Similarity search over the `embeddings` table (array<float> column).

Baseline: brute-force cosine top-k — broadcast the (small) query set against
the corpus; the dot product runs JVM-side via zip_with/aggregate (no Python
in the row path). Scale path: LSH-bucketed ANN via random-hyperplane signs —
candidates meet only inside a hash bucket, turning the all-pairs cross join
into a bucket-local join (the 100 TB design; brute force stays as the
verifier/oracle at small scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 8       # vec_id < N_QUERIES are the query vectors
TOP_K = 5
SIM_DECIMALS = 6
HYPERPLANES = 12    # LSH bits


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_cosine_topk(spark: SparkSession, sf_dir: str,
                    n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k: query rows (vec_id < n_queries) × corpus.

    The query side is broadcast (tiny); ranking is a per-query window.
    Deterministic tie-break on neighbor_id."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("c_emb"))
    scored = (
        corpus.join(F.broadcast(queries),
                    F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("sim_raw", SIM_DECIMALS).alias("sim"))
    )


ORACLE_ANN_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS c_emb
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(q_emb, c_emb)
           / (sqrt(list_dot_product(q_emb, q_emb))
              * sqrt(list_dot_product(c_emb, c_emb))) AS sim_raw
  FROM q JOIN c ON neighbor_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(sim_raw, {SIM_DECIMALS}) AS sim
FROM ranked WHERE rank <= {TOP_K}
"""


NEARDUP_THRESHOLD = 0.4


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str,
                             threshold: float = NEARDUP_THRESHOLD) -> DataFrame:
    """All-pairs cosine near-duplicates above a threshold.

    Exact at test scale (self-join); the 100 TB path is
    :func:`ann_lsh_buckets` candidates + this as the verify stage.

    Norms are computed ONCE per vector before the pair join (an earlier
    version recomputed both norms inside every pair — 3× the expression work
    on n² pairs); per-pair cost is a single dot product."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    normed = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x.cast("double") / _norm(F.col("embedding")),
        ).alias("ne"),
    )
    a = normed.select(F.col("vec_id").alias("vec_a"), F.col("ne").alias("e_a"))
    b = normed.select(F.col("vec_id").alias("vec_b"), F.col("ne").alias("e_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(_dot(F.col("e_a"), F.col("e_b")),
                        SIM_DECIMALS).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


ORACLE_COSINE_NEARDUP = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb))
            * sqrt(list_dot_product(b.emb, b.emb))), {SIM_DECIMALS}) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb))
            * sqrt(list_dot_product(b.emb, b.emb))), {SIM_DECIMALS}) >= {NEARDUP_THRESHOLD}
"""


def _hyperplane(dim: int, h: int) -> list:
    """Deterministic pseudo-random hyperplane from a hash recurrence (no RNG
    at build time — reproducible across runs and engines)."""
    import hashlib
    vals = []
    for i in range(dim):
        digest = hashlib.sha256(f"hp:{h}:{i}".encode()).digest()
        x = int.from_bytes(digest[:8], "big")
        vals.append((x / 2**63) - 1.0)  # uniform-ish in [-1, 1)
    return vals


def ann_lsh_buckets(spark: SparkSession, sf_dir: str,
                    dim: int = 64) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing. Each vector gets a
    HYPERPLANES-bit signature; ANN joins happen within buckets. Output:
    (vec_id, bucket) — candidates = equal buckets. Rows-only check."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = [_hyperplane(dim, h) for h in range(HYPERPLANES)]
    bits = []
    for h, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        dp = _dot(F.col("embedding"), lit_plane)
        bits.append(F.when(dp >= 0, F.lit(1 << h)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket.bitwiseOR(b)
    return emb.select("vec_id", bucket.alias("bucket"))
