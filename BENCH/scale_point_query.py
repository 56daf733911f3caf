#!/usr/bin/env python
"""Query-surface scale point (VERDICT r7 #4): the r7 artifact measured
CONSTRUCTION at 100k vs 1M docs; this measures the QUERY path against
the materialized sinks those scales produce (1.1M vs 11M triples).

Claim under test: the access path is predicate-pruned — a query's cost
follows the size of the predicates it touches, so latency grows at most
linearly with graph size (stage-constant overheads amortize, the pruned
scans and shuffles are the only 10x terms) and the 10x graph costs well
under 10x latency at this scale, where per-query constant overhead
(planning, stage launch, small-side broadcasts) still dominates.

Method: build the fused-pipeline sink once per scale (subject-bucketed
parquet triples table — the construct-once/query-many layout), compute
the predicate histogram once per sink (the engine's _sink_stats
behavior), then run each query `--reps` times per scale, interleaved
across scales so a contended window cannot hit one scale back-to-back.
Queries are forced end-to-end with the noop sink. The in-leg bandwidth
sampler runs throughout (same instrument as bench.py) so every leg is
classifiable as calm or contended from the artifact alone.

Queries:
  * twohop — kg_query on TWOHOP_PATTERNS (rare-predicate-first greedy
    join order from the real histogram; the driver row kg_query_2hop)
  * sparql_media — sparql_select on SPARQL_MEDIA_QUERY (the driver row
    kg_sparql_query: 3-pattern star + pushed STRSTARTS/!= filters)

Usage:  python BENCH/scale_point_query.py [--small 100000] [--big 1000000]
Writes BENCH/scale_point_query_r8.json and prints a compact summary as
the final stdout line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import start_bw_sampler, stop_bw_sampler  # noqa: E402


def build_sink(spark, n_docs: int, shm: str | None) -> tuple[str, int, float]:
    """Fused-pipeline sink at n_docs; returns (path, triples, build_sec)."""
    from pyrml_spark.kg.pipeline import KGPipelineConfig, run_pipeline_fused

    d = tempfile.mkdtemp(prefix=f"kg_qscale_{n_docs}_", dir=shm)
    t0 = time.time()
    out = run_pipeline_fused(
        spark, d + "/out",
        KGPipelineConfig(n_docs=n_docs, use_pandas_extractor=False,
                         gen_partitions=64, final_repartition=True))
    n = out.count()
    return d + "/out", n, round(time.time() - t0, 2)


def load(spark, path):
    from pyrml_spark.kg.query import predicate_stats
    from pyrml_spark.kg.table import read_triples_table

    df = read_triples_table(spark, path, fmt="parquet").select("s", "p", "o")
    return df, predicate_stats(df)


def q_twohop(df, stats):
    from pyrml_spark.kg.analytics import TWOHOP_PATTERNS, TWOHOP_SELECT
    from pyrml_spark.kg.query import kg_query

    return kg_query(df, TWOHOP_PATTERNS, select=TWOHOP_SELECT, stats=stats)


def q_sparql_media(df, stats):
    from pyrml_spark.kg.analytics import SPARQL_MEDIA_QUERY
    from pyrml_spark.kg.sparql import sparql_select

    return sparql_select(df, SPARQL_MEDIA_QUERY, stats=stats)


QUERIES = {"twohop": q_twohop, "sparql_media": q_sparql_media}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=100_000)
    ap.add_argument("--big", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sizes = [args.small, args.big]

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .appName("kg_scale_point_query")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_BENCH_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    proc, path = start_bw_sampler(period=12.0)
    try:
        sinks = {}
        builds = {}
        for n in sizes:
            p, triples, sec = build_sink(spark, n, shm)
            sinks[n] = load(spark, p)
            builds[n] = {"triples": triples, "build_sec": sec}
            print(f"sink {n}: {builds[n]}", file=sys.stderr)
        # discarded warm-up: first execution of each query shape eats
        # codegen/stage-planning; warm on the small sink
        for name, fn in QUERIES.items():
            force(fn(*sinks[sizes[0]]))
        runs = []
        for _rep in range(args.reps):
            for name, fn in QUERIES.items():
                for n in sizes:
                    df, stats = sinks[n]
                    t0 = time.time()
                    force(fn(df, stats))
                    dt = time.time() - t0
                    r = {"query": name, "n_docs": n,
                         "triples": builds[n]["triples"],
                         "sec": round(dt, 3),
                         "triples_per_sec": round(
                             builds[n]["triples"] / dt, 1),
                         "t_end": round(time.time(), 2)}
                    runs.append(r)
                    print("leg:", json.dumps(r), file=sys.stderr)
    finally:
        bw = stop_bw_sampler(proc, path)

    best = {}
    for r in runs:
        k = (r["query"], r["n_docs"])
        if k not in best or r["sec"] < best[k]["sec"]:
            best[k] = r
    data_ratio = (builds[args.big]["triples"]
                  / builds[args.small]["triples"])
    result = {
        "metric": "query latency vs graph size (10x scale point)",
        "builds": {str(n): b for n, b in builds.items()},
        "data_ratio": round(data_ratio, 3),
        "runs": runs,
        "best": {f"{q}_{n}": v for (q, n), v in best.items()},
        "latency_ratio": {
            q: round(best[(q, args.big)]["sec"]
                     / best[(q, args.small)]["sec"], 3)
            for q in QUERIES},
        **bw,
    }
    out_path = os.path.join(REPO, "BENCH", "scale_point_query_r8.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("bw_samples", "runs")}))


if __name__ == "__main__":
    main()
