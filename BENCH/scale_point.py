#!/usr/bin/env python
"""One committed 10x headline scale point (VERDICT r6 #5): the KG
pipeline at 1M docs vs the bench's standard 100k docs, same session
shape as bench.py (local[32], AQE, tmpfs work dir), in-leg
bandwidth-probed so the number is classifiable as calm or contended
from the artifact alone.

The scale story so far argued from plan shapes + 2M-doc 1v4-core
scaling legs; this grounds "survives 10x" in a measured point: fused
single-write mode and checkpointed/resumable mode both run at BOTH doc
counts, and the artifact records triples/s at each scale plus the
throughput ratio (a scale-robust pipeline holds its per-core
throughput as the input grows 10x — constant-factor work like session
startup, stage planning, and the vocabulary-sized collects amortize,
while the per-doc work is the same narrow maps + one bucket shuffle).

Usage:  python BENCH/scale_point.py [--small 100000] [--big 1000000]
Writes BENCH/scale_point_r7.json and prints it.
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

# bench.py's sampler variant: pinned to the LAST core (scaling.py's
# _sampler_core assumes a caged leg and underflows for leg_cpus=32 here)
from bench import start_bw_sampler, stop_bw_sampler  # noqa: E402


def run_once(spark, n_docs: int, fused: bool, shm: str | None) -> dict:
    from pyrml_spark.kg.pipeline import (KGPipelineConfig, run_pipeline,
                                         run_pipeline_fused)

    with tempfile.TemporaryDirectory(prefix="kg_scale_", dir=shm) as d:
        t0 = time.time()
        if fused:
            out = run_pipeline_fused(
                spark, d + "/out",
                KGPipelineConfig(n_docs=n_docs, use_pandas_extractor=False,
                                 gen_partitions=64, final_repartition=True))
        else:
            out = run_pipeline(
                spark, d,
                KGPipelineConfig(n_docs=n_docs, use_pandas_extractor=True))
        n = out.count()
        dt = time.time() - t0
    return {"n_docs": n_docs, "fused": fused, "triples": n,
            "sec": round(dt, 2), "tps": round(n / dt, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=100_000)
    ap.add_argument("--big", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sizes", default=None,
                    help="comma list of doc counts to run this pass "
                         "(default: small,big); other sizes come from "
                         "--merge passes")
    ap.add_argument("--merge", action="append", default=[],
                    help="prior artifact(s) whose runs join this pass's "
                         "before best/ratio selection (rerun only the "
                         "contended scale, keep the calm legs)")
    args = ap.parse_args()
    sizes = ([int(s) for s in args.sizes.split(",")] if args.sizes
             else [args.small, args.big])

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .appName("kg_scale_point")
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
        # discarded warm-up: legs share one session, so the FIRST timed
        # leg otherwise eats JIT/codegen/stage-planning warm-up — pass 1
        # showed the first-position scale systematically slower (fused
        # 100k never beat 25 s while ckpt 100k hit 14 s in the same
        # window). Warm both pipeline modes at a small doc count.
        for fused in (True, False):
            r = run_once(spark, 20_000, fused, shm)
            print("warmup (discarded):", json.dumps(r), file=sys.stderr)
        runs = []
        # interleave scales so a contended window cannot hit one scale's
        # reps back-to-back (same rationale as bench.py's rep order)
        for _rep in range(args.reps):
            for fused in (True, False):
                for n in sizes:
                    r = run_once(spark, n, fused, shm)
                    r["t_end"] = round(time.time(), 2)
                    runs.append(r)
                    print("leg:", json.dumps(r), file=sys.stderr)
    finally:
        bw = stop_bw_sampler(proc, path)

    for prior in args.merge:
        with open(prior) as f:
            runs.extend(json.load(f)["runs"])

    best = {}
    for r in runs:
        k = (r["n_docs"], r["fused"])
        if k not in best or r["sec"] < best[k]["sec"]:
            best[k] = r
    result = {
        "metric": "kg pipeline 10x scale point (1M vs 100k docs)",
        "runs": runs,
        "best": {f"{'fused' if f else 'ckpt'}_{n}": v
                 for (n, f), v in best.items()},
        "tps_ratio_fused": round(
            best[(args.big, True)]["tps"] / best[(args.small, True)]["tps"],
            3),
        "tps_ratio_ckpt": round(
            best[(args.big, False)]["tps"] / best[(args.small, False)]["tps"],
            3),
        **bw,
    }
    out_path = os.path.join(REPO, "BENCH", "scale_point_r7.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("bw_samples", "runs")}))


if __name__ == "__main__":
    main()
