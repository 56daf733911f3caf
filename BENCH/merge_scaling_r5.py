#!/usr/bin/env python
"""Assemble the full round-5 scaling evidence from the banked per-invocation
artifacts ``BENCH/scaling_r5_*.json`` (each invocation's complete result
JSON, committed verbatim — batch 0 is the initial --reps 4 run, the stray
single-pair follow-up, batch 1 and batch 2 the closing --reps 3 runs).

Idempotent and validated: inputs are read-only artifacts distinct from the
outputs (``scaling_result_r5.json`` / ``scaling_result.json``), every pair
must be a caged 1-core vs 4-core leg over the 2M-doc corpus (canary probes
and other-scale runs are rejected loudly), and byte-identical duplicate
pairs are collapsed. Median across ALL accepted pairs — contended ones
included, nothing dropped — is the headline per the round-3 protocol.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 2_000_000


def main() -> None:
    inputs = sorted(glob.glob(os.path.join(REPO, "BENCH",
                                           "scaling_r5_*.json")))
    if not inputs:
        raise SystemExit("no BENCH/scaling_r5_*.json artifacts found")
    pairs, seen = [], set()
    for path in inputs:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        for p in doc["per_pair"]:
            if (p["low"]["cpus"], p["high"]["cpus"]) != (1, 4):
                raise SystemExit(
                    f"{path}: pair with cpus {p['low']['cpus']}v"
                    f"{p['high']['cpus']} is not scaling evidence")
            if p["low"]["n_docs"] != N_DOCS or p["high"]["n_docs"] != N_DOCS:
                raise SystemExit(f"{path}: pair not at {N_DOCS} docs")
            key = (p["low"]["elapsed_sec"], p["high"]["elapsed_sec"],
                   p["efficiency"])
            if key in seen:
                continue
            seen.add(key)
            pairs.append({k: p[k] for k in ("low", "high", "efficiency")})
    for i, p in enumerate(pairs):
        p["rep"] = i
    effs = sorted(p["efficiency"] for p in pairs)
    n = len(effs)
    median = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    result = {
        "job": "kg_pipeline_fused (generate→extract→canonicalize→"
               "materialize, single write)",
        "n_docs": N_DOCS,
        "parallelism_ratio": 4.0,
        "protocol": "alternating caged 1-core vs 4-core pairs, best-of-3 "
                    "within the 4-core leg, median across ALL completed "
                    "pairs (none dropped); assembled from the committed "
                    "per-invocation artifacts " +
                    ", ".join(os.path.basename(p) for p in inputs),
        "scaling_efficiency": round(median, 3),
        "scaling_efficiency_median": round(median, 3),
        "per_pair": pairs,
        "target": 0.8,
    }
    for name in ("scaling_result_r5.json", "scaling_result.json"):
        with open(os.path.join(REPO, "BENCH", name), "w",
                  encoding="utf-8") as fh:
            json.dump(result, fh, indent=2)
    print(json.dumps({"n_pairs": len(pairs), "median": round(median, 3),
                      "per_pair": [p["efficiency"] for p in pairs]}))


if __name__ == "__main__":
    main()
