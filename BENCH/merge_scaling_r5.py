#!/usr/bin/env python
"""Assemble the full round-5 scaling evidence: every completed 2M-doc
(low, high) pair from the round's three invocations — the initial --reps 4
run (banked in scaling_result_r5.json), a stray single-pair follow-up whose
only durable record is its scaling_result.json snapshot (values inlined
below before a canary overwrote the file), and the closing --reps 3 run.
Nothing dropped, contended pairs included; the median across ALL pairs is
the headline per the round-3 protocol.

Usage: python BENCH/merge_scaling_r5.py <closing_run_log> [...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The follow-up single-pair run (its scaling_result.json was later
# overwritten by a 4v4 canary probe; these are its recorded values).
STRAY_PAIR = {
    "low": {"cpus": 1, "n_docs": 2000000, "triples": 21906608,
            "elapsed_sec": 229.272, "triples_per_sec": 95548.7,
            "calibration_loop_sec": 2.68},
    "high": {"cpus": 4, "n_docs": 2000000, "triples": 21906608,
             "elapsed_sec": 72.596, "triples_per_sec": 301761.3,
             "calibration_loop_sec": 2.31},
    "efficiency": 0.79,
}


def main(logs: list[str]) -> None:
    with open(os.path.join(REPO, "BENCH", "scaling_result_r5.json"),
              encoding="utf-8") as fh:
        pairs = json.load(fh)["per_pair"]
    pairs.append(dict(STRAY_PAIR))
    for path in logs:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                # the invocation's final result JSON carries the complete
                # per_pair list (per-pair stderr lines can be lost to log
                # truncation)
                if line.startswith('{"job"'):
                    pairs.extend(json.loads(line)["per_pair"])
    for i, p in enumerate(pairs):
        p["rep"] = i
    effs = sorted(p["efficiency"] for p in pairs)
    n = len(effs)
    median = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    result = {
        "job": "kg_pipeline_fused (generate→extract→canonicalize→"
               "materialize, single write)",
        "n_docs": 2_000_000,
        "parallelism_ratio": 4.0,
        "protocol": "alternating caged 1-core vs 4-core pairs, best-of-3 "
                    "within the 4-core leg, median across ALL completed "
                    "pairs (none dropped); pairs 0-3 from the initial "
                    "--reps 4 run, pair 4 a stray single-pair follow-up, "
                    "remaining pairs from the closing --reps 3 run",
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
    main(sys.argv[1:])
