#!/usr/bin/env python
"""Assemble the round-4 scaling evidence from the session's pair logs.

The first run (`--reps 5`) was killed by its wall-clock timeout during its
fifth pair (the per-pair stderr lines are the durable record); two more
pairs ran in a follow-up invocation. This merges ALL completed
(low, high) pairs — contended ones included, nothing dropped — and
recomputes the median, which is the headline per the round-3 protocol.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(logs: list[str]) -> None:
    pairs = []
    for path in logs:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line.startswith('{"rep"'):
                    rec = json.loads(line)
                    pairs.append(rec)
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
                    "pairs (none dropped); pairs 0-3 from a --reps 5 run "
                    "killed by wall-clock timeout during pair 4, pairs 4-5 "
                    "from a follow-up --reps 2 run",
        "scaling_efficiency": round(median, 3),
        "scaling_efficiency_median": round(median, 3),
        "per_pair": pairs,
        "target": 0.8,
    }
    out = os.path.join(REPO, "BENCH", "scaling_result_r4.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "scaling_result.json"), "w",
              encoding="utf-8") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main(sys.argv[1:])
