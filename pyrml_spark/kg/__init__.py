"""North-rule KG-construction pipeline over interleaved text+media documents
(BASELINE.json): deterministic corpus generator, vectorized mention
extraction, entity canonicalization via connected components, partitioned
(s,p,o,g) materialization with per-partition lineage and checkpointed,
resumable stages."""
