"""Pins the driver-window contract of __spark_entry__.

The per-round correctness sweep evaluates at most 50 queries in dict
order (round 5: the 7 kg_* entries merged last fell off the end and the
north-rule chain went driver-unverified). These asserts make the two
failure modes impossible to reintroduce silently: the driver view must
stay ≤50 entries, the KG chain must come first, and everything excluded
from the window must still be covered by the full-strictness local
parity sweep (all_queries / all_oracle_sql)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

KG_CHAIN = [
    "kg_documents",
    "kg_mentions",
    "kg_canonical_mapping",
    "kg_pipeline_triples",
    "kg_pipeline_fused_triples",
    "kg_sparql_query",   # r7: SPARQL text surface replaced kg_bgp_query
    "kg_query_2hop",     # (that row is PYTEST_ONLY — same oracle family)
    "kg_pagerank",
]


def test_driver_view_fits_window():
    q = entry_mod.queries()
    assert len(q) <= entry_mod.DRIVER_WINDOW, (
        f"driver view has {len(q)} entries; the sweep caps at "
        f"{entry_mod.DRIVER_WINDOW} and silently drops the rest")


def test_kg_chain_merges_first():
    keys = list(entry_mod.queries().keys())
    assert keys[: len(KG_CHAIN)] == KG_CHAIN, keys[:10]


def test_every_driver_query_has_oracle():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    missing = set(q) - set(o)
    # rows-only checks are allowed only for genuinely non-SQL-expressible
    # ops; today every driver query has a full oracle
    assert not missing, missing


def test_pytest_only_set_still_fully_covered():
    aq, ao = entry_mod.all_queries(), entry_mod.all_oracle_sql()
    for k in entry_mod.PYTEST_ONLY:
        assert k in aq, f"{k} in PYTEST_ONLY but not implemented"
        assert k in ao, f"{k} in PYTEST_ONLY but has no oracle"
    assert not (entry_mod.PYTEST_ONLY & set(entry_mod.queries()))


def test_window_leaves_headroom_accounting():
    """Every implemented query is either in the driver view or in
    PYTEST_ONLY — nothing can silently vanish from both."""
    aq = set(entry_mod.all_queries())
    dv = set(entry_mod.queries())
    assert aq == dv | set(entry_mod.PYTEST_ONLY)
