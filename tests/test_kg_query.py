"""General BGP compiler (kg/query.py): pure compile-time tests (ordering,
filter placement, loud rejections) + execution tests on a toy graph with
hand-computed results + plan-shape asserts on the materialized-sink path."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pyrml_spark.kg.query import (BGPError, TOTAL_KEY, compile_bgp, is_var,
                                  kg_query, predicate_stats)

P_A = "<http://ex/p/a>"
P_B = "<http://ex/p/b>"
P_C = "<http://ex/p/c>"


# ---------------------------------------------------------------------------
# compile-time (no Spark)
# ---------------------------------------------------------------------------

def test_order_follows_predicate_stats():
    """With a histogram, the cheapest pattern leads and every later step
    picks the cheapest CONNECTED pattern — never list order."""
    stats = {P_A: 1_000_000, P_B: 10, P_C: 5_000, TOTAL_KEY: 1_005_010}
    plan = compile_bgp(
        [("?x", P_A, "?y"), ("?y", P_B, "?z"), ("?z", P_C, "?w")],
        stats=stats)
    assert [pl.pattern[1] for pl in plan.order] == [P_B, P_C, P_A]
    assert plan.join_vars == [["z"], ["y"]]


def test_bound_terms_shrink_estimate():
    """A bound subject/object divides the estimate: a bound-s pattern of a
    huge predicate can still lead."""
    stats = {P_A: 1_000_000, P_B: 50_000, TOTAL_KEY: 1_050_000}
    plan = compile_bgp(
        [("<http://ex/s1>", P_A, "?y"), ("?y", P_B, "?z")], stats=stats)
    assert plan.order[0].pattern[0] == "<http://ex/s1>"


def test_disconnected_patterns_rejected():
    with pytest.raises(BGPError, match="disconnected"):
        compile_bgp([("?a", P_A, "?b"), ("?c", P_B, "?d")])


def test_fully_bound_pattern_rejected():
    with pytest.raises(BGPError, match="binds no variable"):
        compile_bgp([("<s>", P_A, "<o>"), ("?x", P_B, "?y")])


def test_invalid_variable_name_rejected():
    with pytest.raises(BGPError, match="invalid variable"):
        compile_bgp([("?2bad", P_A, "?y")])


def test_select_unbound_var_rejected():
    with pytest.raises(BGPError, match="unbound"):
        compile_bgp([("?x", P_A, "?y")], select=["x", "nope"])


def test_filter_without_query_var_rejected():
    with pytest.raises(BGPError, match="references no query variable"):
        compile_bgp([("?x", P_A, "?y")], filters=["1 = 1"])


def test_single_pattern_filter_pushed_to_scan():
    """A filter over one pattern's vars lands in that scan (pre-join
    pruning), not after the joins; quoted literals containing a var name
    don't create a false dependency."""
    plan = compile_bgp(
        [("?x", P_A, "?y"), ("?y", P_B, "?z")],
        filters=["y LIKE 'z%'", "x > z"])
    pushed = {pl.pattern[1]: pl.scan_filters for pl in plan.order}
    # y is bound by BOTH patterns → pushed into both scans
    assert pushed[P_A] == ["y LIKE 'z%'"] and pushed[P_B] == ["y LIKE 'z%'"]
    # x > z spans the two patterns → deferred to the (only) join step
    assert plan.post_filters == [(0, "x > z")]


def test_is_var_and_default_select_order():
    assert is_var("?x") and not is_var("<http://ex/x>")
    plan = compile_bgp([("?b", P_A, "?a"), ("?a", P_B, "?c")])
    assert plan.out_vars == ["b", "a", "c"]  # first-appearance order


# ---------------------------------------------------------------------------
# execution on a toy graph (hand-computed expectations)
# ---------------------------------------------------------------------------

@pytest.fixture()
def toy(spark):
    rows = [
        ("<d1>", P_A, "<e1>"), ("<d1>", P_A, "<e2>"),
        ("<d2>", P_A, "<e2>"),
        ("<e1>", P_B, '"x"'), ("<e2>", P_B, '"y"'),
        ("<e2>", P_C, "<e2>"),       # self-loop for the same-var test
        ("<e1>", P_C, "<e2>"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"])


def test_two_pattern_join(toy):
    got = {tuple(r) for r in kg_query(
        toy, [("?d", P_A, "?e"), ("?e", P_B, "?v")]).collect()}
    assert got == {("<d1>", "<e1>", '"x"'), ("<d1>", "<e2>", '"y"'),
                   ("<d2>", "<e2>", '"y"')}


def test_constant_subject_and_select(toy):
    got = {tuple(r) for r in kg_query(
        toy, [("<d1>", P_A, "?e"), ("?e", P_B, "?v")],
        select=["v"]).collect()}
    assert got == {('"x"',), ('"y"',)}


def test_same_var_twice_in_one_pattern(toy):
    got = {tuple(r) for r in kg_query(toy, [("?x", P_C, "?x")]).collect()}
    assert got == {("<e2>",)}


def test_pushed_and_deferred_filters(toy):
    got = {tuple(r) for r in kg_query(
        toy, [("?d", P_A, "?e"), ("?e", P_B, "?v")],
        filters=["v = '\"y\"'", "d != '<d2>'"]).collect()}
    assert got == {("<d1>", "<e2>", '"y"')}


def test_distinct_semantics(toy):
    """Projection over a BGP is a bag without distinct: <e2> has two
    incoming P_A edges."""
    q = [("?d", P_A, "?e")]
    assert kg_query(toy, q, select=["e"]).count() == 2
    assert kg_query(toy, q, select=["e"], distinct=False).count() == 3


def test_predicate_stats_and_auto(toy):
    stats = predicate_stats(toy)
    assert stats[P_A] == 3 and stats[P_B] == 2 and stats[TOTAL_KEY] == 7
    got = kg_query(toy, [("?d", P_A, "?e"), ("?e", P_B, "?v")],
                   stats="auto")
    assert got.count() == 3


# ---------------------------------------------------------------------------
# plan shape on the materialized sink (the 100 TB access path)
# ---------------------------------------------------------------------------

def test_sink_query_plan_is_pruned_joins(spark, tmp_path):
    """Over the bucketed parquet sink: predicate equality reaches the scan
    (PushedFilters), join count = patterns − 1, and no cartesian /
    broadcast-nested-loop anywhere."""
    from pyrml_spark.kg.table import read_triples_table, write_triples_table

    t = spark.createDataFrame(
        [(f"<s{i % 10}>", [P_A, P_B, P_C][i % 3], f"<o{i % 5}>", "<g>")
         for i in range(60)], ["s", "p", "o", "g"])
    path = str(tmp_path / "sink")
    write_triples_table(t, path, fmt="parquet")
    back = read_triples_table(spark, path, fmt="parquet").select("s", "p", "o")

    df = kg_query(back, [("?x", P_A, "?o"), ("?y", P_B, "?o"),
                         ("?y", P_C, "?z")])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan and \
        "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"PushedFilters: \[[^\]]*EqualTo\(p,", plan)) >= 3, plan
    # formatted explain names each node in the tree AND its detail block;
    # count only the numbered detail headers so each join counts once
    n_joins = len(re.findall(r"^\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|"
                             r"ShuffledHashJoin)", plan, re.M))
    assert n_joins == 2, plan
    assert df.count() > 0


# -------------------------------------------------- r8: quoting / stats


def test_filter_deps_ansi_doubled_quotes():
    # ADVICE r7: ''-doubled quote escapes mis-masked, so a var name in
    # the unmasked tail false-positived as a dependency
    from pyrml_spark.kg.query import _filter_deps

    expr = "flag = 'she said ''hi s'' ok'"
    assert _filter_deps(expr, ["s", "flag"]) == ["flag"]
    # backslash escapes still masked; doubled double-quotes too
    assert _filter_deps(r"x = 'it\'s s'", ["s", "x"]) == ["x"]
    assert _filter_deps('x = "a""b s"', ["s", "x"]) == ["x"]
    # a real dependency outside quotes still counts
    assert _filter_deps("s = 'it''s'", ["s", "x"]) == ["s"]


def test_sink_predicate_stats_cached_per_session_and_input(
        spark, monkeypatch):
    # VERDICT r7 #5: one predicate_stats job per (session, sink), not
    # one per query
    from pyrml_spark.kg import analytics
    from pyrml_spark.kg import query as q

    df = spark.createDataFrame(
        [("<a>", "<p>", "<b>"), ("<a>", "<q>", "<c>")], ["s", "p", "o"])
    monkeypatch.setattr(analytics, "_sink_triples", lambda sp, d: df)
    calls = []
    real = q.predicate_stats

    def counting(t):
        calls.append(1)
        return real(t)

    monkeypatch.setattr(q, "predicate_stats", counting)
    analytics._STATS_CACHE.clear()
    s1 = analytics._sink_stats(spark, "/sink/one")
    s2 = analytics._sink_stats(spark, "/sink/one")
    assert s1 is s2 and len(calls) == 1
    analytics._sink_stats(spark, "/sink/two")
    assert len(calls) == 2
    analytics._STATS_CACHE.clear()


def test_estimate_uses_measured_distinct_counts():
    # VERDICT r7 #6: with per-predicate distinct counts a bound term
    # divides by the MEASURED rows-per-key, not the constant 100.
    from pyrml_spark.kg.query import _ND_O, _ND_S, _estimate

    stats = {P_A: 1_000_000, P_B: 50_000, TOTAL_KEY: 1_050_000,
             _ND_S + P_A: 500_000, _ND_O + P_A: 10,
             _ND_S + P_B: 50_000, _ND_O + P_B: 50_000}
    # bound subject on P_A: 1M rows / 500k subjects = 2 expected rows
    assert _estimate(("<http://ex/s1>", P_A, "?y"), stats) == 2.0
    # bound object on P_A (skewed: only 10 distinct objects): 100k rows
    assert _estimate(("?x", P_A, "<http://ex/o1>"), stats) == 100_000.0
    # the skew flips the greedy order vs the constant model: under /100
    # the bound-o P_A pattern (10k) would lead over P_B (50k); measured
    # NDV says it really yields 100k rows, so P_B correctly leads
    plan = compile_bgp(
        [("?x", P_A, "<http://ex/o1>"), ("?x", P_B, "?z")], stats=stats)
    assert plan.order[0].pattern[1] == P_B
    # absent ND keys degrade to the constant divisor (old-style dicts)
    legacy = {P_A: 1_000_000, TOTAL_KEY: 1_000_000}
    assert _estimate(("<http://ex/s1>", P_A, "?y"), legacy) == 10_000.0


def test_predicate_stats_carries_distinct_counts(toy):
    from pyrml_spark.kg.query import _ND_O, _ND_S

    stats = predicate_stats(toy)
    assert stats[_ND_S + P_A] == 2 and stats[_ND_O + P_A] == 2
    assert stats[_ND_S + P_B] == 2 and stats[_ND_O + P_B] == 2
    assert stats[TOTAL_KEY] == 7  # ND keys don't pollute the total
