"""Differential property test for the JSONPath subset.

The repo carries TWO independent implementations of the same grammar:
the Spark compiler (`sources.apply_json_iterator` — Column programs:
struct access / explode / F.filter / F.slice / F.get) and the driver-side
Python evaluator (`sparql_source._eval_jsonpath_py`, used to decode SPARQL
JSON payloads). Hypothesis drives both over random documents and random
iterators derived from the supported grammar and asserts the result
multisets agree — divergence means one side mis-parses, which is exactly
the "silent misroute" class the loud-grammar policy exists to prevent.
"""

import json
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyrml_spark.sources import _parse_jsonpath_steps, load_json_source
from pyrml_spark.sparql_source import _eval_jsonpath_py, _flatten

# document shape: fixed field NAMES (Spark schemas are static), random
# values/sizes. `v` is optional per item (missing-key semantics), all
# leaf values non-null.
_items = st.lists(
    st.fixed_dictionaries(
        {"id": st.integers(0, 99), "tag": st.sampled_from("abc"),
         "xs": st.lists(st.integers(-5, 30), min_size=0, max_size=3)},
        optional={"v": st.integers(-5, 30)},
    ),
    min_size=0, max_size=6,
)
_docs = st.fixed_dictionaries({
    "items": _items,
    "meta": st.fixed_dictionaries(
        {"x": st.integers(0, 9), "y": st.integers(0, 9),
         "z": st.integers(0, 9)}),
    "arr": st.lists(st.integers(0, 99), min_size=0, max_size=5),
})

_paths = st.one_of(
    st.just("$.items[*]"),
    st.integers(-7, 7).map(lambda i: f"$.items[{i}]"),
    st.tuples(st.integers(-6, 6), st.integers(-6, 6)).map(
        lambda ab: f"$.items[{ab[0]}:{ab[1]}]"),
    # r6: positive stepped slices, incl. open ends ('$.arr[::2]')
    st.tuples(st.integers(-6, 6), st.integers(-6, 6),
              st.integers(2, 3)).map(
        lambda abs_: f"$.items[{abs_[0]}:{abs_[1]}:{abs_[2]}]"),
    st.sampled_from(["$.arr[::2]", "$.arr[1::2]", "$.arr[:4:3]"]),
    # r7: negative-step slices (Python reversal semantics)
    st.tuples(st.integers(-6, 6), st.integers(-6, 6),
              st.integers(-3, -1)).map(
        lambda abs_: f"$.items[{abs_[0]}:{abs_[1]}:{abs_[2]}]"),
    st.sampled_from(["$.arr[::-1]", "$.arr[::-2]", "$.arr[4::-2]",
                     "$.arr[:1:-1]", "$.arr[-1:-5:-1]",
                     "$.items[::-1]"]),
    st.tuples(st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
              st.integers(-5, 30)).map(
        lambda ol: f"$.items[?(@.v {ol[0]} {ol[1]})]"),
    st.just("$.items[?(@.v)]"),
    st.sampled_from("abc").map(lambda t: f"$.items[?(@.tag == '{t}')]"),
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3,
             unique=True).map(
        lambda fs: "$.meta[" + ",".join(f"'{f}'" for f in fs) + "]"),
    st.lists(st.integers(-6, 6), min_size=1, max_size=3).map(
        lambda ix: "$.arr[" + ",".join(map(str, ix)) + "]"),
    st.just("$..id"),
    st.just("$.meta.x"),
    # r6: bare (unquoted) bracket fields, jsonpath_ng-style
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3,
             unique=True).map(
        lambda fs: "$.meta[" + ",".join(fs) + "]"),
    st.just("$.meta[y]"),
)

# predicate terms for connective fuzzing ('&&' binds tighter than '||');
# r6 adds regex terms (Java/Python-common pattern subset), @-to-@ field
# comparisons, and parenthesized grouping
_terms = st.one_of(
    st.tuples(st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
              st.integers(-5, 30)).map(lambda ol: f"@.v {ol[0]} {ol[1]}"),
    st.sampled_from("abc").map(lambda t: f"@.tag == '{t}'"),
    st.just("@.v"),
    st.just("@.missing == 1"),
    st.sampled_from(["a", "b", "c", "[ab]", "a|b", "^a$", "b$"]).map(
        lambda p: f"@.tag =~ '{p}'"),
    st.tuples(st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
              st.sampled_from(["@.id", "@.v"])).map(
        lambda or_: f"@.v {or_[0]} {or_[1]}"),
    # r6: indexed paths inside filter terms (negatives from the end,
    # out-of-range → no-match), both as lhs and as @-to-@ rhs
    st.tuples(st.integers(-4, 4),
              st.sampled_from([">", "<", "==", "!="]),
              st.integers(-5, 30)).map(
        lambda iol: f"@.xs[{iol[0]}] {iol[1]} {iol[2]}"),
    st.integers(-4, 4).map(lambda i: f"@.xs[{i}]"),
    st.integers(-4, 4).map(lambda i: f"@.v > @.xs[{i}]"),
)
def _join_pred(terms, conns):
    out = [terms[0]]
    for t, c in zip(terms[1:], conns):
        out += [c, t]
    return "$.items[?(" + " ".join(out) + ")]"


_conn_paths = st.tuples(
    st.lists(_terms, min_size=2, max_size=3),
    st.lists(st.sampled_from(["&&", "||"]), min_size=2, max_size=2),
).map(lambda tc: _join_pred(tc[0], tc[1]))


def _group_pred(tc):
    (t1, t2, t3), c1, c2, flip = tc
    if flip:
        return f"$.items[?(({t1} {c1} {t2}) {c2} {t3})]"
    return f"$.items[?({t1} {c1} ({t2} {c2} {t3}))]"


_grouped_paths = st.tuples(
    st.tuples(_terms, _terms, _terms),
    st.sampled_from(["&&", "||"]),
    st.sampled_from(["&&", "||"]),
    st.booleans(),
).map(_group_pred)

_paths = st.one_of(_paths, _conn_paths, _grouped_paths)


def _normalize(node):
    """A matched node → hashable, None-entries dropped (Spark represents a
    missing optional key as a NULL column; the Python eval omits it)."""
    if isinstance(node, dict):
        return tuple(sorted(
            (k, v) for k, v in _flatten(node).items() if v is not None))
    return node


def _spark_nodes(spark, doc, path, tmp):
    p = os.path.join(tmp, "d.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    df = load_json_source(spark, p, path)
    out = []
    for r in df.collect():
        d = r.asDict()
        if list(d.keys()) == ["value"]:
            out.append(d["value"])
        else:
            # stringify like _flatten does for scalars under dotted keys
            out.append(tuple(sorted(
                (k, v if isinstance(v, str) else json.dumps(v))
                for k, v in d.items() if v is not None)))
    # an out-of-range [n] yields a NULL struct → an all-None row on the
    # Spark side where the Python eval omits the node; the engine's D9
    # null-drop removes those rows downstream, so mirror it here
    return sorted((x for x in out if x not in ((), None)), key=repr)


def _py_nodes(doc, path):
    steps = _parse_jsonpath_steps(path)
    nodes = (_normalize(n) for n in _eval_jsonpath_py(doc, steps))
    return sorted((x for x in nodes if x not in ((), None)), key=repr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(doc=_docs, path=_paths)
def test_spark_and_python_jsonpath_agree(spark, doc, path):
    with tempfile.TemporaryDirectory() as tmp:
        try:
            got = _spark_nodes(spark, doc, path, tmp)
        except Exception as e:
            # empty corner: Spark cannot infer a schema for an empty array
            # ('[]' infers as string); the comparison is vacuous there
            # schema-driven corners where Spark is loud and the dynamic
            # Python eval returns empty: a document where no item carries
            # the filtered/descended field at all, or an empty array whose
            # element schema cannot be inferred
            if any(tok in str(e) for tok in (
                    "CANNOT_INFER", "match nothing", "UNRESOLVED_COLUMN",
                    "FIELD_NOT_FOUND", "no field named",
                    "DATATYPE_MISMATCH")):
                return
            raise
        assert got == _py_nodes(doc, path), (doc, path)


def test_regex_filter_divergent_constructs_rejected():
    """'=~' patterns outside the Java∩Python common subset fail at parse
    time (ADVICE r6) — the Spark rlike and endpoint re.search evaluators
    would otherwise disagree (or throw on only one path)."""
    import pytest

    from pyrml_spark.sources import SourceError, _parse_jsonpath_steps

    for bad in ["(?i)foo", r"\p{L}+", "a&&b", "ab*+", r"\Afoo", "(?<=x)y",
                "(?P<n>a)", "a[b"]:
        with pytest.raises(SourceError):
            _parse_jsonpath_steps(f"$.a[?(@.x =~ '{bad}')]")
    # the documented subset still parses: groups, lookahead, classes,
    # bounded quantifiers, alternation, anchors
    _parse_jsonpath_steps(
        r"$.a[?(@.x =~ '^(?:ab|c(?=d))[ef-h]{1,3}\d+\w*$')]")
