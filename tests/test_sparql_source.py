"""S5 SPARQL endpoint source, executed end-to-end against a loopback HTTP
server (reference: pyrml_core.py:906-938 — SPARQLWrapper POST + result-format
decode + iterator + json_normalize flattening).

The server implements just enough of the SPARQL protocol for the client
paths under test: it holds a fixed binding table, answers COUNT(*) wrapper
queries, slices on LIMIT/OFFSET, and serializes per the Accept header
(sparql-results+json / csv / tsv / sparql-results+xml)."""

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyrml_spark.sparql_source import (
    decode_results,
    load_sparql_source,
    _format_key,
)

PRELUDE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix sd: <http://www.w3.org/ns/sparql-service-description#> .
@prefix formats: <http://www.w3.org/ns/formats/> .
@prefix ex: <http://ex.com/> .
"""

# the fixed result set the endpoint serves: 20 (id, name) rows
ROWS = [(str(i), f"entity{i}") for i in range(20)]
VARS = ["id", "name"]

_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)\s+OFFSET\s+(\d+)", re.IGNORECASE)


class _Handler(BaseHTTPRequestHandler):
    server_version = "LoopbackSPARQL/0"

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = self.rfile.read(
            int(self.headers.get("Content-Length", 0))).decode("utf-8")
        accept = self.headers.get("Accept", "")
        self.server.queries.append(body)

        if "COUNT(*)" in body:
            payload = json.dumps({
                "head": {"vars": ["n"]},
                "results": {"bindings": [
                    {"n": {"type": "literal", "value": str(len(ROWS))}}]},
            })
            ctype = "application/sparql-results+json"
        else:
            rows = ROWS
            m = _LIMIT_RE.search(body)
            if m:
                lim, off = int(m.group(1)), int(m.group(2))
                rows = rows[off:off + lim]
            if "csv" in accept:
                payload = "id,name\r\n" + "".join(
                    f"{i},{n}\r\n" for i, n in rows)
                ctype = "text/csv"
            elif "tab-separated" in accept:
                payload = "id\tname\n" + "".join(
                    f"{i}\t{n}\n" for i, n in rows)
                ctype = "text/tab-separated-values"
            elif "xml" in accept:
                ns = "http://www.w3.org/2005/sparql-results#"
                b = "".join(
                    f'<result><binding name="id"><literal>{i}</literal>'
                    f'</binding><binding name="name"><literal>{n}</literal>'
                    f"</binding></result>" for i, n in rows)
                payload = (f'<sparql xmlns="{ns}"><head>'
                           '<variable name="id"/><variable name="name"/>'
                           f"</head><results>{b}</results></sparql>")
                ctype = "application/sparql-results+xml"
            else:
                # rows 10+ carry an xml:lang tag the earlier rows lack —
                # exercises the paged path's closed head.vars schema (a
                # per-value key first appearing on a later page must not be
                # dropped)
                payload = json.dumps({
                    "head": {"vars": VARS},
                    "results": {"bindings": [
                        {"id": {"type": "literal", "value": i},
                         "name": (
                             {"type": "literal", "value": n,
                              "xml:lang": "en"} if int(i) >= 10 else
                             {"type": "literal", "value": n})}
                        for i, n in rows]},
                })
                ctype = "application/sparql-results+json"
        data = payload.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def endpoint():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.queries = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql", srv
    srv.shutdown()


def test_sparql_mapping_end_to_end(spark, endpoint):
    """Full engine path: sd:endpoint + rml:query in a TTL mapping; the
    default JSON decode flattens bindings to dotted `var.value` columns the
    term maps then reference (reference json_normalize behavior)."""
    from pyrml_spark.compiler import RMLCompiler
    from pyrml_spark.parse_mapping import parse_mapping

    url, _ = endpoint
    mapping = PRELUDE + """
    <#S> rml:logicalSource [
        rml:source [ sd:endpoint <%s> ;
                     sd:resultFormat formats:SPARQL_Results_JSON ] ;
        rml:referenceFormulation ql:JSONPath ;
        rml:iterator "$.results.bindings[*]" ;
        rml:query "SELECT ?id ?name WHERE { ?s ex:id ?id ; ex:name ?name }"
    ] ;
    rr:subjectMap [ rr:template "http://ex.com/e/{id.value}" ] ;
    rr:predicateObjectMap [ rr:predicate ex:name ;
        rr:objectMap [ rml:reference "name.value" ] ] .
    """ % url
    plan = parse_mapping(mapping)
    got = {(r["s"], r["o"])
           for r in RMLCompiler(spark, plan).compile().collect()}
    assert got == {(f"<http://ex.com/e/{i}>", f'"{n}"') for i, n in ROWS}


@pytest.mark.parametrize("fmt_iri,key", [
    ("http://www.w3.org/ns/formats/SPARQL_Results_CSV", "csv"),
    ("http://www.w3.org/ns/formats/SPARQL_Results_TSV", "tsv"),
    ("http://www.w3.org/ns/formats/SPARQL_Results_XML", "xml"),
])
def test_sparql_result_formats(spark, endpoint, fmt_iri, key):
    """CSV/TSV/XML decodes give plain var-named columns (no .value
    nesting) with identical row content."""
    url, _ = endpoint
    df = load_sparql_source(spark, url, "SELECT ?id ?name WHERE { }",
                            result_format=fmt_iri)
    assert df.columns == ["id", "name"]
    assert {(r["id"], r["name"]) for r in df.collect()} == set(ROWS)
    assert _format_key(fmt_iri) == key


def test_sparql_paged_fanout(spark, endpoint):
    """page_size=7 over 20 rows → COUNT probe + 3 LIMIT/OFFSET windows,
    pages 1.. fetched executor-side via mapInPandas; every row exactly
    once."""
    url, srv = endpoint
    srv.queries.clear()
    df = load_sparql_source(spark, url, "SELECT ?id ?name WHERE { }",
                            page_size=7)
    got = [(r["id.value"], r["name.value"]) for r in df.collect()]
    assert sorted(got) == sorted(ROWS)
    assert len(got) == len(ROWS)  # no page duplicated
    sent = "\n".join(srv.queries)
    assert "COUNT(*)" in sent
    assert "OFFSET 14" in sent  # third window reached the server


def test_sparql_paged_prologue_hoisted(spark, endpoint):
    """A paged query carrying a PREFIX prologue: the prologue must be
    hoisted OUT of the subquery wrapper (SELECT * WHERE { { PREFIX ... } }
    is invalid SPARQL — a real endpoint would 400) and re-emitted before
    it."""
    url, srv = endpoint
    srv.queries.clear()
    q = ("PREFIX ex: <http://ex.com/>\nBASE <http://ex.com/base/>\n"
         "SELECT ?id ?name WHERE { ?s ex:id ?id }")
    df = load_sparql_source(spark, url, q, page_size=7)
    got = [(r["id.value"], r["name.value"]) for r in df.collect()]
    assert sorted(got) == sorted(ROWS)
    for sent in srv.queries:
        inner = sent[sent.index("{"):] if "{" in sent else sent
        assert "PREFIX" not in inner and "BASE" not in inner, sent
        assert sent.lstrip().startswith("PREFIX ex:"), sent


def test_sparql_paged_head_vars_schema(spark, endpoint):
    """The paged schema is the closed head.vars set — a per-value key
    (xml:lang) first appearing on a later page lands in its column instead
    of being silently dropped (page 0 = rows 0..6 has no lang tag; rows
    10+ do)."""
    url, _ = endpoint
    df = load_sparql_source(spark, url, "SELECT ?id ?name WHERE { }",
                            page_size=7)
    assert "name.xml:lang" in df.columns and "id.datatype" in df.columns
    langs = {r["id.value"]: r["name.xml:lang"] for r in df.collect()}
    assert langs["15"] == "en" and langs["3"] is None


def test_sparql_paged_count_guard(spark, endpoint, monkeypatch):
    """A COUNT probe answered without an n binding (HTTP-200 error body)
    raises a descriptive error instead of a bare StopIteration."""
    import pyrml_spark.sparql_source as mod

    url, _ = endpoint
    real = mod.fetch_sparql

    def fake(ep, q, fmt):
        if "COUNT(*)" in q:
            return json.dumps({"head": {"vars": []},
                               "results": {"bindings": []}})
        return real(ep, q, fmt)

    monkeypatch.setattr(mod, "fetch_sparql", fake)
    with pytest.raises(ValueError, match="COUNT probe"):
        load_sparql_source(spark, url, "SELECT ?id WHERE { }", page_size=5)


def test_split_prologue():
    from pyrml_spark.sparql_source import split_prologue

    pro, body = split_prologue(
        "# comment\nPREFIX a: <http://a/>\nPREFIX b: <http://b/limit/>\n"
        "BASE <http://c/>\nSELECT * WHERE { ?s ?p ?o }")
    assert body == "SELECT * WHERE { ?s ?p ?o }"
    assert "PREFIX a:" in pro and "BASE" in pro and "# comment" in pro
    # no prologue → empty prologue, body intact
    pro2, body2 = split_prologue("SELECT * WHERE { }")
    assert pro2.strip() == "" and body2 == "SELECT * WHERE { }"


def test_sparql_paged_fallback_on_carried_limit(spark, endpoint):
    """A query already carrying LIMIT cannot be subquery-wrapped — warns
    and falls back to one fetch (server then applies the query's own
    LIMIT)."""
    url, _ = endpoint
    with pytest.warns(UserWarning, match="pagination disabled"):
        df = load_sparql_source(
            spark, url, "SELECT ?id ?name WHERE { } LIMIT 5 OFFSET 0",
            page_size=3)
    assert df.count() == 5


def test_sparql_requires_query(spark, endpoint):
    url, _ = endpoint
    with pytest.raises(ValueError, match="rml:query"):
        load_sparql_source(spark, url, "")


def test_format_key_unsupported():
    with pytest.raises(ValueError, match="resultFormat"):
        _format_key("http://www.w3.org/ns/formats/Turtle")


def test_decode_json_iterator_filter():
    """The SPARQL JSON decode accepts the same JSONPath subset as the JSON
    source — here a filter predicate over the bindings array."""
    text = json.dumps({"results": {"bindings": [
        {"id": {"value": "1"}, "k": {"value": "a"}},
        {"id": {"value": "2"}, "k": {"value": "b"}},
    ]}})
    cols, rows = decode_results(
        text, "json", "$.results.bindings[?(@.k.value == 'b')]")
    assert "id.value" in cols
    got = [dict(zip(cols, r)) for r in rows]
    assert [g["id.value"] for g in got] == ["2"]
