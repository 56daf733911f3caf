"""Compat facade (PyRML.get_mapper), CSVW source, join-less ROM semantics."""

import os
import tempfile

import pytest

from pyrml_spark import convert
from pyrml_spark.compat import PyRML
from pyrml_spark.nquads import df_to_quads

PRELUDE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix csvw: <http://www.w3.org/ns/csvw#> .
@prefix ex: <http://ex.com/> .
"""


def write_files(d, files):
    for name, content in files.items():
        with open(os.path.join(d, name), "w") as f:
            f.write(content)


def test_compat_convert_and_custom_function(spark):
    PyRML._mapper = None
    mapper = PyRML.get_mapper(spark)
    PyRML.register_function("shout", lambda s: (s or "") + "!")
    with tempfile.TemporaryDirectory() as d:
        write_files(d, {
            "d.csv": "ID,NAME\n1,ada\n",
            "m.ttl": PRELUDE + """
            <#M> rml:logicalSource [ rml:source "d.csv" ;
                                     rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/{ID}" ] ;
              rr:predicateObjectMap [ rr:predicate ex:loud ;
                rr:objectMap [ rr:template "%eval:shout('{NAME}')%" ;
                               rr:termType rr:Literal ] ] .
            """,
        })
        df = mapper.convert(os.path.join(d, "m.ttl"))
        quads = df_to_quads(df)
    assert ("<http://ex.com/1>", "<http://ex.com/loud>", '"ada!"', None) in quads


def test_csvw_source_with_dialect(spark):
    with tempfile.TemporaryDirectory() as d:
        write_files(d, {
            "d.csv": "ID;NAME\n1;Ada\n",
            "m.ttl": PRELUDE + """
            <#M> rml:logicalSource [
                rml:source [ csvw:url "d.csv" ;
                             csvw:dialect [ csvw:delimiter ";" ] ] ;
                rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/{ID}" ] ;
              rr:predicateObjectMap [ rr:predicate ex:name ;
                rr:objectMap [ rml:reference "NAME" ] ] .
            """,
        })
        quads = df_to_quads(convert(spark, os.path.join(d, "m.ttl"),
                                    search_roots=[d]))
    assert ("<http://ex.com/1>", "<http://ex.com/name>", '"Ada"', None) in quads


def test_joinless_rom_same_source(spark):
    """D6 well-defined case: same logical source ⇒ parent subject expr
    applied to child rows (pyrml_core.py:1583-1585)."""
    with tempfile.TemporaryDirectory() as d:
        write_files(d, {
            "d.csv": "ID,CODE\n1,A\n2,B\n",
            "m.ttl": PRELUDE + """
            <#Child> rml:logicalSource [ rml:source "d.csv" ;
                                         rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/c/{ID}" ] ;
              rr:predicateObjectMap [ rr:predicate ex:ref ;
                rr:objectMap [ rr:parentTriplesMap <#Parent> ] ] .
            <#Parent> rml:logicalSource [ rml:source "d.csv" ;
                                          rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/p/{CODE}" ] .
            """,
        })
        quads = df_to_quads(convert(spark, os.path.join(d, "m.ttl"),
                                    search_roots=[d]))
    assert ("<http://ex.com/c/1>", "<http://ex.com/ref>",
            "<http://ex.com/p/A>", None) in quads
    assert ("<http://ex.com/c/2>", "<http://ex.com/ref>",
            "<http://ex.com/p/B>", None) in quads


def test_joinless_rom_cross_source_raises(spark):
    """D6 positional-concat quirk (pyrml_core.py:1452-1453) is rejected."""
    with tempfile.TemporaryDirectory() as d:
        write_files(d, {
            "a.csv": "ID\n1\n",
            "b.csv": "CODE\nA\n",
            "m.ttl": PRELUDE + """
            <#Child> rml:logicalSource [ rml:source "a.csv" ;
                                         rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/c/{ID}" ] ;
              rr:predicateObjectMap [ rr:predicate ex:ref ;
                rr:objectMap [ rr:parentTriplesMap <#Parent> ] ] .
            <#Parent> rml:logicalSource [ rml:source "b.csv" ;
                                          rml:referenceFormulation ql:CSV ] ;
              rr:subjectMap [ rr:template "http://ex.com/p/{CODE}" ] .
            """,
        })
        with pytest.raises(NotImplementedError):
            convert(spark, os.path.join(d, "m.ttl"), search_roots=[d])


def test_sql_source_parses_to_jdbc_reader_config():
    """S6: no JDBC driver exists in this sandbox, so the execution path can't
    run — but the mapping→IR→reader configuration is pinned here (reference:
    pyrml_core.py:939-963, SQLAlchemy engine + SELECT * default)."""
    from pyrml_spark.parse_mapping import parse_mapping

    plan = parse_mapping("""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix d2rq: <http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#> .
@prefix ex: <http://ex.com/> .
<#T> rml:logicalSource [ d2rq:jdbcDSN "jdbc:postgresql://db:5432/corp" ;
                         rr:tableName "employees" ] ;
  rr:subjectMap [ rr:template "http://ex.com/emp/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name" ] ] .

<#Q> rml:logicalSource [ d2rq:jdbcDSN "jdbc:postgresql://db:5432/corp" ;
                         rr:sqlQuery "SELECT id, name FROM emp WHERE act=1" ] ;
  rr:subjectMap [ rr:template "http://ex.com/e/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name" ] ] .
""")
    by_iri = {tm.iri: tm for tm in plan.triples_maps}
    t = by_iri["#T"].sources[0]
    assert (t.kind, t.source, t.iterator) == (
        "sql", "jdbc:postgresql://db:5432/corp", "employees")
    assert t.query == "SELECT * FROM employees"  # reference's default (:952)
    q = by_iri["#Q"].sources[0]
    assert q.kind == "sql"
    assert q.query == "SELECT id, name FROM emp WHERE act=1"


def test_xml_source_parallel_across_files(spark, tmp_path):
    """S4 scale shape: a DIRECTORY of XML documents — one wholetext row per
    file, parsed on executors; schema probed from the first file."""
    from pyrml_spark.sources import load_xml_source

    for i in range(3):
        (tmp_path / f"part{i}.xml").write_text(
            f'<people xmlns:h="http://ex.com/h">'
            f'<h:person id="{i}a"><h:name>N{i}a</h:name></h:person>'
            f'<h:person id="{i}b"><h:name>N{i}b</h:name></h:person>'
            f"</people>"
        )
    df = load_xml_source(spark, str(tmp_path), "/people/h:person")
    rows = {(r["id"], r["name"]) for r in df.collect()}
    assert rows == {(f"{i}{s}", f"N{i}{s}") for i in range(3) for s in "ab"}
    assert df.rdd.getNumPartitions() >= 1  # distributed scan, not a driver list


def test_xml_xpath_predicates(spark, tmp_path):
    """S4 iterator grammar beyond plain paths: ElementTree's findall
    supports attribute predicates ([@a], [@a='v']), child-existence
    ([child]) and position ([1]) natively, so the executor-side parser
    honors them with zero extra code — pin that it stays true."""
    from pyrml_spark.sources import load_xml_source

    (tmp_path / "d.xml").write_text(
        '<people>'
        '<person id="1" vip="y"><name>A</name></person>'
        '<person id="2"><name>B</name></person>'
        '<person id="3" vip="y"><nick>C</nick></person>'
        '</people>'
    )

    def ids(xpath):
        return sorted(r["id"] for r in
                      load_xml_source(spark, str(tmp_path), xpath).collect())

    assert ids("/people/person[@vip]") == ["1", "3"]
    assert ids("/people/person[@vip='y'][@id='3']") == ["3"]
    assert ids("/people/person[name]") == ["1", "2"]
    assert ids("/people/person[1]") == ["1"]


def test_xml_schema_probe_unions_across_files(spark, tmp_path):
    """ADVICE r2: columns appearing only in LATER files must survive — the
    probe unions a sample of files, not just the first (the reference's
    per-file pd.read_xml unions columns across all files)."""
    from pyrml_spark.sources import load_xml_source

    (tmp_path / "a.xml").write_text(
        "<people><person id='1'><name>A</name></person></people>")
    (tmp_path / "b.xml").write_text(
        "<people><person id='2'><name>B</name>"
        "<email>b@x.org</email></person></people>")
    df = load_xml_source(spark, str(tmp_path), "/people/person")
    assert set(df.columns) == {"id", "name", "email"}
    rows = {(r["id"], r["name"], r["email"]) for r in df.collect()}
    assert rows == {("1", "A", None), ("2", "B", "b@x.org")}


# ---------------------------------------------------------------------------
# JSONPath subset (VERDICT r3 #6): recursive descent supported, everything
# else outside the subset fails LOUDLY (never a silent mis-parse)
# ---------------------------------------------------------------------------

def test_jsonpath_recursive_descent(spark, tmp_path):
    """$..name finds the field at every nesting depth (schema-driven)."""
    from pyrml_spark.sources import load_json_source

    doc = """{
      "name": "top",
      "org": {"name": "acme", "units": [{"name": "u1"}, {"name": "u2"}]},
      "people": [{"name": "ann", "pet": {"name": "rex"}}]
    }"""
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write(doc)
    df = load_json_source(spark, p, "$..name")
    vals = sorted(r["value"] for r in df.collect())
    assert vals == ["acme", "ann", "rex", "top", "u1", "u2"]


def test_jsonpath_descent_then_steps(spark, tmp_path):
    """Steps after the descent apply to every match."""
    from pyrml_spark.sources import load_json_source

    doc = '{"a": {"tags": ["x", "y"]}, "b": {"deep": {"tags": ["z"]}}}'
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write(doc)
    df = load_json_source(spark, p, "$..tags[*]")
    assert sorted(r["value"] for r in df.collect()) == ["x", "y", "z"]


def test_jsonpath_unsupported_is_loud(spark, tmp_path):
    from pyrml_spark.sources import SourceError, load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": [{"f": 1}]}')
    # r6: grouping, =~ regex, and @-to-@ compares moved into the grammar
    # (test_jsonpath_filter_grouping_regex_refs); loud residue shrinks to:
    for bad in ("$..*", "$.a.", "$..", "$.a[f,0]",  # mixed union
                "$.a[0:4:0]",                   # zero slice step
                "$.a[?(@.f[1:2] > 1)]",         # slice inside a filter path
                "$.a[?(@.f =~ /x(y)/)]",        # ')' in a /…/ regex literal
                "$.a[?(@.f > 1]",               # unbalanced parens
                "$.a[?(@.f in [1,2])]"):        # unsupported operator
        with pytest.raises(SourceError):
            load_json_source(spark, p, bad)


def test_jsonpath_filter_predicates(spark, tmp_path):
    """VERDICT r4 #1: [?(@.field <op> literal)] compiles to F.filter +
    explode; existence filter [?(@.f)]; nested @.a.b paths; string and
    null literals."""
    from pyrml_spark.sources import load_json_source

    doc = """{
      "items": [
        {"id": 1, "price": 5,  "tag": "a", "meta": {"ok": true}},
        {"id": 2, "price": 15, "tag": "b"},
        {"id": 3, "price": 25, "tag": "a", "meta": {"ok": false}},
        {"id": 4, "tag": "c"}
      ]
    }"""
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write(doc)

    def ids(itr):
        df = load_json_source(spark, p, itr)
        return sorted(r["id"] for r in df.collect())

    assert ids("$.items[?(@.price > 10)]") == [2, 3]
    assert ids("$.items[?(@.price <= 15)]") == [1, 2]
    assert ids("$.items[?(@.tag == 'a')]") == [1, 3]
    assert ids('$.items[?(@.tag != "a")]') == [2, 4]
    assert ids("$.items[?(@.price)]") == [1, 2, 3]      # existence
    assert ids("$.items[?(@.meta.ok == true)]") == [1]  # nested path
    assert ids("$.items[?(@.price == null)]") == [4]


def test_jsonpath_filter_connectives(spark, tmp_path):
    """&&/|| in predicates compile to AND/OR Column conditions ('&&' binds
    tighter — OR of ANDs); a term over a field absent from the schema is
    statically false, matching jsonpath no-match semantics."""
    from pyrml_spark.sources import load_json_source

    doc = """{
      "items": [
        {"id": 1, "price": 5,  "tag": "a"},
        {"id": 2, "price": 15, "tag": "b"},
        {"id": 3, "price": 25, "tag": "a"},
        {"id": 4, "tag": "c"}
      ]
    }"""
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write(doc)

    def ids(itr):
        df = load_json_source(spark, p, itr)
        return sorted(r["id"] for r in df.collect())

    assert ids("$.items[?(@.price > 10 && @.tag == 'a')]") == [3]
    assert ids("$.items[?(@.price < 10 || @.price > 20)]") == [1, 3]
    # precedence: parsed as (p>20) OR (p<10 AND tag=='a')
    assert ids(
        "$.items[?(@.price > 20 || @.price < 10 && @.tag == 'a')]") == [1, 3]
    # missing field → term false, never an AnalysisException
    assert ids("$.items[?(@.missing == 1 || @.tag == 'c')]") == [4]
    assert ids("$.items[?(@.missing == 1 && @.tag == 'c')]") == []


def test_jsonpath_filter_grouping_regex_fieldcompare(spark, tmp_path):
    """r6 grammar extensions: parenthesized predicate grouping (distributed
    to DNF at parse time), '=~' regex terms (rlike search semantics), and
    @-to-@ field comparisons; unsupported shapes stay loud."""
    import pytest

    from pyrml_spark.sources import SourceError, load_json_source

    doc = """{
      "items": [
        {"id": 1, "price": 5,  "qty": 9, "tag": "alpha"},
        {"id": 2, "price": 15, "qty": 2, "tag": "beta"},
        {"id": 3, "price": 25, "qty": 25, "tag": "gamma-3"},
        {"id": 4, "qty": 1, "tag": "delta"}
      ]
    }"""
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write(doc)

    def ids(itr):
        df = load_json_source(spark, p, itr)
        return sorted(r["id"] for r in df.collect())

    # grouping flips the default precedence
    assert ids("$.items[?((@.price > 20 || @.price < 10) "
               "&& @.tag == 'alpha')]") == [1]
    assert ids("$.items[?(@.id == 4 || (@.price > 10 "
               "&& @.qty < 5))]") == [2, 4]
    # nested grouping
    assert ids("$.items[?(((@.id == 1 || @.id == 2) && @.price > 10) "
               "|| @.tag == 'delta')]") == [2, 4]
    # regex: search (unanchored) + anchors + class
    assert ids("$.items[?(@.tag =~ 'a$')]") == [1, 2, 4]
    assert ids("$.items[?(@.tag =~ '^g.*-[0-9]$')]") == [3]
    # regex over a non-string field → no match, never an error
    assert ids("$.items[?(@.price =~ 'x')]") == []
    # @-to-@ comparison; missing rhs field → term false
    assert ids("$.items[?(@.qty > @.price)]") == [1]
    assert ids("$.items[?(@.qty == @.price)]") == [3]
    assert ids("$.items[?(@.qty < @.price)]") == [2]
    with pytest.raises(SourceError, match="regex"):
        load_json_source(spark, p, "$.items[?(@.tag =~ 5)]")
    with pytest.raises(SourceError, match="paren|unbalanced"):
        load_json_source(spark, p, "$.items[?((@.id == 1)]")
    with pytest.raises(SourceError, match="rhs|right"):
        load_json_source(spark, p, "$.items[?(@.qty > @.price + 1)]")


def test_jsonpath_filter_empty_array_schema(spark, tmp_path):
    """Empty arrays infer as array<string>; a field-dereferencing predicate
    must yield zero rows, not INVALID_EXTRACT_BASE_FIELD_TYPE (found by the
    hypothesis differential fuzz)."""
    from pyrml_spark.sources import load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"items": []}')
    assert load_json_source(spark, p, "$.items[?(@.v > 0)]").count() == 0


def test_jsonpath_filter_top_level_array(spark, tmp_path):
    """$[?(...)] over a top-level array filters the element rows."""
    from pyrml_spark.sources import load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('[{"id": 1, "v": 2}, {"id": 2, "v": 9}]')
    df = load_json_source(spark, p, "$[?(@.v > 5)]")
    assert [r["id"] for r in df.collect()] == [2]


def test_jsonpath_slices(spark, tmp_path):
    """[a:b] with Python clamp/negative semantics → F.slice + explode."""
    from pyrml_spark.sources import SourceError, load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": [10, 20, 30, 40, 50]}')

    def vals(itr):
        return [r["value"] for r in load_json_source(spark, p, itr).collect()]

    assert vals("$.a[1:3]") == [20, 30]
    assert vals("$.a[:2]") == [10, 20]
    assert vals("$.a[3:]") == [40, 50]
    assert vals("$.a[-2:]") == [40, 50]
    assert vals("$.a[:-3]") == [10, 20]
    assert vals("$.a[1:99]") == [20, 30, 40, 50]  # clamped like Python
    assert vals("$.a[4:2]") == []                 # empty, not an error
    # r7: negative steps — ORDER-sensitive asserts (the differential
    # fuzzer compares sorted node sets, so reversal order is pinned here)
    assert vals("$.a[::-1]") == [50, 40, 30, 20, 10]
    assert vals("$.a[::-2]") == [50, 30, 10]
    assert vals("$.a[3::-2]") == [40, 20]
    assert vals("$.a[:1:-1]") == [50, 40, 30]
    assert vals("$.a[-1:-4:-1]") == [50, 40, 30]
    assert vals("$.a[1:3:-1]") == []              # empty like Python
    assert vals("$.a[99::-2]") == [50, 30, 10]    # clamped like Python
    with pytest.raises(SourceError):
        load_json_source(spark, p, "$[1:3]")      # top-level slice: loud


def test_jsonpath_bracket_quoted_fields(spark, tmp_path):
    """VERDICT r4 #6: $['a b'] / $["a.b"] address fields whose names
    contain spaces or dots."""
    from pyrml_spark.sources import load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"ISO 3166": {"a.b": [{"code": "IT"}, {"code": "FR"}]}}')
    df = load_json_source(spark, p, "$['ISO 3166'][\"a.b\"][*]")
    assert sorted(r["code"] for r in df.collect()) == ["FR", "IT"]


def test_jsonpath_unions(spark, tmp_path):
    """Field unions $['a','b'] and index unions [0,2] (r5): values in
    listed order, missing keys / out-of-range indexes omitted like
    jsonpath_ng; mixed or unquoted unions stay loud."""
    from pyrml_spark.sources import SourceError, load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": {"x": 1, "y": 2, "z": 3}, "arr": [10, 20, 30, 40]}')

    def vals(itr):
        return [r["value"] for r in load_json_source(spark, p, itr).collect()]

    assert vals("$.a['x','z']") == [1, 3]
    assert vals("$.a['z','x']") == [3, 1]          # listed order
    assert vals("$.a['x','nope','y']") == [1, 2]   # missing key omitted
    assert vals("$.arr[0,2]") == [10, 30]
    assert vals("$.arr[3,0]") == [40, 10]
    assert vals("$.arr[1,99]") == [20]             # out of range omitted
    assert vals("$.arr[0,-1]") == [10, 40]         # negative from the end
    with pytest.raises(SourceError, match="match nothing"):
        load_json_source(spark, p, "$.a['nope','gone']")
    with pytest.raises(SourceError, match="union"):
        load_json_source(spark, p, "$.arr[0,'x']")  # mixed: loud


def test_jsonpath_union_incompatible_types_is_loud(spark, tmp_path):
    from pyrml_spark.sources import SourceError, load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": {"x": 1, "y": "s"}}')
    with pytest.raises(SourceError, match="incompatible types"):
        load_json_source(spark, p, "$.a['x','y']")


def test_jsonpath_negative_index(spark, tmp_path):
    """[-1] addresses from the end (Python semantics — plain getItem(-1)
    would silently NULL it)."""
    from pyrml_spark.sources import load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": [10, 20, 30]}')
    assert [r["value"] for r in
            load_json_source(spark, p, "$.a[-1]").collect()] == [30]
    assert [r["value"] for r in
            load_json_source(spark, p, "$.a[0]").collect()] == [10]


def test_jsonpath_descent_missing_field_is_loud(spark, tmp_path):
    from pyrml_spark.sources import SourceError, load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('{"a": 1}')
    with pytest.raises(SourceError, match="no field named"):
        load_json_source(spark, p, "$..nope")


def test_compat_serialize_all_formats(spark, tmp_path):
    """compat.serialize mirrors rdflib Graph.serialize over the reference's
    format list (pyrml_mapper.py:137-140): every format emits parseable
    text with the full triple set."""
    from pyrml_spark.compat import serialize
    from pyrml_spark.nquads import df_to_quads, parse_nquads
    from pyrml_spark.rdfserialize import parse_trig
    from pyrml_spark.rdfxml import parse_rdfxml, parse_trix
    from pyrml_spark.turtle import parse_turtle
    from pyrml_spark.rdfserialize import _term_to_nt

    df = convert(spark, "/root/reference/examples/artists/artist-map.ttl",
                 search_roots=["/root/reference"])
    expected = {(s, p, o) for s, p, o, _g in df_to_quads(df)}

    def turtle_triples(text):
        triples, _b, _p = parse_turtle(text)
        return {(_term_to_nt(s), _term_to_nt(p), _term_to_nt(o))
                for s, p, o in triples}

    parsers = {
        "nt": lambda t: {(s, p, o) for s, p, o, _ in parse_nquads(t)},
        "nquads": lambda t: {(s, p, o) for s, p, o, _ in parse_nquads(t)},
        "turtle": turtle_triples,
        "n3": turtle_triples,
        "trig": lambda t: {(s, p, o) for s, p, o, _ in parse_trig(t)},
        "xml": lambda t: {(s, p, o) for s, p, o, _ in parse_rdfxml(t)},
        "pretty-xml": lambda t: {(s, p, o) for s, p, o, _ in parse_rdfxml(t)},
        "trix": lambda t: {(s, p, o) for s, p, o, _ in parse_trix(t)},
    }
    for fmt, parse in parsers.items():
        text = serialize(df, fmt)
        assert parse(text) == expected, fmt
    # destination write + unsupported format loud
    dest = str(tmp_path / "g.ttl")
    assert serialize(df, "turtle", dest) is None
    assert turtle_triples(open(dest).read()) == expected
    with pytest.raises(ValueError):
        serialize(df, "jsonld")


def test_infer_literal_datatypes(spark, tmp_path):
    """PyRML.INFER_LITERAL_DATATYPES (pyrml_api.py:705, pyrml_core.py:
    277-287): with the flag on, plain rml:reference literals from
    natively-typed source columns (JSON) carry inferred xsd datatypes;
    off (default), they stay plain. All-string sources (CSV) are
    unaffected either way, like the reference's dtype=str reads."""
    import json as _json

    from pyrml_spark.compiler import RMLCompiler
    from pyrml_spark.parse_mapping import parse_mapping

    doc = [{"id": 1, "n": 7, "x": 2.5, "ok": True, "name": "a"}]
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        _json.dump(doc, f)
    mapping = PRELUDE + """
    <#M> rml:logicalSource [ rml:source "%s" ;
        rml:referenceFormulation ql:JSONPath ; rml:iterator "$[*]" ] ;
      rr:subjectMap [ rr:template "http://ex.com/r/{id}" ] ;
      rr:predicateObjectMap [ rr:predicate ex:n ;
        rr:objectMap [ rml:reference "n" ] ] ;
      rr:predicateObjectMap [ rr:predicate ex:x ;
        rr:objectMap [ rml:reference "x" ] ] ;
      rr:predicateObjectMap [ rr:predicate ex:ok ;
        rr:objectMap [ rml:reference "ok" ] ] ;
      rr:predicateObjectMap [ rr:predicate ex:name ;
        rr:objectMap [ rml:reference "name" ] ] .
    """ % p
    plan = parse_mapping(mapping)

    def objs(infer):
        df = RMLCompiler(spark, plan,
                         infer_literal_datatypes=infer).compile()
        return {r["p"]: r["o"] for r in df.collect()}

    xsd = "http://www.w3.org/2001/XMLSchema#"
    on = objs(True)
    assert on["<http://ex.com/n>"] == f'"7"^^<{xsd}integer>'
    assert on["<http://ex.com/x>"] == f'"2.5"^^<{xsd}double>'
    assert on["<http://ex.com/ok>"] == f'"true"^^<{xsd}boolean>'
    assert on["<http://ex.com/name>"] == '"a"'  # string stays plain
    off = objs(False)
    assert off["<http://ex.com/n>"] == '"7"'
    assert off["<http://ex.com/x>"] == '"2.5"'
    assert off["<http://ex.com/ok>"] == '"true"'


def test_sql_source_executes_via_embedded_derby(spark, tmp_path):
    """S6 executed end-to-end: Spark ships Derby (hive-metastore dep), so
    the JDBC source path runs for real — seed an embedded Derby table
    through df.write.jdbc, then map it with d2rq:jdbcDSN + rr:tableName
    (reference pyrml_core.py:939-963). Derby upper-cases identifiers, so
    this also exercises the case-insensitive reference resolution (T2)."""
    from pyrml_spark.compiler import RMLCompiler
    from pyrml_spark.parse_mapping import parse_mapping

    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db};create=true"
    src = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["n_id", "n_name"])
    (src.write.format("jdbc").option("url", url)
        .option("dbtable", "NATION").mode("overwrite").save())

    mapping = PRELUDE + """
    @prefix d2rq: <http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#> .
    <#Sql> rml:logicalSource [
        rml:source [ d2rq:jdbcDSN "jdbc:derby:%s" ] ;
        rr:tableName "NATION" ] ;
      rr:subjectMap [ rr:template "http://ex.com/n/{n_id}" ] ;
      rr:predicateObjectMap [ rr:predicate ex:name ;
        rr:objectMap [ rml:reference "n_name" ] ] .
    """ % db
    plan = parse_mapping(mapping)
    got = {(r["s"], r["p"], r["o"])
           for r in RMLCompiler(spark, plan).compile().collect()}
    assert got == {
        ("<http://ex.com/n/1>", "<http://ex.com/name>", '"alpha"'),
        ("<http://ex.com/n/2>", "<http://ex.com/name>", '"beta"'),
    }


def test_sql_source_query_variant(spark, tmp_path):
    """rr:sqlQuery over the same embedded Derby DB — the query-pushdown
    branch of the JDBC reader (projection + predicate run IN the database,
    reference pyrml_core.py:952 'SELECT * FROM table' default overridden)."""
    from pyrml_spark.compiler import RMLCompiler
    from pyrml_spark.parse_mapping import parse_mapping

    db = str(tmp_path / "derbyq")
    url = f"jdbc:derby:{db};create=true"
    src = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 99), (3, "gamma", 7)],
        ["n_id", "n_name", "n_score"])
    (src.write.format("jdbc").option("url", url)
        .option("dbtable", "SCORES").mode("overwrite").save())

    mapping = PRELUDE + """
    @prefix d2rq: <http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#> .
    <#Q> rml:logicalSource [
        rml:source [ d2rq:jdbcDSN "jdbc:derby:%s" ] ;
        rr:sqlQuery "SELECT \\"n_id\\", \\"n_name\\" FROM SCORES WHERE \\"n_score\\" < 50" ] ;
      rr:subjectMap [ rr:template "http://ex.com/n/{n_id}" ] ;
      rr:predicateObjectMap [ rr:predicate ex:name ;
        rr:objectMap [ rml:reference "n_name" ] ] .
    """ % db
    plan = parse_mapping(mapping)
    got = {(r["s"], r["o"])
           for r in RMLCompiler(spark, plan).compile().collect()}
    assert got == {("<http://ex.com/n/1>", '"alpha"'),
                   ("<http://ex.com/n/3>", '"gamma"')}


def test_jsonpath_filter_top_level_fieldcompare(spark, tmp_path):
    """$[?(@.a > @.b)] over a top-level array: the rhs path must navigate
    from the ROW, not from the lhs column (regression guard for the
    row-leaf base)."""
    from pyrml_spark.sources import load_json_source

    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        f.write('[{"id": 1, "a": 2, "b": 9}, {"id": 2, "a": 9, "b": 2},'
                ' {"id": 3, "a": 5}]')
    df = load_json_source(spark, p, "$[?(@.a > @.b)]")
    assert [r["id"] for r in df.collect()] == [2]
    df2 = load_json_source(spark, p, "$[?(@.id =~ '^[13]$' && @.a < 9)]")
    assert sorted(r["id"] for r in df2.collect()) == []
