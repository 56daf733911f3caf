"""RML mappings over the driver-generated testdata tables, each paired with a
DuckDB-oracle SQL string that emits byte-identical (s,p,o,g) rows.

These are the engine's SURVEY.md §2 operators exercised one by one over
/root/testdata (FIXTURES.md §4): template subjects (T1), references (T2),
constants (T3), rr:class (D4), datatyped literals (T8), language maps (T7),
graph maps/quads (T10), crml:condition (D1), referencing-object-map joins
(D5), function maps + multi-valued fan-out (§2.4 + D2).

Every oracle aliases columns exactly (s, p, o, g) — the driver hash-compares
value sets after sorting columns by name.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .compiler import RMLCompiler
from .parse_mapping import parse_mapping

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_PRELUDE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix crml: <http://w3id.org/stlab/crml#> .
@prefix fnml: <http://semweb.mmlab.be/ns/fnml#> .
@prefix fno: <https://w3id.org/function/ontology#> .
@prefix grel: <http://users.ugent.be/~bjdmeest/function/grel.ttl#> .
@prefix ex: <http://ex.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
"""


def _run(spark: SparkSession, mapping_text: str, sf_dir: str) -> DataFrame:
    plan = parse_mapping(_PRELUDE + mapping_text,
                         template_vars={"sf": sf_dir})
    return RMLCompiler(spark, plan).compile()


# ---------------------------------------------------------------------------
# q: rml_customer_terms — T1/T2/T3/T8/D4 over customer
# ---------------------------------------------------------------------------

_CUSTOMER_MAP = """
<#Customer> rml:logicalSource [ rml:source "{{ sf }}/customer.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/cust/{c_custkey}" ;
                  rr:class ex:Customer ] ;
  rr:predicateObjectMap [ rr:predicate ex:mktsegment ;
    rr:objectMap [ rml:reference "c_mktsegment" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:nation ;
    rr:objectMap [ rr:template "http://ex.com/nation/{c_nationkey}" ;
                   rr:termType rr:IRI ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:acctbal ;
    rr:objectMap [ rml:reference "c_acctbal" ; rr:datatype xsd:decimal ] ] .
"""


def q_customer_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _CUSTOMER_MAP, sf_dir)


ORACLE_CUSTOMER_TERMS = f"""
WITH c AS (SELECT * FROM customer),
dec AS (SELECT c_custkey,
        regexp_replace(
          regexp_replace(
            CAST(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR),
            '(\\.\\d*?)0+$', '\\1'),
          '\\.$', '') AS bal FROM c)
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/cust/' || c_custkey || '>' AS s,
         '<{RDF_TYPE}>' AS p, '<http://ex.com/Customer>' AS o,
         CAST(NULL AS VARCHAR) AS g FROM c
  UNION ALL
  SELECT '<http://ex.com/cust/' || c_custkey || '>',
         '<http://ex.com/mktsegment>', '"' || c_mktsegment || '"', NULL FROM c
  UNION ALL
  SELECT '<http://ex.com/cust/' || c_custkey || '>',
         '<http://ex.com/nation>',
         '<http://ex.com/nation/' || c_nationkey || '>', NULL FROM c
  UNION ALL
  SELECT '<http://ex.com/cust/' || c.c_custkey || '>',
         '<http://ex.com/acctbal>',
         '"' || dec.bal || '"^^<{XSD}decimal>', NULL
  FROM c JOIN dec ON c.c_custkey = dec.c_custkey
)
"""

# ---------------------------------------------------------------------------
# q: rml_orders_customer_join — D5 referencing object map (broadcast join)
# ---------------------------------------------------------------------------

_ORDERS_JOIN_MAP = """
<#Order> rml:logicalSource [ rml:source "{{ sf }}/orders.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/order/{o_orderkey}" ;
                  rr:class ex:Order ] ;
  rr:predicateObjectMap [ rr:predicate ex:customer ;
    rr:objectMap [ rr:parentTriplesMap <#Cust> ;
      rr:joinCondition [ rr:child "o_custkey" ; rr:parent "c_custkey" ] ] ] .

<#Cust> rml:logicalSource [ rml:source "{{ sf }}/customer.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/cust/{c_custkey}" ] .
"""


def q_orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _ORDERS_JOIN_MAP, sf_dir)


ORACLE_ORDERS_JOIN = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/order/' || o_orderkey || '>' AS s,
         '<{RDF_TYPE}>' AS p, '<http://ex.com/Order>' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM orders
  UNION ALL
  SELECT '<http://ex.com/order/' || o.o_orderkey || '>',
         '<http://ex.com/customer>',
         '<http://ex.com/cust/' || c.c_custkey || '>', NULL
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
"""

# ---------------------------------------------------------------------------
# q: rml_condition_filter — D1 crml:condition (translated, never eval)
# ---------------------------------------------------------------------------

_CONDITION_MAP = """
<#ErrEvents> rml:logicalSource [ rml:source "{{ sf }}/events.parquet" ] ;
  crml:condition "df['event_type'] == 'error'" ;
  rr:subjectMap [ rr:template "http://ex.com/event/{event_id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:user ;
    rr:objectMap [ rr:template "http://ex.com/user/{user_id}" ;
                   rr:termType rr:IRI ] ] .
"""


def q_condition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _CONDITION_MAP, sf_dir)


ORACLE_CONDITION = """
SELECT DISTINCT
  '<http://ex.com/event/' || event_id || '>' AS s,
  '<http://ex.com/user>' AS p,
  '<http://ex.com/user/' || user_id || '>' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM events WHERE event_type = 'error'
"""

# ---------------------------------------------------------------------------
# q: rml_datatyped_literals — T8 XSD canonicalization (date from timestamp)
# ---------------------------------------------------------------------------

_DATATYPE_MAP = """
<#OrderDates> rml:logicalSource [ rml:source "{{ sf }}/orders.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/order/{o_orderkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:orderDate ;
    rr:objectMap [ rml:reference "o_orderdate" ; rr:datatype xsd:date ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:status ;
    rr:objectMap [ rml:reference "o_orderstatus" ] ] .
"""


def q_datatyped_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _DATATYPE_MAP, sf_dir)


ORACLE_DATATYPED = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/order/' || o_orderkey || '>' AS s,
         '<http://ex.com/orderDate>' AS p,
         '"' || strftime(o_orderdate, '%Y-%m-%d') || '"^^<{XSD}date>' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM orders
  UNION ALL
  SELECT '<http://ex.com/order/' || o_orderkey || '>',
         '<http://ex.com/status>', '"' || o_orderstatus || '"', NULL
  FROM orders
)
"""

# ---------------------------------------------------------------------------
# q: rml_graph_quads — T10 named-graph quads
# ---------------------------------------------------------------------------

_QUADS_MAP = """
<#Supplier> rml:logicalSource [ rml:source "{{ sf }}/supplier.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/supp/{s_suppkey}" ;
                  rr:graph ex:suppliers ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "s_name" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:nation ;
    rr:objectMap [ rr:template "http://ex.com/nation/{s_nationkey}" ;
                   rr:termType rr:IRI ] ;
    rr:graph ex:supplier_nations ] .
"""


def q_graph_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _QUADS_MAP, sf_dir)


ORACLE_QUADS = """
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/supp/' || s_suppkey || '>' AS s,
         '<http://ex.com/name>' AS p, '"' || s_name || '"' AS o,
         '<http://ex.com/suppliers>' AS g
  FROM supplier
  UNION ALL
  SELECT '<http://ex.com/supp/' || s_suppkey || '>',
         '<http://ex.com/nation>',
         '<http://ex.com/nation/' || s_nationkey || '>',
         g
  FROM supplier, (VALUES ('<http://ex.com/suppliers>'),
                         ('<http://ex.com/supplier_nations>')) t(g)
)
"""

# ---------------------------------------------------------------------------
# q: rml_language_map — T7 per-row language tags
# ---------------------------------------------------------------------------

_LANG_MAP = """
<#DocLang> rml:logicalSource [ rml:source "{{ sf }}/documents.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/doc/{doc_id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:sourceLabel ;
    rr:objectMap [ rml:reference "source" ;
                   rml:languageMap [ rml:reference "lang" ] ] ] .
"""


def q_language_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _LANG_MAP, sf_dir)


ORACLE_LANG = """
SELECT DISTINCT
  '<http://ex.com/doc/' || doc_id || '>' AS s,
  '<http://ex.com/sourceLabel>' AS p,
  '"' || source || '"@' || lang AS o,
  CAST(NULL AS VARCHAR) AS g
FROM documents
"""

# ---------------------------------------------------------------------------
# q: rml_function_map — §2.4 function maps (toLowerCase, string_md5)
# ---------------------------------------------------------------------------

_FUNCTION_MAP = """
<#CustFn> rml:logicalSource [ rml:source "{{ sf }}/customer.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/cust/{c_custkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:nameLower ;
    rr:objectMap [ fnml:functionValue [
      rr:predicateObjectMap [ rr:predicate fno:executes ;
        rr:objectMap [ rr:constant grel:toLowerCase ] ] ;
      rr:predicateObjectMap [ rr:predicate grel:valueParameter ;
        rr:objectMap [ rml:reference "c_name" ] ]
    ] ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:nameMd5 ;
    rr:objectMap [ fnml:functionValue [
      rr:predicateObjectMap [ rr:predicate fno:executes ;
        rr:objectMap [ rr:constant grel:string_md5 ] ] ;
      rr:predicateObjectMap [ rr:predicate grel:valueParameter ;
        rr:objectMap [ rml:reference "c_name" ] ]
    ] ] ] .
"""


def q_function_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _FUNCTION_MAP, sf_dir)


ORACLE_FUNCTION = """
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/cust/' || c_custkey || '>' AS s,
         '<http://ex.com/nameLower>' AS p,
         '"' || lower(c_name) || '"' AS o, CAST(NULL AS VARCHAR) AS g
  FROM customer
  UNION ALL
  SELECT '<http://ex.com/cust/' || c_custkey || '>',
         '<http://ex.com/nameMd5>', '"' || md5(c_name) || '"', NULL
  FROM customer
)
"""

# ---------------------------------------------------------------------------
# q: rml_multivalued_split — D2 multi-valued fan-out via grel:string_split
# ---------------------------------------------------------------------------

_SPLIT_MAP = """
<#DocTokens> rml:logicalSource [ rml:source "{{ sf }}/documents.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/doc/{doc_id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:token ;
    rr:objectMap [ fnml:functionValue [
      rr:predicateObjectMap [ rr:predicate fno:executes ;
        rr:objectMap [ rr:constant grel:string_split ] ] ;
      rr:predicateObjectMap [ rr:predicate grel:valueParameter ;
        rr:objectMap [ rml:reference "text" ] ] ;
      rr:predicateObjectMap [ rr:predicate grel:p_string_sep ;
        rr:objectMap [ rr:constant " " ] ]
    ] ] ] .
"""


def q_multivalued_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _SPLIT_MAP, sf_dir)


ORACLE_SPLIT = """
SELECT DISTINCT
  '<http://ex.com/doc/' || doc_id || '>' AS s,
  '<http://ex.com/token>' AS p,
  '"' || t.tok || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM documents, unnest(string_split(documents.text, ' ')) AS t(tok)
"""


# ---------------------------------------------------------------------------
# q: rml_bnode_terms — T5 deterministic blank-node subjects
# ---------------------------------------------------------------------------

_BNODE_MAP = """
<#NatB> rml:logicalSource [ rml:source "{{ sf }}/nation.parquet" ] ;
  rr:subjectMap [ rr:template "nat-{n_nationkey}" ; rr:termType rr:BlankNode ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "n_name" ] ] .
"""


def q_bnode_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _BNODE_MAP, sf_dir)


# bnode labels: template value with non-alphanumerics → '_'
# (deterministic across runs/partitions, unlike the reference's rdflib BNode)
ORACLE_BNODE = """
SELECT DISTINCT
  '_:nat_' || n_nationkey AS s,
  '<http://ex.com/name>' AS p,
  '"' || n_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM nation
"""

# ---------------------------------------------------------------------------
# q: rml_constant_language — T6 constant language tag
# ---------------------------------------------------------------------------

_CONST_LANG_MAP = """
<#NatL> rml:logicalSource [ rml:source "{{ sf }}/nation.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:label ;
    rr:objectMap [ rml:reference "n_name" ; rr:language "en" ] ] .
"""


def q_constant_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _CONST_LANG_MAP, sf_dir)


ORACLE_CONST_LANG = """
SELECT DISTINCT
  '<http://ex.com/nation/' || n_nationkey || '>' AS s,
  '<http://ex.com/label>' AS p,
  '"' || n_name || '"@en' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM nation
"""

# ---------------------------------------------------------------------------
# q: rml_base_resolution — T13 @base resolution + invalid-IRI drop
#    ('MIDDLE EAST' contains a space ⇒ the resolved IRI fails the validity
#     regex and the triple is dropped, reference pyrml_mapper.py:164-194)
# ---------------------------------------------------------------------------

_BASE_MAP = """
@base <http://base.org/kg/> .
<#RegB> rml:logicalSource [ rml:source "{{ sf }}/region.parquet" ] ;
  rr:subjectMap [ rr:template "region/{r_regionkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:nameIri ;
    rr:objectMap [ rml:reference "r_name" ; rr:termType rr:IRI ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "r_name" ] ] .
"""


def q_base_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _BASE_MAP, sf_dir)


# the engine's IRI validity regex, applied to the base-resolved value
_IRI_VALID_SQL = r"""'^[A-Za-z][A-Za-z0-9+.\-]*:[^\s"<>{}|\\^`]*$'"""

ORACLE_BASE = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://base.org/kg/region/' || r_regionkey || '>' AS s,
         '<http://ex.com/nameIri>' AS p,
         '<http://base.org/kg/' || r_name || '>' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM region
  WHERE regexp_matches('http://base.org/kg/' || r_name, {_IRI_VALID_SQL})
  UNION ALL
  SELECT '<http://base.org/kg/region/' || r_regionkey || '>',
         '<http://ex.com/name>', '"' || r_name || '"', NULL
  FROM region
)
"""

# ---------------------------------------------------------------------------
# q: rml_eval_template — T14 %eval:fun(args)% inline expressions
# ---------------------------------------------------------------------------

_EVAL_MAP = """
<#NatE> rml:logicalSource [ rml:source "{{ sf }}/nation.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:slug ;
    rr:objectMap [ rr:template "n-%eval:toLowerCase('{n_name}')%" ;
                   rr:termType rr:Literal ] ] .
"""


def q_eval_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _EVAL_MAP, sf_dir)


ORACLE_EVAL = """
SELECT DISTINCT
  '<http://ex.com/nation/' || n_nationkey || '>' AS s,
  '<http://ex.com/slug>' AS p,
  '"n-' || lower(n_name) || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM nation
"""

# ---------------------------------------------------------------------------
# q: rml_samesource_rom — D6 join-less referencing object map (shared source:
#    parent subject expression applied directly to child rows, no join)
# ---------------------------------------------------------------------------

_SAMESOURCE_MAP = """
<#OrderS> rml:logicalSource [ rml:source "{{ sf }}/orders.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/order/{o_orderkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:custRef ;
    rr:objectMap [ rr:parentTriplesMap <#CustS> ] ] .

<#CustS> rml:logicalSource [ rml:source "{{ sf }}/orders.parquet" ] ;
  rr:subjectMap [ rr:template "http://ex.com/cust/{o_custkey}" ] .
"""


def q_samesource_rom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, _SAMESOURCE_MAP, sf_dir)


ORACLE_SAMESOURCE = """
SELECT DISTINCT
  '<http://ex.com/order/' || o_orderkey || '>' AS s,
  '<http://ex.com/custRef>' AS p,
  '<http://ex.com/cust/' || o_custkey || '>' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM orders
"""

# ---------------------------------------------------------------------------
# q: rml_csv_source / rml_json_source — S1/S3 exercised end to end in the
# driver: the query materializes a deterministic CSV/JSON copy of a testdata
# table (idempotent, keyed on sf_dir) and maps THAT; the oracle reads the
# original parquet view, so the comparison covers the source decoding
# (all-string CSV columns, JSON native scalars + iterator) too.
# ---------------------------------------------------------------------------


def _derived_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"pyrml_srcgen_{key}")
    os.makedirs(d, exist_ok=True)
    return d


def _nation_csv(spark: SparkSession, sf_dir: str) -> str:
    import csv

    path = os.path.join(_derived_dir(sf_dir), "nation.csv")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .orderBy("n_nationkey").collect()
        )
        tmp = path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["n_nationkey", "n_name", "n_regionkey"])
            for r in rows:
                w.writerow([r["n_nationkey"], r["n_name"], r["n_regionkey"]])
        os.replace(tmp, path)
    return path


def _region_json(spark: SparkSession, sf_dir: str) -> str:
    import json

    path = os.path.join(_derived_dir(sf_dir), "region.json")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .orderBy("r_regionkey").collect()
        )
        doc = {"regions": [
            {"id": r["r_regionkey"], "name": r["r_name"]} for r in rows
        ]}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    return path


def _region_csv_semicolon(spark: SparkSession, sf_dir: str) -> str:
    import csv

    path = os.path.join(_derived_dir(sf_dir), "region_semi.csv")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .orderBy("r_regionkey").collect()
        )
        tmp = path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(["r_regionkey", "r_name"])
            for r in rows:
                w.writerow([r["r_regionkey"], r["r_name"]])
        os.replace(tmp, path)
    return path


_CSVW_SOURCE_MAP = """
@prefix csvw: <http://www.w3.org/ns/csvw#> .
<#RegCsvw> rml:logicalSource [
    rml:source [ csvw:url "{{ csvw_path }}" ;
                 csvw:dialect [ csvw:delimiter ";" ] ] ;
    rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/region/{r_regionkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "r_name" ] ] .
"""


def q_csvw_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 in the driver: csvw:url + csvw:dialect non-default delimiter."""
    path = _region_csv_semicolon(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _CSVW_SOURCE_MAP,
                         template_vars={"csvw_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_CSVW_SOURCE = """
SELECT DISTINCT
  '<http://ex.com/region/' || r_regionkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || r_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM region
"""


_CSV_SOURCE_MAP = """
<#NatCsv> rml:logicalSource [ rml:source "{{ csv_path }}" ;
                              rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "n_name" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:region ;
    rr:objectMap [ rml:reference "n_regionkey" ;
                   rr:datatype xsd:integer ] ] .
"""


def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _CSV_SOURCE_MAP,
                         template_vars={"csv_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_CSV_SOURCE = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/nation/' || n_nationkey || '>' AS s,
         '<http://ex.com/name>' AS p, '"' || n_name || '"' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM nation
  UNION ALL
  SELECT '<http://ex.com/nation/' || n_nationkey || '>',
         '<http://ex.com/region>',
         '"' || n_regionkey || '"^^<{XSD}integer>', NULL
  FROM nation
)
"""

_JSON_SOURCE_MAP = """
<#RegJson> rml:logicalSource [ rml:source "{{ json_path }}" ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$.regions[*]" ] ;
  rr:subjectMap [ rr:template "http://ex.com/region/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name" ] ] .
"""


def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _region_json(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _JSON_SOURCE_MAP,
                         template_vars={"json_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_JSON_SOURCE = """
SELECT DISTINCT
  '<http://ex.com/region/' || r_regionkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || r_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM region
"""


def _nation_nested_json(spark: SparkSession, sf_dir: str) -> str:
    """Deeply nested doc: nation objects live two array levels down, so a
    plain ``$.a.b[*]`` iterator can't reach them — only ``$..nation``."""
    import json

    path = os.path.join(_derived_dir(sf_dir), "nation_nested.json")
    if not os.path.exists(path):
        nations = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .orderBy("n_nationkey").collect()
        )
        regions = (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .orderBy("r_regionkey").collect()
        )
        doc = {"world": {"regions": [
            {"name": reg["r_name"],
             "nations": [
                 {"nation": {"n_nationkey": n["n_nationkey"],
                             "n_name": n["n_name"]}}
                 for n in nations if n["n_regionkey"] == reg["r_regionkey"]
             ]}
            for reg in regions
        ]}}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    return path


_JSON_DESCENT_MAP = """
<#NatDescent> rml:logicalSource [ rml:source "{{ json_path }}" ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$..nation" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "n_name" ] ] .
"""


def q_json_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+: JSONPath recursive descent ``$..name`` (round-4 grammar
    extension) — schema-driven union of static column programs."""
    path = _nation_nested_json(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _JSON_DESCENT_MAP,
                         template_vars={"json_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_JSON_DESCENT = """
SELECT DISTINCT
  '<http://ex.com/nation/' || n_nationkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || n_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM nation
"""


def _nation_typed_json(spark: SparkSession, sf_dir: str) -> str:
    """Nation rows as a JSON array with NATIVE scalar types (int keys) —
    the INFER_LITERAL_DATATYPES surface (typed literals from source
    column types, reference pyrml_core.py:277-287)."""
    import json

    path = os.path.join(_derived_dir(sf_dir), "nation_typed.json")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .orderBy("n_nationkey").collect()
        )
        doc = [{"n_nationkey": int(r["n_nationkey"]),
                "n_name": r["n_name"],
                "n_regionkey": int(r["n_regionkey"])} for r in rows]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    return path


_JSON_TYPED_MAP = """
<#NatTyped> rml:logicalSource [ rml:source "{{ json_path }}" ;
    rml:referenceFormulation ql:JSONPath ; rml:iterator "$[*]" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "n_name" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:region ;
    rr:objectMap [ rml:reference "n_regionkey" ] ] .
"""


def q_json_typed_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8+/1.2: INFER_LITERAL_DATATYPES on — the bigint n_regionkey column
    yields xsd:integer literals with NO rr:datatype in the mapping; the
    string n_name stays plain."""
    path = _nation_typed_json(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _JSON_TYPED_MAP,
                         template_vars={"json_path": path})
    return RMLCompiler(spark, plan, infer_literal_datatypes=True).compile()


ORACLE_JSON_TYPED = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/nation/' || n_nationkey || '>' AS s,
         '<http://ex.com/name>' AS p, '"' || n_name || '"' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM nation
  UNION ALL
  SELECT '<http://ex.com/nation/' || n_nationkey || '>',
         '<http://ex.com/region>',
         '"' || n_regionkey || '"^^<{XSD}integer>', NULL
  FROM nation
)
"""


def _nation_filter_json(spark: SparkSession, sf_dir: str) -> str:
    """Nation rows under a SPACED top-level key ('nation list') so the
    iterator needs both a bracket-quoted field step and a filter
    predicate — S3 grammar extensions of round 5."""
    import json

    path = os.path.join(_derived_dir(sf_dir), "nation_filter.json")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .orderBy("n_nationkey").collect()
        )
        doc = {"nation list": [
            {"n_nationkey": int(r["n_nationkey"]),
             "n_name": r["n_name"],
             "n_regionkey": int(r["n_regionkey"])} for r in rows
        ]}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    return path


_JSON_FILTER_MAP = """
<#NatFilter> rml:logicalSource [ rml:source "{{ json_path }}" ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$['nation list'][?(@.n_regionkey > 2)]" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "n_name" ] ] .
"""


def q_json_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+ (round 5): JSONPath filter predicate ``[?(@.f > lit)]`` compiled
    to ``F.filter`` + ``explode`` (reference accepts full jsonpath_ng,
    pyrml_core.py:886-894), plus a bracket-quoted field step ``$['a b']``."""
    path = _nation_filter_json(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _JSON_FILTER_MAP,
                         template_vars={"json_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_JSON_FILTER = """
SELECT DISTINCT
  '<http://ex.com/nation/' || n_nationkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || n_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM nation
WHERE n_regionkey > 2
"""


def _region_derby(spark: SparkSession, sf_dir: str) -> str:
    """Region rows seeded into an embedded Derby database (the JDBC driver
    Spark ships for its hive metastore) — S6 executed in the driver harness,
    not just parse-tested. Idempotent per sf_dir; Derby embedded is
    single-JVM but the driver runs queries sequentially in one session."""
    db = os.path.join(_derived_dir(sf_dir), "derby_region")
    marker = db + ".seeded"
    if not os.path.exists(marker):
        rows = spark.read.parquet(f"{sf_dir}/region.parquet") \
            .select("r_regionkey", "r_name")
        (rows.write.format("jdbc")
             .option("url", f"jdbc:derby:{db};create=true")
             .option("dbtable", "REGION").mode("overwrite").save())
        with open(marker, "w") as f:
            f.write("ok")
    return db


_SQL_SOURCE_MAP = """
@prefix d2rq: <http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#> .
<#RegSql> rml:logicalSource [
    rml:source [ d2rq:jdbcDSN "jdbc:derby:{{ derby_db }}" ] ;
    rr:tableName "REGION" ] ;
  rr:subjectMap [ rr:template "http://ex.com/region/{r_regionkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "r_name" ] ] .
"""


def q_sql_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 in the driver: d2rq:jdbcDSN (reference source-node shape,
    pyrml_core.py:1630) + rr:tableName over embedded Derby; Derby's
    upper-cased identifiers exercise case-insensitive references (T2)."""
    db = _region_derby(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _SQL_SOURCE_MAP,
                         template_vars={"derby_db": db})
    return RMLCompiler(spark, plan).compile()


ORACLE_SQL_SOURCE = """
SELECT DISTINCT
  '<http://ex.com/region/' || r_regionkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || r_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM region
"""


# loopback SPARQL endpoints serving the region table, one per sf_dir;
# daemon-threaded so they die with the driver process
_SPARQL_ENDPOINTS: Dict[str, str] = {}


def _region_sparql_endpoint(spark: SparkSession, sf_dir: str) -> str:
    """Start (once per sf_dir) a loopback HTTP server that answers any
    SPARQL protocol POST with the region table as SPARQL 1.1 JSON results
    — the S5 shape the reference consumes via SPARQLWrapper
    (pyrml_core.py:906-938), here backed by the same deterministic
    testdata the oracle reads, so the driver's DuckDB comparison closes
    end-to-end over a real HTTP round-trip."""
    url = _SPARQL_ENDPOINTS.get(sf_dir)
    if url:
        return url
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    rows = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .orderBy("r_regionkey").collect()
    )
    payload = json.dumps({
        "head": {"vars": ["key", "name"]},
        "results": {"bindings": [
            {"key": {"type": "literal", "value": str(r["r_regionkey"])},
             "name": {"type": "literal", "value": r["r_name"]}}
            for r in rows
        ]},
    }).encode("utf-8")

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/sparql-results+json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    _SPARQL_ENDPOINTS[sf_dir] = url
    return url


_SPARQL_SOURCE_MAP = """
@prefix sd: <http://www.w3.org/ns/sparql-service-description#> .
<#Sparql> rml:logicalSource [
    rml:source [ sd:endpoint <{{ endpoint }}> ] ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$.results.bindings[*]" ;
    rml:query "SELECT ?key ?name WHERE { ?r ex:key ?key ; ex:name ?name }"
  ] ;
  rr:subjectMap [ rr:template "http://ex.com/region/{key.value}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name.value" ] ] .
"""


def q_sparql_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 in the driver: sd:endpoint + rml:query over a loopback SPARQL
    endpoint (reference SPARQLSource, pyrml_core.py:1748-1766); the JSON
    bindings flatten to dotted `var.value` columns the term maps then
    reference, exactly like the reference's json_normalize."""
    endpoint = _region_sparql_endpoint(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _SPARQL_SOURCE_MAP,
                         template_vars={"endpoint": endpoint})
    return RMLCompiler(spark, plan).compile()


ORACLE_SPARQL_SOURCE = """
SELECT DISTINCT
  '<http://ex.com/region/' || r_regionkey || '>' AS s,
  '<http://ex.com/name>' AS p,
  '"' || r_name || '"' AS o,
  CAST(NULL AS VARCHAR) AS g
FROM region
"""


def _nation_xml(spark: SparkSession, sf_dir: str) -> str:
    from xml.sax.saxutils import escape, quoteattr

    path = os.path.join(_derived_dir(sf_dir), "nation.xml")
    if not os.path.exists(path):
        rows = (
            spark.read.parquet(f"{sf_dir}/nation.parquet")
            .orderBy("n_nationkey").collect()
        )
        parts = ["<nations xmlns:t=\"http://ex.com/tpch\">"]
        for r in rows:
            parts.append(
                f"<t:nation key={quoteattr(str(r['n_nationkey']))}>"
                f"<t:name>{escape(r['n_name'])}</t:name>"
                f"<t:region>{r['n_regionkey']}</t:region>"
                "</t:nation>"
            )
        parts.append("</nations>")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("".join(parts))
        os.replace(tmp, path)
    return path


_XML_SOURCE_MAP = """
<#NatXml> rml:logicalSource [ rml:source "{{ xml_path }}" ;
    rml:referenceFormulation ql:XPath ;
    rml:iterator "/nations/t:nation" ] ;
  rr:subjectMap [ rr:template "http://ex.com/nation/{key}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rml:reference "name" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:region ;
    rr:objectMap [ rml:reference "region" ;
                   rr:datatype xsd:integer ] ] .
"""


def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 in the driver: namespaced XML, executor-side distributed parse."""
    path = _nation_xml(spark, sf_dir)
    plan = parse_mapping(_PRELUDE + _XML_SOURCE_MAP,
                         template_vars={"xml_path": path})
    return RMLCompiler(spark, plan).compile()


ORACLE_XML_SOURCE = f"""
SELECT DISTINCT s, p, o, g FROM (
  SELECT '<http://ex.com/nation/' || n_nationkey || '>' AS s,
         '<http://ex.com/name>' AS p, '"' || n_name || '"' AS o,
         CAST(NULL AS VARCHAR) AS g
  FROM nation
  UNION ALL
  SELECT '<http://ex.com/nation/' || n_nationkey || '>',
         '<http://ex.com/region>',
         '"' || n_regionkey || '"^^<{XSD}integer>', NULL
  FROM nation
)
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

RML_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rml_customer_terms": q_customer_terms,
    "rml_orders_customer_join": q_orders_customer_join,
    "rml_condition_filter": q_condition_filter,
    "rml_datatyped_literals": q_datatyped_literals,
    "rml_graph_quads": q_graph_quads,
    "rml_language_map": q_language_map,
    "rml_function_map": q_function_map,
    "rml_multivalued_split": q_multivalued_split,
    "rml_bnode_terms": q_bnode_terms,
    "rml_constant_language": q_constant_language,
    "rml_base_resolution": q_base_resolution,
    "rml_eval_template": q_eval_template,
    "rml_samesource_rom": q_samesource_rom,
    "rml_csv_source": q_csv_source,
    "rml_csvw_source": q_csvw_source,
    "rml_json_source": q_json_source,
    "rml_json_descent": q_json_descent,
    "rml_json_filter": q_json_filter,
    "rml_json_typed_literals": q_json_typed_literals,
    "rml_sql_source": q_sql_source,
    "rml_sparql_source": q_sparql_source,
    "rml_xml_source": q_xml_source,
}

RML_ORACLES: Dict[str, str] = {
    "rml_customer_terms": ORACLE_CUSTOMER_TERMS,
    "rml_orders_customer_join": ORACLE_ORDERS_JOIN,
    "rml_condition_filter": ORACLE_CONDITION,
    "rml_datatyped_literals": ORACLE_DATATYPED,
    "rml_graph_quads": ORACLE_QUADS,
    "rml_language_map": ORACLE_LANG,
    "rml_function_map": ORACLE_FUNCTION,
    "rml_multivalued_split": ORACLE_SPLIT,
    "rml_bnode_terms": ORACLE_BNODE,
    "rml_constant_language": ORACLE_CONST_LANG,
    "rml_base_resolution": ORACLE_BASE,
    "rml_eval_template": ORACLE_EVAL,
    "rml_samesource_rom": ORACLE_SAMESOURCE,
    "rml_csv_source": ORACLE_CSV_SOURCE,
    "rml_csvw_source": ORACLE_CSVW_SOURCE,
    "rml_json_source": ORACLE_JSON_SOURCE,
    "rml_json_descent": ORACLE_JSON_DESCENT,
    "rml_json_filter": ORACLE_JSON_FILTER,
    "rml_json_typed_literals": ORACLE_JSON_TYPED,
    "rml_sql_source": ORACLE_SQL_SOURCE,
    "rml_sparql_source": ORACLE_SPARQL_SOURCE,
    "rml_xml_source": ORACLE_XML_SOURCE,
}
