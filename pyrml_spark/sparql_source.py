"""SPARQL-endpoint logical source (SURVEY.md §2.1 S5).

Reference behavior (``pyrml_core.py:906-938``): SPARQLWrapper posts
``rml:query`` to ``sd:endpoint``, decodes per ``sd:resultFormat``
(JSON default, CSV/TSV/XML), applies the ``rml:iterator`` JSONPath/XPath to
the decoded payload, and ``pd.json_normalize``-flattens into dotted columns
(so term maps reference ``name.value``). Source shape:
``rml:source [ sd:endpoint <url> ; sd:resultFormat formats:… ]`` +
``rml:query`` on the logical source (``pyrml_core.py:1748-1766``).

Spark-first design, two paths:

* **Single fetch (default)** — one stdlib-``urllib`` POST on the driver,
  decoded and flattened, then ``spark.createDataFrame``. A mapping-source
  SPARQL query is a *dimension* feed (like the JDBC source): the endpoint
  is the bottleneck, not Spark, and OFFSET pagination without a total
  ORDER BY is not stable across requests, so one request is the correct
  default. The resulting (small) DataFrame then broadcasts into the
  mapping joins like any other dimension.
* **Paged fan-out (``page_size=N``)** — for large result sets: the driver
  runs ``SELECT (COUNT(*) AS ?n) WHERE { {query} }`` once, plans
  ``ceil(n / N)`` LIMIT/OFFSET windows over the subquery-wrapped form (a
  SPARQL 1.1 subquery), and EXECUTORS fetch pages in parallel inside
  ``mapInPandas`` — bandwidth scales with the cluster, rows never pass
  through the driver. Guarded: a query that already carries
  LIMIT/OFFSET/ORDER cannot be wrapped (semantics would change) and falls
  back to the single fetch with a warning. Page order within a page set is
  endpoint-stable only if the endpoint evaluates the subquery
  deterministically — the same caveat every SPARQL pagination client
  (e.g. Jena's QueryEngineHTTP users) carries; RML semantics are
  row-set-based so triple OUTPUT is unaffected by row order.

No third-party client: requests are plain ``application/sparql-query``
POSTs with an Accept header per result format, stdlib-only so executors
need no extra packages.
"""

from __future__ import annotations

import csv
import io
import json
import math
import re
import urllib.request
import warnings
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = "http://www.w3.org/ns/formats/"
_ACCEPT = {
    "json": "application/sparql-results+json",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
    "xml": "application/sparql-results+xml",
}


def _format_key(result_format: Optional[str]) -> str:
    """sd:resultFormat IRI → json|csv|tsv|xml (JSON default, like the
    reference's SPARQLWrapper setup)."""
    if not result_format:
        return "json"
    tail = result_format.rsplit("/", 1)[-1].lower()
    for key in ("json", "csv", "tsv", "xml"):
        if key in tail:
            return key
    raise ValueError(f"unsupported sd:resultFormat {result_format!r}")


def fetch_sparql(endpoint: str, query: str, fmt: str,
                 timeout: float = 120.0) -> str:
    """One SPARQL protocol POST (application/sparql-query body)."""
    req = urllib.request.Request(
        endpoint,
        data=query.encode("utf-8"),
        headers={"Content-Type": "application/sparql-query",
                 "Accept": _ACCEPT[fmt]},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset)


# ---------------------------------------------------------------------------
# payload decoding → (columns, rows-of-str)
# ---------------------------------------------------------------------------


def _eval_jsonpath_py(obj, steps: List[tuple]) -> List:
    """Driver-side evaluator of the repo's JSONPath subset over decoded
    Python objects — same steps :func:`sources._parse_jsonpath_steps`
    produces, so the SPARQL source accepts exactly the iterator grammar the
    JSON source does (the reference feeds both through ``jsonpath_ng``)."""
    nodes = [obj]
    for kind, arg in steps:
        nxt: List = []
        if kind == "field":
            for n in nodes:
                if isinstance(n, dict) and arg in n:
                    nxt.append(n[arg])
        elif kind == "explode":
            for n in nodes:
                if isinstance(n, list):
                    nxt.extend(n)
        elif kind == "index":
            for n in nodes:
                if isinstance(n, list) and -len(n) <= arg < len(n):
                    nxt.append(n[arg])
        elif kind == "slice":
            a, b, s = arg
            for n in nodes:
                if isinstance(n, list):
                    nxt.extend(n[a:b:s])
        elif kind == "union_fields":
            for n in nodes:
                if isinstance(n, dict):
                    nxt.extend(n[f] for f in arg if f in n)
        elif kind == "union_indexes":
            for n in nodes:
                if isinstance(n, list):
                    nxt.extend(n[i] for i in arg
                               if -len(n) <= i < len(n))
        elif kind == "filter":
            def _dig(el, fields):
                v = el
                for fld in fields:
                    if isinstance(fld, int):
                        v = (v[fld] if isinstance(v, list)
                             and -len(v) <= fld < len(v) else None)
                    else:
                        v = v.get(fld) if isinstance(v, dict) else None
                return v

            def _term(el, fields, op, lit):
                from .sources import _REF
                if isinstance(lit, tuple) and lit and lit[0] == _REF:
                    rv = _dig(el, lit[1])
                    if rv is None:
                        return False
                    return _py_pred(_dig(el, fields), op, rv)
                return _py_pred(_dig(el, fields), op, lit)

            for n in nodes:
                if not isinstance(n, list):
                    continue
                for el in n:
                    if any(all(_term(el, fields, op, lit)
                               for fields, op, lit in conj)
                           for conj in arg):
                        nxt.append(el)
        elif kind == "descend":
            def walk(x):
                if isinstance(x, dict):
                    for k, v in x.items():
                        if k == arg:
                            nxt.append(v)
                        walk(v)
                elif isinstance(x, list):
                    for v in x:
                        walk(v)
            for n in nodes:
                walk(n)
        nodes = nxt
    return nodes


def _py_pred(v, op, lit) -> bool:
    if op is None:
        return v is not None
    if lit is None:
        return (v is None) if op == "==" else (v is not None)
    if v is None:
        return False
    if op == "=~":
        if not isinstance(v, str):
            return False
        import re as _re

        return _re.search(lit, v) is not None
    try:
        if op == "==":
            return v == lit
        if op == "!=":
            return v != lit
        if op == "<":
            return v < lit
        if op == "<=":
            return v <= lit
        if op == ">":
            return v > lit
        if op == ">=":
            return v >= lit
    except TypeError:
        return False
    return False


def _flatten(d, prefix: str = "") -> Dict[str, str]:
    """pd.json_normalize-style dotted flattening, values stringified (the
    reference reads every tabular source dtype=str)."""
    out: Dict[str, str] = {}
    if isinstance(d, dict):
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(_flatten(v, key))
            elif v is None:
                out[key] = None
            else:
                out[key] = v if isinstance(v, str) else json.dumps(v)
    else:
        out[prefix or "value"] = d if isinstance(d, str) else json.dumps(d)
    return out


def decode_results(text: str, fmt: str,
                   iterator: Optional[str]) -> Tuple[List[str], List[list]]:
    """Response text → (columns, rows) of strings.

    JSON: iterator (default ``$.results.bindings[*]``) over the decoded
    document, then dotted flattening — term maps see ``var.value`` /
    ``var.type`` columns exactly as the reference's json_normalize emits.
    CSV/TSV: header + rows. XML: SPARQL results XML bindings."""
    if fmt == "json":
        from .sources import _parse_jsonpath_steps

        doc = json.loads(text)
        steps = _parse_jsonpath_steps(iterator or "$.results.bindings[*]")
        matches = _eval_jsonpath_py(doc, steps)
        flat = [_flatten(m) for m in matches]
        cols: List[str] = []
        for f in flat:
            for k in f:
                if k not in cols:
                    cols.append(k)
        return cols, [[f.get(c) for c in cols] for f in flat]
    if fmt in ("csv", "tsv"):
        rows = list(csv.reader(io.StringIO(text),
                               delimiter="," if fmt == "csv" else "\t"))
        if not rows:
            return [], []
        return rows[0], [r + [None] * (len(rows[0]) - len(r))
                         for r in rows[1:]]
    if fmt == "xml":
        import xml.etree.ElementTree as ET

        ns = {"s": "http://www.w3.org/2005/sparql-results#"}
        root = ET.fromstring(text)
        cols = [v.get("name") for v in root.findall("s:head/s:variable", ns)]
        rows = []
        for res in root.findall("s:results/s:result", ns):
            row = {b.get("name"): (b[0].text or "") if len(b) else None
                   for b in res.findall("s:binding", ns)}
            rows.append([row.get(c) for c in cols])
        return cols, rows
    raise ValueError(f"unsupported result format {fmt!r}")


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

_UNWRAPPABLE_RE = re.compile(r"\b(LIMIT|OFFSET|ORDER\s+BY)\b", re.IGNORECASE)

# SPARQL prologue: any run of BASE <iri> / PREFIX pname: <iri> declarations
# (and comments/whitespace) at the head of the query. These must be hoisted
# OUT of the paged subquery wrapper — `SELECT * WHERE { { PREFIX ... } }` is
# a syntax error, and nearly every real query carries a prologue.
_PROLOGUE_RE = re.compile(
    r"^(?:\s*(?:#[^\n]*\n"               # comment line
    r"|BASE\s*<[^>]*>"                   # BASE <iri>
    r"|PREFIX\s+[^\s:]*:\s*<[^>]*>"      # PREFIX pname: <iri>
    r"))*\s*",
    re.IGNORECASE,
)


def split_prologue(query: str) -> Tuple[str, str]:
    """(prologue, body) of a SPARQL query — the prologue is re-emitted in
    front of any wrapper the pagination planner builds around the body."""
    m = _PROLOGUE_RE.match(query)
    end = m.end() if m else 0
    return query[:end], query[end:]


def load_sparql_source(
    spark: SparkSession,
    endpoint: str,
    query: str,
    result_format: Optional[str] = None,
    iterator: Optional[str] = None,
    page_size: Optional[int] = None,
) -> DataFrame:
    """SPARQL endpoint → all-string DataFrame (see module docstring)."""
    if not query:
        raise ValueError("SPARQL source requires rml:query "
                         "(pyrml_core.py:906 — 'and self.__query')")
    fmt = _format_key(result_format)

    # guard searches the body only — a PREFIX IRI containing 'limit' or
    # 'order' must not disable pagination
    if page_size is not None and _UNWRAPPABLE_RE.search(
            split_prologue(query)[1]):
        warnings.warn(
            "SPARQL pagination disabled: the query already carries "
            "LIMIT/OFFSET/ORDER BY and cannot be subquery-wrapped without "
            "changing its semantics; falling back to a single fetch",
            stacklevel=2)
        page_size = None

    if page_size is None:
        cols, rows = decode_results(fetch_sparql(endpoint, query, fmt),
                                    fmt, iterator)
        schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
        return spark.createDataFrame(rows, schema)

    # paged fan-out: count once, then executors fetch windows in parallel.
    # The prologue (PREFIX/BASE) is hoisted out of the body and re-emitted
    # before each wrapper — `SELECT * WHERE { { PREFIX ... } }` is invalid
    # SPARQL and nearly every real query carries a prologue.
    prologue, body = split_prologue(query)
    count_q = f"{prologue}SELECT (COUNT(*) AS ?n) WHERE {{ {{ {body} }} }}"
    ccols, crows = decode_results(fetch_sparql(endpoint, count_q, "json"),
                                  "json", "$.results.bindings[*]")
    n_idx = next((i for i, c in enumerate(ccols) if c == "n.value"), None)
    if n_idx is None:
        raise ValueError(
            f"SPARQL pagination: COUNT probe against {endpoint!r} returned "
            f"columns {ccols!r} with no 'n.value' binding — the endpoint "
            "did not answer the standard count shape (HTTP-200 error "
            "body?); unset page_size to use the single-fetch path")
    total = int(crows[0][n_idx]) if crows else 0
    n_pages = max(1, math.ceil(total / page_size))

    # schema probe: first page on the driver (also the only page when one
    # window covers everything)
    first_q = (f"{prologue}SELECT * WHERE {{ {{ {body} }} }} "
               f"LIMIT {page_size} OFFSET 0")
    ftext = fetch_sparql(endpoint, first_q, fmt)
    pcols0, first_rows = decode_results(ftext, fmt, iterator)

    # The paged schema must be the CLOSED column set, not page 0's observed
    # keys: SPARQL JSON omits unbound optionals and per-value keys
    # (xml:lang, datatype), so a column first appearing on a later page
    # would otherwise be silently dropped. With the default bindings
    # iterator the closed set comes from head.vars (value/type/xml:lang/
    # datatype per var); with a custom iterator page-0 columns stand, and
    # fetch_pages raises loudly on any later-page column outside them.
    cols = pcols0
    if fmt == "json" and (iterator is None
                          or iterator == "$.results.bindings[*]"):
        head_vars = json.loads(ftext).get("head", {}).get("vars", [])
        if head_vars:
            cols = [f"{v}.{k}" for v in head_vars
                    for k in ("value", "type", "xml:lang", "datatype")]

    def _project(got_cols: List[str], got_rows: List[list]) -> List[list]:
        extra = [c for c in got_cols if c not in cols]
        if extra:
            raise ValueError(
                f"SPARQL pagination: page returned columns {extra!r} "
                f"outside the planned schema {cols!r} — widen the iterator "
                "or unset page_size (single fetch derives columns from the "
                "full result)")
        idx = {c: i for i, c in enumerate(got_cols)}
        return [[r[idx[c]] if c in idx else None for c in cols]
                for r in got_rows]

    first_rows = _project(pcols0, first_rows)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    if n_pages == 1:
        return spark.createDataFrame(first_rows, schema)

    pages = spark.range(1, n_pages).repartition(min(n_pages - 1, 64))
    ep, it, ps = endpoint, iterator, page_size  # closure capture

    def fetch_pages(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for page in pdf["id"]:
                pq = (f"{prologue}SELECT * WHERE {{ {{ {body} }} }} "
                      f"LIMIT {ps} OFFSET {int(page) * ps}")
                pcols, prows = decode_results(fetch_sparql(ep, pq, fmt),
                                              fmt, it)
                rows = _project(pcols, prows)
                yield pd.DataFrame(
                    {c: [r[i] for r in rows] for i, c in enumerate(cols)},
                    columns=cols, dtype=object)

    rest = pages.mapInPandas(fetch_pages, schema=schema)
    return spark.createDataFrame(first_rows, schema).unionByName(rest)
