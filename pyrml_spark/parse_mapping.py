"""RML mapping document → :mod:`pyrml_spark.model` IR.

Mirrors the reference's plan-build semantics (``TripleMappings.from_rdf`` +
``__build``, ``pyrml_core.py:1511-1556``): a TriplesMap is any node with a
logical source AND a subject map; shortcut properties (``rr:subject``,
``rr:predicate``, ``rr:object``, ``rr:graph``) expand to constant term maps
(shortcut detection in the reference at ``pyrml_core.py:746-763``).

This is a from-scratch parser over our own Turtle-subset triples — no rdflib,
no SPARQL (the reference runs SPARQL queries against the mapping graph; we
index the tiny graph in plain dicts instead).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from . import rdfterms as R
from .model import (
    FunctionCall,
    GraphMap,
    Join,
    LogicalSource,
    MappingPlan,
    PredicateObjectMap,
    ReferencingObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)
from .turtle import parse_turtle

try:  # full-Jinja2 parity with the reference (pyrml_mapper.py:121-133);
    import jinja2 as _jinja2  # the regex subset below is the fallback.
except ImportError:  # pragma: no cover - jinja2 ships in this environment
    _jinja2 = None

RR, RML, QL, CRML, CSVW, FNML, FNO = (
    R.RR, R.RML, R.QL, R.CRML, R.CSVW, R.FNML, R.FNO,
)

# BCP47-ish language tag validation (reference validates with a regex and
# raises on invalid constant tags, pyrml_api.py:336-339; permissive subtags).
LANG_RE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")


class MappingError(ValueError):
    pass


class _Graph:
    """Tiny indexed triple store over parsed mapping triples."""

    def __init__(self, triples):
        self.spo: Dict[tuple, Dict[tuple, List[tuple]]] = defaultdict(
            lambda: defaultdict(list)
        )
        for s, p, o in triples:
            self.spo[s][p[1] if p[0] == "iri" else p].append(o)

    def objects(self, s, p_iri: str) -> List[tuple]:
        return self.spo.get(s, {}).get(p_iri, [])

    def obj(self, s, p_iri: str):
        objs = self.objects(s, p_iri)
        return objs[0] if objs else None

    def obj_value(self, s, p_iri: str) -> Optional[str]:
        o = self.obj(s, p_iri)
        if o is None:
            return None
        return o[1]

    def subjects(self):
        return list(self.spo.keys())


def _term_id(t: tuple) -> str:
    return t[1]


# ---------------------------------------------------------------------------


def _render_jinja(text: str, base_dir: str, template_vars: dict) -> str:
    """Render the mapping document as a Jinja2 template.

    The reference renders the mapping file through ``Environment(
    loader=FileSystemLoader(searchpath))`` where searchpath is "/" for
    absolute mapping paths and "." otherwise (``pyrml_mapper.py:121-133``) —
    so ``{% include %}`` resolves relative to the filesystem. We search
    ``base_dir`` first (the mapping file's own directory) then "/" so both
    reference spellings work. Undefined variables render empty, matching the
    reference's default ``Undefined``.
    """
    if _jinja2 is not None:
        env = _jinja2.Environment(
            loader=_jinja2.FileSystemLoader([base_dir or ".", "/"]),
            keep_trailing_newline=True,
        )
        return env.from_string(text).render(**template_vars)
    # Fallback subset when jinja2 is unavailable: {{ var }} substitution
    # only, with a loud ceiling — control-flow blocks or unresolved
    # variables would otherwise surface as a baffling Turtle parse error
    # downstream.
    for k, v in template_vars.items():
        text = re.sub(r"\{\{\s*" + re.escape(k) + r"\s*\}\}", str(v), text)
    m = re.search(r"\{%.*?%\}|\{\{\s*[\w.]+\s*\}\}", text)
    if m:
        raise ValueError(
            f"unsupported Jinja template construct {m.group(0)!r}: jinja2 "
            "is not installed, so only '{{ var }}' substitution with a "
            "provided template_vars value is supported (no control flow, "
            "filters, or missing variables; the reference renders full "
            "Jinja2, pyrml_mapper.py:121-133)")
    return text


def parse_mapping(
    text: str,
    base_dir: str = ".",
    base_iri: Optional[str] = None,
    template_vars: Optional[dict] = None,
) -> MappingPlan:
    """Parse mapping Turtle text into a MappingPlan.

    ``template_vars`` performs the reference's Jinja2 preprocessing
    (``pyrml_mapper.py:121-133``): with jinja2 installed the mapping text is
    rendered as a FULL Jinja2 template (control flow, filters, ``{% include
    %}`` resolved against ``base_dir`` then ``/``, undefined variables
    rendering empty — all exactly as the reference's
    ``Environment(loader=FileSystemLoader(...))``). Without jinja2 a
    ``{{ var }}``-substitution subset applies, with a loud error on any
    surviving construct.
    """
    if template_vars is not None:
        text = _render_jinja(text, base_dir, template_vars)
    triples, captured_base, _prefixes = parse_turtle(text, base=base_iri)
    g = _Graph(triples)
    builder = _Builder(g, base_dir)
    tms = builder.build()
    return MappingPlan(triples_maps=tuple(tms), base_iri=captured_base)


def parse_mapping_file(
    path: str,
    base_iri: Optional[str] = None,
    template_vars: Optional[dict] = None,
) -> MappingPlan:
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    return parse_mapping(
        text,
        base_dir=os.path.dirname(os.path.abspath(path)),
        base_iri=base_iri,
        template_vars=template_vars,
    )


class _Builder:
    def __init__(self, g: _Graph, base_dir: str):
        self.g = g
        self.base_dir = base_dir

    # -- top level -----------------------------------------------------------
    def build(self) -> List[TriplesMap]:
        tms = []
        for node in self.g.subjects():
            has_ls = (
                self.g.obj(node, RML + "logicalSource") is not None
                or self.g.obj(node, RR + "logicalTable") is not None
            )
            has_sm = (
                self.g.obj(node, RR + "subjectMap") is not None
                or self.g.obj(node, RR + "subject") is not None
            )
            if has_ls and has_sm:
                tms.append(self._triples_map(node))
        tms.sort(key=lambda tm: tm.iri)
        return tms

    def _triples_map(self, node) -> TriplesMap:
        g = self.g
        sources = tuple(
            self._logical_source(ls)
            for ls in (
                g.objects(node, RML + "logicalSource")
                + g.objects(node, RR + "logicalTable")
            )
        )
        subject_maps = []
        for sm_node in g.objects(node, RR + "subjectMap"):
            subject_maps.append(self._subject_map(sm_node))
        for const in g.objects(node, RR + "subject"):
            subject_maps.append(
                SubjectMap(term_map=TermMap(kind="constant", constant=const,
                                            term_type="iri"))
            )
        poms = tuple(
            self._pom(pom_node)
            for pom_node in g.objects(node, RR + "predicateObjectMap")
        )
        condition = g.obj_value(node, CRML + "condition")
        if condition is None:
            for ls in g.objects(node, RML + "logicalSource"):
                condition = g.obj_value(ls, CRML + "condition")
                if condition:
                    break
        return TriplesMap(
            iri=_term_id(node) if node[0] == "iri" else f"_:{node[1]}",
            sources=sources,
            subject_maps=tuple(subject_maps),
            poms=poms,
            condition=condition,
        )

    # -- logical sources -------------------------------------------------------
    def _logical_source(self, node) -> LogicalSource:
        g = self.g
        node_id = _term_id(node) if node[0] == "iri" else f"_:{node[1]}"
        # rr:logicalTable / SQL
        table = g.obj_value(node, RR + "tableName")
        sql_query = g.obj_value(node, RR + "sqlQuery") or g.obj_value(
            node, RML + "query"
        )
        dsn = g.obj_value(node, R.D2RQ + "jdbcDSN")
        if dsn is None:
            # reference shape: the DSN hangs on the rml:source node
            # (pyrml_core.py:1630 — g.value(source, d2rq.jdbcDSN))
            src_node = g.obj(node, RML + "source")
            if src_node is not None and src_node[0] != "literal":
                dsn = g.obj_value(src_node, R.D2RQ + "jdbcDSN")
        endpoint = g.obj(node, R.SD + "endpoint")
        if endpoint is None:
            # reference shape: sd:endpoint hangs on the rml:source node
            # (pyrml_core.py:1754 — g.value(source, sd.endpoint))
            src_node = g.obj(node, RML + "source")
            if src_node is not None and src_node[0] != "literal":
                endpoint = g.obj(src_node, R.SD + "endpoint")
        iterator = g.obj_value(node, RML + "iterator")
        sep = g.obj_value(node, CRML + "separator") or ","
        ref_formulation = g.obj(node, RML + "referenceFormulation")
        rf = _term_id(ref_formulation) if ref_formulation else None

        if endpoint is not None:
            # SPARQLSource shape (pyrml_core.py:1748-1766): sd:endpoint +
            # optional sd:resultFormat (default SPARQL_Results_JSON) on the
            # rml:source node; rml:query + rml:iterator on the logical source
            rfmt = g.obj(node, R.SD + "resultFormat")
            if rfmt is None:
                src_node = g.obj(node, RML + "source")
                if src_node is not None and src_node[0] != "literal":
                    rfmt = g.obj(src_node, R.SD + "resultFormat")
            return LogicalSource(
                kind="sparql", source=_term_id(endpoint), query=sql_query,
                iterator=iterator, node_id=node_id,
                result_format=_term_id(rfmt) if rfmt is not None else None,
            )
        if dsn is not None or (table and not g.obj(node, RML + "source")):
            return LogicalSource(
                kind="sql", source=dsn or "", query=sql_query or
                (f"SELECT * FROM {table}" if table else None),
                iterator=table, node_id=node_id,
            )

        src = g.obj(node, RML + "source")
        if src is None:
            raise MappingError(f"logical source {node_id} has no rml:source")
        if src[0] == "literal" or (src[0] == "iri" and "://" not in src[1]):
            path = src[1]
        else:
            # CSVW node: csvw:url + csvw:dialect
            url = self.g.obj_value(src, CSVW + "url")
            if url is not None:
                dialect = self.g.obj(src, CSVW + "dialect")
                enc = None
                if dialect is not None:
                    d_sep = self.g.obj_value(dialect, CSVW + "delimiter")
                    enc = self.g.obj_value(dialect, CSVW + "encoding")
                    if d_sep:
                        sep = d_sep
                return LogicalSource(
                    kind="csvw", source=self._resolve_path(url),
                    separator=sep, encoding=enc, node_id=node_id,
                )
            # external source node that itself has rml:source etc.
            inner = self.g.obj(src, RML + "source")
            if inner is not None:
                return self._logical_source(src)
            path = _term_id(src)

        path = self._resolve_path(path)
        kind = self._kind_from(rf, path)
        return LogicalSource(
            kind=kind, source=path, iterator=iterator, separator=sep,
            query=sql_query, node_id=node_id,
        )

    def _resolve_path(self, path: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", path) or os.path.isabs(path):
            return path
        # the reference resolves relative to the process CWD; we resolve
        # relative to the mapping file, falling back to CWD
        cand = os.path.join(self.base_dir, path)
        if os.path.exists(cand):
            return cand
        return path

    @staticmethod
    def _kind_from(rf: Optional[str], path: str) -> str:
        if rf:
            local = rf.rsplit("#", 1)[-1].rsplit("/", 1)[-1].lower()
            if local in ("csv",):
                return "csv"
            if local in ("jsonpath", "json"):
                return "json"
            if local in ("xpath", "xml"):
                return "xml"
            if local in ("parquet",):
                return "parquet"
        ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
        return {
            "csv": "csv", "tsv": "csv", "json": "json", "xml": "xml",
            "parquet": "parquet",
        }.get(ext, "csv")

    # -- term maps -------------------------------------------------------------
    def _term_map(self, node, position: str) -> TermMap:
        """position: subject | predicate | object | graph | language"""
        g = self.g
        template = g.obj_value(node, RR + "template")
        reference = g.obj_value(node, RML + "reference") or g.obj_value(
            node, RR + "column"
        )
        constant = g.obj(node, RR + "constant")
        fn_node = g.obj(node, FNML + "functionValue")

        tt_node = g.obj(node, RR + "termType")
        term_type = None
        if tt_node is not None:
            local = _term_id(tt_node).rsplit("#", 1)[-1].lower()
            term_type = {"iri": "iri", "literal": "literal",
                         "blanknode": "bnode"}.get(local)

        datatype = None
        dt_node = g.obj(node, RR + "datatype") or g.obj(node, RML + "datatype")
        if dt_node is not None:
            datatype = _term_id(dt_node)

        language = g.obj_value(node, RR + "language")
        if language is not None and not LANG_RE.match(language):
            # reference raises on invalid constant language tags
            raise MappingError(f"invalid language tag {language!r}")
        language_map = None
        lm_node = g.obj(node, RML + "languageMap")
        if lm_node is not None:
            language_map = self._term_map(lm_node, "language")

        if term_type is None:
            if position in ("subject", "predicate", "graph"):
                term_type = "iri"
            elif constant is not None:
                term_type = "literal" if constant[0] == "literal" else "iri"
            else:
                # objects default to Literal for template/reference/function
                # maps alike — the reference's behavior (pyrml_core.py:241:
                # "term_type is None or LITERAL" ⇒ literal), which diverges
                # from R2RML §7.4 (template ⇒ IRI) for templates; mappings
                # exercising this: rml_con_creazione_ontologia.ttl:21-25
                term_type = "literal"

        if fn_node is not None:
            return TermMap(kind="function",
                           function=self._function_call(fn_node),
                           term_type=term_type, datatype=datatype,
                           language=language, language_map=language_map)
        if template is not None:
            return TermMap(kind="template", template=template,
                           term_type=term_type, datatype=datatype,
                           language=language, language_map=language_map)
        if reference is not None:
            return TermMap(kind="reference", reference=reference,
                           term_type=term_type, datatype=datatype,
                           language=language, language_map=language_map)
        if constant is not None:
            return TermMap(kind="constant", constant=constant,
                           term_type=term_type, datatype=datatype,
                           language=language, language_map=language_map)
        raise MappingError(
            f"term map {node!r} has no template/reference/constant/function"
        )

    def _function_call(self, fn_node) -> FunctionCall:
        """fnml:functionValue node: POMs with fno:executes + param IRIs."""
        g = self.g
        function_iri = None
        params: List[Tuple[str, TermMap]] = []
        for pom in g.objects(fn_node, RR + "predicateObjectMap"):
            preds = [
                _term_id(p) for p in g.objects(pom, RR + "predicate")
            ] + [
                _term_id(g.obj(pm, RR + "constant"))
                for pm in g.objects(pom, RR + "predicateMap")
                if g.obj(pm, RR + "constant") is not None
            ]
            om_nodes = g.objects(pom, RR + "objectMap")
            shortcut_objs = g.objects(pom, RR + "object")
            for pred in preds:
                if pred == FNO + "executes" or pred.endswith("#executes") or \
                        pred.endswith("/executes"):
                    cand = None
                    if shortcut_objs:
                        cand = _term_id(shortcut_objs[0])
                    elif om_nodes:
                        c = g.obj(om_nodes[0], RR + "constant")
                        if c is not None:
                            cand = _term_id(c)
                    if cand is None:
                        raise MappingError("fno:executes without constant")
                    function_iri = cand
                else:
                    for o in shortcut_objs:
                        params.append((pred, TermMap(kind="constant",
                                                     constant=o,
                                                     term_type="literal")))
                    for om in om_nodes:
                        params.append((pred, self._term_map(om, "object")))
        if function_iri is None:
            raise MappingError("functionValue without fno:executes")
        return FunctionCall(function_iri=function_iri, params=tuple(params))

    def _graph_maps(self, node) -> Tuple[GraphMap, ...]:
        g = self.g
        gms = []
        for gm_node in g.objects(node, RR + "graphMap"):
            gms.append(GraphMap(term_map=self._term_map(gm_node, "graph")))
        for const in g.objects(node, RR + "graph"):
            gms.append(GraphMap(term_map=TermMap(kind="constant",
                                                 constant=const,
                                                 term_type="iri")))
        return tuple(gms)

    def _subject_map(self, node) -> SubjectMap:
        g = self.g
        classes = tuple(
            _term_id(c) for c in g.objects(node, RR + "class")
        )
        return SubjectMap(
            term_map=self._term_map(node, "subject"),
            classes=classes,
            graph_maps=self._graph_maps(node),
        )

    def _pom(self, node) -> PredicateObjectMap:
        g = self.g
        predicates: List[TermMap] = []
        for pm_node in g.objects(node, RR + "predicateMap"):
            predicates.append(self._term_map(pm_node, "predicate"))
        for const in g.objects(node, RR + "predicate"):
            predicates.append(TermMap(kind="constant", constant=const,
                                      term_type="iri"))
        objects: List[TermMap] = []
        ref_objects: List[ReferencingObjectMap] = []
        for om_node in g.objects(node, RR + "objectMap"):
            parent = g.obj(om_node, RR + "parentTriplesMap")
            if parent is not None:
                joins = tuple(
                    Join(child=g.obj_value(j, RR + "child"),
                         parent=g.obj_value(j, RR + "parent"))
                    for j in g.objects(om_node, RR + "joinCondition")
                )
                ref_objects.append(ReferencingObjectMap(
                    parent_triples_map=_term_id(parent)
                    if parent[0] == "iri" else f"_:{parent[1]}",
                    joins=joins,
                ))
            else:
                objects.append(self._term_map(om_node, "object"))
        for const in g.objects(node, RR + "object"):
            objects.append(TermMap(
                kind="constant", constant=const,
                term_type="literal" if const[0] == "literal" else "iri",
            ))
        return PredicateObjectMap(
            predicates=tuple(predicates),
            objects=tuple(objects),
            ref_objects=tuple(ref_objects),
            graph_maps=self._graph_maps(node),
        )
