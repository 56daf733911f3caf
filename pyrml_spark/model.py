"""Mapping IR: frozen driver-side dataclasses mirroring the reference's
object tree (``pyrml_core.py:1511-1556`` builds TripleMappings{LogicalSource,
SubjectMap, PredicateObjectMap, condition} with nested ReferencingObjectMap
{Join, parent} and FunctionMap{POM} — see SURVEY.md §3 step 2).

The IR is *what* to compute; the compiler (:mod:`pyrml_spark.compiler`)
turns it into a DataFrame DAG. No Spark imports here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class LogicalSource:
    """A tabular view over a source (SURVEY.md §2.1 S1-S6).

    kind: csv | csvw | json | xml | parquet | sql | sparql | table
    """

    kind: str
    source: str                       # path / url / table name
    iterator: Optional[str] = None    # JSONPath / XPath / SQL query
    separator: str = ","
    encoding: Optional[str] = None
    query: Optional[str] = None       # rml:query / rr:sqlQuery
    node_id: Optional[str] = None     # mapping-graph node (for source caching)
    result_format: Optional[str] = None  # sd:resultFormat IRI (SPARQL only)

    def cache_key(self) -> tuple:
        return (self.kind, self.source, self.iterator, self.separator,
                self.query, self.result_format)


# ---------------------------------------------------------------------------
# Term maps
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FunctionCall:
    """fnml:functionValue — fno:executes + IRI-keyed parameters.

    Parameter values are themselves TermMaps (constant / reference / template).
    Reference: FunctionMap at pyrml_core.py:1194-1285.
    """

    function_iri: str
    params: Tuple[Tuple[str, "TermMap"], ...]  # (param IRI, value term map)


@dataclass(frozen=True)
class TermMap:
    """One of template / reference / constant / function (SURVEY.md §2.2).

    term_type: "iri" | "literal" | "bnode" (resolved default per position)
    constant: an rdfterms tuple when kind == "constant"
    """

    kind: str                         # template | reference | constant | function
    template: Optional[str] = None
    reference: Optional[str] = None
    constant: Optional[tuple] = None  # rdfterms.Term
    function: Optional[FunctionCall] = None
    term_type: str = "iri"
    datatype: Optional[str] = None
    language: Optional[str] = None            # constant rr:language
    language_map: Optional["TermMap"] = None  # rml:languageMap


@dataclass(frozen=True)
class GraphMap:
    term_map: TermMap


@dataclass(frozen=True)
class SubjectMap:
    term_map: TermMap
    classes: Tuple[str, ...] = ()
    graph_maps: Tuple[GraphMap, ...] = ()


@dataclass(frozen=True)
class Join:
    child: str
    parent: str


@dataclass(frozen=True)
class ReferencingObjectMap:
    """rr:parentTriplesMap (+ optional rr:joinCondition) — SURVEY.md D5/D6."""

    parent_triples_map: str           # IRI of the parent TriplesMap
    joins: Tuple[Join, ...] = ()


@dataclass(frozen=True)
class PredicateObjectMap:
    predicates: Tuple[TermMap, ...]
    objects: Tuple[TermMap, ...] = ()
    ref_objects: Tuple[ReferencingObjectMap, ...] = ()
    graph_maps: Tuple[GraphMap, ...] = ()


@dataclass(frozen=True)
class TriplesMap:
    iri: str
    sources: Tuple[LogicalSource, ...]
    subject_maps: Tuple[SubjectMap, ...]
    poms: Tuple[PredicateObjectMap, ...]
    condition: Optional[str] = None   # crml:condition expression (D1)


@dataclass(frozen=True)
class MappingPlan:
    """The full compiled mapping document."""

    triples_maps: Tuple[TriplesMap, ...]
    base_iri: Optional[str] = None

    def by_iri(self, iri: str) -> TriplesMap:
        for tm in self.triples_maps:
            if tm.iri == iri:
                return tm
        raise KeyError(f"no TriplesMap {iri!r}")
