"""RDF/XML, pretty RDF/XML and TriX serialization (+ round-trip parsers).

Closes the reference CLI's remaining format list (``pyrml-mapper.py:37-52``:
xml, pretty-xml, trix — rdflib ``Dataset.serialize`` backends). Like
:mod:`pyrml_spark.rdfserialize`, these are *driver-side human/interchange
formats* over the engine's NT-formatted (s,p,o[,g]) string rows; bulk output
belongs to N-Quads text or the partitioned table sink.

Format notes:

* **xml**: one ``rdf:Description`` per subject, properties as namespaced
  child elements. A predicate whose IRI cannot split into
  ``namespace + XML NCName`` is *unrepresentable in RDF/XML by spec* —
  serialization raises loudly (rdflib does the same) instead of emitting an
  invalid QName.
* **pretty-xml**: identical model, but when a subject has an ``rdf:type``
  whose IRI splits cleanly, the type becomes the element name
  (``<ex:Person rdf:about=...>``) — rdflib's pretty-xml idiom.
* **trix** (W3C TriX note): fully regular — every term is a typed leaf
  element, graphs are explicit blocks. The only one of the three that
  carries named graphs; xml/pretty-xml flatten to the union graph.

All three round-trip through the parsers in this module (tested).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

from .nquads import Quad
from .rdfterms import RDF, XSD, escape_nt, unescape_nt
from .rdfserialize import _LITERAL_RE, prefix_table_from_quads

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"

# XML NCName (ASCII-pragmatic subset: enough for the corpus; non-ASCII
# locals fall back to "unrepresentable" which is the loud, safe answer)
_NCNAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")


class RdfXmlError(ValueError):
    pass


def _split_qname(iri_value: str) -> Optional[Tuple[str, str]]:
    """namespace + NCName local, or None if the IRI can't split (RDF/XML
    spec: property elements MUST be QNames)."""
    for sep in ("#", "/"):
        idx = iri_value.rfind(sep)
        if idx > len("http://") and idx < len(iri_value) - 1:
            local = iri_value[idx + 1:]
            if _NCNAME_RE.match(local):
                return iri_value[: idx + 1], local
            return None
    return None


def _parse_nt_term(term: str):
    """NT string → ("iri", v) | ("bnode", label) | ("literal", lex, lang, dt).
    lex is UNescaped (real characters, ready for XML text)."""
    if term.startswith("<"):
        return ("iri", term[1:-1])
    if term.startswith("_:"):
        return ("bnode", term[2:])
    m = _LITERAL_RE.match(term)
    if not m:
        raise RdfXmlError(f"unparseable NT term {term!r}")
    return ("literal", unescape_nt(m.group("lex")), m.group("lang"),
            m.group("dt"))


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def serialize_rdfxml(
    quads: Iterable[Quad],
    prefixes: Optional[Dict[str, str]] = None,
    pretty: bool = False,
) -> str:
    """Quads (graph flattened) → RDF/XML text."""
    quads = list(quads)
    prefixes = dict(prefixes) if prefixes else prefix_table_from_quads(quads)
    prefixes.setdefault(RDF, "rdf")

    triples = sorted({(s, p, o) for s, p, o, _g in quads})
    by_subject: Dict[str, List[Tuple[str, str]]] = defaultdict(list)
    for s, p, o in triples:
        by_subject[s].append((p, o))

    # collect namespaces used by predicates (and typed-node names) so every
    # QName prefix is declared; predicates that can't split → loud error
    used_ns: Dict[str, str] = {RDF: prefixes[RDF]}

    def qname(iri_value: str, kind: str) -> str:
        split = _split_qname(iri_value)
        if split is None:
            raise RdfXmlError(
                f"{kind} IRI {iri_value!r} cannot be expressed as an XML "
                "QName — RDF/XML cannot represent it; use turtle/nquads")
        ns, local = split
        if ns not in used_ns:
            pfx = prefixes.get(ns)
            if pfx is None or pfx in used_ns.values():
                i = len(used_ns)
                while f"x{i}" in used_ns.values():
                    i += 1
                pfx = f"x{i}"
            used_ns[ns] = pfx
        return f"{used_ns[ns]}:{local}"

    body: List[str] = []
    for s in sorted(by_subject):
        skind, sval = _parse_nt_term(s)[:2]
        pos = by_subject[s]
        elem = "rdf:Description"
        if pretty:
            type_iris = [o for p, o in pos
                         if p == f"<{RDF}type>" and o.startswith("<")]
            for t in sorted(type_iris):
                split = _split_qname(t[1:-1])
                if split:
                    elem = qname(t[1:-1], "type")
                    pos = [po for po in pos
                           if not (po[0] == f"<{RDF}type>" and po[1] == t)]
                    break
        ident = (f'rdf:about="{_xml_escape(sval)}"' if skind == "iri"
                 else f'rdf:nodeID="{_xml_escape(sval)}"')
        body.append(f'  <{elem} {ident}>')
        for p, o in pos:
            pq = qname(_parse_nt_term(p)[1], "predicate")
            ot = _parse_nt_term(o)
            if ot[0] == "iri":
                body.append(f'    <{pq} rdf:resource="{_xml_escape(ot[1])}"/>')
            elif ot[0] == "bnode":
                body.append(f'    <{pq} rdf:nodeID="{_xml_escape(ot[1])}"/>')
            else:
                _k, lex, lang, dt = ot
                attrs = ""
                if lang:
                    attrs = f' xml:lang="{lang}"'
                elif dt:
                    attrs = f' rdf:datatype="{_xml_escape(dt)}"'
                body.append(f'    <{pq}{attrs}>{_xml_escape(lex)}</{pq}>')
        body.append(f'  </{elem}>')

    decls = "".join(
        f'\n    xmlns:{pfx}="{_xml_escape(ns)}"'
        for ns, pfx in sorted(used_ns.items(), key=lambda kv: kv[1]))
    return ('<?xml version="1.0" encoding="utf-8"?>\n'
            f"<rdf:RDF{decls}>\n" + "\n".join(body) + "\n</rdf:RDF>\n")


def parse_rdfxml(text: str) -> List[Quad]:
    """Round-trip parser for the subset this module emits (Description or
    typed nodes; resource/nodeID/literal objects)."""
    root = ET.fromstring(text)

    def expand(tag: str) -> str:
        # ElementTree gives '{ns}local'
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    out: List[Quad] = []
    for node in root:
        about = node.get(f"{{{RDF}}}about")
        node_id = node.get(f"{{{RDF}}}nodeID")
        s = f"<{about}>" if about is not None else f"_:{node_id}"
        node_type = expand(node.tag)
        if node_type != RDF + "Description":
            out.append((s, f"<{RDF}type>", f"<{node_type}>", None))
        for prop in node:
            p = f"<{expand(prop.tag)}>"
            res = prop.get(f"{{{RDF}}}resource")
            oid = prop.get(f"{{{RDF}}}nodeID")
            if res is not None:
                o = f"<{res}>"
            elif oid is not None:
                o = f"_:{oid}"
            else:
                lex = escape_nt(prop.text or "")
                lang = prop.get("{http://www.w3.org/XML/1998/namespace}lang")
                dt = prop.get(f"{{{RDF}}}datatype")
                o = f'"{lex}"'
                if lang:
                    o += f"@{lang}"
                elif dt:
                    o += f"^^<{dt}>"
            out.append((s, p, o, None))
    return out


# ---------------------------------------------------------------------------
# TriX
# ---------------------------------------------------------------------------

def serialize_trix(quads: Iterable[Quad]) -> str:
    """Quads → TriX (W3C note): named graphs kept, default graph = block
    with no <uri> label."""
    by_graph: Dict[Optional[str], List[Tuple[str, str, str]]] = defaultdict(list)
    for s, p, o, g in quads:
        by_graph[g or None].append((s, p, o))

    def term_xml(t: str) -> str:
        kind = _parse_nt_term(t)
        if kind[0] == "iri":
            return f"      <uri>{_xml_escape(kind[1])}</uri>"
        if kind[0] == "bnode":
            return f"      <id>{_xml_escape(kind[1])}</id>"
        _k, lex, lang, dt = kind
        if lang:
            return (f'      <plainLiteral xml:lang="{lang}">'
                    f"{_xml_escape(lex)}</plainLiteral>")
        if dt:
            return (f'      <typedLiteral datatype="{_xml_escape(dt)}">'
                    f"{_xml_escape(lex)}</typedLiteral>")
        return f"      <plainLiteral>{_xml_escape(lex)}</plainLiteral>"

    parts = ['<?xml version="1.0" encoding="utf-8"?>',
             f'<TriX xmlns="{TRIX_NS}">']
    for g in sorted(by_graph, key=lambda x: (x is not None, x or "")):
        parts.append("  <graph>")
        if g is not None:
            gv = _parse_nt_term(g)
            parts.append(f"    <uri>{_xml_escape(gv[1])}</uri>")
        for s, p, o in sorted(by_graph[g]):
            parts.append("    <triple>")
            parts.extend(term_xml(t) for t in (s, p, o))
            parts.append("    </triple>")
        parts.append("  </graph>")
    parts.append("</TriX>")
    return "\n".join(parts) + "\n"


def parse_trix(text: str) -> List[Quad]:
    root = ET.fromstring(text)
    ns = {"t": TRIX_NS}

    def term_nt(el) -> str:
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "uri":
            return f"<{el.text or ''}>"
        if tag == "id":
            return f"_:{el.text or ''}"
        lex = escape_nt(el.text or "")
        if tag == "typedLiteral":
            return f'"{lex}"^^<{el.get("datatype")}>'
        lang = el.get("{http://www.w3.org/XML/1998/namespace}lang")
        return f'"{lex}"@{lang}' if lang else f'"{lex}"'

    out: List[Quad] = []
    for graph in root.findall("t:graph", ns):
        children = list(graph)
        g: Optional[str] = None
        triples = []
        for ch in children:
            tag = ch.tag.rsplit("}", 1)[-1]
            if tag == "uri":
                g = f"<{ch.text or ''}>"
            elif tag == "triple":
                triples.append(ch)
        for tr in triples:
            s, p, o = (term_nt(t) for t in tr)
            out.append((s, p, o, g))
    return out
