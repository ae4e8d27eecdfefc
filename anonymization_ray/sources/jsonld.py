"""Minimal JSON-LD reader/writer for the reference's conformance corpus (S1).

Handles the compact form the reference fixtures use (prefix ``@context``,
``@graph`` node array, ``{@value,@type}`` literals, ``{@id}`` references,
inline node objects as blank nodes) — NOT a full JSON-LD implementation; the
KG pipeline's native interchange is Parquet triple tables.

Reference analog: ``AnonymizationService.getModel`` parsing request JSON-LD
into the triple model (AnonymizationService.java:139-149).
"""

from __future__ import annotations

import pyarrow as pa

RDF_TYPE = "rdf:type"


def _expand(term: str, context: dict[str, str]) -> str:
    if ":" in term:
        pfx, rest = term.split(":", 1)
        if pfx in context:
            return context[pfx] + rest
    return term


def _compact(iri: str, context: dict[str, str]) -> str:
    for pfx, base in context.items():
        if iri.startswith(base):
            return f"{pfx}:{iri[len(base):]}"
    return iri


RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


def parse_jsonld(doc: dict | list, *, context: dict | None = None) -> pa.Table:
    """-> (subj, pred, obj, obj_kind) rows. obj_kind: 'iri' or the literal
    datatype's local name ('string', 'double', 'date', ...). Prefixes stay
    compact (the corpus uses a single shared context).

    Accepted input shapes (what Jena's ``RDFDataMgr.read(..., JSONLD)``
    would also parse, ``AnonymizationService.java:139-149``):
    - compact: ``{"@context": {...}, "@graph": [nodes]}`` or a single node
      dict — terms stay in their compact ``pfx:local`` spelling;
    - EXPANDED: a top-level LIST of node objects with full-IRI keys,
      ``@type`` as IRI arrays and every value an array of ``{"@value"}`` /
      ``{"@id"}`` / nested-node objects — full IRIs flow through verbatim
      (downstream matching is by local name), or are compacted back to
      ``pfx:local`` when an explicit ``context=`` mapping is supplied
      (opt-in only: a document's own ``@context`` never re-compacts full
      IRIs, so compact-form parses are byte-stable);
    - ``{"@list": [...]}`` values become an rdf:first/rdf:rest chain
      ending in rdf:nil (the RDF collection Jena would build).
    """
    if isinstance(doc, list):
        top_nodes: list = doc
        doc_ctx: dict = {}
    else:
        top_nodes = None  # resolved after walk() is defined
        doc_ctx = doc.get("@context") or {}
    comp_ctx = {
        k: v for k, v in (context or {}).items() if isinstance(v, str)
    }

    def c(term: str) -> str:
        return _compact(term, comp_ctx) if comp_ctx else term

    rows: list[tuple[str, str, str, str]] = []
    bnode_counter = [0]

    def literal_kind(dtype: str | None, value) -> str:
        if dtype is None:
            if isinstance(value, bool):
                return "boolean"
            if isinstance(value, int):
                return "integer"
            if isinstance(value, float):
                return "double"
            return "string"
        local = dtype.rsplit("#", 1)[-1].rsplit("/", 1)[-1].rsplit(".", 1)[-1]
        return {"LocalDate": "date"}.get(local, local)

    def lex(value) -> str:
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, float):
            return repr(value)
        return str(value)

    def node_id(node: dict) -> str:
        nid = node.get("@id")
        if nid is None:
            bnode_counter[0] += 1
            return f"_:b{bnode_counter[0]}"
        return c(nid)

    def list_chain(items: list, key: str, sid: str) -> None:
        """rdf:first/rdf:rest collection for an ``@list`` value."""
        prev, prev_pred = sid, key
        for item in items:
            bnode_counter[0] += 1
            cell = f"_:b{bnode_counter[0]}"
            rows.append((prev, prev_pred, cell, "iri"))
            emit(cell, c(RDF_FIRST), item)
            prev, prev_pred = cell, c(RDF_REST)
        rows.append((prev, prev_pred, c(RDF_NIL), "iri"))

    def emit(sid: str, key: str, v) -> None:
        if isinstance(v, dict):
            if "@value" in v:
                dt = v.get("@type")
                rows.append(
                    (sid, key, lex(v["@value"]), literal_kind(dt, v["@value"]))
                )
            elif "@list" in v:
                list_chain(v["@list"], key, sid)
            elif set(v.keys()) == {"@id"}:
                rows.append((sid, key, c(v["@id"]), "iri"))
            else:
                child = walk(v)
                rows.append((sid, key, child, "iri"))
        else:
            rows.append((sid, key, lex(v), literal_kind(None, v)))

    expanded_mode = top_nodes is not None

    def walk(node: dict) -> str:
        sid = node_id(node)
        for key, val in node.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                types = val if isinstance(val, list) else [val]
                for t in types:
                    rows.append((sid, RDF_TYPE, c(t), "iri"))
                continue
            if expanded_mode and ":" not in key:
                # expansion drops terms with no IRI mapping (what Jena's
                # JSONLD read does to plain-JSON keys) — a flat-JSON array
                # fed to the expanded parser yields an empty model, not
                # garbage triples
                continue
            vals = val if isinstance(val, list) else [val]
            for v in vals:
                emit(sid, c(key), v)
        return sid

    if top_nodes is None:
        graph = doc.get("@graph")
        top_nodes = graph if isinstance(graph, list) else [doc]
    for n in top_nodes:
        if isinstance(n, dict):
            walk(n)
    if not rows:
        return pa.table(
            {
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "obj_kind": pa.array([], pa.string()),
            }
        )
    s, p, o, k = zip(*rows)
    return pa.table(
        {
            "subj": pa.array(s, pa.string()),
            "pred": pa.array(p, pa.string()),
            "obj": pa.array(o, pa.string()),
            "obj_kind": pa.array(k, pa.string()),
        }
    )


def jsonld_expand(doc: dict) -> list:
    """Compact JSON-LD document -> EXPANDED form (the W3C expansion
    algorithm's output shape for this engine's subset): a top-level list of
    node objects, full-IRI keys, ``@type`` as full-IRI arrays, every value
    an array of ``{"@value": ...}`` / ``{"@id": ...}`` / nested node
    objects. What a third party's expansion pass (or Jena re-serialization)
    would hand ``parse_jsonld``; round-trips to the same triples."""
    ctx = {
        k: v for k, v in (doc.get("@context") or {}).items() if isinstance(v, str)
    }

    def xt(term: str) -> str:
        return _expand(term, ctx)

    def xv(v) -> object:
        if isinstance(v, dict):
            if "@value" in v:
                out = {"@value": v["@value"]}
                if "@type" in v:
                    out["@type"] = xt(v["@type"])
                if "@language" in v:
                    out["@language"] = v["@language"]
                return out
            if "@list" in v:
                return {"@list": [xv(i) for i in v["@list"]]}
            if set(v.keys()) == {"@id"}:
                return {"@id": xt(v["@id"])}
            return xn(v)
        return {"@value": v}

    def xn(node: dict) -> dict:
        out: dict = {}
        if "@id" in node:
            out["@id"] = xt(node["@id"])
        for key, val in node.items():
            if key in ("@id", "@context"):
                continue
            vals = val if isinstance(val, list) else [val]
            if key == "@type":
                out["@type"] = [xt(t) for t in vals]
                continue
            out[xt(key)] = [xv(v) for v in vals]
        return out

    graph = doc.get("@graph")
    nodes = graph if isinstance(graph, list) else [doc]
    return [xn(n) for n in nodes if isinstance(n, dict)]


_XSD = "http://www.w3.org/2001/XMLSchema#"


def write_jsonld(table: pa.Table, context: dict | None = None) -> dict:
    """Triple table -> compact JSON-LD document (inverse of ``parse_jsonld``).

    Rows group by subject into ``@graph`` node objects (first-appearance
    order, deterministic); ``obj_kind`` drives the value form: ``iri`` ->
    ``{"@id": ...}``, plain ``string`` -> bare string, any other literal kind
    -> ``{"@value": lex, "@type": "xsd:<kind>"}``. Round-trips through
    ``parse_jsonld`` with triple P/R 1.0 (tested on the reference goldens).

    Reference analog: Jena model re-serialization to JSON-LD
    (``AnonymizationService.java:41-46``).
    """
    nodes: dict[str, dict] = {}
    order: list[str] = []
    for s, p, o, k in zip(
        table.column("subj").to_pylist(),
        table.column("pred").to_pylist(),
        table.column("obj").to_pylist(),
        table.column("obj_kind").to_pylist(),
    ):
        node = nodes.get(s)
        if node is None:
            node = nodes[s] = {"@id": s}
            order.append(s)
        if p == RDF_TYPE:
            node.setdefault("@type", []).append(o)
            continue
        if k == "iri":
            val: object = {"@id": o}
        elif k == "string" or k is None:
            val = o
        else:
            # keep the prefix compact when the caller's context defines xsd,
            # else expand — parse_jsonld reads the local name either way
            dt = f"xsd:{k}" if (context or {}).get("xsd") == _XSD else _XSD + k
            val = {"@value": o, "@type": dt}
        slot = node.setdefault(p, [])
        slot.append(val)

    graph = []
    for s in order:
        node = nodes[s]
        out: dict = {"@id": node["@id"]}
        if "@type" in node:
            t = node["@type"]
            out["@type"] = t[0] if len(t) == 1 else t
        for p, vals in node.items():
            if p.startswith("@"):
                continue
            out[p] = vals[0] if len(vals) == 1 else vals
        graph.append(out)
    doc: dict = {}
    if context:
        doc["@context"] = dict(context)
    doc["@graph"] = graph
    return doc


def normalize_triples(
    table: pa.Table,
    *,
    prefix: str | None = None,
    drop_blank: bool = True,
) -> set[tuple[str, str, str]]:
    """Comparable triple set: compact prefixes to local names, normalize the
    known rdf/rdfs/soya IRIs, drop datatype annotations, optionally drop
    triples rooted at blank nodes (identity is not stable across engines)."""
    known = {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type": "rdf:type",
        "http://www.w3.org/2000/01/rdf-schema#min": "rdfs:min",
        "http://www.w3.org/2000/01/rdf-schema#max": "rdfs:max",
        "http://www.w3.org/2000/01/rdf-schema#comment": "rdfs:comment",
        "http://ns.ownyourdata.eu/ns/soya-context/generalization": "soya:generalization",
    }

    SOYA_BASE = "http://ns.ownyourdata.eu/ns/soya-context/"

    def norm(term: str) -> str:
        if term in known:
            return known[term]
        if term in ("rdf:type", "rdfs:min", "rdfs:max", "rdfs:comment", "soya:generalization"):
            return term  # already in canonical compact form
        if term.startswith(SOYA_BASE):
            return term[len(SOYA_BASE):]
        if term.startswith("soya:"):
            return term[len("soya:"):]
        if prefix and term.startswith(prefix):
            return term[len(prefix):]
        if ":" in term and not term.startswith(("http", "_:", "urn:")):
            # compact 'oyd:x' -> local name
            return term.split(":", 1)[1]
        return term

    out = set()
    for s, p, o, k in zip(
        table.column("subj").to_pylist(),
        table.column("pred").to_pylist(),
        table.column("obj").to_pylist(),
        table.column("obj_kind").to_pylist(),
    ):
        if drop_blank and (s.startswith("_:") or s.startswith("urn:skolem:")):
            continue
        # IRIs sometimes arrive as plain string literals (e.g. Jena writing a
        # bucket's rdf:type as a string property) — normalize those too
        obj = (
            norm(o)
            if k == "iri" or o.startswith(("http://", "https://", "urn:", "soya:"))
            else o
        )
        out.add((norm(s), norm(p), obj))
    return out


def triple_precision_recall(
    got: set[tuple[str, str, str]], want: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got and not want:
        return 1.0, 1.0
    inter = len(got & want)
    p = inter / len(got) if got else 0.0
    r = inter / len(want) if want else 0.0
    return p, r
