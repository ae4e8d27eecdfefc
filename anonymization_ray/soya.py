"""SOyA config-graph ingestion — the reference's configuration is *data*: a
JSON-LD overlay fetched by URL and reduced with SPARQL. This module replicates
that extraction over the same JSON-LD subset without a SPARQL engine:

- overlay discovery + onBase objects, property domain/range/classification
  (reference ``QueryBuildingService.createConfigQuery``,
  QueryBuildingService.java:15-29)
- ``soya:attributeOrder`` RDF-list walk for object generalization
  (``createAttributeOrderQuery``, QueryBuildingService.java:48-63;
  ``QueryService.getAttributeOrder``, QueryService.java:51-62)
- duplicate-property detection -> ConfigError, mirroring the reference's
  OntologyException (``ConfigurationService.extractConfig``,
  ConfigurationService.java:104-131)
- unparseable content -> ConfigError("Exception when parsing the fetched
  ontology") (``ConfigurationService.getModel``,
  ConfigurationService.java:56-73).

Config graphs are tiny (dimension-scale); parsing is driver-side by design —
the parsed ``AnonymizationConfig`` is what rides the object store into the
distributed stages.
"""

from __future__ import annotations

import json

from .config import AnonymizationConfig, AttributeConfig, ConfigError

SOYA_NAMESPACES = (
    "https://w3id.org/soya/ns#",
    "http://ns.ownyourdata.eu/ns/soya-context/",
)
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# the reference decides primitive-vs-object generalization with
# Set.of("integer","double","date") (ConfigurationService.java:141-148);
# float/dateTime are deliberately included here — they are primitive
# datatypes in every other reference code path (Configuration.java,
# AnonymizationService dispatch) and the demo ontology only ever used
# double/date, so the narrower set is an artifact, not a semantic
PRIMITIVE_RANGE_LOCALS = {"integer", "double", "float", "decimal", "date", "dateTime"}

PARSE_ERROR = "Exception when parsing the fetched ontology"


def extract_value_from_url(url: str) -> str:
    """Local name: substring after the last '/' or '#'
    (``ConfigurationService.extractValueFromURL``, :150-153)."""
    idx = max(url.rfind("/"), url.rfind("#"))
    return url[idx + 1 :] if idx != -1 else url


class _Graph:
    """Flattened view of a compact JSON-LD document: node map + prefix
    expansion (same subset as sources/jsonld.py — prefix @context,
    @graph array, {@id} refs, {@value} / plain literals, @list)."""

    def __init__(self, doc: dict):
        ctx = doc.get("@context") or {}
        self.prefixes = {k: v for k, v in ctx.items() if isinstance(v, str) and not k.startswith("@")}
        self.vocab = ctx.get("@vocab") if isinstance(ctx.get("@vocab"), str) else None
        self.nodes: dict[str, dict] = {}
        self._bn = 0
        graph = doc.get("@graph")
        items = graph if isinstance(graph, list) else [doc]
        for n in items:
            if isinstance(n, dict):
                self._register(n)

    def _register(self, node: dict) -> str:
        nid = node.get("@id")
        if nid is None:
            self._bn += 1
            nid = f"_:soya{self._bn}"
        nid = self.expand(str(nid))
        merged = self.nodes.setdefault(nid, {})
        for k, v in node.items():
            if k == "@id":
                continue
            merged.setdefault(k, [])
            merged[k].extend(v if isinstance(v, list) else [v])
        # register inline node objects so chains resolve, replacing them with refs
        for k, vals in merged.items():
            if k.startswith("@"):
                continue
            for i, v in enumerate(vals):
                if isinstance(v, dict) and "@value" not in v and "@list" not in v and set(v) != {"@id"}:
                    vals[i] = {"@id": self._register(v)}
        return nid

    def expand(self, term: str) -> str:
        if ":" in term:
            pfx, rest = term.split(":", 1)
            if pfx in self.prefixes:
                return self.prefixes[pfx] + rest
            return term
        if self.vocab:
            return self.vocab + term
        return term

    def values(self, node: dict, iris: set[str]) -> list:
        out = []
        for k, vals in node.items():
            if k.startswith("@"):
                continue
            if self.expand(k) in iris:
                out.extend(vals)
        return out

    def types(self, node: dict) -> list[str]:
        return [self.expand(str(t)) for t in node.get("@type", [])]

    def ref(self, v) -> str | None:
        if isinstance(v, dict) and "@id" in v:
            return self.expand(str(v["@id"]))
        if isinstance(v, str):
            return self.expand(v)
        return None

    def rdf_list(self, v) -> list:
        """@list shortcut or rdf:first/rdf:rest chain -> python list."""
        if isinstance(v, dict) and "@list" in v:
            return list(v["@list"])
        out = []
        cur = self.ref(v)
        first = {RDF_NS + "first", "rdf:first"}
        rest = {RDF_NS + "rest", "rdf:rest"}
        seen = set()
        while cur is not None and cur not in seen and cur in self.nodes:
            seen.add(cur)
            node = self.nodes[cur]
            f = self.values(node, first)
            if not f:
                break
            out.append(f[0])
            r = self.values(node, rest)
            cur = self.ref(r[0]) if r else None
            if cur is not None and extract_value_from_url(cur) == "nil":
                break
        return out


def _soya(local: str) -> set[str]:
    return {ns + local for ns in SOYA_NAMESPACES}


def parse_soya_config(doc: str | dict) -> AnonymizationConfig:
    """SOyA overlay JSON-LD -> AnonymizationConfig.

    Accepts the raw fetched string or an already-decoded dict; anything that
    is not a JSON-LD object raises ConfigError with the reference's parse
    message (case 03/13 semantics)."""
    if isinstance(doc, (str, bytes)):
        try:
            doc = json.loads(doc)
        except (ValueError, TypeError):
            raise ConfigError(PARSE_ERROR)
    if not isinstance(doc, dict):
        raise ConfigError(PARSE_ERROR)
    g = _Graph(doc)

    overlay_type = _soya("OverlayClassification")
    on_base = _soya("onBase")
    classification = _soya("classification")
    attribute_order = _soya("attributeOrder")
    domain = {RDFS_NS + "domain", "rdfs:domain"}
    rng = {RDFS_NS + "range", "rdfs:range"}

    bases: list[str] = []
    for nid, node in g.nodes.items():
        if any(t in overlay_type for t in g.types(node)):
            for v in g.values(node, on_base):
                ref = g.ref(v)
                if ref is not None and ref not in bases:
                    bases.append(ref)
    if not bases:
        # a fetched document with no overlay yields an empty model in the
        # reference (valid RDF, zero config rows) — mirror as empty config
        return AnonymizationConfig(())

    entries: list[AttributeConfig] = []
    seen_props: set[str] = set()
    for nid, node in g.nodes.items():
        doms = [g.ref(v) for v in g.values(node, domain)]
        doms = [d for d in doms if d in bases]
        if not doms:
            continue
        ranges = [g.ref(v) for v in g.values(node, rng)]
        ranges = [r for r in ranges if r is not None]
        methods = [v for v in g.values(node, classification) if isinstance(v, str)]
        methods = [m for m in methods if m in ("generalization", "randomization", "masking")]
        rows = [(d, r, m) for d in doms for r in ranges for m in methods]
        if not rows:
            continue
        # the SPARQL cross product yields >1 row per property exactly when a
        # property has multiple domains/ranges/classifications — the
        # reference's duplicate check fires on the second row
        if len(rows) > 1 or nid in seen_props:
            raise ConfigError(f"Duplicate Property key found in Ontology: {nid}")
        seen_props.add(nid)
        obj_iri, range_iri, method = rows[0]
        dt_local = extract_value_from_url(range_iri)
        order: tuple[str, ...] = ()
        if method == "generalization" and dt_local not in PRIMITIVE_RANGE_LOCALS:
            # object generalization: walk the attributeOrder list hanging off
            # the property's non-literal classification node
            for v in g.values(node, classification):
                ref = g.ref(v)
                if ref is None or ref not in g.nodes:
                    continue
                for lst in g.values(g.nodes[ref], attribute_order):
                    items = g.rdf_list(lst)
                    order = tuple(
                        it if isinstance(it, str) and not isinstance(it, dict)
                        else extract_value_from_url(g.ref(it) or "")
                        for it in items
                    )
                    order = tuple(
                        extract_value_from_url(x) if x.startswith(("http://", "https://")) else x
                        for x in order
                    )
        entries.append(
            AttributeConfig(
                object_type=extract_value_from_url(obj_iri),
                attribute=extract_value_from_url(nid),
                datatype=dt_local,
                method=method,
                attribute_order=order,
                object_iri=obj_iri,
                attribute_iri=nid,
            )
        )
    # deterministic order: document declaration order (self.nodes preserves
    # @graph insertion order) — stable across runs for the same overlay
    return AnonymizationConfig(tuple(entries))
