"""Request surface — the reference's REST endpoints as library functions.

``handle_flat_request`` / ``handle_jsonld_request`` accept the same payload
shapes as the reference's ``PUT /api/anonymization/flatjson`` /
``PUT /api/anonymization`` and return either the success body or a
structured error body replicating ``GlobalExceptionHandler``:

- bean-validation failures -> ``{"status": 400, "error": "Validation
  failed", "messages": {field: message}}`` (GlobalExceptionHandler.java:27-40,
  DTO messages AnonymizationFlatJsonRequestDto.java:13-48)
- ontology fetch/parse failures -> RFC-7807 problem, status 404, title
  "Error in ontology fetching or parsing" (GlobalExceptionHandler.java:42-49)
- payload-shape failures (flat data not an array) -> status 500, title
  "Error creation Json output" (Jackson deserialization surfaces through
  handleMessageNotReadable, GlobalExceptionHandler.java:78-85)

Configuration fetching is injectable: ``fetch(url) -> str`` returns the SOyA
JSON-LD content or raises ``OntologyFetchError``. ``static_fetcher`` builds
one from a dict (tests vendor the demo overlay); ``http_fetcher`` is the
live stdlib-urllib client with the reference's error semantics
(ConfigurationService.java:72-101).
"""

from __future__ import annotations

from .config import AnonymizationConfig, AttributeConfig, ConfigError
from .pipelines.flat import RequestModelError, anonymize_flat_request
from .pipelines.jsonld import anonymize_jsonld_request
from .soya import extract_value_from_url, parse_soya_config

FLAT_INSTANCE = "/api/anonymization/flatjson"
JSONLD_INSTANCE = "/api/anonymization"
SOYA_OUT = "soya:"  # pipelines/jsonld output prefix for kpi nodes

_IRI_SCHEME = tuple("abcdefghijklmnopqrstuvwxyz")


class OntologyFetchError(Exception):
    """Configuration URL could not be fetched (reference OntologyException
    from ConfigurationService.fetchStringContent)."""

    def __init__(self, url: str):
        self.url = url
        super().__init__(f"Failed to fetch ontology from URL: {url}")


def static_fetcher(mapping: dict[str, str]):
    """fetch(url) over canned contents; unknown urls raise like a dead URL."""

    def fetch(url: str) -> str:
        if url not in mapping:
            raise OntologyFetchError(url)
        return mapping[url]

    return fetch


def http_fetcher(timeout: float = 30.0):
    """Live HTTP GET fetcher (stdlib urllib, no extra dependency) with the
    reference's error semantics (``ConfigurationService.fetchStringContent``,
    reference ConfigurationService.java:72-101): non-2xx status, empty body,
    URI syntax errors and transport errors all surface as
    ``OntologyFetchError`` — which the handlers map to the 404
    "Error in ontology fetching or parsing" problem body."""
    import urllib.error
    import urllib.request

    def fetch(url: str) -> str:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                status = getattr(resp, "status", 200)
                if not (200 <= status < 300):
                    raise OntologyFetchError(url)
                body = resp.read().decode("utf-8")
        except OntologyFetchError:
            raise
        except (urllib.error.URLError, ValueError, OSError) as e:
            raise OntologyFetchError(url) from e
        if not body:
            raise OntologyFetchError(url)
        return body

    return fetch


def _problem(status: int, title: str, detail: str, instance: str) -> dict:
    return {
        "type": "about:blank",
        "title": title,
        "status": status,
        "detail": detail,
        "instance": instance,
    }


def _validation_body(messages: dict[str, str]) -> dict:
    return {"status": 400, "error": "Validation failed", "messages": messages}


def _blank(v) -> bool:
    return not isinstance(v, str) or not v.strip()


def _load_config(url: str, fetch, instance: str) -> dict | AnonymizationConfig:
    try:
        content = fetch(url)
    except OntologyFetchError as e:
        return _problem(404, "Error in ontology fetching or parsing", str(e), instance)
    try:
        return parse_soya_config(content)
    except ConfigError as e:
        return _problem(404, "Error in ontology fetching or parsing", str(e), instance)


def _localize_config(
    config: AnonymizationConfig, prefix: str
) -> tuple[AnonymizationConfig, bool]:
    """Rebind IRI-carrying attributes to the names a flat request with this
    prefix produces (the reference types rows as ``prefix + type`` and
    properties as ``prefix + key`` — FaltJsonService.java:40-91 — and matches
    them against the ontology's full IRIs). Returns (config, any_match)."""
    out: list[AttributeConfig] = []
    matched = False
    for a in config.attributes:
        if a.object_iri is None or a.attribute_iri is None:
            out.append(a)
            matched = True
            continue
        if a.object_iri.startswith(prefix) and a.attribute_iri.startswith(prefix):
            matched = True
            out.append(
                AttributeConfig(
                    object_type=a.object_iri[len(prefix):],
                    attribute=a.attribute_iri[len(prefix):],
                    datatype=a.datatype,
                    method=a.method,
                    attribute_order=a.attribute_order,
                    object_iri=a.object_iri,
                    attribute_iri=a.attribute_iri,
                )
            )
    return AnonymizationConfig(tuple(out)), matched


_JACKSON_TOKEN = {
    dict: ("Object", "START_OBJECT"),
    str: ("String", "VALUE_STRING"),
    bool: ("Boolean", "VALUE_TRUE"),
    int: ("Number", "VALUE_NUMBER_INT"),
    float: ("Number", "VALUE_NUMBER_FLOAT"),
}


def _jackson_data_column(payload: dict) -> int:
    """1-based column where the top-level "data" value starts in the
    request as the reference's own pytest corpus serialized it
    (``requests.put(json=...)`` -> ``json.dumps`` default separators, one
    line) — the position Jackson reports in its deserialization error."""
    import json as _json

    pre: dict = {}
    for k, v in payload.items():
        if k == "data":
            break
        pre[k] = v
    base = len(_json.dumps(pre)) - 1  # content before '}' of the prefix
    return base + (2 if pre else 0) + len('"data": ') + 1


def handle_flat_request(payload: dict, *, fetch) -> dict:
    # Jackson deserializes the DTO before validation runs: a non-array data
    # node fails there (reference flat case 04) — replicate the full
    # Jackson message including token name and source position so the
    # reference's PUT-and-compare corpus matches byte-exactly
    data = payload.get("data")
    if data is not None and not isinstance(data, list):
        kind, token = _JACKSON_TOKEN.get(type(data), ("Object", "START_OBJECT"))
        if data is False:
            token = "VALUE_FALSE"
        return _problem(
            500,
            "Error creation Json output",
            "Cannot deserialize value of type `java.util.ArrayList<java.util.Map"
            f"<java.lang.String,java.lang.Object>>` from {kind} value "
            f"(token `JsonToken.{token}`)\n at [Source: REDACTED "
            "(`StreamReadFeature.INCLUDE_SOURCE_IN_LOCATION` disabled); "
            f"line: 1, column: {_jackson_data_column(payload)}] "
            "(through reference chain: "
            'com.example.anonymization.dto.AnonymizationFlatJsonRequestDto["data"])',
            FLAT_INSTANCE,
        )

    messages: dict[str, str] = {}
    if _blank(payload.get("configurationUrl")):
        messages["configurationUrl"] = "configurationUrl is mandatory"
    if _blank(payload.get("prefix")):
        messages["prefix"] = "Prefix is mandatory"
    if not data:
        messages["data"] = "data is mandatory"
    include_original = bool(payload.get("includeOriginalData", False))
    use_adjusted = bool(payload.get("useAdjustedAttributes", True))
    if include_original and not use_adjusted:
        messages["validAttributeConfiguration"] = (
            "useAdjustedAttributes must be true when includeOriginalData is true"
        )
    if messages:
        return _validation_body(messages)

    cfg = _load_config(payload["configurationUrl"], fetch, FLAT_INSTANCE)
    if isinstance(cfg, dict):
        return cfg

    prefix = payload["prefix"]
    local_cfg, any_match = _localize_config(cfg, prefix)
    if not any_match or not prefix.split(":", 1)[0].lower().startswith(_IRI_SCHEME):
        # reference flat case 05 (invalid prefix): the prefixed property /
        # type IRIs match nothing in the ontology, every SPARQL probe over
        # them returns empty — data comes back empty and each configured
        # object's k-anonymity group query degenerates to the single empty
        # GROUP_CONCAT row, i.e. k=1 (KpiService via createGroupsQuery,
        # QueryBuildingService.java:141-160)
        body: dict = {"data": []}
        if bool(payload.get("calculateKpi", True)):
            body["kpis"] = {
                f"kpi{extract_value_from_url(o or '')}": {"k-Anonymity": 1}
                for o in dict.fromkeys(a.object_iri for a in cfg.attributes)
            }
        return body

    try:
        # java_compat: endpoint requests are request-scale by definition, so
        # the byte-exact reference replication (Java-LCG randomization draws
        # + HashMap-order tie-breaks) is the default here; the distributed
        # engine pipelines keep the partition-independent Philox stream
        return anonymize_flat_request(
            data,
            local_cfg,
            seed=int(payload.get("randomSeed", 0)),
            calculate_kpi=bool(payload.get("calculateKpi", True)),
            include_original_data=include_original,
            use_adjusted_attributes=use_adjusted,
            java_compat=True,
            prefix=prefix,
        )
    except RequestModelError as e:
        return _problem(400, "Invalid request model", str(e), FLAT_INSTANCE)


def handle_jsonld_request(payload: dict, *, fetch) -> dict:
    messages: dict[str, str] = {}
    if _blank(payload.get("configurationUrl")):
        messages["configurationUrl"] = "configurationUrl is mandatory"
    if "data" not in payload or payload.get("data") is None:
        messages["data"] = "data is mandatory"
    include_original = bool(payload.get("includeOriginalData", False))
    use_adjusted = bool(payload.get("useAdjustedAttributes", True))
    if include_original and not use_adjusted:
        messages["validAttributeConfiguration"] = (
            "useAdjustedAttributes must be true when includeOriginalData is true"
        )
    if messages:
        return _validation_body(messages)

    cfg = _load_config(payload["configurationUrl"], fetch, JSONLD_INSTANCE)
    if isinstance(cfg, dict):
        return cfg

    from .sources.jsonld import write_jsonld

    data = payload["data"]
    calculate_kpi = bool(payload.get("calculateKpi", True))
    # a LIST payload is the JSON-LD EXPANDED form (third-party documents
    # arrive this way post-expansion) IF its nodes carry JSON-LD keywords
    # or IRI keys; a plain flat-JSON array (reference json-ld case 04)
    # parses to an EMPTY model instead — same discrimination Jena's JSONLD
    # read performs by dropping non-IRI terms during expansion
    is_expanded_jsonld = isinstance(data, list) and any(
        isinstance(n, dict)
        and any(k.startswith("@") or ":" in k for k in n)
        for n in data
    )
    if not (isinstance(data, dict) or is_expanded_jsonld):
        # non-JSON-LD data (reference json-ld case 04): RDF parsing yields an
        # empty model; the anonymization still runs and only the kpi nodes
        # survive serialization (k-anonymity of the empty type = 1, same
        # GROUP_CONCAT degeneration as flat case 05)
        import pyarrow as pa

        rows = []
        if calculate_kpi:
            for t in cfg.object_types:
                rows.append((f"{SOYA_OUT}kpi{t}", f"{SOYA_OUT}kanonymity", "1", "long"))
        s, p, o, k = zip(*rows) if rows else ([], [], [], [])
        t = pa.table(
            {
                "subj": pa.array(list(s), pa.string()),
                "pred": pa.array(list(p), pa.string()),
                "obj": pa.array(list(o), pa.string()),
                "obj_kind": pa.array(list(k), pa.string()),
            }
        )
        return write_jsonld(t)

    triples = anonymize_jsonld_request(
        data,
        cfg,
        seed=int(payload.get("randomSeed", 0)),
        calculate_kpi=calculate_kpi,
        include_original_data=include_original,
        use_adjusted_attributes=use_adjusted,
        java_compat=True,  # endpoint requests are request-scale; see flat path
    )
    return write_jsonld(triples, context=(data.get("@context") if isinstance(data, dict) else None))
