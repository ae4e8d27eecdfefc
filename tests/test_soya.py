"""SOyA config-graph parser tests (reference ConfigurationService /
QueryBuildingService semantics)."""

import json
import os

import pytest

from anonymization_ray.config import AnonymizationConfig, AttributeConfig, ConfigError
from anonymization_ray.soya import PARSE_ERROR, parse_soya_config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "anonymisation_demo_soya.jsonld")

REF_CONFIG = AnonymizationConfig(
    (
        AttributeConfig("AnonymisationDemo", "name", "string", "masking"),
        AttributeConfig("AnonymisationDemo", "latitude", "float", "generalization"),
        AttributeConfig("AnonymisationDemo", "longitude", "float", "randomization"),
        AttributeConfig("AnonymisationDemo", "gehalt", "float", "generalization"),
        AttributeConfig("AnonymisationDemo", "start_pv", "date", "generalization"),
        AttributeConfig("AnonymisationDemo", "geburtsdatum", "date", "randomization"),
        AttributeConfig(
            "AnonymisationDemo",
            "adresse",
            "Address",
            "generalization",
            ("detail", "zip", "city", "state", "country"),
        ),
    )
)


def load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def test_demo_overlay_matches_hand_built_config():
    got = parse_soya_config(load_fixture())
    assert got == REF_CONFIG
    # IRI provenance for the request surface's prefix matching
    lat = [a for a in got.attributes if a.attribute == "latitude"][0]
    assert lat.attribute_iri == "https://soya.ownyourdata.eu/AnonymisationDemo/latitude"
    assert lat.object_iri == "https://soya.ownyourdata.eu/AnonymisationDemo/AnonymisationDemo"


def test_accepts_raw_string_content():
    with open(FIXTURE) as f:
        assert parse_soya_config(f.read()) == REF_CONFIG


def test_attribute_order_as_rdf_first_rest_chain():
    doc = load_fixture()
    # rewrite the @list into an explicit rdf:first/rdf:rest blank chain
    levels = ["detail", "zip", "city", "state", "country"]
    chain = []
    for i, lv in enumerate(levels):
        cell = {"@id": f"_:c{i}", "rdf:first": lv}
        cell["rdf:rest"] = {"@id": f"_:c{i+1}"} if i + 1 < len(levels) else {"@id": "rdf:nil"}
        chain.append(cell)
    for node in doc["@graph"]:
        if node["@id"] == "oyd:adresse":
            node["soya:classification"] = [
                "generalization",
                {"soya:attributeOrder": {"@id": "_:c0"}},
            ]
    doc["@graph"].extend(chain)
    got = parse_soya_config(doc)
    adresse = [a for a in got.attributes if a.attribute == "adresse"][0]
    assert adresse.attribute_order == tuple(levels)


def test_invalid_content_raises_parse_error():
    # reference case 03/13: fetched content is not valid RDF
    with pytest.raises(ConfigError, match=PARSE_ERROR):
        parse_soya_config("<html>not rdf</html>")
    with pytest.raises(ConfigError, match=PARSE_ERROR):
        parse_soya_config(["not", "an", "object"])


def test_duplicate_property_raises():
    doc = load_fixture()
    # same property declared under two classifications -> SPARQL cross
    # product -> reference OntologyException (ConfigurationService.java:109)
    for node in doc["@graph"]:
        if node["@id"] == "oyd:name":
            node["soya:classification"] = ["masking", "masking"]
    with pytest.raises(ConfigError, match="Duplicate Property"):
        parse_soya_config(doc)


def test_no_overlay_yields_empty_config():
    assert parse_soya_config({"@context": {}, "@graph": []}).attributes == ()


def test_string_generalization_from_soya_rejected():
    doc = load_fixture()
    for node in doc["@graph"]:
        if node["@id"] == "oyd:name":
            node["soya:classification"] = "generalization"
            node["rdfs:range"] = {"@id": "xsd:string"}
    with pytest.raises(ConfigError):
        parse_soya_config(doc)


def test_decimal_ranged_attribute_classifies_numeric():
    """A decimal-ranged gen/rand attribute must dispatch to the NUMERIC codec
    end-to-end, not raise mid-pipeline (primitive-range set and the codec
    table must agree)."""
    from anonymization_ray.soya import PRIMITIVE_RANGE_LOCALS
    from anonymization_ray.stages.codecs import NUMERIC, kind_for_datatype

    assert "decimal" in PRIMITIVE_RANGE_LOCALS
    assert kind_for_datatype("decimal") == NUMERIC

    doc = load_fixture()
    # rewrite gehalt's range to xsd:decimal — still primitive generalization
    for node in doc["@graph"]:
        rng = node.get("rdfs:range")
        if node.get("@id", "").endswith("gehalt") and rng is not None:
            node["rdfs:range"] = {"@id": "xsd:decimal"}
    got = parse_soya_config(doc)
    gehalt = [a for a in got.attributes if a.attribute == "gehalt"][0]
    assert gehalt.datatype == "decimal"
    assert not gehalt.is_object
    from anonymization_ray.pipelines.flat import anonymize_flat_request

    rows = [
        {"type": "AnonymisationDemo", "ID": str(i), "gehalt": f"{100 + i}.5"}
        for i in range(12)
    ]
    out = anonymize_flat_request(rows, got, seed=1)
    assert len(out["data"]) == 12
    assert all("gehalt_generalized" in r for r in out["data"])
