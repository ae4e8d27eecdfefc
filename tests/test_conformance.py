"""Conformance vs the reference's own pytest corpus
(/root/reference/pytest/02_{input,output}_flat_json — read-only).

The reference's config graph (fetched from the live SOyA URL at request time,
not in its repo) is vendored as a SOyA overlay JSON-LD fixture
(tests/fixtures/anonymisation_demo_soya.jsonld, shape per FIXTURES.md §1-§3)
and parsed through the same extraction path a real request uses
(soya.parse_soya_config): deterministic cases (masking, generalization
numeric/date, object generalization) must match the goldens EXACTLY;
randomized values are checked structurally (bounds, determinism) since the
reference's java.util.Random stream is not bit-replicated (BASELINE.md P/R
gate).
"""

import json
import math
import os

import pytest

from anonymization_ray.config import AnonymizationConfig, AttributeConfig
from anonymization_ray.pipelines.flat import (
    RequestModelError,
    anonymize_flat_request,
    validate_key,
    validate_request,
)
from anonymization_ray.soya import parse_soya_config

IN_DIR = "/root/reference/pytest/02_input_flat_json"
OUT_DIR = "/root/reference/pytest/02_output_flat_json"

with open(os.path.join(os.path.dirname(__file__), "fixtures", "anonymisation_demo_soya.jsonld")) as _f:
    REF_CONFIG = parse_soya_config(_f.read())

REF_CONFIG2 = AnonymizationConfig(
    (
        AttributeConfig("Object1", "name", "string", "masking"),
        AttributeConfig("Object1", "gehalt", "float", "generalization"),
        AttributeConfig("Object1", "geburtsdatum", "date", "generalization"),
        AttributeConfig("Object2", "latitude", "float", "randomization"),
        AttributeConfig("Object2", "longitude", "float", "randomization"),
    )
)


def load_case(name):
    with open(f"{IN_DIR}/{name}.json") as f:
        req = json.load(f)
    with open(f"{OUT_DIR}/{name}.json") as f:
        golden = json.load(f)
    return req, golden


def run(req, config):
    return anonymize_flat_request(
        req["data"],
        config,
        seed=req.get("randomSeed", 0),
        include_original_data=req.get("includeOriginalData", False),
        use_adjusted_attributes=req.get("useAdjustedAttributes", True),
    )


def test_case_11_masking_exact():
    req, golden = load_case("11-maksing")
    got = run(req, REF_CONFIG)
    assert got == golden


def test_case_12_generalization_exact():
    req, golden = load_case("12-generalization")
    got = run(req, REF_CONFIG)
    assert got["kpis"] == golden["kpis"]
    # The reference's tie order among EQUAL attribute values is arbitrary
    # (HashMap iteration); ours is deterministic by row id. Records whose
    # value sits tied exactly across a bucket cut may land in the adjacent
    # bucket. Everything else must match exactly; the tie fraction is tiny
    # (4/1000 here), far inside the P/R >= 0.95 gate (BASELINE.md).
    from collections import Counter

    gehalt_counts = Counter(r.get("gehalt") for r in req["data"])
    diffs = 0
    for i, (g_row, ref_row) in enumerate(zip(got["data"], golden["data"])):
        if g_row == ref_row:
            continue
        diffs += 1
        mism = {k for k in set(g_row) | set(ref_row) if g_row.get(k) != ref_row.get(k)}
        assert mism == {"gehalt_generalized"}, (i, mism)
        assert gehalt_counts[req["data"][i]["gehalt"]] > 1, "diff on a non-tied value"
    assert diffs / len(golden["data"]) < 0.01


@pytest.mark.parametrize("name", ["12-generalization-address", "13-generalization-address"])
def test_case_object_generalization_exact(name):
    req, golden = load_case(name)
    got = run(req, REF_CONFIG)
    assert got == golden


def test_case_14_randomization_structural():
    req, golden = load_case("14-randomization")
    got = run(req, REF_CONFIG)
    # same row structure (keys) as the golden
    assert len(got["data"]) == len(golden["data"])
    for g_row, ref_row in zip(got["data"], golden["data"]):
        assert set(g_row.keys()) == set(ref_row.keys())
    # randomized values stay within the original per-attribute range
    lons = [float(r["longitude"]) for r in req["data"] if r.get("longitude")]
    for row in got["data"]:
        if "longitude_randomized" in row:
            assert min(lons) - 1e-9 <= float(row["longitude_randomized"]) <= max(lons) + 1e-9
    # deterministic per-attribute KPI bucket counts match exactly
    assert {
        k: v for k, v in got["kpis"]["kpiAnonymisationDemo"].items() if k != "k-Anonymity"
    } == {
        k: v for k, v in golden["kpis"]["kpiAnonymisationDemo"].items() if k != "k-Anonymity"
    }
    # k-anonymity is RNG-dependent; ours must still be a sane group size
    ka = got["kpis"]["kpiAnonymisationDemo"]["k-Anonymity"]
    assert 1 <= ka <= len(req["data"])
    # same seed => identical output
    again = run(req, REF_CONFIG)
    assert again == got


def test_case_15_multiple_attributes_mixed():
    req, golden = load_case("15-multiple-attributes")
    got = run(req, REF_CONFIG)
    assert len(got["data"]) == len(golden["data"])
    for g_row, ref_row in zip(got["data"], golden["data"]):
        assert set(g_row.keys()) == set(ref_row.keys())
        # deterministic fields match exactly
        for key in ("ID", "types", "latitude_generalized", "start_pv_generalized"):
            if key in ref_row:
                assert g_row[key] == ref_row[key], key
    gk = got["kpis"]["kpiAnonymisationDemo"]
    rk = golden["kpis"]["kpiAnonymisationDemo"]
    assert {k: v for k, v in gk.items() if k != "k-Anonymity"} == {
        k: v for k, v in rk.items() if k != "k-Anonymity"
    }


def _norm_types(row):
    r = dict(row)
    if "types" in r:
        r["types"] = sorted(r["types"])  # the reference's type order is arbitrary
    return r


def test_case_16_multiple_objects():
    req, golden = load_case("16-multiple-objects")
    got = run(req, REF_CONFIG2)
    assert len(got["data"]) == len(golden["data"])
    for g_row, ref_row in zip(got["data"], golden["data"]):
        assert set(g_row.keys()) == set(ref_row.keys())
        if "Object2" not in ref_row.get("types", []):
            assert _norm_types(g_row) == _norm_types(ref_row)  # deterministic rows
        else:
            # randomized attrs differ; everything deterministic must match
            det_g = {k: v for k, v in _norm_types(g_row).items() if "_randomized" not in k}
            det_r = {k: v for k, v in _norm_types(ref_row).items() if "_randomized" not in k}
            assert det_g == det_r
    assert got["kpis"]["kpiObject1"] == golden["kpis"]["kpiObject1"]
    assert {
        k: v for k, v in got["kpis"]["kpiObject2"].items() if k != "k-Anonymity"
    } == {k: v for k, v in golden["kpis"]["kpiObject2"].items() if k != "k-Anonymity"}


def test_case_17_use_original_attributes():
    req, golden = load_case("17-use-original-attributes")
    got = run(req, REF_CONFIG)
    assert len(got["data"]) == len(golden["data"])
    for g_row, ref_row in zip(got["data"], golden["data"]):
        assert set(g_row.keys()) == set(ref_row.keys())
        assert g_row["name"] == "*****"
        # generalized primitives vanish (bucket resources aren't literals)
        assert "latitude" not in g_row and "start_pv" not in g_row
    assert {
        k: v for k, v in got["kpis"]["kpiAnonymisationDemo"].items() if k != "k-Anonymity"
    } == {
        k: v
        for k, v in golden["kpis"]["kpiAnonymisationDemo"].items()
        if k != "k-Anonymity"
    }


# --- error cases (reference 01-05 semantics) -------------------------------

def test_invalid_key_rejected():
    with pytest.raises(RequestModelError):
        validate_key("bad-key!")
    with pytest.raises(RequestModelError):
        validate_key("1leading")
    validate_key("fine_Key2")


def test_adjusted_original_constraint():
    with pytest.raises(RequestModelError):
        validate_request(use_adjusted_attributes=False, include_original_data=True)
    validate_request(use_adjusted_attributes=False, include_original_data=False)
