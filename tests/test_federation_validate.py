"""SERVICE federation (bound join) and SHACL cardinality unit semantics."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.kg.federation import service_join
from anonymization_ray.kg.validate import validate_cardinality


def _triples(rows):
    s, p, o = zip(*rows)
    return rd.from_arrow(
        pa.table({"subj": list(s), "pred": list(p), "obj": list(o)})
    ).repartition(2)


REMOTE = _triples(
    [("s1", "operatesIn", "n1"), ("s2", "operatesIn", "n1"),
     ("s3", "operatesIn", "n2"), ("s4", "operatesIn", "n9")]
)


def test_service_join_inner_semantics(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1", "c2"], "n": ["n1", "n2"]}))
    out = service_join(local, REMOTE, ("?s", "operatesIn", "?n"), shared="n")
    got = sorted((r["c"], r["n"], r["s"]) for r in out.take_all())
    assert got == [("c1", "n1", "s1"), ("c1", "n1", "s2"), ("c2", "n2", "s3")]


def test_service_join_no_joinable_solution_is_schema_stable(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["nope"]}))
    out = service_join(local, REMOTE, ("?s", "operatesIn", "?n"), shared="n")
    assert out.count() == 0
    assert set(out.schema().names) == {"c", "n", "s"}


def test_service_join_unbound_shared_raises(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["n1"]}))
    with pytest.raises(ValueError, match="not bound"):
        service_join(local, REMOTE, ("?s", "operatesIn", "n1"), shared="n")


def test_service_row_cap(ray_session, monkeypatch):
    import anonymization_ray.kg.federation as fed

    monkeypatch.setattr(fed, "BROADCAST_ROW_CAP", 1)
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["n1"]}))
    with pytest.raises(ValueError, match="BROADCAST_ROW_CAP"):
        service_join(local, REMOTE, ("?s", "operatesIn", "?n"), shared="n")


def test_validate_cardinality_min_and_max(ray_session):
    g = _triples(
        [
            ("a", "isA", "x"), ("b", "isA", "x"), ("c", "isA", "x"),
            ("a", "hasV", "1"),
            ("b", "hasV", "1"), ("b", "hasV", "2"),
            # c has zero hasV; d bears hasV but is NOT a focus node
            ("d", "hasV", "9"),
        ]
    )
    out = validate_cardinality(
        g, focus_pred="isA", pred="hasV", min_count=1, max_count=1
    ).take_all()
    got = sorted((r["focus"], r["got"]) for r in out)
    assert got == [("b", 2), ("c", 0)]
    assert all(r["rule"] == "count(hasV) in [1, 1]" for r in out)
