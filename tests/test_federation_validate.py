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


def REMOTE():
    # LAZY on purpose: building a Ray Dataset at module scope runs at
    # pytest COLLECTION time and auto-initializes Ray with default
    # settings before conftest's session fixture can configure it (the
    # fixture's ignore_reinit_error then silently no-ops) — every
    # join-partition heuristic in the whole session then sizes itself
    # for the wrong cluster. This exact bug broke 7 unrelated
    # hash-shuffle tests suite-wide.
    return _triples(
        [("s1", "operatesIn", "n1"), ("s2", "operatesIn", "n1"),
         ("s3", "operatesIn", "n2"), ("s4", "operatesIn", "n9")]
    )


def test_service_join_inner_semantics(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1", "c2"], "n": ["n1", "n2"]}))
    out = service_join(local, REMOTE(), ("?s", "operatesIn", "?n"), shared="n")
    got = sorted((r["c"], r["n"], r["s"]) for r in out.take_all())
    assert got == [("c1", "n1", "s1"), ("c1", "n1", "s2"), ("c2", "n2", "s3")]


def test_service_join_no_joinable_solution_is_schema_stable(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["nope"]}))
    out = service_join(local, REMOTE(), ("?s", "operatesIn", "?n"), shared="n")
    assert out.count() == 0
    assert set(out.schema().names) == {"c", "n", "s"}


def test_service_join_unbound_shared_raises(ray_session):
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["n1"]}))
    with pytest.raises(ValueError, match="not bound"):
        service_join(local, REMOTE(), ("?s", "operatesIn", "n1"), shared="n")


def test_service_row_cap(ray_session, monkeypatch):
    import anonymization_ray.kg.federation as fed

    monkeypatch.setattr(fed, "BROADCAST_ROW_CAP", 1)
    local = rd.from_arrow(pa.table({"c": ["c1"], "n": ["n1"]}))
    with pytest.raises(ValueError, match="BROADCAST_ROW_CAP"):
        service_join(local, REMOTE(), ("?s", "operatesIn", "?n"), shared="n")


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


def test_bellman_ford_weighted_vs_reference(ray_session):
    from anonymization_ray.extras.graph import bellman_ford

    # weighted digraph with a shorter 2-hop detour: 1->3 direct w=10,
    # 1->2->3 w=3+4=7; a cycle 3->1 must not diverge within the rounds
    E = [(1, 2, 3), (2, 3, 4), (1, 3, 10), (3, 1, 1), (2, 4, 100)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in E], pa.int64()),
                "dst": pa.array([e[1] for e in E], pa.int64()),
                "w": pa.array([e[2] for e in E], pa.int64()),
            }
        )
    ).repartition(2)
    got = {r["node"]: r["dist"] for r in bellman_ford(edges, [1], 4).take_all()}
    # reference: synchronous relaxation, 4 rounds
    ref = {1: 0}
    for _ in range(4):
        new = dict(ref)
        for s, d, w in E:
            if s in ref:
                v = ref[s] + w
                if d not in new or v < new[d]:
                    new[d] = v
        ref = new
    assert got == ref == {1: 0, 2: 3, 3: 7, 4: 103}


def test_bellman_ford_node_cap(ray_session):
    from anonymization_ray.extras.graph import bellman_ford

    edges = rd.from_arrow(
        pa.table({"src": pa.array([1], pa.int64()),
                  "dst": pa.array([2], pa.int64()),
                  "w": pa.array([1], pa.int64())})
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="node_cap"):
        bellman_ford(edges, [1], 2, node_cap=1)
