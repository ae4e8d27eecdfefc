"""SPARQL UPDATE (delete/insert where) and negated-property-set paths:
unit-level semantics on a hand-built graph (the sf-scale results are
oracle-gated in the registry sweep)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.kg.paths import eval_path, parse_path
from anonymization_ray.kg.update import delete_insert_where, instantiate_template

GRAPH = pa.table(
    {
        "subj": pa.array(["a", "a", "b", "c"]),
        "pred": pa.array(["knows", "age", "knows", "age"]),
        "obj": pa.array(["b", "41", "c", "9"]),
    }
)


def _g():
    return rd.from_arrow(GRAPH).repartition(2)


def _rows(ds):
    return sorted((r["subj"], r["pred"], r["obj"]) for r in ds.take_all())


def test_update_delete_only(ray_session):
    # WHERE {?x age ?v} DELETE {?x age ?v} — all age triples removed
    bind = rd.from_arrow(pa.table({"x": ["a", "c"], "v": ["41", "9"]}))
    out = delete_insert_where(_g(), bind, delete=[("?x", "age", "?v")])
    assert _rows(out) == [("a", "knows", "b"), ("b", "knows", "c")]


def test_update_delete_insert_same_solutions(ray_session):
    bind = rd.from_arrow(pa.table({"x": ["a"], "v": ["41"]}))
    out = delete_insert_where(
        _g(), bind,
        delete=[("?x", "age", "?v")],
        insert=[("?x", "ageBand", "adult")],
    )
    rows = _rows(out)
    assert ("a", "age", "41") not in rows
    assert ("a", "ageBand", "adult") in rows
    assert ("c", "age", "9") in rows  # unmatched solution untouched


def test_update_insert_dedup_union(ray_session):
    # inserting a triple that already survives deletion: dedup_union keeps
    # the graph a set
    bind = rd.from_arrow(pa.table({"x": ["a"]}))
    out = delete_insert_where(
        _g(), bind, insert=[("?x", "knows", "b")], dedup_union=True
    )
    rows = _rows(out)
    assert rows.count(("a", "knows", "b")) == 1


def test_instantiate_constant_and_var(ray_session):
    bind = rd.from_arrow(pa.table({"x": ["p", "q"]}))
    t = instantiate_template(bind, ("?x", "type", "Person")).take_all()
    assert sorted((r["subj"], r["pred"], r["obj"]) for r in t) == [
        ("p", "type", "Person"),
        ("q", "type", "Person"),
    ]


def test_negated_set_scan(ray_session):
    out = eval_path(_g(), "!age")
    assert sorted((r["s"], r["o"]) for r in out.take_all()) == [
        ("a", "b"),
        ("b", "c"),
    ]


def test_negated_set_multi_and_sequence(ray_session):
    # !(age)/knows : knows-hop then knows again == a->c via b
    out = eval_path(_g(), "!(age)/!(age)")
    assert sorted((r["s"], r["o"]) for r in out.take_all()) == [("a", "c")]


def test_negated_parse_errors():
    with pytest.raises(ValueError):
        parse_path("!(a|)")
    with pytest.raises(ValueError):
        parse_path("!")


QUADS = pa.table(
    {
        "subj": pa.array(["a", "a", "b", "z"]),
        "pred": pa.array(["g1#p", "g1#q", "g2#p", "g3#p"]),
        "obj": pa.array(["1", "2", "3", "4"]),
    }
)


def _q():
    return rd.from_arrow(QUADS).repartition(2)


def _qrows(ds):
    return sorted((r["subj"], r["pred"], r["obj"]) for r in ds.take_all())


def test_graph_clear(ray_session):
    from anonymization_ray.kg.update import manage_graph

    out = manage_graph(_q(), "CLEAR", src="g1")
    assert _qrows(out) == [("b", "g2#p", "3"), ("z", "g3#p", "4")]


def test_graph_add_dedups_destination(ray_session):
    from anonymization_ray.kg.update import manage_graph

    # g2 already holds (b, p, 3); add g2 into g1 twice-over: dst dedups,
    # src survives, g3 untouched
    out = manage_graph(_q(), "ADD", src="g2", dst="g1")
    rows = _qrows(out)
    assert rows.count(("b", "g1#p", "3")) == 1
    assert ("b", "g2#p", "3") in rows and ("z", "g3#p", "4") in rows
    assert len(rows) == 5
    # adding when dst ALREADY has the triple: still exactly one copy
    again = manage_graph(out, "ADD", src="g2", dst="g1")
    assert _qrows(again) == rows


def test_graph_copy_replaces_destination(ray_session):
    from anonymization_ray.kg.update import manage_graph

    out = manage_graph(_q(), "COPY", src="g2", dst="g1")
    assert _qrows(out) == [
        ("b", "g1#p", "3"), ("b", "g2#p", "3"), ("z", "g3#p", "4"),
    ]


def test_graph_move_replaces_and_clears_src(ray_session):
    from anonymization_ray.kg.update import manage_graph

    out = manage_graph(_q(), "MOVE", src="g1", dst="g2")
    assert _qrows(out) == [
        ("a", "g2#p", "1"), ("a", "g2#q", "2"), ("z", "g3#p", "4"),
    ]


def test_graph_same_src_dst_noop_and_errors(ray_session):
    from anonymization_ray.kg.update import manage_graph

    assert _qrows(manage_graph(_q(), "ADD", src="g1", dst="g1")) == _qrows(_q())
    with pytest.raises(ValueError):
        manage_graph(_q(), "CLEAR")
    with pytest.raises(ValueError):
        manage_graph(_q(), "SHUFFLE", src="g1", dst="g2")


def test_cep_pattern_overlap_semantics(ray_session):
    # vcpvccp has two non-overlapping vc+p matches; vcvcp has ONE (RE2
    # non-overlapping scan consumes greedily left-to-right)
    import pyarrow as pa
    import pyarrow.compute as pc

    n = pc.count_substring_regex(
        pa.array(["vcpvccp", "vcvcp", "vvvp", "p"]), "vc+p"
    )
    assert n.to_pylist() == [2, 1, 0, 0]


def _pairs(ds):
    return sorted((r["s"], r["o"]) for r in ds.take_all())


def test_bounded_rep_exact_and_range(ray_session):
    # chain a->b->c via knows: {2} = exactly two hops; {1,2} = both
    assert _pairs(eval_path(_g(), "knows{2}")) == [("a", "c")]
    assert _pairs(eval_path(_g(), "knows{1,2}")) == [
        ("a", "b"), ("a", "c"), ("b", "c"),
    ]


def test_bounded_rep_zero_includes_identity(ray_session):
    out = _pairs(eval_path(_g(), "knows{0,1}"))
    # every graph term self-pairs, plus the one-hop pairs
    terms = {"a", "b", "c", "41", "9"}
    assert set(out) == {(t, t) for t in terms} | {("a", "b"), ("b", "c")}


def test_bounded_rep_parse_errors():
    with pytest.raises(ValueError):
        parse_path("knows{3,2}")
    with pytest.raises(ValueError):
        parse_path("knows{")
