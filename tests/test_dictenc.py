"""Dictionary-encoded triple store (kg/dictenc): id assignment, encode /
decode round trip, constant resolution, empty-input schema stability."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.kg.dictenc import (
    build_term_dictionary,
    decode_bindings,
    encode_triples,
    resolve_terms,
)

TRIPLES = pa.table(
    {
        "subj": pa.array(["urn:a", "urn:b", "urn:a", "urn:c"]),
        "pred": pa.array(["p1", "p2", "p2", "p1"]),
        "obj": pa.array(["urn:b", "lit1", "urn:c", "lit1"]),
    }
)


def _tri():
    return rd.from_arrow(TRIPLES).repartition(3)


def test_dictionary_ids_are_dense_sorted_ranks(ray_session):
    d = build_term_dictionary(_tri()).take_all()
    terms = sorted({*TRIPLES["subj"].to_pylist(), *TRIPLES["pred"].to_pylist(),
                    *TRIPLES["obj"].to_pylist()})
    got = {r["term"]: r["term_id"] for r in d}
    assert got == {t: i for i, t in enumerate(terms)}


def test_encode_decode_roundtrip(ray_session):
    tri = _tri()
    d = build_term_dictionary(tri).materialize()
    enc = encode_triples(tri, d).materialize()
    assert enc.count() == TRIPLES.num_rows
    # every id is a legal dictionary id and decoding restores the multiset
    dec = decode_bindings(
        enc, d, {"subj": "s_id", "pred": "p_id", "obj": "o_id"},
        broadcast_cols=("pred",),
    ).take_all()
    got = sorted((r["subj"], r["pred"], r["obj"]) for r in dec)
    want = sorted(zip(*[TRIPLES[c].to_pylist() for c in ("subj", "pred", "obj")]))
    assert got == want


def test_resolve_terms_missing_raises(ray_session):
    d = build_term_dictionary(_tri()).materialize()
    ids = resolve_terms(d, ["p1", "urn:c"])
    assert set(ids) == {"p1", "urn:c"}
    with pytest.raises(KeyError):
        resolve_terms(d, ["nope"])


def test_empty_triples_yield_empty_schema_stable_dictionary(ray_session):
    empty = rd.from_arrow(TRIPLES.slice(0, 0)).repartition(2)
    d = build_term_dictionary(empty)
    assert d.count() == 0
    assert set(d.schema().names) == {"term", "term_id"}


def test_encoded_store_pushdown_roundtrip(ray_session, tmp_path):
    from anonymization_ray.kg.dictenc import (
        read_pred_encoded,
        write_encoded_store,
    )

    store = str(tmp_path / "store")
    d = write_encoded_store(_tri(), store)
    # constant-pred pushdown read equals the filtered full scan
    ids = {r["term"]: r["term_id"] for r in d.take_all()}
    got = sorted(
        (r["s_id"], r["o_id"]) for r in read_pred_encoded(store, "p1").take_all()
    )
    want = sorted(
        (ids[s], ids[o])
        for s, p, o in zip(*[TRIPLES[c].to_pylist() for c in ("subj", "pred", "obj")])
        if p == "p1"
    )
    assert got == want
    import pytest as _pytest

    with _pytest.raises(KeyError):
        read_pred_encoded(store, "not_a_pred")


def test_encoded_store_overwrites_not_appends(ray_session, tmp_path):
    from anonymization_ray.kg.dictenc import read_pred_encoded, write_encoded_store

    store = str(tmp_path / "store")
    write_encoded_store(_tri(), store)
    write_encoded_store(_tri(), store)  # second write must truncate
    assert read_pred_encoded(store, "p2").count() == 2


def test_store_stats_feed_the_bgp_optimizer(ray_session, tmp_path):
    from anonymization_ray.kg.bgp import optimize_pattern_order
    from anonymization_ray.kg.dictenc import read_store_stats, write_encoded_store

    store = str(tmp_path / "store")
    write_encoded_store(_tri(), store)
    stats = read_store_stats(store)
    assert stats == {"p1": 2, "p2": 2}
    # the persisted stats drive planning without touching the corpus: a
    # supplied pred_counts table must produce the same order as the fold
    pats = [("?a", "p1", "?b"), ("?b", "p2", "c")]
    ordered = optimize_pattern_order(_tri(), pats, pred_counts=stats)
    baseline = optimize_pattern_order(_tri(), pats)
    assert ordered == baseline
