"""OWL inverse/symmetric closure unit tests (wave 65)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.kg.owl import materialize_property_semantics


def _graph():
    return rd.from_arrow(
        pa.table(
            {
                "subj": ["a", "a", "n1"],
                "pred": ["basedIn", "hasAccountBalance", "tradesWith"],
                "obj": ["n1", "42.5", "n2"],
                "obj_kind": ["iri", "double", "iri"],
            }
        )
    )


def _rows(ds):
    return {
        (r.subj, r.pred, r.obj, r.obj_kind)
        for r in ds.to_pandas().itertuples()
    }


def test_inverse_symmetric_and_literal_guard(ray_session):
    out = _rows(
        materialize_property_semantics(
            _graph(),
            inverse_map={"basedIn": "hasCustomer"},
            symmetric=("tradesWith",),
        )
    )
    assert ("n1", "hasCustomer", "a", "iri") in out
    assert ("n2", "tradesWith", "n1", "iri") in out
    # literal object never inverts; asserted rows all survive
    assert not any(p == "hasAccountBalance" and s == "42.5" for s, p, _, _ in out)
    assert ("a", "hasAccountBalance", "42.5", "double") in out
    assert len(out) == 5


def test_closure_is_idempotent(ray_session):
    kw = dict(inverse_map={"basedIn": "hasCustomer"}, symmetric=("tradesWith",))
    once = materialize_property_semantics(_graph(), **kw).materialize()
    twice = materialize_property_semantics(once, **kw)
    # second pass implies hasCustomer has no declared inverse -> fixpoint
    assert _rows(twice) == _rows(once)


def test_conflicting_declaration_raises(ray_session):
    with pytest.raises(ValueError, match="both symmetric"):
        materialize_property_semantics(
            _graph(), inverse_map={"p": "q"}, symmetric=("p",)
        )
