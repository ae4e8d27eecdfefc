"""rdf:List pointer-doubling ranking unit tests (wave 64)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.kg.rdflist import rank_rdf_lists


def _chain(head: str, members: list[str], prefix: str) -> pa.Table:
    subj, pred, obj = [], [], []
    cells = [f"{prefix}{i}" for i in range(len(members))]
    if cells:
        subj.append(head), pred.append("memberList"), obj.append(cells[0])
    for i, m in enumerate(members):
        subj.append(cells[i]), pred.append("rdf:first"), obj.append(m)
        nxt = cells[i + 1] if i + 1 < len(cells) else "rdf:nil"
        subj.append(cells[i]), pred.append("rdf:rest"), obj.append(nxt)
    return pa.table(
        {"subj": pa.array(subj, pa.string()),
         "pred": pa.array(pred, pa.string()),
         "obj": pa.array(obj, pa.string())}
    )


def test_long_chain_logarithmic_rounds(ray_session):
    # 129 cells needs ceil(log2(130)) = 8 doubling rounds — well under the
    # cap; a sequential walk would need 129
    members = [f"m{i}" for i in range(129)]
    out = (
        rank_rdf_lists(
            rd.from_arrow(_chain("h", members, "c")),
            entry_pred="memberList",
            max_rounds=9,
        )
        .to_pandas()
        .sort_values("pos")
    )
    assert out["member"].tolist() == members
    assert out["head"].unique().tolist() == ["h"]
    assert out["pos"].tolist() == list(range(129))


def test_two_independent_lists(ray_session):
    t = pa.concat_tables(
        [_chain("ha", ["x", "y"], "a"), _chain("hb", ["z"], "b")]
    )
    out = rank_rdf_lists(
        rd.from_arrow(t), entry_pred="memberList"
    ).to_pandas()
    got = {(r.head, r.pos, r.member) for r in out.itertuples()}
    assert got == {("ha", 0, "x"), ("ha", 1, "y"), ("hb", 0, "z")}


def test_join_strategy_many_lists(ray_session):
    # the above-cap distributed path: many short lists keep join-key
    # cardinality high (its documented safe regime)
    chains = [
        _chain(f"h{i}", [f"m{i}_{j}" for j in range(4)], f"c{i}_")
        for i in range(12)
    ]
    out = rank_rdf_lists(
        rd.from_arrow(pa.concat_tables(chains)),
        entry_pred="memberList",
        strategy="join",
    ).to_pandas()
    assert len(out) == 48
    sub = out[out["head"] == "h3"].sort_values("pos")
    assert sub["member"].tolist() == [f"m3_{j}" for j in range(4)]
    assert sub["pos"].tolist() == [0, 1, 2, 3]


def test_detached_cycle_raises(ray_session):
    # d0 <-> d1 cycle reachable from no head: pointers never resolve, the
    # round cap fires instead of spinning
    t = pa.table(
        {
            "subj": ["h", "c0", "c0", "d0", "d0", "d1", "d1"],
            "pred": ["memberList", "rdf:first", "rdf:rest", "rdf:first",
                     "rdf:rest", "rdf:first", "rdf:rest"],
            "obj": ["c0", "m0", "rdf:nil", "x0", "d1", "x1", "d0"],
        }
    )
    with pytest.raises(ValueError, match="cycle"):
        rank_rdf_lists(rd.from_arrow(t), entry_pred="memberList",
                       max_rounds=6)


def test_shared_cell_raises(ray_session):
    # a rest edge pointing back at the entry cell gives that cell two
    # incoming pointers — malformed forest, loud refusal (never an
    # arbitrary index_in disambiguation)
    t = pa.table(
        {
            "subj": ["h", "c0", "c0", "c1", "c1"],
            "pred": ["memberList", "rdf:first", "rdf:rest", "rdf:first",
                     "rdf:rest"],
            "obj": ["c0", "m0", "c1", "m1", "c0"],
        }
    )
    with pytest.raises(ValueError, match="multiple rest/entry"):
        rank_rdf_lists(rd.from_arrow(t), entry_pred="memberList",
                       max_rounds=6)
