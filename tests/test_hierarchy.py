"""Hierarchy flatten unit tests (wave 72)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.hierarchy import tree_root_depth


def _flatten(pairs, **kw):
    t = pa.table(
        {
            "child": pa.array([p[0] for p in pairs], pa.int64()),
            "parent": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    out = tree_root_depth(
        rd.from_arrow(t), child_col="child", parent_col="parent", **kw
    ).to_pandas()
    return {r.node: (r.root, r.depth) for r in out.itertuples()}


def test_two_trees(ray_session):
    #   1            2
    #   ├─3          └─6
    #   │  └─5
    #   └─4
    got = _flatten([(3, 1), (4, 1), (5, 3), (6, 2)])
    assert got == {3: (1, 1), 4: (1, 1), 5: (1, 2), 6: (2, 1)}


def test_deep_chain_and_join_strategy(ray_session):
    chain = [(i + 1, i) for i in range(100)]  # 0 <- 1 <- ... <- 100
    got = _flatten(chain)
    assert got[100] == (0, 100) and got[1] == (0, 1)
    # distributed path on a bushy forest (many roots = its safe regime)
    bushy = [(10 * r + c, r) for r in range(1, 9) for c in range(2, 5)]
    got2 = _flatten(bushy, strategy="join")
    assert got2[12] == (1, 1) and len(got2) == 24


def test_two_parents_refuse(ray_session):
    with pytest.raises(ValueError, match="two parents"):
        _flatten([(3, 1), (3, 2)])
