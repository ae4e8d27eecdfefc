"""Grid-partitioned radius join (extras/spatial.py) — pair uniqueness
across cell boundaries, inclusive radius, the max_cell skew valve, and
the non-negative-coordinate contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.spatial import grid_radius_join


def _join(tbl, **kw):
    return (
        grid_radius_join(rd.from_arrow(tbl), **kw)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def _brute(tbl, radius):
    ids = np.array(tbl.column("id").to_pylist())
    x = np.array(tbl.column("x").to_pylist())
    y = np.array(tbl.column("y").to_pylist())
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
            if d2 <= radius * radius:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, d2))
    return sorted(out)


def test_matches_bruteforce_across_cells():
    rng = np.random.default_rng(7)
    n = 120
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "x": pa.array(rng.integers(0, 500, n), pa.int64()),
            "y": pa.array(rng.integers(0, 500, n), pa.int64()),
        }
    )
    got = _join(tbl, radius=60)
    want = _brute(tbl, 60)
    assert list(zip(got.id_a, got.id_b, got.dist2)) == want
    # each pair exactly once (the half-space offsets guarantee this
    # structurally — pin it)
    assert not got.duplicated(["id_a", "id_b"]).any()


def test_radius_boundary_inclusive_and_diagonal_cells():
    # two points exactly radius apart, in diagonally adjacent cells
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "x": pa.array([9, 12], pa.int64()),  # cells 0 and 1 at r=10
            "y": pa.array([9, 13], pa.int64()),
        }
    )
    got = _join(tbl, radius=5)  # dist2 = 9+16 = 25 = r^2
    assert list(zip(got.id_a, got.id_b, got.dist2)) == [(1, 2, 25)]


def test_max_cell_valve_drops_hot_cell_pairs():
    # 5 coincident points (hot cell) + one isolated nearby pair
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 10, 11], pa.int64()),
            "x": pa.array([3, 3, 3, 3, 3, 100, 101], pa.int64()),
            "y": pa.array([3, 3, 3, 3, 3, 100, 100], pa.int64()),
        }
    )
    full = _join(tbl, radius=10)
    assert len(full) == 11  # C(5,2) + the isolated pair
    valved = _join(tbl, radius=10, max_cell=4)
    # hot-cell pairs gone — including any that would cross out of it
    assert list(zip(valved.id_a, valved.id_b)) == [(10, 11)]


def test_negative_coordinates_refuse():
    tbl = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "x": pa.array([-1], pa.int64()),
            "y": pa.array([0], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="non-negative"):
        grid_radius_join(rd.from_arrow(tbl), radius=10).materialize()
