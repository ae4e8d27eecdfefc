"""square_count unit tests against closed-form motif counts (wave 67)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.graph import square_count


def _count(pairs):
    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    return square_count(rd.from_arrow(t)).to_pandas()["squares"][0]


def test_single_c4(ray_session):
    assert _count([(0, 1), (1, 2), (2, 3), (0, 3)]) == 1


def test_k4_has_three(ray_session):
    assert _count([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]) == 3


def test_cube_has_six(ray_session):
    # Q3: 8 vertices, 12 edges, exactly the 6 face cycles
    edges = [
        (0, 1), (1, 2), (2, 3), (0, 3),  # bottom
        (4, 5), (5, 6), (6, 7), (4, 7),  # top
        (0, 4), (1, 5), (2, 6), (3, 7),  # pillars
    ]
    assert _count(edges) == 6


def test_path_and_triangle_have_none(ray_session):
    assert _count([(0, 1), (1, 2)]) == 0
    assert _count([(0, 1), (1, 2), (0, 2)]) == 0


def test_large_id_guard(ray_session):
    # the guard fires inside a map task, so Ray re-wraps the ValueError —
    # assert on the preserved message
    with pytest.raises(Exception, match="2\\^31"):
        _count([(0, 2**31)])
