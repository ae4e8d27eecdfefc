"""δ-presence KPI (extras/privacy.delta_presence) — exact integer
presence probabilities per equivalence class."""

import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.privacy import delta_presence


def test_delta_presence_exact_bounds():
    # class 1: 4 pop / 1 sample -> 250000; class 2: all-sample -> 1000000;
    # class 3: no sample members -> 0
    tbl = pa.table(
        {
            "class_key": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "in_sample": pa.array([1, 0, 0, 0, 1, 1, 0], pa.int64()),
        }
    )
    got = (
        delta_presence(
            rd.from_arrow(tbl), class_col="class_key", sample_col="in_sample"
        )
        .to_pandas()
        .sort_values("class_key")
        .reset_index(drop=True)
    )
    assert got.class_key.tolist() == [1, 2, 3]
    assert got.n_pop.tolist() == [4, 2, 1]
    assert got.n_sample.tolist() == [1, 2, 0]
    assert got.delta_micro.tolist() == [250000, 1000000, 0]


def test_survivorship_merge_picks_first_nonnull_by_priority():
    from anonymization_ray.extras.er import survivorship_merge

    tbl = pa.table(
        {
            "entity": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "prio": pa.array([1, 2, 3, 2, 3, 3], pa.int64()),
            "a": ["x", "y", "z", None, "w", None],
            "b": [None, None, "bz", "bv", None, None],
        }
    )
    got = (
        survivorship_merge(
            rd.from_arrow(tbl), entity_col="entity", priority_col="prio",
            value_cols=["a", "b"],
        )
        .to_pandas()
        .sort_values("entity")
        .reset_index(drop=True)
    )
    assert got.entity.tolist() == [1, 2, 3]
    assert got.a.tolist() == ["x", "w", None]  # entity 3: no non-null a
    assert got.b.tolist() == ["bz", "bv", None]
