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
