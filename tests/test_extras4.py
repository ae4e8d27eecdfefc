"""Wave-10 operators: skew join, nearest join, grouped heavy hitters,
schema-evolution union, exact integer outlier cuts."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from anonymization_ray.extras.asof import nearest_join
from anonymization_ray.extras.joins import skew_join
from anonymization_ray.extras.schema import harmonize_union
from anonymization_ray.extras.stats import group_heavy_hitters
from anonymization_ray.util import hash_join


def _skewed_fact():
    # key 7 is hot (200 rows), keys 0-9 cold (3 rows each)
    keys = np.concatenate([np.full(200, 7), np.repeat(np.arange(10), 3)])
    return rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(len(keys)), pa.int64()),
                "k": pa.array(keys, pa.int64()),
            }
        )
    ).repartition(4)


def _dim():
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(12), pa.int64()),
                "label": [f"v{i}" for i in range(12)],
            }
        )
    )


def _sorted_df(ds):
    return (
        ds.to_pandas()
        .sort_values(["rid"])
        .reset_index(drop=True)
    )


def test_skew_join_matches_plain_join_mixed_hot_cold():
    out = skew_join(
        _skewed_fact(), _dim(), on="k", payload_cols=["label"], hot_threshold=50
    )
    ref = hash_join(_skewed_fact(), _dim(), on="k", join_type="inner")
    a = _sorted_df(out.select_columns(["rid", "k", "label"]))
    b = _sorted_df(ref.select_columns(["rid", "k", "label"]))
    assert a.equals(b)
    assert len(a) == 230


def test_skew_join_all_hot_and_none_hot_paths():
    # threshold 1: every key hot -> pure broadcast path
    all_hot = skew_join(
        _skewed_fact(), _dim(), on="k", payload_cols=["label"], hot_threshold=1
    )
    # threshold 10^6: nothing hot -> pure hash-join path
    none_hot = skew_join(
        _skewed_fact(), _dim(), on="k", payload_cols=["label"], hot_threshold=10**6
    )
    a = _sorted_df(all_hot.select_columns(["rid", "k", "label"]))
    b = _sorted_df(none_hot.select_columns(["rid", "k", "label"]))
    assert a.equals(b)


def test_skew_join_hot_key_missing_from_dim_drops_rows():
    # hot key 99 has no dim row: inner-join semantics must drop its rows
    fact = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(60), pa.int64()),
                "k": pa.array(
                    np.concatenate([np.full(50, 99), np.arange(10)]), pa.int64()
                ),
            }
        )
    )
    out = skew_join(fact, _dim(), on="k", payload_cols=["label"], hot_threshold=20)
    df = _sorted_df(out)
    assert len(df) == 10
    assert set(df.k) == set(range(10))


def test_nearest_join_prefers_earlier_on_tie_and_handles_missing():
    left = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array([1, 2, 3, 4], pa.int64()),
                "key": pa.array([10, 10, 10, 20], pa.int64()),
                "t": pa.array([100, 205, 390, 50], pa.int64()),
            }
        )
    )
    # key 10 right times: 90, 210, 300 (lid1: 90 vs 210 -> 90 wins tie at
    # distance 10? distances |100-90|=10, |210-100|=110 -> prev 90;
    # lid2 at 205: prev 90 (115), next 210 (5) -> 210;
    # lid3 at 390: prev 300 (90), no next -> 300). key 20 has no rights.
    right = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([10, 10, 10], pa.int64()),
                "t": pa.array([90, 210, 300], pa.int64()),
            }
        )
    )
    out = (
        nearest_join(left, right, key_col="key", time_col="t", left_id_col="lid")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    got = {int(r.lid): (None if r.nearest_t != r.nearest_t else int(r.nearest_t))
           for r in out.itertuples()}
    assert got == {1: 90, 2: 210, 3: 300, 4: None}


def test_nearest_join_exact_tie_resolves_to_earlier():
    left = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array([1], pa.int64()),
                "key": pa.array([5], pa.int64()),
                "t": pa.array([100], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([5, 5], pa.int64()),
                "t": pa.array([90, 110], pa.int64()),
            }
        )
    )
    out = nearest_join(
        left, right, key_col="key", time_col="t", left_id_col="lid"
    ).take_all()
    assert out[0]["nearest_t"] == 90  # equidistant -> earlier wins


def test_group_heavy_hitters_exact_and_deterministic():
    rng = np.random.default_rng(11)
    groups = rng.choice(["en", "de", "fr"], size=3000)
    vals = rng.choice([f"w{i}" for i in range(40)], size=3000)
    t = pa.table({"g": groups.tolist(), "v": vals.tolist()})
    out = (
        group_heavy_hitters(rd.from_arrow(t).repartition(5), "g", "v", k=2)
        .to_pandas()
        .sort_values(["g", "n", "v"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    import pandas as pd

    df = pd.DataFrame({"g": groups, "v": vals})
    ref_rows = []
    for g, sub in df.groupby("g"):
        cnt = (
            sub.groupby("v").size().reset_index(name="n")
            .sort_values(["n", "v"], ascending=[False, True])
            .head(2)
        )
        for r in cnt.itertuples():
            ref_rows.append((g, r.v, r.n))
    ref = (
        pd.DataFrame(ref_rows, columns=["g", "v", "n"])
        .sort_values(["g", "n", "v"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert out[["g", "v"]].values.tolist() == ref[["g", "v"]].values.tolist()
    assert out["n"].astype(int).tolist() == ref["n"].astype(int).tolist()


def test_harmonize_union_null_fill_and_promotion():
    a = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int32()),
                "x": pa.array([1.5, 2.5], pa.float64()),
            }
        )
    )
    b = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "y": pa.array(["s"], pa.string()),
            }
        )
    )
    out = harmonize_union([a, b])
    sch = out.schema().base_schema
    assert sch.field("id").type == pa.int64()  # int32 promoted
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "x", "y"]
    assert df.y.isna().tolist() == [True, True, False]
    assert df.x.isna().tolist() == [False, False, True]


def test_harmonize_union_single_input_is_identity():
    a = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64())}))
    assert harmonize_union([a]).to_pandas().id.tolist() == [1, 2]
