"""Stage-level correctness vs an in-memory re-derivation of the reference
semantics (service/anonymizer/*.java)."""

import collections
import datetime

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.config import calculate_num_buckets
from anonymization_ray.stages import (
    RandomizedAttr,
    compute_benchmarks,
    equivalence_classes,
    generalize_column,
    generalize_object_column,
    k_anonymity,
    mask_column,
    randomize_column,
)
from anonymization_ray.stages.randomization import randomize_ranks_np


def local_bucket_assignment(values, ids, g):
    """Reference Generalization.getRanges: rank i -> floor(g*i/k), ties by id."""
    mask = ~np.isnan(values)
    idx = np.nonzero(mask)[0]
    order = idx[np.lexsort((ids[idx], values[idx]))]
    k = len(order)
    out = np.full(len(values), -1)
    for rank, j in enumerate(order):
        out[j] = g * rank // k
    return out


def ref_lb_dist(v, w):
    """Reference Randomization.getRandomizedValues sliding window, verbatim loop."""
    k = len(v)
    out = np.empty(k)
    lb = 0
    for idx in range(k):
        while lb < k - (w + 1) and (
            lb < idx - w or abs(v[lb] - v[idx]) > abs(v[lb + w + 1] - v[idx])
        ):
            lb += 1
        out[idx] = max(abs(v[lb] - v[idx]), abs(v[lb + w] - v[idx]))
    return out


def test_masking_nulls():
    tbl = pa.table({"id": [1, 2, 3], "name": ["a", None, "c"]})
    out = mask_column(rd.from_arrow(tbl), "name").to_pandas().sort_values("id")
    assert out["name_masked"].tolist()[0] == "*****"
    assert out["name_masked"].isna().tolist() == [False, True, False]


def test_generalization_numeric_matches_reference_with_nulls_and_ties():
    rng = np.random.default_rng(11)
    n = 300
    vals = np.round(rng.uniform(0, 100, n), 0)  # heavy ties
    vals[rng.random(n) < 0.1] = np.nan
    ids = np.arange(n)
    tbl = pa.table(
        {"id": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.float64())}
    )
    ds = rd.from_arrow(tbl).repartition(7)
    ds2, res = generalize_column(ds, "v", "id", num_attrs=1, kind="numeric")
    k = int((~np.isnan(vals)).sum())
    assert res.k == k
    g = calculate_num_buckets(k, 1)
    assert res.g == g
    out = ds2.to_pandas().sort_values("id")
    expect = local_bucket_assignment(vals, ids, g)
    got = out["v_generalized"].to_numpy()
    got = np.where(np.isnan(got.astype(float)), -1, got).astype(int)
    assert (got == expect).all()
    # boundaries: B_p = midpoint(sorted[c-1], sorted[c]) at c = p*k//g
    sv = np.sort(vals[~np.isnan(vals)])
    bt = res.buckets.to_pylist()
    assert bt[0]["min"] is None and bt[-1]["max"] is None  # obfuscated
    for p in range(1, g):
        c = p * k // g
        expect_b = (sv[c - 1] + sv[c]) / 2.0
        assert abs(bt[p]["min"] - expect_b) < 1e-9
        assert abs(bt[p - 1]["max"] - expect_b) < 1e-9


def test_generalization_date():
    dates = [datetime.date(2005, 1, 1) + datetime.timedelta(days=int(d)) for d in
             np.random.default_rng(2).integers(0, 7000, 80)]
    tbl = pa.table({"id": pa.array(range(80), pa.int64()), "d": pa.array(dates, pa.date32())})
    ds = rd.from_arrow(tbl).repartition(3)
    ds2, res = generalize_column(ds, "d", "id", num_attrs=1, kind="date")
    g = calculate_num_buckets(80, 1)
    assert res.g == g
    # boundary midpoints are integer epoch-day halves (Java long division)
    days = np.sort(np.array([(d - datetime.date(1970, 1, 1)).days for d in dates]))
    bt = res.buckets.to_pylist()
    for p in range(1, g):
        c = p * 80 // g
        assert bt[p]["min"] == (days[c - 1] + days[c]) // 2  # positive -> floor==trunc
    out = ds2.to_pandas()
    assert out["d_generalized"].between(0, g - 1).all()


@pytest.mark.parametrize("k,w", [(100, 9), (50, 4), (17, 15), (30, 1), (40, 39), (64, 8)])
def test_randomization_window_closed_form(k, w):
    v = np.sort(np.random.default_rng(k + w).normal(0, 10, k))
    ref = ref_lb_dist(v, w)
    # full-halo single call
    out = randomize_ranks_np("numeric", 7, v, 0, 0, k, w, k, v[0], v[-1])
    # reconstruct dist from the known uniforms is messy; instead verify the
    # internal lb/dist path by splitting the range and checking equality
    out_a = randomize_ranks_np("numeric", 7, v, 0, 0, k // 2, w, k, v[0], v[-1])
    lo = max(0, k // 2 - (w + 1))
    out_b = randomize_ranks_np("numeric", 7, v[lo:], lo, k // 2, k, w, k, v[0], v[-1])
    assert np.array_equal(out, np.concatenate([out_a, out_b]))
    # bounds respected
    assert out.min() >= v[0] - 1e-12 and out.max() <= v[-1] + 1e-12
    # noise magnitude never exceeds dist (uniform in [0, dist], possibly reflected)
    assert (np.abs(out - v) <= ref + 1e-9).all()


def test_randomization_distributed_matches_local_and_partitioning():
    rng = np.random.default_rng(7)
    n = 500
    vals = rng.uniform(-180, 180, n)
    vals[rng.random(n) < 0.08] = np.nan
    tbl = pa.table({"id": pa.array(range(n), pa.int64()), "v": pa.array(vals, pa.float64())})
    a = (
        randomize_column(rd.from_arrow(tbl).repartition(2), "v", "id",
                         num_attrs=2, kind="numeric", seed=99, object_type="T")
        .to_pandas().sort_values("id")
    )
    b = (
        randomize_column(rd.from_arrow(tbl).repartition(13), "v", "id",
                         num_attrs=2, kind="numeric", seed=99, object_type="T")
        .to_pandas().sort_values("id")
    )
    av, bv = a["v_randomized"].to_numpy(), b["v_randomized"].to_numpy()
    assert np.array_equal(np.isnan(av), np.isnan(bv))
    assert np.array_equal(av[~np.isnan(av)], bv[~np.isnan(bv)])
    # null inputs stay null, non-null in bounds
    assert np.array_equal(np.isnan(av), np.isnan(vals))
    nn = vals[~np.isnan(vals)]
    assert av[~np.isnan(av)].min() >= nn.min() - 1e-9
    assert av[~np.isnan(av)].max() <= nn.max() + 1e-9
    # different seed -> different noise
    c = (
        randomize_column(rd.from_arrow(tbl).repartition(2), "v", "id",
                         num_attrs=2, kind="numeric", seed=100, object_type="T")
        .to_pandas().sort_values("id")
    )
    assert not np.array_equal(av[~np.isnan(av)], c["v_randomized"].to_numpy()[~np.isnan(vals)])


def test_randomization_date_kind():
    n = 120
    rng = np.random.default_rng(4)
    days = rng.integers(12000, 20000, n)
    dates = pa.array(days, pa.int32()).cast(pa.date32())
    tbl = pa.table({"id": pa.array(range(n), pa.int64()), "d": dates})
    out = (
        randomize_column(rd.from_arrow(tbl).repartition(4), "d", "id",
                         num_attrs=1, kind="date", seed=1234, object_type="T")
        .to_pandas().sort_values("id")
    )
    got = out["d_randomized"]
    assert got.notna().all()
    got_days = np.array([(d - datetime.date(1970, 1, 1)).days for d in got])
    assert got_days.min() >= days.min() and got_days.max() <= days.max()


def test_splitmix_rng_sql_parity_and_partition_independence():
    """The splitmix rng_mode's draws must match the DuckDB mod-2^64 chain
    bit-for-bit (that equality is what upgrades the seeded randomization
    queries from rows-only to value-hash oracles), and stay invariant under
    task splits like the Philox path."""
    import duckdb

    from anonymization_ray.rng import sm_rank_uniforms
    from anonymization_ray.sqlrng import _sm64_chain

    key = 0xDEADBEEF12345678
    u = sm_rank_uniforms(key, 0, 40)  # (40, 32)
    # split invariance: ranks [7, 29) drawn alone are the same rows
    assert np.array_equal(u[7:29], sm_rank_uniforms(key, 7, 22))
    # SQL parity over every (rank, lane) element
    chain = _sm64_chain("sm", "base", "rnk, lane", {"u": "rnk * 32 + lane"}, key)
    sql = f"""
WITH base AS (SELECT r.range AS rnk, l.range AS lane FROM range(40) r, range(32) l),
{chain}
SELECT u FROM smu ORDER BY rnk, lane
"""
    got = duckdb.sql(sql).fetchnumpy()["u"].reshape(40, 32)
    assert np.array_equal(got, u)


def test_randomization_splitmix_mode_bounds_and_determinism():
    n = 400
    rng = np.random.default_rng(3)
    vals = rng.uniform(-50, 50, n)
    vals[rng.random(n) < 0.05] = np.nan
    tbl = pa.table({"id": pa.array(range(n), pa.int64()), "v": pa.array(vals, pa.float64())})

    def run(parts):
        return (
            randomize_column(rd.from_arrow(tbl).repartition(parts), "v", "id",
                             num_attrs=1, kind="numeric", seed=42, object_type="T",
                             rng_mode="splitmix")
            .to_pandas().sort_values("id")["v_randomized"].to_numpy()
        )

    a, b = run(2), run(11)
    assert np.array_equal(np.isnan(a), np.isnan(vals))
    assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
    nn = vals[~np.isnan(vals)]
    assert a[~np.isnan(a)].min() >= nn.min() - 1e-9
    assert a[~np.isnan(a)].max() <= nn.max() + 1e-9
    # distinct stream from the Philox mode (same seed)
    p = (
        randomize_column(rd.from_arrow(tbl).repartition(2), "v", "id",
                         num_attrs=1, kind="numeric", seed=42, object_type="T")
        .to_pandas().sort_values("id")["v_randomized"].to_numpy()
    )
    assert not np.array_equal(a[~np.isnan(a)], p[~np.isnan(p)])


def test_object_generalization_level_walk():
    n = 120
    states = np.array(["A", "B", "C"])[np.arange(n) % 3]
    cities = np.array([f"city{i % 40}" for i in range(n)])
    pres = pa.array([1 if i % 10 else None for i in range(n)], pa.int64())
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "city": pa.array(cities),
            "state": pa.array(states),
            "country": pa.array(["X"] * n),
            "addr_ref": pres,
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    ds2, res = generalize_object_column(
        ds, "addr", ["city", "state", "country"], num_attrs=1, presence_col="addr_ref"
    )
    k = sum(1 for i in range(n) if i % 10)
    assert res.k == k
    out = ds2.to_pandas().sort_values("id")
    present_mask = np.array([bool(i % 10) for i in range(n)])
    assert out["addr_generalized"].notna().to_numpy().tolist() == present_mask.tolist()
    if res.accepted_level is not None:
        assert res.accepted_level in ("state", "country")


def test_object_generalization_fallback_mask():
    # every value distinct at every level -> no level passes -> "*****"
    n = 50
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "l1": pa.array([f"x{i}" for i in range(n)]),
            "l2": pa.array([f"y{i}" for i in range(n)]),
        }
    )
    ds2, res = generalize_object_column(
        rd.from_arrow(tbl), "o", ["l1", "l2"], num_attrs=1
    )
    assert res.accepted_level is None
    out = ds2.to_pandas()
    assert (out["o_generalized"] == "*****").all()


def test_k_anonymity_gen_only_and_classes():
    n = 90
    bucket = np.arange(n) % 4
    tbl = pa.table({"id": pa.array(range(n), pa.int64()),
                    "b_generalized": pa.array(bucket, pa.int32())})
    ds = rd.from_arrow(tbl).repartition(3)
    ka = k_anonymity(ds, ["b_generalized"], [])
    cnt = collections.Counter(bucket.tolist())
    assert ka == min(cnt.values())
    classes = equivalence_classes(ds, ["b_generalized"]).to_pandas()
    assert sorted(classes["class_size"].tolist()) == sorted(cnt.values())


def test_k_anonymity_with_randomization_matches_bruteforce():
    n = 80
    rng = np.random.default_rng(5)
    o = rng.uniform(0, 100, n)
    o[rng.random(n) < 0.1] = np.nan
    r = o + rng.normal(0, 5, n)
    bkt = (np.arange(n) % 3).astype("int32")
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "g_generalized": pa.array(bkt, pa.int32()),
            "x": pa.array(o, pa.float64()),
            "x_randomized": pa.array(np.where(np.isnan(o), np.nan, r), pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    ras = compute_benchmarks(ds, [RandomizedAttr("x", "x_randomized", "numeric")])
    b = ras[0].benchmark
    valid = ~np.isnan(o)
    assert abs(b - 2 * np.abs(o[valid] - r[valid]).mean()) < 1e-9
    ka = k_anonymity(ds, ["g_generalized"], ras)
    best = 10**9
    for i in range(n):
        same = bkt == bkt[i]
        if np.isnan(o[i]):
            sim = np.isnan(o)
        else:
            sim = valid & (o >= r[i] - b) & (o <= r[i] + b)
        best = min(best, int((same & sim).sum()))
    assert ka == best


def test_k_anonymity_single_giant_class_distributed():
    # all-masked config: no generalized columns -> every record in ONE
    # equivalence class. The distributed sort-merge path must match the
    # in-memory reference exactly and never hand the full dataset to one
    # task (memory is bounded by block size; exercised with many blocks).
    from anonymization_ray.stages.kpi import _group_min_intersection

    rng = np.random.Generator(np.random.Philox(key=11))
    n = 300_000
    o = rng.normal(0, 1000, n)
    o[rng.integers(0, n, 500)] = np.nan
    r = o + rng.normal(0, 5, n)
    tbl = pa.table(
        {
            "x": pa.array(o, pa.float64()),
            "x_randomized": pa.array(np.where(np.isnan(o), np.nan, r), pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(32)
    ra = RandomizedAttr("x", "x_randomized", "numeric", benchmark=12.5)
    got = k_anonymity(ds, [], [ra])
    want = _group_min_intersection(tbl, [ra])
    assert got == want


def test_codec_vectorized_parity():
    # format_array / midpoint_array must agree with the per-value paths
    from anonymization_ray.stages.codecs import CODECS

    rng = np.random.Generator(np.random.Philox(key=21))
    num = CODECS["numeric"]
    vals = np.concatenate([
        rng.normal(0, 5000, 200).round(2),
        np.array([0.0, -1.5, 1226.0, 999999.0, 0.5, -0.125]),
    ])
    got = num.format_array(pa.array(vals, pa.float64())).to_pylist()
    want = [num.format_value(v) for v in vals]
    assert got == want
    a = rng.normal(0, 100, 100)
    b = a + rng.random(100)
    assert np.allclose(num.midpoint_array(a, b), [num.midpoint(x, y) for x, y in zip(a, b)])

    date = CODECS["date"]
    days = rng.integers(-3000, 20000, 200)
    got = date.format_array(pa.array(days, pa.int64())).to_pylist()
    want = [date.format_value(int(v)) for v in days]
    assert got == want
    d2 = days + rng.integers(0, 5, 200)
    assert (date.midpoint_array(days, d2) == [date.midpoint(int(x), int(y)) for x, y in zip(days, d2)]).all()

    dt = CODECS["dateTime"]
    ms = rng.integers(0, 2_000_000_000_000, 200)
    got = dt.format_array(pa.array(ms, pa.int64())).to_pylist()
    want = [dt.format_value(int(v)) for v in ms]
    assert got == want
