"""Wave-13/14 primitive tests: block-boundary correctness for the
carry-chained window operators and the vectorized Levenshtein kernel.
(Value correctness vs DuckDB is separately gated by tests/test_oracles.py —
these tests force pathological block layouts the sf tables don't.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_funnel_boundary_users_counted_once():
    from anonymization_ray.extras.funnel import funnel_steps

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 25, n),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase", "error"], n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(23)
    got = funnel_steps(ds, ["view", "click", "purchase"]).to_pandas()

    m = (
        df[df.event_type.isin(["view", "click", "purchase"])]
        .groupby(["user_id", "event_type"])["ts"]
        .min()
        .unstack()
    )
    s1 = int(m["view"].notna().sum())
    s2m = m["view"].notna() & m["click"].notna() & (m["click"] > m["view"])
    s3m = s2m & m["purchase"].notna() & (m["purchase"] > m["click"])
    want = [s1, int(s2m.sum()), int(s3m.sum())]
    assert got.set_index("step")["users"].reindex(
        ["view", "click", "purchase"]
    ).tolist() == want


def test_last_touch_attribution_carry_across_blocks():
    from anonymization_ray.extras.window import last_touch_attribution

    rng = np.random.RandomState(5)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 8, n),
            "ts": pd.to_datetime(rng.randint(0, 5_000, n), unit="s"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n, p=[0.3, 0.3, 0.3, 0.1]
            ),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(41)
    got = (
        last_touch_attribution(
            ds, "user_id", "ts", "event_id", "event_type", ["click", "view"],
            "purchase",
        )
        .to_pandas()
        .set_index("touch")["purchases"]
        .to_dict()
    )

    want: dict[str, int] = {}
    s = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for _, g in s.groupby("user_id"):
        last = None
        for t in g.event_type:
            if t == "purchase":
                lbl = last if last in ("click", "view") else "none"
                want[lbl] = want.get(lbl, 0) + 1
            if t in ("click", "view"):
                last = t
    assert got == want


def test_keyed_first_broadcast_runs_span_blocks():
    from anonymization_ray.extras.window import keyed_first_broadcast

    rng = np.random.RandomState(3)
    n = 600
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 7, n),
            "v": rng.randint(0, 1000, n).astype(np.int64),
        }
    ).drop_duplicates()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(37)
    got = keyed_first_broadcast(ds, "k", "v").to_pandas()
    first = df.groupby("k")["v"].min().to_dict()
    assert len(got) == len(df)
    assert (got["first_val"] == got["k"].map(first)).all()


def test_fuzzy_blocked_pairs_kernel_matches_reference_dp():
    from anonymization_ray.extras.joins import fuzzy_blocked_pairs

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    names = [
        "alpha", "alphq", "alpha1", "beta", "betta", "bet", "gamma",
        "gamm", "gamma", "delta",
    ]
    df = pd.DataFrame(
        {
            "blk": [1] * len(names),
            "id": np.arange(len(names), dtype=np.int64),
            "name": names,
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        fuzzy_blocked_pairs(ds, "blk", "id", "name", max_dist=2)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = lev(names[i], names[j])
            if d <= 2:
                want.append((i, j, d))
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].values)) == want


def test_kmeans_int_width_invariance():
    # bit-identical centroids at different block layouts (1 vs 29 blocks)
    from anonymization_ray.extras.similarity import kmeans_lloyd_int

    rng = np.random.RandomState(9)
    n, d = 300, 8
    vecs = rng.randn(n, d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    a = kmeans_lloyd_int(rd.from_arrow(t), k=3, iters=2).to_pandas()
    b = kmeans_lloyd_int(rd.from_arrow(t).repartition(29), k=3, iters=2).to_pandas()
    cols = ["cluster", "dim", "val"]
    assert a[cols].sort_values(cols).values.tolist() == b[cols].sort_values(
        cols
    ).values.tolist()
    assert a.loc[a.dim == -1, "val"].sum() == n


def test_funnel_windowed_horizon_and_blocks():
    from anonymization_ray.extras.funnel import funnel_steps_windowed

    rng = np.random.RandomState(21)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, n),
            "ts": pd.to_datetime(rng.randint(0, 100_000, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase", "x"], n),
        }
    )
    H = 20_000 * 1_000_000  # 20k seconds
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(31)
    got = (
        funnel_steps_windowed(ds, ["view", "click", "purchase"], H)
        .to_pandas()
        .set_index("step")["users"]
    )

    want = {"view": 0, "click": 0, "purchase": 0}
    for _, g in df.sort_values("ts").groupby("user_id"):
        v = g[g.event_type == "view"]["ts"]
        if v.empty:
            continue
        t0 = v.iloc[0]
        want["view"] += 1
        c = g[(g.event_type == "click") & (g.ts > t0)
              & (g.ts <= t0 + pd.Timedelta(microseconds=H))]["ts"]
        if c.empty:
            continue
        t1 = c.iloc[0]
        want["click"] += 1
        p = g[(g.event_type == "purchase") & (g.ts > t1)
              & (g.ts <= t1 + pd.Timedelta(microseconds=H))]["ts"]
        if p.empty:
            continue
        want["purchase"] += 1
    assert got.to_dict() == want


def test_merge_upsert_replaces_only_touched(tmp_path):
    import json
    import os

    from anonymization_ray.kg.incremental import merge_upsert
    from anonymization_ray.kg.materialize import materialize_triples, read_layout

    def tri(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows]),
                    "pred": pa.array([r[1] for r in rows]),
                    "obj": pa.array([r[2] for r in rows]),
                    "obj_kind": pa.array(["iri"] * len(rows)),
                }
            )
        )

    base = [(f"urn:e:{i}", "seg", f"old{i}") for i in range(30)] + [
        ("urn:e:7", "seg", "old7b"),  # multi-valued key: both rows replaced
        ("urn:e:7", "name", "keepme"),  # different pred: survives
    ]
    out = str(tmp_path / "store")
    materialize_triples(tri(base), out, num_partitions=8, config={"v": 1})

    pre = {}
    for p in range(8):
        d = os.path.join(out, "spo", f"part={p}")
        pre[p] = (
            max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
            if os.path.isdir(d)
            else None
        )

    updates = tri([("urn:e:7", "seg", "NEW"), ("urn:e:99", "seg", "INSERTED")])
    rep = merge_upsert(out, updates, delta_input="u1")

    got = set(
        map(tuple, read_layout(out, "spo").to_pandas()[["subj", "pred", "obj"]].values)
    )
    want = {r for r in base if not (r[0] == "urn:e:7" and r[1] == "seg")}
    want |= {("urn:e:7", "seg", "NEW"), ("urn:e:99", "seg", "INSERTED")}
    assert got == want

    touched = set(rep["spo"]["touched"])
    assert 0 < len(touched) < 8
    for p in range(8):
        d = os.path.join(out, "spo", f"part={p}")
        post = (
            max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
            if os.path.isdir(d)
            else None
        )
        if p not in touched and pre[p] is not None:
            assert post == pre[p], f"untouched partition {p} rewritten"
    for p in touched:
        m = json.load(open(os.path.join(out, "_manifests", f"spo_part={p}.json")))
        assert m["inputs"][-1] == "u1"

    # idempotence: re-applying the same upsert changes nothing
    merge_upsert(out, updates, delta_input="u1-retry")
    got2 = set(
        map(tuple, read_layout(out, "spo").to_pandas()[["subj", "pred", "obj"]].values)
    )
    assert got2 == want


def test_weighted_median_carry_across_blocks():
    from anonymization_ray.extras.dq import weighted_median_per_group

    rng = np.random.RandomState(13)
    n = 800
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.randint(0, 50, n).astype(np.int64),  # heavy ties
            "w": rng.randint(0, 5, n).astype(np.int64),  # zero weights too
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(43)
    got = (
        weighted_median_per_group(ds, "g", "v", "w")
        .to_pandas()
        .set_index("g")["wmedian"]
        .to_dict()
    )
    want = {}
    for gname, grp in df.groupby("g"):
        s = grp.sort_values("v")
        cum = s.w.cumsum()
        tot = s.w.sum()
        want[gname] = int(s.v[(2 * cum >= tot)].iloc[0])
    assert got == want


def test_dq_fk_orphans_and_null_profile():
    from anonymization_ray.extras.dq import fk_orphans, null_profile, pk_duplicates

    fact = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5, 5], pa.int64()),
                "fk": pa.array([10, 20, None, 40, 10, 99], pa.int64()),
                "x": pa.array([1.0, float("nan"), 3.0, None, 5.0, 6.0]),
            }
        )
    ).repartition(3)
    dim = rd.from_arrow(pa.table({"k": pa.array([10, 20, 30], pa.int64())}))
    orphans = fk_orphans(fact, "fk", dim, "k").to_pandas()
    # violations: id=3 (null fk), id=4 (fk 40 unmatched), id=5 (fk 99 unmatched)
    assert sorted(orphans["id"].tolist()) == [3, 4, 5]

    dups = pk_duplicates(fact, "id").to_pandas()
    assert dups.to_dict("records") == [{"id": 5, "n": 2}]

    prof = null_profile(fact, ["fk", "x"]).to_pandas().set_index("column")
    assert prof.loc["fk", "n_null"] == 1 and prof.loc["fk", "n_total"] == 6
    assert prof.loc["x", "n_null"] == 2  # one None + one NaN
