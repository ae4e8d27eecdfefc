"""Wave-39 operator tests: CDC chunking edge cases (short/empty docs,
insert-stability — the property fixed-size chunking lacks) and rank_per_key
carry correctness when one key spans many blocks."""

import numpy as np
import pandas as pd
import ray.data as rd


def _cdc_df(texts, mod=13):
    from anonymization_ray.extras.chunk import cdc_chunk_stats

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    return (
        cdc_chunk_stats(ds, mod=mod)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )


def _brute_cdc(text, mod=13):
    toks = text.strip().lower().split()
    if text.strip() == "":
        toks = [""]  # Arrow split of '' yields one empty token
    ln = [len(t) for t in toks]
    chunks = {}
    cid = 0
    for i in range(len(ln)):
        chunks[cid] = chunks.get(cid, 0) + 1
        if i >= 2 and (7 * ln[i - 2] + 31 * ln[i - 1] + 101 * ln[i]) % mod == 0:
            cid += 1
    return chunks


def test_cdc_matches_bruteforce_and_short_docs():
    texts = [
        "a bb ccc dddd eeeee ff g hh iii jjjj",
        "one two",  # < 3 tokens: single chunk
        "solo",
        "",  # empty: one chunk of one empty token
        "x " * 50,
    ]
    got = _cdc_df(texts)
    for d, text in enumerate(texts):
        want = _brute_cdc(text)
        sub = got[got.doc_id == d]
        assert dict(zip(sub.chunk_id, sub.n_tokens)) == want, f"doc {d}"


def test_cdc_insert_stability():
    # the CDC property: appending a sentence leaves every earlier chunk
    # boundary (and so every earlier chunk's token count) unchanged —
    # fixed-size windows would shift everything after the insertion point
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    got = _cdc_df([base, base + " tail words appended here"])
    a = got[got.doc_id == 0]
    b = got[got.doc_id == 1]
    shared = min(len(a), len(b)) - 1  # all but the last chunk of the shorter
    assert shared >= 1
    assert list(a.n_tokens[:shared]) == list(b.n_tokens[:shared])


def test_rank_per_key_single_key_spans_blocks():
    # one hot key across many input blocks: the driver-folded carry chain
    # must produce a 0..n-1 permutation, not per-block restarts
    from anonymization_ray.util import rank_per_key

    n = 5000
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "k": np.where(rng.rand(n) < 0.8, 1, rng.randint(2, 5, n)).astype(np.int64),
            "v": rng.permutation(n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    out = rank_per_key(ds, "k", "v").to_pandas()
    want = (
        df.sort_values(["k", "v"])
        .groupby("k")
        .cumcount()
        .reindex(df.sort_values(["k", "v"]).index)
    )
    merged = out.sort_values(["k", "v"]).reset_index(drop=True)
    assert list(merged["rn"]) == list(want.values)
    # hot key is a clean permutation
    hot = out[out.k == 1].sort_values("v")
    assert list(hot["rn"]) == list(range(len(hot)))


def test_rank_per_key_descending_and_ties():
    from anonymization_ray.util import rank_per_key

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "v": [10, 10, 5, 7, 7],
            "id": [3, 1, 2, 5, 4],
        }
    )
    out = (
        rank_per_key(
            rd.from_pandas(df), "k", "v", descending=True, tie_col="id"
        )
        .to_pandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )
    # k=1 desc by v, ties by id asc: (10,1)->0 (10,3)->1 (5,2)->2
    assert list(out[out.k == 1]["id"]) == [1, 3, 2]
    assert list(out[out.k == 1]["rn"]) == [0, 1, 2]
    assert list(out[out.k == 2]["id"]) == [4, 5]
    assert list(out[out.k == 2]["rn"]) == [0, 1]


def _b(df):
    return rd.from_pandas(pd.DataFrame(df))


def test_filter_bindings_error_semantics_and_var_compare():
    from anonymization_ray.kg.algebra import filter_bindings

    b = _b(
        {
            "v": ["5", "abc", "", "12.5", None],
            "w": ["5", "zzz", "x", "99", "q"],
        }
    )
    # numeric FILTER: type errors (abc, '', null) eliminate the row
    out = filter_bindings(b, [("v", ">", 4)]).to_pandas()
    assert sorted(out["v"]) == ["12.5", "5"]
    # column-to-column compare
    out = filter_bindings(b, [("v", "==", "w")]).to_pandas()
    assert list(out["v"]) == ["5"]
    # regex
    out = filter_bindings(b, [("w", "regex", "^z")]).to_pandas()
    assert list(out["w"]) == ["zzz"]


def test_values_bindings_multi_var_tuples():
    from anonymization_ray.kg.algebra import values_bindings

    b = _b({"a": ["x", "x", "y"], "c": ["1", "2", "1"]})
    out = (
        values_bindings(b, ["a", "c"], [("x", "1"), ("y", "1")])
        .to_pandas()
        .sort_values(["a", "c"])
    )
    assert list(zip(out["a"], out["c"])) == [("x", "1"), ("y", "1")]


def test_minus_disjoint_domain_is_noop():
    from anonymization_ray.kg.algebra import minus_bindings

    req = _b({"a": ["1", "2"]})
    sub = _b({"z": ["1", "2"]})  # no shared variable: SPARQL removes nothing
    assert minus_bindings(req, sub).count() == 2


def test_minus_removes_on_any_shared_agreement():
    from anonymization_ray.kg.algebra import minus_bindings

    req = _b({"a": ["1", "2", "3"], "b": ["x", "y", "z"]})
    sub = _b({"a": ["2", "9"], "c": ["q", "r"]})
    out = minus_bindings(req, sub).to_pandas().sort_values("a")
    assert list(out["a"]) == ["1", "3"]


def _pairs(rows):
    import pyarrow as pa

    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_path_plus_closes_cycle_to_fixpoint():
    from anonymization_ray.kg.paths import eval_path

    tri = _pairs([("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")])
    out = eval_path(tri, "p+").to_pandas()
    got = set(zip(out["s"], out["o"]))
    nodes = {"a", "b", "c"}
    assert got == {(x, y) for x in nodes for y in nodes}  # 9 pairs, once each


def test_path_star_adds_identity_over_all_terms():
    from anonymization_ray.kg.paths import eval_path

    tri = _pairs([("a", "p", "b"), ("x", "q", "y")])
    out = eval_path(tri, "p*").to_pandas()
    got = set(zip(out["s"], out["o"]))
    # identity covers terms of BOTH predicates (all graph terms), plus a->b
    assert got == {("a", "a"), ("b", "b"), ("x", "x"), ("y", "y"), ("a", "b")}


def test_path_plus_in_sequence_stays_bag_outside():
    from anonymization_ray.kg.paths import eval_path

    # two customers in the same chain start: seq join multiplicity preserved
    tri = _pairs(
        [
            ("c1", "in", "n"),
            ("c2", "in", "n"),
            ("n", "part", "r"),
            ("r", "part", "w"),
        ]
    )
    out = eval_path(tri, "in/part+").to_pandas()
    got = sorted(zip(out["s"], out["o"]))
    assert got == [("c1", "r"), ("c1", "w"), ("c2", "r"), ("c2", "w")]


def test_path_postfix_parse():
    from anonymization_ray.kg.paths import parse_path

    assert parse_path("a+") == ("plus", ("pred", "a"))
    assert parse_path("^a*") == ("star", ("inv", ("pred", "a")))
    assert parse_path("(a|b)+") == ("plus", ("alt", [("pred", "a"), ("pred", "b")]))
    assert parse_path("a/b+") == ("seq", [("pred", "a"), ("plus", ("pred", "b"))])


def test_pages_asof_picks_latest_not_future():
    import pyarrow as pa

    from anonymization_ray.kg.temporal import pages_asof

    def pg(url, ts_s, body):
        return {
            "url": url,
            "warc_ts": ts_s * 1_000_000,
            "html": body.encode(),
            "text": body,
            "lang": "en",
        }

    t = pa.table(
        {
            "url": ["u1", "u1", "u1", "u2"],
            "warc_ts": pa.array(
                [100 * 10**6, 200 * 10**6, 900 * 10**6, 150 * 10**6],
                pa.timestamp("us"),
            ),
            "html": [b"v1", b"v2", b"v3-future", b"only"],
            "text": ["v1", "v2", "v3", "only"],
            "lang": ["en"] * 4,
        }
    )
    out = pages_asof(rd.from_arrow(t), 500 * 10**6).to_pandas()
    got = dict(zip(out["url"], out["html"]))
    assert got == {"u1": b"v2", "u2": b"only"}  # latest <= T; future invisible


def test_bump_balances_repr_roundtrip():
    from anonymization_ray.kg.temporal import _bump_balances

    h = b'<li><span>1234.56</span></li><li><span></span></li><li><span>-5.5</span></li>'
    out = _bump_balances(h, 1000.0).decode()
    assert "<span>2234.56</span>" in out
    assert "<span></span>" in out  # null balance untouched
    assert "<span>994.5</span>" in out


def test_fold_per_key_spanning_keys_across_blocks():
    from anonymization_ray.util import fold_per_key

    # one hot key dominating many blocks + a tail of singletons: the
    # driver-side edge merge must combine every spanning fragment exactly once
    n = 20_000
    rng = np.random.RandomState(11)
    k = np.where(rng.rand(n) < 0.7, 0, rng.randint(1, 50, n)).astype(np.int64)
    v = rng.randint(-100, 100, n).astype(np.int64)
    df = pd.DataFrame({"k": k, "v": v})
    ds = rd.from_pandas(df).repartition(16)
    out = (
        fold_per_key(
            ds,
            "k",
            {
                "s": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "n": ("count", None),
            },
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")["v"]
        .agg(s="sum", mn="min", mx="max", n="count")
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    for c in ("s", "mn", "mx", "n"):
        assert list(out[c]) == list(want[c]), c


def test_order_limit_offset_window():
    import pyarrow as pa

    from anonymization_ray.kg.algebra import order_limit_bindings

    df = pd.DataFrame({"x": [5, 3, 9, 1, 7, 3], "id": ["a", "b", "c", "d", "e", "f"]})
    t = order_limit_bindings(
        rd.from_pandas(df).repartition(3), [("x", True), ("id", False)], 3, offset=1
    )
    # desc by x, tie by id: 9c 7e 5a 3b 3f 1d -> offset 1, limit 3 = 7e 5a 3b
    assert t.column("id").to_pylist() == ["e", "a", "b"]


def test_bucketed_layout_partitions_and_joins_without_loss():
    import os

    from anonymization_ray.extras.bucketed import (
        bucket_of,
        bucketed_join,
        write_bucketed,
    )

    n = 1000
    rng = np.random.RandomState(5)
    a = pd.DataFrame({"k": rng.randint(0, 200, n).astype(np.int64),
                      "va": np.arange(n, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                      "vb": np.arange(200, dtype=np.int64) * 10})
    da = write_bucketed(rd.from_pandas(a), "/tmp/test_bucketed/a", "k", 4)
    db = write_bucketed(rd.from_pandas(b), "/tmp/test_bucketed/b", "k", 4)
    # layout really is bucketed: each directory exists and holds only its keys
    import pyarrow.parquet as pq

    for bkt in range(4):
        p = os.path.join(da, f"__bucket={bkt}")
        assert os.path.isdir(p)
        keys = pq.read_table(p).column("k").to_numpy()
        assert (bucket_of(keys, 4) == bkt).all()
    out = bucketed_join(da, db, "k", 4).to_pandas()
    want = a.merge(b, on="k")
    assert len(out) == len(want) == n
    got = out.sort_values(["k", "va"]).reset_index(drop=True)
    want = want.sort_values(["k", "va"]).reset_index(drop=True)
    assert (got["vb"].to_numpy() == want["vb"].to_numpy()).all()


def test_write_bucketed_rejects_null_keys():
    import pytest as _pytest

    from anonymization_ray.extras.bucketed import write_bucketed

    df = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "v": [1, 2]})
    with _pytest.raises(Exception, match="null"):
        write_bucketed(rd.from_pandas(df), "/tmp/test_bucketed/nulls", "k", 2).__str__()
        # force execution


def test_exists_filter_semi_and_anti():
    from anonymization_ray.kg.algebra import exists_filter

    outer = _b({"c": ["1", "2", "3"], "n": ["a", "b", "c"]})
    grp = _b({"c": ["2", "2", "9"], "o": ["x", "y", "z"]})
    semi = exists_filter(outer, grp).to_pandas()
    assert list(semi["c"]) == ["2"]  # membership, not multiplication
    anti = exists_filter(outer, grp, negate=True).to_pandas().sort_values("c")
    assert list(anti["c"]) == ["1", "3"]


def test_exists_filter_requires_shared_var():
    import pytest as _pytest

    from anonymization_ray.kg.algebra import exists_filter

    with _pytest.raises(ValueError, match="share"):
        exists_filter(_b({"a": ["1"]}), _b({"z": ["1"]}))


def test_string_agg_per_key_spanning_blocks():
    from anonymization_ray.util import string_agg_per_key

    n = 3000
    rng = np.random.RandomState(13)
    df = pd.DataFrame(
        {
            "k": np.where(rng.rand(n) < 0.6, 1, rng.randint(2, 6, n)).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "v": [f"v{i}" for i in range(n)],
        }
    )
    out = (
        string_agg_per_key(
            rd.from_pandas(df).repartition(12), "k", "v", sep=",", order_cols=["o"]
        )
        .to_pandas()
        .set_index("k")["agg"]
    )
    want = df.sort_values(["k", "o"]).groupby("k")["v"].agg(",".join)
    assert len(out) == len(want)
    for k in want.index:
        assert out[k] == want[k], k


def test_per_key_prefix_max_spanning_blocks():
    from anonymization_ray.extras.window import per_key_prefix_max

    n = 4000
    rng = np.random.RandomState(17)
    df = pd.DataFrame(
        {
            "k": np.where(rng.rand(n) < 0.7, 1, rng.randint(2, 5, n)).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    out = (
        per_key_prefix_max(rd.from_pandas(df).repartition(13), "k", "o", "v")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .apply(lambda s: s.cummax().shift(1))
        .reset_index(drop=True)
    )
    got = out["prev_max"].astype("float64")
    assert len(got) == len(want)
    both_nan = got.isna() & want.isna()
    assert (both_nan | (got == want.to_numpy())).all()


def test_bgp_optimizer_orders_most_selective_first():
    from anonymization_ray.kg.bgp import optimize_pattern_order

    counts = {"hasAccountBalance": 1000, "basedIn": 1000, "partOf": 25}
    written = [
        ("?c", "hasAccountBalance", "?bal"),
        ("?c", "basedIn", "?n"),
        ("?n", "partOf", "urn:region:2"),
    ]
    ordered = optimize_pattern_order(None, written, pred_counts=counts)
    # partOf with a bound object costs 25/2; basedIn must come before the
    # balance scan only once ?c is bound — connectivity forces it second
    assert ordered[0] == ("?n", "partOf", "urn:region:2")
    assert ordered[1] == ("?c", "basedIn", "?n")
    assert ordered[2] == ("?c", "hasAccountBalance", "?bal")


def test_bgp_optimizer_keeps_connectivity_over_cost():
    from anonymization_ray.kg.bgp import optimize_pattern_order

    counts = {"p": 10, "q": 1000, "r": 1}
    written = [("?a", "q", "?b"), ("?b", "p", "?c"), ("?x", "r", "?y")]
    ordered = optimize_pattern_order(None, written, pred_counts=counts)
    # r is globally cheapest but shares no variable with anything: it can
    # only lead (it IS first), after which p/q must follow connectivity —
    # and since r binds nothing shared, the fallback keeps the stream legal
    assert ordered[0] == ("?x", "r", "?y")
