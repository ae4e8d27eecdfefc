"""Wave-17 operator tests: grouped Mann-Whitney AUC (block-boundary
regression), Gopher rule suite edge cases, dedup-aware split invariants."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _brute_auc(pos: np.ndarray, neg: np.ndarray) -> float:
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


def test_group_rank_auc_many_distinct_scores_multi_block():
    # regression: 50k rows with ~unique scores forces the distinct-counts
    # stream across many blocks — the carry-chained scan must see blocks in
    # global key order (a gather-order bug here once shifted AUC by ~1e-5)
    from anonymization_ray.extras.stats import group_rank_auc

    rng = np.random.RandomState(3)
    n = 50_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n),
            "v": rng.randint(0, 10_000_000, n).astype(np.int64),
            "lab": rng.randint(0, 2, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(40)
    got = group_rank_auc(ds, "g", "v", "lab").to_pandas().set_index("g")
    for gname, grp in df.groupby("g"):
        pos = grp[grp.lab == 1].v.values
        neg = grp[grp.lab == 0].v.values
        ranks = pd.Series(grp.v.values).rank(method="average").values
        r1 = ranks[grp.lab.values == 1].sum()
        want = (r1 - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
        assert abs(got.loc[gname, "auc"] - want) < 1e-12
        assert got.loc[gname, "n_pos"] == len(pos)


def test_group_rank_auc_ties_and_degenerate_group():
    from anonymization_ray.extras.stats import group_rank_auc

    df = pd.DataFrame(
        {
            "g": ["t"] * 6 + ["onlypos"] * 2,
            "v": np.array([5, 5, 5, 1, 9, 5, 3, 4], dtype=np.int64),
            "lab": np.array([1, 0, 1, 0, 0, 0, 1, 1], dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = group_rank_auc(ds, "g", "v", "lab").to_pandas().set_index("g")
    pos = df[(df.g == "t") & (df.lab == 1)].v.values
    neg = df[(df.g == "t") & (df.lab == 0)].v.values
    assert abs(got.loc["t", "auc"] - _brute_auc(pos, neg)) < 1e-15
    # a single-class group reports counts and a null AUC, not a crash
    assert got.loc["onlypos", "n_neg"] == 0 and pd.isna(got.loc["onlypos", "auc"])


def test_group_rank_auc_rejects_negative_scores():
    from anonymization_ray.extras.stats import group_rank_auc

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a", "a"]),
                "v": pa.array([-1, 2], pa.int64()),
                "lab": pa.array([0, 1], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="non-negative"):
        group_rank_auc(ds, "g", "v", "lab")


def _gopher_kernel():
    """Capture the production per-batch kernel out of the query closure, so
    the test drives the EXACT shipped code over crafted rows."""
    import anonymization_ray.queries_extras7 as mod

    class _Done(Exception):
        pass

    class _Spy:
        def map_batches(self, fn, **kw):
            self.fn = fn
            raise _Done()

    spy = _Spy()
    orig_load = mod.load
    try:
        mod.load = lambda *a, **k: spy
        with pytest.raises(_Done):
            mod.q_text_gopher_rules("/nonexistent")
    finally:
        mod.load = orig_load
    return spy.fn


def test_gopher_rules_flags():
    good = "the cat and the dog have gone to the market with some friends " * 3
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    good,  # passes everything
                    "short text here",  # too few words
                    # long words -> mean word length out of [3, 10]
                    "supercalifragilistic expialidocious " * 10
                    + "the of and that have with to be",
                    # symbol-heavy: lots of #'s vs words
                    "the cat ### ## # # # # # # # # # # and that have with "
                    + "to be of words words words",
                    "",  # empty text: zero words, all word-ratio rules fail
                ]
            ),
        }
    )
    res = (
        rd.from_arrow(docs)
        .map_batches(_gopher_kernel(), batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    assert res.loc[1, "keep"] == 1
    assert res.loc[2, "pass_len"] == 0 and res.loc[2, "keep"] == 0
    assert res.loc[3, "pass_wordlen"] == 0
    assert res.loc[4, "pass_symbol"] == 0
    assert res.loc[5, "n_words"] == 0 and res.loc[5, "keep"] == 0


def test_dedup_aware_split_keeps_clusters_together():
    from anonymization_ray.extras.dedup import minhash_lsh_pairs
    from anonymization_ray.queries_extras import _corpus_with_dups
    from anonymization_ray.queries_extras7 import q_corpus_split_dedup_aware

    split = (
        q_corpus_split_dedup_aware(SF_DIR).to_pandas().set_index("doc_id")["split"]
    )
    pairs = (
        minhash_lsh_pairs(
            _corpus_with_dups(SF_DIR),
            "text",
            "doc_id",
            bands=32,
            verify_threshold=0.5,
        )
        .select_columns(["id_a", "id_b"])
        .to_pandas()
    )
    assert len(pairs) > 0  # the perturbed corpus must actually have near-dups
    for a, b in pairs.itertuples(index=False):
        assert split[a] == split[b], f"near-dup pair ({a},{b}) straddles the split"
    # both splits are populated and fractions are roughly honored
    frac_train = (split == "train").mean()
    assert 0.6 < frac_train < 0.95


def test_sameas_rewrite_merges_aliases():
    from anonymization_ray.queries_extras7 import SAMEAS_STRIDE, q_kg_sameas_rewrite

    out = q_kg_sameas_rewrite(SF_DIR).to_pandas()
    subs = set(out.subj) | set(out[out.obj_kind == "iri"].obj)
    # no odd alias endpoint survives: urn:cust:(k+1) for k % stride == 0
    import duckdb

    maxk = duckdb.sql(
        f"SELECT max(c_custkey) FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchone()[0]
    gone = [
        f"urn:cust:{k + 1}"
        for k in range(0, maxk, SAMEAS_STRIDE)
        if k % SAMEAS_STRIDE == 0 and k + 1 <= maxk
    ]
    assert gone and not (set(gone) & subs)
    # set semantics: no duplicate triples after the merge
    assert not out.duplicated(["subj", "pred", "obj", "obj_kind"]).any()


def test_shacl_violations_exactly_the_corrupted_rows():
    from anonymization_ray.queries_extras7 import q_kg_validate_shacl

    out = q_kg_validate_shacl(SF_DIR).to_pandas()
    assert (out.rule == "range:basedIn").all()
    # every violation is a custkey % 13 == 0 basedIn retargeted to a region
    ks = out.subj.str.rsplit(":", n=1).str[1].astype(int)
    assert (ks % 13 == 0).all()
    assert out.obj.str.startswith("urn:region:").all()


def test_concept_tags_counts_match_python():
    from anonymization_ray.queries_extras7 import GAZETTEER, q_kg_concept_tags
    import pyarrow.parquet as pq

    got = (
        q_kg_concept_tags(SF_DIR)
        .to_pandas()
        .set_index(["doc_id", "concept"])["n"]
        .to_dict()
    )
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for did, text in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        for w in text.strip().lower().split():
            if w in GAZETTEER:
                key = (did, GAZETTEER[w])
                want[key] = want.get(key, 0) + 1
    assert got == want


def test_group_gini_matches_reference_and_handles_blocks():
    from anonymization_ray.extras.stats import group_gini

    rng = np.random.RandomState(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.randint(0, 1000, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(31)
    got = group_gini(ds, "g", "v").to_pandas().set_index("g")
    for gname, grp in df.groupby("g"):
        x = np.sort(grp.v.values).astype(object)
        i = np.arange(1, len(x) + 1, dtype=object)
        want = float(2 * (i * x).sum() - (len(x) + 1) * x.sum()) / (len(x) * x.sum())
        assert abs(got.loc[gname, "gini"] - want) < 1e-12
        assert got.loc[gname, "n"] == len(x) and got.loc[gname, "sum_v"] == x.sum()


def test_group_gini_extremes():
    from anonymization_ray.extras.stats import group_gini

    t = pa.table(
        {
            "g": pa.array(["eq"] * 4 + ["conc"] * 4 + ["zero"] * 2),
            "v": pa.array([5, 5, 5, 5, 0, 0, 0, 100, 0, 0], pa.int64()),
        }
    )
    got = group_gini(rd.from_arrow(t).repartition(3), "g", "v").to_pandas().set_index("g")
    assert got.loc["eq", "gini"] == 0.0  # perfect equality
    assert abs(got.loc["conc", "gini"] - 0.75) < 1e-15  # all mass on one of 4
    assert pd.isna(got.loc["zero", "gini"])  # zero total -> undefined, not a crash


def test_scd2_history_matches_pandas_reference():
    from anonymization_ray.extras.window import scd2_history

    rng = np.random.RandomState(5)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.randint(0, 40, n).astype(np.int64),
            "ts": rng.randint(0, 10_000, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "st": rng.choice(["A", "B", "C"], n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(29)
    got = (
        scd2_history(ds, "u", "ts", "id", "st")
        .to_pandas()
        .sort_values(["u", "valid_from", "state"])
        .reset_index(drop=True)
    )
    rows = []
    for uname, grp in df.sort_values(["ts", "id"]).groupby("u"):
        prev = None
        changes = []
        for _, r in grp.iterrows():
            if prev is None or r.st != prev:
                changes.append((r.st, int(r.ts)))
            prev = r.st
        for i, (stt, vf) in enumerate(changes):
            vt = changes[i + 1][1] if i + 1 < len(changes) else None
            rows.append({"u": uname, "state": stt, "valid_from": vf, "valid_to": vt})
    want = (
        pd.DataFrame(rows)
        .sort_values(["u", "valid_from", "state"])
        .reset_index(drop=True)
    )
    got["valid_to"] = got["valid_to"].astype("float64")
    want["valid_to"] = want["valid_to"].astype("float64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_scd2_single_state_per_key_never_closes():
    from anonymization_ray.extras.window import scd2_history

    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([10, 20, 30, 5], pa.int64()),
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "st": pa.array(["A", "A", "A", "B"]),
        }
    )
    got = (
        scd2_history(rd.from_arrow(t).repartition(3), "u", "ts", "id", "st")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert len(got) == 2
    assert got.loc[0, "valid_from"] == 10 and pd.isna(got.loc[0, "valid_to"])
    assert got.loc[1, "u"] == 2 and pd.isna(got.loc[1, "valid_to"])


def test_bloom_semi_join_exact_and_prefilter_reduces():
    import ray

    from anonymization_ray.extras.joins import bloom_semi_join, build_bloom
    from anonymization_ray.extras.shuffle import sm64_key

    rng = np.random.default_rng(7)
    left_keys = rng.integers(0, 10_000, 5_000).astype(np.int64)
    right_keys = np.unique(rng.integers(0, 10_000, 200).astype(np.int64))
    left = rd.from_arrow(
        pa.table({"k": pa.array(left_keys), "v": pa.array(np.arange(5_000))})
    ).repartition(4)
    right = rd.from_arrow(pa.table({"k": pa.array(right_keys)})).repartition(2)

    got = bloom_semi_join(left, right, on="k", m_bits=1 << 14).to_pandas()
    want = np.isin(left_keys, right_keys)
    assert len(got) == int(want.sum())
    assert set(got["k"]) == set(left_keys[want])

    # no false negatives on the raw bits; prefilter passes < everything
    bits = build_bloom(right, "k", m_bits=1 << 14)
    hits = np.ones(len(left_keys), bool)
    for j in range(4):
        h = (sm64_key(left_keys, j) % np.uint64(1 << 14)).astype(np.int64)
        hits &= (bits[h >> 3] & (np.uint8(1) << (h & 7).astype(np.uint8))) != 0
    assert hits[want].all()           # every true match survives the bloom
    assert hits.sum() < len(left_keys)  # and the prefilter actually prunes


def test_zorder_key_locality_and_bounds():
    from anonymization_ray.extras.zorder import zorder_key

    t = pa.table(
        {"x": pa.array([0, 1, 2, 3], pa.int64()), "y": pa.array([0, 1, 2, 3], pa.int64())}
    )
    got = (
        zorder_key(rd.from_arrow(t), "x", "y", bits=2, bucket_bits=2)
        .to_pandas()
        .sort_values("x")
    )
    # interleave of (x,y): (0,0)=0, (1,1)=3, (2,2)=12, (3,3)=15
    assert list(got["zval"]) == [0, 3, 12, 15]
    assert list(got["zbucket"]) == [0, 0, 3, 3]

    bad = pa.table({"x": pa.array([4], pa.int64()), "y": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="out of"):
        zorder_key(rd.from_arrow(bad), "x", "y", bits=2).materialize()


def test_fuzzy_link_edge_cases():
    from anonymization_ray.extras.er import _within1, fuzzy_link

    assert _within1("abc", "abc") == 0
    assert _within1("abc", "abd") == 1      # substitution
    assert _within1("abc", "ab") == 1       # deletion at end
    assert _within1("abc", "bc") == 1       # deletion at front
    assert _within1("abc", "axbc") == 1     # insertion middle
    assert _within1("abc", "axd") is None
    assert _within1("a", "b") == 1          # single-char substitution
    assert _within1("ab", "ba") is None

    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "m": pa.array(["a", "zoin", "sortx", "qqq"], pa.string()),
            }
        )
    ).repartition(2)
    got = (
        fuzzy_link(ds, "m", ["b", "join", "sort", "coin"], keep_cols=["id"])
        .to_pandas()
        .sort_values(["id", "match"])
        .reset_index(drop=True)
    )
    # 'a'~'b' (len-1 sub), 'zoin'~'join'+'coin', 'sortx'~'sort', 'qqq' drops
    assert list(got["id"]) == [1, 2, 2, 3]
    assert list(got["match"]) == ["b", "coin", "join", "sort"]
    assert list(got["dist"]) == [1, 1, 1, 1]


def test_kll_merge_order_invariant_bounds_and_mergeability():
    from anonymization_ray.extras.kll import KLL

    rng = np.random.default_rng(3)
    v = rng.integers(0, 1_000_000, 20_000).astype(np.int64)
    chunks = np.array_split(v, 11)
    a = KLL(128)
    for c in chunks:
        a.merge(KLL(128).update(c))
    b = KLL(128)
    for c in reversed(chunks):
        b.merge(KLL(128).update(c))
    assert a.n == b.n == len(v)
    sv = np.sort(v)
    for s in (a, b):
        for q in (0.1, 0.5, 0.9):
            est = s.quantile(q)
            rank = np.searchsorted(sv, est, side="right")
            assert abs(rank - q * len(v)) <= 5 * 1.33 / 128 * len(v)


def test_zonemap_write_prunes_files():
    import shutil
    import tempfile

    from anonymization_ray.extras.zonemap import read_pruned, write_zonemapped

    t = pa.table(
        {
            "id": pa.array(np.arange(4000), pa.int64()),
            "v": pa.array(np.arange(4000) % 1000, pa.int64()),
        }
    )
    out = tempfile.mkdtemp(prefix="zm_test_", dir="/tmp")
    try:
        man = write_zonemapped(rd.from_arrow(t).repartition(4), out, "v", num_files=8)
        assert len(man) > 1
        ds, nread, ntotal = read_pruned(out, "v", 0, 100)
        got = ds.to_pandas()
        assert nread < ntotal            # pruning actually happened
        assert len(got) == 4 * 101       # exact: residual filter applied
        assert got["v"].between(0, 100).all()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_property_path_grammar_and_inverse():
    import pytest as _pt

    from anonymization_ray.kg.paths import eval_path, parse_path

    assert parse_path("a/b|c") == ("alt", [("seq", [("pred", "a"), ("pred", "b")]), ("pred", "c")])
    assert parse_path("^(a|b)") == ("inv", ("alt", [("pred", "a"), ("pred", "b")]))
    with _pt.raises(ValueError):
        parse_path("a//b")
    with _pt.raises(ValueError):
        parse_path("(a|b")

    tri = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["x", "y", "n1"], pa.string()),
                "pred": pa.array(["p", "p", "q"], pa.string()),
                "obj": pa.array(["n1", "n2", "r1"], pa.string()),
            }
        )
    )
    got = eval_path(tri, "p/q").to_pandas().sort_values("s").reset_index(drop=True)
    assert list(got["s"]) == ["x"] and list(got["o"]) == ["r1"]
    inv = eval_path(tri, "^q").to_pandas()
    assert list(inv["s"]) == ["r1"] and list(inv["o"]) == ["n1"]
