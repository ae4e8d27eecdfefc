"""Property-based tests (hypothesis) for the corpus-prep operators.

Each operator is checked against a naive Python reference on randomized
small corpora — the invariants are the ones the SQL oracles can't state
directly (reconstruction, partition-of-ids, bound-consistency), and the
generators deliberately produce the awkward shapes: empty docs, repeated
tokens, single-token docs, multi-block datasets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

WORDS = ["a", "b", "cc", "dd", "e"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ds(texts: list[str], nparts: int = 2) -> rd.Dataset:
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    return rd.from_arrow(t).repartition(nparts)


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_chunks_reconstruct_normalized_tokens(texts):
    """Concatenating a doc's non-overlapping chunks in chunk_id order gives
    exactly its normalized token stream; every chunk but the last is full."""
    from anonymization_ray.extras.chunk import chunk_documents

    got = chunk_documents(_ds(texts), size=3).to_pandas()
    if got.empty:
        # all-empty corpora produce zero rows (and Ray may drop the schema
        # on fully-empty outputs — a Ray-internal quirk, not operator state)
        assert all(not t.strip() for t in texts)
        return
    for i, txt in enumerate(texts):
        toks = [w for w in txt.lower().strip().split() if w]
        mine = got[got.doc_id == i].sort_values("chunk_id")
        assert " ".join(mine.chunk_text) == " ".join(toks)
        sizes = mine.n_tokens.tolist()
        assert all(s == 3 for s in sizes[:-1])
        if toks:
            assert 1 <= sizes[-1] <= 3
        else:
            assert sizes == []


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_repetition_stats_match_python(texts):
    from anonymization_ray.extras.textstats import repetition_stats

    df = repetition_stats(_ds(texts), "text", "doc_id").to_pandas()
    if df.empty:
        assert all(len(t.split()) < 2 for t in texts)
        return
    got = df.set_index("doc_id")
    for i, txt in enumerate(texts):
        toks = [w for w in txt.lower().strip().split() if w]
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not bigrams:
            assert i not in got.index
            continue
        assert got.loc[i, "n_bigrams"] == len(bigrams)
        assert got.loc[i, "n_distinct"] == len(set(bigrams))


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_duplicate_spans_match_python(texts):
    """n_dup per doc equals the brute-force 'not the first (doc,pos)
    occurrence of this n-gram in corpus order' count."""
    from anonymization_ray.extras.dedup import duplicate_span_stats

    n = 2
    df = duplicate_span_stats(_ds(texts, 3), "text", "doc_id", n=n).to_pandas()
    if df.empty:
        assert all(len(t.split()) < n for t in texts)
        return
    got = df.set_index("doc_id")
    seen: set[str] = set()
    for i, txt in enumerate(texts):
        toks = [w for w in txt.lower().strip().split() if w]
        grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        dups = 0
        for g in grams:
            if g in seen:
                dups += 1
            seen.add(g)
        if not grams:
            assert i not in got.index
            continue
        assert got.loc[i, "n_grams"] == len(grams)
        assert got.loc[i, "n_dup"] == dups


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=300), st.integers(min_value=0, max_value=99))
def test_split_assign_partitions_ids(n_ids, salt):
    """Every id gets exactly one split; fractions of 1.0 never drop an id."""
    from anonymization_ray.extras.shuffle import split_assign

    ids = pa.table({"doc_id": pa.array(range(n_ids), pa.int64())})
    got = split_assign(
        rd.from_arrow(ids).repartition(2),
        "doc_id",
        {"x": 0.5, "y": 0.25, "z": 0.25},
        salt=salt,
    ).to_pandas()
    assert len(got) == n_ids
    assert sorted(got.doc_id) == list(range(n_ids))
    assert set(got.split) <= {"x", "y", "z"}


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
        min_size=1,
    ),
    st.integers(min_value=0, max_value=99),
)
def test_mixture_sample_copy_counts_bounded(weights, salt):
    """Each doc appears floor(w) or ceil(w) times; copy_idx enumerates."""
    from anonymization_ray.extras.shuffle import mixture_sample

    srcs = ["s0", "s1", "s2"] * 20
    t = pa.table(
        {
            "doc_id": pa.array(range(len(srcs)), pa.int64()),
            "source": pa.array(srcs, pa.string()),
        }
    )
    got = mixture_sample(
        rd.from_arrow(t).repartition(2), "source", weights, "doc_id", salt=salt
    ).to_pandas()
    if got.empty:
        # valid only when every source's floor(w) is 0 (all docs may drop)
        assert all(int(np.floor(weights.get(s, 1.0))) == 0 for s in set(srcs))
        return
    counts = got.groupby("doc_id").size()
    for doc, src in enumerate(srcs):
        w = weights.get(src, 1.0)
        c = int(counts.get(doc, 0))
        assert int(np.floor(w)) <= c <= int(np.ceil(w))
        if c:
            assert sorted(got[got.doc_id == doc].copy_idx) == list(range(c))


@settings(max_examples=10, deadline=None)
@given(docs_strategy, st.sampled_from(["a", "cc", "e"]))
def test_redact_counts_match_python_re(texts, word):
    """Sequential count+replace semantics equal a Python re reference for
    word rules; RE2 and re agree on these patterns."""
    import re

    from anonymization_ray.extras.redact import redact_text

    rules = [("w", rf"\b{word}\b", "<W>"), ("pair", r"<W> <W>", "<WW>")]
    got = (
        redact_text(_ds(texts), rules)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    if got.empty:
        assert not texts or all(t == "" for t in texts) or len(texts) == 0
        return
    for i, txt in enumerate(texts):
        cur, total = txt, 0
        for _name, pat, repl in rules:
            total += len(re.findall(pat, cur))
            cur = re.sub(pat, repl, cur)
        assert got.text_redacted[i] == cur
        assert got.n_redactions[i] == total


@settings(max_examples=10, deadline=None)
@given(docs_strategy, docs_strategy)
def test_decontaminate_matches_python(bench_texts, corpus_texts):
    """Hit counts equal a brute-force Python n-gram reference."""
    from anonymization_ray.extras.decontaminate import decontaminate, ngram_set

    n = 2

    def grams(txt):
        toks = [w for w in txt.lower().strip().split() if w]
        return [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]

    bench_set = {g for t in bench_texts for g in grams(t)}
    got = (
        decontaminate(_ds(corpus_texts, 3), ngram_set(_ds(bench_texts), "text", n), n=n)
        .to_pandas()
    )
    want = {
        i: sum(g in bench_set for g in grams(t))
        for i, t in enumerate(corpus_texts)
        if sum(g in bench_set for g in grams(t)) > 0
    }
    if got.empty:
        assert not want
        return
    assert dict(zip(got.doc_id, got.n_hits)) == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5), min_size=2, max_size=40
    )
)
def test_editdist_pairs_match_python(strs):
    """editdist_pairs finds EXACTLY the Levenshtein<=1 pairs (brute-force
    DP reference), including distance-0 duplicates, at any partitioning."""
    from anonymization_ray.extras.dedup import editdist_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(range(len(strs)), pa.int64()),
                "s": pa.array(strs, pa.string()),
            }
        )
    ).repartition(3)
    got = editdist_pairs(ds, "s", "id").to_pandas()
    want = {
        (i, j): lev(strs[i], strs[j])
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if lev(strs[i], strs[j]) <= 1
    }
    if got.empty:
        assert not want
        return
    assert dict(zip(zip(got.id_a, got.id_b), got.dist)) == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=60
    ),
    st.integers(2, 4),
)
def test_kcore_matches_python_peel(raw_edges, k):
    """kcore equals a brute-force Python peel on arbitrary small graphs
    (path graphs in the mix exercise deep multi-round cascades)."""
    from anonymization_ray.extras.graph import kcore

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    es = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, c in deg.items() if c < k}
        if not bad:
            break
        es = {(a, b) for a, b in es if a not in bad and b not in bad}
    want = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges], pa.int64()),
                "b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(3)
    got = kcore(ds, k).to_pandas()
    if got.empty:
        assert not want
        return
    assert dict(zip(got.node, got.deg)) == want


def test_kcore_truncated_rounds_match_unrolled_peel():
    """max_rounds exhausted mid-peel: output must equal an exactly
    max_rounds-unrolled peel (degrees from the FINAL edge set), matching
    what the fixed-round SQL oracle computes."""
    from anonymization_ray.extras.graph import kcore

    # path graph 0-1-...-9: k=2 peels one endpoint pair per round
    edges = [(i, i + 1) for i in range(9)]
    es = set(edges)
    for _ in range(2):  # 2-round Python peel
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, c in deg.items() if c < 2}
        es = {(a, b) for a, b in es if a not in bad and b not in bad}
    want = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    want = {n: c for n, c in want.items() if c >= 2}

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges], pa.int64()),
                "b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(2)
    got = kcore(ds, 2, max_rounds=2).to_pandas()
    assert dict(zip(got.node, got.deg)) == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        # ASCII only: the engine contract is Arrow==DuckDB (both utf8proc
        # simple case mapping + RE2 ASCII \s — covered by the oracle test);
        # Python's FULL lowercasing ('İ' -> 'i̇') and unicode str.split
        # legitimately differ, so the Python reference holds on ASCII
        st.text(
            alphabet="abcdefghijKLMNOP0123456789 \t.,!-",
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_classifier_scores_match_python(texts):
    """classifier_scores equals a per-token Python reimplementation
    (hash -> bucket -> weight -> sum) on ASCII text, including
    whitespace-only and empty documents (score = bias = 0, keep = 1)."""
    import hashlib

    from anonymization_ray.extras.classify import classifier_scores, default_weights

    w = default_weights(4096)
    want = {}
    for i, t in enumerate(texts):
        s = 0
        for tok in t.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            s += int(w[h % 4096])
        want[i] = s
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    got = classifier_scores(ds).to_pandas()
    assert dict(zip(got.doc_id, got.score)) == want
    assert (got.keep == (got.score >= 0).astype(int)).all()


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=300))
def test_cms_never_underestimates_and_is_partition_invariant(vals):
    """Count-Min point estimates are >= exact counts for every key, and the
    sketch matrix is identical at different partitionings (mergeability)."""
    import numpy as np
    from collections import Counter

    from anonymization_ray.extras.stats import cms_estimate, cms_sketch

    t = pa.table({"x": pa.array(vals, pa.int64())})
    m1 = cms_sketch(rd.from_arrow(t).repartition(1), "x", w=64, d=3)
    m3 = cms_sketch(rd.from_arrow(t).repartition(3), "x", w=64, d=3)
    assert (m1 == m3).all()
    exact = Counter(vals)
    keys = np.array(sorted(exact), np.int64)
    est = cms_estimate(m1, keys)
    assert (est >= np.array([exact[k] for k in keys])).all()
    assert int(m1[0].sum()) == len(vals)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="aab bcc", max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_train_matches_unrolled_sql(texts):
    """The Ray/driver BPE trainer and the unrolled-SQL oracle agree on
    random corpora heavy in repeated-character runs — the case where greedy
    leftmost non-overlapping merging ('aaaa' -> [aa, aa]) diverges from any
    sloppier merge semantics."""
    import duckdb

    from anonymization_ray.extras.bpe import bpe_merges
    from anonymization_ray.queries_extras import _bpe_unrolled_sql

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    got = bpe_merges(ds, rounds=3).to_pandas()
    con = duckdb.connect()
    con.register("documents", pa.table({"text": pa.array(texts, pa.string())}))
    want = con.execute(_bpe_unrolled_sql(3)).fetchdf()
    got = got.sort_values("rank").reset_index(drop=True)
    want = want.sort_values("rank").reset_index(drop=True)
    assert got[["rank", "pair", "merged", "c"]].values.tolist() == want[
        ["rank", "pair", "merged", "c"]
    ].values.tolist()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "https://ads.tracker.net/x/1",
                "https://tracker.net/y",
                "https://sub.deep.tracker.net/z",
                "https://www.example.org/p3/q",
                "https://www.example.org/p30/q",
                "https://safe.com/ok",
                "not a url",
                "ftp://safe.com/f",
                "",
            ]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_url_blocklist_matches_python(urls):
    """Survivors equal a urllib-based Python reference: host or any of its
    dot-suffixes blocked, path-prefix blocked, non-urls dropped."""
    from urllib.parse import urlparse

    from anonymization_ray.extras.urls import url_blocklist_filter

    hosts = {"tracker.net"}
    want = []
    for i, u in enumerate(urls):
        p = urlparse(u.lower())
        if not p.scheme or "://" not in u.lower():
            continue
        h = p.netloc
        suffixes = {h}
        parts = h.split(".")
        for j in range(1, min(len(parts), 4)):
            suffixes.add(".".join(parts[j:]))
        if suffixes & hosts:
            continue
        if p.path.startswith("/p3/"):
            continue
        want.append(i)
    ds = rd.from_arrow(
        pa.table(
            {
                "i": pa.array(range(len(urls)), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )
    ).repartition(2)
    got = url_blocklist_filter(ds, "url", ["tracker.net"], ["/p3/"]).to_pandas()
    if got.empty:
        assert want == []
        return
    assert sorted(got.i) == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(0, 200),
)
def test_token_budget_cut_matches_python(ntoks, budget):
    """The kept set equals the Python prefix scan over (sm64(id), id) order,
    including zero-token docs and budget=0."""
    from anonymization_ray.extras.shuffle import sm64_key, token_budget_cut

    ids = np.arange(len(ntoks), dtype=np.int64)
    order = sorted(range(len(ids)), key=lambda i: (int(sm64_key(ids[i : i + 1])[0]), i))
    want, cum = {}, 0
    for i in order:
        cum += ntoks[i]
        if cum > budget:
            break
        want[i] = cum
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )
    ).repartition(3)
    # take_all, not to_pandas: Ray's to_pandas drops the column index on an
    # all-empty Dataset (budget=0 keeps nothing), which is a harness quirk,
    # not an operator property.
    got = token_budget_cut(ds, "doc_id", "n_tokens", budget).take_all()
    assert {r["doc_id"]: r["cum"] for r in got} == want
