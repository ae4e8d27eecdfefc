"""Property-based tests (hypothesis) for the round-4 per-key primitives —
fold_per_key, rank_per_key, string_agg_per_key, per_key_prefix_max and CDC
chunking — each checked against a pandas reference on randomized frames
whose block layouts are deliberately awkward (hot keys spanning many blocks,
single-row blocks, negative values, duplicate order keys)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

frame_strategy = st.tuples(
    st.integers(min_value=1, max_value=60),  # rows
    st.integers(min_value=1, max_value=5),  # distinct keys
    st.integers(min_value=1, max_value=6),  # partitions
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


def _frame(n, k, seed):
    rng = np.random.RandomState(seed % 2**31)
    return pd.DataFrame(
        {
            "k": rng.randint(0, k, n).astype(np.int64),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.randint(-40, 40, n).astype(np.int64),
        }
    )


@settings(max_examples=8, deadline=None)
@given(frame_strategy)
def test_fold_per_key_matches_pandas(args):
    from anonymization_ray.util import fold_per_key

    n, k, p, seed = args
    df = _frame(n, k, seed)
    out = (
        fold_per_key(
            rd.from_pandas(df).repartition(p),
            "k",
            {"s": ("sum", "v"), "mn": ("min", "v"),
             "mx": ("max", "v"), "c": ("count", None)},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")["v"].agg(s="sum", mn="min", mx="max", c="count").reset_index()
    )
    assert len(out) == len(want)
    for col in ("s", "mn", "mx", "c"):
        assert list(out[col]) == list(want[col]), col


@settings(max_examples=8, deadline=None)
@given(frame_strategy)
def test_rank_per_key_is_dense_permutation(args):
    from anonymization_ray.util import rank_per_key

    n, k, p, seed = args
    df = _frame(n, k, seed)
    out = rank_per_key(
        rd.from_pandas(df).repartition(p), "k", "o"
    ).to_pandas()
    want = (
        df.sort_values(["k", "o"]).groupby("k").cumcount().to_numpy()
    )
    got = out.sort_values(["k", "o"])["rn"].to_numpy()
    assert (got == want).all()


@settings(max_examples=8, deadline=None)
@given(frame_strategy)
def test_string_agg_matches_pandas(args):
    from anonymization_ray.util import string_agg_per_key

    n, k, p, seed = args
    df = _frame(n, k, seed)
    df["t"] = df["v"].astype(str)
    out = (
        string_agg_per_key(
            rd.from_pandas(df).repartition(p), "k", "t", sep=",", order_cols=["o"]
        )
        .to_pandas()
        .set_index("k")["agg"]
    )
    want = df.sort_values(["k", "o"]).groupby("k")["t"].agg(",".join)
    assert len(out) == len(want)
    for key in want.index:
        assert out[key] == want[key]


@settings(max_examples=8, deadline=None)
@given(frame_strategy)
def test_prefix_max_matches_pandas(args):
    from anonymization_ray.extras.window import per_key_prefix_max

    n, k, p, seed = args
    df = _frame(n, k, seed)
    out = (
        per_key_prefix_max(rd.from_pandas(df).repartition(p), "k", "o", "v")
        .to_pandas()
        .sort_values(["k", "o"])["prev_max"]
        .astype("float64")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .apply(lambda s: s.cummax().shift(1))
        .reset_index(drop=True)
    )
    both_nan = out.isna() & want.isna()
    assert (both_nan | (out == want.to_numpy())).all()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dddd"]), min_size=0,
                 max_size=10).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_cdc_chunks_partition_token_stream(texts):
    """CDC chunk sizes per doc sum to the doc's token count and chunk ids
    are dense from 0."""
    import pyarrow as pa

    from anonymization_ray.extras.chunk import cdc_chunk_stats

    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    ).repartition(2)
    got = cdc_chunk_stats(ds).to_pandas()
    for i, txt in enumerate(texts):
        toks = txt.strip().lower().split() or [""]
        mine = got[got.doc_id == i].sort_values("chunk_id")
        assert mine.n_tokens.sum() == len(toks)
        assert list(mine.chunk_id) == list(range(len(mine)))


# ---------------------------------------------------------------------------
# extraction robustness: crawl html is adversarial — the extractor must never
# crash and must still extract every WELL-FORMED fact embedded in the noise
# ---------------------------------------------------------------------------

_NOISE = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_NOISE, min_size=1, max_size=5), st.integers(0, 2**31 - 1))
def test_mention_extractor_survives_adversarial_html(noises, seed):
    import pyarrow as pa

    from anonymization_ray.kg.extract import MentionExtractor

    rng = np.random.RandomState(seed % 2**31)
    good = (
        '<li data-e="customer"><b>Customer#7</b> maintains an account balance '
        "of <span>42.5</span> and is based in <i>FRANCE</i>.</li>"
    )
    pages = []
    for noise in noises:
        # splice the well-formed fact into arbitrary junk, including broken
        # tags and a stray "<li " opener
        junk = noise + "<li <li data-e=\"customer\"><b>Broken"
        pages.append(f"<html><body>{junk}{good}{noise}</body></html>".encode())
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(pages))], pa.string()),
            "html": pa.array(pages, pa.binary()),
        }
    )
    out = MentionExtractor()(batch)  # must not raise
    based = out.filter(
        pa.compute.equal(out.column("pred"), pa.scalar("basedIn"))
    )
    # every page's well-formed fact extracted exactly once, junk ignored
    assert based.num_rows == len(pages)
    assert set(based.column("obj").to_pylist()) == {"FRANCE"}
    bal = out.filter(
        pa.compute.equal(out.column("pred"), pa.scalar("hasAccountBalance"))
    )
    assert set(bal.column("obj").to_pylist()) == {"42.5"}


@settings(max_examples=10, deadline=None)
@given(st.binary(max_size=200))
def test_extract_text_survives_arbitrary_bytes(blob):
    import pyarrow as pa

    from anonymization_ray.kg.extract import extract_text

    html = b"<html><body><article><p>ok</p></article>" + blob + b"</body></html>"
    ds = rd.from_arrow(
        pa.table({"url": ["u"], "html": pa.array([html], pa.binary())})
    )
    out = extract_text(ds).to_pandas()  # must not raise
    assert len(out) == 1


@settings(max_examples=10, deadline=None)
@given(st.binary(min_size=1, max_size=100))
def test_mention_extractor_survives_invalid_utf8(blob):
    import pyarrow as pa

    from anonymization_ray.kg.extract import MentionExtractor

    good = (
        '<li data-e="nation"><i>FRANCE</i> is part of <i>EUROPE</i>.</li>'
    )
    html = b"<html><body>" + blob + good.encode() + b"\xff\xfe</body></html>"
    out = MentionExtractor()(
        pa.table({"url": ["u"], "html": pa.array([html], pa.binary())})
    )  # must not raise on invalid UTF-8 (lossy-decode fallback)
    part = out.filter(pa.compute.equal(out.column("pred"), pa.scalar("partOf")))
    # the well-formed fact still extracts unless the junk spliced into its
    # fragment boundary (blob ends right before '<li ' so it cannot)
    assert part.num_rows == 1 and part.column("obj")[0].as_py() == "EUROPE"


# ---------------------------------------------------------------------------
# URL canonicalizer: crash-free on adversarial hrefs and IDEMPOTENT — the
# property crawl dedup depends on (a canonical form that keeps moving under
# re-canonicalization would split identical pages across dedup keys)
# ---------------------------------------------------------------------------

_URLISH = st.one_of(
    st.text(max_size=30),
    st.builds(
        lambda h, p, q: f"HTTP://{h}:80/{p}?utm_x=1&{q}#frag",
        st.sampled_from(["A.com", "b.ORG", "c.net"]),
        st.text(alphabet="abcXYZ/", max_size=10),
        st.text(alphabet="abc=&123", max_size=10),
    ),
    st.builds(lambda p: f"/{p}", st.text(alphabet="abc/.", max_size=12)),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_URLISH, min_size=1, max_size=8))
def test_canonicalize_urls_idempotent(hrefs):
    import pyarrow as pa

    from anonymization_ray.kg.links import canonicalize_urls

    def run(values):
        ds = rd.from_arrow(
            pa.table(
                {
                    "href": pa.array(values, pa.string()),
                    "src_url": pa.array(
                        ["https://example.org/doc/1"] * len(values), pa.string()
                    ),
                }
            )
        )
        return canonicalize_urls(ds, "href", "src_url").to_pandas()["dst_url"]

    once = run(hrefs)  # must not raise on any junk
    twice = run(list(once.fillna("")))
    for a, b in zip(once, twice):
        if a is not None and a == a and str(a) != "":
            assert b == a, (a, b)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),  # (url idx, ts)
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 50),
)
def test_pages_asof_winner_is_latest_not_future(captures, t):
    import pyarrow as pa

    from anonymization_ray.kg.temporal import pages_asof

    tbl = pa.table(
        {
            "url": pa.array([f"u{i}" for i, _ in captures], pa.string()),
            "warc_ts": pa.array(
                [ts * 10**6 for _, ts in captures], pa.timestamp("us")
            ),
            "html": pa.array(
                [f"u{i}@{ts}".encode() for i, ts in captures], pa.binary()
            ),
            "text": pa.array([f"{ts}" for _, ts in captures], pa.string()),
            "lang": pa.array(["en"] * len(captures), pa.string()),
        }
    )
    out = pages_asof(rd.from_arrow(tbl).repartition(3), t * 10**6)
    # take_all, not to_pandas: Ray's to_pandas drops the schema of an
    # all-empty dataset (the all-captures-post-T case is a legal result)
    rows = out.take_all()
    want = {}
    for i, ts in captures:
        if ts <= t and (f"u{i}" not in want or ts > want[f"u{i}"]):
            want[f"u{i}"] = ts
    got = {
        r["url"]: int(pd.Timestamp(r["warc_ts"]).value // 1000) for r in rows
    }
    assert got == {u: ts * 10**6 for u, ts in want.items()}
