"""Round-4 wave-10 operators with DuckDB oracles — the relational-lifecycle
family a 100-TB corpus job hits around the core pipeline: skew-resistant
joins (hot keys served map-side, never shuffled), nearest-event joins
(bidirectional as-of composition), per-group heavy hitters, Zipf-fit corpus
diagnostics, robust group-moment outlier flags, group-mean imputation,
schema-evolution unions, and a JSONL sink round-trip. Every query
value-gated against exact SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS4_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# skew-resistant join — hot keys broadcast, cold keys hash-join
# --------------------------------------------------------------------------

def q_join_skew_hot(sf_dir: str):
    """Enrich the events fact stream with the user's market segment.
    events.user_id is the canonical hot key (150 users x ~67 events at
    sf0.01; a real clickstream is far worse) — `skew_join` pulls every key
    with >= 60 rows OUT of the hash exchange and serves it from a broadcast
    lookup, so the straggler aggregator a plain shuffle join would create
    for a hot user cannot exist. The oracle is the plain join: the skew
    machinery must be invisible in the result."""
    from .extras.joins import skew_join

    ev = load(sf_dir, "events", ["event_id", "user_id"])
    cust = load(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename_columns(["user_id", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    out = skew_join(
        ev, cust, on="user_id", payload_cols=["c_mktsegment"], hot_threshold=60
    )
    return out.select_columns(["event_id", "c_mktsegment"])


SQL_JOIN_SKEW = """
SELECT e.event_id, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


# --------------------------------------------------------------------------
# nearest-event join — bidirectional as-of composition
# --------------------------------------------------------------------------

def q_events_nearest_join(sf_dir: str):
    """For every click, the SAME user's purchase closest in time (ties ->
    the earlier purchase). Attribution-style operator: two asof legs (the
    forward leg is asof on negated epochs) + one id join; no range shuffle,
    no per-key UDF."""
    from .extras.asof import nearest_join

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _prep(batch: pa.Table, typ: str) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), typ))
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "user_id": b.column("user_id").combine_chunks(),
                "t": pc.cast(b.column("ts"), pa.int64()),
            }
        )

    clicks = ev.map_batches(lambda b: _prep(b, "click"), batch_format="pyarrow")
    buys = ev.map_batches(lambda b: _prep(b, "purchase"), batch_format="pyarrow")
    return nearest_join(
        clicks, buys, key_col="user_id", time_col="t", left_id_col="event_id"
    )


SQL_NEAREST_JOIN = """
WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS t
           FROM events WHERE event_type = 'click'),
     b AS (SELECT user_id, epoch_us(ts) AS t
           FROM events WHERE event_type = 'purchase'),
     prev AS (SELECT a.event_id, max(b.t) AS pt
              FROM a JOIN b ON a.user_id = b.user_id AND b.t <= a.t
              GROUP BY a.event_id),
     nxt AS (SELECT a.event_id, min(b.t) AS nt
             FROM a JOIN b ON a.user_id = b.user_id AND b.t >= a.t
             GROUP BY a.event_id)
SELECT a.event_id, a.user_id, a.t,
       CASE WHEN pt IS NOT NULL AND (nt IS NULL OR (a.t - pt) <= (nt - a.t))
            THEN pt ELSE nt END AS nearest_t
FROM a LEFT JOIN prev USING (event_id) LEFT JOIN nxt USING (event_id)
"""


# --------------------------------------------------------------------------
# per-group heavy hitters — top terms per language
# --------------------------------------------------------------------------

def _lang_tokens(sf_dir: str):
    docs = load(sf_dir, "documents", ["lang", "text"])

    def _flat(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text").combine_chunks()), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        return pa.table(
            {
                "lang": batch.column("lang")
                .combine_chunks()
                .take(parent.filter(keep)),
                "tok": flat.filter(keep),
            }
        )

    return docs.map_batches(_flat, batch_format="pyarrow")


def q_text_group_top_terms(sf_dir: str):
    """Top-3 tokens per language by exact count (count desc, token asc
    ties) — grouped heavy hitters via folded-pair `sum_per_key` +
    `topk_per_key`; no per-group UDF at any (lang x term) cardinality."""
    from .extras.stats import group_heavy_hitters

    return group_heavy_hitters(_lang_tokens(sf_dir), "lang", "tok", k=3)


SQL_GROUP_TOP_TERMS = """
WITH tok AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents),
     cnt AS (SELECT lang, tok, count(*) AS n FROM tok WHERE tok <> ''
             GROUP BY lang, tok),
     rk AS (SELECT lang, tok, n,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, tok ASC) AS r
            FROM cnt)
SELECT lang, tok, n FROM rk WHERE r <= 3
"""


# --------------------------------------------------------------------------
# Zipf fit — corpus health diagnostic
# --------------------------------------------------------------------------

ZIPF_TOP = 1000


def q_text_zipf_slope(sf_dir: str):
    """OLS slope of ln(frequency) on ln(rank) over the top-1000 terms — the
    Zipf diagnostic a corpus-intake job runs to spot boilerplate-dominated
    or template-generated crawls (natural text sits near -1). Counts via
    `exact_value_counts`; only the top-1000 (count desc, term asc) rows ever
    reach the driver; the regression runs on floor(1e6*ln(.)) integer
    micro-nats with arbitrary-precision sums, so the single final division
    is the only float op (the unigram_nll exactness pattern)."""
    from .extras.stats import exact_value_counts

    toks = _lang_tokens(sf_dir).select_columns(["tok"])
    top = (
        exact_value_counts(toks, "tok")
        .sort(["n", "tok"], descending=[True, False])
        .limit(ZIPF_TOP)
        .take_all()
    )
    n = np.array([r["n"] for r in top], dtype=np.float64)
    m = len(n)
    rank = np.arange(1, m + 1, dtype=np.float64)
    x = np.floor(1e6 * np.log(rank)).astype(np.int64).tolist()
    y = np.floor(1e6 * np.log(n)).astype(np.int64).tolist()
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    slope = float(m * sxy - sx * sy) / float(m * sxx - sx * sx)
    return pa.table(
        {
            "zipf_slope": pa.array([slope], pa.float64()),
            "n_terms": pa.array([m], pa.int64()),
        }
    )


SQL_ZIPF_SLOPE = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents),
     cnt AS (SELECT tok, count(*) AS n FROM tok WHERE tok <> '' GROUP BY tok),
     top AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS r
             FROM cnt ORDER BY n DESC, tok ASC LIMIT {ZIPF_TOP}),
     pts AS (SELECT CAST(floor(1e6 * ln(r)) AS BIGINT) AS x,
                    CAST(floor(1e6 * ln(n)) AS BIGINT) AS y
             FROM top),
     s AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                  sum(CAST(x AS HUGEINT) * y) AS sxy,
                  sum(CAST(x AS HUGEINT) * x) AS sxx
           FROM pts)
SELECT CAST(m * sxy - sx * sy AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE)
         AS zipf_slope,
       CAST(m AS BIGINT) AS n_terms
FROM s
"""


# --------------------------------------------------------------------------
# robust group outliers — division-free exact 2-sigma cut
# --------------------------------------------------------------------------

def q_stats_group_outliers(sf_dir: str):
    """Orders whose total exceeds mean + 1.5*sigma WITHIN their priority
    group (1.5 because the synthetic totals are near-uniform: mean + 2*sigma
    sits above the max). Exact integer decision: per-group (n, s, ssq)
    partials fold on the driver (priority domain is bounded), the boundary
    ``x > mu + 1.5*sigma  <=>  2*n*x > 2*s + isqrt(9*(n*ssq - s^2))`` is
    derived in arbitrary-precision ints and collapses to ONE broadcast
    int64 threshold per group (x integer => x > T//(2n) is exact) — no
    float sigma anywhere."""
    import math

    orders = load(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").combine_chunks(),
                "o_orderpriority": batch.column("o_orderpriority").combine_chunks(),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)),
                    pa.int64(),
                ),
            }
        )

    o = orders.map_batches(_cents, batch_format="pyarrow").materialize()

    HI = np.int64(1) << np.int64(30)

    def _moments(batch: pa.Table) -> pa.Table:
        # c^2 <= 3.6e15 per row but a block's SUM of squares can pass 2^63 —
        # split each square into (hi, lo) int64 halves so the vectorized
        # per-group sums stay exact; the driver reassembles with bigints
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        c2 = c * c
        g = pa.table(
            {
                "p": batch.column("o_orderpriority").combine_chunks(),
                "c": batch.column("cents").combine_chunks(),
                "c2_hi": pa.array(c2 // HI, pa.int64()),
                "c2_lo": pa.array(c2 % HI, pa.int64()),
            }
        ).group_by(["p"]).aggregate(
            [("c", "sum"), ("c2_hi", "sum"), ("c2_lo", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["p", "s", "ssq_hi", "ssq_lo", "n"])

    # priority domain is bounded (5 values) — driver fold over tiny partials
    stats: dict[str, list[int]] = {}
    for b in o.map_batches(_moments, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for p, s, hi, lo, nn in zip(
            b.column("p").to_pylist(),
            b.column("s").to_pylist(),
            b.column("ssq_hi").to_pylist(),
            b.column("ssq_lo").to_pylist(),
            b.column("n").to_pylist(),
        ):
            cur = stats.setdefault(p, [0, 0, 0])
            cur[0] += s
            cur[1] += hi * (1 << 30) + lo
            cur[2] += nn
    cuts = {
        p: (2 * s + math.isqrt(9 * (nn * ssq - s * s))) // (2 * nn)
        for p, (s, ssq, nn) in stats.items()
    }
    ps = np.array(sorted(cuts))
    cs = np.array([cuts[p] for p in sorted(cuts)], dtype=np.int64)

    def _flag(batch: pa.Table) -> pa.Table:
        pcol = np.asarray(batch.column("o_orderpriority").to_pylist())
        idx = np.searchsorted(ps, pcol)
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c > cs[np.minimum(idx, len(cs) - 1)]))

    return o.map_batches(_flag, batch_format="pyarrow")


SQL_GROUP_OUTLIERS = """
WITH o AS (SELECT o_orderkey, o_orderpriority,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
     m AS (SELECT o_orderpriority, count(*) AS n, sum(cents) AS s,
                  sum(CAST(cents AS HUGEINT) * cents) AS ssq
           FROM o GROUP BY o_orderpriority),
     v AS (SELECT o_orderpriority, n, s,
                  9 * (n * ssq - CAST(s AS HUGEINT) * s) AS d
           FROM m),
     r0 AS (SELECT *, CAST(floor(sqrt(CAST(d AS DOUBLE))) AS HUGEINT) AS r
            FROM v),
     r1 AS (SELECT *, r - CASE WHEN r * r > d THEN 1 ELSE 0 END AS ra
            FROM r0),
     rt AS (SELECT o_orderpriority, n, s,
                   ra + CASE WHEN (ra + 1) * (ra + 1) <= d THEN 1 ELSE 0 END
                     AS isq
            FROM r1),
     cut AS (SELECT o_orderpriority,
                    CAST((2 * s + isq) // (2 * n) AS BIGINT) AS c
             FROM rt)
SELECT o.o_orderkey, o.o_orderpriority, o.cents
FROM o JOIN cut USING (o_orderpriority)
WHERE o.cents > cut.c
"""


# --------------------------------------------------------------------------
# group-mean imputation
# --------------------------------------------------------------------------

def q_impute_group_mean(sf_dir: str):
    """Negative account balances imputed with the nation's truncated
    integer-cent mean of NON-negative balances — the per-group imputation
    shape (fill missing features from group statistics). Nation domain is
    bounded: per-batch (nation, sum, count) partials fold on the driver and
    broadcast as one dict; the fill pass is stateless and vectorized."""
    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey").combine_chunks(),
                "nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "v": pc.cast(
                    pc.round(pc.multiply(batch.column("c_acctbal"), 100.0)),
                    pa.int64(),
                ),
            }
        )

    c = cust.map_batches(_cents, batch_format="pyarrow").materialize()

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater_equal(batch.column("v"), 0))
        g = (
            pa.table(
                {"nk": b.column("nk").combine_chunks(), "v": b.column("v").combine_chunks()}
            )
            .group_by(["nk"])
            .aggregate([("v", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["nk", "s", "n"])

    sums: dict[int, list[int]] = {}
    for b in c.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for nk, s, nn in zip(
            b.column("nk").to_pylist(), b.column("s").to_pylist(), b.column("n").to_pylist()
        ):
            cur = sums.setdefault(nk, [0, 0])
            cur[0] += s
            cur[1] += nn
    means = {nk: s // nn for nk, (s, nn) in sums.items() if nn}
    nks = np.array(sorted(means), dtype=np.int64)
    mvs = np.array([means[k] for k in sorted(means)], dtype=np.int64)

    def _fill(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(nks, nk)
        idx_c = np.minimum(idx, len(nks) - 1) if len(nks) else idx
        have = len(nks) > 0 and nks[idx_c] == nk
        have = have if isinstance(have, np.ndarray) else np.zeros(len(nk), bool)
        fill = np.where(have, mvs[idx_c] if len(mvs) else 0, 0)
        neg = v < 0
        imputed = np.where(neg, fill, v)
        valid = ~(neg & ~have)  # negative balance in a nation with no mean
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey").combine_chunks(),
                "imputed_cents": pa.array(imputed, pa.int64(), mask=~valid),
            }
        )

    return c.map_batches(_fill, batch_format="pyarrow")


SQL_IMPUTE_GROUP_MEAN = """
WITH c AS (SELECT c_custkey, c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS v
           FROM customer),
     m AS (SELECT c_nationkey, CAST(sum(v) // count(*) AS BIGINT) AS mean_v
           FROM c WHERE v >= 0 GROUP BY c_nationkey)
SELECT c.c_custkey,
       CAST(CASE WHEN c.v < 0 THEN m.mean_v ELSE c.v END AS BIGINT)
         AS imputed_cents
FROM c LEFT JOIN m USING (c_nationkey)
"""


# --------------------------------------------------------------------------
# schema-evolution union
# --------------------------------------------------------------------------

def q_union_schema_evolve(sf_dir: str):
    """Two customer shards written by different job versions — v1 (even
    keys, int32 custkey, has acctbal) and v2 (odd keys, int64 custkey, has
    mktsegment) — unioned BY NAME with null-fill and int32->int64
    promotion via `harmonize_union`. The oracle is the union the user
    meant."""
    from .extras.schema import harmonize_union

    def _v1(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("c_custkey"), 1), 0)
        )
        return pa.table(
            {
                "c_custkey": pc.cast(b.column("c_custkey"), pa.int32()),
                "c_name": b.column("c_name").combine_chunks(),
                "c_acctbal": b.column("c_acctbal").combine_chunks(),
            }
        )

    def _v2(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("c_custkey"), 1), 1)
        )
        return b.select(["c_custkey", "c_name", "c_mktsegment"])

    v1 = load(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        _v1, batch_format="pyarrow"
    )
    v2 = load(
        sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(_v2, batch_format="pyarrow")
    return harmonize_union([v1, v2])


SQL_UNION_EVOLVE = """
SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment
FROM customer WHERE c_custkey % 2 = 1
"""


# --------------------------------------------------------------------------
# JSONL sink round-trip
# --------------------------------------------------------------------------

def q_corpus_jsonl_roundtrip(sf_dir: str):
    """documents -> sharded JSONL export (`Dataset.write_json`, the
    interchange format every training stack reads) -> `read_jsonl_documents`
    back -> (doc_id, text). The oracle is the identity: JSON escaping must
    round-trip text exactly, ids must survive as integers."""
    import shutil
    import tempfile

    from .sources.jsonl import read_jsonl_documents

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out_dir = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        docs.write_json(out_dir)
        back = read_jsonl_documents(out_dir).select_columns(["doc_id", "text"])
        return pa.Table.from_pandas(
            back.to_pandas(), preserve_index=False
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_JSONL_ROUNDTRIP = "SELECT doc_id, text FROM documents"


EXTRAS4_REGISTRY.update(
    {
        "join_skew_hot": QueryDef(q_join_skew_hot, SQL_JOIN_SKEW),
        "events_nearest_join": QueryDef(q_events_nearest_join, SQL_NEAREST_JOIN),
        "text_group_top_terms": QueryDef(q_text_group_top_terms, SQL_GROUP_TOP_TERMS),
        "text_zipf_slope": QueryDef(q_text_zipf_slope, SQL_ZIPF_SLOPE),
        "stats_group_outliers": QueryDef(q_stats_group_outliers, SQL_GROUP_OUTLIERS),
        "impute_group_mean": QueryDef(q_impute_group_mean, SQL_IMPUTE_GROUP_MEAN),
        "union_schema_evolve": QueryDef(q_union_schema_evolve, SQL_UNION_EVOLVE),
        "corpus_jsonl_roundtrip": QueryDef(
            q_corpus_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP
        ),
    }
)
