"""Round-4 wave-13/14 operators with DuckDB oracles — the product-analytics,
entity-resolution and clustering family: ordered-step funnels, time-weighted
averages (lead-delta windows), blocked fuzzy record linkage, winsorized group
means, hierarchical ROLLUP aggregates, exact-integer distributed k-means,
cohort retention matrices, last-touch attribution, and grouped correlation
moments. Every query value-gated hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS6_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# ordered-step funnel
# --------------------------------------------------------------------------

FUNNEL = ["view", "click", "purchase"]


def q_events_funnel(sf_dir: str):
    """view -> click -> purchase funnel (strict timestamp order): one narrow
    (user*S+step, ts) min_per_key sort + an edges-only driver fold
    (`extras/funnel.funnel_steps`); event payloads never move."""
    from .extras.funnel import funnel_steps

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return funnel_steps(ev, FUNNEL)


SQL_FUNNEL = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view')     AS t0,
         min(ts) FILTER (WHERE event_type = 'click')    AS t1,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t2
  FROM events GROUP BY user_id)
SELECT 'view' AS step,
       CAST(count(*) FILTER (WHERE t0 IS NOT NULL) AS BIGINT) AS users FROM m
UNION ALL
SELECT 'click',
       CAST(count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0) AS BIGINT) FROM m
UNION ALL
SELECT 'purchase',
       CAST(count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0 AND t2 > t1)
            AS BIGINT) FROM m
"""


# --------------------------------------------------------------------------
# time-weighted average (lead-delta + melted exact-sum)
# --------------------------------------------------------------------------

def q_events_twap(sf_dir: str):
    """Per-user time-weighted value: each event weighted by the whole-second
    gap to the user's NEXT event (`extras/window.keyed_lead_delta`: one
    range sort, 1-row-after halo tasks). The numerator/denominator are
    emitted as exact int64 LONG rows (part='num'/'den') so the division
    never touches floats — one composite-key `sum_per_key`, no pivot."""
    from .extras.graph import sum_per_key
    from .extras.window import keyed_lead_delta

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        u = b.column("user_id").cast(pa.int64())
        mx = pc.max(u).as_py()
        if mx is not None and mx >= (1 << 62):
            raise ValueError("user_id exceeds the 2^62 composite-key bound")
        return pa.table(
            {
                "user_id": u.combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "event_id": b.column("event_id").combine_chunks(),
                "cents": pc.cast(
                    pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    led = keyed_lead_delta(
        ev.map_batches(_cents, batch_format="pyarrow"),
        "user_id",
        "ts",
        "event_id",
        "cents",
    )

    def _melt(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        c = b.column("cents").to_numpy(zero_copy_only=False)
        dt_s = b.column("dt").to_numpy(zero_copy_only=False) // 1_000_000
        return pa.table(
            {
                "k": pa.array(np.concatenate([u * 2, u * 2 + 1]), pa.int64()),
                "v": pa.array(np.concatenate([c * dt_s, dt_s]), pa.int64()),
            }
        )

    summed = sum_per_key(led.map_batches(_melt, batch_format="pyarrow"), "k", "v")

    def _unmelt(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(k >> 1, pa.int64()),
                "part": pc.if_else(
                    pa.array((k & 1) == 0), pa.scalar("num"), pa.scalar("den")
                ),
                "val": b.column("v").combine_chunks(),
            }
        )

    return summed.map_batches(_unmelt, batch_format="pyarrow")


SQL_TWAP = """
WITH w AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS tus,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events)
SELECT user_id, 'num' AS part,
       CAST(sum(cents * ((nxt - tus) // 1000000)) AS BIGINT) AS val
FROM w WHERE nxt IS NOT NULL GROUP BY user_id
UNION ALL
SELECT user_id, 'den', CAST(sum((nxt - tus) // 1000000) AS BIGINT)
FROM w WHERE nxt IS NOT NULL GROUP BY user_id
"""


# --------------------------------------------------------------------------
# blocked fuzzy record linkage
# --------------------------------------------------------------------------

def q_join_fuzzy_names(sf_dir: str):
    """Same-nation customer pairs whose names are within Levenshtein
    distance 1 (`extras/joins.fuzzy_blocked_pairs`): nation-blocked
    candidates, length prefilter, DP vectorized across pairs."""
    from .extras.joins import fuzzy_blocked_pairs

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_name"])
    return fuzzy_blocked_pairs(
        cust, "c_nationkey", "c_custkey", "c_name", max_dist=1
    )


SQL_FUZZY = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# --------------------------------------------------------------------------
# winsorized group mean
# --------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.10, 0.90


def q_stats_group_winsorized(sf_dir: str):
    """Per-segment winsorized balance sum: clip each account balance (cents)
    at the segment's exact p10/p90 (quantile_disc via the distributed
    `group_quantiles`), then one partial-agg pass. The clip bounds are a
    domain-bounded side table (segments x 2) broadcast into the scan —
    the corpus never shuffles for the clip."""
    import ray

    from .extras.stats import group_quantiles

    cust = load(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "seg": b.column("c_mktsegment").combine_chunks(),
                "cents": pc.cast(
                    pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64()
                ),
            }
        )

    cents = cust.map_batches(_cents, batch_format="pyarrow").materialize()
    qs = group_quantiles(cents, "seg", "cents", [WINSOR_LO, WINSOR_HI]).take_all()
    lo = {r["seg"]: r["value"] for r in qs if abs(r["q"] - WINSOR_LO) < 1e-9}
    hi = {r["seg"]: r["value"] for r in qs if abs(r["q"] - WINSOR_HI) < 1e-9}
    bounds = ray.put((lo, hi))

    def _partial(b: pa.Table) -> pa.Table:
        lo_d, hi_d = ray.get(bounds)
        segs = b.column("seg").to_pylist()
        c = b.column("cents").to_numpy(zero_copy_only=False)
        lo_v = np.array([lo_d[s] for s in segs], dtype=np.int64)
        hi_v = np.array([hi_d[s] for s in segs], dtype=np.int64)
        clipped = np.clip(c, lo_v, hi_v)
        t = pa.table(
            {
                "c_mktsegment": pa.array(segs, pa.string()),
                "w": pa.array(clipped, pa.int64()),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate([("w", "sum"), ("w", "count")])
        return g.rename_columns(["c_mktsegment", "win_cents_sum", "n_rows"])

    parts = cents.map_batches(_partial, batch_format="pyarrow").to_pandas()
    agg = (
        parts.groupby("c_mktsegment", as_index=False)
        .agg(win_cents_sum=("win_cents_sum", "sum"), n_rows=("n_rows", "sum"))
    )
    return pa.table(
        {
            "c_mktsegment": pa.array(agg["c_mktsegment"], pa.string()),
            "win_cents_sum": pa.array(agg["win_cents_sum"], pa.int64()),
            "n_rows": pa.array(agg["n_rows"], pa.int64()),
        }
    )


SQL_WINSOR = f"""
WITH c AS (SELECT c_mktsegment AS seg,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
q AS (SELECT seg, quantile_disc(cents, {WINSOR_LO}) AS lo,
             quantile_disc(cents, {WINSOR_HI}) AS hi FROM c GROUP BY seg)
SELECT c.seg AS c_mktsegment,
       CAST(sum(least(greatest(c.cents, q.lo), q.hi)) AS BIGINT)
         AS win_cents_sum,
       CAST(count(*) AS BIGINT) AS n_rows
FROM c JOIN q USING (seg) GROUP BY c.seg
"""


# --------------------------------------------------------------------------
# hierarchical ROLLUP aggregate
# --------------------------------------------------------------------------

def q_agg_rollup_priority(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus) over order totals:
    ONE partial-agg scan produces the finest-level cells (cardinality =
    |priority| x |status|, domain-bounded), and the two coarser rollup
    levels fold from those cells on the driver — subtotal hierarchies never
    need a second corpus pass."""
    orders = load(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p": b.column("o_orderpriority").combine_chunks(),
                "s": b.column("o_orderstatus").combine_chunks(),
                "c": pc.cast(
                    pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()
                ),
            }
        )
        g = t.group_by(["p", "s"]).aggregate([("c", "sum"), ("c", "count")])
        return g.rename_columns(["p", "s", "sum_cents", "n"])

    cells = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["p", "s"], as_index=False)
        .agg(sum_cents=("sum_cents", "sum"), n=("n", "sum"))
    )
    lvl1 = cells.groupby("p", as_index=False).agg(
        sum_cents=("sum_cents", "sum"), n=("n", "sum")
    )
    lvl1["s"] = "ALL"
    total = {
        "p": "ALL",
        "s": "ALL",
        "sum_cents": cells["sum_cents"].sum(),
        "n": cells["n"].sum(),
    }
    import pandas as pd

    out = pd.concat([cells, lvl1, pd.DataFrame([total])], ignore_index=True)
    return pa.table(
        {
            "priority": pa.array(out["p"], pa.string()),
            "status": pa.array(out["s"], pa.string()),
            "sum_cents": pa.array(out["sum_cents"].astype("int64"), pa.int64()),
            "n": pa.array(out["n"].astype("int64"), pa.int64()),
        }
    )


SQL_ROLLUP = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


EXTRAS6_REGISTRY.update(
    {
        "events_funnel": QueryDef(q_events_funnel, SQL_FUNNEL),
        "events_twap": QueryDef(q_events_twap, SQL_TWAP),
        "join_fuzzy_names": QueryDef(q_join_fuzzy_names, SQL_FUZZY),
        "stats_group_winsorized": QueryDef(q_stats_group_winsorized, SQL_WINSOR),
        "agg_rollup_priority": QueryDef(q_agg_rollup_priority, SQL_ROLLUP),
    }
)


# --------------------------------------------------------------------------
# distributed exact-integer k-means (Lloyd)
# --------------------------------------------------------------------------

KM_K, KM_ITERS = 4, 2


def q_embed_kmeans(sf_dir: str):
    """Full-corpus Lloyd k-means, k=4, 2 iterations, exact int64 fixed-point
    arithmetic end to end (`extras/similarity.kmeans_lloyd_int`): every
    iteration is one streaming assignment pass emitting (k x (D+1)) integer
    partials; the oracle unrolls both iterations in SQL and matches every
    centroid component and count hash-exact."""
    from .extras.similarity import kmeans_lloyd_int

    emb = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_lloyd_int(emb, k=KM_K, iters=KM_ITERS)


def _kmeans_sql() -> str:
    # floor division on possibly-negative integer sums, replicated exactly:
    # (s - ((s % n + n) % n)) / n  — the numerator is divisible by n
    fdiv = "CAST((s - ((s % n + n) % n)) / n AS BIGINT)"
    return f"""
WITH e AS (
  SELECT vec_id,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(floor(1000000 * CAST(unnest(embedding) AS DOUBLE)) AS BIGINT) AS q
  FROM embeddings),
ids AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
        FROM embeddings ORDER BY vec_id LIMIT {KM_K}),
c0 AS (SELECT ids.j, e.dim, e.q AS c FROM e JOIN ids USING (vec_id)),
d1 AS (SELECT e.vec_id, c0.j,
              sum((e.q - c0.c) * (e.q - c0.c)) AS dist
       FROM e JOIN c0 USING (dim) GROUP BY e.vec_id, c0.j),
a1 AS (SELECT vec_id, j FROM (
         SELECT vec_id, j,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
         FROM d1) WHERE rn = 1),
s1 AS (SELECT a1.j, e.dim, sum(e.q) AS s, count(*) AS n
       FROM e JOIN a1 USING (vec_id) GROUP BY a1.j, e.dim),
c1 AS (SELECT c0.j, c0.dim,
              coalesce((SELECT {fdiv} FROM s1
                        WHERE s1.j = c0.j AND s1.dim = c0.dim), c0.c) AS c
       FROM c0),
d2 AS (SELECT e.vec_id, c1.j,
              sum((e.q - c1.c) * (e.q - c1.c)) AS dist
       FROM e JOIN c1 USING (dim) GROUP BY e.vec_id, c1.j),
a2 AS (SELECT vec_id, j FROM (
         SELECT vec_id, j,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
         FROM d2) WHERE rn = 1),
s2 AS (SELECT a2.j, e.dim, sum(e.q) AS s, count(*) AS n
       FROM e JOIN a2 USING (vec_id) GROUP BY a2.j, e.dim),
c2 AS (SELECT c1.j, c1.dim,
              coalesce((SELECT {fdiv} FROM s2
                        WHERE s2.j = c1.j AND s2.dim = c1.dim), c1.c) AS c
       FROM c1),
n2 AS (SELECT ids.j, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n
       FROM ids LEFT JOIN (SELECT j, count(*) AS n FROM a2 GROUP BY j) cnt
       USING (j))
SELECT j AS cluster, CAST(-1 AS BIGINT) AS dim, n AS val FROM n2
UNION ALL
SELECT j, dim, c FROM c2
"""


# --------------------------------------------------------------------------
# cohort retention matrix
# --------------------------------------------------------------------------

def q_events_cohort_matrix(sf_dir: str):
    """Daily cohort retention matrix: distinct (user, active-day) pairs
    -> each row stamped with its user's FIRST day
    (`extras/window.keyed_first_broadcast`: sort + carry-chained run scan,
    no join) -> (cohort_day, offset) counts. The corpus shrinks to
    user x days before anything wide runs."""
    from .extras.stats import exact_value_counts
    from .extras.window import keyed_first_broadcast
    from .util import distinct_rows

    ev = load(sf_dir, "events", ["user_id", "ts"])

    _US_PER_DAY = 86_400_000_000

    def _day(b: pa.Table) -> pa.Table:
        tus = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "m": pa.array(tus // _US_PER_DAY, pa.int64()),
            }
        )

    um = distinct_rows(
        ev.map_batches(_day, batch_format="pyarrow"), ["user_id", "m"]
    )
    stamped = keyed_first_broadcast(um, "user_id", "m")

    def _cell(b: pa.Table) -> pa.Table:
        m = b.column("m").to_numpy(zero_copy_only=False)
        f = b.column("first_val").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(f * 4096 + (m - f), pa.int64())})

    cells = exact_value_counts(
        stamped.map_batches(_cell, batch_format="pyarrow"), "k"
    )

    def _unpack(b: pa.Table) -> pa.Table:
        kk = b.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_d": pa.array(kk // 4096, pa.int64()),
                "offset_d": pa.array(kk % 4096, pa.int64()),
                "users": b.column("n").combine_chunks(),
            }
        )

    return cells.map_batches(_unpack, batch_format="pyarrow")


SQL_COHORT = """
WITH um AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS m
            FROM events),
c AS (SELECT user_id, m, min(m) OVER (PARTITION BY user_id) AS cm FROM um)
SELECT cm AS cohort_d, m - cm AS offset_d, CAST(count(*) AS BIGINT) AS users
FROM c GROUP BY cm, m - cm
"""


# --------------------------------------------------------------------------
# last-touch attribution
# --------------------------------------------------------------------------

TOUCHES = ["click", "view"]


def q_events_attribution(sf_dir: str):
    """Last-touch purchase attribution: each purchase credited to the most
    recent strictly-preceding click/view of the same user
    (`extras/window.last_touch_attribution`: one sort, carry-chained
    forward-fill, per-block count vectors)."""
    from .extras.window import last_touch_attribution

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return last_touch_attribution(
        ev, "user_id", "ts", "event_id", "event_type", TOUCHES, "purchase"
    )


SQL_ATTRIBUTION = """
WITH w AS (
  SELECT event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events)
SELECT coalesce(touch, 'none') AS touch, CAST(count(*) AS BIGINT) AS purchases
FROM w WHERE event_type = 'purchase' GROUP BY 1
"""


# --------------------------------------------------------------------------
# grouped correlation moments
# --------------------------------------------------------------------------

def q_stats_group_corr(sf_dir: str):
    """Per-supplier Pearson building blocks for (quantity, price-dollars):
    the six exact integer moments (n, sx, sy, sxx, syy, sxy) melted onto a
    composite key and reduced in ONE `sum_per_key` pass — the correlation
    itself is a driver-side scalar formula per key, so what must be exact
    and distributed is the moments, and that is what the oracle pins."""
    from .extras.graph import sum_per_key

    li = load(sf_dir, "lineitem", ["l_suppkey", "l_quantity", "l_extendedprice"])

    def _melt(b: pa.Table) -> pa.Table:
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (s.max() >= (1 << 59) or s.min() < 0):
            raise ValueError("l_suppkey exceeds the 2^59 composite-key bound")
        x = (
            pc.cast(pc.round(b.column("l_quantity")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        y = (
            pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        base = s * 8
        ks = np.concatenate([base, base + 1, base + 2, base + 3, base + 4, base + 5])
        vs = np.concatenate(
            [np.ones_like(x), x, y, x * x, y * y, x * y]
        )
        return pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.int64())})

    summed = sum_per_key(li.map_batches(_melt, batch_format="pyarrow"), "k", "v")

    def _unmelt(b: pa.Table) -> pa.Table:
        kk = b.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_suppkey": pa.array(kk >> 3, pa.int64()),
                "moment": pa.array(kk & 7, pa.int64()),
                "val": b.column("v").combine_chunks(),
            }
        )

    return summed.map_batches(_unmelt, batch_format="pyarrow")


SQL_GROUP_CORR = """
WITH b AS (SELECT l_suppkey,
                  CAST(round(l_quantity) AS BIGINT) AS x,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem)
SELECT l_suppkey, CAST(0 AS BIGINT) AS moment, CAST(count(*) AS BIGINT) AS val
FROM b GROUP BY l_suppkey
UNION ALL SELECT l_suppkey, 1, CAST(sum(x) AS BIGINT) FROM b GROUP BY l_suppkey
UNION ALL SELECT l_suppkey, 2, CAST(sum(y) AS BIGINT) FROM b GROUP BY l_suppkey
UNION ALL SELECT l_suppkey, 3, CAST(sum(x * x) AS BIGINT) FROM b GROUP BY l_suppkey
UNION ALL SELECT l_suppkey, 4, CAST(sum(y * y) AS BIGINT) FROM b GROUP BY l_suppkey
UNION ALL SELECT l_suppkey, 5, CAST(sum(x * y) AS BIGINT) FROM b GROUP BY l_suppkey
"""


EXTRAS6_REGISTRY.update(
    {
        "embed_kmeans": QueryDef(q_embed_kmeans, _kmeans_sql()),
        "events_cohort_matrix": QueryDef(q_events_cohort_matrix, SQL_COHORT),
        "events_attribution": QueryDef(q_events_attribution, SQL_ATTRIBUTION),
        "stats_group_corr": QueryDef(q_stats_group_corr, SQL_GROUP_CORR),
    }
)


# --------------------------------------------------------------------------
# UPSERT (MERGE INTO) on the materialized triple store
# --------------------------------------------------------------------------

def q_kg_upsert_store(sf_dir: str):
    """SCD-overwrite on the partitioned triple store: a customer graph is
    materialized, then every customer with custkey % 5 == 0 has its
    inSegment value REPLACED with 'MOVED' via `kg/incremental.merge_upsert`
    — only the touched subject-hash partitions rewrite (exact composite-key
    anti-filter, no hash-collision risk). The oracle pins the post-upsert
    triple set."""
    import shutil
    import tempfile

    import ray.data as rd

    from .kg.incremental import merge_upsert
    from .kg.materialize import materialize_triples, read_layout

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def _c(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def _triples(b: pa.Table) -> pa.Table:
        subj = _c(
            pc.binary_join_element_wise(
                "urn:cust:", pc.cast(b.column("c_custkey"), pa.string()), ""
            )
        )
        nat = _c(
            pc.binary_join_element_wise(
                "urn:nation:", pc.cast(b.column("c_nationkey"), pa.string()), ""
            )
        )
        n = b.num_rows
        return pa.table(
            {
                "subj": pa.concat_arrays([subj] * 2),
                "pred": pa.array(["basedIn"] * n + ["inSegment"] * n),
                "obj": pa.concat_arrays(
                    [nat, _c(b.column("c_mktsegment").cast(pa.string()))]
                ),
                "obj_kind": pa.array(["iri"] * n + ["string"] * n),
            }
        )

    def _updates(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(keys % 5 == 0))
        subj = _c(
            pc.binary_join_element_wise(
                "urn:cust:", pc.cast(f.column("c_custkey"), pa.string()), ""
            )
        )
        n = f.num_rows
        return pa.table(
            {
                "subj": subj,
                "pred": pa.array(["inSegment"] * n),
                "obj": pa.array(["MOVED"] * n),
                "obj_kind": pa.array(["string"] * n),
            }
        )

    out = tempfile.mkdtemp(prefix="kg_upsert_")
    try:
        materialize_triples(
            cust.map_batches(_triples, batch_format="pyarrow"),
            out,
            num_partitions=8,
            config={"q": "kg_upsert_store"},
        )
        merge_upsert(
            out,
            cust.map_batches(_updates, batch_format="pyarrow"),
            delta_input="segment-moves",
        )
        kept = (
            read_layout(out, "spo")
            .select_columns(["subj", "pred", "obj", "obj_kind"])
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return kept


SQL_KG_UPSERT = """
WITH t AS (
  SELECT 'urn:cust:' || c_custkey AS subj, 'basedIn' AS pred,
         'urn:nation:' || c_nationkey AS obj, 'iri' AS obj_kind
  FROM customer
  UNION ALL
  SELECT 'urn:cust:' || c_custkey, 'inSegment',
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END,
         'string'
  FROM customer)
SELECT DISTINCT subj, pred, obj, obj_kind FROM t
"""


# --------------------------------------------------------------------------
# windowed (conversion-horizon) funnel
# --------------------------------------------------------------------------

FUNNEL_HORIZON_US = 48 * 3600 * 1_000_000  # 48h conversion window


def q_events_funnel_windowed(sf_dir: str):
    """Greedy windowed funnel (each step within 48 h of the previous matched
    event) — `extras/funnel.funnel_steps_windowed`: narrow melt + one sort +
    vectorized per-block greedy solves with boundary users driver-folded."""
    from .extras.funnel import funnel_steps_windowed

    ev = load(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_steps_windowed(ev, FUNNEL, FUNNEL_HORIZON_US)


SQL_FUNNEL_WINDOWED = f"""
WITH t0 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t1 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN t0 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t0.t
         AND epoch_us(e.ts) <= epoch_us(t0.t) + {FUNNEL_HORIZON_US}
       GROUP BY e.user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN t1 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t1.t
         AND epoch_us(e.ts) <= epoch_us(t1.t) + {FUNNEL_HORIZON_US}
       GROUP BY e.user_id)
SELECT 'view' AS step, CAST(count(*) AS BIGINT) AS users FROM t0
UNION ALL SELECT 'click', CAST(count(*) AS BIGINT) FROM t1
UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM t2
"""


# --------------------------------------------------------------------------
# market-basket pair counts
# --------------------------------------------------------------------------

BASKET_MINSUP = 2


def q_orders_market_basket(sf_dir: str):
    """Part pairs co-purchased in >= 2 distinct orders
    (`extras/joins.grouped_pair_counts`): sorted contiguous-run triangle
    expansion per order (baskets are domain-bounded), packed-key
    `sum_per_key` — no self-join, no duplicate pair stream."""
    from .extras.joins import grouped_pair_counts

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return grouped_pair_counts(
        li, "l_orderkey", "l_partkey", min_support=BASKET_MINSUP
    )


SQL_BASKET = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       CAST(count(*) AS BIGINT) AS n
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING count(*) >= {BASKET_MINSUP}
"""


EXTRAS6_REGISTRY.update(
    {
        "kg_upsert_store": QueryDef(q_kg_upsert_store, SQL_KG_UPSERT),
        "events_funnel_windowed": QueryDef(
            q_events_funnel_windowed, SQL_FUNNEL_WINDOWED
        ),
        "orders_market_basket": QueryDef(q_orders_market_basket, SQL_BASKET),
    }
)


# --------------------------------------------------------------------------
# data-quality audit (violations, not booleans)
# --------------------------------------------------------------------------

def q_dq_lineitem_audit(sf_dir: str):
    """Ingest-gate audit over lineitem (`extras/dq`): referential orphans
    against a deliberately STALE supplier dimension (first half of suppliers
    — the realistic failure: facts arrive before the dim refresh), duplicate
    primary keys on (orderkey, linenumber) folded to one int64, and
    null/NaN completeness of the measure columns. One summary row per
    check; every count exact vs the SQL oracle."""
    import ray.data as rd

    from .extras.dq import fk_orphans, null_profile, pk_duplicates

    li = load(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "l_extendedprice"],
    )
    sup = load(sf_dir, "supplier", ["s_suppkey"])
    half = sup.map_batches(
        lambda b: b.filter(
            pa.array(
                b.column("s_suppkey").to_numpy(zero_copy_only=False)
                % 2
                == 0
            )
        ),
        batch_format="pyarrow",
    )
    n_orphans = fk_orphans(li, "l_suppkey", half, "s_suppkey").count()

    def _pk(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = b.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(ok * 8 + ln, pa.int64())})

    n_dup_pk = pk_duplicates(
        li.map_batches(_pk, batch_format="pyarrow"), "pk"
    ).count()

    prof = null_profile(li, ["l_quantity", "l_extendedprice"])
    rows = [("fk_orphans", n_orphans), ("dup_pk", n_dup_pk)]
    for r in prof.to_pylist():
        rows.append((f"null_{r['column']}", r["n_null"]))
    return pa.table(
        {
            "check": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([int(r[1]) for r in rows], pa.int64()),
        }
    )


SQL_DQ_AUDIT = """
SELECT 'fk_orphans' AS check, CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE l_suppkey NOT IN
  (SELECT s_suppkey FROM supplier WHERE s_suppkey % 2 = 0)
UNION ALL
SELECT 'dup_pk', CAST(count(*) AS BIGINT) FROM (
  SELECT l_orderkey * 8 + l_linenumber AS pk FROM lineitem
  GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'null_l_quantity', CAST(count(*) FILTER (
  WHERE l_quantity IS NULL OR isnan(l_quantity)) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'null_l_extendedprice', CAST(count(*) FILTER (
  WHERE l_extendedprice IS NULL OR isnan(l_extendedprice)) AS BIGINT)
FROM lineitem
"""


# --------------------------------------------------------------------------
# exact weighted median per group
# --------------------------------------------------------------------------

def q_stats_weighted_median(sf_dir: str):
    """Per-returnflag weighted median price (weight = quantity), exact lower
    median: smallest value whose cumulative weight reaches half the group
    total (`extras/dq.weighted_median_per_group`: one (group, value) sort,
    reduceat weight partials, carry-chained threshold resolve)."""
    from .extras.dq import weighted_median_per_group

    li = load(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag").combine_chunks(),
                "v": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                ),
                "w": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
            }
        )

    return weighted_median_per_group(
        li.map_batches(_prep, batch_format="pyarrow"), "l_returnflag", "v", "w"
    )


SQL_WEIGHTED_MEDIAN = """
WITH b AS (SELECT l_returnflag AS g,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                  CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem),
c AS (SELECT g, v, w,
             sum(w) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(w) OVER (PARTITION BY g) AS tot FROM b)
SELECT g AS l_returnflag, CAST(min(v) AS BIGINT) AS wmedian
FROM c WHERE 2 * cum >= tot GROUP BY g
"""


EXTRAS6_REGISTRY.update(
    {
        "dq_lineitem_audit": QueryDef(q_dq_lineitem_audit, SQL_DQ_AUDIT),
        "stats_weighted_median": QueryDef(
            q_stats_weighted_median, SQL_WEIGHTED_MEDIAN
        ),
    }
)
