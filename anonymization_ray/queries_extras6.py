"""Round-4 wave-13 operators with DuckDB oracles — the product-analytics and
entity-resolution family: ordered-step funnels, time-weighted averages
(lead-delta windows), blocked fuzzy record linkage, winsorized group means,
and hierarchical ROLLUP aggregates. Every query value-gated hash-exact.
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
