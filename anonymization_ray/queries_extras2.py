"""Round-4 wave-6 relational / analytics operators with DuckDB oracles.

Widens the TPC-H join-tree coverage (Q6/Q12/Q13/Q14/Q18/Q22 shapes), adds
set operations, grouped exact distinct, and a crosstab pivot — every query
Ray-Data-first (partial combiners, broadcast dimension lookups, sort-scan
reductions; Ray hash joins only where BOTH sides are fact-scale) and every
query value-gated by an exact integer-unit SQL oracle.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS2_REGISTRY: dict[str, QueryDef] = {}


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """round(x*100) as int64 — the repo-wide exact-money convention."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


# --------------------------------------------------------------------------
# TPC-H Q6: forecast revenue change — pure filter + one-pass integer sum
# --------------------------------------------------------------------------

def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape: revenue effect of dropping small discounts — a
    pruned 4-column read, a vectorized predicate, and ONE streaming int64
    partial-sum fold (revenue in 1e-4 dollar units: cents x discount-%).
    No shuffle at any scale; the whole query is read-bandwidth."""
    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1997, 1, 1), pa.timestamp("us"))
    ds = load(
        sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        disc_c = _cents(b.column("l_discount"))
        mask = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi),
                ),
                pc.and_(pc.greater_equal(disc_c, 2), pc.less_equal(disc_c, 9)),
            ),
            pc.less(b.column("l_quantity"), 24.0),
        )
        t = b.filter(mask)
        rev = pc.multiply(
            _cents(t.column("l_extendedprice")), _cents(t.column("l_discount"))
        )
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_u": pa.array([s], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    total = sum(r["revenue_u"] for r in parts)
    return pa.table({"revenue_u": pa.array([total], pa.int64())})


SQL_TPCH_Q6 = """
SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_u
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 2 AND 9
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q14: promotion revenue share — broadcast dimension, one fact scan
# --------------------------------------------------------------------------

def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape: share of March-1996 revenue from PROMO parts.
    ``part`` is dimension-scale, so its (p_partkey, is_promo) projection is
    gathered bounded and broadcast (searchsorted membership inside the fact
    scan) — the lineitem stream NEVER shuffles. Revenue in 1e-4 dollar
    units ep_c*(100-disc_c); the share is an integer micro-fraction so both
    engines compute bit-identical values."""
    import ray

    part = load(sf_dir, "part", ["p_partkey", "p_type"])

    def _dim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": b.column("p_partkey").combine_chunks(),
                "promo": pc.cast(
                    pc.equal(b.column("p_type"), "PROMO"), pa.int8()
                ),
            }
        )

    dim = pa.concat_tables(
        [t for t in ray.get(part.map_batches(_dim, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows]
    )
    order = pc.sort_indices(dim.column("pk"))
    pks = dim.column("pk").take(order).to_numpy()
    promo = dim.column("promo").take(order).to_numpy().astype(bool)
    pk_ref = ray.put(pks)
    promo_ref = ray.put(promo)

    lo = pa.scalar(_dt.datetime(1996, 3, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), pa.timestamp("us"))
    li = load(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def _partial(b: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        is_promo = ray.get(promo_ref)
        t = b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        )
        rev = pc.multiply(
            _cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t.column("l_discount"))),
        ).to_numpy(zero_copy_only=False)
        pkv = t.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pkv)
        pos = np.clip(pos, 0, len(keys) - 1)
        hit = (len(keys) > 0) & (keys[pos] == pkv)
        pm = np.where(hit & is_promo[pos], rev, 0)
        return pa.table(
            {
                "promo_u": pa.array([int(pm.sum())], pa.int64()),
                "total_u": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = li.map_batches(_partial, batch_format="pyarrow").take_all()
    promo_u = sum(r["promo_u"] for r in parts)
    total_u = sum(r["total_u"] for r in parts)
    pct = (1_000_000 * promo_u) // total_u if total_u else 0
    return pa.table(
        {
            "promo_revenue_u": pa.array([promo_u], pa.int64()),
            "total_revenue_u": pa.array([total_u], pa.int64()),
            "promo_pct_micro": pa.array([pct], pa.int64()),
        }
    )


SQL_TPCH_Q14 = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
         (p.p_type = 'PROMO') AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
SELECT CAST(COALESCE(sum(CASE WHEN is_promo THEN rev_u END), 0) AS BIGINT)
         AS promo_revenue_u,
       CAST(COALESCE(sum(rev_u), 0) AS BIGINT) AS total_revenue_u,
       CAST(CASE WHEN COALESCE(sum(rev_u), 0) = 0 THEN 0
                 ELSE (1000000 * COALESCE(sum(CASE WHEN is_promo THEN rev_u END), 0))
                      // sum(rev_u) END AS BIGINT) AS promo_pct_micro
FROM f
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape: late-shipment priority counts — fact x fact hash join
# --------------------------------------------------------------------------

def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (no l_shipmode column in this corpus, so the split
    is by l_linestatus): lineitems shipped > 60 days after their order
    date, counted per linestatus into high-priority (1-URGENT/2-HIGH) vs
    low-priority orders. Orders and lineitem are BOTH fact-scale — this is
    the one query family where a Ray-native hash-partitioned join is the
    right shape (pre-projected to 3 and 3 columns before the shuffle).
    The post-join aggregate domain is tiny: per-batch Arrow group_by
    partials fold on the driver."""
    from .util import hash_join

    ords = load(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = load(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_linestatus"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_shipdate", "l_linestatus"]),
        batch_format="pyarrow",
    )
    joined = hash_join(li, ords, on="o_orderkey", join_type="inner")
    late_us = 60 * 86400 * 1_000_000

    def _partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b.column("l_shipdate"), pa.int64())
        odate = pc.cast(b.column("o_orderdate"), pa.int64())
        late = pc.greater(pc.subtract(ship, odate), late_us)
        t = b.filter(late)
        hi = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        tt = pa.table(
            {
                "l_linestatus": t.column("l_linestatus").combine_chunks(),
                "high_line_count": pc.cast(hi, pa.int64()),
                "low_line_count": pc.cast(pc.invert(hi), pa.int64()),
            }
        )
        g = tt.group_by(["l_linestatus"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        return g.rename_columns(["l_linestatus", "high_line_count", "low_line_count"])

    parts = joined.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["l_linestatus"], [0, 0])
        a[0] += r["high_line_count"]
        a[1] += r["low_line_count"]
    keys = sorted(acc)
    return pa.table(
        {
            "l_linestatus": pa.array(keys, pa.string()),
            "high_line_count": pa.array([acc[k][0] for k in keys], pa.int64()),
            "low_line_count": pa.array([acc[k][1] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution
# --------------------------------------------------------------------------

def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING zero-order customers. Per-customer counts via the sort-scan
    ``sum_per_key`` (never a high-cardinality Ray groupby); the zero bucket
    is two cheap counts (|customer| − |distinct custkeys in orders|) — the
    left-outer join the SQL writes never needs to move the fact table."""
    from .extras.graph import sum_per_key
    from .extras.stats import exact_value_counts

    ords = load(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("o_custkey").combine_chunks(),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    percust = sum_per_key(ords, "o_custkey", "one").materialize()
    n_with_orders = percust.count()
    n_customers = load(sf_dir, "customer", ["c_custkey"]).count()
    dist = exact_value_counts(percust, "one").take_all()
    rows = [(int(r["one"]), int(r["n"])) for r in dist]
    zero = n_customers - n_with_orders
    if zero > 0:
        rows.append((0, zero))
    rows.sort()
    return pa.table(
        {
            "c_count": pa.array([r[0] for r in rows], pa.int64()),
            "custdist": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders
# --------------------------------------------------------------------------

def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 shape: top-100 orders whose total quantity exceeds 150.
    Per-order quantity via sort-scan ``sum_per_key``; the HAVING filter
    shrinks the qualifying set to a tiny fraction, which is then BROADCAST
    into the orders scan (searchsorted membership — the orders fact table
    never shuffles); customer names attach from the dimension-scale
    broadcast lookup. Final sort/limit is over the bounded survivor set."""
    import ray

    from .extras.graph import sum_per_key

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey").combine_chunks(),
                "qty_c": _cents(b.column("l_quantity")),
            }
        ),
        batch_format="pyarrow",
    )
    perorder = sum_per_key(li, "l_orderkey", "qty_c")
    big = perorder.map_batches(
        lambda b: b.filter(pc.greater(b.column("qty_c"), 15_000)),
        batch_format="pyarrow",
    )
    blocks = [t for t in ray.get(big.to_arrow_refs()) if t.num_rows]
    big_tbl = (
        pa.concat_tables(blocks)
        if blocks
        else pa.table({"l_orderkey": pa.array([], pa.int64()), "qty_c": pa.array([], pa.int64())})
    )
    if big_tbl.num_rows == 0:
        return pa.table(
            {
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_totalprice_c": pa.array([], pa.int64()),
                "sum_qty_c": pa.array([], pa.int64()),
            }
        )
    order = pc.sort_indices(big_tbl.column("l_orderkey"))
    ok_keys = big_tbl.column("l_orderkey").take(order).to_numpy()
    ok_qty = big_tbl.column("qty_c").take(order).to_numpy()
    keys_ref = ray.put(ok_keys)
    qty_ref = ray.put(ok_qty)

    cust = {
        r["c_custkey"]: r["c_name"]
        for r in load(sf_dir, "customer", ["c_custkey", "c_name"]).take_all()
    }
    cust_ref = ray.put(cust)

    ords = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def _attach(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        qty = ray.get(qty_ref)
        names = ray.get(cust_ref)
        okv = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, okv)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        hit = (len(keys) > 0) & (keys[pos_c] == okv)
        t = b.filter(pa.array(hit))
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_name": pa.array([], pa.string()),
                    "c_custkey": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "o_totalprice_c": pa.array([], pa.int64()),
                    "sum_qty_c": pa.array([], pa.int64()),
                }
            )
        okv2 = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        q = qty[np.searchsorted(keys, okv2)]
        ck = t.column("o_custkey").to_pylist()
        return pa.table(
            {
                "c_name": pa.array([names.get(c) for c in ck], pa.string()),
                "c_custkey": t.column("o_custkey").combine_chunks(),
                "o_orderkey": t.column("o_orderkey").combine_chunks(),
                "o_orderdate": t.column("o_orderdate").combine_chunks(),
                "o_totalprice_c": _cents(t.column("o_totalprice")),
                "sum_qty_c": pa.array(q, pa.int64()),
            }
        )

    out = ords.map_batches(_attach, batch_format="pyarrow")
    return out.sort(
        ["o_totalprice_c", "o_orderdate", "o_orderkey"],
        descending=[True, False, False],
    ).limit(100)


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 15000)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_c, sum_qty_c
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice_c DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape: global sales opportunity
# --------------------------------------------------------------------------

def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 shape: per nation, count + total balance of customers whose
    balance beats the (integer-cent) average positive balance and who have
    not ordered since 1999 (this corpus's order coverage is dense, so the
    classic "never ordered" predicate is vacuous — the recency cut keeps
    the anti join non-trivial). The scalar average is two streaming folds
    broadcast into the scan; the no-recent-orders test is the broadcast
    ANTI join (orders' distinct custkeys ARE customer-scale, the documented
    semi-join contract); the final aggregate domain is the 25-nation grid."""
    from .extras.joins import semi_anti_join

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def _posfold(b: pa.Table) -> pa.Table:
        bal = _cents(b.column("c_acctbal"))
        pos = pc.greater(bal, 0)
        s = pc.sum(pc.if_else(pos, bal, pa.scalar(0, pa.int64()))).as_py() or 0
        n = pc.sum(pc.cast(pos, pa.int64())).as_py() or 0
        return pa.table({"s": pa.array([s], pa.int64()), "n": pa.array([n], pa.int64())})

    folds = cust.map_batches(_posfold, batch_format="pyarrow").take_all()
    s_pos = sum(r["s"] for r in folds)
    n_pos = sum(r["n"] for r in folds)
    avg_c = s_pos // n_pos if n_pos else 0

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(_cents(b.column("c_acctbal")), avg_c)),
        batch_format="pyarrow",
    )
    cut = pa.scalar(_dt.datetime(1999, 1, 1), pa.timestamp("us"))
    recent = load(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("o_orderdate"), cut)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    no_orders = semi_anti_join(
        rich, recent, on="c_custkey", right_on="o_custkey", anti=True,
    )

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "numcust": pa.array(np.ones(b.num_rows, np.int64)),
                "totacctbal_c": _cents(b.column("c_acctbal")),
            }
        )
        g = t.group_by(["c_nationkey"]).aggregate(
            [("numcust", "sum"), ("totacctbal_c", "sum")]
        )
        return g.rename_columns(["c_nationkey", "numcust", "totacctbal_c"])

    parts = no_orders.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[int, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["c_nationkey"], [0, 0])
        a[0] += r["numcust"]
        a[1] += r["totacctbal_c"]
    keys = sorted(acc)
    return pa.table(
        {
            "c_nationkey": pa.array(keys, pa.int64()),
            "numcust": pa.array([acc[k][0] for k in keys], pa.int64()),
            "totacctbal_c": pa.array([acc[k][1] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q22 = """
WITH t AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
     a AS (SELECT sum(bal_c) // count(*) AS avg_c FROM t WHERE bal_c > 0)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
FROM t, a
WHERE bal_c > avg_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# set operations: INTERSECT / EXCEPT over distinct key sets
# --------------------------------------------------------------------------

def q_set_nations(sf_dir: str):
    """Set algebra between two distinct key sets (nations with customers vs
    nations with suppliers): each side reduces distributed via per-block
    unique partials + sort-scan DISTINCT; the tagging join runs on the
    driver over the domain-bounded result (nation grid, ≤25 rows) — the
    INTERSECT/EXCEPT family without moving either fact table."""
    from .util import distinct_rows

    def _keys(tbl: str, col: str):
        ds = load(sf_dir, tbl, [col]).map_batches(
            lambda b, c=col: pa.table({"nk": pc.cast(b.column(c), pa.int64())}),
            batch_format="pyarrow",
        )
        return {r["nk"] for r in distinct_rows(ds, ["nk"]).take_all()}

    c, s = _keys("customer", "c_nationkey"), _keys("supplier", "s_nationkey")
    rows = sorted(
        [(k, "both") for k in c & s]
        + [(k, "cust_only") for k in c - s]
        + [(k, "supp_only") for k in s - c]
    )
    return pa.table(
        {
            "nationkey": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
        }
    )


SQL_SET_NATIONS = """
WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk FROM customer),
     s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       CASE WHEN c.nk IS NOT NULL AND s.nk IS NOT NULL THEN 'both'
            WHEN c.nk IS NOT NULL THEN 'cust_only' ELSE 'supp_only' END AS op
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


# --------------------------------------------------------------------------
# grouped exact COUNT(DISTINCT)
# --------------------------------------------------------------------------

def q_stats_group_distinct(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: sort-scan DISTINCT over
    the (type, user) pair stream (works at any pair cardinality — never a
    Ray groupby), then per-block count partials folded over the tiny type
    domain."""
    from .util import distinct_rows

    ev = load(sf_dir, "events", ["event_type", "user_id"])
    pairs = distinct_rows(ev, ["event_type", "user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n_users"])

    parts = pairs.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[str, int] = {}
    for r in parts:
        acc[r["event_type"]] = acc.get(r["event_type"], 0) + r["n_users"]
    keys = sorted(acc)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_users": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


SQL_STATS_GROUP_DISTINCT = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# crosstab pivot: nation x market segment
# --------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q_agg_crosstab(sf_dir: str):
    """Crosstab (PIVOT) of customer counts: one row per nation, one column
    per market segment. One pass of per-batch conditional-count partials
    (Arrow group_by on the nation key), folded over the bounded
    nation-grid domain — the horizontal pivot is free in columnar form."""
    cust = load(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64())}
        for seg in _SEGMENTS:
            cols[f"n_{seg.lower()}"] = pc.cast(
                pc.equal(b.column("c_mktsegment"), seg), pa.int64()
            )
        t = pa.table(cols)
        g = t.group_by(["c_nationkey"]).aggregate(
            [(f"n_{s.lower()}", "sum") for s in _SEGMENTS]
        )
        return g.rename_columns(["c_nationkey"] + [f"n_{s.lower()}" for s in _SEGMENTS])

    parts = cust.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[int, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["c_nationkey"], [0] * len(_SEGMENTS))
        for i, seg in enumerate(_SEGMENTS):
            a[i] += r[f"n_{seg.lower()}"]
    keys = sorted(acc)
    out = {"c_nationkey": pa.array(keys, pa.int64())}
    for i, seg in enumerate(_SEGMENTS):
        out[f"n_{seg.lower()}"] = pa.array([acc[k][i] for k in keys], pa.int64())
    return pa.table(out)


SQL_AGG_CROSSTAB = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n_automobile,
       CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
       CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS n_furniture,
       CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS n_household,
       CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n_machinery
FROM customer GROUP BY c_nationkey
"""


EXTRAS2_REGISTRY.update(
    {
        "tpch_q6_forecast": QueryDef(q_tpch_q6, SQL_TPCH_Q6),
        "tpch_q14_promo": QueryDef(q_tpch_q14, SQL_TPCH_Q14),
        "tpch_q12_late_priority": QueryDef(q_tpch_q12, SQL_TPCH_Q12),
        "tpch_q13_custdist": QueryDef(q_tpch_q13, SQL_TPCH_Q13),
        "tpch_q18_large_orders": QueryDef(q_tpch_q18, SQL_TPCH_Q18),
        "tpch_q22_global": QueryDef(q_tpch_q22, SQL_TPCH_Q22),
        "set_nations": QueryDef(q_set_nations, SQL_SET_NATIONS),
        "stats_group_distinct": QueryDef(q_stats_group_distinct, SQL_STATS_GROUP_DISTINCT),
        "agg_crosstab": QueryDef(q_agg_crosstab, SQL_AGG_CROSSTAB),
    }
)


# --------------------------------------------------------------------------
# microaggregation (classic SDC: k-member groups along sorted order)
# --------------------------------------------------------------------------

def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (DuckDB's ``//`` on signed
    ints truncates; Python's floors — they differ on negative sums)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def q_anonymize_microagg(sf_dir: str, k: int = 10):
    """Microaggregation of c_acctbal (fixed group size k along the sorted
    order, remainder merged into the last group; every value replaced by
    its group's truncated-cent mean) — the classic microdata-protection
    operator (Domingo-Ferrer & Mateo-Sanz 2002 fixed-size variant).

    The total order is the repo's narrow (value, id) distributed sort
    (``util.sorted_column``); group ids stamp vectorized from each block's
    rank offset (single-int metadata, no data exchange); group sums come
    from the sort-scan ``sum_per_key``; group sizes are CLOSED-FORM (k, and
    k + n % k for the last group), so the mean needs no second count pass.
    The mean re-attaches through a hash join on the bounded group id."""
    import ray

    from .extras.graph import sum_per_key
    from .util import hash_join, sorted_column

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "bal_c": _cents(b.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
    )
    sc = sorted_column(cust, "bal_c", "c_custkey", lambda a: a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    n = sc.total
    last_grp = n // k - 1  # n < k degenerates to one group id -1 on BOTH sides

    @ray.remote(num_cpus=0.25)
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        ranks = np.arange(off, off + t.num_rows, dtype=np.int64)
        grp = np.minimum(ranks // k, last_grp)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").combine_chunks(),
                "bal_c": t.column("bal_c").combine_chunks(),
                "grp": pa.array(grp, pa.int64()),
            }
        )

    stamped = (
        ray.data.from_arrow_refs(
            [_stamp.remote(r, int(o)) for r, o in zip(sc.refs, sc.offsets[:-1])]
        )
        if sc.refs
        else None
    )
    if stamped is None or n == 0:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()), "microagg_bal_c": pa.array([], pa.int64())}
        )
    sums = sum_per_key(stamped.select_columns(["grp", "bal_c"]), "grp", "bal_c")

    def _mean(b: pa.Table) -> pa.Table:
        g = b.column("grp").to_numpy(zero_copy_only=False)
        s = b.column("bal_c").to_numpy(zero_copy_only=False)
        size = np.where(g == last_grp, k + n % k, k) if last_grp >= 0 else np.full(len(g), n)
        mean = np.fromiter(
            (_tdiv(int(a), int(c)) for a, c in zip(s, size)), np.int64, len(g)
        )
        return pa.table({"grp": b.column("grp").combine_chunks(), "microagg_bal_c": pa.array(mean, pa.int64())})

    means = sums.map_batches(_mean, batch_format="pyarrow")
    out = hash_join(stamped.select_columns(["c_custkey", "grp"]), means, on="grp", join_type="inner")
    return out.select_columns(["c_custkey", "microagg_bal_c"])


SQL_ANONYMIZE_MICROAGG = """
WITH t AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
     r AS (SELECT c_custkey, bal_c,
                  row_number() OVER (ORDER BY bal_c, c_custkey) - 1 AS rn,
                  count(*) OVER () AS n
           FROM t),
     g AS (SELECT c_custkey, bal_c, least(rn // 10, n // 10 - 1) AS grp FROM r),
     m AS (SELECT grp, CAST(sum(bal_c) // count(*) AS BIGINT) AS microagg_bal_c
           FROM g GROUP BY grp)
SELECT g.c_custkey, m.microagg_bal_c FROM g JOIN m USING (grp)
"""


# --------------------------------------------------------------------------
# winsorization (top/bottom coding at exact p05/p95)
# --------------------------------------------------------------------------

def q_anonymize_winsorize(sf_dir: str):
    """Top/bottom coding (winsorization): clamp c_acctbal at the EXACT
    discrete p05/p95 (DuckDB quantile_disc semantics via the narrow-sort
    rank lookups), broadcast as two scalars into ONE streaming clamp pass —
    the outlier-suppression generalization used before microdata release."""
    from .extras.stats import exact_quantiles

    cents = load(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "bal_c": _cents(b.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
    )
    qt = exact_quantiles(cents, "bal_c", [0.05, 0.95], id_col="c_custkey")
    lo, hi = qt.column("value")[0].as_py(), qt.column("value")[1].as_py()
    return cents.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "bal_w_c": pc.min_element_wise(
                    pc.max_element_wise(b.column("bal_c"), pa.scalar(lo, pa.int64())),
                    pa.scalar(hi, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_ANONYMIZE_WINSORIZE = """
WITH t AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
     q AS (SELECT quantile_disc(bal_c, 0.05) AS lo, quantile_disc(bal_c, 0.95) AS hi FROM t)
SELECT c_custkey, CAST(least(greatest(bal_c, lo), hi) AS BIGINT) AS bal_w_c FROM t, q
"""


# --------------------------------------------------------------------------
# binomial-noise DP counts (the binomial mechanism shape)
# --------------------------------------------------------------------------

def q_dp_binomial_counts(sf_dir: str, seed: int = 7):
    """Noisy group counts under the binomial mechanism (Dwork et al. 2006
    shape): noise = Binomial(64, 1/2) − 32 ≈ N(0, 16), drawn as the popcount
    of a seeded md5-64 of the group key — fully deterministic given the
    seed, so the mechanism itself is value-exact against SQL (DuckDB
    ``bit_count(md5_number_upper(...))``). Counting is one partial-combiner
    pass; noise is O(domain) driver work."""
    from .extras.dedup import _md5_64

    ev = load(sf_dir, "events", ["event_type"])

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n"])

    parts = ev.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[str, int] = {}
    for r in parts:
        acc[r["event_type"]] = acc.get(r["event_type"], 0) + r["n"]
    keys = sorted(acc)
    noisy = [
        acc[k] + bin(_md5_64(f"dpbin{seed}|{k}")).count("1") - 32 for k in keys
    ]
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "noisy_count": pa.array(noisy, pa.int64()),
        }
    )


SQL_DP_BINOMIAL = """
SELECT event_type,
       CAST(count(*) + bit_count(CAST(md5_number_upper('dpbin7|' || event_type)
                                      AS UBIGINT)) - 32 AS BIGINT) AS noisy_count
FROM events GROUP BY event_type
"""


EXTRAS2_REGISTRY.update(
    {
        "anonymize_microagg": QueryDef(q_anonymize_microagg, SQL_ANONYMIZE_MICROAGG),
        "anonymize_winsorize": QueryDef(q_anonymize_winsorize, SQL_ANONYMIZE_WINSORIZE),
        "dp_binomial_counts": QueryDef(q_dp_binomial_counts, SQL_DP_BINOMIAL),
    }
)


# --------------------------------------------------------------------------
# ordered per-key string aggregation (user event paths)
# --------------------------------------------------------------------------

def q_events_user_path(sf_dir: str):
    """Per-user ordered event path (``string_agg(event_type, '->' ORDER BY
    ts, event_id)``): ONE range sort by (user, ts, id); users complete
    inside a block concatenate there (boundary-scan run detection, one
    ``str.join`` per user); only each block's FIRST and LAST key runs are
    sent to the driver (2 fragments per block, single-digit KBs), where
    spanning users merge in block order. Per-user path length is bounded by
    that user's event count — the documented hot-key caveat."""
    import ray

    from .util import coalesce_blocks

    ev = load(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    from .util import string_agg_per_key

    return string_agg_per_key(
        ev, "user_id", "event_type", sep="->",
        order_cols=["ts", "event_id"], out_col="path",
    )


SQL_EVENTS_USER_PATH = """
SELECT user_id, string_agg(event_type, '->' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# HITS hubs/authorities (integer, unnormalized, fixed rounds)
# --------------------------------------------------------------------------

def q_graph_hits(sf_dir: str):
    """HITS over the bipartite supplier→part graph from distinct lineitem
    pairs: two mutual-reinforcement rounds in EXACT integers (h₀=1;
    a=Σ h over in-edges, h=Σ a over out-edges — unnormalized, so both
    engines stay in int64; magnitudes grow as degree² per round, bounded
    by E·deg³ « 2⁶³ at any tested scale). Each half-round is one edge-sized
    hash join + one sort-scan ``sum_per_key`` — the PageRank cost profile.
    Oracle: the recurrence unrolled in SQL."""
    from .extras.graph import sum_per_key
    from .util import distinct_rows, hash_join

    li = load(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]).map_batches(
        lambda b: pa.table(
            {
                "s": b.column("l_suppkey").combine_chunks(),
                "d": b.column("l_partkey").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    edges = distinct_rows(li, ["s", "d"]).materialize()

    # round 1: h0 = 1  =>  a1(d) = in-degree
    a1 = sum_per_key(
        edges.map_batches(
            lambda b: pa.table(
                {"d": b.column("d").combine_chunks(), "v": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "d",
        "v",
    ).materialize()
    # h1(s) = sum over out-edges of a1(d)
    h1 = sum_per_key(
        hash_join(edges, a1, on="d", join_type="inner"), "s", "v"
    ).materialize()
    # round 2
    a2 = sum_per_key(
        hash_join(edges, h1.rename_columns({"v": "h"}), on="s", join_type="inner"),
        "d",
        "h",
    ).materialize()
    h2 = sum_per_key(
        hash_join(edges, a2.rename_columns({"h": "a"}), on="d", join_type="inner"),
        "s",
        "a",
    )

    hubs = h2.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("s").combine_chunks(),
                "score": pc.cast(b.column("a"), pa.int64()),
                "role": pa.array(["hub"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    auths = a2.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("d").combine_chunks(),
                "score": pc.cast(b.column("h"), pa.int64()),
                "role": pa.array(["auth"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return hubs.union(auths)


SQL_GRAPH_HITS = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS d FROM lineitem),
a1 AS (SELECT d, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY d),
h1 AS (SELECT s, CAST(sum(a1.a) AS BIGINT) AS h FROM e JOIN a1 USING (d) GROUP BY s),
a2 AS (SELECT d, CAST(sum(h1.h) AS BIGINT) AS a FROM e JOIN h1 USING (s) GROUP BY d),
h2 AS (SELECT s, CAST(sum(a2.a) AS BIGINT) AS h FROM e JOIN a2 USING (d) GROUP BY s)
SELECT s AS node, h AS score, 'hub' AS role FROM h2
UNION ALL
SELECT d AS node, a AS score, 'auth' AS role FROM a2
"""


# --------------------------------------------------------------------------
# TPC-H Q15: top supplier by quarterly revenue
# --------------------------------------------------------------------------

def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape: supplier(s) with the maximum Q1-1996 revenue.
    Per-supplier revenue via ONE filtered partial-combiner pass + sort-scan
    ``sum_per_key``; the global max is a streaming fold; the equality
    filter re-reads only the bounded revenue stream. Ties all surface
    (exactly the SQL's = max semantics)."""
    import ray

    from .extras.graph import sum_per_key

    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), pa.timestamp("us"))
    li = load(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def _proj(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        )
        rev = pc.multiply(
            _cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t.column("l_discount"))),
        )
        return pa.table({"l_suppkey": t.column("l_suppkey").combine_chunks(), "rev_u": rev})

    per_supp = sum_per_key(
        li.map_batches(_proj, batch_format="pyarrow"), "l_suppkey", "rev_u"
    ).materialize()
    mx = per_supp.map_batches(
        lambda b: pa.table(
            {"m": pa.array([pc.max(b.column("rev_u")).as_py() or 0], pa.int64())}
        ),
        batch_format="pyarrow",
    ).take_all()
    best = max((r["m"] for r in mx), default=0)
    return per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("rev_u"), best)).rename_columns(
            ["l_suppkey", "total_revenue_u"]
        ),
        batch_format="pyarrow",
    )


SQL_TPCH_Q15 = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS total_revenue_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey, total_revenue_u FROM r
WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM r)
"""


# --------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue
# --------------------------------------------------------------------------

def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 shape: yearly revenue lost if Brand#1 orders below 20% of
    the part's average quantity stopped shipping. The brand's partkey set
    broadcasts into the lineitem scan; per-part (sum, count) gather bounded
    (the brand slice of a DIMENSION table) and broadcast back for the
    second pass. The avg comparison is division-free: 5·qty·n < sum —
    exact integers on both engines."""
    import ray

    part_ids = sorted(
        r["p_partkey"]
        for r in load(sf_dir, "part", ["p_partkey", "p_brand"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("p_brand"), "Brand#1")).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    ids_arr = np.asarray(part_ids, np.int64)
    ids_ref = ray.put(ids_arr)

    li = load(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def _slice(b: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, pk)
        pos_c = np.clip(pos, 0, max(len(ids) - 1, 0))
        hit = (len(ids) > 0) & (ids[pos_c] == pk)
        t = b.filter(pa.array(hit))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey").combine_chunks(),
                "qty_c": _cents(t.column("l_quantity")),
                "ep_c": _cents(t.column("l_extendedprice")),
            }
        )

    sliced = li.map_batches(_slice, batch_format="pyarrow").materialize()

    def _stats(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey").combine_chunks(),
                "s": b.column("qty_c").combine_chunks(),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["l_partkey"]).aggregate([("s", "sum"), ("n", "sum")])
        return g.rename_columns(["l_partkey", "s", "n"])

    stats = sliced.map_batches(_stats, batch_format="pyarrow").take_all()
    acc: dict[int, list[int]] = {}
    for r in stats:
        a = acc.setdefault(r["l_partkey"], [0, 0])
        a[0] += r["s"]
        a[1] += r["n"]
    keys = np.asarray(sorted(acc), np.int64)
    sums = np.asarray([acc[k][0] for k in keys], np.int64)
    cnts = np.asarray([acc[k][1] for k in keys], np.int64)
    k_ref, s_ref, n_ref = ray.put(keys), ray.put(sums), ray.put(cnts)

    def _fold(b: pa.Table) -> pa.Table:
        kk, ss, nn = ray.get(k_ref), ray.get(s_ref), ray.get(n_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, pk)
        qty = b.column("qty_c").to_numpy(zero_copy_only=False)
        ep = b.column("ep_c").to_numpy(zero_copy_only=False)
        small = 5 * qty * nn[pos] < ss[pos]
        return pa.table(
            {
                "ep": pa.array([int(ep[small].sum())], pa.int64()),
                "n": pa.array([int(small.sum())], pa.int64()),
            }
        )

    folds = sliced.map_batches(_fold, batch_format="pyarrow").take_all()
    total_ep = sum(r["ep"] for r in folds)
    n_rows = sum(r["n"] for r in folds)
    return pa.table(
        {
            "avg_yearly_c": pa.array([total_ep // 7 if total_ep >= 0 else -((-total_ep) // 7)], pa.int64()),
            "n_rows": pa.array([n_rows], pa.int64()),
        }
    )


SQL_TPCH_Q17 = """
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'),
st AS (SELECT l_partkey, sum(qty_c) AS s, count(*) AS n FROM li GROUP BY l_partkey)
SELECT CAST(COALESCE(sum(ep_c), 0) // 7 AS BIGINT) AS avg_yearly_c,
       CAST(count(*) AS BIGINT) AS n_rows
FROM li JOIN st USING (l_partkey)
WHERE 5 * qty_c * n < s
"""


# --------------------------------------------------------------------------
# TPC-H Q19: disjunctive-predicate join revenue
# --------------------------------------------------------------------------

_Q19_CLAUSES = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 10, 1, 15),
    ("Brand#2", 11, 25, 10, 25),
    ("Brand#3", 26, 50, 20, 35),
]


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 shape: revenue under an OR of (brand, size-range,
    qty-range) conjunctions. The part attributes broadcast as three parallel
    sorted arrays; the disjunction evaluates vectorized inside ONE lineitem
    scan — a pure streaming filter+fold, no join, no shuffle."""
    import ray

    part = load(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    rows = part.take_all()
    rows.sort(key=lambda r: r["p_partkey"])
    pks = np.asarray([r["p_partkey"] for r in rows], np.int64)
    brands = np.asarray([r["p_brand"] for r in rows])
    sizes = np.asarray([r["p_size"] for r in rows], np.int64)
    refs = (ray.put(pks), ray.put(brands), ray.put(sizes))

    li = load(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def _fold(b: pa.Table) -> pa.Table:
        kk, bb, zz = (ray.get(r) for r in refs)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, pk)
        pos_c = np.clip(pos, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[pos_c] == pk)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        mask = np.zeros(len(pk), bool)
        for brand, s_lo, s_hi, q_lo, q_hi in _Q19_CLAUSES:
            mask |= (
                hit
                & (bb[pos_c] == brand)
                & (zz[pos_c] >= s_lo)
                & (zz[pos_c] <= s_hi)
                & (qty >= q_lo)
                & (qty <= q_hi)
            )
        t = b.filter(pa.array(mask))
        rev = pc.multiply(
            _cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t.column("l_discount"))),
        )
        return pa.table(
            {
                "rev": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    folds = li.map_batches(_fold, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "revenue_u": pa.array([sum(r["rev"] for r in folds)], pa.int64()),
            "n_rows": pa.array([sum(r["n"] for r in folds)], pa.int64()),
        }
    )


SQL_TPCH_Q19 = """
SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) AS BIGINT)
         AS revenue_u,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)
"""


# --------------------------------------------------------------------------
# TPC-H Q16: supplier counts per part descriptor
# --------------------------------------------------------------------------

def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    non-PROMO, non-Brand#5 parts, counted from actual lineitem supply
    pairs. Part attributes broadcast into the fact scan; the (brand, type,
    size, suppkey) stream deduplicates via the sort-scan DISTINCT; final
    counts fold over the bounded descriptor grid."""
    import ray

    from .util import distinct_rows

    part = load(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    rows = [
        r
        for r in part.take_all()
        if r["p_brand"] != "Brand#5" and r["p_type"] != "PROMO"
    ]
    rows.sort(key=lambda r: r["p_partkey"])
    pks = np.asarray([r["p_partkey"] for r in rows], np.int64)
    brands = np.asarray([r["p_brand"] for r in rows])
    types = np.asarray([r["p_type"] for r in rows])
    sizes = np.asarray([r["p_size"] for r in rows], np.int64)
    refs = (ray.put(pks), ray.put(brands), ray.put(types), ray.put(sizes))

    li = load(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def _attach(b: pa.Table) -> pa.Table:
        kk, bb, tt, zz = (ray.get(r) for r in refs)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, pk)
        pos_c = np.clip(pos, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[pos_c] == pk)
        idx = pos_c[hit]
        return pa.table(
            {
                "p_brand": pa.array(bb[idx], pa.string()),
                "p_type": pa.array(tt[idx], pa.string()),
                "p_size": pa.array(zz[idx], pa.int64()),
                "l_suppkey": pa.array(
                    b.column("l_suppkey").to_numpy(zero_copy_only=False)[hit], pa.int64()
                ),
            }
        )

    quads = distinct_rows(
        li.map_batches(_attach, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
    )

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_type", "p_size"]).aggregate([([], "count_all")])
        return g.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    parts = quads.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[tuple, int] = {}
    for r in parts:
        k = (r["p_brand"], r["p_type"], r["p_size"])
        acc[k] = acc.get(k, 0) + r["supplier_cnt"]
    keys = sorted(acc)
    return pa.table(
        {
            "p_brand": pa.array([k[0] for k in keys], pa.string()),
            "p_type": pa.array([k[1] for k in keys], pa.string()),
            "p_size": pa.array([k[2] for k in keys], pa.int64()),
            "supplier_cnt": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# TPC-H Q7: volume shipping between two nations
# --------------------------------------------------------------------------

def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape: yearly shipping revenue on cross-nation trade lanes
    (either end in nations 0–4, ends differ — a predicate that stays
    non-vacuous at every test scale). ONE fact×fact hash join (lineitem ⨝ orders on
    orderkey, both pre-projected to 4/2 columns); supplier and customer
    nationkeys attach from broadcast dimension arrays inside the post-join
    scan; the (supp_nation, cust_nation, year) aggregate domain is tiny and
    folds on the driver."""
    import ray

    from .util import hash_join

    def _dim_map(tbl: str, key: str, val: str):
        rows = load(sf_dir, tbl, [key, val]).take_all()
        rows.sort(key=lambda r: r[key])
        return (
            np.asarray([r[key] for r in rows], np.int64),
            np.asarray([r[val] for r in rows], np.int64),
        )

    sk, sn = _dim_map("supplier", "s_suppkey", "s_nationkey")
    ck, cn = _dim_map("customer", "c_custkey", "c_nationkey")
    refs = (ray.put(sk), ray.put(sn), ray.put(ck), ray.put(cn))

    li = load(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("l_orderkey").combine_chunks(),
                "l_suppkey": b.column("l_suppkey").combine_chunks(),
                "yr": pc.year(b.column("l_shipdate")),
                "rev_u": pc.multiply(
                    _cents(b.column("l_extendedprice")),
                    pc.subtract(
                        pa.scalar(100, pa.int64()), _cents(b.column("l_discount"))
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    ords = load(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = hash_join(li, ords, on="o_orderkey", join_type="inner")

    def _partial(b: pa.Table) -> pa.Table:
        skk, snn, ckk, cnn = (ray.get(r) for r in refs)
        sup = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        cus = b.column("o_custkey").to_numpy(zero_copy_only=False)
        s_nat = snn[np.searchsorted(skk, sup)]
        c_nat = cnn[np.searchsorted(ckk, cus)]
        keep = (np.minimum(s_nat, c_nat) < 5) & (s_nat != c_nat)
        t = pa.table(
            {
                "supp_nation": pa.array(s_nat[keep], pa.int64()),
                "cust_nation": pa.array(c_nat[keep], pa.int64()),
                "yr": pa.array(
                    pc.cast(b.column("yr"), pa.int64()).to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "rev_u": pa.array(
                    b.column("rev_u").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
            }
        )
        g = t.group_by(["supp_nation", "cust_nation", "yr"]).aggregate([("rev_u", "sum")])
        return g.rename_columns(["supp_nation", "cust_nation", "yr", "rev_u"])

    parts = joined.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[tuple, int] = {}
    for r in parts:
        k = (r["supp_nation"], r["cust_nation"], r["yr"])
        acc[k] = acc.get(k, 0) + r["rev_u"]
    keys = sorted(acc)
    return pa.table(
        {
            "supp_nation": pa.array([k[0] for k in keys], pa.int64()),
            "cust_nation": pa.array([k[1] for k in keys], pa.int64()),
            "yr": pa.array([k[2] for k in keys], pa.int64()),
            "revenue_u": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q7 = """
SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(c_nationkey AS BIGINT) AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
WHERE least(s_nationkey, c_nationkey) < 5 AND s_nationkey <> c_nationkey
GROUP BY s_nationkey, c_nationkey, year(l_shipdate)
"""


EXTRAS2_REGISTRY.update(
    {
        "events_user_path": QueryDef(q_events_user_path, SQL_EVENTS_USER_PATH),
        "graph_hits": QueryDef(q_graph_hits, SQL_GRAPH_HITS),
        "tpch_q15_top_supplier": QueryDef(q_tpch_q15, SQL_TPCH_Q15),
        "tpch_q17_small_qty": QueryDef(q_tpch_q17, SQL_TPCH_Q17),
        "tpch_q19_disjunctive": QueryDef(q_tpch_q19, SQL_TPCH_Q19),
        "tpch_q16_supplier_cnt": QueryDef(q_tpch_q16, SQL_TPCH_Q16),
        "tpch_q7_nation_volume": QueryDef(q_tpch_q7, SQL_TPCH_Q7),
    }
)


# --------------------------------------------------------------------------
# multimodal: nearest-neighbor image resize (real PNG round trip)
# --------------------------------------------------------------------------

def q_multimodal_resize(sf_dir: str):
    """Image RESIZE end-to-end: attach REAL 16×16 PNG payloads with
    closed-form pixels, nearest-neighbor downsample ×2 in the actor pool
    (decode → ``px[::2, ::2]`` → re-encode to a REAL 8×8 PNG), emit integer
    stats of the resized image. The oracle recomputes the kept pixels'
    closed form ``(doc_id·31 + i²) % 256`` at the strided indices in SQL —
    a value match certifies decode, stride geometry, and stats together."""
    from .extras.multimodal import attach_media_affine, resize_media

    docs = load(sf_dir, "documents", ["doc_id"])
    out = resize_media(attach_media_affine(docs, "doc_id"), factor=2)
    return out.select_columns(["doc_id", "out_width", "out_height", "resized_sum"])


SQL_MULTIMODAL_RESIZE = """
SELECT d.doc_id,
       CAST(8 AS BIGINT) AS out_width,
       CAST(8 AS BIGINT) AS out_height,
       (SELECT CAST(sum((d.doc_id * 31
                         + ((t.i // 8) * 32 + (t.i % 8) * 2)
                           * ((t.i // 8) * 32 + (t.i % 8) * 2)) % 256) AS BIGINT)
        FROM unnest(range(64)) AS t(i)) AS resized_sum
FROM documents d
"""


EXTRAS2_REGISTRY.update(
    {"multimodal_resize": QueryDef(q_multimodal_resize, SQL_MULTIMODAL_RESIZE)}
)


# --------------------------------------------------------------------------
# per-key integer EMA (sequential stateful recurrence, exact)
# --------------------------------------------------------------------------

def q_events_ema(sf_dir: str):
    """Per-user integer EMA (α=1/2): ema₁=v₁, emaₙ=trunc((emaₙ₋₁+vₙ)/2) over
    (ts, event_id) order, in cents. The recurrence is inherently sequential
    per key — the distributed shape is the user-path one: ONE range sort;
    runs complete inside a block compute there in parallel; only each
    block's first/last key runs ship to the driver (2 per block), which
    chains spanning users in block order. The floor-free trunc division
    matches DuckDB's ``//`` exactly, and the oracle replays the recurrence
    as a recursive CTE."""
    import ray

    from .util import coalesce_blocks

    ev = load(sf_dir, "events", ["user_id", "ts", "event_id", "value"]).map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "event_id": b.column("event_id").combine_chunks(),
                "v_c": _cents(b.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    s = coalesce_blocks(ev.materialize()).sort(["user_id", "ts", "event_id"]).materialize()
    refs = list(s.to_arrow_refs())

    def _ema_run(vals: list[int]) -> list[int]:
        out, e = [], None
        for v in vals:
            e = v if e is None else _tdiv(e + v, 2)
            out.append(e)
        return out

    @ray.remote(num_cpus=0.5)
    def _block(t: pa.Table, idx: int):
        if t.num_rows == 0:
            return None, []
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("v_c").to_numpy(zero_copy_only=False)
        brk = np.flatnonzero(u[1:] != u[:-1]) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [len(u)]])
        frags = []
        in_ids: list[int] = []
        in_ema: list[int] = []
        for i, (a, b) in enumerate(zip(starts, ends)):
            if i == 0 or i == len(starts) - 1:
                frags.append((int(u[a]), ids[a:b].tolist(), v[a:b].tolist(), idx))
            else:
                e = None
                for j in range(a, b):
                    e = int(v[j]) if e is None else _tdiv(e + int(v[j]), 2)
                    in_ids.append(int(ids[j]))
                    in_ema.append(e)
        inner = pa.table(
            {
                "event_id": pa.array(in_ids, pa.int64()),
                "ema_c": pa.array(in_ema, pa.int64()),
            }
        )
        return inner, frags

    results = ray.get([_block.remote(r, i) for i, r in enumerate(refs)])
    inner_tbls = [t for t, _ in results if t is not None and t.num_rows]
    frags = sorted((f for _, fs in results for f in fs), key=lambda x: (x[0], x[3]))
    m_ids: list[int] = []
    m_ema: list[int] = []
    i = 0
    while i < len(frags):
        j, ids_all, vals_all = i, [], []
        while j < len(frags) and frags[j][0] == frags[i][0]:
            ids_all += frags[j][1]
            vals_all += frags[j][2]
            j += 1
        m_ids += ids_all
        m_ema += _ema_run(vals_all)
        i = j
    merged = pa.table(
        {"event_id": pa.array(m_ids, pa.int64()), "ema_c": pa.array(m_ema, pa.int64())}
    )
    all_tbls = inner_tbls + ([merged] if merged.num_rows else [])
    import ray.data as rd

    if not all_tbls:
        return pa.table(
            {"event_id": pa.array([], pa.int64()), "ema_c": pa.array([], pa.int64())}
        )
    return rd.from_arrow(all_tbls)


SQL_EVENTS_EMA = """
WITH RECURSIVE s AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS v_c,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
r AS (
  SELECT user_id, event_id, rn, v_c AS ema_c FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, (r.ema_c + s.v_c) // 2
  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
SELECT event_id, ema_c FROM r
"""


# --------------------------------------------------------------------------
# Misra-Gries heavy-hitter sketch (mergeable, scoreboard oracle)
# --------------------------------------------------------------------------

def q_stats_misra_gries(sf_dir: str, k: int = 64):
    """Misra-Gries frequency summary over l_partkey (k=64 counters),
    mergeable form (Agarwal et al. 2012): each block computes exact counts
    and trims to k by subtracting the (k+1)-th largest; the driver sums the
    bounded per-block summaries and trims once more. Invariants scoreboarded
    the CMS way over a deterministic probe set (partkey ≡ 3 mod 97):
    MG never overestimates (le_ok) and underestimates by at most
    N//(k+1) (within_ok) — both theorem-guaranteed, so the flags are
    stable 1s and a regression hash-mismatches. Exact probe counts ride
    along via the sort-scan counter."""
    from .extras.stats import exact_value_counts

    li = load(sf_dir, "lineitem", ["l_partkey"])

    def _partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        keys, cnts = np.unique(pk, return_counts=True)
        if len(keys) > k:
            order = np.argsort(cnts)[::-1]
            thresh = cnts[order[k]]
            keep = cnts > thresh
            # fewer than k survivors is fine (ties at the threshold drop)
            keys, cnts = keys[keep], cnts[keep] - thresh
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    parts = li.map_batches(_partial, batch_format="pyarrow").take_all()
    summary: dict[int, int] = {}
    for r in parts:
        summary[r["key"]] = summary.get(r["key"], 0) + r["cnt"]
    n_total = li.count()
    if len(summary) > k:
        vals = sorted(summary.values(), reverse=True)
        thresh = vals[k]
        summary = {key: c - thresh for key, c in summary.items() if c > thresh}
    bound = n_total // (k + 1)

    def _probes(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        return pa.table({"l_partkey": pa.array(pk[(pk - 3) % 97 == 0], pa.int64())})

    probes = exact_value_counts(
        li.map_batches(_probes, batch_format="pyarrow"), "l_partkey"
    ).to_pandas()
    keys = probes["l_partkey"].to_numpy().astype(np.int64)
    exact = probes["n"].to_numpy().astype(np.int64)
    est = np.asarray([summary.get(int(key), 0) for key in keys], np.int64)
    return pa.table(
        {
            "l_partkey": pa.array(keys, pa.int64()),
            "exact_count": pa.array(exact, pa.int64()),
            "le_ok": pa.array((est <= exact).astype(np.int64), pa.int64()),
            "within_ok": pa.array((exact - est <= bound).astype(np.int64), pa.int64()),
        }
    )


SQL_STATS_MISRA_GRIES = """
SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_count,
       CAST(1 AS BIGINT) AS le_ok, CAST(1 AS BIGINT) AS within_ok
FROM lineitem WHERE (l_partkey - 3) % 97 = 0
GROUP BY l_partkey
"""


EXTRAS2_REGISTRY.update(
    {
        "events_ema": QueryDef(q_events_ema, SQL_EVENTS_EMA),
        "stats_misra_gries": QueryDef(q_stats_misra_gries, SQL_STATS_MISRA_GRIES),
    }
)


# --------------------------------------------------------------------------
# TPC-H Q11 shape: important parts by value share
# --------------------------------------------------------------------------

def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 shape (no partsupp table in this corpus — importance is
    measured on actual shipped value): parts whose total lineitem value
    exceeds 1.5× the mean per-part value — a SCALE-FREE importance cut
    (Q11's fixed corpus fraction goes vacuous as the part count grows).
    Per-part value via sort-scan ``sum_per_key``; the cut broadcast as ONE
    integer threshold floor(3·total / (2·n_parts)) — exactly equivalent to
    the real-valued compare for integer values, and overflow-free where a
    cross-multiplication would wrap int64 at extreme scale."""
    from .extras.graph import sum_per_key

    li = load(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]).map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b.column("l_partkey").combine_chunks(),
                "ep_c": _cents(b.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    per_part = sum_per_key(li, "l_partkey", "ep_c").materialize()
    totals = per_part.map_batches(
        lambda b: pa.table(
            {
                "t": pa.array([pc.sum(b.column("ep_c")).as_py() or 0], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    total = sum(r["t"] for r in totals)
    n_parts = sum(r["n"] for r in totals)
    thresh = (3 * total) // (2 * n_parts) if n_parts else 0
    return per_part.map_batches(
        lambda b: b.filter(pc.greater(b.column("ep_c"), thresh)).rename_columns(
            ["l_partkey", "value_c"]
        ),
        batch_format="pyarrow",
    )


SQL_TPCH_Q11 = """
WITH v AS (SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                    AS value_c
           FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, value_c FROM v
WHERE value_c > (3 * (SELECT sum(value_c) FROM v)) // (2 * (SELECT count(*) FROM v))
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share by year
# --------------------------------------------------------------------------

def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 shape: NATION_3's share of yearly revenue from orders whose
    customer sits in region ASIA. ONE fact×fact hash join (lineitem ⨝
    orders); customer→region and supplier→nation attach from broadcast
    dimension arrays (region derives from the nation grid, joined driver-
    side — 25 rows); shares are integer micro-fractions. The aggregate
    domain is the year grid, folded on the driver."""
    import ray

    from .util import hash_join

    # nation -> region (25-row driver join), then customer -> in-ASIA flag
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in load(sf_dir, "nation").take_all()}
    asia = {k for k, v in nat.items() if v == 2}

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"]).take_all()
    cust.sort(key=lambda r: r["c_custkey"])
    ck = np.asarray([r["c_custkey"] for r in cust], np.int64)
    c_in = np.asarray([1 if r["c_nationkey"] in asia else 0 for r in cust], np.int64)

    supp = load(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    supp.sort(key=lambda r: r["s_suppkey"])
    sk = np.asarray([r["s_suppkey"] for r in supp], np.int64)
    s_n3 = np.asarray([1 if r["s_nationkey"] == 3 else 0 for r in supp], np.int64)
    refs = (ray.put(ck), ray.put(c_in), ray.put(sk), ray.put(s_n3))

    li = load(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("l_orderkey").combine_chunks(),
                "l_suppkey": b.column("l_suppkey").combine_chunks(),
                "yr": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "rev_u": pc.multiply(
                    _cents(b.column("l_extendedprice")),
                    pc.subtract(
                        pa.scalar(100, pa.int64()), _cents(b.column("l_discount"))
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, load(sf_dir, "orders", ["o_orderkey", "o_custkey"]), on="o_orderkey",
        join_type="inner",
    )

    def _partial(b: pa.Table) -> pa.Table:
        ckk, cin, skk, sn3 = (ray.get(r) for r in refs)
        cus = b.column("o_custkey").to_numpy(zero_copy_only=False)
        sup = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        keep = cin[np.searchsorted(ckk, cus)].astype(bool)
        n3 = sn3[np.searchsorted(skk, sup)].astype(bool) & keep
        yr = b.column("yr").to_numpy(zero_copy_only=False)
        rev = b.column("rev_u").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "yr": pa.array(yr[keep], pa.int64()),
                "total_u": pa.array(rev[keep], pa.int64()),
                "nation_u": pa.array(np.where(n3[keep], rev[keep], 0), pa.int64()),
            }
        )
        g = t.group_by(["yr"]).aggregate([("total_u", "sum"), ("nation_u", "sum")])
        return g.rename_columns(["yr", "total_u", "nation_u"])

    parts = joined.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[int, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["yr"], [0, 0])
        a[0] += r["total_u"]
        a[1] += r["nation_u"]
    keys = sorted(acc)
    return pa.table(
        {
            "yr": pa.array(keys, pa.int64()),
            "nation_rev_u": pa.array([acc[k][1] for k in keys], pa.int64()),
            "total_rev_u": pa.array([acc[k][0] for k in keys], pa.int64()),
            "mkt_share_micro": pa.array(
                [
                    (1_000_000 * acc[k][1]) // acc[k][0] if acc[k][0] else 0
                    for k in keys
                ],
                pa.int64(),
            ),
        }
    )


SQL_TPCH_Q8 = """
WITH f AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
         (s.s_nationkey = 3) AS is_n3
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE n.n_regionkey = 2)
SELECT yr,
       CAST(COALESCE(sum(CASE WHEN is_n3 THEN rev_u END), 0) AS BIGINT) AS nation_rev_u,
       CAST(sum(rev_u) AS BIGINT) AS total_rev_u,
       CAST(CASE WHEN sum(rev_u) = 0 THEN 0
                 ELSE (1000000 * COALESCE(sum(CASE WHEN is_n3 THEN rev_u END), 0))
                      // sum(rev_u) END AS BIGINT) AS mkt_share_micro
FROM f GROUP BY yr
"""


# --------------------------------------------------------------------------
# TPC-H Q21 shape: sole late shipper in multi-supplier orders
# --------------------------------------------------------------------------

def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (no receipt/commit dates in this corpus — "late" is
    shipdate > orderdate + 60 days): suppliers who were the ONLY late
    shipper in an order served by ≥2 distinct suppliers, counted per
    supplier. One fact×fact hash join, sort-scan DISTINCT over (order,
    supplier, late), then three NARROW order-keyed streams (distinct-supp
    count, late-supp count, min late supplier) recombined with order-keyed
    hash joins — every intermediate is order-cardinality, never a
    lineitem-sized shuffle after the first join."""
    from .extras.graph import sum_per_key
    from .util import distinct_rows, hash_join, min_per_key

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey", "l_shipdate"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, load(sf_dir, "orders", ["o_orderkey", "o_orderdate"]), on="o_orderkey",
        join_type="inner",
    )
    late_us = 60 * 86400 * 1_000_000

    def _mark(b: pa.Table) -> pa.Table:
        late = pc.greater(
            pc.subtract(
                pc.cast(b.column("l_shipdate"), pa.int64()),
                pc.cast(b.column("o_orderdate"), pa.int64()),
            ),
            late_us,
        )
        return pa.table(
            {
                "ok": b.column("o_orderkey").combine_chunks(),
                "sk": b.column("l_suppkey").combine_chunks(),
                "late": pc.cast(late, pa.int64()),
            }
        )

    pairs = distinct_rows(
        joined.map_batches(_mark, batch_format="pyarrow"), ["ok", "sk", "late"]
    ).materialize()

    def _ones(col: str):
        return lambda b: pa.table(
            {
                "ok": b.column("ok").combine_chunks(),
                col: pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    # a supplier may appear twice per order (late and on-time rows) — the
    # distinct-supplier count dedups (ok, sk) first
    supp_pairs = distinct_rows(pairs.select_columns(["ok", "sk"]), ["ok", "sk"])
    n_supp = sum_per_key(
        supp_pairs.map_batches(_ones("n_supp"), batch_format="pyarrow"), "ok", "n_supp"
    )
    late_pairs = pairs.map_batches(
        lambda b: b.filter(pc.equal(b.column("late"), 1)).select(["ok", "sk"]),
        batch_format="pyarrow",
    ).materialize()
    n_late = sum_per_key(
        late_pairs.map_batches(_ones("n_late"), batch_format="pyarrow"), "ok", "n_late"
    )
    late_min = min_per_key(late_pairs, "ok", "sk")

    stats = hash_join(
        hash_join(n_supp, n_late, on="ok", join_type="inner"),
        late_min,
        on="ok",
        join_type="inner",
    )
    waits = stats.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("n_supp"), 2), pc.equal(b.column("n_late"), 1)
            )
        ).select(["sk"]),
        batch_format="pyarrow",
    )

    def _cnt(b: pa.Table) -> pa.Table:
        g = b.group_by(["sk"]).aggregate([([], "count_all")])
        return g.rename_columns(["s_suppkey", "numwait"])

    parts = waits.map_batches(_cnt, batch_format="pyarrow").take_all()
    acc: dict[int, int] = {}
    for r in parts:
        acc[r["s_suppkey"]] = acc.get(r["s_suppkey"], 0) + r["numwait"]
    keys = sorted(acc)
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "numwait": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q21 = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk,
         CAST(l_shipdate > o_orderdate + INTERVAL 60 DAY AS BIGINT) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
st AS (
  SELECT ok,
         count(DISTINCT sk) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN sk END) AS n_late,
         min(CASE WHEN late = 1 THEN sk END) AS late_sk
  FROM pairs GROUP BY ok)
SELECT late_sk AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM st WHERE n_supp >= 2 AND n_late = 1
GROUP BY late_sk
"""


EXTRAS2_REGISTRY.update(
    {
        "tpch_q11_important_parts": QueryDef(q_tpch_q11, SQL_TPCH_Q11),
        "tpch_q8_market_share": QueryDef(q_tpch_q8, SQL_TPCH_Q8),
        "tpch_q21_sole_late": QueryDef(q_tpch_q21, SQL_TPCH_Q21),
    }
)


# --------------------------------------------------------------------------
# interpolated quantiles (quantile_cont semantics)
# --------------------------------------------------------------------------

def q_stats_quantile_cont(sf_dir: str):
    """Interpolated (continuous) quantiles of l_extendedprice — the
    quantile_cont complement of the exact discrete quantiles: h = q·(n−1),
    v = v_lo + (h−⌊h⌋)·(v_hi−v_lo), from TWO narrow-sort point lookups per
    q. Output in floor-cents so both engines compare exact integers (the
    interpolation arithmetic is the same single-rounded double expression
    on both sides; a floor-boundary coincidence needs a 1-ulp disagreement
    AND an exact .00 result — the sqlrng-style integer-gate argument)."""
    from .util import sorted_column

    qs = [0.25, 0.5, 0.75, 0.9]
    ds = load(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    sc = sorted_column(
        ds, "l_extendedprice", "l_orderkey",
        lambda a: a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
    )
    n = sc.total
    out_q, out_v = [], []
    ranks = []
    for q in qs:
        h = q * (n - 1)
        ranks += [int(np.floor(h)), min(n - 1, int(np.floor(h)) + 1)]
    vals = sc.values_at_ranks(ranks)
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        hi = min(n - 1, lo + 1)
        frac = h - lo
        v = vals[lo] + frac * (vals[hi] - vals[lo])
        out_q.append(q)
        out_v.append(int(np.floor(v * 100.0)))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value_c": pa.array(out_v, pa.int64())}
    )


def _sql_quantile_cont() -> str:
    # replicate the interpolation expression (not quantile_cont itself) so
    # the double op sequence matches the Python side operation-for-operation
    parts = []
    for q in [0.25, 0.5, 0.75, 0.9]:
        parts.append(f"""
SELECT {q} AS q, CAST(floor((lo_v + ({q} * (n - 1) - floor({q} * (n - 1)))
                             * (hi_v - lo_v)) * 100) AS BIGINT) AS value_c
FROM (
  SELECT n,
         (SELECT l_extendedprice FROM s
          WHERE rn = CAST(floor({q} * (n - 1)) AS BIGINT)) AS lo_v,
         (SELECT l_extendedprice FROM s
          WHERE rn = least(CAST(n - 1 AS BIGINT),
                           CAST(floor({q} * (n - 1)) AS BIGINT) + 1)) AS hi_v
  FROM (SELECT count(*) AS n FROM lineitem))""")
    return (
        "WITH s AS (SELECT l_extendedprice,"
        " row_number() OVER (ORDER BY l_extendedprice, l_orderkey) - 1 AS rn,"
        " count(*) OVER () AS n FROM lineitem)"
        + " UNION ALL ".join(parts)
    )


SQL_STATS_QUANTILE_CONT = _sql_quantile_cont()


EXTRAS2_REGISTRY.update(
    {"stats_quantile_cont": QueryDef(q_stats_quantile_cont, SQL_STATS_QUANTILE_CONT)}
)


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year
# --------------------------------------------------------------------------

def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (no partsupp table in this corpus — supply cost is the
    part's retail price): per (supplier-nation, order-year) profit over parts
    whose name contains 'ol', profit = extprice·(1−discount) − retail·qty in
    exact 1e-4-dollar integer units. ONE fact×fact hash join (lineitem ⨝
    orders, for the order year); the part slice (name-filtered DIMENSION
    rows) and supplier→nation broadcast as sorted arrays; the aggregate
    domain is the bounded nation×year grid, folded on the driver."""
    import ray

    from .util import hash_join

    nat = {r["n_nationkey"]: r["n_name"] for r in load(sf_dir, "nation").take_all()}

    pt = load(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda b: b.filter(pc.match_substring(b.column("p_name"), "ol")).select(
            ["p_partkey", "p_retailprice"]
        ),
        batch_format="pyarrow",
    ).take_all()
    pt.sort(key=lambda r: r["p_partkey"])
    pk = np.asarray([r["p_partkey"] for r in pt], np.int64)
    retail_c = np.asarray([round(r["p_retailprice"] * 100) for r in pt], np.int64)

    supp = load(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    supp.sort(key=lambda r: r["s_suppkey"])
    sk = np.asarray([r["s_suppkey"] for r in supp], np.int64)
    s_nat = np.asarray([r["s_nationkey"] for r in supp], np.int64)
    refs = (ray.put(pk), ray.put(retail_c), ray.put(sk), ray.put(s_nat))

    def _slice(b: pa.Table) -> pa.Table:
        pkk, rc, _, _ = (ray.get(r) for r in refs)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pkk, part)
        pos_c = np.clip(pos, 0, max(len(pkk) - 1, 0))
        hit = (len(pkk) > 0) & (pkk[pos_c] == part)
        t = b.filter(pa.array(hit))
        ep_c = _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc_c = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        qty = (
            pc.cast(pc.round(t.column("l_quantity")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cost = rc[np.clip(np.searchsorted(pkk, t.column("l_partkey").to_numpy(
            zero_copy_only=False)), 0, max(len(pkk) - 1, 0))]
        profit_u = ep_c * (100 - disc_c) - cost * qty * 100
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey").combine_chunks(),
                "l_suppkey": t.column("l_suppkey").combine_chunks(),
                "profit_u": pa.array(profit_u, pa.int64()),
            }
        )

    li = load(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(_slice, batch_format="pyarrow")
    joined = hash_join(
        li, load(sf_dir, "orders", ["o_orderkey", "o_orderdate"]), on="o_orderkey",
        join_type="inner",
    )

    def _partial(b: pa.Table) -> pa.Table:
        _, _, skk, snat = (ray.get(r) for r in refs)
        sup = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "nk": pa.array(snat[np.searchsorted(skk, sup)], pa.int64()),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
                "profit_u": b.column("profit_u").combine_chunks(),
            }
        )
        g = t.group_by(["nk", "o_year"]).aggregate([("profit_u", "sum")])
        return g.rename_columns(["nk", "o_year", "profit_u"])

    parts = joined.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[tuple[int, int], int] = {}
    for r in parts:
        key = (r["nk"], r["o_year"])
        acc[key] = acc.get(key, 0) + r["profit_u"]
    keys = sorted(acc)
    return pa.table(
        {
            "n_name": pa.array([nat[k[0]] for k in keys], pa.string()),
            "o_year": pa.array([k[1] for k in keys], pa.int64()),
            "sum_profit_u": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


SQL_TPCH_Q9 = """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) * 100) AS BIGINT)
         AS sum_profit_u
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%ol%'
GROUP BY n_name, o_year
"""


# --------------------------------------------------------------------------
# TPC-H Q20 shape: dominant suppliers of name-sliced parts
# --------------------------------------------------------------------------

def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 shape (no partsupp availqty — a supplier "can promote" a
    part when they shipped MORE than half its 1996 volume): suppliers that
    dominate ≥1 part whose name starts with 'small'. The part slice
    broadcasts into the lineitem scan (corpus never shuffles); per
    (part, supplier) quantity partials gather driver-side — bounded by the
    sliced-part × suppliers-per-part grid, a dimension-scale set — where the
    correlated 2·s > t cut and the distinct-supplier projection fold.
    Division-free compare; exact integers on both engines."""
    import ray

    nat = {r["n_nationkey"]: r["n_name"] for r in load(sf_dir, "nation").take_all()}
    sup = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
        for r in load(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
        .take_all()
    }

    part_ids = sorted(
        r["p_partkey"]
        for r in load(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(
            lambda b: b.filter(
                pc.starts_with(b.column("p_name"), "small")
            ).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        .take_all()
    )
    ids_ref = ray.put(np.asarray(part_ids, np.int64))
    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1997, 1, 1), pa.timestamp("us"))

    def _partial(b: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        win = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi),
        )
        t = b.filter(win)
        part = t.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ids, part), 0, max(len(ids) - 1, 0))
        hit = (len(ids) > 0) & (ids[pos] == part)
        t = t.filter(pa.array(hit))
        g = pa.table(
            {
                "pk": t.column("l_partkey").combine_chunks(),
                "sk": t.column("l_suppkey").combine_chunks(),
                "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
            }
        ).group_by(["pk", "sk"]).aggregate([("qty", "sum")])
        return g.rename_columns(["pk", "sk", "qty"])

    parts = (
        load(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(_partial, batch_format="pyarrow")
        .take_all()
    )
    ps: dict[tuple[int, int], int] = {}
    tot: dict[int, int] = {}
    for r in parts:
        key = (r["pk"], r["sk"])
        ps[key] = ps.get(key, 0) + r["qty"]
        tot[r["pk"]] = tot.get(r["pk"], 0) + r["qty"]
    winners = sorted({s for (p, s), q in ps.items() if 2 * q > tot[p]})
    return pa.table(
        {
            "s_suppkey": pa.array(winners, pa.int64()),
            "s_name": pa.array([sup[s][0] for s in winners], pa.string()),
            "n_name": pa.array([nat[sup[s][1]] for s in winners], pa.string()),
        }
    )


SQL_TPCH_Q20 = """
WITH li AS (
  SELECT l_partkey, l_suppkey, CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'),
ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS s FROM li GROUP BY 1, 2),
tot AS (SELECT l_partkey, sum(s) AS t FROM ps GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM ps JOIN tot USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * s > t
"""


EXTRAS2_REGISTRY.update(
    {
        "tpch_q9_profit": QueryDef(q_tpch_q9, SQL_TPCH_Q9),
        "tpch_q20_dominant_supplier": QueryDef(q_tpch_q20, SQL_TPCH_Q20),
    }
)
