"""Query registry: every implemented operator as a (Ray pipeline, DuckDB
oracle SQL) pair over the driver's parquet tables.

Naming contract: every computed column is aliased identically in the Ray
result and the SQL so the driver's order-insensitive value-hash compare
matches. Queries marked ``sql=None`` are non-SQL-expressible (seeded RNG) and
get a rows-only check.

The anonymization queries re-express the reference's operators (SURVEY.md §2)
over the TPC-H-ish tables: ``customer`` plays the role of the person-like
"AnonymisationDemo" entity; the nation→region hierarchy plays the address
hierarchy of the object-generalization fixtures.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from .config import AnonymizationConfig, AttributeConfig
from .pipelines.anonymize import anonymize_table
from .stages.generalization import generalize_column
from .stages.generalization_object import generalize_object_column
from .stages.kpi import equivalence_classes, k_anonymity
from .stages.masking import mask_column
from .rng import attribute_seed64
from .sqlrng import sql_rand_numeric
from .stages.randomization import randomize_column, window_noise_scale


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def load(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read (only needed columns leave storage)."""
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _geo_lookup(sf_dir: str) -> dict[int, tuple[str, str]]:
    """nation+region are tiny dimension tables: load once driver-side and
    broadcast into tasks via closure capture (S3 pattern — config/small side
    shipped once, never re-fetched per record)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))
    return {
        nk: (nn, rmap[rk])
        for nk, nn, rk in zip(
            nation["n_nationkey"], nation["n_name"], nation["n_regionkey"]
        )
    }


def _with_geo(ds: rd.Dataset, lookup: dict[int, tuple[str, str]]) -> rd.Dataset:
    keys = np.array(sorted(lookup))
    nnames = np.array([lookup[k][0] for k in keys])
    rnames = np.array([lookup[k][1] for k in keys])

    def _add(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, nk)
        batch = batch.append_column("n_name", pa.array(nnames[pos]))
        return batch.append_column("r_name", pa.array(rnames[pos]))

    return ds.map_batches(_add, batch_format="pyarrow")


def _as_int64(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    def _cast(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), pa.int64()))
        return batch

    return ds.map_batches(_cast, batch_format="pyarrow")


# SQL fragment: the bucket-count formula (identical floating-point expression
# to config.calculate_num_buckets; both use C libm pow)
def _sql_gk(k_expr: str, n: int) -> str:
    return (
        f"LEAST(GREATEST(CAST(floor(1.0/pow(1.0 - pow(1.0 - pow(0.99, 1.0/({k_expr})), "
        f"1.0/({k_expr})), 1.0/{n})) AS BIGINT), 1), ({k_expr}))"
    )


def _sql_bucket_assign(tbl: str, id_col: str, val_expr: str, n: int, out: str) -> str:
    """Rank -> floor(g*rank/k) with (value, id) tie-break; nulls stay null."""
    return f"""
WITH stats AS (SELECT count(*) AS k FROM {tbl} WHERE {val_expr} IS NOT NULL),
gk AS (SELECT k, {_sql_gk('k', n)} AS g FROM stats),
s AS (SELECT {id_col} AS id, row_number() OVER (ORDER BY {val_expr}, {id_col}) - 1 AS rnk
      FROM {tbl} WHERE {val_expr} IS NOT NULL),
assigned AS (SELECT s.id, (gk.g * s.rnk) // gk.k AS bucket FROM s CROSS JOIN gk)
SELECT t.{id_col}, assigned.bucket AS {out}
FROM {tbl} t LEFT JOIN assigned ON assigned.id = t.{id_col}
"""


def _sql_bucket_table(tbl: str, id_col: str, val_expr: str, n: int, integer_mid: bool) -> str:
    """Bucket boundary table: B_p = midpoint(v[c-1], v[c]) at c = (p*k)//g."""
    mid = "(s1.v + s2.v) // 2" if integer_mid else "(s1.v + s2.v) / 2.0"
    return f"""
WITH stats AS (SELECT count(*) AS k FROM {tbl} WHERE {val_expr} IS NOT NULL),
gk AS (SELECT k, {_sql_gk('k', n)} AS g FROM stats),
s AS (SELECT CAST({val_expr} AS {'BIGINT' if integer_mid else 'DOUBLE'}) AS v,
             row_number() OVER (ORDER BY {val_expr}, {id_col}) - 1 AS rnk
      FROM {tbl} WHERE {val_expr} IS NOT NULL),
cuts AS (SELECT p.p, (p.p * gk.k) // gk.g AS c FROM gk,
         (SELECT unnest(range(1, (SELECT g FROM gk)))) AS p(p)),
bvals AS (SELECT cuts.p, {mid} AS bv FROM cuts
          JOIN s s1 ON s1.rnk = cuts.c - 1 JOIN s s2 ON s2.rnk = cuts.c),
bkts AS (SELECT unnest(range(0, (SELECT g FROM gk))) AS bucket)
SELECT bkts.bucket,
       bmin.bv AS min,
       bmax.bv AS max
FROM bkts LEFT JOIN bvals bmin ON bmin.p = bkts.bucket
          LEFT JOIN bvals bmax ON bmax.p = bkts.bucket + 1
"""


_SQL_GEO_BASE = """
base AS (SELECT c.c_custkey AS id, n.n_name AS l1, r.r_name AS l2
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                         JOIN region r ON n.n_regionkey = r.r_regionkey)
"""


def _sql_objgen_select(n: int) -> str:
    """CASE over the first accepted hierarchy level (n_name then r_name)."""
    return f"""
WITH {_SQL_GEO_BASE},
stats AS (SELECT count(*) AS k FROM base),
gk AS (SELECT k, {_sql_gk('k', n)} AS g FROM stats),
l1s AS (SELECT count(*) AS d, min(cnt) AS m FROM (SELECT l1, count(*) AS cnt FROM base GROUP BY l1)),
l2s AS (SELECT count(*) AS d, min(cnt) AS m FROM (SELECT l2, count(*) AS cnt FROM base GROUP BY l2)),
sel AS (SELECT CASE WHEN l1s.d <= gk.g AND l1s.m > gk.k * 0.5 / gk.g THEN 1
                    WHEN l2s.d <= gk.g AND l2s.m > gk.k * 0.5 / gk.g THEN 2
                    ELSE 0 END AS lev
        FROM l1s, l2s, gk)
"""


# --------------------------------------------------------------------------
# anonymization-core queries (reference operators A1-A4, K1-K4, S2)
# --------------------------------------------------------------------------

def q_mask_customer_name(sf_dir: str):
    """A1 Masking (reference Masking.java:19-25)."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_name"])
    return mask_column(ds, "c_name").select_columns(["c_custkey", "c_name_masked"])


SQL_MASK = "SELECT c_custkey, '*****' AS c_name_masked FROM customer"


def q_gen_numeric_acctbal(sf_dir: str):
    """A2 numeric generalization: bucket assignment (Generalization.java:42-57)."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=1, kind="numeric")
    out = out.select_columns(["c_custkey", "c_acctbal_generalized"])
    return _as_int64(out, ["c_acctbal_generalized"])


SQL_GEN_NUMERIC = _sql_bucket_assign(
    "customer", "c_custkey", "c_acctbal", 1, "c_acctbal_generalized"
)


def q_gen_numeric_buckets(sf_dir: str):
    """A2 bucket boundary side-table (Generalization.java:64-104): min/max are
    midpoints; NULL encodes the obfuscated outer bounds."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    _, res = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=1, kind="numeric")
    t = res.buckets
    return pa.table(
        {
            "bucket": pc.cast(t.column("bucket"), pa.int64()),
            "min": t.column("min"),
            "max": t.column("max"),
        }
    )


SQL_GEN_NUMERIC_BUCKETS = _sql_bucket_table("customer", "c_custkey", "c_acctbal", 1, False)


def q_gen_date_orderdate(sf_dir: str):
    """A2 date generalization over orders.o_orderdate (GeneralizationDate.java)."""
    ds = load(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out, _ = generalize_column(ds, "o_orderdate", "o_orderkey", num_attrs=1, kind="date")
    out = out.select_columns(["o_orderkey", "o_orderdate_generalized"])
    return _as_int64(out, ["o_orderdate_generalized"])


SQL_GEN_DATE = _sql_bucket_assign(
    "orders", "o_orderkey", "CAST(o_orderdate AS DATE)", 1, "o_orderdate_generalized"
)


def q_gen_date_buckets(sf_dir: str):
    """A2 date bucket table; bounds as epoch days, Java integer-half midpoints
    (GeneralizationDate.java:40-48)."""
    ds = load(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    _, res = generalize_column(ds, "o_orderdate", "o_orderkey", num_attrs=1, kind="date")
    t = res.buckets
    return pa.table(
        {
            "bucket": pc.cast(t.column("bucket"), pa.int64()),
            "min": pc.cast(t.column("min"), pa.int64()),
            "max": pc.cast(t.column("max"), pa.int64()),
        }
    )


SQL_GEN_DATE_BUCKETS = _sql_bucket_table(
    "orders", "o_orderkey", "CAST(o_orderdate AS DATE) - DATE '1970-01-01'", 1, True
)


def q_gen_object_geo(sf_dir: str):
    """A3 object generalization over the nation->region hierarchy
    (GeneralizationObject.java:27-58)."""
    ds = _with_geo(load(sf_dir, "customer", ["c_custkey", "c_nationkey"]), _geo_lookup(sf_dir))
    out, _ = generalize_object_column(
        ds, "geo", ["n_name", "r_name"], num_attrs=1
    )
    return out.select_columns(["c_custkey", "geo_generalized"])


SQL_GEN_OBJECT = (
    _sql_objgen_select(1)
    + """
SELECT base.id AS c_custkey,
       CASE sel.lev WHEN 1 THEN base.l1 WHEN 2 THEN base.l2 ELSE '*****' END AS geo_generalized
FROM base, sel
"""
)


def q_rand_window_scale(sf_dir: str):
    """A4's deterministic noise scale: distance to the w-th sorted neighbor
    (Randomization.java:42-52). The seeded noise itself is checked rows-only;
    this query proves the window semantics exactly."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    return window_noise_scale(
        ds, "c_acctbal", "c_custkey", num_attrs=1, kind="numeric"
    ).select_columns(["c_custkey", "noise_scale"])


SQL_RAND_WINDOW = """
WITH stats AS (SELECT count(*) AS k FROM customer WHERE c_acctbal IS NOT NULL),
gk AS (SELECT k, {g} AS g FROM stats),
wk AS (SELECT k, g, CASE WHEN k // g = k THEN k - 1 ELSE k // g END AS w FROM gk),
s AS (SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS v,
             row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS rnk
      FROM customer WHERE c_acctbal IS NOT NULL),
cand AS (SELECT i.rnk AS idx, j.rnk AS j
         FROM s i CROSS JOIN wk
         JOIN s j ON j.rnk BETWEEN greatest(i.rnk - wk.w, 0) AND least(i.rnk, wk.k - wk.w - 1)
         LEFT JOIN s jw ON jw.rnk = j.rnk + wk.w + 1
         WHERE j.rnk >= wk.k - wk.w - 1 OR (j.v + jw.v) >= 2 * i.v),
lb AS (SELECT idx, min(j) AS lb FROM cand GROUP BY idx),
d AS (SELECT i.id, greatest(abs(i.v - sl.v), abs(i.v - slw.v)) AS noise_scale
      FROM s i JOIN lb ON lb.idx = i.rnk CROSS JOIN wk
      JOIN s sl ON sl.rnk = lb.lb JOIN s slw ON slw.rnk = lb.lb + wk.w)
SELECT t.c_custkey, d.noise_scale FROM customer t LEFT JOIN d ON d.id = t.c_custkey
""".format(g=_sql_gk("k", 1))


def q_rand_numeric_acctbal(sf_dir: str):
    """A4 full SEEDED randomization, value-hash exact: the splitmix rng_mode
    draws from a SplitMix64 counter stream keyed by global sorted rank (same
    partition-independence as the default Philox mode), which the SQL oracle
    replicates bit-for-bit with HUGEINT mod-2^64 arithmetic (sqlrng.py)."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = randomize_column(
        ds, "c_acctbal", "c_custkey", num_attrs=1, kind="numeric", seed=1234,
        object_type="customer", rng_mode="splitmix",
    )
    return out.select_columns(["c_custkey", "c_acctbal_randomized"])


SQL_RAND_NUMERIC = sql_rand_numeric(
    "customer",
    "c_custkey",
    "c_acctbal",
    _sql_gk("k", 1),
    attribute_seed64(1234, "customer", "c_acctbal"),
    "c_acctbal_randomized",
)


def q_kpi_classes(sf_dir: str):
    """K2 equivalence classes over two generalized attributes (n=2)."""
    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        _geo_lookup(sf_dir),
    )
    ds, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=2, kind="numeric")
    ds, _ = generalize_object_column(ds, "geo", ["n_name", "r_name"], num_attrs=2)
    cls = equivalence_classes(ds, ["c_acctbal_generalized", "geo_generalized"])
    return _as_int64(cls, ["c_acctbal_generalized", "class_size"])


_SQL_TWO_ATTR_BASE = (
    _sql_objgen_select(2)
    + """,
geo AS (SELECT base.id, CASE sel.lev WHEN 1 THEN base.l1 WHEN 2 THEN base.l2
                        ELSE '*****' END AS geo_generalized FROM base, sel),
s2 AS (SELECT c_custkey AS id, row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS rnk
       FROM customer WHERE c_acctbal IS NOT NULL),
gk2 AS (SELECT count(*) AS k, {g2} AS g FROM customer WHERE c_acctbal IS NOT NULL),
bkt AS (SELECT s2.id, (gk2.g * s2.rnk) // gk2.k AS c_acctbal_generalized FROM s2 CROSS JOIN gk2),
combined AS (SELECT c.c_custkey, bkt.c_acctbal_generalized, geo.geo_generalized
         FROM customer c LEFT JOIN bkt ON bkt.id = c.c_custkey
                         LEFT JOIN geo ON geo.id = c.c_custkey)
""".format(g2=_sql_gk("count(*)", 2))
)

SQL_KPI_CLASSES = (
    _SQL_TWO_ATTR_BASE
    + """
SELECT c_acctbal_generalized, geo_generalized, count(*) AS class_size
FROM combined GROUP BY c_acctbal_generalized, geo_generalized
"""
)


def q_kpi_k_anonymity(sf_dir: str):
    """K4 without randomized attributes: min class size."""
    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        _geo_lookup(sf_dir),
    )
    ds, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=2, kind="numeric")
    ds, _ = generalize_object_column(ds, "geo", ["n_name", "r_name"], num_attrs=2)
    ka = k_anonymity(ds, ["c_acctbal_generalized", "geo_generalized"], [])
    return pa.table({"k_anonymity": pa.array([ka], pa.int64())})


SQL_KPI_K_ANONYMITY = (
    _SQL_TWO_ATTR_BASE
    + """
SELECT min(class_size) AS k_anonymity FROM (
  SELECT count(*) AS class_size FROM combined
  GROUP BY c_acctbal_generalized, geo_generalized)
"""
)


def q_anonymize_customer(sf_dir: str):
    """Flagship end-to-end anonymization of the customer entity (masking +
    numeric generalization + object generalization, originals dropped) —
    the reference's full per-object pipeline (AnonymizationService.java:74-116)."""
    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_name", "c_acctbal"]),
        _geo_lookup(sf_dir),
    )
    cfg = AnonymizationConfig(
        (
            AttributeConfig("customer", "c_name", "string", "masking"),
            AttributeConfig("customer", "c_acctbal", "double", "generalization"),
            AttributeConfig("customer", "geo", "Geo", "generalization", ("n_name", "r_name")),
        )
    )
    res = anonymize_table(
        ds, cfg, "customer", "c_custkey", seed=1234, calculate_kpi=False,
        object_layout={"geo": (None, ["n_name", "r_name"])},
    )
    out = res.data.select_columns(
        ["c_custkey", "c_name_masked", "c_acctbal_generalized", "geo_generalized"]
    )
    return _as_int64(out, ["c_acctbal_generalized"])


SQL_ANONYMIZE_CUSTOMER = (
    _SQL_TWO_ATTR_BASE
    + """
SELECT b.c_custkey, '*****' AS c_name_masked, b.c_acctbal_generalized, b.geo_generalized
FROM combined b
"""
)


def q_anonymize_original_names(sf_dir: str):
    """Q7 rename pass: use_adjusted_attributes=False keeps original column
    names (AnonymizationService.java:159-201)."""
    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_name", "c_acctbal"]),
        _geo_lookup(sf_dir),
    )
    cfg = AnonymizationConfig(
        (
            AttributeConfig("customer", "c_name", "string", "masking"),
            AttributeConfig("customer", "c_acctbal", "double", "generalization"),
        )
    )
    res = anonymize_table(
        ds, cfg, "customer", "c_custkey", seed=1, calculate_kpi=False,
        use_adjusted_attributes=False,
    )
    out = res.data.select_columns(["c_custkey", "c_name", "c_acctbal"])
    return _as_int64(out, ["c_acctbal"])


SQL_ANONYMIZE_ORIGINAL_NAMES = (
    _sql_bucket_assign("customer", "c_custkey", "c_acctbal", 1, "c_acctbal").replace(
        "SELECT t.c_custkey, assigned.bucket AS c_acctbal",
        "SELECT t.c_custkey, '*****' AS c_name, assigned.bucket AS c_acctbal",
    )
)


def q_flat_lift_triples(sf_dir: str):
    """S2 flat-JSON lift: wide rows -> typed triples with a counter literal
    (FaltJsonService.java:40-93)."""
    ds = load(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"])

    def _lift(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        ids = pc.cast(batch.column("c_custkey"), pa.string())
        subj = pc.binary_join_element_wise(pa.array(["customer"] * nrows), ids, "/")
        parts = []
        # rdf:type triple per row (FaltJsonService.java:52-56)
        parts.append(
            pa.table(
                {
                    "subj": subj,
                    "pred": pa.array(["rdf:type"] * nrows),
                    "obj": pa.array(["customer"] * nrows),
                    "obj_datatype": pa.array(["iri"] * nrows),
                }
            )
        )
        # counter literal for stable output ordering (FaltJsonService.java:58-60)
        parts.append(
            pa.table(
                {
                    "subj": subj,
                    "pred": pa.array(["counter"] * nrows),
                    "obj": ids,
                    "obj_datatype": pa.array(["integer"] * nrows),
                }
            )
        )
        from .util import format_double

        for col, dt in [("c_name", "string"), ("c_acctbal", "double"), ("c_mktsegment", "string")]:
            vals = batch.column(col).combine_chunks()
            mask = pc.is_valid(vals)
            lex = format_double(vals) if dt == "double" else pc.cast(vals, pa.string())
            t = pa.table(
                {
                    "subj": subj.filter(mask),
                    "pred": pa.array([col] * batch.num_rows).filter(mask),
                    "obj": lex.filter(mask),
                    "obj_datatype": pa.array([dt] * batch.num_rows).filter(mask),
                }
            )
            parts.append(t)
        return pa.concat_tables(parts)

    return ds.map_batches(_lift, batch_format="pyarrow")


SQL_FLAT_LIFT = """
SELECT 'customer/' || c_custkey AS subj, 'rdf:type' AS pred, 'customer' AS obj, 'iri' AS obj_datatype FROM customer
UNION ALL
SELECT 'customer/' || c_custkey, 'counter', CAST(c_custkey AS VARCHAR), 'integer' FROM customer
UNION ALL
SELECT 'customer/' || c_custkey, 'c_name', c_name, 'string' FROM customer WHERE c_name IS NOT NULL
UNION ALL
SELECT 'customer/' || c_custkey, 'c_acctbal', CAST(c_acctbal AS VARCHAR), 'double' FROM customer WHERE c_acctbal IS NOT NULL
UNION ALL
SELECT 'customer/' || c_custkey, 'c_mktsegment', c_mktsegment, 'string' FROM customer WHERE c_mktsegment IS NOT NULL
"""


def q_used_properties(sf_dir: str):
    """Q2 used-property probe: non-null counts per configured column."""
    ds = load(sf_dir, "customer", ["c_name", "c_acctbal", "c_mktsegment"])
    from .pipelines.anonymize import _nonnull_counts

    counts = _nonnull_counts(ds, ["c_name", "c_acctbal", "c_mktsegment"])
    return pa.table(
        {
            "attribute": pa.array(sorted(counts)),
            "nonnull_count": pa.array([counts[c] for c in sorted(counts)], pa.int64()),
        }
    )


SQL_USED_PROPERTIES = """
SELECT 'c_acctbal' AS attribute, count(c_acctbal) AS nonnull_count FROM customer
UNION ALL SELECT 'c_mktsegment', count(c_mktsegment) FROM customer
UNION ALL SELECT 'c_name', count(c_name) FROM customer
"""


def q_kpi_l_diversity(sf_dir: str):
    """Distinct l-diversity over the same two generalized attributes the
    k-anonymity KPI uses, sensitive attribute = c_mktsegment (the class's
    min distinct-sensitive count; Machanavajjhala et al. 2007)."""
    from .stages.kpi import l_diversity

    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"]),
        _geo_lookup(sf_dir),
    )
    ds, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=2, kind="numeric")
    ds, _ = generalize_object_column(ds, "geo", ["n_name", "r_name"], num_attrs=2)
    ld = l_diversity(ds, ["c_acctbal_generalized", "geo_generalized"], "c_mktsegment")
    return pa.table({"l_diversity": pa.array([ld], pa.int64())})


SQL_KPI_L_DIVERSITY = (
    _SQL_TWO_ATTR_BASE
    + """
SELECT min(cnt) AS l_diversity FROM (
  SELECT count(DISTINCT cu.c_mktsegment) AS cnt
  FROM combined b JOIN customer cu ON cu.c_custkey = b.c_custkey
  WHERE cu.c_mktsegment IS NOT NULL
  GROUP BY b.c_acctbal_generalized, b.geo_generalized)
"""
)


def q_kpi_t_closeness(sf_dir: str):
    """t-closeness scoreboard (equal-distance/total-variation EMD for the
    categorical sensitive attribute c_mktsegment) over the same two
    generalized attributes — exact integer numerators: class t value is
    tv_num / (2*class_size*n_total), left unreduced so the compare is
    float-free (Li et al., ICDE 2007)."""
    from .stages.kpi import t_closeness_table

    ds = _with_geo(
        load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"]),
        _geo_lookup(sf_dir),
    )
    ds, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=2, kind="numeric")
    ds, _ = generalize_object_column(ds, "geo", ["n_name", "r_name"], num_attrs=2)
    return t_closeness_table(
        ds, ["c_acctbal_generalized", "geo_generalized"], "c_mktsegment"
    )


SQL_KPI_T_CLOSENESS = (
    _SQL_TWO_ATTR_BASE
    + """
, tbase AS (SELECT b.c_acctbal_generalized AS g1, b.geo_generalized AS g2,
                   cu.c_mktsegment AS sens
            FROM combined b JOIN customer cu ON cu.c_custkey = b.c_custkey
            WHERE cu.c_mktsegment IS NOT NULL),
cv AS (SELECT g1, g2, sens, count(*) AS n_cv FROM tbase GROUP BY 1, 2, 3),
cls AS (SELECT g1, g2, sum(n_cv) AS n_c FROM cv GROUP BY 1, 2),
vv AS (SELECT sens, count(*) AS n_v FROM tbase GROUP BY 1),
tot AS (SELECT count(*) AS n FROM tbase),
j AS (SELECT cv.g1, cv.g2, cv.n_cv, cls.n_c, vv.n_v, tot.n
      FROM cv JOIN cls USING (g1, g2) JOIN vv USING (sens) CROSS JOIN tot),
per AS (SELECT g1, g2, any_value(n_c) AS n_c, any_value(n) AS n,
               sum(abs(n_cv * n - n_v * n_c)) AS t1, sum(n_v) AS snv
        FROM j GROUP BY 1, 2)
SELECT CAST(g1 AS VARCHAR) || '|' || g2 AS class_key,
       CAST(n_c AS BIGINT) AS class_size,
       CAST(t1 + n_c * (n - snv) AS BIGINT) AS tv_num,
       CAST(n AS BIGINT) AS n_total
FROM per
"""
)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class QueryDef:
    fn: Callable
    sql: str | None


_BASE_REGISTRY: dict[str, QueryDef] = {
    "mask_customer_name": QueryDef(q_mask_customer_name, SQL_MASK),
    "gen_numeric_acctbal": QueryDef(q_gen_numeric_acctbal, SQL_GEN_NUMERIC),
    "gen_numeric_buckets": QueryDef(q_gen_numeric_buckets, SQL_GEN_NUMERIC_BUCKETS),
    "gen_date_orderdate": QueryDef(q_gen_date_orderdate, SQL_GEN_DATE),
    "gen_date_buckets": QueryDef(q_gen_date_buckets, SQL_GEN_DATE_BUCKETS),
    "gen_object_geo": QueryDef(q_gen_object_geo, SQL_GEN_OBJECT),
    "rand_window_scale": QueryDef(q_rand_window_scale, SQL_RAND_WINDOW),
    "rand_numeric_acctbal": QueryDef(q_rand_numeric_acctbal, SQL_RAND_NUMERIC),
    "kpi_classes": QueryDef(q_kpi_classes, SQL_KPI_CLASSES),
    "kpi_k_anonymity": QueryDef(q_kpi_k_anonymity, SQL_KPI_K_ANONYMITY),
    "kpi_l_diversity": QueryDef(q_kpi_l_diversity, SQL_KPI_L_DIVERSITY),
    "kpi_t_closeness": QueryDef(q_kpi_t_closeness, SQL_KPI_T_CLOSENESS),
    "anonymize_customer": QueryDef(q_anonymize_customer, SQL_ANONYMIZE_CUSTOMER),
    "anonymize_original_names": QueryDef(
        q_anonymize_original_names, SQL_ANONYMIZE_ORIGINAL_NAMES
    ),
    "flat_lift_triples": QueryDef(q_flat_lift_triples, SQL_FLAT_LIFT),
    "used_properties": QueryDef(q_used_properties, SQL_USED_PROPERTIES),
}


# Driver correctness runs sample a prefix of the registry. Round-5 rotation:
# this list is exactly the 239 entries NEVER sampled by any driver gate
# (r1-r4 cumulatively covered 109 distinct queries), oldest registry modules
# first — so CORRECTNESS_r05's 50-entry prefix extends cumulative driver
# coverage past 159. All are green via tests/test_oracles.py and the
# full-registry sf0.001/sf0.01 sweeps recorded in BASELINE.md.
_DRIVER_PRIORITY: list[str] = [
    "kpi_l_diversity",
    "kpi_t_closeness",
    "kg_incremental_merge",
    "kg_bgp_query",
    "kg_ntriples_roundtrip",
    "kg_incremental_dedup",
    "kg_path_reach",
    "kg_rdfs_closure",
    "kg_type_inference",
    "kg_entity_cooccurrence",
    "multimodal_jpeg_stats",
    "join_anti_customers",
    "events_interval_join",
    "events_sliding_count",
    "events_window_funcs",
    "corpus_pack",
    "stats_group_quantiles",
    "sample_stratified",
    "graph_triangles",
    "bm25_topk",
    "text_redact",
    "text_repetition",
    "text_decontaminate",
    "corpus_shuffle",
    "corpus_split",
    "text_chunks",
    "corpus_mix",
    "text_dup_spans",
    "corpus_quality_gate",
    "dedup_semantic",
    "text_normalize",
    "text_unigram_nll",
    "top_orders_per_customer",
    "text_dsir",
    "graph_bfs_reach",
    "multimodal_wav_stats",
    "multimodal_video_stats",
    "text_paragraph_dedup",
    "cluster_kmeans",
    "agg_rollup",
    "stats_histogram",
    "join_full_outer",
    "events_funnel",
    "events_json_extract",
    "stats_corr",
    "events_retention",
    "join_bloom_semi",
    "dedup_url_canonical",
    "stats_entropy",
    "sample_weighted",
    "text_tfidf_topterms",
    "text_collocations",
    "events_sliding_distinct",
    "multimodal_image_dedup",
    "events_anomaly_zscore",
    "graph_jaccard_parts",
    "events_markov_transitions",
    "dedup_editdist",
    "stats_mad",
    "events_ntile",
    "graph_kcore",
    "text_classifier_score",
    "events_percent_rank",
    "stats_cms",
    "text_bpe_train",
    "tpch_q3_top_orders",
    "tpch_q5_local_volume",
    "corpus_token_budget",
    "url_blocklist_filter",
    "dp_randomized_response",
    "events_resample",
    "stats_ols",
    "tpch_q10_returned",
    "text_winnowing",
    "embed_centroids",
    "agg_cube",
    "part_min_supplier",
    "stats_group_mode",
    "tpch_q4_order_priority",
    "sample_per_group",
    "corpus_interleave",
    "dedup_prefix",
    "anonymize_pseudonym",
    "anonymize_suppress",
    "events_rate_limit",
    "stats_group_hll",
    "tpch_q6_forecast",
    "tpch_q14_promo",
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q18_large_orders",
    "tpch_q22_global",
    "set_nations",
    "stats_group_distinct",
    "agg_crosstab",
    "anonymize_microagg",
    "anonymize_winsorize",
    "dp_binomial_counts",
    "events_user_path",
    "graph_hits",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q16_supplier_cnt",
    "tpch_q7_nation_volume",
    "multimodal_resize",
    "events_ema",
    "stats_misra_gries",
    "tpch_q11_important_parts",
    "tpch_q8_market_share",
    "tpch_q21_sole_late",
    "stats_quantile_cont",
    "tpch_q9_profit",
    "tpch_q20_dominant_supplier",
    "stats_rank_sketch",
    "corpus_split_leakage",
    "stats_ks_drift",
    "dedup_containment",
    "embed_quantize_int8",
    "corpus_temperature_mix",
    "corpus_version_diff",
    "stats_profile",
    "stats_group_rank_sketch",
    "ann_pq_topk",
    "join_skew_hot",
    "events_nearest_join",
    "text_group_top_terms",
    "text_zipf_slope",
    "stats_group_outliers",
    "impute_group_mean",
    "union_schema_evolve",
    "corpus_jsonl_roundtrip",
    "embed_scatter_matrix",
    "events_rolling_sum",
    "embed_knn_classify",
    "kg_delete_subjects",
    "layout_zorder",
    "dedup_bloom_cross",
    "events_dedup_window",
    "corpus_compact_roundtrip",
    "events_twap",
    "join_fuzzy_names",
    "stats_group_winsorized",
    "agg_rollup_priority",
    "embed_kmeans",
    "events_cohort_matrix",
    "events_attribution",
    "stats_group_corr",
    "kg_upsert_store",
    "events_funnel_windowed",
    "orders_market_basket",
    "dq_lineitem_audit",
    "stats_weighted_median",
    "corpus_split_dedup_aware",
    "stats_group_auc",
    "text_gopher_rules",
    "kg_sameas_rewrite",
    "kg_validate_shacl",
    "kg_concept_tags",
    "stats_gini",
    "events_scd2",
    "kg_link_graph",
    "kg_link_canonical",
    "kg_host_graph",
    "kg_anchor_stats",
    "events_valid_at",
    "text_phrase_search",
    "graph_walk_sample",
    "kg_link_pagerank",
    "corpus_boilerplate_terms",
    "corpus_stratified_sample",
    "kg_crawl_frontier",
    "kg_anchor_naming",
    "kg_redirect_resolve",
    "kg_predicate_stats",
    "kg_negative_samples",
    "corpus_csv_roundtrip",
    "dedup_cluster_sizes",
    "text_bigram_nll",
    "events_rolling_dau",
    "graph_reciprocity",
    "corpus_assign_ids",
    "stats_ntile",
    "kg_ifp_candidates",
    "kg_incremental_degree",
    "corpus_partitioned_write",
    "orders_skyline",
    "events_grouping_sets",
    "kg_construct_query",
    "kg_describe_subgraph",
    "kg_entity_salience",
    "stats_key_skew",
    "kg_adjacency_export",
    "ab_experiment",
    "kg_wl_colors",
    "kg_optional_bgp",
    "kg_ask_query",
    "orders_zorder",
    "events_gapfill",
    "corpus_schema_drift",
    "er_fuzzy_link",
    "events_funnel_window",
    "stats_kll",
    "corpus_zonemap_prune",
    "graph_label_prop",
    "kg_named_graph_query",
    "kg_property_path",
    "kg_select_aggregate",
    "crawl_sitemap_roundtrip",
    "spatial_radius_join",
    "kpi_delta_presence",
    "graph_topo_layers",
    "stats_theta_intersect",
    "corpus_bloom_prune",
    "text_sentences",
    "er_golden_record",
    "corpus_curriculum_order",
    "crawl_politeness_schedule",
    "kg_path_bounded_rep",
    "text_readability",
    "graph_hub_ablation",
    "events_seasonal_backtest",
    "text_compression_gate",
    "corpus_domain_cap",
    "kg_lineage_audit",
    "er_sorted_neighborhood",
    "embed_gram_matrix",
    "events_cusum_drift",
    "events_activity_streak",
    "orders_abc_classes",
    "dedup_minhash_recall_gate",
    "stats_bootstrap_ci",
    "stats_permutation_test",
    "corpus_quality_stack",
    "kg_reify_roundtrip",
    "multimodal_bmp_stats",
    "crawl_frontier_fused",
    "corpus_multi_format_union",
    "stats_theta_union",
]


def _full_registry() -> dict[str, QueryDef]:
    from .queries_extras import EXTRAS_REGISTRY
    from .queries_extras2 import EXTRAS2_REGISTRY
    from .queries_extras3 import EXTRAS3_REGISTRY
    from .queries_extras4 import EXTRAS4_REGISTRY
    from .queries_extras5 import EXTRAS5_REGISTRY
    from .queries_extras6 import EXTRAS6_REGISTRY
    from .queries_extras7 import EXTRAS7_REGISTRY
    from .queries_extras8 import EXTRAS8_REGISTRY
    from .queries_extras9 import EXTRAS9_REGISTRY
    from .queries_extras10 import EXTRAS10_REGISTRY
    from .queries_kg import KG_REGISTRY

    merged = dict(_BASE_REGISTRY)
    merged.update(KG_REGISTRY)
    merged.update(EXTRAS_REGISTRY)
    merged.update(EXTRAS2_REGISTRY)
    merged.update(EXTRAS3_REGISTRY)
    merged.update(EXTRAS4_REGISTRY)
    merged.update(EXTRAS5_REGISTRY)
    merged.update(EXTRAS6_REGISTRY)
    merged.update(EXTRAS7_REGISTRY)
    merged.update(EXTRAS8_REGISTRY)
    merged.update(EXTRAS9_REGISTRY)
    merged.update(EXTRAS10_REGISTRY)
    out = {k: merged.pop(k) for k in _DRIVER_PRIORITY if k in merged}
    out.update(merged)
    return out


def __getattr__(name: str):
    # lazy REGISTRY avoids a circular import (queries_extras/_kg import
    # helpers from this module)
    if name == "REGISTRY":
        return _full_registry()
    raise AttributeError(name)
