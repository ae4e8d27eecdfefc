"""Round-4 waves 39+ operators with DuckDB oracles: content-defined
chunking, per-key rank columns, the SPARQL solution-modifier surface
(FILTER / VALUES / MINUS), transitive property paths, link-graph structure
metrics (assortativity, modularity) and the temporal as-of KG snapshot.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import QueryDef, load

EXTRAS9_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# content-defined chunking
# --------------------------------------------------------------------------

def q_corpus_cdc_chunks(sf_dir: str):
    """Content-defined chunk stats over the document corpus: a chunk
    boundary falls after token i when the 3-token window hash
    ``(7·len(t_{i-2}) + 31·len(t_{i-1}) + 101·len(t_i)) % 13 == 0`` —
    insert-stable chunking (CDC), fully vectorized, shuffle-free (a doc is
    one row, chunk ids are a per-batch cumsum reset at doc starts)."""
    from .extras.chunk import cdc_chunk_stats

    docs = load(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_chunk_stats(docs, text_col="text", id_col="doc_id", mod=13)


# the oracle replays the rolling hash with window functions: per-doc token
# positions from generate_series, the 3-token window via lag, chunk id =
# boundaries strictly BEFORE the token (exclusive running sum)
SQL_CORPUS_CDC_CHUNKS = """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
t AS (
  SELECT doc_id, i, length(toks[i]) AS ln
  FROM tok, unnest(generate_series(1, len(toks))) AS u(i)
),
b AS (
  SELECT doc_id, i,
         CASE WHEN i >= 3
              AND (7 * lag(ln, 2) OVER w + 31 * lag(ln, 1) OVER w
                   + 101 * ln) % 13 = 0
              THEN 1 ELSE 0 END AS bnd
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
c AS (
  SELECT doc_id,
         coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM b
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM c GROUP BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# per-key rank column
# --------------------------------------------------------------------------

def q_orders_rank_per_key(sf_dir: str):
    """Per-customer 0-based order rank as a column (``row_number() - 1``
    partitioned by customer, ordered by date with key tie-break) —
    util.rank_per_key: one range sort, per-block segment ranks, driver-folded
    boundary carries; no per-group UDF at any key cardinality."""
    from .util import rank_per_key

    orders = load(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    ranked = rank_per_key(
        orders, "o_custkey", "o_orderdate", tie_col="o_orderkey", rank_col="rn"
    )
    return ranked.select_columns(["o_orderkey", "o_custkey", "rn"])


SQL_ORDERS_RANK_PER_KEY = """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS rn
FROM orders
"""


EXTRAS9_REGISTRY.update(
    {
        "corpus_cdc_chunks": QueryDef(q_corpus_cdc_chunks, SQL_CORPUS_CDC_CHUNKS),
        "orders_rank_per_key": QueryDef(q_orders_rank_per_key, SQL_ORDERS_RANK_PER_KEY),
    }
)


# --------------------------------------------------------------------------
# wave 40: SPARQL solution modifiers — FILTER, VALUES, MINUS
# --------------------------------------------------------------------------

def _canonical_triples(sf_dir: str):
    from .kg.pipeline import kg_pipeline

    return (
        kg_pipeline(sf_dir, anonymize=False)
        .triples.select_columns(["subj", "pred", "obj", "obj_kind"])
        .materialize()
    )


def q_kg_filter_query(sf_dir: str):
    """SPARQL FILTER over BGP bindings: `?c hasAccountBalance ?bal . ?c
    basedIn ?n . FILTER(xsd:double(?bal) > 5000 && ?n != <urn:nation:3>)` —
    one vectorized compute-kernel pass per batch, numeric casts null (and so
    eliminate) non-numeric surface forms per SPARQL error semantics."""
    from .kg.algebra import filter_bindings
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir),
        [("?c", "hasAccountBalance", "?bal"), ("?c", "basedIn", "?n")],
        select=["?c", "?bal", "?n"],
    )
    return filter_bindings(b, [("bal", ">", 5000), ("n", "!=", "urn:nation:3")])


SQL_KG_FILTER = """
SELECT 'urn:cust:' || c_custkey AS c, CAST(c_acctbal AS VARCHAR) AS bal,
       'urn:nation:' || c_nationkey AS n
FROM customer
WHERE c_acctbal IS NOT NULL AND c_acctbal > 5000 AND c_nationkey != 3
"""


def q_kg_values_query(sf_dir: str):
    """SPARQL VALUES inline-data restriction: `?c basedIn ?n . VALUES (?n)
    {(<urn:nation:1>) (<urn:nation:4>) (<urn:nation:7>)}` — the tuple block
    broadcasts once (ray.put) and every batch filters with one is_in over a
    packed key; no shuffle for inline data."""
    from .kg.algebra import values_bindings
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir),
        [("?c", "basedIn", "?n")],
        select=["?c", "?n"],
    )
    return values_bindings(
        b, ["n"], [("urn:nation:1",), ("urn:nation:4",), ("urn:nation:7",)]
    )


SQL_KG_VALUES = """
SELECT 'urn:cust:' || c_custkey AS c, 'urn:nation:' || c_nationkey AS n
FROM customer WHERE c_nationkey IN (1, 4, 7)
"""


def q_kg_minus_query(sf_dir: str):
    """SPARQL MINUS: `{ ?n partOf ?r } MINUS { ?s operatesIn ?n . FILTER(?s
    in first six) }` — nations (with their region) where none of the first
    six suppliers operates. Anti semi-join on the shared variable's packed
    key; broadcast because the minus side's distinct key set is
    nation-sized. (The fixed supplier set keeps the result nonempty at
    EVERY sf — an unrestricted minus side covers all 25 nations from
    sf0.01 up, which would degenerate the query to an empty result.)"""
    import pyarrow.compute as _pc

    from .kg.algebra import minus_bindings
    from .kg.bgp import match_bgp

    tri = _canonical_triples(sf_dir).union(_supplier_triples_w40(sf_dir)).materialize()
    req = match_bgp(tri, [("?n", "partOf", "?r")], select=["?n", "?r"])
    sub = match_bgp(tri, [("?s", "operatesIn", "?n")], select=["?s", "?n"])

    def _first_six(b: pa.Table) -> pa.Table:
        k = _pc.cast(
            _pc.struct_field(
                _pc.extract_regex(b.column("s"), r"urn:supp:(?P<k>\d+)"), "k"
            ),
            pa.int64(),
        )
        return b.filter(_pc.less(k, 6))

    return minus_bindings(req, sub.map_batches(_first_six, batch_format="pyarrow"))


def _supplier_triples_w40(sf_dir: str):
    from .queries_extras8 import _supplier_triples

    return _supplier_triples(sf_dir)


SQL_KG_MINUS = """
SELECT 'urn:nation:' || n_nationkey AS n, 'urn:region:' || n_regionkey AS r
FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_suppkey < 6)
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_filter_query": QueryDef(q_kg_filter_query, SQL_KG_FILTER),
        "kg_values_query": QueryDef(q_kg_values_query, SQL_KG_VALUES),
        "kg_minus_query": QueryDef(q_kg_minus_query, SQL_KG_MINUS),
    }
)


# --------------------------------------------------------------------------
# wave 41: transitive property paths (SPARQL ArbitraryLengthPath)
# --------------------------------------------------------------------------

def q_kg_path_kleene(sf_dir: str):
    """SPARQL 1.1 transitive property path `basedIn/partOf*`: every
    customer paired with its nation (zero hops of partOf) AND its region
    (one hop) — `*` is the set-valued ArbitraryLengthPath closed by
    iterated-squaring hash joins plus the zero-length identity over graph
    terms; the outer sequence join stays bag-semantics per the spec."""
    from .kg.paths import eval_path

    return eval_path(_canonical_triples(sf_dir), "basedIn/partOf*")


SQL_KG_PATH_KLEENE = """
SELECT 'urn:cust:' || c_custkey AS s, 'urn:nation:' || c_nationkey AS o
FROM customer
UNION ALL
SELECT 'urn:cust:' || c_custkey, 'urn:region:' || n_regionkey
FROM customer JOIN nation ON n_nationkey = c_nationkey
"""


EXTRAS9_REGISTRY.update(
    {"kg_path_kleene": QueryDef(q_kg_path_kleene, SQL_KG_PATH_KLEENE)}
)


# --------------------------------------------------------------------------
# wave 42: link-graph structure metrics — assortativity, modularity
# --------------------------------------------------------------------------

def q_graph_assortativity(sf_dir: str):
    """Degree assortativity of the extracted hyperlink graph (Newman's r:
    do well-linked pages link to well-linked pages?) — exact int64 degree
    moments over the symmetrized edge multiset, folded in Python ints, one
    double division at the end (bit-equal to the oracle's HUGEINT replica).

    Runs on the deterministic (src+dst)%7 != 0 edge subsample: the full
    fixture link graph is 3-regular in BOTH directions (the link
    coefficients are bijections mod n_docs), so its degree variance is zero
    and r is undefined — the mod-7 subsample breaks the regularity (7 is
    coprime to the fixture's n_docs, unlike 4, where the residue collapses
    to an affine invariant that never hits 0) while staying a one-line SQL
    mirror."""
    import pyarrow.compute as _pc

    from .extras.graph import degree_assortativity
    from .queries_extras8 import _int_link_edges

    def _sample(b: pa.Table) -> pa.Table:
        s = b.column("src")
        d = b.column("dst")
        import numpy as np

        sv = s.to_numpy(zero_copy_only=False)
        dv = d.to_numpy(zero_copy_only=False)
        return b.filter(pa.array((sv + dv) % 7 != 0))

    edges = _int_link_edges(sf_dir).map_batches(_sample, batch_format="pyarrow")
    return degree_assortativity(edges)


def _sql_assortativity() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    return f"""
WITH {_SQL_LINKS_CTE.strip()},
ed AS (SELECT doc_id AS src, t AS dst FROM e),
eds AS (SELECT src, dst FROM ed WHERE (src + dst) % 7 <> 0),
sym AS (SELECT src AS a, dst AS b FROM eds UNION ALL SELECT dst, src FROM eds),
deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
dd AS (SELECT da.d AS x, db.d AS y
       FROM sym JOIN deg da ON da.node = sym.a JOIN deg db ON db.node = sym.b),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM dd)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sx AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS r
FROM m
"""


def q_graph_modularity(sf_dir: str):
    """Newman modularity Q of the label-propagation communities over the
    hyperlink graph — the standard 'did community detection find real
    structure?' check. intra-edge count via two hash joins tagging each
    symmetric edge with its endpoint communities; per-community degree sums
    through sort-scan sum_per_key; ΣD_c² as guarded int64 partials. Doubles
    are computed from exact ints in the same expression shape as the SQL."""
    from .extras.graph import label_propagation, modularity
    from .queries_extras8 import _int_link_edges

    edges = _int_link_edges(sf_dir).materialize()
    labels = label_propagation(edges, rounds=2)
    return modularity(edges, labels)


def _sql_modularity() -> str:
    from .queries_extras8 import _label_prop_ctes

    ctes = _label_prop_ctes(2)
    return (
        "WITH "
        + ",\n".join(ctes)
        + """,
lab AS (SELECT node, lab FROM l2),
deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
mm AS (SELECT count(*) AS m2 FROM sym),
ii AS (SELECT count(*) AS intra
       FROM sym JOIN lab x ON x.node = sym.a JOIN lab y ON y.node = sym.b
       WHERE x.lab = y.lab),
dc AS (SELECT x.lab, CAST(sum(d.d) AS BIGINT) AS dsum
       FROM deg d JOIN lab x ON x.node = d.node GROUP BY x.lab),
sq AS (SELECT CAST(sum(CAST(dsum AS HUGEINT) * dsum) AS HUGEINT) AS ssq FROM dc)
SELECT CAST(mm.m2 AS BIGINT) AS m2, CAST(ii.intra AS BIGINT) AS intra,
       CAST(ii.intra AS DOUBLE) / mm.m2
         - CAST(sq.ssq AS DOUBLE) / (CAST(mm.m2 AS DOUBLE) * mm.m2) AS q
FROM mm, ii, sq
"""
    )


EXTRAS9_REGISTRY.update(
    {
        "graph_assortativity": QueryDef(q_graph_assortativity, _sql_assortativity()),
        "graph_modularity": QueryDef(q_graph_modularity, _sql_modularity()),
    }
)


# --------------------------------------------------------------------------
# wave 43: temporal as-of KG snapshot (multi-crawl supersedence)
# --------------------------------------------------------------------------

def q_kg_asof_snapshot(sf_dir: str):
    """KG 'as of' time T over a multi-crawl page store: per url, the latest
    capture with warc_ts <= T wins (v2 recrawls with bumped balances
    supersede the base crawl; the post-T v3 crawl is invisible), then the
    standard extract→link→canonicalize pass runs on exactly that snapshot.
    Winner selection is one full-row topk_per_key(k=1) sort-scan — no
    per-group UDF, html rides one all-to-all (kg/temporal.pages_asof)."""
    from .kg.pipeline import kg_pipeline
    from .kg.temporal import ASOF_T_US, pages_asof, synthesize_recrawls

    pages = pages_asof(synthesize_recrawls(sf_dir), ASOF_T_US)
    return kg_pipeline(
        sf_dir, pages=pages, anonymize=False, dedup_pages=False
    ).triples.select_columns(["subj", "pred", "obj", "obj_kind"])


SQL_KG_ASOF = """
WITH nn AS (SELECT count(*) AS c FROM documents)
SELECT 'urn:cust:' || c_custkey AS subj, 'hasAccountBalance' AS pred,
       CAST(CASE WHEN (c_custkey % nn.c) % 5 = 0 THEN c_acctbal + 1000.0
                 ELSE c_acctbal END AS VARCHAR) AS obj,
       'double' AS obj_kind
FROM customer, nn WHERE c_acctbal IS NOT NULL
UNION ALL
SELECT 'urn:cust:' || c_custkey, 'basedIn', 'urn:nation:' || c_nationkey, 'iri'
FROM customer
UNION ALL
SELECT 'urn:nation:' || n_nationkey, 'partOf', 'urn:region:' || n_regionkey, 'iri'
FROM nation
"""


EXTRAS9_REGISTRY.update(
    {"kg_asof_snapshot": QueryDef(q_kg_asof_snapshot, SQL_KG_ASOF)}
)


# --------------------------------------------------------------------------
# wave 44: SPARQL SELECT modifiers — GROUP BY + HAVING, ORDER/LIMIT/OFFSET,
# DISTINCT
# --------------------------------------------------------------------------

def _balance_bindings(sf_dir: str, with_nation: bool):
    """Bindings with an exact-cents column derived from the literal surface
    form (shortest-roundtrip repr parses back to the identical double, so
    cents match the oracle's round(c_acctbal * 100) bit-for-bit)."""
    import pyarrow.compute as _pc

    from .kg.bgp import match_bgp

    pats = [("?c", "hasAccountBalance", "?bal")]
    sel = ["?c", "?bal"]
    if with_nation:
        pats.append(("?c", "basedIn", "?n"))
        sel.append("?n")
    b = match_bgp(_canonical_triples(sf_dir), pats, select=sel)

    def _cents(t: pa.Table) -> pa.Table:
        v = _pc.cast(
            _pc.round(_pc.multiply(_pc.cast(t.column("bal"), pa.float64()), 100.0)),
            pa.int64(),
        )
        return t.append_column("bal_cents", v)

    return b.map_batches(_cents, batch_format="pyarrow")


def q_kg_group_having(sf_dir: str):
    """SPARQL GROUP BY + HAVING with SUM/COUNT/AVG: `SELECT ?n (SUM ...)
    (COUNT ...) (AVG ...) GROUP BY ?n HAVING (COUNT(*) >= 7)` — one
    fold_per_key pass (Arrow-C partials, narrow sort, per-block folds,
    edge-key driver merge), sums in exact cents so the fold is
    reduction-order-proof, AVG as one double expression over (sum, count)
    mirrored verbatim in SQL."""
    import pyarrow.compute as _pc

    from .kg.algebra import aggregate_bindings

    b = _balance_bindings(sf_dir, with_nation=True)
    g = aggregate_bindings(
        b,
        ["n"],
        [("sum", "bal_cents", "sum_cents"), ("count", None, "n_cust")],
        having=[("n_cust", ">=", 7)],
    )

    def _avg(t: pa.Table) -> pa.Table:
        s = _pc.cast(t.column("sum_cents"), pa.float64())
        n = _pc.cast(t.column("n_cust"), pa.float64())
        return t.append_column("avg_bal", _pc.divide(s, _pc.multiply(n, 100.0)))

    return g.map_batches(_avg, batch_format="pyarrow")


SQL_KG_GROUP_HAVING = """
WITH b AS (SELECT c_nationkey AS nk,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer WHERE c_acctbal IS NOT NULL),
g AS (SELECT nk, sum(cents) AS sum_cents, count(*) AS n_cust
      FROM b GROUP BY nk HAVING count(*) >= 7)
SELECT 'urn:nation:' || nk AS n, CAST(sum_cents AS BIGINT) AS sum_cents,
       CAST(n_cust AS BIGINT) AS n_cust,
       CAST(sum_cents AS DOUBLE) / (CAST(n_cust AS DOUBLE) * 100.0) AS avg_bal
FROM g
"""


def q_kg_order_limit(sf_dir: str):
    """SPARQL ORDER BY ... LIMIT ... OFFSET ...: the 10 highest-balance
    customers after skipping the top 2 (ties broken by the customer IRI so
    the window is partition-independent). One range sort + head gather
    bounded by offset+limit."""
    from .kg.algebra import order_limit_bindings

    b = _balance_bindings(sf_dir, with_nation=False).select_columns(
        ["c", "bal_cents"]
    )
    return order_limit_bindings(b, [("bal_cents", True), ("c", False)], 10, offset=2)


SQL_KG_ORDER_LIMIT = """
SELECT 'urn:cust:' || c_custkey AS c,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
FROM customer WHERE c_acctbal IS NOT NULL
ORDER BY bal_cents DESC, c LIMIT 10 OFFSET 2
"""


def q_kg_distinct_query(sf_dir: str):
    """SELECT DISTINCT ?n WHERE { ?c basedIn ?n } — the solution-sequence
    DISTINCT modifier as a sort + boundary-scan set fold (never a Ray
    groupby)."""
    from .kg.algebra import distinct_bindings
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir), [("?c", "basedIn", "?n")], select=["?n"]
    )
    return distinct_bindings(b, ["n"])


SQL_KG_DISTINCT = """
SELECT DISTINCT 'urn:nation:' || c_nationkey AS n FROM customer
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_group_having": QueryDef(q_kg_group_having, SQL_KG_GROUP_HAVING),
        "kg_order_limit": QueryDef(q_kg_order_limit, SQL_KG_ORDER_LIMIT),
        "kg_distinct_query": QueryDef(q_kg_distinct_query, SQL_KG_DISTINCT),
    }
)


# --------------------------------------------------------------------------
# wave 45: hash-bucketed layout + shuffle-free co-located join
# --------------------------------------------------------------------------

def q_join_bucketed_colocated(sf_dir: str):
    """The pay-the-shuffle-ONCE layout pattern: orders and customer are each
    hash-bucketed by custkey into parquet directories (one all-to-all per
    table, at write time), then the equi-join runs as B independent
    in-memory Arrow bucket joins — zero repartition, zero join shuffle at
    read; on a real cluster bucket b of both tables co-locates on one node.
    The oracle is the plain SQL join: any bucket-function mismatch between
    the two sides would lose rows and fail the compare."""
    from .extras.bucketed import bucketed_join, write_bucketed

    base = f"/tmp/anonray_bucketed_{abs(hash(sf_dir)) % 10**8}"
    B = 8
    orders = load(sf_dir, "orders", ["o_orderkey", "o_custkey"]).rename_columns(
        {"o_custkey": "custkey"}
    )
    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"]).rename_columns(
        {"c_custkey": "custkey"}
    )
    da = write_bucketed(orders, f"{base}/orders", "custkey", B)
    db = write_bucketed(cust, f"{base}/customer", "custkey", B)
    return bucketed_join(da, db, "custkey", B)


SQL_JOIN_BUCKETED = """
SELECT o_orderkey, o_custkey AS custkey, c_nationkey
FROM orders JOIN customer ON c_custkey = o_custkey
"""


EXTRAS9_REGISTRY.update(
    {"join_bucketed_colocated": QueryDef(q_join_bucketed_colocated, SQL_JOIN_BUCKETED)}
)


# --------------------------------------------------------------------------
# wave 46: SPARQL UNION (null-padded binding union)
# --------------------------------------------------------------------------

def q_kg_union_query(sf_dir: str):
    """SPARQL UNION of two BGP groups with different variable sets:
    `{ ?c basedIn ?n } UNION { ?n partOf ?r }` — output schema is the
    variable union, each branch null-padded for its unbound variables
    (solution-sequence union per the spec); stateless pad + stream union,
    no shuffle."""
    from .kg.algebra import union_bindings
    from .kg.bgp import match_bgp

    tri = _canonical_triples(sf_dir)
    g1 = match_bgp(tri, [("?c", "basedIn", "?n")], select=["?c", "?n"])
    g2 = match_bgp(tri, [("?n", "partOf", "?r")], select=["?n", "?r"])
    return union_bindings([g1, g2])


SQL_KG_UNION = """
SELECT 'urn:cust:' || c_custkey AS c, 'urn:nation:' || c_nationkey AS n,
       CAST(NULL AS VARCHAR) AS r
FROM customer
UNION ALL
SELECT CAST(NULL AS VARCHAR), 'urn:nation:' || n_nationkey,
       'urn:region:' || n_regionkey
FROM nation
"""


EXTRAS9_REGISTRY.update(
    {"kg_union_query": QueryDef(q_kg_union_query, SQL_KG_UNION)}
)


# --------------------------------------------------------------------------
# wave 47: triple provenance witnesses + SPARQL BIND
# --------------------------------------------------------------------------

def q_kg_provenance_witness(sf_dir: str):
    """Per-entity provenance (the lineage the north star requires at the
    row level): for every linked entity, how many DISTINCT pages witness it
    and the lexicographically first witness url — mention stream from the
    real extraction pass, variant surface forms normalized, distinct
    (entity, url) set fold, then ONE fold_per_key pass (count + min)."""
    import pyarrow.compute as _pc

    from .kg.extract import extract_mentions
    from .kg.pages import synthesize_pages
    from .util import distinct_rows, fold_per_key

    mentions = extract_mentions(
        synthesize_pages(sf_dir).select_columns(["url", "html"])
    )

    def _ent(batch: pa.Table) -> pa.Table:
        based = batch.filter(_pc.equal(batch.column("pred"), "basedIn"))
        part = batch.filter(_pc.equal(batch.column("pred"), "partOf"))
        ent_b = _pc.utf8_upper(
            _pc.replace_substring(based.column("obj").combine_chunks(), "_", " ")
        )
        t1 = pa.table({"ent": ent_b, "url": based.column("url").combine_chunks()})
        t2 = pa.table(
            {
                "ent": part.column("subj").combine_chunks(),
                "url": part.column("url").combine_chunks(),
            }
        )
        return pa.concat_tables([t1, t2])

    pairs = distinct_rows(
        mentions.map_batches(_ent, batch_format="pyarrow"), ["ent", "url"]
    )
    return fold_per_key(
        pairs, "ent", {"n_witness": ("count", None), "first_url": ("min", "url")}
    )


SQL_KG_PROVENANCE = """
WITH nn AS (SELECT count(*) AS c FROM documents),
w AS (
  SELECT upper(replace(n.n_name, '_', ' ')) AS ent,
         'https://example.org/doc/' || (c_custkey % nn.c) AS url
  FROM customer JOIN nation n ON n_nationkey = c_nationkey, nn
  UNION
  SELECT n_name, 'https://example.org/doc/' || (n_nationkey % nn.c)
  FROM nation, nn
)
SELECT ent, CAST(count(*) AS BIGINT) AS n_witness, min(url) AS first_url
FROM w GROUP BY ent
"""


def q_kg_bind_query(sf_dir: str):
    """SPARQL BIND(CONCAT(?n, '>', ?r) AS ?nr): computed variables appended
    by one vectorized kernel chain per batch — no shuffle, no UDF rows."""
    from .kg.algebra import bind_bindings
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir), [("?n", "partOf", "?r")], select=["?n", "?r"]
    )
    return bind_bindings(b, "nr", ("concat", ["n", ">", "r"]))


SQL_KG_BIND = """
SELECT 'urn:nation:' || n_nationkey AS n, 'urn:region:' || n_regionkey AS r,
       'urn:nation:' || n_nationkey || '>' || 'urn:region:' || n_regionkey AS nr
FROM nation
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_provenance_witness": QueryDef(q_kg_provenance_witness, SQL_KG_PROVENANCE),
        "kg_bind_query": QueryDef(q_kg_bind_query, SQL_KG_BIND),
    }
)


# --------------------------------------------------------------------------
# wave 48: VoID dataset description + FILTER (NOT) EXISTS
# --------------------------------------------------------------------------

def q_kg_void_description(sf_dir: str):
    """VoID dataset statistics for the constructed KG (the standard RDF
    ecosystem artifact: void:triples, void:distinctSubjects, void:properties,
    void:distinctObjects) — distinct counts via per-batch unique partials
    folded through exact_value_counts (sort-scan, no Ray groupby), one row
    out."""
    import pyarrow.compute as _pc

    from .extras.stats import exact_value_counts

    tri = _canonical_triples(sf_dir)
    n_triples = tri.count()

    def _distinct_count(col: str) -> int:
        proj = tri.map_batches(
            lambda b, _c=col: pa.table({_c: _pc.unique(b.column(_c))}),
            batch_format="pyarrow",
        )
        return exact_value_counts(proj, col).count()

    return pa.table(
        {
            "n_triples": pa.array([n_triples], pa.int64()),
            "n_subjects": pa.array([_distinct_count("subj")], pa.int64()),
            "n_properties": pa.array([_distinct_count("pred")], pa.int64()),
            "n_objects": pa.array([_distinct_count("obj")], pa.int64()),
        }
    )


SQL_KG_VOID = """
WITH canon AS (
  SELECT 'urn:cust:' || c_custkey AS subj, 'hasAccountBalance' AS pred,
         CAST(c_acctbal AS VARCHAR) AS obj
  FROM customer WHERE c_acctbal IS NOT NULL
  UNION ALL
  SELECT 'urn:cust:' || c_custkey, 'basedIn', 'urn:nation:' || c_nationkey
  FROM customer
  UNION ALL
  SELECT 'urn:nation:' || n_nationkey, 'partOf', 'urn:region:' || n_regionkey
  FROM nation
)
SELECT CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT pred) AS BIGINT) AS n_properties,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_objects
FROM canon
"""


def _order_triples(sf_dir: str):
    """Lifted placedOrder arm (urn:cust -> urn:order), 1997 orders."""
    import pyarrow.compute as _pc

    orders = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def _lift(b: pa.Table) -> pa.Table:
        # 1997 orders only — the group must actually split the outer block
        # (every customer has SOME order in this corpus)
        b = b.filter(_pc.equal(_pc.year(b.column("o_orderdate")), 1997))
        c = _pc.binary_join_element_wise(
            "urn:cust:", _pc.cast(b.column("o_custkey"), pa.string()), ""
        )
        o = _pc.binary_join_element_wise(
            "urn:order:", _pc.cast(b.column("o_orderkey"), pa.string()), ""
        )
        return pa.table({"c": c, "o": o})

    return orders.map_batches(_lift, batch_format="pyarrow")


def q_kg_not_exists(sf_dir: str):
    """SPARQL FILTER NOT EXISTS: customers (with nation) that placed no
    order in 1997 — anti semi-join on the shared variable's packed key (the
    correlated-subquery semantics, set-at-a-time)."""
    from .kg.algebra import exists_filter
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir), [("?c", "basedIn", "?n")], select=["?c", "?n"]
    )
    return exists_filter(b, _order_triples(sf_dir), negate=True)


SQL_KG_NOT_EXISTS = """
SELECT 'urn:cust:' || c_custkey AS c, 'urn:nation:' || c_nationkey AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_void_description": QueryDef(q_kg_void_description, SQL_KG_VOID),
        "kg_not_exists": QueryDef(q_kg_not_exists, SQL_KG_NOT_EXISTS),
    }
)


# --------------------------------------------------------------------------
# wave 49: SPARQL GROUP_CONCAT (ordered string aggregate)
# --------------------------------------------------------------------------

def q_kg_group_concat(sf_dir: str):
    """SPARQL GROUP_CONCAT(?n; separator='|') with ORDER: per region, the
    '|'-joined lexicographically-sorted member-nation IRIs —
    util.string_agg_per_key (one range sort, in-block run joins, 2 edge
    fragments per block to the driver; the events_user_path machinery,
    generalized)."""
    from .kg.bgp import match_bgp
    from .util import string_agg_per_key

    b = match_bgp(
        _canonical_triples(sf_dir), [("?n", "partOf", "?r")], select=["?r", "?n"]
    )
    return string_agg_per_key(b, "r", "n", sep="|", out_col="members")


SQL_KG_GROUP_CONCAT = """
SELECT 'urn:region:' || n_regionkey AS r,
       string_agg('urn:nation:' || n_nationkey, '|'
                  ORDER BY 'urn:nation:' || n_nationkey) AS members
FROM nation GROUP BY n_regionkey
"""


EXTRAS9_REGISTRY.update(
    {"kg_group_concat": QueryDef(q_kg_group_concat, SQL_KG_GROUP_CONCAT)}
)


# --------------------------------------------------------------------------
# wave 50: KG snapshot diff + vertically-partitioned triple store
# --------------------------------------------------------------------------

def q_kg_snapshot_diff(sf_dir: str):
    """Triple-level delta between two KG snapshots (base crawl vs as-of-T,
    the wave-43 temporal fixture): every (subj, pred, obj) tagged 'added'
    or 'removed'. Set difference in both directions via packed-key anti
    semi-joins — triples never gather; the recrawl bumps balances, so the
    delta is exactly the old/new hasAccountBalance rows of recrawled
    customers."""
    import pyarrow.compute as _pc

    from .extras.joins import semi_anti_join
    from .kg.pipeline import kg_pipeline
    from .kg.temporal import ASOF_T_US, pages_asof, synthesize_recrawls

    def _triples(pages=None):
        r = kg_pipeline(
            sf_dir, pages=pages, anonymize=False,
            dedup_pages=pages is None,
        )
        return r.triples.select_columns(["subj", "pred", "obj"])

    old = _triples().materialize()
    new = _triples(pages_asof(synthesize_recrawls(sf_dir), ASOF_T_US)).materialize()

    def _key(b: pa.Table) -> pa.Table:
        k = _pc.binary_join_element_wise(
            b.column("subj"), b.column("pred"), b.column("obj"), "\x1f"
        )
        return b.append_column("__k", k)

    ko = old.map_batches(_key, batch_format="pyarrow")
    kn = new.map_batches(_key, batch_format="pyarrow")
    removed = semi_anti_join(
        ko, kn.select_columns(["__k"]), on="__k", anti=True
    ).drop_columns(["__k"])
    added = semi_anti_join(
        kn, ko.select_columns(["__k"]), on="__k", anti=True
    ).drop_columns(["__k"])

    def _tag(label: str):
        def _f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "change", pa.array([label] * b.num_rows, pa.string())
            )

        return _f

    return removed.map_batches(_tag("removed"), batch_format="pyarrow").union(
        added.map_batches(_tag("added"), batch_format="pyarrow")
    )


SQL_KG_SNAPSHOT_DIFF = """
WITH nn AS (SELECT count(*) AS c FROM documents),
rec AS (SELECT c_custkey, c_acctbal FROM customer, nn
        WHERE c_acctbal IS NOT NULL AND (c_custkey % nn.c) % 5 = 0)
SELECT 'urn:cust:' || c_custkey AS subj, 'hasAccountBalance' AS pred,
       CAST(c_acctbal AS VARCHAR) AS obj, 'removed' AS change
FROM rec
UNION ALL
SELECT 'urn:cust:' || c_custkey, 'hasAccountBalance',
       CAST(c_acctbal + 1000.0 AS VARCHAR), 'added'
FROM rec
"""


def q_kg_vertical_partition(sf_dir: str):
    """Vertically-partitioned triple store (Abadi/SW-Store layout: one
    parquet directory PER PREDICATE): a constant-predicate pattern scan
    then reads ONLY its predicate's files — file-level pushdown, no
    filtering, no other predicate's bytes leave storage. Returns the
    basedIn partition read back, proving the partition is complete and
    exclusive (the oracle is the full basedIn arm)."""
    import ray.data as _rd

    tri = _canonical_triples(sf_dir)
    base = f"/tmp/anonray_vpart_{abs(hash(sf_dir)) % 10**8}"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    tri.write_parquet(base, partition_cols=["pred"])
    part = _rd.read_parquet(f"{base}/pred=basedIn")
    return part.select_columns(["subj", "obj", "obj_kind"])


SQL_KG_VERTICAL = """
SELECT 'urn:cust:' || c_custkey AS subj, 'urn:nation:' || c_nationkey AS obj,
       'iri' AS obj_kind
FROM customer
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_snapshot_diff": QueryDef(q_kg_snapshot_diff, SQL_KG_SNAPSHOT_DIFF),
        "kg_vertical_partition": QueryDef(q_kg_vertical_partition, SQL_KG_VERTICAL),
    }
)


# --------------------------------------------------------------------------
# wave 51: SPARQL subquery (inner SELECT + scalar-correlated outer FILTER)
# --------------------------------------------------------------------------

def q_kg_subquery(sf_dir: str):
    """SPARQL 1.1 subquery: `SELECT ?n ?cnt WHERE { { SELECT ?n (COUNT(?c)
    AS ?cnt) WHERE { ?c basedIn ?n } GROUP BY ?n } FILTER(?cnt >
    <corpus average>) }` — the inner SELECT is one fold_per_key pass; the
    comparison scalar folds from the SAME aggregate stream (two exact
    integers -> one double, driver-side, bounded) and the outer FILTER is a
    broadcast compare. Nations with above-average customer count."""
    import pyarrow.compute as _pc

    from .kg.algebra import aggregate_bindings
    from .kg.bgp import match_bgp

    b = match_bgp(
        _canonical_triples(sf_dir), [("?c", "basedIn", "?n")], select=["?c", "?n"]
    )
    inner = aggregate_bindings(
        b, ["n"], [("count", None, "cnt")]
    ).materialize()
    # scalar: avg group count = total bindings / group count (exact ints)
    parts = inner.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array([int(_pc.sum(t.column("cnt")).as_py() or 0)], pa.int64()),
                "g": pa.array([t.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    total = sum(r["s"] for r in parts)
    groups = sum(r["g"] for r in parts)
    avg = float(total) / float(groups)

    def _flt(t: pa.Table) -> pa.Table:
        return t.filter(
            _pc.greater(_pc.cast(t.column("cnt"), pa.float64()), avg)
        )

    return inner.map_batches(_flt, batch_format="pyarrow")


SQL_KG_SUBQUERY = """
WITH g AS (SELECT 'urn:nation:' || c_nationkey AS n,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM customer GROUP BY c_nationkey)
SELECT n, cnt FROM g
WHERE CAST(cnt AS DOUBLE) >
      (SELECT CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) FROM g)
"""


EXTRAS9_REGISTRY.update(
    {"kg_subquery": QueryDef(q_kg_subquery, SQL_KG_SUBQUERY)}
)


# --------------------------------------------------------------------------
# wave 52: watermark lateness + vocabulary-coverage (OOV) audit
# --------------------------------------------------------------------------

def q_events_watermark_late(sf_dir: str):
    """Streaming watermark semantics over the event log: an event is LATE
    when its timestamp trails the per-user high-water mark (max ts over
    earlier arrivals, arrival order = event_id) by more than one hour —
    the out-of-order classification every streaming ingest needs.
    `extras/window.per_key_prefix_max`: one range sort, per-block C cummax
    with key resets, driver-chained single-row carries."""
    import pyarrow.compute as _pc

    from .extras.window import per_key_prefix_max

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _us(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "event_id": b.column("event_id").combine_chunks(),
                "ts_us": _pc.cast(b.column("ts"), pa.timestamp("us")).cast(pa.int64()),
            }
        )

    pm = per_key_prefix_max(
        ev.map_batches(_us, batch_format="pyarrow"), "user_id", "event_id", "ts_us"
    )
    # late = ts < prev_max - 1h; first event per user is never late
    joined = pm.join(
        ev.map_batches(_us, batch_format="pyarrow").materialize(),
        join_type="inner",
        num_partitions=4,
        on=("user_id", "event_id"),
    )

    def _late(b: pa.Table) -> pa.Table:
        late = _pc.and_(
            _pc.is_valid(b.column("prev_max")),
            _pc.less(
                b.column("ts_us"),
                _pc.subtract(b.column("prev_max"), pa.scalar(3_600_000_000)),
            ),
        )
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "late": _pc.cast(_pc.fill_null(late, False), pa.int64()),
            }
        )

    return joined.map_batches(_late, batch_format="pyarrow")


SQL_EVENTS_WATERMARK = """
SELECT event_id,
       CAST(COALESCE(
         epoch_us(ts) < max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 3600000000,
         FALSE) AS BIGINT) AS late
FROM events
"""


def q_text_oov_rate(sf_dir: str):
    """Tokenizer-vocabulary coverage audit: build the corpus top-100
    vocabulary (count desc, token asc — deterministic), broadcast it, and
    report per-doc total vs out-of-vocabulary token counts. The pre-training
    sanity check that a tokenizer's vocab actually covers the corpus.
    One exact_value_counts fold for the vocab, one is_in scan for the
    audit; the corpus never shuffles."""
    import pyarrow.compute as _pc

    from .extras.stats import exact_value_counts

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        toks = _pc.split_pattern_regex(
            _pc.utf8_trim_whitespace(_pc.utf8_lower(b.column("text"))), r"\s+"
        )
        flat = _pc.list_flatten(toks)
        parent = _pc.list_parent_indices(toks)
        ids = b.column("doc_id").combine_chunks().take(parent)
        keep = _pc.not_equal(flat, "")
        return pa.table({"doc_id": ids.filter(keep), "t": flat.filter(keep)})

    tf = docs.map_batches(_tok, batch_format="pyarrow").materialize()
    counts = exact_value_counts(tf.select_columns(["t"]), "t")
    top = counts.sort(["n", "t"], descending=[True, False]).limit(100)
    import ray

    vocab_ref = ray.put(
        pa.concat_tables(
            [pa.table(b) for b in top.iter_batches(batch_format="pyarrow")]
        ).column("t").combine_chunks()
    )

    def _audit(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        oov = _pc.cast(
            _pc.invert(_pc.fill_null(_pc.is_in(b.column("t"), value_set=v), False)),
            pa.int64(),
        )
        g = (
            pa.table({"doc_id": b.column("doc_id"), "oov": oov})
            .group_by(["doc_id"])
            .aggregate([("oov", "sum"), ("oov", "count")])
        )
        return g.rename_columns(["doc_id", "n_oov", "n_tokens"])

    from .util import fold_per_key

    part = tf.map_batches(_audit, batch_format="pyarrow")
    return fold_per_key(
        part, "doc_id", {"n_oov": ("sum", "n_oov"), "n_tokens": ("sum", "n_tokens")}
    )


SQL_TEXT_OOV = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t FROM tok WHERE t <> ''),
vocab AS (SELECT t FROM (SELECT t, count(*) AS c FROM tf GROUP BY t
                         ORDER BY c DESC, t LIMIT 100)),
a AS (SELECT doc_id,
             CAST(sum(CASE WHEN t NOT IN (SELECT t FROM vocab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM tf GROUP BY doc_id)
SELECT doc_id, n_oov, n_tokens FROM a
"""


EXTRAS9_REGISTRY.update(
    {
        "events_watermark_late": QueryDef(q_events_watermark_late, SQL_EVENTS_WATERMARK),
        "text_oov_rate": QueryDef(q_text_oov_rate, SQL_TEXT_OOV),
    }
)


# --------------------------------------------------------------------------
# wave 53: generalization lattice search (Incognito-style minimal level)
# --------------------------------------------------------------------------

_LATTICE_LEVELS = (1, 2, 4, 8, 16)
_LATTICE_K = 4


def q_anonymize_lattice_search(sf_dir: str):
    """Incognito-style generalization-lattice search: for each candidate
    bucket count g (coarsest -> finest), the minimum joint equivalence-class
    size of (acctbal-bucket, nation) and whether it clears k=4 — the
    anonymizer then picks the finest accepted level (least information
    loss). One narrow (value, id) sort is SHARED by all levels (cut ranks
    are arithmetic on the same sorted column); per level one broadcast
    searchsorted assignment + packed-key sort-scan class counts + a bounded
    min fold. Null balances are excluded from the quasi-identifier, as in
    the reference's rank-based generalization."""
    import numpy as np
    import pyarrow.compute as _pc

    from .extras.stats import exact_value_counts
    from .stages.generalization import CODECS, _assignment_cut_pairs, assign_buckets_np
    from .util import sorted_column, valid_mask

    ds = load(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"])
    codec = CODECS["numeric"]
    sc = sorted_column(ds, "c_acctbal", "c_custkey", codec.to_numeric)
    k_total = sc.total

    rows = {"g": [], "min_class": [], "accepted": []}
    for g in _LATTICE_LEVELS:
        cut_v, cut_id = (
            _assignment_cut_pairs(sc, g) if g > 1 else (np.array([]), np.array([]))
        )

        def _classes(batch: pa.Table, _cv=cut_v, _ci=cut_id, _g=g) -> pa.Table:
            varr = codec.to_numeric(batch.column("c_acctbal"))
            valid = np.asarray(valid_mask(varr))
            v = varr.to_numpy(zero_copy_only=False).astype(np.float64)
            ids = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            b = np.zeros(len(v), dtype=np.int64)
            if _g > 1 and valid.any():
                b[valid] = assign_buckets_np(v[valid], ids[valid], _cv, _ci)
            key = b * 1000 + nk
            return pa.table({"cls": pa.array(key[valid], pa.int64())})

        counts = exact_value_counts(
            ds.map_batches(_classes, batch_format="pyarrow"), "cls"
        )
        mins = counts.map_batches(
            lambda t: pa.table(
                {"m": pa.array([int(_pc.min(t.column("n")).as_py())], pa.int64())}
            ),
            batch_format="pyarrow",
        ).take_all()
        mc = min(r["m"] for r in mins) if mins else 0
        rows["g"].append(g)
        rows["min_class"].append(mc)
        rows["accepted"].append(int(mc >= _LATTICE_K))
    return pa.table(
        {
            "g": pa.array(rows["g"], pa.int64()),
            "min_class": pa.array(rows["min_class"], pa.int64()),
            "accepted": pa.array(rows["accepted"], pa.int64()),
        }
    )


def _sql_lattice() -> str:
    levels = []
    for g in _LATTICE_LEVELS:
        levels.append(f"""
SELECT {g} AS g, min_class,
       CAST(min_class >= {_LATTICE_K} AS BIGINT) AS accepted
FROM (
  SELECT CAST(min(cnt) AS BIGINT) AS min_class FROM (
    SELECT (({g} * s.rnk) // st.k) * 1000 + c2.c_nationkey AS cls,
           count(*) AS cnt
    FROM (SELECT c_custkey AS id,
                 row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS rnk
          FROM customer WHERE c_acctbal IS NOT NULL) s
    CROSS JOIN (SELECT count(*) AS k FROM customer
                WHERE c_acctbal IS NOT NULL) st
    JOIN customer c2 ON c2.c_custkey = s.id
    GROUP BY 1
  )
)""")
    return "\nUNION ALL\n".join(levels)


EXTRAS9_REGISTRY.update(
    {
        "anonymize_lattice_search": QueryDef(
            q_anonymize_lattice_search, _sql_lattice()
        )
    }
)


# --------------------------------------------------------------------------
# wave 54: cost-based BGP join ordering
# --------------------------------------------------------------------------

def q_kg_bgp_optimized(sf_dir: str):
    """Cost-based BGP join ordering (`kg/bgp.optimize_pattern_order`): the
    query is WRITTEN worst-first — the huge hasAccountBalance scan leads,
    the single-nation partOf probe (one row after constants) comes last —
    and the optimizer reorders it most-selective-first under the
    connectivity constraint before the left-deep joins run. The result is
    join-order-invariant, so the oracle pins correctness while the unit
    test pins the chosen order."""
    from .kg.bgp import match_bgp, optimize_pattern_order

    tri = _canonical_triples(sf_dir)
    written = [
        ("?c", "hasAccountBalance", "?bal"),   # biggest arm first, on purpose
        ("?c", "basedIn", "?n"),
        ("?n", "partOf", "urn:region:2"),      # most selective, written last
    ]
    ordered = optimize_pattern_order(tri, written)
    return match_bgp(tri, ordered, select=["?c", "?bal", "?n"])


SQL_KG_BGP_OPTIMIZED = """
SELECT 'urn:cust:' || c_custkey AS c, CAST(c_acctbal AS VARCHAR) AS bal,
       'urn:nation:' || c_nationkey AS n
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal IS NOT NULL AND n_regionkey = 2
"""


EXTRAS9_REGISTRY.update(
    {"kg_bgp_optimized": QueryDef(q_kg_bgp_optimized, SQL_KG_BGP_OPTIMIZED)}
)


# --------------------------------------------------------------------------
# wave 55: dictionary-encoded triple store (RDF-3X / TDB NodeTable shape)
# --------------------------------------------------------------------------

def q_kg_term_dictionary(sf_dir: str):
    """The term dictionary itself (`kg/dictenc.build_term_dictionary`):
    every distinct subj/pred/obj term of the canonical graph mapped to a
    dense 0-based int64 id = its rank in global sorted term order — the
    deterministic assignment that makes the encoding SQL-replicable. One
    streaming unique-partial pass, one sort-scan distinct, ids stamped from
    block offsets (no second sort, no per-group aggregate)."""
    from .kg.dictenc import build_term_dictionary

    return build_term_dictionary(_canonical_triples(sf_dir))


def _sql_dict_terms() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH tri AS ({SQL_KG_CANONICAL}),
terms AS (
  SELECT subj AS term FROM tri
  UNION SELECT pred FROM tri
  UNION SELECT obj FROM tri
)
SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
FROM terms
"""


def q_kg_dict_bgp(sf_dir: str):
    """A BGP evaluated ENTIRELY in integer space over the dictionary-encoded
    store: `?c hasAccountBalance ?bal . ?c basedIn ?n . ?n partOf
    urn:region:2`. Terms encode once (predicates broadcast, subj/obj via the
    dictionary hash join); the three arms then filter and join on int64 ids
    (24 B/row moving through the shuffle instead of IRI text); only the
    result-sized final bindings decode back to surface forms. Most-selective
    arm (the constant-object partOf probe) leads the left-deep join."""
    from .kg.dictenc import (
        build_term_dictionary,
        decode_bindings,
        encode_triples,
        resolve_terms,
    )
    from .util import hash_join

    tri = _canonical_triples(sf_dir)
    d = build_term_dictionary(tri).materialize()
    enc = encode_triples(tri, d).materialize()
    ids = resolve_terms(
        d, ["hasAccountBalance", "basedIn", "partOf", "urn:region:2"]
    )

    import pyarrow.compute as pc

    def _arm(p_id: int, o_const: int | None, s_name: str, o_name: str | None):
        def _f(b: pa.Table) -> pa.Table:
            mask = pc.equal(b.column("p_id"), p_id)
            if o_const is not None:
                mask = pc.and_(mask, pc.equal(b.column("o_id"), o_const))
            t = b.filter(mask)
            cols = {s_name: t.column("s_id").combine_chunks()}
            if o_name is not None:
                cols[o_name] = t.column("o_id").combine_chunks()
            return pa.table(cols)

        return enc.map_batches(_f, batch_format="pyarrow")

    from .extras.joins import semi_anti_join
    from .util import default_num_partitions

    nparts = max(2, min(default_num_partitions(), 8))
    a_bal = _arm(ids["hasAccountBalance"], None, "c_id", "bal_id")
    a_geo = _arm(ids["basedIn"], None, "c_id", "n_id")
    a_reg = _arm(ids["partOf"], ids["urn:region:2"], "n_id", None)
    # the constant-bound arm is dimension-sized: broadcast it as a
    # semi-filter (a 5-key join left side leaves most hash partitions
    # empty — the documented hash_join empty-partition quirk — and the
    # broadcast is the better plan for a selective arm anyway)
    b = semi_anti_join(a_geo, a_reg, on="n_id")
    b = hash_join(b.materialize(), a_bal.materialize(), on="c_id",
                  join_type="inner", num_partitions=nparts)
    return decode_bindings(
        b, d, {"c": "c_id", "bal": "bal_id", "n": "n_id"},
        broadcast_cols=("n",), num_partitions=nparts,
    )


SQL_KG_DICT_BGP = """
SELECT 'urn:cust:' || c_custkey AS c, CAST(c_acctbal AS VARCHAR) AS bal,
       'urn:nation:' || c_nationkey AS n
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal IS NOT NULL AND n_regionkey = 2
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_term_dictionary": QueryDef(q_kg_term_dictionary, _sql_dict_terms()),
        "kg_dict_bgp": QueryDef(q_kg_dict_bgp, SQL_KG_DICT_BGP),
    }
)


# --------------------------------------------------------------------------
# wave 56: SPARQL UPDATE, COUNT(DISTINCT)/SAMPLE aggregates, negated
# property sets
# --------------------------------------------------------------------------

def q_kg_update_delete_insert(sf_dir: str):
    """SPARQL 1.1 UPDATE over the canonical graph: `DELETE { ?c
    hasAccountBalance ?bal } INSERT { ?c hasBalanceBand "high" } WHERE { ?c
    hasAccountBalance ?bal . FILTER(?bal > 5000) }` — the WHERE evaluates
    once, high balances are removed (anti semi-join of the store against
    the packed delete keys, store never gathers) and a band marker inserts
    for the same solutions (stream union, no full-store distinct: the
    inserted predicate is new to the store)."""
    from .kg.algebra import filter_bindings
    from .kg.bgp import match_bgp
    from .kg.update import delete_insert_where

    tri = _canonical_triples(sf_dir)
    where = filter_bindings(
        match_bgp(tri, [("?c", "hasAccountBalance", "?bal")], select=["?c", "?bal"]),
        [("bal", ">", 5000)],
    )
    return delete_insert_where(
        tri,
        where,
        delete=[("?c", "hasAccountBalance", "?bal")],
        insert=[("?c", "hasBalanceBand", "high")],
    )


def _sql_update() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH tri AS (SELECT subj, pred, obj FROM ({SQL_KG_CANONICAL})),
matched AS (
  SELECT 'urn:cust:' || c_custkey AS c, CAST(c_acctbal AS VARCHAR) AS bal
  FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal > 5000
),
del AS (SELECT c AS subj, 'hasAccountBalance' AS pred, bal AS obj FROM matched),
ins AS (SELECT DISTINCT c AS subj, 'hasBalanceBand' AS pred, 'high' AS obj FROM matched)
SELECT subj, pred, obj FROM (
  SELECT * FROM (SELECT * FROM tri EXCEPT SELECT * FROM del)
  UNION
  SELECT * FROM ins
)
"""


def q_kg_group_count_distinct(sf_dir: str):
    """SPARQL `SELECT ?n (COUNT(DISTINCT ?bal) AS n_bal) (SAMPLE(?bal) AS
    sample_bal) GROUP BY ?n` over `?c hasAccountBalance ?bal . ?c basedIn
    ?n`: distinct (n, bal) falls out of one sort-scan set fold, then ONE
    fold_per_key pass counts and picks the deterministic sample (min — a
    legal SAMPLE per spec, pinned so the oracle can replicate)."""
    from .kg.bgp import match_bgp
    from .util import distinct_rows, fold_per_key

    tri = _canonical_triples(sf_dir)
    b = match_bgp(
        tri,
        [("?c", "hasAccountBalance", "?bal"), ("?c", "basedIn", "?n")],
        select=["?bal", "?n"],
    )
    d = distinct_rows(b, ["n", "bal"])
    return fold_per_key(
        d, "n", {"n_bal": ("count", None), "sample_bal": ("min", "bal")}
    )


SQL_KG_GROUP_COUNT_DISTINCT = """
SELECT 'urn:nation:' || c_nationkey AS n,
       CAST(count(DISTINCT CAST(c_acctbal AS VARCHAR)) AS BIGINT) AS n_bal,
       min(CAST(c_acctbal AS VARCHAR)) AS sample_bal
FROM customer WHERE c_acctbal IS NOT NULL
GROUP BY 1
"""


def q_kg_path_negated(sf_dir: str):
    """Negated-property-set path `!(hasAccountBalance|partOf)/partOf`: the
    first step scans by INVERTED predicate membership (one vectorized
    is_in per batch — on the canonical graph it selects exactly the
    basedIn edges without naming them), then one hash join hops to the
    region. Bag semantics, UNION-ALL-free here because the negated set is
    a single scan."""
    from .kg.paths import eval_path

    tri = _canonical_triples(sf_dir)
    return eval_path(tri, "!(hasAccountBalance|partOf)/partOf")


def _sql_path_negated() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH tri AS (SELECT subj, pred, obj FROM ({SQL_KG_CANONICAL})),
neg AS (SELECT subj AS s, obj AS o FROM tri
        WHERE pred NOT IN ('hasAccountBalance', 'partOf')),
nxt AS (SELECT subj AS s, obj AS o FROM tri WHERE pred = 'partOf')
SELECT neg.s AS s, nxt.o AS o FROM neg JOIN nxt ON neg.o = nxt.s
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_update_delete_insert": QueryDef(
            q_kg_update_delete_insert, _sql_update()
        ),
        "kg_group_count_distinct": QueryDef(
            q_kg_group_count_distinct, SQL_KG_GROUP_COUNT_DISTINCT
        ),
        "kg_path_negated": QueryDef(q_kg_path_negated, _sql_path_negated()),
    }
)


# --------------------------------------------------------------------------
# wave 57: SPARQL SERVICE federation + SHACL cardinality validation
# --------------------------------------------------------------------------

def q_kg_service_federated(sf_dir: str):
    """SPARQL SERVICE federation with the FedX bound-join optimization
    (`kg/federation.service_join`): the local graph binds region-2
    customers with their nations, `SERVICE { ?s operatesIn ?n }` evaluates
    against a SECOND endpoint's graph (the supplier dataspace, injected as
    a triples provider) with the local nations PUSHED into the remote scan
    as a VALUES restriction, and the join runs map-side against the
    broadcast remote solutions — the local stream never shuffles."""
    from .kg.bgp import match_bgp
    from .kg.federation import service_join
    from .queries_extras8 import _supplier_triples

    tri = _canonical_triples(sf_dir)
    local = match_bgp(
        tri,
        [("?c", "basedIn", "?n"), ("?n", "partOf", "urn:region:2")],
        select=["?c", "?n"],
    )
    remote = _supplier_triples(sf_dir)
    out = service_join(local, remote, ("?s", "operatesIn", "?n"), shared="n")
    return out.select_columns(["c", "n", "s"])


SQL_KG_SERVICE = """
SELECT 'urn:cust:' || c_custkey AS c, 'urn:nation:' || c_nationkey AS n,
       'urn:supp:' || s_suppkey AS s
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN supplier ON s_nationkey = c_nationkey
WHERE n_regionkey = 2
"""


def q_kg_validate_cardinality(sf_dir: str):
    """SHACL-lite sh:minCount/sh:maxCount over the UPDATED graph of
    `kg_update_delete_insert` (high balances deleted): every customer
    (focus = subjects of basedIn) must carry exactly one hasAccountBalance
    — violations are the customers whose balance the UPDATE removed plus
    those that never had one. Counts via one fold_per_key pass; zero-count
    focus nodes recovered by an anti semi-join."""
    from .kg.validate import validate_cardinality

    updated = q_kg_update_delete_insert(sf_dir)
    return validate_cardinality(
        updated, focus_pred="basedIn", pred="hasAccountBalance",
        min_count=1, max_count=1,
    )


SQL_KG_VALIDATE_CARDINALITY = """
SELECT 'urn:cust:' || c_custkey AS focus, CAST(0 AS BIGINT) AS got,
       'count(hasAccountBalance) in [1, 1]' AS rule
FROM customer WHERE c_acctbal IS NULL OR c_acctbal > 5000
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_service_federated": QueryDef(q_kg_service_federated, SQL_KG_SERVICE),
        "kg_validate_cardinality": QueryDef(
            q_kg_validate_cardinality, SQL_KG_VALIDATE_CARDINALITY
        ),
    }
)


# --------------------------------------------------------------------------
# wave 58: dictionary-encoded store as a PERSISTED layout with pushdown
# --------------------------------------------------------------------------

def q_kg_dict_store_probe(sf_dir: str):
    """The encoded store as a storage engine: the canonical graph persists
    as term-sorted dictionary parquet + (p_id,s_id,o_id)-sorted POS parquet
    under /tmp, then a constant-predicate probe resolves
    `hasAccountBalance` via a pushdown dictionary read (row-group pruning
    on term) and reads ONLY that predicate's row-group range of the
    fixed-width encoded table; the result decodes back to (subj, obj) on
    the result-sized tail."""
    import os

    from .kg.dictenc import (
        decode_bindings,
        read_dictionary,
        read_pred_encoded,
        write_encoded_store,
    )

    tri = _canonical_triples(sf_dir)
    store = os.path.join(
        "/tmp", f"anonray_dictstore_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_encoded_store(tri, store)
    enc = read_pred_encoded(store, "hasAccountBalance")
    d = read_dictionary(store).materialize()
    return decode_bindings(enc, d, {"subj": "s_id", "obj": "o_id"})


SQL_KG_DICT_STORE_PROBE = """
SELECT 'urn:cust:' || c_custkey AS subj, CAST(c_acctbal AS VARCHAR) AS obj
FROM customer WHERE c_acctbal IS NOT NULL
"""


EXTRAS9_REGISTRY.update(
    {
        "kg_dict_store_probe": QueryDef(
            q_kg_dict_store_probe, SQL_KG_DICT_STORE_PROBE
        )
    }
)


# --------------------------------------------------------------------------
# wave 59: weighted shortest paths (Bellman-Ford)
# --------------------------------------------------------------------------

def q_graph_shortest_path(sf_dir: str):
    """Weighted shortest distances (`extras/graph.bellman_ford`) over the
    bipartite supplier<->part graph with edge weight = the MINIMUM
    l_quantity linking the pair: 4 synchronous relaxation rounds from the
    minimum supplier. Edges never shuffle — the node-bounded distance
    table broadcasts each round and every edge batch relaxes with one
    vectorized index_in probe; the per-round exchange is the narrow
    min_per_key fold. Exactly-4-rounds semantics is what the unrolled SQL
    oracle replays (value-exact even before convergence)."""
    import numpy as np

    from .extras.graph import bellman_ford
    from .util import min_per_key

    PART_OFFSET = 10_000_000
    li = load(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity"])

    def _edges(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        ) + PART_OFFSET
        q = _pc.cast(b.column("l_quantity"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "sd": pa.array(
                    np.concatenate([s, p]) * (1 << 32) + np.concatenate([p, s])
                ),
                "w": pa.array(np.concatenate([q, q]), pa.int64()),
            }
        )

    # min weight per (src, dst): pack the pair into one int64 key (node ids
    # fit 32 bits by construction), fold, unpack
    packed = min_per_key(
        li.map_batches(_edges, batch_format="pyarrow"), "sd", "w"
    )

    def _unpack(b: pa.Table) -> pa.Table:
        sd = b.column("sd").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(sd >> 32, pa.int64()),
                "dst": pa.array(sd & ((1 << 32) - 1), pa.int64()),
                "w": b.column("w").combine_chunks(),
            }
        )

    edges = packed.map_batches(_unpack, batch_format="pyarrow")
    seed = int(load(sf_dir, "supplier", ["s_suppkey"]).min("s_suppkey"))
    return bellman_ford(edges, [seed], 4)


def _sql_shortest_path() -> str:
    base = """
WITH e0 AS (
  SELECT l_suppkey AS s, l_partkey + 10000000 AS p,
         min(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
edges AS (SELECT s AS src, p AS dst, w FROM e0
          UNION ALL SELECT p, s, w FROM e0),
r0 AS (SELECT CAST(min(s_suppkey) AS BIGINT) AS node,
              CAST(0 AS BIGINT) AS dist FROM supplier)"""
    rounds = []
    for k in range(1, 5):
        rounds.append(f"""
r{k} AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM r{k - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + e.w AS dist
    FROM r{k - 1} r JOIN edges e ON e.src = r.node
  ) GROUP BY node
)""")
    return base + "," + ",".join(rounds) + "\nSELECT node, dist FROM r4"


EXTRAS9_REGISTRY.update(
    {
        "graph_shortest_path": QueryDef(
            q_graph_shortest_path, _sql_shortest_path()
        )
    }
)


# --------------------------------------------------------------------------
# wave 60: SPARQL Update graph management (ADD/COPY/MOVE/CLEAR)
# --------------------------------------------------------------------------

def q_kg_graph_move(sf_dir: str):
    """`ADD GRAPH urn:g:geo TO urn:g:cust` over the predicate-fused quad
    store (customer facts tagged urn:g:cust, geo facts urn:g:geo, as in
    kg_named_graph_query): the geo triples are copied INTO the cust graph
    (set semantics — the destination slice dedups) and the geo graph
    survives — stateless prefix scans + one retag projection + stream
    unions; only the destination-graph slice pays a distinct. (MOVE/COPY/
    CLEAR share the same kernel and are pinned by unit tests — MOVE
    REPLACES the destination per spec, which makes its result a bare
    retag, less interesting as an oracle row.)"""
    import pyarrow.compute as _pc

    from .kg.update import manage_graph

    # _canonical_triples MATERIALIZES the pipeline's triple stream — the
    # actor-pool extraction stage must not be consumed lazily through the
    # downstream scans (observed to stall the scheduler on narrow widths)
    tri = _canonical_triples(sf_dir)

    def _scope(b: pa.Table) -> pa.Table:
        g = _pc.if_else(
            _pc.starts_with(b.column("subj"), "urn:cust:"),
            pa.scalar("urn:g:cust"),
            pa.scalar("urn:g:geo"),
        )
        return pa.table(
            {
                "subj": b.column("subj").combine_chunks(),
                "pred": _pc.binary_join_element_wise(g, b.column("pred"), "#"),
                "obj": b.column("obj").combine_chunks(),
            }
        )

    quads = tri.map_batches(_scope, batch_format="pyarrow")
    return manage_graph(quads, "ADD", src="urn:g:geo", dst="urn:g:cust")


def _sql_graph_move() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH tri AS (SELECT subj, pred, obj FROM ({SQL_KG_CANONICAL}))
SELECT subj,
       CASE WHEN subj LIKE 'urn:cust:%' THEN 'urn:g:cust#'
            ELSE 'urn:g:geo#' END || pred AS pred,
       obj
FROM tri
UNION ALL
SELECT subj, 'urn:g:cust#' || pred, obj FROM tri
WHERE subj NOT LIKE 'urn:cust:%'
"""


EXTRAS9_REGISTRY.update(
    {"kg_graph_add": QueryDef(q_kg_graph_move, _sql_graph_move())}
)


# --------------------------------------------------------------------------
# wave 61: incremental MinHash-LSH index (crawl-increment dedup)
# --------------------------------------------------------------------------

def q_dedup_minhash_incremental(sf_dir: str):
    """Crawl-increment near-dup detection WITHOUT recomputing the indexed
    corpus: the base documents' banded LSH rows persist once
    (`minhash_index_write`, ~20·bands B/doc), then the increment (the
    perturbed twins) bands itself and probes the index with ONE
    (band, bucket) hash join (new-vs-old) plus a banded self-join
    (new-vs-new); only the candidate-id text slice re-reads for exact
    jaccard verification. Result = the full recompute's pairs restricted
    to pairs touching an increment id — which on this corpus is ALL true
    pairs (every planted twin pairs old-with-new)."""
    import os

    from .extras.dedup import minhash_index_append_pairs, minhash_index_write
    from .queries_extras import DUP_OFFSET, _corpus_with_dups

    corpus = _corpus_with_dups(sf_dir).materialize()
    old = corpus.filter(expr=f"doc_id < {DUP_OFFSET}")
    new = corpus.filter(expr=f"doc_id >= {DUP_OFFSET}")
    idx = os.path.join(
        "/tmp", f"anonray_lshidx_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    minhash_index_write(old, idx, text_col="text", id_col="doc_id", bands=32)
    pairs = minhash_index_append_pairs(
        idx, new, corpus, text_col="text", id_col="doc_id",
        verify_threshold=0.5,
    )
    return pairs.select_columns(["id_a", "id_b"])


def _sql_minhash_incremental() -> str:
    from .queries_extras import DUP_OFFSET, _SQL_DUP_CTES

    return (
        f"WITH {_SQL_DUP_CTES}\n"
        f"SELECT id_a, id_b FROM dup "
        f"WHERE id_a >= {DUP_OFFSET} OR id_b >= {DUP_OFFSET}"
    )


EXTRAS9_REGISTRY.update(
    {
        "dedup_minhash_incremental": QueryDef(
            q_dedup_minhash_incremental, _sql_minhash_incremental()
        )
    }
)


# --------------------------------------------------------------------------
# wave 62: personalized PageRank
# --------------------------------------------------------------------------

def q_kg_pagerank_personalized(sf_dir: str):
    """Personalized PageRank over the KG's iri edges: the 15% restart mass
    returns ONLY to the two seed nations (teleport set broadcast as one
    is_in mask per node batch), ranks start at the seeds — per-iteration
    cost identical to global PageRank (edge join + sum_per_key + node-sized
    left join), exact int64 millionth-units, 3 iterations. Top-25 by
    (rank desc, node)."""
    import pyarrow.compute as _pc

    from .extras.graph import pagerank_int

    tri = _canonical_triples(sf_dir)

    def _edges(b: pa.Table) -> pa.Table:
        t = b.filter(_pc.equal(b.column("obj_kind"), "iri"))
        return pa.table(
            {"src": t.column("subj").combine_chunks(),
             "dst": t.column("obj").combine_chunks()}
        )

    ranks = pagerank_int(
        tri.map_batches(_edges, batch_format="pyarrow"),
        iterations=3,
        teleport=["urn:nation:1", "urn:nation:2"],
    )
    top = ranks.sort(["rank", "node"], descending=[True, False]).limit(25)
    return top.rename_columns({"rank": "pr"})


def _sql_ppr(iterations: int = 3, scale: int = 1_000_000) -> str:
    from .queries_kg import SQL_KG_CANONICAL

    base = (15 * scale) // 100
    seeds = "('urn:nation:1', 'urn:nation:2')"
    ctes = [
        f"canon AS ({SQL_KG_CANONICAL})",
        "edges AS (SELECT subj AS src, obj AS dst FROM canon WHERE obj_kind = 'iri')",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST(CASE WHEN node IN {seeds} THEN {scale} "
        f"ELSE 0 END AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"s{i} AS (SELECT e.dst AS node, sum(r{i-1}.r // deg.d) AS s "
            f"FROM edges e JOIN deg ON deg.src = e.src "
            f"JOIN r{i-1} ON r{i-1}.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, CAST(CASE WHEN n.node IN {seeds} "
            f"THEN {base} ELSE 0 END + (85 * COALESCE(s{i}.s, 0)) // 100 "
            f"AS BIGINT) AS r FROM nodes n LEFT JOIN s{i} ON s{i}.node = n.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS pr FROM r{iterations} ORDER BY r DESC, node LIMIT 25"
    )


EXTRAS9_REGISTRY.update(
    {
        "kg_pagerank_personalized": QueryDef(
            q_kg_pagerank_personalized, _sql_ppr()
        )
    }
)
