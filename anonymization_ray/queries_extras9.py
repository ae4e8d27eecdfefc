"""Round-4 wave-39 operators with DuckDB oracles: content-defined chunking
(the dedup-friendly alternative to fixed windows — boundaries come from a
rolling hash of token lengths, so an insertion only re-chunks the document
locally) and per-key dense rank as a COLUMN (``row_number() - 1`` without a
per-group UDF: one range sort + carry-chained per-block ranks).
"""

from __future__ import annotations

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
    """SPARQL MINUS: `{ ?n partOf ?r } MINUS { ?s operatesIn ?n }` — nations
    (with their region) that no supplier operates in. Anti semi-join on the
    shared variable's packed key; broadcast because the minus side's
    distinct key set is nation-sized."""
    from .kg.algebra import minus_bindings
    from .kg.bgp import match_bgp

    tri = _canonical_triples(sf_dir).union(_supplier_triples_w40(sf_dir)).materialize()
    req = match_bgp(tri, [("?n", "partOf", "?r")], select=["?n", "?r"])
    sub = match_bgp(tri, [("?s", "operatesIn", "?n")], select=["?s", "?n"])
    return minus_bindings(req, sub)


def _supplier_triples_w40(sf_dir: str):
    from .queries_extras8 import _supplier_triples

    return _supplier_triples(sf_dir)


SQL_KG_MINUS = """
SELECT 'urn:nation:' || n_nationkey AS n, 'urn:region:' || n_regionkey AS r
FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
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
