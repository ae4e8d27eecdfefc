"""Round-4 waves 63+ operators with DuckDB oracles: warehouse-format
interchange (ORC / Feather-IPC shard sinks + parallel readers), RDF
collection (rdf:List) ranking, OWL inverse/symmetric materialization,
robots.txt longest-match crawl filtering, and graph/text/stream
additions continuing the wave cadence.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS10_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# wave 63: ORC + Feather (Arrow IPC) shard roundtrips
# --------------------------------------------------------------------------

def q_corpus_orc_roundtrip(sf_dir: str):
    """documents -> block-sized ORC shards (`sources/arrowfmt.py`,
    SHA-1-content filenames so task retries rewrite the same bytes) ->
    `read_orc` back (read_binary_files parallel fetch + BufferReader
    decode) -> (doc_id, text). Identity oracle: the Hive-side columnar
    format must round-trip ids and full text exactly."""
    import shutil
    import tempfile

    from .sources.arrowfmt import read_orc, write_orc_shards

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        man = write_orc_shards(docs, out_dir)
        assert man.num_rows >= 1
        back = read_orc(out_dir).select_columns(["doc_id", "text"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_ORC_ROUNDTRIP = "SELECT doc_id, text FROM documents"


def q_corpus_feather_roundtrip(sf_dir: str):
    """documents -> Feather-v2 (Arrow IPC file) shards -> `read_feather`
    back. IPC is Arrow's own wire format (what object-store blocks and
    Flight streams speak), so this pins the zero-copy interchange path."""
    import shutil
    import tempfile

    from .sources.arrowfmt import read_feather, write_feather_shards

    docs = load(sf_dir, "documents", ["doc_id", "text", "source"])
    out_dir = tempfile.mkdtemp(prefix="ipc_rt_")
    try:
        man = write_feather_shards(docs, out_dir)
        assert man.num_rows >= 1
        back = read_feather(out_dir).select_columns(["doc_id", "source"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_FEATHER_ROUNDTRIP = "SELECT doc_id, source FROM documents"


EXTRAS10_REGISTRY.update(
    {
        "corpus_orc_roundtrip": QueryDef(q_corpus_orc_roundtrip, SQL_ORC_ROUNDTRIP),
        "corpus_feather_roundtrip": QueryDef(
            q_corpus_feather_roundtrip, SQL_FEATHER_ROUNDTRIP
        ),
    }
)


# --------------------------------------------------------------------------
# wave 64: rdf:List ranking (ordered-collection recovery)
# --------------------------------------------------------------------------

def _list_triples(sf_dir: str):
    """Deterministic rdf:List fixture: per region, the cons chain of its
    nations in n_nationkey order — urn:region:<r> memberList urn:cell:<k0>,
    each cell rdf:first urn:nation:<k> / rdf:rest next-cell-or-nil. Pure
    function of the nation table, mirrored in the oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    rows = sorted(
        zip(
            n.column("n_regionkey").to_pylist(),
            n.column("n_nationkey").to_pylist(),
        )
    )
    subj, pred, obj = [], [], []
    for i, (r, k) in enumerate(rows):
        nxt = rows[i + 1] if i + 1 < len(rows) else None
        if i == 0 or rows[i - 1][0] != r:
            subj.append(f"urn:region:{r}")
            pred.append("memberList")
            obj.append(f"urn:cell:{k}")
        subj.append(f"urn:cell:{k}")
        pred.append("rdf:first")
        obj.append(f"urn:nation:{k}")
        subj.append(f"urn:cell:{k}")
        pred.append("rdf:rest")
        obj.append(f"urn:cell:{nxt[1]}" if nxt and nxt[0] == r else "rdf:nil")
    t = pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
        }
    )
    return rd.from_arrow(t)


def q_kg_list_rank(sf_dir: str):
    """rdf:List member ranking (`kg/rdflist.py`): cons chains -> (head,
    pos, member) via pointer doubling — O(log length) node-sized hash
    joins, never a sequential walk. The fixture is one list per region
    (nations in key order); a unit test drives a 129-cell chain and a
    cycle to pin the round bound and the loud-failure contract."""
    from .kg.rdflist import rank_rdf_lists

    return rank_rdf_lists(_list_triples(sf_dir), entry_pred="memberList")


SQL_KG_LIST_RANK = """
SELECT 'urn:region:' || n_regionkey AS head,
       CAST(row_number() OVER (PARTITION BY n_regionkey
                               ORDER BY n_nationkey) - 1 AS BIGINT) AS pos,
       'urn:nation:' || n_nationkey AS member
FROM nation
"""


EXTRAS10_REGISTRY.update(
    {"kg_list_rank": QueryDef(q_kg_list_rank, SQL_KG_LIST_RANK)}
)


# --------------------------------------------------------------------------
# wave 65: OWL inverse/symmetric property closure
# --------------------------------------------------------------------------

def _trades_edges(sf_dir: str) -> pa.Table:
    """Deterministic symmetric-predicate fixture: each nation tradesWith
    the NEXT nation of its region (one asserted direction only — the
    closure must add the other). Pure function of the nation table."""
    import pyarrow.parquet as pq

    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    rows = sorted(
        zip(
            n.column("n_regionkey").to_pylist(),
            n.column("n_nationkey").to_pylist(),
        )
    )
    subj, obj = [], []
    for i, (r, k) in enumerate(rows[:-1]):
        if rows[i + 1][0] == r:
            subj.append(f"urn:nation:{k}")
            obj.append(f"urn:nation:{rows[i + 1][1]}")
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(["tradesWith"] * len(subj), pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_kind": pa.array(["iri"] * len(subj), pa.string()),
        }
    )


def q_kg_owl_closure(sf_dir: str):
    """OWL property-semantics closure (`kg/owl.py`): canonical graph +
    one-directional tradesWith edges, closed under owl:inverseOf
    (basedIn->hasCustomer, partOf->contains) and owl:SymmetricProperty
    (tradesWith) — one broadcast-ontology scan emits implied triples,
    set semantics via packed-key sort-scan distinct. Literal-object
    triples (hasAccountBalance) never invert."""
    import ray.data as rd

    from .kg.owl import materialize_property_semantics
    from .queries_extras9 import _canonical_triples

    asserted = _canonical_triples(sf_dir).union(
        rd.from_arrow(_trades_edges(sf_dir))
    )
    return materialize_property_semantics(
        asserted,
        inverse_map={"basedIn": "hasCustomer", "partOf": "contains"},
        symmetric=("tradesWith",),
    )


def _sql_owl_closure() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH canon AS ({SQL_KG_CANONICAL}),
tw AS (
  SELECT 'urn:nation:' || n_nationkey AS subj, 'tradesWith' AS pred,
         'urn:nation:' || lead(n_nationkey) OVER (
             PARTITION BY n_regionkey ORDER BY n_nationkey) AS obj,
         'iri' AS obj_kind
  FROM nation QUALIFY obj IS NOT NULL
),
asserted AS (SELECT * FROM canon UNION ALL SELECT * FROM tw),
implied AS (
  SELECT obj AS subj, 'hasCustomer' AS pred, subj AS obj, 'iri' AS obj_kind
  FROM asserted WHERE pred = 'basedIn' AND obj_kind = 'iri'
  UNION ALL
  SELECT obj, 'contains', subj, 'iri'
  FROM asserted WHERE pred = 'partOf' AND obj_kind = 'iri'
  UNION ALL
  SELECT obj, 'tradesWith', subj, 'iri'
  FROM asserted WHERE pred = 'tradesWith' AND obj_kind = 'iri'
)
SELECT DISTINCT subj, pred, obj, obj_kind FROM (
  SELECT * FROM asserted UNION ALL SELECT * FROM implied
)
"""


EXTRAS10_REGISTRY.update(
    {"kg_owl_closure": QueryDef(q_kg_owl_closure, _sql_owl_closure())}
)
