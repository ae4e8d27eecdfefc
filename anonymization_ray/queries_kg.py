"""KG-construction queries + DuckDB oracles.

The page table is synthesized deterministically from the sf tables
(kg/pages.py), so every stage's expected output is derivable in SQL from
``documents``/``customer``/``nation``/``region`` — giving the KG pipeline the
same exact correctness gate as the relational operators (triple P/R = 1.0
against the oracle set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, _sql_gk, load

BASE = "https://example.org/doc/"

_SQL_VARIANT = (
    "CASE c_custkey % 3 WHEN 0 THEN n_name WHEN 1 THEN lower(n_name) "
    "ELSE replace(n_name, '_', ' ') END"
)


def q_kg_text_extract(sf_dir: str):
    """Stateless text extraction; byte-identical per url (input_hint invariant)."""
    from .kg.extract import extract_text
    from .kg.pages import synthesize_pages

    pages = extract_text(synthesize_pages(sf_dir))
    return pages.select_columns(["url", "text_extracted"])


SQL_KG_TEXT = f"SELECT '{BASE}' || doc_id AS url, text AS text_extracted FROM documents"


def q_kg_text_invariant(sf_dir: str):
    """Invariant count: rows where extracted text != stored text (must be 0)."""
    from .kg.pipeline import verify_text_invariant

    v = verify_text_invariant(sf_dir)
    return pa.table({"violations": pa.array([v], pa.int64())})


SQL_KG_TEXT_INVARIANT = "SELECT CAST(0 AS BIGINT) AS violations"


def q_kg_mention_triples(sf_dir: str):
    """Mention-level extraction (actor-pool stage) before linking."""
    from .kg.extract import extract_mentions
    from .kg.pages import synthesize_pages

    pages = synthesize_pages(sf_dir)
    return extract_mentions(pages.select_columns(["url", "html"]))


SQL_KG_MENTIONS = f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
var AS (SELECT c_custkey, c_acctbal, {_SQL_VARIANT} AS nv
        FROM customer JOIN nation ON c_nationkey = n_nationkey)
SELECT '{BASE}' || (c_custkey % nd.n) AS url, 'Customer#' || c_custkey AS subj,
       'hasAccountBalance' AS pred, CAST(c_acctbal AS VARCHAR) AS obj, 'double' AS obj_kind
FROM var, nd WHERE c_acctbal IS NOT NULL
UNION ALL
SELECT '{BASE}' || (c_custkey % nd.n), 'Customer#' || c_custkey, 'basedIn', nv, 'mention'
FROM var, nd
UNION ALL
SELECT '{BASE}' || (n_nationkey % nd.n), n_name, 'partOf', r_name, 'mention'
FROM nation JOIN region ON n_regionkey = r_regionkey, nd
"""


def q_kg_canonical_triples(sf_dir: str):
    """After linking + union-find canonicalization: every mention resolved to
    its stable canonical IRI."""
    from .kg.pipeline import kg_pipeline

    res = kg_pipeline(sf_dir, anonymize=False)
    return res.triples.select_columns(["subj", "pred", "obj", "obj_kind"])


SQL_KG_CANONICAL = """
SELECT 'urn:cust:' || c_custkey AS subj, 'hasAccountBalance' AS pred,
       CAST(c_acctbal AS VARCHAR) AS obj, 'double' AS obj_kind
FROM customer WHERE c_acctbal IS NOT NULL
UNION ALL
SELECT 'urn:cust:' || c_custkey, 'basedIn', 'urn:nation:' || c_nationkey, 'iri' FROM customer
UNION ALL
SELECT 'urn:nation:' || n_nationkey, 'partOf', 'urn:region:' || n_regionkey, 'iri' FROM nation
"""


def q_kg_anonymized_triples(sf_dir: str):
    """Full pipeline: the signature anonymization pass on the canonical graph
    (account balances generalized into bucket IRIs + bucket resources with
    obfuscated outer bounds; Generalization.java:59-92 shape)."""
    from .kg.pipeline import kg_pipeline

    res = kg_pipeline(sf_dir, anonymize=True)
    return res.triples.select_columns(["subj", "pred", "obj", "obj_kind"])


# the generalized id is the canonical IRI string 'urn:cust:<k>' — ties in
# c_acctbal break on the STRING, so the oracle orders by the same expression
SQL_KG_ANONYMIZED = f"""
WITH vals AS (SELECT 'urn:cust:' || c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS v
              FROM customer WHERE c_acctbal IS NOT NULL),
stats AS (SELECT count(*) AS k FROM vals),
gk AS (SELECT k, {_sql_gk('k', 1)} AS g FROM stats),
s AS (SELECT id, v, row_number() OVER (ORDER BY v, id) - 1 AS rnk FROM vals),
assigned AS (SELECT s.id, (gk.g * s.rnk) // gk.k AS bucket FROM s CROSS JOIN gk),
cuts AS (SELECT p.p, (p.p * gk.k) // gk.g AS c FROM gk,
         (SELECT unnest(range(1, (SELECT g FROM gk)))) AS p(p)),
bvals AS (SELECT cuts.p, (s1.v + s2.v) / 2.0 AS bv FROM cuts
          JOIN s s1 ON s1.rnk = cuts.c - 1 JOIN s s2 ON s2.rnk = cuts.c),
bkts AS (SELECT unnest(range(0, (SELECT g FROM gk))) AS bucket)
SELECT 'urn:cust:' || c_custkey AS subj, 'basedIn' AS pred,
       'urn:nation:' || c_nationkey AS obj, 'iri' AS obj_kind FROM customer
UNION ALL
SELECT 'urn:nation:' || n_nationkey, 'partOf', 'urn:region:' || n_regionkey, 'iri' FROM nation
UNION ALL
SELECT assigned.id, 'hasAccountBalance_generalized',
       'hasAccountBalance_' || assigned.bucket, 'iri' FROM assigned
UNION ALL
SELECT 'hasAccountBalance_' || bucket, 'rdf:type', 'soya:generalization', 'iri' FROM bkts
UNION ALL
SELECT 'hasAccountBalance_' || bkts.bucket, 'rdfs:min', CAST(bmin.bv AS VARCHAR), 'double'
FROM bkts JOIN bvals bmin ON bmin.p = bkts.bucket
UNION ALL
SELECT 'hasAccountBalance_' || bkts.bucket, 'rdfs:max', CAST(bmax.bv AS VARCHAR), 'double'
FROM bkts JOIN bvals bmax ON bmax.p = bkts.bucket + 1
UNION ALL
SELECT 'hasAccountBalance_0', 'rdfs:comment',
       'For the lower bound the minimum value is obfuscated', 'string'
UNION ALL
SELECT 'hasAccountBalance_' || (SELECT g - 1 FROM gk), 'rdfs:comment',
       'For the higher bound the maximum value is obfuscated', 'string'
"""


def q_kg_degree_topk(sf_dir: str):
    """Graph analytics over the constructed KG: top-20 entities by total
    degree (out-edges as subj + in-edges as iri obj). Endpoint stream ->
    exact_value_counts (Arrow-native partials, sort, boundary carries — no
    Ray groupby at entity cardinality) -> narrow sort + limit."""
    import pyarrow.compute as pc

    from .extras.stats import exact_value_counts
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _ends(b: pa.Table) -> pa.Table:
        subj = pa.table({"entity": b.column("subj").combine_chunks()})
        obj = pa.table(
            {
                "entity": b.filter(pc.equal(b.column("obj_kind"), "iri"))
                .column("obj")
                .combine_chunks()
            }
        )
        return pa.concat_tables([subj, obj])

    ends = tri.map_batches(_ends, batch_format="pyarrow")
    deg = exact_value_counts(ends, "entity")
    top = deg.sort(["n", "entity"], descending=[True, False]).limit(20)
    return top.rename_columns({"n": "degree"})


SQL_KG_DEGREE = f"""
WITH canon AS ({SQL_KG_CANONICAL}),
ends AS (SELECT subj AS entity FROM canon
         UNION ALL SELECT obj FROM canon WHERE obj_kind = 'iri')
SELECT entity, count(*) AS degree FROM ends GROUP BY entity
ORDER BY degree DESC, entity LIMIT 20
"""


def q_kg_pagerank(sf_dir: str):
    """Integer PageRank over the constructed KG's iri edges (extras/graph.py):
    3 damped iterations in exact int64 millionth-units — every floor-div and
    85/15 damping step is replicated in the unrolled SQL oracle, so the
    ITERATIVE fixpoint math itself is value-hash gated, not just row counts.
    Top-25 entities by (rank desc, node)."""
    import pyarrow.compute as pc

    from .extras.graph import pagerank_int
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _edges(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        return pa.table(
            {"src": t.column("subj").combine_chunks(), "dst": t.column("obj").combine_chunks()}
        )

    ranks = pagerank_int(tri.map_batches(_edges, batch_format="pyarrow"), iterations=3)
    top = ranks.sort(["rank", "node"], descending=[True, False]).limit(25)
    return top.rename_columns({"rank": "pr"})


def _sql_pagerank_unrolled(iterations: int = 3, scale: int = 1_000_000) -> str:
    base = (15 * scale) // 100
    ctes = [
        f"canon AS ({SQL_KG_CANONICAL})",
        "edges AS (SELECT subj AS src, obj AS dst FROM canon WHERE obj_kind = 'iri')",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"s{i} AS (SELECT e.dst AS node, sum(r{i-1}.r // deg.d) AS s "
            f"FROM edges e JOIN deg ON deg.src = e.src "
            f"JOIN r{i-1} ON r{i-1}.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, CAST({base} + (85 * COALESCE(s{i}.s, 0)) // 100 "
            f"AS BIGINT) AS r FROM nodes n LEFT JOIN s{i} ON s{i}.node = n.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS pr FROM r{iterations} ORDER BY r DESC, node LIMIT 25"
    )


SQL_KG_PAGERANK = _sql_pagerank_unrolled()


KG_REGISTRY: dict[str, QueryDef] = {
    "kg_text_extract": QueryDef(q_kg_text_extract, SQL_KG_TEXT),
    "kg_text_invariant": QueryDef(q_kg_text_invariant, SQL_KG_TEXT_INVARIANT),
    "kg_mention_triples": QueryDef(q_kg_mention_triples, SQL_KG_MENTIONS),
    "kg_canonical_triples": QueryDef(q_kg_canonical_triples, SQL_KG_CANONICAL),
    "kg_anonymized_triples": QueryDef(q_kg_anonymized_triples, SQL_KG_ANONYMIZED),
    "kg_degree_topk": QueryDef(q_kg_degree_topk, SQL_KG_DEGREE),
    "kg_pagerank": QueryDef(q_kg_pagerank, SQL_KG_PAGERANK),
}


def q_kg_star_join(sf_dir: str):
    """Star query over the constructed KG (the SPO-index read pattern a
    triple store exists for): for every entity, resolve the 2-hop path
    subj -[basedIn]-> nation -[partOf]-> region together with the subj's
    hasAccountBalance literal. Shape: the two entity-cardinality arms
    (balance, basedIn) meet in ONE hash join on subj; the nation->region
    hop is dimension-scale and becomes a broadcast dict lookup inside the
    join's output scan — never a second shuffle. Balances are integer
    cents (identical floor(x*100+0.5) on both sides) for value-hash
    exactness."""
    import pyarrow.compute as pc

    from .kg.pipeline import kg_pipeline
    from .util import hash_join

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()

    def _arm(pred: str, val: str):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("pred"), pred))
            return pa.table(
                {
                    "subj": t.column("subj").combine_chunks(),
                    val: t.column("obj").combine_chunks(),
                }
            )

        return _f

    bal = tri.map_batches(_arm("hasAccountBalance", "balval"), batch_format="pyarrow")
    geo = tri.map_batches(_arm("basedIn", "nation"), batch_format="pyarrow")
    import numpy as np

    part = tri.map_batches(_arm("partOf", "region"), batch_format="pyarrow").take_all()
    # sorted key/value arrays for a vectorized searchsorted lookup per batch
    pk = np.array([r["subj"] for r in part])
    pv = np.array([r["region"] for r in part])
    order = np.argsort(pk)
    pk, pv = pk[order], pv[order]

    n = bal.count()
    joined = hash_join(
        bal, geo, on="subj", join_type="inner",
        num_partitions=max(2, min(8, n // 2000 + 1)),
    )

    def _out(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(b.column("balval"), pa.float64()), 100.0), 0.5)
            ),
            pa.int64(),
        )
        nat = b.column("nation").to_numpy(zero_copy_only=False)
        # INNER-join semantics on the partOf hop (matches the SQL oracle):
        # a nation with no partOf triple drops its customers' rows
        if len(pk):
            idx = np.clip(np.searchsorted(pk, nat), 0, len(pk) - 1)
            hit = pk[idx] == nat
        else:
            idx = np.zeros(len(nat), np.int64)
            hit = np.zeros(len(nat), bool)
        t = pa.table(
            {
                "subj": b.column("subj").combine_chunks(),
                "region": pa.array(
                    np.where(hit, pv[idx] if len(pk) else "", ""), pa.string()
                ),
                "balance_cents": cents,
            }
        )
        return t.filter(pa.array(hit))

    return joined.map_batches(_out, batch_format="pyarrow")


SQL_KG_STAR = f"""
WITH canon AS ({SQL_KG_CANONICAL})
SELECT b.subj AS subj,
       p.obj AS region,
       CAST(floor(CAST(b.obj AS DOUBLE) * 100 + 0.5) AS BIGINT) AS balance_cents
FROM canon b
JOIN canon g ON g.subj = b.subj AND g.pred = 'basedIn'
JOIN canon p ON p.subj = g.obj AND p.pred = 'partOf'
WHERE b.pred = 'hasAccountBalance'
"""

KG_REGISTRY.update({"kg_star_join": QueryDef(q_kg_star_join, SQL_KG_STAR)})


def q_kg_incremental_merge(sf_dir: str):
    """Incremental ingest (kg/incremental.merge_delta): a base store built
    from the even-custkey half of the customer graph absorbs a delta holding
    the odd half PLUS re-ingested even rows — the merged SPO layout must be
    the distinct union (set semantics; re-ingest is a no-op) while only the
    delta's subject-hash partitions are rewritten. The oracle pins the full
    merged triple set."""
    import shutil
    import tempfile

    from .kg.incremental import merge_delta
    from .kg.materialize import materialize_triples, read_layout

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def _triples(parity: int | None):
        def _f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if parity is not None:
                b = b.filter(
                    pc.equal(pc.bit_wise_and(b.column("c_custkey"), 1), parity)
                )
            def _combine(a):
                return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

            subj = _combine(
                pc.binary_join_element_wise(
                    "urn:cust:", pc.cast(b.column("c_custkey"), pa.string()), ""
                )
            )
            nat = _combine(
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
                        [nat, _combine(b.column("c_mktsegment").combine_chunks().cast(pa.string()))]
                    ),
                    "obj_kind": pa.array(["iri"] * n + ["string"] * n),
                }
            )

        return _f

    out = tempfile.mkdtemp(prefix="kg_incr_")
    try:
        base = cust.map_batches(_triples(0), batch_format="pyarrow")
        materialize_triples(
            base, out, num_partitions=8, config={"q": "kg_incremental_merge"}
        )
        # delta = the odd half + a re-ingested slice of the even half
        delta = cust.map_batches(_triples(1), batch_format="pyarrow").union(
            cust.limit(50).map_batches(_triples(0), batch_format="pyarrow")
        )
        merge_delta(out, delta, delta_input="crawl-delta")
        merged = (
            read_layout(out, "spo")
            .select_columns(["subj", "pred", "obj", "obj_kind"])
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return merged


SQL_KG_INCREMENTAL = """
SELECT 'urn:cust:' || c_custkey AS subj, 'basedIn' AS pred,
       'urn:nation:' || c_nationkey AS obj, 'iri' AS obj_kind FROM customer
UNION ALL
SELECT 'urn:cust:' || c_custkey, 'inSegment', c_mktsegment, 'string' FROM customer
"""

KG_REGISTRY.update(
    {"kg_incremental_merge": QueryDef(q_kg_incremental_merge, SQL_KG_INCREMENTAL)}
)


def q_kg_bgp_query(sf_dir: str):
    """SPARQL-shaped basic-graph-pattern SELECT over the constructed KG
    (kg/bgp.match_bgp): customers based in a nation of region 0, with their
    balances — three patterns joined left-deep, dimension-bound arm first.
    Bag semantics; the oracle replays the same conjunction in SQL."""
    from .kg.bgp import match_bgp
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()
    return match_bgp(
        tri,
        [
            ("?n", "partOf", "urn:region:0"),
            ("?c", "basedIn", "?n"),
            ("?c", "hasAccountBalance", "?b"),
        ],
        select=["?c", "?n", "?b"],
    )


SQL_KG_BGP = f"""
WITH canon AS ({SQL_KG_CANONICAL})
SELECT g.subj AS c, g.obj AS n, b.obj AS b
FROM canon p
JOIN canon g ON g.obj = p.subj AND g.pred = 'basedIn'
JOIN canon b ON b.subj = g.subj AND b.pred = 'hasAccountBalance'
WHERE p.pred = 'partOf' AND p.obj = 'urn:region:0'
"""

KG_REGISTRY.update({"kg_bgp_query": QueryDef(q_kg_bgp_query, SQL_KG_BGP)})


def q_kg_ntriples_roundtrip(sf_dir: str):
    """RDF interchange: dump the canonical graph as N-Triples (one line per
    triple, content-hash-named part files) and parse it back — the read-back
    rows must equal the original graph, which the canonical-triples oracle
    pins value-exactly. Exercises IRI-ification, literal escaping and
    datatype round-tripping on real pipeline output."""
    import shutil
    import tempfile

    from .kg.ntriples import read_ntriples, write_ntriples
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples
    out = tempfile.mkdtemp(prefix="kg_nt_")
    try:
        write_ntriples(tri.select_columns(["subj", "pred", "obj", "obj_kind"]), out)
        back = read_ntriples(out).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return back


KG_REGISTRY.update(
    {"kg_ntriples_roundtrip": QueryDef(q_kg_ntriples_roundtrip, SQL_KG_CANONICAL)}
)


def q_kg_incremental_dedup(sf_dir: str):
    """Incremental exact dedup for crawl increments
    (kg/incremental.dedup_against_index): a content-hash index is seeded
    from the even-doc half of the corpus; the full corpus then arrives as
    the next crawl delta. Survivors = first-by-id per distinct text whose
    hash is NOT in the index — the delta's narrow (hash, id) stream probes
    only its own index buckets (bounded bucket tasks, index never
    broadcast). The oracle replays the same set algebra on the text column."""
    import shutil
    import tempfile

    from .kg.incremental import build_hash_index, dedup_against_index

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _even(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0))

    idx = tempfile.mkdtemp(prefix="kg_dedup_idx_")
    try:
        build_hash_index(
            docs.map_batches(_even, batch_format="pyarrow"), idx, num_partitions=8
        )
        surv = dedup_against_index(docs, idx, delta_input="crawl-2").materialize()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return surv


SQL_KG_INCREMENTAL_DEDUP = """
WITH ev AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
cand AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text)
SELECT c.doc_id FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.text = c.text)
"""

KG_REGISTRY.update(
    {"kg_incremental_dedup": QueryDef(q_kg_incremental_dedup, SQL_KG_INCREMENTAL_DEDUP)}
)


def q_kg_path_reach(sf_dir: str):
    """SPARQL property-path reachability over the constructed KG: every
    entity that reaches urn:region:0 through `basedIn`/`partOf` chains within
    2 hops (the path ^(:basedIn|:partOf){1,2} from the region). Frontier BFS
    (extras/graph.bfs_hops) over the pred-filtered REVERSED triple stream —
    the triples never shuffle; per hop one broadcast semi-join scan."""
    from .extras.graph import bfs_hops
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _edges(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("pred"), pa.array(["basedIn", "partOf"])))
        return pa.table(
            {
                "src": t.column("obj").combine_chunks(),
                "dst": t.column("subj").combine_chunks(),
            }
        )

    edges = tri.map_batches(_edges, batch_format="pyarrow")
    return bfs_hops(edges, ["urn:region:0"], max_hops=2)


SQL_KG_PATH_REACH = f"""
WITH canon AS ({SQL_KG_CANONICAL}),
e AS (SELECT obj AS src, subj AS dst FROM canon
      WHERE pred IN ('basedIn', 'partOf')),
h1 AS (SELECT DISTINCT dst FROM e WHERE src = 'urn:region:0'),
h2 AS (SELECT DISTINCT e.dst FROM e JOIN h1 ON e.src = h1.dst),
u AS (
  SELECT 'urn:region:0' AS node, 0 AS dist
  UNION ALL SELECT dst, 1 FROM h1
  UNION ALL SELECT dst, 2 FROM h2
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM u GROUP BY node
"""

KG_REGISTRY.update({"kg_path_reach": QueryDef(q_kg_path_reach, SQL_KG_PATH_REACH)})


def q_kg_rdfs_closure(sf_dir: str):
    """RDFS-style property-chain transitive closure over the constructed KG:
    every (node, ancestor, min-hops) pair reachable through `basedIn`/`partOf`
    chains. The web-scale shape splits the relation by role: the HIERARCHY
    slice (`partOf`, ontology-small — class/region trees, not entities) is
    gathered under a hard cap and closed driver-side; the INSTANCE slice
    (`basedIn`, corpus-scale) streams through one map_batches that extends
    each edge by the broadcast ancestor map — so the big side never shuffles
    and closure depth never iterates over it. Assumes instance-edge sources
    are not hierarchy targets (entities below the ontology), the standard
    instance/ontology split; a folded-key min pass makes multi-path dedup
    exact regardless."""
    import ray
    import ray.data as rd

    from .kg.pipeline import kg_pipeline
    from .util import min_per_key

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _edges(pred: str):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("pred"), pred))
            return pa.table(
                {
                    "src": t.column("subj").combine_chunks(),
                    "dst": t.column("obj").combine_chunks(),
                }
            )

        return _f

    HIER_CAP = 2_000_000
    hier = tri.map_batches(_edges("partOf"), batch_format="pyarrow").take_all()
    if len(hier) > HIER_CAP:
        raise ValueError(
            f"hierarchy slice has {len(hier)} edges > cap {HIER_CAP}; "
            "partition the ontology or raise the cap knowingly"
        )
    parents: dict[str, list[str]] = {}
    for r in hier:
        parents.setdefault(r["src"], []).append(r["dst"])
    # driver-side closure of the small hierarchy: node -> {anc: min_dist}
    anc_map: dict[str, dict[str, int]] = {}
    for start in parents:
        seen: dict[str, int] = {}
        frontier = [(start, 0)]
        while frontier:
            nxt = []
            for node, d in frontier:
                for p in parents.get(node, ()):
                    if p not in seen or d + 1 < seen[p]:
                        seen[p] = d + 1
                        nxt.append((p, d + 1))
            frontier = nxt
        anc_map[start] = seen
    anc_ref = ray.put(anc_map)

    def _extend(b: pa.Table) -> pa.Table:
        # vectorized: the inner loop runs over UNIQUE hierarchy targets in the
        # batch (ontology-small), never over instance rows
        import numpy as np

        amap = ray.get(anc_ref)
        src = b.column("src").combine_chunks()
        dst = b.column("dst").combine_chunks()
        enc = dst.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        node_parts = [src]
        anc_parts = [dst]
        dist_parts = [np.ones(len(b), np.int64)]
        for i, t in enumerate(uniq):
            ancs = amap.get(t)
            if not ancs:
                continue
            rows = np.nonzero(codes == i)[0]
            sub = src.take(pa.array(rows, pa.int64()))
            for a, d in ancs.items():
                node_parts.append(sub)
                anc_parts.append(pa.array([a] * len(rows), pa.string()))
                dist_parts.append(np.full(len(rows), 1 + d, np.int64))
        nodes = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in node_parts])
        ancs_arr = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in anc_parts])
        return pa.table(
            {
                "key": pc.binary_join_element_wise(nodes, ancs_arr, "\x00"),
                "dist": pa.array(np.concatenate(dist_parts), pa.int64()),
            }
        )

    inst = tri.map_batches(_edges("basedIn"), batch_format="pyarrow")
    hier_rows = [
        (n, a, d) for n, m in anc_map.items() for a, d in m.items()
    ] + [(r["src"], r["dst"], 1) for r in hier]
    hier_tbl = pa.table(
        {
            "key": pa.array([f"{n}\x00{a}" for n, a, _ in hier_rows], pa.string()),
            "dist": pa.array([d for _, _, d in hier_rows], pa.int64()),
        }
    )
    closure = inst.map_batches(_extend, batch_format="pyarrow").union(
        rd.from_arrow(hier_tbl)
    )
    out = min_per_key(closure, "key", "dist")

    def _split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("key"), "\x00")
        return pa.table(
            {
                "node": pc.list_element(parts, 0),
                "anc": pc.list_element(parts, 1),
                "dist": t.column("dist").combine_chunks(),
            }
        )

    return out.map_batches(_split, batch_format="pyarrow")


SQL_KG_RDFS_CLOSURE = f"""
WITH RECURSIVE canon AS ({SQL_KG_CANONICAL}),
e AS (SELECT subj AS src, obj AS dst FROM canon
      WHERE pred IN ('basedIn', 'partOf')),
paths(src, dst, dist) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT p.src, e.dst, p.dist + 1 FROM paths p JOIN e ON e.src = p.dst
)
SELECT src AS node, dst AS anc, CAST(min(dist) AS BIGINT) AS dist
FROM paths GROUP BY src, dst
"""

KG_REGISTRY.update({"kg_rdfs_closure": QueryDef(q_kg_rdfs_closure, SQL_KG_RDFS_CLOSURE)})


# RDFS-style ontology for the constructed KG: pred -> (domain type, range
# type or None for literal-valued preds). rdfs2/rdfs3 inference rules.
_KG_ONTOLOGY: dict[str, tuple[str, str | None]] = {
    "hasAccountBalance": ("Customer", None),
    "basedIn": ("Customer", "Nation"),
    "partOf": ("Nation", "Region"),
}


def q_kg_type_inference(sf_dir: str):
    """RDFS domain/range type inference (rules rdfs2 + rdfs3): every triple
    whose predicate carries a domain types its subject; every iri-object
    triple whose predicate carries a range types its object. The ontology is
    driver-small and closed over inside one stateless map_batches (broadcast
    by closure capture — 3 entries, no shuffle); the only wide step is the
    final sort-scan DISTINCT over (node, rdf_type)."""
    from .kg.pipeline import kg_pipeline
    from .util import distinct_rows

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _infer(b: pa.Table) -> pa.Table:
        nodes, types = [], []
        pred = b.column("pred")
        for p, (dom, rng) in _KG_ONTOLOGY.items():
            m = pc.equal(pred, p)
            t = b.filter(m)
            if t.num_rows:
                nodes.append(t.column("subj").combine_chunks())
                types.append(pa.array([dom] * t.num_rows, pa.string()))
            if rng is not None:
                ti = t.filter(pc.equal(t.column("obj_kind"), "iri"))
                if ti.num_rows:
                    nodes.append(ti.column("obj").combine_chunks())
                    types.append(pa.array([rng] * ti.num_rows, pa.string()))
        if not nodes:
            return pa.table(
                {"node": pa.array([], pa.string()), "rdf_type": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in nodes]),
                "rdf_type": pa.concat_arrays(types),
            }
        )

    return distinct_rows(
        tri.map_batches(_infer, batch_format="pyarrow"), ["node", "rdf_type"]
    )


SQL_KG_TYPE_INFERENCE = f"""
WITH canon AS ({SQL_KG_CANONICAL}),
inf AS (
  SELECT subj AS node,
         CASE pred WHEN 'hasAccountBalance' THEN 'Customer'
                   WHEN 'basedIn' THEN 'Customer'
                   WHEN 'partOf' THEN 'Nation' END AS rdf_type
  FROM canon
  UNION ALL
  SELECT obj,
         CASE pred WHEN 'basedIn' THEN 'Nation'
                   WHEN 'partOf' THEN 'Region' END
  FROM canon WHERE obj_kind = 'iri'
)
SELECT DISTINCT node, rdf_type FROM inf WHERE rdf_type IS NOT NULL
"""

KG_REGISTRY.update(
    {"kg_type_inference": QueryDef(q_kg_type_inference, SQL_KG_TYPE_INFERENCE)}
)


def q_kg_entity_cooccurrence(sf_dir: str):
    """Entity-mention co-occurrence counts (the statistic feeding relation
    extraction / PMI in KG construction): distinct mention entities per page
    (subjects + mention-kind objects), page-keyed self-join for ordered
    pairs, global count per pair. Scale shape: the self-join hash-partitions
    on url (per-page entity count is bounded by the extractor, so join
    fan-out per key is bounded), pair counts are folded-key ``sum_per_key``
    sort-scans — no per-group aggregate at pair cardinality."""
    from .extras.graph import sum_per_key
    from .kg.extract import extract_mentions
    from .kg.pages import synthesize_pages
    from .util import distinct_rows, hash_join

    m = extract_mentions(
        synthesize_pages(sf_dir).select_columns(["url", "html"])
    )

    def _ents(b: pa.Table) -> pa.Table:
        subj = pa.table(
            {"url": b.column("url").combine_chunks(), "ent": b.column("subj").combine_chunks()}
        )
        mo = b.filter(pc.equal(b.column("obj_kind"), "mention"))
        obj = pa.table(
            {"url": mo.column("url").combine_chunks(), "ent": mo.column("obj").combine_chunks()}
        )
        return pa.concat_tables([subj, obj])

    ue = distinct_rows(m.map_batches(_ents, batch_format="pyarrow"), ["url", "ent"])
    left = ue.rename_columns({"ent": "ent_a"})
    right = ue.rename_columns({"ent": "ent_b"})
    pairs = hash_join(left, right, on="url", join_type="inner")

    def _fold(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b.column("ent_a"), b.column("ent_b")))
        return pa.table(
            {
                "pair": pc.binary_join_element_wise(
                    t.column("ent_a"), t.column("ent_b"), "\x00"
                ),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    counts = sum_per_key(
        pairs.map_batches(_fold, batch_format="pyarrow"), "pair", "c"
    )

    def _split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("pair"), "\x00")
        return pa.table(
            {
                "ent_a": pc.list_element(parts, 0),
                "ent_b": pc.list_element(parts, 1),
                "n_pages": t.column("c").combine_chunks(),
            }
        )

    return counts.map_batches(_split, batch_format="pyarrow")


SQL_KG_ENTITY_COOCCURRENCE = f"""
WITH m AS ({SQL_KG_MENTIONS}),
ue AS (
  SELECT DISTINCT url, subj AS ent FROM m
  UNION
  SELECT DISTINCT url, obj FROM m WHERE obj_kind = 'mention'
)
SELECT a.ent AS ent_a, b.ent AS ent_b, count(*) AS n_pages
FROM ue a JOIN ue b ON a.url = b.url AND a.ent < b.ent
GROUP BY a.ent, b.ent
"""

KG_REGISTRY.update(
    {
        "kg_entity_cooccurrence": QueryDef(
            q_kg_entity_cooccurrence, SQL_KG_ENTITY_COOCCURRENCE
        )
    }
)
