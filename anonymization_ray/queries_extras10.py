"""Round-4 waves 63+ operators with DuckDB oracles: warehouse-format
interchange (ORC / Feather-IPC shard sinks + parallel readers), RDF
collection (rdf:List) ranking, OWL inverse/symmetric materialization,
robots.txt longest-match crawl filtering, and graph/text/stream
additions continuing the wave cadence.
"""

from __future__ import annotations

import numpy as np
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


# --------------------------------------------------------------------------
# wave 66: robots.txt longest-match crawl filter
# --------------------------------------------------------------------------

# deterministic robots fixture: example.org blocks /doc/1* except /doc/12*;
# even h{k} subdomain hosts block /doc entirely except /doc/3*; odd hosts
# publish no robots.txt (everything allowed)
_ROBOTS_BODIES = {
    "example.org": "User-agent: *\nDisallow: /doc/1\nAllow: /doc/12\n",
    **{
        f"h{k}.example.org": "User-agent: *\nDisallow: /doc\nAllow: /doc/3\n"
        for k in (0, 2, 4, 6)
    },
}


def _crawl_urls(sf_dir: str):
    """Three url variants per document (plain, query-string, sharded
    subdomain host) — the frontier-style synthesis, fully vectorized."""
    docs = load(sf_dir, "documents", ["doc_id"])

    def _urls(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        hs = pc.cast(
            pc.subtract(
                batch.column("doc_id"),
                pc.multiply(
                    pc.divide(batch.column("doc_id"), 8),
                    pa.scalar(8, pa.int64()),
                ),
            ),
            pa.string(),
        )
        u0 = pc.binary_join_element_wise(
            pa.array(
                ["https://example.org/doc/"] * batch.num_rows, pa.string()
            ),
            ids,
            "",
        )
        u1 = pc.binary_join_element_wise(u0, "?id=", ids, "")
        u2 = pc.binary_join_element_wise(
            pa.array(["https://h"] * batch.num_rows, pa.string()),
            hs,
            ".example.org/doc/",
            ids,
            "",
        )
        did = batch.column("doc_id").combine_chunks()
        return pa.table(
            {
                "doc_id": pa.concat_arrays([did] * 3),
                "url": pa.concat_arrays(
                    [u.combine_chunks() if isinstance(u, pa.ChunkedArray)
                     else u for u in (u0, u1, u2)]
                ),
            }
        )

    return docs.map_batches(_urls, batch_format="pyarrow")


def q_crawl_robots_filter(sf_dir: str):
    """RFC 9309 robots evaluation (`extras/robots.py`): parse per-host
    robots.txt bodies into (host, allow, prefix) rules, broadcast once,
    keep urls whose longest matching rule allows (tie -> Allow; no rule
    -> allowed). One vectorized starts_with sweep per rule per batch —
    the corpus stream never shuffles."""
    from .extras.robots import parse_robots_rules, robots_filter

    rules = parse_robots_rules(_ROBOTS_BODIES)
    return robots_filter(_crawl_urls(sf_dir), rules, url_col="url")


def _sql_robots_filter() -> str:
    vals = ", ".join(
        f"('{h}', {str(allow).upper()}, '{pfx}')"
        for h, body in sorted(_ROBOTS_BODIES.items())
        for allow, pfx in [
            (ln.split(":", 1)[0].strip().lower() == "allow",
             ln.split(":", 1)[1].strip())
            for ln in body.splitlines()
            if ln.lower().startswith(("allow", "disallow"))
        ]
    )
    return f"""
WITH d AS (SELECT doc_id FROM documents),
u AS (
  SELECT doc_id, 'https://example.org/doc/' || doc_id AS url,
         'example.org' AS host, '/doc/' || doc_id AS path FROM d
  UNION ALL
  SELECT doc_id, 'https://example.org/doc/' || doc_id || '?id=' || doc_id,
         'example.org', '/doc/' || doc_id || '?id=' || doc_id FROM d
  UNION ALL
  SELECT doc_id, 'https://h' || (doc_id % 8) || '.example.org/doc/' || doc_id,
         'h' || (doc_id % 8) || '.example.org', '/doc/' || doc_id FROM d
),
r(host, allow, pfx) AS (VALUES {vals}),
m AS (
  SELECT u.url, r.allow, length(r.pfx) AS l
  FROM u JOIN r ON u.host = r.host AND starts_with(u.path, r.pfx)
),
pick AS (
  SELECT url, allow,
         row_number() OVER (PARTITION BY url
                            ORDER BY l DESC, CAST(allow AS INT) DESC) AS rn
  FROM m
)
SELECT u.doc_id, u.url FROM u
LEFT JOIN (SELECT url, allow FROM pick WHERE rn = 1) p ON u.url = p.url
WHERE p.url IS NULL OR p.allow
"""


EXTRAS10_REGISTRY.update(
    {
        "crawl_robots_filter": QueryDef(
            q_crawl_robots_filter, _sql_robots_filter()
        )
    }
)


# --------------------------------------------------------------------------
# wave 67: 4-cycle (square) counting on the link graph
# --------------------------------------------------------------------------

def _doc_link_edges(sf_dir: str):
    """Canonical int64 link-graph edges: each doc links to its three hash
    targets ((31d+7)%c, (17d+3)%c, (53d+11)%c — the _SQL_LINKS_CTE hash
    family), (min,max)-oriented, self-loops dropped, distinct."""
    import numpy as np

    from .util import distinct_rows

    docs = load(sf_dir, "documents", ["doc_id"]).materialize()
    c = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ts = np.concatenate(
            [(31 * d + 7) % c, (17 * d + 3) % c, (53 * d + 11) % c]
        )
        ds3 = np.concatenate([d, d, d])
        keep = ds3 != ts
        a = np.minimum(ds3[keep], ts[keep])
        b = np.maximum(ds3[keep], ts[keep])
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    return distinct_rows(
        docs.map_batches(_edges, batch_format="pyarrow"), ["a", "b"]
    )


def q_graph_squares(sf_dir: str):
    """Non-induced 4-cycle count (`extras/graph.square_count`): squares =
    half the sum of C(codeg, 2) over distance-2 pairs — symmetrize, one
    wedge self-join, folded (x,z) pair key, sort-scan co-degree counts,
    streaming C(n,2) partial sums. The motif-counting companion to
    `graph_triangles` (C4 density is the standard bipartite-community /
    spam-farm signal in link graphs)."""
    from .extras.graph import square_count

    return square_count(_doc_link_edges(sf_dir))


def _sql_graph_squares() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    return f"""
WITH {_SQL_LINKS_CTE},
ed AS (
  SELECT DISTINCT least(doc_id, t) AS a, greatest(doc_id, t) AS b
  FROM e WHERE doc_id <> t
),
sym AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b, a FROM ed),
w AS (
  SELECT s1.u AS x, s2.v AS z
  FROM sym s1 JOIN sym s2 ON s1.v = s2.u AND s1.u < s2.v
),
cd AS (SELECT x, z, count(*) AS n FROM w GROUP BY x, z)
SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) // 2 AS BIGINT) AS squares
FROM cd
"""


EXTRAS10_REGISTRY.update(
    {"graph_squares": QueryDef(q_graph_squares, _sql_graph_squares())}
)


# --------------------------------------------------------------------------
# wave 68: multinomial Naive Bayes language classifier
# --------------------------------------------------------------------------

def q_text_naive_bayes(sf_dir: str):
    """Corpus-trained multinomial Naive Bayes (`extras/nbayes.py`):
    per-lang token stats with add-one smoothing in integer micro-nats,
    broadcast model, one stateless scoring pass (searchsorted + bincount
    per class per batch); argmax prediction with deterministic
    smallest-class tie-break — the fastText/CCNet-style router in
    cross-engine-exact form."""
    from .extras.nbayes import naive_bayes_predict

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    return naive_bayes_predict(
        docs, text_col="text", label_col="lang", id_col="doc_id"
    )


SQL_TEXT_NAIVE_BAYES = r"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
cnt AS (SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term),
tot AS (SELECT lang, count(*) AS t FROM tok GROUP BY lang),
voc AS (SELECT count(DISTINCT term) AS v FROM tok),
dl AS (SELECT lang, count(*) AS dn FROM documents GROUP BY lang),
dd AS (SELECT count(*) AS d FROM documents),
pri AS (SELECT lang, CAST(floor(1000000 * (ln(dn) - ln(d))) AS BIGINT) AS p
        FROM dl, dd),
tv AS (
  SELECT l.lang AS cand, tm.term,
         CAST(floor(1000000 * (ln(COALESCE(c.n, 0) + 1)
                               - ln(t.t + voc.v))) AS BIGINT) AS nv
  FROM (SELECT DISTINCT term FROM tok) tm
  CROSS JOIN (SELECT lang FROM dl) l
  JOIN tot t ON t.lang = l.lang
  CROSS JOIN voc
  LEFT JOIN cnt c ON c.lang = l.lang AND c.term = tm.term
),
sc AS (
  SELECT tok.doc_id, tv.cand, sum(tv.nv) AS s
  FROM tok JOIN tv ON tv.term = tok.term
  GROUP BY tok.doc_id, tv.cand
),
scored AS (
  SELECT sc.doc_id, sc.cand, sc.s + pri.p AS score
  FROM sc JOIN pri ON pri.lang = sc.cand
),
pick AS (
  SELECT doc_id, cand, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM scored
)
SELECT doc_id, cand AS pred_label, CAST(score AS BIGINT) AS score_micro
FROM pick WHERE rn = 1
"""


EXTRAS10_REGISTRY.update(
    {"text_naive_bayes": QueryDef(q_text_naive_bayes, SQL_TEXT_NAIVE_BAYES)}
)


# --------------------------------------------------------------------------
# wave 69: CEP event-sequence pattern matching (MATCH_RECOGNIZE-lite)
# --------------------------------------------------------------------------

_CEP_PATTERN = "vc+p"  # view -> one-or-more clicks -> purchase


def q_events_pattern_match(sf_dir: str):
    """Complex-event-processing sequence match: per user, events in
    (ts, event_id) order become a one-char-per-event code string (one
    `string_agg_per_key` range sort — no per-group UDF), then the CEP
    pattern `view (click)+ purchase` counts as non-overlapping RE2
    matches per sequence — both this engine (Arrow
    ``count_substring_regex``) and the DuckDB oracle
    (``regexp_extract_all``) run RE2, so greedy non-overlap semantics
    agree by construction. The SQL MATCH_RECOGNIZE workhorse reduced to
    its distributed core: order-within-key + vectorized regex."""
    from .util import string_agg_per_key

    ev = load(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def _code(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id").combine_chunks(),
                "ts": batch.column("ts").combine_chunks(),
                "event_id": batch.column("event_id").combine_chunks(),
                "code": pc.utf8_slice_codeunits(
                    batch.column("event_type").combine_chunks(), 0, 1
                ),
            }
        )

    seq = string_agg_per_key(
        ev.map_batches(_code, batch_format="pyarrow"),
        "user_id",
        "code",
        sep="",
        order_cols=["ts", "event_id"],
        out_col="seq",
    )

    def _match(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch.column("seq").combine_chunks(), _CEP_PATTERN
        )
        t = batch.append_column("n_matches", pc.cast(n, pa.int64()))
        t = t.filter(pc.greater(t.column("n_matches"), 0))
        return pa.table(
            {
                "user_id": t.column("user_id").combine_chunks(),
                "n_matches": t.column("n_matches").combine_chunks(),
            }
        )

    return seq.map_batches(_match, batch_format="pyarrow")


SQL_EVENTS_PATTERN_MATCH = f"""
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, '{_CEP_PATTERN}')) AS BIGINT)
         AS n_matches
FROM s WHERE len(regexp_extract_all(seq, '{_CEP_PATTERN}')) > 0
"""


EXTRAS10_REGISTRY.update(
    {
        "events_pattern_match": QueryDef(
            q_events_pattern_match, SQL_EVENTS_PATTERN_MATCH
        )
    }
)


# --------------------------------------------------------------------------
# wave 70: landmark closeness centrality (bounded-radius BFS per landmark)
# --------------------------------------------------------------------------

_CLOSENESS_SEEDS = (0, 1, 2)
_CLOSENESS_ROUNDS = 4


def q_graph_closeness(sf_dir: str):
    """Landmark closeness over the symmetrized link graph: one
    exactly-k-rounds Bellman-Ford (unit weights = bounded-radius BFS,
    `extras/graph.bellman_ford` — edges never shuffle, per-round exchange
    is one narrow min fold) per landmark, then
    closeness_micro = (10^6·(reached−1)) // Σdist in exact integer
    division. Per-landmark BFS is the textbook closeness/landmark
    sampling shape — landmarks are few by construction, the graph is the
    big side."""
    import numpy as np

    from .extras.graph import bellman_ford

    edges = _doc_link_edges(sf_dir).materialize()

    def _sym_w(batch: pa.Table) -> pa.Table:
        import numpy as np

        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "w": pa.array(np.ones(2 * len(a), np.int64())),
            }
        )

    sym = edges.map_batches(_sym_w, batch_format="pyarrow").materialize()
    seeds, reached, sums, clo = [], [], [], []
    for s in _CLOSENESS_SEEDS:
        dist = bellman_ford(sym, [s], _CLOSENESS_ROUNDS).materialize()
        n = dist.count()
        sd = int(dist.sum("dist") or 0)
        if sd == 0:  # isolated landmark: no finite closeness row
            continue
        seeds.append(s)
        reached.append(n - 1)
        sums.append(sd)
        clo.append((1_000_000 * (n - 1)) // sd)
    return pa.table(
        {
            "seed": pa.array(seeds, pa.int64()),
            "n_reached": pa.array(reached, pa.int64()),
            "sum_dist": pa.array(sums, pa.int64()),
            "closeness_micro": pa.array(clo, pa.int64()),
        }
    )


def _sql_graph_closeness() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    seeds = ", ".join(f"({s})" for s in _CLOSENESS_SEEDS)
    return f"""
WITH RECURSIVE {_SQL_LINKS_CTE},
ed AS (
  SELECT DISTINCT least(doc_id, t) AS a, greatest(doc_id, t) AS b
  FROM e WHERE doc_id <> t
),
sym AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b, a FROM ed),
walk(s, node, d) AS (
  SELECT s, s, 0 FROM (VALUES {seeds}) AS sd(s)
  UNION ALL
  SELECT w.s, sym.v, w.d + 1 FROM walk w JOIN sym ON sym.u = w.node
  WHERE w.d < {_CLOSENESS_ROUNDS}
),
dist AS (SELECT s, node, min(d) AS d FROM walk GROUP BY s, node)
SELECT s AS seed, CAST(count(*) - 1 AS BIGINT) AS n_reached,
       CAST(sum(d) AS BIGINT) AS sum_dist,
       CAST((1000000 * (count(*) - 1)) // sum(d) AS BIGINT)
         AS closeness_micro
FROM dist GROUP BY s HAVING sum(d) > 0
"""


EXTRAS10_REGISTRY.update(
    {"graph_closeness": QueryDef(q_graph_closeness, _sql_graph_closeness())}
)


# --------------------------------------------------------------------------
# wave 71: pHash (fixed-point DCT perceptual hash) image fingerprints
# --------------------------------------------------------------------------

def q_multimodal_phash(sf_dir: str):
    """DCT perceptual hash over REAL PNG payloads
    (`multimodal.MediaPHasher`): fixed-point int64 DCT basis built once
    per actor, T = C·P·Cᵀ exact, 63 AC coefficients thresholded at their
    median (32nd order statistic), 63-bit fingerprint split into signed
    int64 halves. The whole encode -> actor-decode -> transform -> hash
    path is certified value-level by a SQL oracle that re-derives every
    coefficient from the closed-form pixels and the SAME rounded basis
    integers."""
    from .extras.multimodal import attach_media_affine, phash_media

    docs = load(sf_dir, "documents", ["doc_id"])
    return phash_media(attach_media_affine(docs, "doc_id"))


def _sql_multimodal_phash() -> str:
    from .extras.multimodal import phash_basis

    b = phash_basis()
    vals = ", ".join(
        f"({k}, {i}, {int(b[k, i])})"
        for k in range(b.shape[0])
        for i in range(b.shape[1])
    )
    return f"""
WITH c(k, i, v) AS (VALUES {vals}),
pix AS (
  SELECT d.doc_id, p.p // 16 AS r, p.p % 16 AS col,
         (d.doc_id * 31 + p.p * p.p) % 256 AS px
  FROM documents d, unnest(range(256)) AS p(p)
),
t1 AS (  -- C · P : (k, col)
  SELECT pix.doc_id, c.k, pix.col, sum(c.v * pix.px) AS s
  FROM c JOIN pix ON pix.r = c.i
  GROUP BY pix.doc_id, c.k, pix.col
),
t AS (  -- (C·P) · Cᵀ : (k, l)
  SELECT t1.doc_id, t1.k, c.k AS l, sum(t1.s * c.v) AS coeff
  FROM t1 JOIN c ON c.i = t1.col
  GROUP BY t1.doc_id, t1.k, c.k
),
ac AS (
  SELECT doc_id, k * 8 + l - 1 AS j, coeff
  FROM t WHERE NOT (k = 0 AND l = 0)
),
med AS (
  SELECT doc_id, coeff AS m FROM (
    SELECT doc_id, coeff,
           row_number() OVER (PARTITION BY doc_id ORDER BY coeff) AS rn
    FROM ac) WHERE rn = 32
),
bits AS (
  SELECT ac.doc_id, ac.j,
         CASE WHEN ac.coeff > med.m THEN 1 ELSE 0 END AS b
  FROM ac JOIN med ON med.doc_id = ac.doc_id
)
SELECT doc_id,
       CAST(sum(CASE WHEN j >= 32
                     THEN b * (CAST(1 AS BIGINT) << CAST(j - 32 AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS hash_hi,
       CAST(sum(CASE WHEN j < 32
                     THEN b * (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS hash_lo
FROM bits GROUP BY doc_id
"""


EXTRAS10_REGISTRY.update(
    {"multimodal_phash": QueryDef(q_multimodal_phash, _sql_multimodal_phash())}
)


# --------------------------------------------------------------------------
# wave 72: hierarchy flattening (root + depth per node)
# --------------------------------------------------------------------------

def q_hier_flatten(sf_dir: str):
    """Forest flatten (`extras/hierarchy.tree_root_depth`): customers form
    a deterministic ternary forest (parent(k) = k//3, roots are keys 1
    and 2) ~7 levels deep at sf0.001; pointer doubling resolves every
    node's (root, depth) in O(log depth) vectorized rounds where the SQL
    oracle needs one recursive-CTE round PER LEVEL — the textbook
    parallel-vs-sequential gap this operator exists for."""
    from .extras.hierarchy import tree_root_depth

    cust = load(sf_dir, "customer", ["c_custkey"])

    def _edges(batch: pa.Table) -> pa.Table:
        import numpy as np

        k = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k = k[k >= 3]
        return pa.table(
            {
                "child": pa.array(k, pa.int64()),
                "parent": pa.array(k // 3, pa.int64()),
            }
        )

    edges = cust.map_batches(_edges, batch_format="pyarrow")
    return tree_root_depth(edges, child_col="child", parent_col="parent")


SQL_HIER_FLATTEN = """
WITH RECURSIVE hier(node, root, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 3
  UNION ALL
  SELECT c.c_custkey, h.root, h.depth + 1
  FROM customer c JOIN hier h ON h.node = c.c_custkey // 3
  WHERE c.c_custkey >= 3
)
SELECT node, root, CAST(depth AS BIGINT) AS depth FROM hier WHERE depth > 0
"""


EXTRAS10_REGISTRY.update(
    {"hier_flatten": QueryDef(q_hier_flatten, SQL_HIER_FLATTEN)}
)


# --------------------------------------------------------------------------
# wave 73: connected components on the link graph
# --------------------------------------------------------------------------

def q_graph_components(sf_dir: str):
    """Connected components as a first-class graph query: (node, comp)
    with comp = the component's minimum node id. Reuses the dedup
    family's resolution core (`extras/dedup.cluster_keepers`: exact
    driver union-find under the edge cap, distributed min-label
    contraction above it, then one corpus-sized min fold for
    singletons) over the link graph restricted to even-numbered edges —
    the restriction splits the otherwise-connected expander into many
    nontrivial components so the query actually exercises labeling."""
    import numpy as np

    from .extras.dedup import cluster_keepers

    edges = _doc_link_edges(sf_dir)

    def _even(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = ((a + b) % 3) == 0
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
            }
        )

    pairs = edges.map_batches(_even, batch_format="pyarrow")
    nodes = load(sf_dir, "documents", ["doc_id"])
    return cluster_keepers(nodes, pairs, id_col="doc_id").rename_columns(
        {"keeper_id": "comp"}
    )


def _sql_graph_components() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    return f"""
WITH RECURSIVE {_SQL_LINKS_CTE},
ed AS (
  SELECT DISTINCT least(doc_id, t) AS a, greatest(doc_id, t) AS b
  FROM e WHERE doc_id <> t
),
sel AS (SELECT a, b FROM ed WHERE (a + b) % 3 = 0),
edges AS (SELECT a AS u, b AS v FROM sel UNION ALL SELECT b, a FROM sel),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
)
SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id
"""


EXTRAS10_REGISTRY.update(
    {"graph_components": QueryDef(q_graph_components, _sql_graph_components())}
)


# --------------------------------------------------------------------------
# wave 74: XML sitemap source (crawl-frontier ingestion, sitemaps.org)
# --------------------------------------------------------------------------

def q_crawl_sitemap_roundtrip(sf_dir: str):
    """documents -> deterministic (url, lastmod, priority) frontier rows ->
    one <urlset> XML shard per block (`sources/sitemap.py`,
    SHA-1-content filenames: task retries rewrite identical bytes) ->
    `read_sitemaps` back (read_binary_files parallel fetch + vectorized
    split_pattern/extract_regex parse, no XML DOM). Identity oracle: the
    crawl-frontier interchange format must round-trip urls, W3C lastmod
    datetimes (second resolution) and one-decimal priorities exactly."""
    import shutil
    import tempfile

    import numpy as np

    from .sources.sitemap import read_sitemaps, write_sitemap_shards

    docs = load(sf_dir, "documents", ["doc_id"])

    _EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        url = pc.binary_join_element_wise(
            pa.scalar("https://crawl.example/doc/"),
            pc.cast(pa.array(ids, pa.int64()), pa.string()),
            pa.scalar(""),
        )
        lastmod = (
            _EPOCH_2024_US
            + (ids % 365) * 86_400_000_000
            + (ids % 86_400) * 1_000_000
        )
        prio = ((ids % 10) + 1) * 100_000
        return pa.table(
            {
                "url": url,
                "lastmod": pa.array(lastmod, pa.timestamp("us")),
                "priority_micro": pa.array(prio, pa.int64()),
            }
        )

    frontier = docs.map_batches(_mk, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="sitemap_rt_")
    try:
        man = write_sitemap_shards(
            frontier,
            out_dir,
            lastmod_col="lastmod",
            priority_micro_col="priority_micro",
        )
        assert man.num_rows >= 1
        def _pages_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(b.column("is_index"))).select(
                ["url", "lastmod", "priority_micro"]
            )

        back = read_sitemaps(out_dir).map_batches(
            _pages_only, batch_format="pyarrow"
        )
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_SITEMAP_ROUNDTRIP = """
SELECT 'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2024-01-01 00:00:00'
         + (doc_id % 365) * INTERVAL 1 DAY
         + (doc_id % 86400) * INTERVAL 1 SECOND AS lastmod,
       ((doc_id % 10) + 1) * 100000 AS priority_micro
FROM documents
"""


EXTRAS10_REGISTRY.update(
    {
        "crawl_sitemap_roundtrip": QueryDef(
            q_crawl_sitemap_roundtrip, SQL_SITEMAP_ROUNDTRIP
        )
    }
)


# --------------------------------------------------------------------------
# wave 75: spatial grid-partitioned radius join
# --------------------------------------------------------------------------

_SPATIAL_SALT = 7001
_SPATIAL_MOD = 100_003
_SPATIAL_RADIUS = 4_000


def q_spatial_radius_join(sf_dir: str):
    """All point pairs within euclidean distance R over a deterministic
    planar point set (one SplitMix64 hash per doc_id; x = low digits,
    y = next digits — `extras/shuffle.sm64_key`, the engine's SQL-exact
    keyed stream). Ray side is the grid-cell self-join
    (`extras/spatial.grid_radius_join`): cell side = R, half-space
    neighbor offsets make each nearby pair meet exactly once, integer
    dist2 so the oracle comparison is value-exact. The oracle pays the
    O(n^2) cross join the grid avoids."""
    import numpy as np

    from .extras.shuffle import sm64_key
    from .extras.spatial import grid_radius_join

    docs = load(sf_dir, "documents", ["doc_id"])

    def _points(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = sm64_key(ids.astype(np.int64), _SPATIAL_SALT)
        m = np.uint64(_SPATIAL_MOD)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "x": pa.array((h % m).astype(np.int64), pa.int64()),
                "y": pa.array(((h // m) % m).astype(np.int64), pa.int64()),
            }
        )

    pts = docs.map_batches(_points, batch_format="pyarrow")
    return grid_radius_join(pts, radius=_SPATIAL_RADIUS)


def _sql_spatial_radius_join() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        "(SELECT doc_id FROM documents)", "doc_id", _SPATIAL_SALT
    )
    m, r2 = _SPATIAL_MOD, _SPATIAL_RADIUS * _SPATIAL_RADIUS
    return f"""
WITH {chain},
p AS (SELECT doc_id,
             CAST(h % {m} AS BIGINT) AS x,
             CAST((h // {m}) % {m} AS BIGINT) AS y
      FROM h3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {r2}
"""


EXTRAS10_REGISTRY.update(
    {
        "spatial_radius_join": QueryDef(
            q_spatial_radius_join, _sql_spatial_radius_join()
        )
    }
)


# --------------------------------------------------------------------------
# wave 76: δ-presence KPI (membership disclosure vs a public population)
# --------------------------------------------------------------------------

def q_kpi_delta_presence(sf_dir: str):
    """δ-presence over the customer table: population = all customers,
    private sample = the BUILDING market segment, QI equivalence class =
    (nation, account-balance sign). Per class: population size, sample
    size, and the presence probability δ = |S∩C|/|P∩C| in exact integer
    micro-units (`extras/privacy.delta_presence`, one fold_per_key pass —
    the population never shuffles wide). The class key packs the two QI
    attributes into one int64 and is unpacked for output."""
    import numpy as np

    from .extras.privacy import delta_presence

    cust = load(
        sf_dir, "customer", ["c_nationkey", "c_acctbal", "c_mktsegment"]
    )

    def _classes(b: pa.Table) -> pa.Table:
        nat = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        seg = b.column("c_mktsegment")
        bal_class = (bal >= 0).astype(np.int64)
        return pa.table(
            {
                "class_key": pa.array(nat * 2 + bal_class, pa.int64()),
                "in_sample": pc.cast(
                    pc.equal(seg, "BUILDING"), pa.int64()
                ),
            }
        )

    classed = cust.map_batches(_classes, batch_format="pyarrow")
    folded = delta_presence(classed, class_col="class_key", sample_col="in_sample")

    def _unpack(b: pa.Table) -> pa.Table:
        key = b.column("class_key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nationkey": pa.array(key // 2, pa.int64()),
                "bal_class": pa.array(key % 2, pa.int64()),
                "n_pop": b.column("n_pop"),
                "n_sample": b.column("n_sample"),
                "delta_micro": b.column("delta_micro"),
            }
        )

    return folded.map_batches(_unpack, batch_format="pyarrow")


SQL_KPI_DELTA_PRESENCE = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT) AS bal_class,
       count(*) AS n_pop,
       CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sample,
       (1000000 * CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                       AS BIGINT)) // count(*) AS delta_micro
FROM customer
GROUP BY 1, 2
"""


EXTRAS10_REGISTRY.update(
    {
        "kpi_delta_presence": QueryDef(
            q_kpi_delta_presence, SQL_KPI_DELTA_PRESENCE
        )
    }
)


# --------------------------------------------------------------------------
# wave 77: DAG topological layering (bounded longest-path levels)
# --------------------------------------------------------------------------

_TOPO_ROUNDS = 6


def q_graph_topo_layers(sf_dir: str):
    """Topological layers of the link DAG: the link graph restricted to
    forward edges (u < v — acyclic by construction, the id order IS a
    topological order), each node labeled with the length of the longest
    path ending at it within exactly 6 relaxation rounds
    (`extras/graph.dag_layers`: one edge-stream hash join + one max fold
    per round). Layer = the node's scheduling level; the oracle is a
    depth-bounded recursive-CTE walk taking max path length per node."""
    import numpy as np

    edges = _doc_link_edges(sf_dir)

    def _fwd(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table(
            {
                "u": pa.array(a[keep], pa.int64()),
                "v": pa.array(b[keep], pa.int64()),
            }
        )

    from .extras.graph import dag_layers

    fwd = edges.map_batches(_fwd, batch_format="pyarrow")
    nodes = load(sf_dir, "documents", ["doc_id"]).rename_columns(
        {"doc_id": "node"}
    )
    out = dag_layers(fwd, rounds=_TOPO_ROUNDS, nodes=nodes)
    return out.rename_columns({"node": "doc_id"})


def _sql_graph_topo_layers() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    return f"""
WITH RECURSIVE {_SQL_LINKS_CTE},
ed AS (
  SELECT DISTINCT least(doc_id, t) AS u, greatest(doc_id, t) AS v
  FROM e WHERE doc_id <> t
),
walk(v, len) AS (
  SELECT doc_id, 0 FROM documents
  UNION ALL
  SELECT ed.v, walk.len + 1
  FROM ed JOIN walk ON walk.v = ed.u
  WHERE walk.len < {_TOPO_ROUNDS}
)
SELECT v AS doc_id, CAST(max(len) AS BIGINT) AS layer FROM walk GROUP BY v
"""


EXTRAS10_REGISTRY.update(
    {
        "graph_topo_layers": QueryDef(
            q_graph_topo_layers, _sql_graph_topo_layers()
        )
    }
)


# --------------------------------------------------------------------------
# wave 78: theta/KMV sketch set-intersection estimates
# --------------------------------------------------------------------------

_THETA_K = 256
_THETA_BOUND_MICRO = 312_500  # 5/sqrt(k) as micro-units — ~4 sigma for KMV


def q_stats_theta_intersect(sf_dir: str):
    """Pairwise distinct-customer intersection estimates between order
    years via KMV theta sketches (`extras/stats.kmv_sketches`: k smallest
    SplitMix64 hashes per set, built with one distinct pass + one
    rank_per_key sort — gather bounded by k·|sets|), scoreboarded against
    the EXACT intersection (distinct-pair self-join + packed-key count,
    the oracle's own computation): each pair's
    |est/exact - 1| <= 5/sqrt(k) flag is pinned to 1 by the oracle.
    Sketches with < k elements are exact by construction (the sf0.001
    regime); sf0.01+ exercises genuine estimation."""
    import numpy as np

    from .extras.stats import exact_value_counts, kmv_sketches, theta_intersections
    from .util import distinct_rows

    orders = load(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def _yc(b: pa.Table) -> pa.Table:
        y = pc.year(b.column("o_orderdate"))
        return pa.table(
            {
                "y": pc.cast(y, pa.int64()),
                "c": pc.cast(b.column("o_custkey"), pa.int64()),
            }
        )

    yc = orders.map_batches(_yc, batch_format="pyarrow")
    sketches = kmv_sketches(yc, "y", "c", k=_THETA_K)
    ests = theta_intersections(sketches)

    # exact intersections: distinct (y, c) self-joined on the customer,
    # ordered-pair counts via the no-groupby exact counter
    from .util import hash_join

    uniq = distinct_rows(yc, ["y", "c"])
    left = uniq.rename_columns({"y": "ya"})
    right = uniq.rename_columns({"y": "yb"})
    joined = hash_join(left, right, on="c", join_type="inner")

    def _pairs(b: pa.Table) -> pa.Table:
        ya = b.column("ya").to_numpy(zero_copy_only=False)
        yb = b.column("yb").to_numpy(zero_copy_only=False)
        keep = ya < yb
        return pa.table(
            {"pk": pa.array(ya[keep] * 10_000 + yb[keep], pa.int64())}
        )

    counts = exact_value_counts(
        joined.map_batches(_pairs, batch_format="pyarrow"), "pk"
    ).take_all()

    rows = []
    for r in sorted(counts, key=lambda r: r["pk"]):
        ya, yb = int(r["pk"]) // 10_000, int(r["pk"]) % 10_000
        exact = int(r["n"])
        est = ests.get((ya, yb), 0.0)
        ok = int(
            abs(est / exact - 1.0) * 1_000_000 <= _THETA_BOUND_MICRO
        ) if exact else 1
        rows.append((ya, yb, exact, ok))
    return pa.table(
        {
            "year_a": pa.array([r[0] for r in rows], pa.int64()),
            "year_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_exact": pa.array([r[2] for r in rows], pa.int64()),
            "within_bound": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SQL_STATS_THETA_INTERSECT = """
WITH yc AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS y,
                  CAST(o_custkey AS BIGINT) AS c
  FROM orders
)
SELECT a.y AS year_a, b.y AS year_b, count(*) AS n_exact,
       CAST(1 AS BIGINT) AS within_bound
FROM yc a JOIN yc b ON a.c = b.c AND a.y < b.y
GROUP BY 1, 2
"""


EXTRAS10_REGISTRY.update(
    {
        "stats_theta_intersect": QueryDef(
            q_stats_theta_intersect, SQL_STATS_THETA_INTERSECT
        )
    }
)


# --------------------------------------------------------------------------
# wave 79: per-shard Bloom-index pruned point lookup
# --------------------------------------------------------------------------

_BLOOM_SHARDS = 8
_BLOOM_NEEDLES = (13, 217, 344)


def q_corpus_bloom_prune(sf_dir: str):
    """Point lookups over a HASH-sharded corpus via a per-shard Bloom
    manifest (`extras/bloomidx.py`): documents written hive-partitioned
    by SplitMix64 shard (the layout zonemaps CANNOT prune — every shard
    spans the full key range), blooms built in ONE narrow key pass
    (bit-OR-associative partials), probes consult the driver-held
    manifest and read ONLY candidate shard directories, exact is_in
    filter after the read removes false positives. Oracle pins the
    lookup result; the <= |needles| shard-read bound is pinned by a
    unit test."""
    import shutil
    import tempfile

    import numpy as np
    import ray.data as rd

    from .extras.bloomidx import (
        bloom_candidate_shards,
        build_shard_blooms,
        shard_of,
    )

    docs = load(sf_dir, "documents", ["doc_id", "n_chars"])

    def _sharded(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard", pa.array(shard_of(ids, _BLOOM_SHARDS), pa.int64())
        )

    sharded = docs.map_batches(_sharded, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="bloomidx_")
    try:
        sharded.write_parquet(out_dir, partition_cols=["shard"])
        blooms = build_shard_blooms(
            docs, "doc_id", num_shards=_BLOOM_SHARDS
        )
        probes = np.array(_BLOOM_NEEDLES, np.int64)
        cand = bloom_candidate_shards(
            blooms, probes, num_shards=_BLOOM_SHARDS
        )
        assert len(cand) <= len(_BLOOM_NEEDLES)
        if not cand:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        import os

        files = [
            os.path.join(out_dir, f"shard={s}", f)
            for s in sorted(cand)
            for f in os.listdir(os.path.join(out_dir, f"shard={s}"))
            if f.endswith(".parquet")
        ]
        back = rd.read_parquet(files)
        hits = back.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("doc_id"), value_set=pa.array(probes))
            ).select(["doc_id", "n_chars"]),
            batch_format="pyarrow",
        )
        return pa.Table.from_pandas(hits.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_CORPUS_BLOOM_PRUNE = """
SELECT doc_id, n_chars FROM documents WHERE doc_id IN (13, 217, 344)
"""


EXTRAS10_REGISTRY.update(
    {
        "corpus_bloom_prune": QueryDef(
            q_corpus_bloom_prune, SQL_CORPUS_BLOOM_PRUNE
        )
    }
)


# --------------------------------------------------------------------------
# wave 80: sentence segmentation stats
# --------------------------------------------------------------------------

def q_text_sentences(sf_dir: str):
    """Per-document sentence stats (`extras/textstats.sentence_stats`):
    RE2 terminator-run split, ascii-whitespace trim, empty drop —
    (doc_id, n_sentences, sum_chars) exact integers, one vectorized
    Arrow pass. DuckDB replicates the identical RE2 split with list
    lambdas, so values hash-match."""
    from .extras.textstats import sentence_stats

    return sentence_stats(load(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_SENTENCES = """
SELECT doc_id,
  CAST(len(list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
       s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))), s -> s <> ''))
       AS BIGINT) AS n_sentences,
  CAST(coalesce(list_sum(list_transform(list_filter(list_transform(
       regexp_split_to_array(text, '[.!?]+'),
       s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))), s -> s <> ''),
       s -> length(s))), 0) AS BIGINT) AS sum_chars
FROM documents
"""


EXTRAS10_REGISTRY.update(
    {"text_sentences": QueryDef(q_text_sentences, SQL_TEXT_SENTENCES)}
)


# --------------------------------------------------------------------------
# wave 81: golden-record survivorship merge (MDM)
# --------------------------------------------------------------------------

def q_er_golden_record(sf_dir: str):
    """Golden customer records from three conflicting source feeds with
    different trust priorities and null patterns
    (`extras/er.survivorship_merge`): per entity and attribute, first
    non-null by priority — CRM (1, gappy), billing (2, even keys only),
    legacy (3, complete). Per attribute: null-drop -> min_per_key winning
    priority -> one entity-keyed join; attributes re-join on the same
    entity key. Oracle replicates the fixture and picks with
    arg_min(value, priority) FILTER (non-null)."""
    import ray.data as rd

    from .extras.er import survivorship_merge

    cust = load(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def _feeds(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        name = b.column("c_name")
        phone = b.column("c_mktsegment")
        # src 1 (CRM): name null on k%5==0, phone null on k%3==0
        n1 = pc.if_else(pa.array(k % 5 == 0), pa.scalar(None, pa.string()), name)
        p1 = pc.if_else(pa.array(k % 3 == 0), pa.scalar(None, pa.string()), phone)
        # src 2 (billing): even keys only — odd rows fully null
        ev = pa.array(k % 2 == 0)
        n2 = pc.if_else(ev, pc.binary_join_element_wise(pa.scalar("B:"), name, pa.scalar("")), pa.scalar(None, pa.string()))
        p2 = pc.if_else(ev, pc.binary_join_element_wise(pa.scalar("B-"), phone, pa.scalar("")), pa.scalar(None, pa.string()))
        # src 3 (legacy): complete
        ks = pc.cast(pa.array(k), pa.string())
        n3 = pc.binary_join_element_wise(pa.scalar("L:"), ks, pa.scalar(""))
        p3 = pc.binary_join_element_wise(pa.scalar("L-"), phone, pa.scalar(""))
        n = len(k)
        import numpy as _np

        return pa.table(
            {
                "entity": pa.array(_np.tile(k, 3), pa.int64()),
                "prio": pa.array(
                    _np.repeat(_np.array([1, 2, 3], _np.int64), n)[
                        _np.concatenate([_np.arange(n), n + _np.arange(n), 2 * n + _np.arange(n)])
                    ],
                    pa.int64(),
                ),
                "name": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in (n1, n2, n3)]
                ),
                "phone": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in (p1, p2, p3)]
                ),
            }
        )

    feeds = cust.map_batches(_feeds, batch_format="pyarrow")
    out = survivorship_merge(
        feeds, entity_col="entity", priority_col="prio",
        value_cols=["name", "phone"],
    )
    return out.rename_columns({"entity": "c_custkey"})


SQL_ER_GOLDEN_RECORD = """
WITH feeds AS (
  SELECT c_custkey AS entity, 1 AS prio,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS name,
         CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS phone
  FROM customer
  UNION ALL
  SELECT c_custkey, 2,
         CASE WHEN c_custkey % 2 = 0 THEN 'B:' || c_name END,
         CASE WHEN c_custkey % 2 = 0 THEN 'B-' || c_mktsegment END
  FROM customer
  UNION ALL
  SELECT c_custkey, 3, 'L:' || CAST(c_custkey AS VARCHAR), 'L-' || c_mktsegment
  FROM customer
)
SELECT entity AS c_custkey,
       arg_min(name, prio) FILTER (WHERE name IS NOT NULL) AS name,
       arg_min(phone, prio) FILTER (WHERE phone IS NOT NULL) AS phone
FROM feeds GROUP BY entity
"""


EXTRAS10_REGISTRY.update(
    {"er_golden_record": QueryDef(q_er_golden_record, SQL_ER_GOLDEN_RECORD)}
)


# --------------------------------------------------------------------------
# wave 82: curriculum training order
# --------------------------------------------------------------------------

def q_corpus_curriculum_order(sf_dir: str):
    """Curriculum serving order over documents with n_chars as the
    difficulty proxy (`extras/shuffle.curriculum_order`): global
    difficulty rank -> 4 equal-height bands (easy first) -> SplitMix64
    intra-band shuffle, two global-rank sorts total. The oracle replays
    both row_number passes over the identical packed sort key."""
    from .extras.shuffle import curriculum_order

    docs = load(sf_dir, "documents", ["doc_id", "n_chars"])
    return curriculum_order(docs, "doc_id", "n_chars", bands=4)


def _sql_corpus_curriculum_order() -> str:
    from .extras.shuffle import CURRICULUM_SALT, sql_sm64_chain

    chain = sql_sm64_chain(
        "(SELECT doc_id, n_chars FROM documents)", "doc_id", CURRICULUM_SALT
    )
    return f"""
WITH {chain},
ranked AS (
  SELECT doc_id, CAST(h // 2 AS BIGINT) AS h63,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r,
         count(*) OVER () AS n
  FROM h3
),
banded AS (
  SELECT doc_id, (r * 4) // n AS band,
         ((r * 4) // n) * 2305843009213693952 + h63 // 8 AS pk
  FROM ranked
)
SELECT doc_id, CAST(band AS BIGINT) AS band,
       CAST(row_number() OVER (ORDER BY pk, doc_id) - 1 AS BIGINT) AS pos
FROM banded
"""


EXTRAS10_REGISTRY.update(
    {
        "corpus_curriculum_order": QueryDef(
            q_corpus_curriculum_order, _sql_corpus_curriculum_order()
        )
    }
)


# --------------------------------------------------------------------------
# wave 83: crawl politeness scheduling (per-host fetch waves)
# --------------------------------------------------------------------------

_POLITE_RATE = 2  # fetches per host per wave


def q_crawl_politeness_schedule(sf_dir: str):
    """Fetch-wave assignment over the crawl frontier: frontier urls
    (link targets not yet crawled, ranked by in-link evidence — the
    `kg_crawl_frontier` stream) are scheduled per HOST at a politeness
    rate of 2 fetches per wave: rank within host by (n_inlinks desc,
    url), wave = rank // rate. One `rank_per_key` range sort keyed on
    the host — the natural partitioning for a fetch fleet, where each
    worker owns hosts and drains waves in order. Oracle replays the
    ranking with a row_number window."""
    from .queries_extras8 import q_kg_crawl_frontier
    from .util import rank_per_key

    frontier = q_kg_crawl_frontier(sf_dir)

    def _host(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b.column("url"), r"^https?://(?P<h>[^/]+)/"),
            "h",
        )
        # rank key: descending in-links then url asc — flip the count so
        # ONE ascending sort serves both (counts are small positives)
        neg = pc.subtract(
            pa.scalar(1 << 40), pc.cast(b.column("n_inlinks"), pa.int64())
        )
        return pa.table(
            {
                "url": b.column("url"),
                "host": host,
                "negin": neg,
            }
        )

    hosted = frontier.map_batches(_host, batch_format="pyarrow")
    ranked = rank_per_key(hosted, "host", "negin", tie_col="url", rank_col="_r")

    def _wave(b: pa.Table) -> pa.Table:
        import numpy as np

        r = b.column("_r").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "url": b.column("url"),
                "host": b.column("host"),
                "wave": pa.array(r // _POLITE_RATE, pa.int64()),
            }
        )

    return ranked.map_batches(_wave, batch_format="pyarrow")


def _sql_crawl_politeness_schedule() -> str:
    from .queries_extras8 import SQL_KG_CRAWL_FRONTIER

    return f"""
WITH frontier AS ({SQL_KG_CRAWL_FRONTIER}),
hosted AS (
  SELECT url, regexp_extract(url, '^https?://([^/]+)/', 1) AS host, n_inlinks
  FROM frontier
)
SELECT url, host,
       CAST((row_number() OVER (PARTITION BY host
             ORDER BY n_inlinks DESC, url) - 1) // {_POLITE_RATE} AS BIGINT)
         AS wave
FROM hosted
"""


EXTRAS10_REGISTRY.update(
    {
        "crawl_politeness_schedule": QueryDef(
            q_crawl_politeness_schedule, _sql_crawl_politeness_schedule()
        )
    }
)


# --------------------------------------------------------------------------
# wave 84: property-path bounded repetition p{n,m}
# --------------------------------------------------------------------------

def q_kg_path_bounded_rep(sf_dir: str):
    """`tradesWith{2,3}` over the per-region trade chains (wave-65
    fixture: each nation trades with the NEXT nation of its region):
    nation pairs reachable in exactly 2 or 3 forward hops —
    `kg/paths.py` bounded repetition (Jena property-path extension),
    powers composed by one hash join per level with a set-semantics
    distinct fold. Oracle unrolls the same two/three-hop joins."""
    import ray.data as rd

    from .kg.paths import eval_path

    return eval_path(
        rd.from_arrow(_trades_edges(sf_dir)), "tradesWith{2,3}"
    )


SQL_KG_PATH_BOUNDED_REP = """
WITH tw AS (
  SELECT 'urn:nation:' || n_nationkey AS s,
         'urn:nation:' || lead(n_nationkey) OVER (
             PARTITION BY n_regionkey ORDER BY n_nationkey) AS o
  FROM nation
  QUALIFY o IS NOT NULL
),
t2 AS (SELECT a.s, b.o FROM tw a JOIN tw b ON a.o = b.s),
t3 AS (SELECT t2.s, c.o FROM t2 JOIN tw c ON t2.o = c.s)
SELECT DISTINCT s, o FROM (SELECT * FROM t2 UNION ALL SELECT * FROM t3)
"""


EXTRAS10_REGISTRY.update(
    {
        "kg_path_bounded_rep": QueryDef(
            q_kg_path_bounded_rep, SQL_KG_PATH_BOUNDED_REP
        )
    }
)


# --------------------------------------------------------------------------
# wave 85: Flesch-Kincaid readability (integer micro-units)
# --------------------------------------------------------------------------

def q_text_readability(sf_dir: str):
    """Per-doc Flesch-Kincaid grade (`extras/textstats.readability_fk`):
    words / vowel-group syllables / sentence terminators via three RE2
    count kernels, the grade as one truncating integer ratio in
    micro-units — float-free, so the DuckDB replica (regexp_extract_all
    lengths + the same single-ratio arithmetic) is value-exact."""
    from .extras.textstats import readability_fk

    return readability_fk(load(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_READABILITY = r"""
SELECT doc_id,
  CAST(length(regexp_extract_all(text, '[^\s]+')) AS BIGINT) AS words,
  CAST(length(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS syllables,
  CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sentences,
  CASE WHEN length(regexp_extract_all(text, '[.!?]+'))
            * length(regexp_extract_all(text, '[^\s]+')) > 0
  THEN (390000 * length(regexp_extract_all(text, '[^\s]+'))
                * length(regexp_extract_all(text, '[^\s]+'))
        + 11800000 * length(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                   * length(regexp_extract_all(text, '[.!?]+'))
        - 15590000 * length(regexp_extract_all(text, '[.!?]+'))
                   * length(regexp_extract_all(text, '[^\s]+')))
       // (length(regexp_extract_all(text, '[.!?]+'))
           * length(regexp_extract_all(text, '[^\s]+')))
  END AS fk_grade_micro
FROM documents
"""


EXTRAS10_REGISTRY.update(
    {"text_readability": QueryDef(q_text_readability, SQL_TEXT_READABILITY)}
)


# --------------------------------------------------------------------------
# wave 86: hub-removal ablation (graph robustness)
# --------------------------------------------------------------------------

_ABLATE_HUBS = 5


def q_graph_hub_ablation(sf_dir: str):
    """Robustness ablation: remove the top-5 hubs (degree desc, node asc
    tie) from the mod-3-restricted link graph and report the component
    size distribution of what remains — the targeted-attack curve point
    percolation analysis starts from. Degrees fold via one
    exact_value_counts pass; the hub set is K-bounded (one K-row driver
    gather off a narrow sort); removal is a broadcast is_in filter over
    nodes AND edge endpoints; components + singleton recovery reuse the
    wave-73 resolution core; sizes fold with a second exact count.
    Output (comp, size) with comp = the component's min node id."""
    import numpy as np

    from .extras.dedup import cluster_keepers
    from .extras.stats import exact_value_counts

    edges = _doc_link_edges(sf_dir)

    def _even(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = ((a + b) % 3) == 0
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
            }
        )

    sel = edges.map_batches(_even, batch_format="pyarrow").materialize()

    def _ends(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [
                b.column("id_a").combine_chunks(),
                b.column("id_b").combine_chunks(),
            ]
        )
        return pa.table({"node": n})

    deg = exact_value_counts(
        sel.map_batches(_ends, batch_format="pyarrow"), "node"
    )

    def _rank_key(b: pa.Table) -> pa.Table:
        # (degree desc, node asc) as ONE ascending key — degrees and node
        # ids are far below the 2^20 packing radix
        n = pc.cast(b.column("n"), pa.int64())
        node = pc.cast(b.column("node"), pa.int64())
        k = pc.add(
            pc.multiply(pc.subtract(pa.scalar(1 << 20), n), pa.scalar(1 << 40)),
            node,
        )
        return pa.table({"k": k, "node": node})

    hubs = [
        int(r["node"])
        for r in deg.map_batches(_rank_key, batch_format="pyarrow")
        .sort("k")
        .limit(_ABLATE_HUBS)
        .take_all()
    ]
    hub_set = pa.array(sorted(hubs), pa.int64())

    def _drop_edges(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.and_(
                pc.invert(pc.is_in(b.column("id_a"), value_set=hub_set)),
                pc.invert(pc.is_in(b.column("id_b"), value_set=hub_set)),
            )
        )

    reduced = sel.map_batches(_drop_edges, batch_format="pyarrow")
    nodes = load(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b.column("doc_id"), value_set=hub_set))
        ),
        batch_format="pyarrow",
    )
    comp = cluster_keepers(nodes, reduced, id_col="doc_id").rename_columns(
        {"keeper_id": "comp"}
    )
    sizes = exact_value_counts(comp.select_columns(["comp"]), "comp")
    return sizes.rename_columns({"n": "size"})


def _sql_graph_hub_ablation() -> str:
    from .queries_extras8 import _SQL_LINKS_CTE

    return f"""
WITH RECURSIVE {_SQL_LINKS_CTE},
ed AS (
  SELECT DISTINCT least(doc_id, t) AS a, greatest(doc_id, t) AS b
  FROM e WHERE doc_id <> t
),
sel AS (SELECT a, b FROM ed WHERE (a + b) % 3 = 0),
deg AS (
  SELECT n, count(*) AS c FROM (
    SELECT a AS n FROM sel UNION ALL SELECT b FROM sel
  ) GROUP BY n
),
hubs AS (SELECT n FROM deg ORDER BY c DESC, n LIMIT {_ABLATE_HUBS}),
red AS (
  SELECT a, b FROM sel
  WHERE a NOT IN (SELECT n FROM hubs) AND b NOT IN (SELECT n FROM hubs)
),
edges AS (SELECT a AS u, b AS v FROM red UNION ALL SELECT b, a FROM red),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  WHERE doc_id NOT IN (SELECT n FROM hubs)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
SELECT comp, count(*) AS size FROM comp GROUP BY comp
"""


EXTRAS10_REGISTRY.update(
    {
        "graph_hub_ablation": QueryDef(
            q_graph_hub_ablation, _sql_graph_hub_ablation()
        )
    }
)


# --------------------------------------------------------------------------
# wave 88: seasonal-naive forecast backtest
# --------------------------------------------------------------------------

def q_events_seasonal_backtest(sf_dir: str):
    """Seasonal-naive forecasting backtest over event traffic: forecast
    for hour h = the count at h − 24h (daily seasonality), scored per
    event type as (n_hours, sum_abs_err) over hours where BOTH actual
    and lagged counts exist — the baseline every traffic-forecast model
    must beat, in exact integers. Hourly counts fold via one packed-key
    exact_value_counts; the lag join is the SAME stream re-keyed +24h
    (one hash join, no window shuffle); the error folds with
    sum_per_key."""
    import numpy as np

    from .extras.graph import sum_per_key
    from .extras.stats import exact_value_counts
    from .util import hash_join

    ev = load(sf_dir, "events", ["ts", "event_type"])

    def _key(b: pa.Table) -> pa.Table:
        hour = pc.cast(
            pc.floor_temporal(b.column("ts"), unit="hour"), pa.int64()
        )
        h = pc.cast(pc.divide(hour, 3_600_000_000), pa.int64())
        return pa.table(
            {
                "k": pc.binary_join_element_wise(
                    b.column("event_type"),
                    pc.cast(h, pa.string()),
                    pa.scalar("|"),
                )
            }
        )

    counts = exact_value_counts(
        ev.map_batches(_key, batch_format="pyarrow"), "k"
    ).materialize()

    def _lagged(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("k"), "|")
        typ = pc.list_element(parts, 0)
        h = pc.cast(pc.list_element(parts, 1), pa.int64())
        return pa.table(
            {
                "k": pc.binary_join_element_wise(
                    typ,
                    pc.cast(pc.add(h, pa.scalar(24)), pa.string()),
                    pa.scalar("|"),
                ),
                "fcst": b.column("n"),
            }
        )

    fcst = counts.map_batches(_lagged, batch_format="pyarrow")
    joined = hash_join(counts, fcst, on="k", join_type="inner")

    def _err(b: pa.Table) -> pa.Table:
        typ = pc.list_element(pc.split_pattern(b.column("k"), "|"), 0)
        a = b.column("n").to_numpy(zero_copy_only=False)
        f = b.column("fcst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": typ,
                "one": pa.array(np.ones(len(a), np.int64)),
                "abs_err": pa.array(np.abs(a - f), pa.int64()),
            }
        )

    errs = joined.map_batches(_err, batch_format="pyarrow").materialize()
    n_hours = sum_per_key(
        errs.select_columns(["event_type", "one"]), "event_type", "one"
    ).rename_columns({"one": "n_hours"})
    sae = sum_per_key(
        errs.select_columns(["event_type", "abs_err"]), "event_type", "abs_err"
    ).rename_columns({"abs_err": "sum_abs_err"})
    return hash_join(n_hours, sae, on="event_type", join_type="inner")


SQL_EVENTS_SEASONAL_BACKTEST = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS h,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       count(*) AS n_hours,
       CAST(sum(abs(a.n - f.n)) AS BIGINT) AS sum_abs_err
FROM hourly a JOIN hourly f
  ON a.event_type = f.event_type AND a.h = f.h + 24
GROUP BY 1
"""


EXTRAS10_REGISTRY.update(
    {
        "events_seasonal_backtest": QueryDef(
            q_events_seasonal_backtest, SQL_EVENTS_SEASONAL_BACKTEST
        )
    }
)


# --------------------------------------------------------------------------
# wave 89: zlib compression-ratio quality signal (certified scoreboard)
# --------------------------------------------------------------------------

def q_text_compression_gate(sf_dir: str):
    """Compression-codec certification scoreboard over documents
    (`extras/textstats.compression_stats`): per doc, the lossless
    round-trip flag and the comp_len <= raw_len + 64 bound — the two
    invariants zlib guarantees, both pinned to 1 by the oracle (raw_len
    is independently SQL-checked via octet_length). The ratio itself is
    the quality signal (not SQL-expressible; values pinned by unit
    tests on fixed strings)."""
    from .extras.textstats import compression_stats

    stats = compression_stats(load(sf_dir, "documents", ["doc_id", "text"]))

    def _gate(b: pa.Table) -> pa.Table:
        raw = b.column("raw_len").to_numpy(zero_copy_only=False)
        comp = b.column("comp_len").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "raw_len": b.column("raw_len"),
                "roundtrip_ok": b.column("roundtrip_ok"),
                "bounded": pa.array(
                    (comp <= raw + 64).astype("int64"), pa.int64()
                ),
            }
        )

    return stats.map_batches(_gate, batch_format="pyarrow")


SQL_TEXT_COMPRESSION_GATE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS raw_len,
       CAST(1 AS BIGINT) AS roundtrip_ok,
       CAST(1 AS BIGINT) AS bounded
FROM documents
"""


EXTRAS10_REGISTRY.update(
    {
        "text_compression_gate": QueryDef(
            q_text_compression_gate, SQL_TEXT_COMPRESSION_GATE
        )
    }
)


# --------------------------------------------------------------------------
# wave 90: per-domain document cap (host balancing)
# --------------------------------------------------------------------------

_DOMAIN_CAP = 50


def q_corpus_domain_cap(sf_dir: str):
    """Host/domain balancing (the C4-style 'no domain may dominate the
    corpus' rule): keep at most N documents per source, preferring
    longer documents (n_chars desc, doc_id asc tie) — one source-keyed
    `rank_per_key` range sort + a stateless rank filter; the length
    flip packs desc-then-asc into a single ascending key. Survivors
    stream on with their rank for downstream mixing weights."""
    from .util import rank_per_key

    docs = load(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def _key(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "source": b.column("source"),
                "negchars": pc.subtract(
                    pa.scalar(1 << 40), pc.cast(b.column("n_chars"), pa.int64())
                ),
            }
        )

    keyed = docs.map_batches(_key, batch_format="pyarrow")
    ranked = rank_per_key(
        keyed, "source", "negchars", tie_col="doc_id", rank_col="rnk"
    )
    return ranked.map_batches(
        lambda b: b.filter(pc.less(b.column("rnk"), _DOMAIN_CAP)).select(
            ["doc_id", "source", "rnk"]
        ),
        batch_format="pyarrow",
    )


SQL_CORPUS_DOMAIN_CAP = f"""
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rnk
FROM documents
QUALIFY rnk < {_DOMAIN_CAP}
"""


EXTRAS10_REGISTRY.update(
    {"corpus_domain_cap": QueryDef(q_corpus_domain_cap, SQL_CORPUS_DOMAIN_CAP)}
)


# --------------------------------------------------------------------------
# wave 91: lineage-manifest audit (counters vs bytes on disk)
# --------------------------------------------------------------------------

def q_kg_lineage_audit(sf_dir: str):
    """End-to-end certification of the materializer's per-partition
    lineage manifests (north rule: 'resumable from checkpoint with
    per-partition lineage + metrics'): canonical triples materialize to
    both sorted layouts, then the audit re-reads every partition
    directory and checks the manifest row counter against the bytes
    actually on disk. Output per layout: total_rows (SQL-pinned against
    the canonical-triples count), n_parts (the full partition grid) and
    counters_ok — 1 only if EVERY partition's parquet row count equals
    its manifest counter. Partition assignment is a siphash of the
    subject (not SQL-expressible); the audit certifies the invariant
    that matters — no partition lost or double-counted — while SQL pins
    the corpus-level total."""
    import json
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from .kg.materialize import materialize_triples
    from .queries_extras9 import _canonical_triples

    n_parts = 16
    out_dir = tempfile.mkdtemp(prefix="lineage_audit_")
    try:
        triples = _canonical_triples(sf_dir)
        materialize_triples(
            triples, out_dir, layouts=("spo", "pos"),
            num_partitions=n_parts, resume=False,
        )
        rows = []
        for layout in ("pos", "spo"):
            manifests = {}
            mdir = os.path.join(out_dir, "_manifests")
            for f in os.listdir(mdir):
                if f.startswith(f"{layout}_part="):
                    p = int(f.split("=")[1].split(".")[0])
                    manifests[p] = json.load(open(os.path.join(mdir, f)))
            ldir = os.path.join(out_dir, layout)
            ok = len(manifests) == n_parts
            total = 0
            for p in range(n_parts):
                pdir = os.path.join(ldir, f"part={p}")
                actual = (
                    rd.read_parquet(pdir).count() if os.path.isdir(pdir) else 0
                )
                total += actual
                declared = int(manifests.get(p, {}).get("rows", -1))
                if declared != actual:
                    ok = False
            rows.append((layout, total, len(manifests), int(ok)))
        return pa.table(
            {
                "layout": pa.array([r[0] for r in rows], pa.string()),
                "total_rows": pa.array([r[1] for r in rows], pa.int64()),
                "n_parts": pa.array([r[2] for r in rows], pa.int64()),
                "counters_ok": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _sql_kg_lineage_audit() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH canon AS ({SQL_KG_CANONICAL})
SELECT layout, (SELECT count(*) FROM canon) AS total_rows,
       CAST(16 AS BIGINT) AS n_parts, CAST(1 AS BIGINT) AS counters_ok
FROM (VALUES ('pos'), ('spo')) v(layout)
"""


EXTRAS10_REGISTRY.update(
    {"kg_lineage_audit": QueryDef(q_kg_lineage_audit, _sql_kg_lineage_audit())}
)


# --------------------------------------------------------------------------
# wave 92: sorted-neighborhood ER blocking
# --------------------------------------------------------------------------

_SNM_WINDOW = 3


def q_er_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking (the classic record-linkage
    alternative to hash blocking: sort by a fuzzy key, compare only
    records within a sliding rank window — catches near-misses that
    land in DIFFERENT hash blocks): customers sorted by name, candidate
    pairs = rank gap <= 3. One constant-key `rank_per_key` global sort,
    then the spatial-join replication trick — each record probes ranks
    r+1..r+w via w narrow copies into ONE hash join on the rank key (no
    window shuffle, no per-group UDF). Output (id_a, id_b, gap)."""
    import numpy as np

    from .util import hash_join, rank_per_key

    cust = load(sf_dir, "customer", ["c_custkey", "c_name"])

    def _const(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_k", pa.array(np.zeros(b.num_rows, np.int64))
        )

    ranked = rank_per_key(
        cust.map_batches(_const, batch_format="pyarrow"),
        "_k", "c_name", tie_col="c_custkey", rank_col="r",
    ).select_columns(["c_custkey", "r"]).materialize()

    left = ranked.rename_columns({"c_custkey": "id_a", "r": "ra"})

    def _probe(b: pa.Table) -> pa.Table:
        ids = b.column("c_custkey").to_numpy(zero_copy_only=False)
        r = b.column("r").to_numpy(zero_copy_only=False)
        reps = []
        for j in range(1, _SNM_WINDOW + 1):
            reps.append((r - j, ids, np.full(len(r), j, np.int64)))
        return pa.table(
            {
                "ra": pa.array(
                    np.concatenate([x[0] for x in reps]), pa.int64()
                ),
                "id_b": pa.array(np.concatenate([x[1] for x in reps])),
                "gap": pa.array(
                    np.concatenate([x[2] for x in reps]), pa.int64()
                ),
            }
        )

    probe = ranked.map_batches(_probe, batch_format="pyarrow")
    joined = hash_join(left, probe, on="ra", join_type="inner")
    return joined.select_columns(["id_a", "id_b", "gap"])


SQL_ER_SORTED_NEIGHBORHOOD = f"""
WITH ranked AS (
  SELECT c_custkey, row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS r
  FROM customer
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(b.r - a.r AS BIGINT) AS gap
FROM ranked a JOIN ranked b
  ON b.r > a.r AND b.r <= a.r + {_SNM_WINDOW}
"""


EXTRAS10_REGISTRY.update(
    {
        "er_sorted_neighborhood": QueryDef(
            q_er_sorted_neighborhood, SQL_ER_SORTED_NEIGHBORHOOD
        )
    }
)


# --------------------------------------------------------------------------
# wave 93: distributed Gram matrix (the PCA/covariance first step)
# --------------------------------------------------------------------------

_GRAM_SCALE = 1 << 20  # fixed-point: float32 -> int, products exact in int64


def q_embed_gram_matrix(sf_dir: str):
    """Upper-triangle Gram matrix X^T X over the embedding corpus — THE
    distributed first step of PCA / covariance estimation: each block
    contributes one d x d int64 partial via a single numpy matmul (the
    map-side combine that makes the reduce d^2-sized instead of
    corpus-sized), partials fold on the driver. Elements quantize to
    fixed point (round(v * 2^20)) so sums are order-proof exact integers
    — the same micro-unit discipline as the pricing aggregates; int64
    headroom covers ~2^22 rows at this scale, guarded loudly. The
    oracle pays the d^2-per-row unnest join the matmul avoids."""
    import numpy as np

    docs = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    d_holder: list = []

    def _partial(b: pa.Table) -> pa.Table:
        emb = np.stack(b.column("embedding").to_numpy(zero_copy_only=False))
        scaled = emb.astype(np.float64) * _GRAM_SCALE
        # half-AWAY-from-zero to match SQL round() (np.rint is half-to-even,
        # and float32·2^20 hits exact .5 ties often)
        q = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
        g = q.T @ q  # d x d block partial, one BLAS call
        return pa.table(
            {
                "rows": pa.array([b.num_rows], pa.int64()),
                "g": pa.array([g.ravel().tolist()]),
                "d": pa.array([g.shape[0]], pa.int64()),
            }
        )

    import ray

    parts = docs.map_batches(_partial, batch_format="pyarrow")
    total = None
    d = None
    n_rows = 0
    for blk in ray.get(parts.to_arrow_refs()):
        for r, gl, dd in zip(
            blk.column("rows").to_pylist(),
            blk.column("g").to_pylist(),
            blk.column("d").to_pylist(),
        ):
            arr = np.array(gl, np.int64)
            n_rows += r
            d = int(dd)
            total = arr if total is None else total + arr
    if n_rows >= (1 << 22):
        raise ValueError(
            "int64 Gram headroom exceeded; shard the fold or lower the scale"
        )
    g = total.reshape(d, d)
    iu = np.triu_indices(d)
    return pa.table(
        {
            "i": pa.array(iu[0] + 1, pa.int64()),
            "j": pa.array(iu[1] + 1, pa.int64()),
            "gram": pa.array(g[iu], pa.int64()),
        }
    )


SQL_EMBED_GRAM_MATRIX = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_GRAM_SCALE})
              AS BIGINT) AS qv
  FROM embeddings
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


EXTRAS10_REGISTRY.update(
    {"embed_gram_matrix": QueryDef(q_embed_gram_matrix, SQL_EMBED_GRAM_MATRIX)}
)


# --------------------------------------------------------------------------
# wave 94: CUSUM drift detection
# --------------------------------------------------------------------------

_CUSUM_TARGET = 500_000  # micro-units: detect upward drift from 0.5
_CUSUM_H = 50_000_000


def q_events_cusum_drift(sf_dir: str):
    """One-sided CUSUM change detection per event type
    (`extras/window.cusum_per_key`): S_i = max(0, S_{i-1} + d_i) with
    d = value_micro − target, alarm when S crosses h. The sequential
    recurrence distributes exactly via its closed form
    S_i = RS_i − min(0, min prefix RS): one range sort, vectorized
    block scans, a two-scalar carry per boundary. The oracle computes
    the same closed form with SQL window functions."""
    import numpy as np

    from .extras.window import cusum_per_key

    ev = load(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def _dev(b: pa.Table) -> pa.Table:
        scaled = b.column("value").to_numpy(zero_copy_only=False) * 1e6
        micro = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "o": pc.cast(b.column("ts"), pa.int64()),
                "d": pa.array(micro - _CUSUM_TARGET, pa.int64()),
            }
        )

    dev = ev.map_batches(_dev, batch_format="pyarrow")
    return cusum_per_key(
        dev, "event_type", "o", "event_id", "d", threshold=_CUSUM_H
    )


SQL_EVENTS_CUSUM_DRIFT = f"""
WITH d AS (
  SELECT event_id, event_type, ts,
         CAST(round(value * 1000000) AS BIGINT) - {_CUSUM_TARGET} AS d
  FROM events
),
rs AS (
  SELECT *, sum(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS rs
  FROM d
),
m AS (
  SELECT *, min(rs) OVER (PARTITION BY event_type ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS mn
  FROM rs
)
SELECT event_id, event_type,
       CAST(rs - least(0, mn) AS BIGINT) AS s,
       CAST(rs - least(0, mn) > {_CUSUM_H} AS BIGINT) AS alarm
FROM m
"""


EXTRAS10_REGISTRY.update(
    {
        "events_cusum_drift": QueryDef(
            q_events_cusum_drift, SQL_EVENTS_CUSUM_DRIFT
        )
    }
)


# --------------------------------------------------------------------------
# wave 95: gaps-and-islands activity streaks
# --------------------------------------------------------------------------

def q_events_activity_streak(sf_dir: str):
    """Longest consecutive-day activity streak per user — the canonical
    gaps-and-islands computation: distinct active days, rank within
    user, island id = day − rank (constant within a consecutive run),
    island sizes, max per user. Every step is an existing primitive:
    sort-based `distinct_rows`, one user-keyed `rank_per_key`, one
    packed-key `exact_value_counts`, one `min_per_key` on the flipped
    size — no Ray groupby at any cardinality. Output
    (user_id, n_active_days, longest_streak)."""
    import numpy as np

    from .extras.stats import exact_value_counts
    from .util import distinct_rows, min_per_key, rank_per_key

    ev = load(sf_dir, "events", ["user_id", "ts"])

    def _days(b: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.floor_temporal(b.column("ts"), unit="day"), pa.int64()),
                86_400_000_000,
            ),
            pa.int64(),
        )
        return pa.table({"user_id": b.column("user_id"), "day": day})

    ud = distinct_rows(
        ev.map_batches(_days, batch_format="pyarrow"), ["user_id", "day"]
    )
    ranked = rank_per_key(ud, "user_id", "day", rank_col="r")

    def _island(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        day = b.column("day").to_numpy(zero_copy_only=False)
        r = b.column("r").to_numpy(zero_copy_only=False)
        # pack (user, island) — day-rank fits far below 2^20
        return pa.table(
            {"ui": pa.array(u * (1 << 24) + (day - r), pa.int64())}
        )

    sizes = exact_value_counts(
        ranked.map_batches(_island, batch_format="pyarrow"), "ui"
    )

    def _unpack(b: pa.Table) -> pa.Table:
        ui = b.column("ui").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(ui >> 24, pa.int64()),
                "neg": pa.array(-n, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    per_island = sizes.map_batches(_unpack, batch_format="pyarrow").materialize()
    longest = min_per_key(per_island, "user_id", "neg")
    days_per_user = exact_value_counts(
        ud.select_columns(["user_id"]), "user_id"
    ).rename_columns({"n": "n_active_days"})

    from .util import hash_join

    out = hash_join(days_per_user, longest, on="user_id", join_type="inner")
    return out.map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id"),
                "n_active_days": b.column("n_active_days"),
                "longest_streak": pc.negate(b.column("neg")),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_ACTIVITY_STREAK = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day
  FROM events
),
ranked AS (
  SELECT user_id, day,
         row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS r
  FROM ud
),
islands AS (
  SELECT user_id, day - r AS island, count(*) AS sz
  FROM ranked GROUP BY 1, 2
)
SELECT user_id,
       CAST((SELECT count(*) FROM ud u WHERE u.user_id = islands.user_id)
            AS BIGINT) AS n_active_days,
       CAST(max(sz) AS BIGINT) AS longest_streak
FROM islands GROUP BY user_id
"""


EXTRAS10_REGISTRY.update(
    {
        "events_activity_streak": QueryDef(
            q_events_activity_streak, SQL_EVENTS_ACTIVITY_STREAK
        )
    }
)


# --------------------------------------------------------------------------
# wave 96: ABC / Pareto revenue classification
# --------------------------------------------------------------------------

def q_orders_abc_classes(sf_dir: str):
    """ABC (Pareto 80/95) classification of parts by discounted revenue:
    rank parts by revenue desc, class = A while the running share stays
    <= 80% of total, B to 95%, else C — all in exact cent·percent
    integer units (the pricing discipline of the TPC-H suite). Shape:
    one sum_per_key revenue fold, one narrow (flipped-revenue, part)
    range sort, per-block sums gathered as SCALARS for driver exclusive
    offsets, vectorized in-block cumsum + threshold compare (the
    token_budget_cut prefix-sum pattern)."""
    import numpy as np

    import ray

    from .extras.graph import sum_per_key
    from .util import coalesce_blocks

    li = load(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def _rev(b: pa.Table) -> pa.Table:
        p = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        pct = np.floor(d * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "r": pa.array(cents * (100 - pct), pa.int64()),
            }
        )

    rev = sum_per_key(
        li.map_batches(_rev, batch_format="pyarrow"), "l_partkey", "r"
    )

    def _key(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "negr": pa.array(-r, pa.int64()),
                "l_partkey": b.column("l_partkey"),
                "r": b.column("r"),
            }
        )

    s = (
        coalesce_blocks(
            rev.map_batches(_key, batch_format="pyarrow").materialize()
        )
        .sort(["negr", "l_partkey"])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _bsum(t: pa.Table) -> int:
        return int(t.column("r").to_numpy(zero_copy_only=False).sum()) if t.num_rows else 0

    sums = ray.get([_bsum.remote(r) for r in refs])
    total = sum(sums)
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]])

    @ray.remote(num_cpus=0.5)
    def _classify(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["l_partkey", "r"]).append_column(
                "abc", pa.array([], pa.string())
            )
        r = t.column("r").to_numpy(zero_copy_only=False)
        cum = off + np.cumsum(r)
        cls = np.where(
            cum * 100 <= total * 80, "A",
            np.where(cum * 100 <= total * 95, "B", "C"),
        )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "revenue_u": t.column("r"),
                "abc": pa.array(cls, pa.string()),
            }
        )

    import ray.data as rd

    tables = [t for t in ray.get(
        [_classify.remote(rr, o) for rr, o in zip(refs, offs)]
    ) if t.num_rows]
    return rd.from_arrow(pa.concat_tables(tables))


SQL_ORDERS_ABC_CLASSES = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(r) AS t FROM rev),
c AS (
  SELECT l_partkey, r,
         sum(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM rev
)
SELECT l_partkey, r AS revenue_u,
       CASE WHEN cum * 100 <= (SELECT t FROM tot) * 80 THEN 'A'
            WHEN cum * 100 <= (SELECT t FROM tot) * 95 THEN 'B'
            ELSE 'C' END AS abc
FROM c
"""


EXTRAS10_REGISTRY.update(
    {"orders_abc_classes": QueryDef(q_orders_abc_classes, SQL_ORDERS_ABC_CLASSES)}
)


# --------------------------------------------------------------------------
# wave 97: MinHash-LSH recall audit (QA gate vs exact ground truth)
# --------------------------------------------------------------------------

def q_dedup_minhash_recall_gate(sf_dir: str):
    """Recall audit of the banded MinHash-LSH pair generator against the
    EXACT shingle-jaccard ground truth on the same perturbed corpus
    (same threshold 0.5, same 3-word shingles): n_exact pairs, how many
    the LSH candidate path recovered, and a recall >= 0.9 flag — the QA
    scoreboard a production dedup deployment watches when banding
    parameters change. n_exact is SQL-pinned (the dedup_ngram_jaccard
    oracle's own count); the LSH side is sketch-based (not
    SQL-expressible) so the oracle pins the FLAG, with the empirical
    margin recorded here: recall is 1.0 at sf0.001/sf0.01 (every
    >= 0.5-jaccard pair shares a band at 128 perms / 16 bands)."""
    from .extras.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from .queries_extras import _corpus_with_dups

    corpus = _corpus_with_dups(sf_dir)
    exact = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in ngram_jaccard_pairs(
            corpus, "text", "doc_id", threshold=0.5, shingle_k=3
        ).take_all()
    }
    lsh = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in minhash_lsh_pairs(
            corpus, "text", "doc_id", verify_threshold=0.5, shingle_k=3
        ).take_all()
    }
    found = len(exact & lsh)
    ok = int(10 * found >= 9 * len(exact)) if exact else 1
    return pa.table(
        {
            "n_exact": pa.array([len(exact)], pa.int64()),
            "recall_ok": pa.array([ok], pa.int64()),
        }
    )


def _sql_dedup_minhash_recall_gate() -> str:
    from .queries_extras import SQL_DEDUP_NGRAM_JACCARD

    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(1 AS BIGINT) AS recall_ok
FROM ({SQL_DEDUP_NGRAM_JACCARD})
"""


EXTRAS10_REGISTRY.update(
    {
        "dedup_minhash_recall_gate": QueryDef(
            q_dedup_minhash_recall_gate, _sql_dedup_minhash_recall_gate()
        )
    }
)


# --------------------------------------------------------------------------
# wave 98: deterministic bootstrap confidence interval
# --------------------------------------------------------------------------

_BOOT_B = 200
_BOOT_SALT = 8101


def q_stats_bootstrap_ci(sf_dir: str):
    """Bootstrap 5%/95% confidence interval for total customer account
    balance — with the engine's signature trick: the resampling RNG is
    the SplitMix64 keyed stream, so the ENTIRE Monte-Carlo procedure is
    a pure function of the data and replays bit-exactly in SQL. Draw
    (b, i) of resample b picks customer sm64(b·2^32 + i) mod n; each
    resample's statistic is an exact cent sum; the CI is the 10th/190th
    order statistic of the B=200 resample sums — no floats anywhere.
    Shape: a range grid map -> ONE custkey hash join (the corpus never
    replicates B times; only the narrow draw stream does) -> sum_per_key
    by resample -> a B-bounded driver gather."""
    import numpy as np

    import ray.data as rd

    from .extras.graph import sum_per_key
    from .extras.shuffle import sm64_key
    from .util import hash_join

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _cents(b: pa.Table) -> pa.Table:
        v = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "cents": pa.array(
                    (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    vals = cust.map_batches(_cents, batch_format="pyarrow").materialize()
    n = vals.count()

    def _draws(b: pa.Table) -> pa.Table:
        g = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = g // n
        i = g % n
        gid = bb * (np.int64(1) << np.int64(32)) + i
        idx = (sm64_key(gid, _BOOT_SALT) % np.uint64(n)).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(bb, pa.int64()),
                "c_custkey": pa.array(idx, pa.int64()),
            }
        )

    grid = rd.range(_BOOT_B * n).map_batches(_draws, batch_format="pyarrow")
    joined = hash_join(grid, vals, on="c_custkey", join_type="inner")
    sums = sum_per_key(
        joined.select_columns(["b", "cents"]), "b", "cents"
    ).take_all()
    stats = np.sort(np.array([int(r["cents"]) for r in sums], np.int64))
    assert len(stats) == _BOOT_B
    return pa.table(
        {
            "ci_lo_cents": pa.array([int(stats[9])], pa.int64()),
            "ci_hi_cents": pa.array([int(stats[189])], pa.int64()),
            "n_resamples": pa.array([_BOOT_B], pa.int64()),
        }
    )


def _sql_stats_bootstrap_ci() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        f"""(SELECT (g.b * 4294967296 + i.i) AS gid, g.b AS b
     FROM generate_series(0, {_BOOT_B - 1}) g(b),
          (SELECT row_number() OVER () - 1 AS i FROM customer) i)""",
        "gid",
        _BOOT_SALT,
    )
    return f"""
WITH {chain},
draws AS (
  SELECT b, CAST(h % (SELECT count(*) FROM customer) AS BIGINT) AS idx
  FROM h3
),
cents AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
sums AS (
  SELECT d.b, sum(c.cents) AS s
  FROM draws d JOIN cents c ON c.c_custkey = d.idx
  GROUP BY d.b
),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s) AS rn FROM sums
)
SELECT (SELECT CAST(s AS BIGINT) FROM ranked WHERE rn = 10) AS ci_lo_cents,
       (SELECT CAST(s AS BIGINT) FROM ranked WHERE rn = 190) AS ci_hi_cents,
       CAST({_BOOT_B} AS BIGINT) AS n_resamples
"""


EXTRAS10_REGISTRY.update(
    {
        "stats_bootstrap_ci": QueryDef(
            q_stats_bootstrap_ci, _sql_stats_bootstrap_ci()
        )
    }
)


# --------------------------------------------------------------------------
# wave 99: exact permutation test (deterministic A/B significance)
# --------------------------------------------------------------------------

_PERM_B = 200
_PERM_SALT = 8117


def q_stats_permutation_test(sf_dir: str):
    """Permutation test for 'does the BUILDING segment's mean balance
    differ from the rest?' — the nonparametric A/B significance test,
    fully deterministic: permutation b ranks customers by
    sm64(b·2^32 + key) and takes the first n1 ranks as the pseudo
    treatment group, the statistic is |n2·S1 − n1·S2| in exact
    cent·count units (cross-multiplied so no division ever happens),
    and the p-value is reported as (count of permutation stats >=
    observed, B). ALL B permutations rank in ONE range sort
    (`rank_per_key` keyed on the permutation id); the SQL replay runs
    the same sm64 chain + window ranking. Monte-Carlo inference as a
    pure function of the data."""
    import numpy as np

    import ray.data as rd

    from .extras.graph import sum_per_key
    from .extras.shuffle import sm64_key
    from .util import hash_join, rank_per_key

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])

    def _cents(b: pa.Table) -> pa.Table:
        v = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "cents": pa.array(
                    (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64),
                    pa.int64(),
                ),
                "grp": pc.cast(
                    pc.equal(b.column("c_mktsegment"), "BUILDING"), pa.int64()
                ),
            }
        )

    vals = cust.map_batches(_cents, batch_format="pyarrow").materialize()
    n = vals.count()
    agg = vals.map_batches(
        lambda b: pa.table(
            {
                "n1": pa.array([int(pc.sum(b.column("grp")).as_py() or 0)]),
                "s1": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.multiply(b.column("grp"), b.column("cents"))
                            ).as_py()
                            or 0
                        )
                    ]
                ),
                "st": pa.array([int(pc.sum(b.column("cents")).as_py() or 0)]),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    n1 = sum(r["n1"] for r in agg)
    s1 = sum(r["s1"] for r in agg)
    total = sum(r["st"] for r in agg)
    n2 = n - n1
    stat_obs = abs(n2 * s1 - n1 * (total - s1))

    def _grid(b: pa.Table) -> pa.Table:
        g = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = g // n
        key = g % n
        gid = bb * (np.int64(1) << np.int64(32)) + key
        h = (sm64_key(gid, _PERM_SALT) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(bb, pa.int64()),
                "c_custkey": pa.array(key, pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )

    grid = rd.range(_PERM_B * n).map_batches(_grid, batch_format="pyarrow")
    ranked = rank_per_key(grid, "b", "h", tie_col="c_custkey", rank_col="r")
    treat = ranked.map_batches(
        lambda t: t.filter(pc.less(t.column("r"), n1)).select(
            ["b", "c_custkey"]
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        treat, vals.select_columns(["c_custkey", "cents"]),
        on="c_custkey", join_type="inner",
    )
    sums = sum_per_key(
        joined.select_columns(["b", "cents"]), "b", "cents"
    ).take_all()
    assert len(sums) == _PERM_B
    n_ge = 0
    for r in sums:
        s1b = int(r["cents"])
        if abs(n2 * s1b - n1 * (total - s1b)) >= stat_obs:
            n_ge += 1
    return pa.table(
        {
            "stat_obs": pa.array([stat_obs], pa.int64()),
            "n_ge": pa.array([n_ge], pa.int64()),
            "n_perms": pa.array([_PERM_B], pa.int64()),
        }
    )


def _sql_stats_permutation_test() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        f"""(SELECT (g.b * 4294967296 + c.c_custkey) AS gid, g.b AS b,
            c.c_custkey
     FROM generate_series(0, {_PERM_B - 1}) g(b), customer c)""",
        "gid",
        _PERM_SALT,
    )
    return f"""
WITH {chain},
base AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp
  FROM customer
),
consts AS (
  SELECT sum(grp) AS n1, count(*) - sum(grp) AS n2,
         sum(grp * cents) AS s1, sum(cents) AS total
  FROM base
),
obs AS (
  SELECT abs(n2 * s1 - n1 * (total - s1)) AS stat_obs FROM consts
),
ranked AS (
  SELECT b, c_custkey,
         row_number() OVER (PARTITION BY b ORDER BY h // 2, c_custkey) - 1 AS r
  FROM h3
),
psums AS (
  SELECT rk.b, sum(base.cents) AS s1b
  FROM ranked rk JOIN base ON base.c_custkey = rk.c_custkey
  WHERE rk.r < (SELECT n1 FROM consts)
  GROUP BY rk.b
)
SELECT CAST((SELECT stat_obs FROM obs) AS BIGINT) AS stat_obs,
       CAST(sum(CASE WHEN abs((SELECT n2 FROM consts) * s1b
                 - (SELECT n1 FROM consts)
                   * ((SELECT total FROM consts) - s1b))
                 >= (SELECT stat_obs FROM obs) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ge,
       CAST({_PERM_B} AS BIGINT) AS n_perms
FROM psums
"""


EXTRAS10_REGISTRY.update(
    {
        "stats_permutation_test": QueryDef(
            q_stats_permutation_test, _sql_stats_permutation_test()
        )
    }
)


# --------------------------------------------------------------------------
# wave 100: composite production quality gate
# --------------------------------------------------------------------------

def q_corpus_quality_stack(sf_dir: str):
    """The full production quality-filter stack in one composed decision
    table — Gopher structural rules AND english language-ID AND sentence
    -shape bounds AND readability ceiling, per doc with per-rule flags
    and the conjunctive keep bit (what a real corpus pipeline logs so
    ablations can re-weight single rules without recomputing). Four
    narrow flag streams (each ONE vectorized pass over the pruned text
    column) joined on the doc key; the ENTIRE composition — every rule
    and the final conjunction — replays in SQL by joining the component
    oracles' own CTEs."""
    from .queries_extras import q_text_langid
    from .queries_extras7 import q_text_gopher_rules

    from .extras.textstats import readability_fk, sentence_stats
    from .util import hash_join

    gopher = q_text_gopher_rules(sf_dir).select_columns(
        ["doc_id", "keep"]
    ).rename_columns({"keep": "gopher_keep"})
    lang = q_text_langid(sf_dir)
    lang = lang.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang_ok": pc.cast(
                    pc.equal(b.column("lang_pred"), "en"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    docs = load(sf_dir, "documents", ["doc_id", "text"])
    sent = sentence_stats(docs).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "sent_ok": pc.cast(
                    pc.and_(
                        pc.greater_equal(b.column("n_sentences"), 1),
                        pc.and_(
                            pc.less_equal(
                                pc.multiply(b.column("n_sentences"), 15),
                                b.column("sum_chars"),
                            ),
                            pc.less_equal(
                                b.column("sum_chars"),
                                pc.multiply(b.column("n_sentences"), 2000),
                            ),
                        ),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    read = readability_fk(docs).map_batches(
        # unmeasurable docs (no terminator runs / no words) pass the
        # readability rule neutrally — the cap only applies where the
        # grade is defined
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "read_ok": pc.cast(
                    pc.or_(
                        pc.is_null(b.column("fk_grade_micro")),
                        pc.fill_null(
                            pc.less_equal(
                                b.column("fk_grade_micro"),
                                pa.scalar(18_000_000),
                            ),
                            False,
                        ),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = hash_join(gopher, lang, on="doc_id", join_type="inner")
    out = hash_join(out, sent, on="doc_id", join_type="inner")
    out = hash_join(out, read, on="doc_id", join_type="inner")
    return out.map_batches(
        lambda b: b.append_column(
            "keep",
            pc.cast(
                pc.and_(
                    pc.and_(
                        pc.cast(b.column("gopher_keep"), pa.bool_()),
                        pc.cast(b.column("lang_ok"), pa.bool_()),
                    ),
                    pc.and_(
                        pc.cast(b.column("sent_ok"), pa.bool_()),
                        pc.cast(b.column("read_ok"), pa.bool_()),
                    ),
                ),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    )


def _sql_corpus_quality_stack() -> str:
    from .queries_extras import SQL_TEXT_LANGID
    from .queries_extras7 import SQL_GOPHER

    return f"""
WITH g AS ({SQL_GOPHER}),
l AS ({SQL_TEXT_LANGID}),
s AS ({SQL_TEXT_SENTENCES}),
r AS ({SQL_TEXT_READABILITY})
SELECT g.doc_id,
       g.keep AS gopher_keep,
       CAST(CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END AS BIGINT)
         AS lang_ok,
       CAST(CASE WHEN s.n_sentences >= 1
                  AND s.n_sentences * 15 <= s.sum_chars
                  AND s.sum_chars <= s.n_sentences * 2000
            THEN 1 ELSE 0 END AS BIGINT) AS sent_ok,
       CAST(CASE WHEN r.fk_grade_micro IS NULL
                  OR r.fk_grade_micro <= 18000000
            THEN 1 ELSE 0 END AS BIGINT) AS read_ok,
       CAST(g.keep * (CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END)
            * (CASE WHEN s.n_sentences >= 1
                     AND s.n_sentences * 15 <= s.sum_chars
                     AND s.sum_chars <= s.n_sentences * 2000
                THEN 1 ELSE 0 END)
            * (CASE WHEN r.fk_grade_micro IS NULL
                     OR r.fk_grade_micro <= 18000000
                THEN 1 ELSE 0 END) AS BIGINT) AS keep
FROM g
JOIN l USING (doc_id) JOIN s USING (doc_id) JOIN r USING (doc_id)
"""


EXTRAS10_REGISTRY.update(
    {
        "corpus_quality_stack": QueryDef(
            q_corpus_quality_stack, _sql_corpus_quality_stack()
        )
    }
)


# --------------------------------------------------------------------------
# wave 101: RDF standard reification roundtrip
# --------------------------------------------------------------------------

def q_kg_reify_roundtrip(sf_dir: str):
    """RDF standard reification (the pre-RDF-star way to annotate
    statements): every canonical basedIn triple expands to its 4-triple
    reified form (urn:stmt:<n> rdf:type rdf:Statement / rdf:subject /
    rdf:predicate / rdf:object, with n a deterministic function of the
    statement so the expansion is stable across runs), then the
    roundtrip RECOVERS the original triples by pivoting the four
    predicate streams back together — two stateless map passes and one
    subject-keyed join tree, the shape a triple store pays for every
    reified-annotation query (and why RDF-star exists). Output = the
    recovered (subj, pred, obj) rows; the oracle rebuilds them straight
    from the base tables, so a lossy expansion or pivot would
    hash-mismatch."""
    from .queries_extras9 import _canonical_triples
    from .util import hash_join

    based = _canonical_triples(sf_dir).map_batches(
        lambda b: b.filter(pc.equal(b.column("pred"), "basedIn")).select(
            ["subj", "pred", "obj"]
        ),
        batch_format="pyarrow",
    )

    def _reify(b: pa.Table) -> pa.Table:
        # stable statement id: the subject IRI carries the customer key
        sid = pc.binary_join_element_wise(
            pa.scalar("urn:stmt:"), b.column("subj"), pa.scalar("")
        )
        n = b.num_rows
        import numpy as np

        return pa.table(
            {
                "s": pa.concat_arrays([sid.combine_chunks()] * 4),
                "p": pa.array(
                    ["rdf:type"] * n
                    + ["rdf:subject"] * n
                    + ["rdf:predicate"] * n
                    + ["rdf:object"] * n,
                    pa.string(),
                ),
                "o": pa.concat_arrays(
                    [
                        pa.array(["rdf:Statement"] * n, pa.string()),
                        b.column("subj").combine_chunks(),
                        b.column("pred").combine_chunks(),
                        b.column("obj").combine_chunks(),
                    ]
                ),
            }
        )

    reified = based.map_batches(_reify, batch_format="pyarrow").materialize()

    def _leg(pred: str, out: str):
        return reified.map_batches(
            lambda b, p=pred, o=out: pa.table(
                {
                    "s": b.filter(pc.equal(b.column("p"), p)).column("s"),
                    o: b.filter(pc.equal(b.column("p"), p)).column("o"),
                }
            ),
            batch_format="pyarrow",
        )

    subj = _leg("rdf:subject", "subj")
    pred = _leg("rdf:predicate", "pred")
    obj = _leg("rdf:object", "obj")
    out = hash_join(subj, pred, on="s", join_type="inner")
    out = hash_join(out, obj, on="s", join_type="inner")
    return out.select_columns(["subj", "pred", "obj"])


def _sql_kg_reify_roundtrip() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH canon AS ({SQL_KG_CANONICAL})
SELECT subj, pred, obj FROM canon WHERE pred = 'basedIn'
"""


EXTRAS10_REGISTRY.update(
    {
        "kg_reify_roundtrip": QueryDef(
            q_kg_reify_roundtrip, _sql_kg_reify_roundtrip()
        )
    }
)


# --------------------------------------------------------------------------
# wave 102: BMP codec path (third real container format)
# --------------------------------------------------------------------------

def q_multimodal_bmp_stats(sf_dir: str):
    """Third REAL image codec end-to-end (BMP BI_RGB 8-bit paletted,
    bottom-up padded rows — `extras/multimodal.encode_bmp_gray`): attach
    closed-form-pixel BMP payloads, decode through the magic-dispatched
    actor-pool stats stage (payload dropped after decode), pixel sums
    recomputed in SQL — certifying encode -> binary column -> actor
    decode for a THIRD container beside PNG and JPEG."""
    from .extras.multimodal import attach_media_bmp, decode_media_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return decode_media_stats(attach_media_bmp(docs, "doc_id"))


SQL_MULTIMODAL_BMP_STATS = """
SELECT d.doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       (SELECT CAST(sum((d.doc_id * 43 + 7 * t.i) % 256) AS BIGINT)
        FROM unnest(range(256)) AS t(i)) AS pixel_sum
FROM documents d
"""


EXTRAS10_REGISTRY.update(
    {
        "multimodal_bmp_stats": QueryDef(
            q_multimodal_bmp_stats, SQL_MULTIMODAL_BMP_STATS
        )
    }
)


# --------------------------------------------------------------------------
# wave 103: multi-channel crawl-frontier fusion (links ∪ sitemaps)
# --------------------------------------------------------------------------

def q_crawl_frontier_fused(sf_dir: str):
    """Crawl-frontier fusion across discovery channels: link-discovery
    candidates (`kg_crawl_frontier`: targets not yet crawled, with
    in-link evidence) FULL-OUTER merged with a sitemap feed — the
    sitemap XML genuinely round-trips through `write_sitemap_shards` /
    `read_sitemaps` (vectorized parse), so the real ingestion path sits
    in the loop. Per url: in-link count (0 when only the sitemap knows
    it), advertised priority (protocol default 0.5 when only links know
    it), and per-channel flags — the schedule-ready fusion table. One
    url-keyed outer hash join; both inputs are frontier-sized."""
    import shutil
    import tempfile

    import numpy as np

    from .queries_extras8 import q_kg_crawl_frontier
    from .sources.sitemap import read_sitemaps, write_sitemap_shards
    from .util import hash_join

    links = q_kg_crawl_frontier(sf_dir)

    # deterministic sitemap feed: every 5th document advertises its page
    docs = load(sf_dir, "documents", ["doc_id"])

    def _site_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids % 5 == 0]
        return pa.table(
            {
                "url": pc.binary_join_element_wise(
                    pa.scalar("https://example.org/doc/"),
                    pc.cast(pa.array(ids, pa.int64()), pa.string()),
                    pa.scalar(""),
                ),
                "priority_micro": pa.array(
                    ((ids % 10) + 1) * 100_000, pa.int64()
                ),
            }
        )

    out_dir = tempfile.mkdtemp(prefix="frontier_sm_")
    try:
        write_sitemap_shards(
            docs.map_batches(_site_rows, batch_format="pyarrow"),
            out_dir,
            priority_micro_col="priority_micro",
        )
        sm = read_sitemaps(out_dir).map_batches(
            lambda b: b.filter(pc.invert(b.column("is_index"))).select(
                ["url", "priority_micro"]
            ),
            batch_format="pyarrow",
        ).materialize()
    finally:
        # sm is MATERIALIZED inside the try (the shards are fully consumed
        # by here), so the shard dir is removable on every path — success
        # or a raise in write/read — without leaking the temp dir
        shutil.rmtree(out_dir, ignore_errors=True)

    fused = hash_join(links, sm, on="url", join_type="full_outer")

    def _finish(b: pa.Table) -> pa.Table:
        inl = pc.fill_null(pc.cast(b.column("n_inlinks"), pa.int64()), 0)
        pri = pc.fill_null(
            pc.cast(b.column("priority_micro"), pa.int64()), 500_000
        )
        return pa.table(
            {
                "url": b.column("url"),
                "n_inlinks": inl,
                "priority_micro": pri,
                "from_links": pc.cast(
                    pc.is_valid(b.column("n_inlinks")), pa.int64()
                ),
                "from_sitemap": pc.cast(
                    pc.is_valid(b.column("priority_micro")), pa.int64()
                ),
            }
        )

    return pa.Table.from_pandas(
        fused.map_batches(_finish, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )


def _sql_crawl_frontier_fused() -> str:
    from .queries_extras8 import SQL_KG_CRAWL_FRONTIER

    return f"""
WITH links AS ({SQL_KG_CRAWL_FRONTIER}),
sm AS (
  SELECT 'https://example.org/doc/' || doc_id AS url,
         ((doc_id % 10) + 1) * 100000 AS priority_micro
  FROM documents WHERE doc_id % 5 = 0
)
SELECT coalesce(links.url, sm.url) AS url,
       CAST(coalesce(links.n_inlinks, 0) AS BIGINT) AS n_inlinks,
       CAST(coalesce(sm.priority_micro, 500000) AS BIGINT) AS priority_micro,
       CAST(CASE WHEN links.url IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS from_links,
       CAST(CASE WHEN sm.url IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS from_sitemap
FROM links FULL OUTER JOIN sm ON links.url = sm.url
"""


EXTRAS10_REGISTRY.update(
    {
        "crawl_frontier_fused": QueryDef(
            q_crawl_frontier_fused, _sql_crawl_frontier_fused()
        )
    }
)


# --------------------------------------------------------------------------
# wave 104: heterogeneous-format union (one aligned stream, four sources)
# --------------------------------------------------------------------------

def q_corpus_multi_format_union(sf_dir: str):
    """The federation-of-formats ingest: the SAME corpus served from
    parquet, CSV shards, JSONL shards and Feather-IPC shards, read back
    through each format's own reader, aligned to (doc_id, text, fmt)
    and UNIONED into one stream (Ray union = no shuffle) — the
    one-query proof that every source path normalizes to the same
    schema. Output: each doc four times, tagged by format; the oracle
    is documents x 4 format literals."""
    import json
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from .sources.arrowfmt import read_feather, write_feather_shards
    from .sources.csvsrc import read_csv_documents
    from .sources.jsonl import read_jsonl_documents

    docs = load(sf_dir, "documents", ["doc_id", "text"])
    base = tempfile.mkdtemp(prefix="multifmt_")
    try:
        csv_dir = os.path.join(base, "csv")
        docs.write_csv(csv_dir)
        jl_dir = os.path.join(base, "jl")
        os.makedirs(jl_dir)
        # jsonl writer: one shard from the driver-gathered small fixture
        # (writer-side JSONL shards exist in corpus_jsonl_roundtrip; here
        # the READ path is under test)
        rows = docs.take_all()
        with open(os.path.join(jl_dir, "d.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps({"id": int(r["doc_id"]), "content": r["text"]}) + "\n")
        ft_dir = os.path.join(base, "ft")
        write_feather_shards(docs, ft_dir)

        def _tag(ds, fmt):
            return ds.map_batches(
                lambda b, m=fmt: pa.table(
                    {
                        "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                        "text": b.column("text"),
                        "fmt": pa.array([m] * b.num_rows, pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )

        u = (
            _tag(load(sf_dir, "documents", ["doc_id", "text"]), "parquet")
            .union(_tag(read_csv_documents(csv_dir), "csv"))
            .union(_tag(read_jsonl_documents(jl_dir), "jsonl"))
            .union(_tag(read_feather(ft_dir), "feather"))
        )
        return pa.Table.from_pandas(u.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_CORPUS_MULTI_FORMAT_UNION = """
SELECT doc_id, text, fmt
FROM documents, (VALUES ('parquet'), ('csv'), ('jsonl'), ('feather')) v(fmt)
"""


EXTRAS10_REGISTRY.update(
    {
        "corpus_multi_format_union": QueryDef(
            q_corpus_multi_format_union, SQL_CORPUS_MULTI_FORMAT_UNION
        )
    }
)


# --------------------------------------------------------------------------
# wave 105: theta-sketch union (the mergeability law, end to end)
# --------------------------------------------------------------------------

def q_stats_theta_union(sf_dir: str):
    """Distinct customers across ALL order years estimated from the
    per-year KMV sketches alone (`extras/stats.theta_union`: pool
    samples, keep min-k, re-read theta) — the merge law that lets
    partition-built sketches combine without revisiting data,
    scoreboarded against the exact distinct union with the 5/sqrt(k)
    bound pinned. One sketch build (shared with `stats_theta_intersect`'s
    machinery) + one sort-distinct exact count."""
    from .extras.stats import kmv_sketches, theta_union
    from .util import distinct_rows

    orders = load(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def _yc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "y": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
                "c": pc.cast(b.column("o_custkey"), pa.int64()),
            }
        )

    yc = orders.map_batches(_yc, batch_format="pyarrow")
    sketches = kmv_sketches(yc, "y", "c", k=_THETA_K)
    est = theta_union(sketches, k=_THETA_K)

    exact = distinct_rows(yc.select_columns(["c"]), ["c"]).count()
    ok = int(abs(est / exact - 1.0) * 1_000_000 <= _THETA_BOUND_MICRO) if exact else 1
    return pa.table(
        {
            "n_exact_union": pa.array([exact], pa.int64()),
            "within_bound": pa.array([ok], pa.int64()),
        }
    )


SQL_STATS_THETA_UNION = """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact_union,
       CAST(1 AS BIGINT) AS within_bound
FROM orders
"""


EXTRAS10_REGISTRY.update(
    {"stats_theta_union": QueryDef(q_stats_theta_union, SQL_STATS_THETA_UNION)}
)


# --------------------------------------------------------------------------
# wave 106 (round 5): Turtle interchange round-trip — the reference's last
# input format (exampleInputs/*.ttl; Jena RDFDataMgr dispatch,
# AnonymizationService.java:139-149) read through kg/turtle.read_turtle_files

def q_kg_turtle_roundtrip(sf_dir: str):
    """nation -> Turtle serialization (4 shard files, abbreviated syntax:
    prefixes, `a`, `;` predicate lists, typed/plain literals) ->
    `read_turtle_files` (one parse task per file) -> canonical
    (subj, pred, obj, obj_kind) rows. The oracle rebuilds the identical
    tuples relationally — quoting, escaping, numeric lexical forms and the
    compact-prefix convention must all survive the round trip."""
    import os
    import shutil
    import tempfile

    from .kg.turtle import read_turtle_files

    nat = load(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    out_dir = tempfile.mkdtemp(prefix="ttl_rt_")
    try:
        shards: dict[int, list[str]] = {i: [] for i in range(4)}
        for _, r in nat.iterrows():
            k = int(r["n_nationkey"])
            name = str(r["n_name"]).replace("\\", "\\\\").replace('"', '\\"')
            shards[k % 4].append(
                f"ex:n{k} a ex:Nation ;\n"
                f"    ex:name \"{name}\" ;\n"
                f"    ex:region ex:r{int(r['n_regionkey'])} ;\n"
                f"    ex:key {k} .\n"
            )
        paths = []
        for i, stmts in shards.items():
            p = os.path.join(out_dir, f"part-{i}.ttl")
            with open(p, "w") as f:
                f.write("@prefix ex: <http://example.org/> .\n\n")
                f.write("\n".join(stmts))
            paths.append(p)
        back = read_turtle_files(paths)
        return pa.Table.from_pandas(
            back.to_pandas().sort_values(["subj", "pred"]).reset_index(drop=True),
            preserve_index=False,
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_KG_TURTLE_ROUNDTRIP = """
WITH t AS (
  SELECT 'ex:n' || n_nationkey AS subj, 'rdf:type' AS pred,
         'ex:Nation' AS obj, 'iri' AS obj_kind FROM nation
  UNION ALL
  SELECT 'ex:n' || n_nationkey, 'ex:name', n_name, 'string' FROM nation
  UNION ALL
  SELECT 'ex:n' || n_nationkey, 'ex:region', 'ex:r' || n_regionkey, 'iri'
  FROM nation
  UNION ALL
  SELECT 'ex:n' || n_nationkey, 'ex:key', CAST(n_nationkey AS VARCHAR),
         'integer' FROM nation
)
SELECT subj, pred, obj, obj_kind FROM t ORDER BY subj, pred
"""


EXTRAS10_REGISTRY.update(
    {
        "kg_turtle_roundtrip": QueryDef(
            q_kg_turtle_roundtrip, SQL_KG_TURTLE_ROUNDTRIP
        )
    }
)


# --------------------------------------------------------------------------
# wave 107a: N-Quads interchange — named-graph round trip on the wire

def q_kg_nquads_roundtrip(sf_dir: str):
    """Named-graph interchange: the canonical graph tagged with a provenance
    graph per subject family (the `kg_named_graph_query` rule), dumped as
    N-Quads (`kg/nquads.write_nquads` — line-splittable, content-hash part
    files) and parsed back; rows INCLUDING the graph column must equal the
    tagged original, which the canonical-triples oracle + the same CASE tag
    pin value-exactly."""
    import shutil
    import tempfile

    from .kg.nquads import read_nquads, write_nquads
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _tag(b: pa.Table) -> pa.Table:
        g = pc.if_else(
            pc.starts_with(b.column("subj"), "urn:cust:"),
            pa.scalar("urn:g:cust"),
            pa.scalar("urn:g:geo"),
        )
        return b.select(["subj", "pred", "obj", "obj_kind"]).append_column(
            "graph", g
        )

    quads = tri.map_batches(_tag, batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="kg_nq_")
    try:
        write_nquads(quads, out)
        back = read_nquads(out).materialize()
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _sql_nquads_roundtrip() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH t AS ({SQL_KG_CANONICAL})
SELECT subj, pred, obj, obj_kind,
       CASE WHEN subj LIKE 'urn:cust:%' THEN 'urn:g:cust'
            ELSE 'urn:g:geo' END AS graph
FROM t
"""


EXTRAS10_REGISTRY.update(
    {
        "kg_nquads_roundtrip": QueryDef(
            q_kg_nquads_roundtrip, _sql_nquads_roundtrip()
        )
    }
)


# --------------------------------------------------------------------------
# wave 107b: feature engineering — smoothed target encoding + hashing trick

def q_feature_target_encode(sf_dir: str):
    """Smoothed target encoding (`extras/feature.target_encode`) of
    (nation, segment) against account balance: enc = (sum + m·mean)/(n + m)
    with m=10, sums in exact integer cents so the only float ops are the
    final divisions replayed in the same order by the oracle. One
    fold_per_key at category cardinality — the corpus never shuffles."""
    from .extras.feature import target_encode

    cust = load(sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"])
    return target_encode(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", m=10
    )


SQL_FEATURE_TARGET_ENCODE = """
WITH c AS (
  SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS cat,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal IS NOT NULL
),
g AS (SELECT cat, SUM(cents) AS s, COUNT(*) AS n FROM c GROUP BY cat),
t AS (SELECT SUM(s) AS tc, SUM(n) AS tn FROM g)
SELECT g.cat, CAST(g.n AS BIGINT) AS n,
       (CAST(g.s AS DOUBLE) + 10 * (CAST(t.tc AS DOUBLE) / CAST(t.tn AS DOUBLE)))
         / (g.n + 10) AS enc
FROM g, t
"""


def q_feature_hashing(sf_dir: str):
    """Hashing-trick featurization (`extras/feature.hashing_features`):
    sparse signed token counts, bucket = md5(token) mod 128, sign from an
    independent hash nibble — md5 is content-defined so DuckDB replays the
    exact assignment. Per-batch unique-token hashing + in-batch partials,
    one sum_per_key at (doc, bucket) cardinality."""
    from .extras.feature import hashing_features

    docs = load(sf_dir, "documents", ["doc_id", "text"])
    return hashing_features(docs, "doc_id", "text", k=128)


SQL_FEATURE_HASHING = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+')) AS t
  FROM documents
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS hv
  FROM toks WHERE t <> ''
)
SELECT doc_id, CAST(hv % 128 AS BIGINT) AS bucket,
       CAST(SUM(CASE WHEN (hv // 1099511627776) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS val
FROM h GROUP BY doc_id, hv % 128
"""


EXTRAS10_REGISTRY.update(
    {
        "feature_target_encode": QueryDef(
            q_feature_target_encode, SQL_FEATURE_TARGET_ENCODE
        ),
        "feature_hashing": QueryDef(q_feature_hashing, SQL_FEATURE_HASHING),
    }
)


# --------------------------------------------------------------------------
# wave 107c: netpbm PGM — FOURTH real image container through the same
# magic-dispatched actor decode stage

def q_multimodal_pgm_stats(sf_dir: str):
    """Binary PGM (P5) end-to-end: attach closed-form-pixel PGM payloads
    (`extras/multimodal.encode_pgm_gray`), decode through the SAME
    magic-dispatched actor-pool stats stage PNG/JPEG/BMP use (payload
    dropped after decode), pixel sums recomputed in SQL."""
    from .extras.multimodal import attach_media_pgm, decode_media_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return decode_media_stats(attach_media_pgm(docs, "doc_id"))


SQL_MULTIMODAL_PGM_STATS = """
SELECT d.doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       (SELECT CAST(sum((d.doc_id * 37 + 11 * t.i) % 256) AS BIGINT)
        FROM unnest(range(256)) AS t(i)) AS pixel_sum
FROM documents d
"""


EXTRAS10_REGISTRY.update(
    {
        "multimodal_pgm_stats": QueryDef(
            q_multimodal_pgm_stats, SQL_MULTIMODAL_PGM_STATS
        )
    }
)


# --------------------------------------------------------------------------
# wave 108: OHLC candlestick bars + Benford first-digit audit

def q_events_ohlc(sf_dir: str):
    """Per-(user, hour) OHLC bars (`extras/window.ohlc_bars`): open/close =
    value at the bar's first/last timestamp, high/low = extremes, exact
    integer cents. One fold at bar cardinality + two bar-cardinality hash
    joins fetch open/close — the event stream never gathers. (user, ts) is
    unique in the events table, so first/last are well-defined."""
    from .extras.window import ohlc_bars

    ev = load(sf_dir, "events", ["user_id", "ts", "value"])
    return ohlc_bars(ev, "user_id", "ts", "value")


SQL_EVENTS_OHLC = """
WITH e AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
)
SELECT user_id, bucket,
       arg_min(c, ts) AS open_c,
       max(c) AS high_c,
       min(c) AS low_c,
       arg_max(c, ts) AS close_c,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY user_id, bucket
"""


def q_stats_benford(sf_dir: str):
    """Benford's-law audit of l_extendedprice (`extras/stats.benford_audit`):
    string-based first significant digit of the exact cent value (no float
    log10), per-digit counts via exact_value_counts, deviation =
    cross-multiplied |n_d*1e6 - n*exp_micro| against FIXED inlined Benford
    constants — pure integer arithmetic end to end."""
    from .extras.stats import benford_audit

    li = load(sf_dir, "lineitem", ["l_extendedprice"])
    return benford_audit(li, "l_extendedprice")


SQL_STATS_BENFORD = """
WITH c AS (
  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM lineitem WHERE l_extendedprice > 0
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
),
g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM g),
exp AS (
  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                        (5, 79181), (6, 66947), (7, 57992), (8, 51153),
                        (9, 45757)) AS v(digit, exp_micro)
)
SELECT exp.digit, CAST(coalesce(g.n, 0) AS BIGINT) AS n,
       CAST(exp.exp_micro AS BIGINT) AS exp_micro,
       CAST(abs(coalesce(g.n, 0) * 1000000 - t.total * exp.exp_micro)
            AS BIGINT) AS dev_micro
FROM exp LEFT JOIN g ON g.digit = exp.digit CROSS JOIN t
"""


EXTRAS10_REGISTRY.update(
    {
        "events_ohlc": QueryDef(q_events_ohlc, SQL_EVENTS_OHLC),
        "stats_benford": QueryDef(q_stats_benford, SQL_STATS_BENFORD),
    }
)


# --------------------------------------------------------------------------
# wave 109: stereo->mono audio downmix through an actor-pool stage

def q_multimodal_wav_downmix(sf_dir: str):
    """Stereo WAV decode -> floor-mean mono downmix -> integer stats
    (`extras/multimodal.AudioDownmixer`), the canonical audio preprocessing
    stage: closed-form per-channel samples, so the oracle recomputes the
    exact downmixed sum relationally (floor((l+r)/2) per sample)."""
    from .extras.multimodal import attach_media_wav_stereo, downmix_audio_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return downmix_audio_stats(attach_media_wav_stereo(docs, "doc_id", n_samples=400))


SQL_MULTIMODAL_WAV_DOWNMIX = """
SELECT d.doc_id,
       CAST(400 AS BIGINT) AS n_samples,
       (SELECT CAST(sum(CAST(floor((
            ((d.doc_id * 13 + 7 * t.j) % 2001) - 1000 +
            ((d.doc_id * 17 + 5 * t.j) % 2001) - 1000
          ) / 2.0) AS BIGINT)) AS BIGINT)
        FROM unnest(range(400)) AS t(j)) AS mono_sum,
       CAST(8000 AS BIGINT) AS rate
FROM documents d
"""


EXTRAS10_REGISTRY.update(
    {
        "multimodal_wav_downmix": QueryDef(
            q_multimodal_wav_downmix, SQL_MULTIMODAL_WAV_DOWNMIX
        )
    }
)


def q_stats_contingency(sf_dir: str):
    """Exact contingency cells + independence deviations for
    (mktsegment × nationkey) (`extras/stats.contingency_table`): observed
    count, marginals, and the cross-multiplied chi-square numerator root
    o·N − row_n·col_n, all int64 — no float sum whose order could drift."""
    from .extras.stats import contingency_table

    cust = load(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])
    return contingency_table(cust, "c_mktsegment", "c_nationkey")


SQL_STATS_CONTINGENCY = """
WITH g AS (
  SELECT c_mktsegment AS a, CAST(c_nationkey AS VARCHAR) AS b,
         COUNT(*) AS o
  FROM customer GROUP BY a, b
),
r AS (SELECT a, SUM(o) AS row_n FROM g GROUP BY a),
c AS (SELECT b, SUM(o) AS col_n FROM g GROUP BY b),
t AS (SELECT SUM(o) AS n FROM g)
SELECT g.a AS c_mktsegment, g.b AS c_nationkey,
       CAST(g.o AS BIGINT) AS o,
       CAST(r.row_n AS BIGINT) AS row_n,
       CAST(c.col_n AS BIGINT) AS col_n,
       CAST(g.o * t.n - r.row_n * c.col_n AS BIGINT) AS diff
FROM g JOIN r USING (a) JOIN c USING (b) CROSS JOIN t
"""


EXTRAS10_REGISTRY.update(
    {"stats_contingency": QueryDef(q_stats_contingency, SQL_STATS_CONTINGENCY)}
)


# --------------------------------------------------------------------------
# wave 110: BGP planner observability — the optimizer's chosen order and
# cost estimates as a queryable table (EXPLAIN for the SPARQL engine)

def q_kg_bgp_explain(sf_dir: str):
    """Planner EXPLAIN: run `kg/bgp.optimize_pattern_order` over the
    canonical store for a star BGP (all patterns share ?c — so the greedy's
    connectivity constraint never filters, and the order is exactly
    (cost, input index), which the oracle replays relationally). Emits one
    row per step: the pattern, its predicate's triple count and the 2x
    scaled cost estimate (pred_n halved once per bound subj/obj constant —
    x2 keeps it integer)."""
    from .kg.bgp import optimize_pattern_order
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples
    patterns = [
        ("?c", "hasAccountBalance", "?b"),
        ("?c", "basedIn", "urn:nation:1"),
        ("?c", "basedIn", "?n"),
    ]
    ordered = optimize_pattern_order(tri, patterns)

    from .extras.stats import exact_value_counts

    pred_counts = {
        r["pred"]: int(r["n"])
        for r in exact_value_counts(
            tri.map_batches(
                lambda b: pa.table({"pred": b.column("pred")}),
                batch_format="pyarrow",
            ),
            "pred",
        ).take_all()
    }

    def _is_var(t: str) -> bool:
        return t.startswith("?")

    steps, pats, pns, costs = [], [], [], []
    for i, (s, p, o) in enumerate(ordered):
        pn = pred_counts.get(p, 0)
        k = sum(1 for t in (s, o) if not _is_var(t))
        steps.append(i + 1)
        pats.append(f"{s} {p} {o}")
        pns.append(pn)
        costs.append((2 * pn) >> k)
    return pa.table(
        {
            "step": pa.array(steps, pa.int64()),
            "pattern": pa.array(pats, pa.string()),
            "pred_n": pa.array(pns, pa.int64()),
            "cost_x2": pa.array(costs, pa.int64()),
        }
    )


def _sql_bgp_explain() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH t AS ({SQL_KG_CANONICAL}),
pc AS (SELECT pred, COUNT(*) AS n FROM t GROUP BY pred),
pats AS (
  SELECT * FROM (VALUES
    (0, '?c hasAccountBalance ?b', 'hasAccountBalance', 0),
    (1, '?c basedIn urn:nation:1', 'basedIn', 1),
    (2, '?c basedIn ?n', 'basedIn', 0)
  ) AS v(idx, pattern, pred, bound)
),
costed AS (
  SELECT p.idx, p.pattern, coalesce(pc.n, 0) AS pred_n,
         (2 * coalesce(pc.n, 0)) // power(2, p.bound) AS cost_x2
  FROM pats p LEFT JOIN pc ON pc.pred = p.pred
)
SELECT CAST(row_number() OVER (ORDER BY cost_x2, idx) AS BIGINT) AS step,
       pattern, CAST(pred_n AS BIGINT) AS pred_n,
       CAST(cost_x2 AS BIGINT) AS cost_x2
FROM costed
"""


EXTRAS10_REGISTRY.update(
    {"kg_bgp_explain": QueryDef(q_kg_bgp_explain, _sql_bgp_explain())}
)


# --------------------------------------------------------------------------
# wave 111: Mann-Whitney rank-sum test in exact integers

def q_stats_mann_whitney(sf_dir: str):
    """Mann-Whitney U for click-vs-view event values
    (`extras/stats.mann_whitney_u2`): u2_a = 2·U_A so cross-group tie
    half-credits stay integral — per-value group counts, one constant-key
    running sum over the sorted distinct-value stream, one
    value-cardinality join; no float anywhere."""
    from .extras.stats import mann_whitney_u2

    ev = load(sf_dir, "events", ["event_type", "value"])
    return mann_whitney_u2(ev, "event_type", "value", "click", "view")


SQL_STATS_MANN_WHITNEY = """
WITH e AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         event_type = 'click' AS a
  FROM events WHERE event_type IN ('click', 'view')
),
g AS (
  SELECT c, SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN a THEN 0 ELSE 1 END) AS nb
  FROM e GROUP BY c
),
w AS (SELECT c, na, nb, SUM(nb) OVER (ORDER BY c) AS cum FROM g)
SELECT CAST(SUM(na) AS BIGINT) AS n_a,
       CAST(SUM(nb) AS BIGINT) AS n_b,
       CAST(SUM(na * (2 * cum - nb)) AS BIGINT) AS u2_a
FROM w
"""


EXTRAS10_REGISTRY.update(
    {"stats_mann_whitney": QueryDef(q_stats_mann_whitney, SQL_STATS_MANN_WHITNEY)}
)


# --------------------------------------------------------------------------
# wave 112: re-identification risk summary (prosecutor model) over the
# equivalence classes — the disclosure-risk report an anonymization run ends
# with (reference KPIs give k; this gives the k-derived risk surface)

def q_kpi_risk_summary(sf_dir: str):
    """Prosecutor-model risk scoreboard from the K2 equivalence classes:
    n_rows, n_classes, min_k (max risk = 1/min_k), n_singletons
    (certainly re-identifiable rows), rows_k_lt_5 (rows in classes below
    the conventional k=5 bar). Average prosecutor risk over records is
    EXACTLY n_classes/n_rows (sum of n_i·(1/n_i) = n_classes), so the
    integer pair IS the exact rational — no float division needed.
    Class-cardinality driver reduce, same bound as every KPI."""
    from .queries import q_kpi_classes

    cls = q_kpi_classes(sf_dir)
    rows = cls.take_all() if hasattr(cls, "take_all") else cls.to_pylist()
    sizes = [int(r["class_size"]) for r in rows]
    return pa.table(
        {
            "n_rows": pa.array([sum(sizes)], pa.int64()),
            "n_classes": pa.array([len(sizes)], pa.int64()),
            "min_k": pa.array([min(sizes) if sizes else 0], pa.int64()),
            "n_singletons": pa.array(
                [sum(1 for s in sizes if s == 1)], pa.int64()
            ),
            "rows_k_lt_5": pa.array(
                [sum(s for s in sizes if s < 5)], pa.int64()
            ),
        }
    )


def _sql_kpi_risk_summary() -> str:
    from .queries import SQL_KPI_CLASSES

    return f"""
WITH cls AS ({SQL_KPI_CLASSES})
SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(class_size) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN class_size = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singletons,
       CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_k_lt_5
FROM cls
"""


EXTRAS10_REGISTRY.update(
    {"kpi_risk_summary": QueryDef(q_kpi_risk_summary, _sql_kpi_risk_summary())}
)


# --------------------------------------------------------------------------
# wave 113: per-node local clustering (triangle participation + degree)

def q_graph_local_clustering(sf_dir: str):
    """Per-node triangle participation and degree on the co-supplier graph
    (`extras/graph.local_clustering`): the local clustering coefficient is
    the exact rational 2·tri/(deg·(deg−1)), emitted as the integer pair so
    no float division order can drift. Same wedge+closure plan as the
    global count, corners exploded into one node-cardinality fold."""
    from .extras.graph import local_clustering
    from .util import distinct_rows, hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    left = li.rename_columns({"l_suppkey": "a"}).materialize()
    right = li.rename_columns({"l_suppkey": "b"}).materialize()
    paired = hash_join(left, right, on="l_orderkey", join_type="inner")

    def _orient(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("a"), b.column("b"))
        t = b.filter(m)
        return pa.table(
            {"a": t.column("a").combine_chunks(), "b": t.column("b").combine_chunks()}
        )

    edges = distinct_rows(
        paired.map_batches(_orient, batch_format="pyarrow"), ["a", "b"]
    )
    return local_clustering(edges)


SQL_GRAPH_LOCAL_CLUSTERING = """
WITH pairs AS (
  SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1 JOIN pairs e2 ON e2.a = e1.b
                JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
t AS (SELECT node, COUNT(*) AS tri FROM corners GROUP BY node),
d AS (SELECT node, COUNT(*) AS deg FROM
        (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
      GROUP BY node)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(coalesce(t.tri, 0) AS BIGINT) AS tri,
       CAST(d.deg AS BIGINT) AS deg
FROM d LEFT JOIN t USING (node)
"""


EXTRAS10_REGISTRY.update(
    {
        "graph_local_clustering": QueryDef(
            q_graph_local_clustering, SQL_GRAPH_LOCAL_CLUSTERING
        )
    }
)


# --------------------------------------------------------------------------
# wave 114: cell suppression — the post-generalization step that suppresses
# quasi-identifier cells of rows in classes below the k bar, then re-forms
# classes (raising k without dropping rows, unlike record suppression)

def q_anonymize_cell_suppress(sf_dir: str, *, k_min: int = 5):
    """Generalize two attributes (the kpi_classes pipeline), then SUPPRESS
    the quasi-identifier cells ('*****', the reference's obfuscation
    sentinel) of every row whose class is smaller than k_min, and return
    the re-formed class table. Per-row class size arrives via one
    class-cardinality hash join against the folded class table — the row
    stream shuffles once, classes are dimension-sized."""
    from .queries import _geo_lookup, _with_geo, load as _load
    from .stages.generalization import generalize_column
    from .stages.generalization_object import generalize_object_column
    from .util import fold_per_key, hash_join

    SEP = "\x1f"
    ds = _with_geo(
        _load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        _geo_lookup(sf_dir),
    )
    ds, _ = generalize_column(ds, "c_acctbal", "c_custkey", num_attrs=2, kind="numeric")
    ds, _ = generalize_object_column(ds, "geo", ["n_name", "r_name"], num_attrs=2)

    def _key(b: pa.Table) -> pa.Table:
        g1 = pc.cast(b.column("c_acctbal_generalized"), pa.string())
        g2 = pc.cast(b.column("geo_generalized"), pa.string())
        return pa.table(
            {
                "ck": pc.binary_join_element_wise(g1, g2, SEP).combine_chunks(),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow").materialize()
    sizes = fold_per_key(keyed, "ck", {"n": ("sum", "one")}).materialize()
    rows = hash_join(keyed.select_columns(["ck"]), sizes, on="ck", join_type="inner")

    def _suppress(b: pa.Table) -> pa.Table:
        small = pc.less(pc.cast(b.column("n"), pa.int64()), k_min)
        parts = pc.split_pattern(b.column("ck").combine_chunks(), SEP)
        g1 = pc.if_else(small, pa.scalar("*****"), pc.list_element(parts, 0))
        g2 = pc.if_else(small, pa.scalar("*****"), pc.list_element(parts, 1))
        return pa.table(
            {
                "ck2": pc.binary_join_element_wise(g1, g2, SEP).combine_chunks(),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    refolded = fold_per_key(
        rows.map_batches(_suppress, batch_format="pyarrow").materialize(),
        "ck2",
        {"class_size": ("sum", "one")},
    )

    def _final(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("ck2").combine_chunks(), SEP)
        return pa.table(
            {
                "acct_gen": pc.list_element(parts, 0),
                "geo_gen": pc.list_element(parts, 1),
                "class_size": pc.cast(
                    b.column("class_size"), pa.int64()
                ).combine_chunks(),
            }
        )

    return refolded.map_batches(_final, batch_format="pyarrow")


def _sql_cell_suppress() -> str:
    from .queries import SQL_KPI_CLASSES

    return f"""
WITH cls AS ({SQL_KPI_CLASSES}),
sup AS (
  SELECT CASE WHEN class_size < 5 THEN '*****'
              ELSE CAST(c_acctbal_generalized AS VARCHAR) END AS acct_gen,
         CASE WHEN class_size < 5 THEN '*****'
              ELSE geo_generalized END AS geo_gen,
         class_size
  FROM cls
)
SELECT acct_gen, geo_gen, CAST(SUM(class_size) AS BIGINT) AS class_size
FROM sup GROUP BY acct_gen, geo_gen
"""


EXTRAS10_REGISTRY.update(
    {
        "anonymize_cell_suppress": QueryDef(
            q_anonymize_cell_suppress, _sql_cell_suppress()
        )
    }
)


# --------------------------------------------------------------------------
# wave 115: gzip JSONL interchange — the compressed wire format web-scale
# text dumps actually ship as

def q_corpus_jsonl_gzip_roundtrip(sf_dir: str):
    """documents -> distributed gzip JSONL shards
    (`sources/jsonl.write_jsonl_gzip`, content-hash part names over the
    UNCOMPRESSED bytes) -> `ray.data.read_json` back (gzip inferred from
    the extension) -> (doc_id, text). Identity oracle: compression must be
    lossless and ids survive as integers."""
    import shutil
    import tempfile

    import ray.data as rd

    from .sources.jsonl import write_jsonl_gzip

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out_dir = tempfile.mkdtemp(prefix="jsonlgz_rt_")
    try:
        n = write_jsonl_gzip(docs, out_dir)
        assert n >= 1
        back = rd.read_json(out_dir).select_columns(["doc_id", "text"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_JSONL_GZIP_ROUNDTRIP = "SELECT doc_id, text FROM documents"


EXTRAS10_REGISTRY.update(
    {
        "corpus_jsonl_gzip_roundtrip": QueryDef(
            q_corpus_jsonl_gzip_roundtrip, SQL_JSONL_GZIP_ROUNDTRIP
        )
    }
)


# --------------------------------------------------------------------------
# wave 116: image tiling — the patch-extraction stage of a vision-training
# pipeline (decode -> grid of tiles -> one row per patch)

def q_multimodal_tiles(sf_dir: str):
    """PGM payloads tiled into 8x8 patches (`extras/multimodal.extract_tiles`,
    actor pool; the per-image tile sums are one numpy reshape, no pixel
    loop): (doc_id, tile_y, tile_x, tile_sum) rows whose closed-form pixel
    values the oracle re-sums per tile index range."""
    from .extras.multimodal import attach_media_pgm, extract_tiles

    docs = load(sf_dir, "documents", ["doc_id"])
    return extract_tiles(attach_media_pgm(docs, "doc_id"), tile=8)


SQL_MULTIMODAL_TILES = """
SELECT d.doc_id, t.ty AS tile_y, t.tx AS tile_x,
       (SELECT CAST(sum((d.doc_id * 37 +
                         11 * ((t.ty * 8 + r.i // 8) * 16 +
                               t.tx * 8 + r.i % 8)) % 256) AS BIGINT)
        FROM unnest(range(64)) AS r(i)) AS tile_sum
FROM documents d,
     (SELECT a.ty, b.tx FROM unnest(range(2)) AS a(ty),
                             unnest(range(2)) AS b(tx)) t
"""


EXTRAS10_REGISTRY.update(
    {"multimodal_tiles": QueryDef(q_multimodal_tiles, SQL_MULTIMODAL_TILES)}
)


# --------------------------------------------------------------------------
# wave 117: corpus datasheet — the one-row "dataset card" summary a corpus
# release ships with (docs, tokens, language spread, length percentiles)

def q_corpus_datasheet(sf_dir: str):
    """One-row corpus datasheet: n_docs, n_tokens (whitespace tokens,
    the engine's token-count convention), n_langs, n_empty, and exact
    discrete char-length percentiles p50/p90/max (`extras/stats.
    exact_quantiles` — rank lookups on the narrow length stream, never a
    gather). Everything integer; the oracle replays each piece."""
    from .extras.stats import exact_quantiles
    from .util import fold_per_key

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _narrow(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        trimmed = pc.utf8_trim_whitespace(txt)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        ntok = np.where(empty, 0, ntok)
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "ntok": pa.array(ntok),
                "empty": pa.array(empty.astype(np.int64)),
                "nchars": pa.array(nchars),
                "doc_id": b.column("doc_id").combine_chunks(),
            }
        )

    narrow = docs.map_batches(_narrow, batch_format="pyarrow").materialize()
    tot = fold_per_key(
        narrow,
        "k",
        {
            "n_docs": ("sum", "one"),
            "n_tokens": ("sum", "ntok"),
            "n_empty": ("sum", "empty"),
            "max_chars": ("max", "nchars"),
        },
    ).take_all()[0]

    from .extras.stats import count_distinct_exact

    n_langs = count_distinct_exact(docs.select_columns(["lang"]), "lang")
    q = exact_quantiles(
        narrow.select_columns(["nchars", "doc_id"]),
        "nchars",
        [0.5, 0.9],
        id_col="doc_id",
    )
    qv = q.column("value").to_pylist()
    return pa.table(
        {
            "n_docs": pa.array([int(tot["n_docs"])], pa.int64()),
            "n_tokens": pa.array([int(tot["n_tokens"])], pa.int64()),
            "n_langs": pa.array([int(n_langs)], pa.int64()),
            "n_empty": pa.array([int(tot["n_empty"])], pa.int64()),
            "p50_chars": pa.array([int(qv[0])], pa.int64()),
            "p90_chars": pa.array([int(qv[1])], pa.int64()),
            "max_chars": pa.array([int(tot["max_chars"])], pa.int64()),
        }
    )


SQL_CORPUS_DATASHEET = """
WITH t AS (
  SELECT doc_id,
         coalesce(text, '') AS text,
         length(coalesce(text, '')) AS nchars,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
              ELSE length(regexp_split_to_array(
                     lower(trim(coalesce(text, ''))), '\\s+')) END AS ntok,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 1 ELSE 0 END AS empty
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
       CAST(SUM(empty) AS BIGINT) AS n_empty,
       CAST(quantile_disc(nchars, 0.5) AS BIGINT) AS p50_chars,
       CAST(quantile_disc(nchars, 0.9) AS BIGINT) AS p90_chars,
       CAST(MAX(nchars) AS BIGINT) AS max_chars
FROM t
"""


EXTRAS10_REGISTRY.update(
    {"corpus_datasheet": QueryDef(q_corpus_datasheet, SQL_CORPUS_DATASHEET)}
)


# --------------------------------------------------------------------------
# wave 118: XSD literal canonicalization — hygiene pass before dedup/join

def q_kg_literal_canonical(sf_dir: str):
    """Deterministically NOISY integer lexicals (zero-padded to a width
    keyed on the row: lpad(key, 3 + key % 3)) and boolean variants
    ('1'/'TRUE'/'false' cycling by key) canonicalized by
    `kg/literals.canonicalize_literals` — equal values regain equal lexical
    forms ("007" -> "7"), with a changed flag per triple. The oracle builds
    the identical noise and replays the canonicalization with CASTs."""
    from .kg.literals import canonicalize_literals

    nat = load(sf_dir, "customer", ["c_custkey"])

    def _noisy(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        width = 3 + (k % 3)
        ints = [str(v).zfill(int(w)) for v, w in zip(k, width)]
        bools = np.array(["1", "TRUE", "false"], dtype=object)[k % 3]
        subj = [f"urn:cust:{v}" for v in k]
        return pa.table(
            {
                "subj": pa.array(subj + subj, pa.string()),
                "pred": pa.array(
                    ["key"] * len(k) + ["active"] * len(k), pa.string()
                ),
                "obj": pa.array(ints + list(bools), pa.string()),
                "obj_kind": pa.array(
                    ["integer"] * len(k) + ["boolean"] * len(k), pa.string()
                ),
            }
        )

    noisy = nat.map_batches(_noisy, batch_format="pyarrow")
    return canonicalize_literals(noisy)


SQL_KG_LITERAL_CANONICAL = """
WITH base AS (
  SELECT c_custkey AS k,
         -- greatest(): lpad TRUNCATES above the target width, zfill pads
         -- to max(len, width) — match zfill
         lpad(CAST(c_custkey AS VARCHAR),
              CAST(greatest(length(CAST(c_custkey AS VARCHAR)),
                            3 + c_custkey % 3) AS INT), '0') AS noisy_int,
         CASE c_custkey % 3 WHEN 0 THEN '1' WHEN 1 THEN 'TRUE'
              ELSE 'false' END AS noisy_bool
  FROM customer
),
t AS (
  SELECT 'urn:cust:' || k AS subj, 'key' AS pred, noisy_int AS obj,
         'integer' AS obj_kind,
         CAST(CAST(noisy_int AS BIGINT) AS VARCHAR) AS canon
  FROM base
  UNION ALL
  SELECT 'urn:cust:' || k, 'active', noisy_bool, 'boolean',
         CASE WHEN lower(noisy_bool) IN ('1', 'true') THEN 'true'
              ELSE 'false' END
  FROM base
)
SELECT subj, pred, canon AS obj, obj_kind,
       CAST(CASE WHEN canon <> obj THEN 1 ELSE 0 END AS BIGINT) AS changed
FROM t
"""


EXTRAS10_REGISTRY.update(
    {
        "kg_literal_canonical": QueryDef(
            q_kg_literal_canonical, SQL_KG_LITERAL_CANONICAL
        )
    }
)


# --------------------------------------------------------------------------
# wave 119: namespace histogram — the first profiling query anyone runs on
# an unfamiliar KG (which vocabularies, how much of each)

def q_kg_namespace_stats(sf_dir: str):
    """Namespace histogram over the canonical graph's subjects and IRI
    objects: namespace = everything up to the LAST '/', '#' or ':' (''
    for bare local names). One `exact_value_counts` fold at vocabulary
    cardinality; the stream never gathers."""
    from .extras.stats import exact_value_counts
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _ns(b: pa.Table) -> pa.Table:
        subj = b.column("subj").combine_chunks()
        t = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        terms = pa.concat_arrays(
            [subj, t.column("obj").combine_chunks()]
        )
        m = pc.extract_regex(terms, r"^(?P<ns>.*[/#:])")
        ns = pc.fill_null(pc.struct_field(m, "ns"), "")
        return pa.table(
            {"ns": ns.combine_chunks() if isinstance(ns, pa.ChunkedArray) else ns}
        )

    return exact_value_counts(
        tri.map_batches(_ns, batch_format="pyarrow"), "ns"
    ).rename_columns({"ns": "namespace", "n": "n_terms"})


def _sql_namespace_stats() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH t AS ({SQL_KG_CANONICAL}),
terms AS (
  SELECT subj AS term FROM t
  UNION ALL
  SELECT obj FROM t WHERE obj_kind = 'iri'
),
ns AS (
  SELECT coalesce(regexp_extract(term, '^(.*[/#:])', 1), '') AS namespace
  FROM terms
)
SELECT namespace, CAST(COUNT(*) AS BIGINT) AS n_terms
FROM ns GROUP BY namespace
"""


EXTRAS10_REGISTRY.update(
    {"kg_namespace_stats": QueryDef(q_kg_namespace_stats, _sql_namespace_stats())}
)


# --------------------------------------------------------------------------
# wave 120: rolling-window deviation detector (the windowed sibling of the
# global z-score anomaly query): per event, the trailing-W mean deviation
# flag in cross-multiplied integers

_ROLL_W = 5
_ROLL_DELTA_CENTS = 800  # flag when |v - mean_W| > 8.00


def q_events_rolling_dev(sf_dir: str):
    """Per (user, ts) event: trailing-5-row sum/count of value cents and a
    deviation flag |n_w·v − rs| > delta·n_w (the mean comparison without a
    division). One range-sorted window pass (`per_key_window` running sum)
    plus two event-cardinality joins: trailing cum at rn−W via a
    (user|rn+W) key join, own value via cum − cum(rn−1)."""
    from .extras.window import per_key_window
    from .util import hash_join

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "user_id": b.column("user_id").combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "cents": cents,
            }
        )

    w = per_key_window(
        ev.map_batches(_cents, batch_format="pyarrow"),
        "user_id",
        "ts",
        "event_id",
        "cents",
    ).materialize()

    SEP = "\x1f"

    def _k(shift: int, cum_name: str):
        def _fn(b: pa.Table) -> pa.Table:
            rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
            uid = pc.cast(b.column("user_id"), pa.string())
            key = pc.binary_join_element_wise(
                uid, pa.array((rn + shift).astype(str)), SEP
            )
            t = pa.table(
                {
                    "k": key.combine_chunks()
                    if isinstance(key, pa.ChunkedArray)
                    else key,
                    cum_name: pc.cast(b.column("cum_val"), pa.int64()).combine_chunks(),
                }
            )
            if shift == 0:
                t = t.append_column("event_id", b.column("event_id"))
                t = t.append_column("rn", pa.array(rn, pa.int64()))
            return t

        return _fn

    cur = w.map_batches(_k(0, "cum"), batch_format="pyarrow").materialize()
    lag_w = w.map_batches(_k(_ROLL_W, "cum_w"), batch_format="pyarrow").materialize()
    lag_1 = w.map_batches(_k(1, "cum_1"), batch_format="pyarrow").materialize()

    j = hash_join(
        hash_join(cur, lag_w, on="k", join_type="left_outer").materialize(),
        lag_1,
        on="k",
        join_type="left_outer",
    )

    def _final(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        cum = b.column("cum").to_numpy(zero_copy_only=False).astype(np.int64)
        cw = np.nan_to_num(
            b.column("cum_w").to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        c1 = np.nan_to_num(
            b.column("cum_1").to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        rs = cum - cw
        n_w = np.minimum(rn, _ROLL_W)
        v = cum - c1
        flag = (np.abs(n_w * v - rs) > _ROLL_DELTA_CENTS * n_w).astype(np.int64)
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "rs": pa.array(rs, pa.int64()),
                "n_w": pa.array(n_w, pa.int64()),
                "flag": pa.array(flag, pa.int64()),
            }
        )

    return j.map_batches(_final, batch_format="pyarrow")


SQL_EVENTS_ROLLING_DEV = f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
w AS (
  SELECT event_id, c,
         SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
           AS rs,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
           AS n_w
  FROM e
)
SELECT event_id, CAST(rs AS BIGINT) AS rs, CAST(n_w AS BIGINT) AS n_w,
       CAST(CASE WHEN abs(n_w * c - rs) > {_ROLL_DELTA_CENTS} * n_w
                 THEN 1 ELSE 0 END AS BIGINT) AS flag
FROM w
"""


EXTRAS10_REGISTRY.update(
    {"events_rolling_dev": QueryDef(q_events_rolling_dev, SQL_EVENTS_ROLLING_DEV)}
)


# --------------------------------------------------------------------------
# wave 121: numeric band join — |l - r| <= band via bucketed 3x replication

def q_join_band_acctbal(sf_dir: str):
    """Band join (`extras/joins.band_join`): customer x supplier pairs
    whose account balances differ by <= 50.00 — values bucket into
    band-width cells, LEFT rows replicate into cell±1 (bounded 3x, never a
    cross join), one cell-keyed hash join, exact filter after. Counted per
    customer so the output stays customer-cardinality."""
    from .extras.joins import band_join
    from .extras.graph import sum_per_key

    BAND = 5000  # cents

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    supp = load(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    def _ci(b: pa.Table, col: str) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column(col), 100.0), 0.5)), pa.int64()
        )
        out = b.drop_columns([col]).append_column(col + "_c", cents)
        return out

    cust_c = cust.map_batches(lambda b: _ci(b, "c_acctbal"), batch_format="pyarrow")
    supp_c = supp.map_batches(lambda b: _ci(b, "s_acctbal"), batch_format="pyarrow")
    pairs = band_join(
        cust_c,
        supp_c,
        left_val="c_acctbal_c",
        right_val="s_acctbal_c",
        band=BAND,
        left_keep=["c_custkey"],
        right_keep=["s_suppkey"],
    )

    counted = sum_per_key(
        pairs.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": pc.cast(
                        b.column("c_custkey"), pa.int64()
                    ).combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "c_custkey",
        "one",
    )
    return counted.rename_columns({"one": "n_suppliers_in_band"})


SQL_JOIN_BAND_ACCTBAL = """
WITH c AS (SELECT c_custkey,
                  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cc
           FROM customer),
s AS (SELECT CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS sc
      FROM supplier)
SELECT c.c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers_in_band
FROM c JOIN s ON abs(c.cc - s.sc) <= 5000
GROUP BY c.c_custkey
"""


EXTRAS10_REGISTRY.update(
    {"join_band_acctbal": QueryDef(q_join_band_acctbal, SQL_JOIN_BAND_ACCTBAL)}
)


# --------------------------------------------------------------------------
# wave 122: discrete-Laplace (two-sided geometric) DP counts — the
# second classic DP mechanism beside the binomial one, still fully
# integer-deterministic

def q_dp_discrete_laplace(sf_dir: str, seed: int = 11):
    """Noisy event-type counts under the DISCRETE LAPLACE mechanism
    (Ghosh-Roughgarden-Sundararajan): noise = G1 − G2 with G ~
    Geometric(1/2) drawn as the TRAILING-ONES count of a seeded md5-64
    uniform — P(trailing ones = k) = 2^-(k+1) exactly, and
    trailing_ones(u) = bit_count(u XOR (u+1)) − 1 is pure integer bit
    math DuckDB replays verbatim. Counting is one partial-combiner pass;
    noise is O(domain) driver work."""
    from .extras.dedup import _md5_64

    ev = load(sf_dir, "events", ["event_type"])

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n"])

    parts = ev.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[str, int] = {}
    for r in parts:
        acc[r["event_type"]] = acc.get(r["event_type"], 0) + r["n"]

    MASK = (1 << 62) - 1

    def geo(s: str) -> int:
        u = _md5_64(s) & MASK
        return bin(u ^ (u + 1)).count("1") - 1

    keys = sorted(acc)
    noisy = [
        acc[k] + geo(f"dplap{seed}|{k}|1") - geo(f"dplap{seed}|{k}|2")
        for k in keys
    ]
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "noisy_count": pa.array(noisy, pa.int64()),
        }
    )


SQL_DP_DISCRETE_LAPLACE = """
WITH g AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
u AS (
  SELECT event_type, n,
         CAST(md5_number_upper('dplap11|' || event_type || '|1') AS UBIGINT)
           & 4611686018427387903 AS u1,
         CAST(md5_number_upper('dplap11|' || event_type || '|2') AS UBIGINT)
           & 4611686018427387903 AS u2
  FROM g
)
SELECT event_type,
       CAST(n + (bit_count(xor(u1, u1 + 1)) - 1)
              - (bit_count(xor(u2, u2 + 1)) - 1) AS BIGINT) AS noisy_count
FROM u
"""


EXTRAS10_REGISTRY.update(
    {
        "dp_discrete_laplace": QueryDef(
            q_dp_discrete_laplace, SQL_DP_DISCRETE_LAPLACE
        )
    }
)


# --------------------------------------------------------------------------
# wave 123: overlapping chunking — the RAG-standard sliding window
# (stride < size), exercising chunk_documents' overlap path end to end

_OVL_SIZE, _OVL_STRIDE = 64, 32


def q_text_chunks_overlap(sf_dir: str):
    """Sliding-window chunking with 50% overlap (`extras/chunk.
    chunk_documents(stride=32)`): chunk j covers tokens
    [j·stride, j·stride+size); the last chunk is the FIRST one reaching
    the document's end (no degenerate tail windows). Vectorized Arrow
    kernels, no shuffle; the oracle replays the window algebra with a
    per-doc chunk-id series join."""
    from .extras.chunk import chunk_documents

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, size=_OVL_SIZE, stride=_OVL_STRIDE)


SQL_TEXT_CHUNKS_OVERLAP = rf"""
WITH tok AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
n AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY doc_id),
ch AS (
  SELECT doc_id, unnest(range(
           CASE WHEN nt <= {_OVL_SIZE} THEN 1
                ELSE (nt - {_OVL_SIZE} + {_OVL_STRIDE} - 1) // {_OVL_STRIDE} + 1
           END)) AS chunk_id
  FROM n
)
SELECT t.doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
       COUNT(*) AS n_tokens,
       string_agg(t.term, ' ' ORDER BY t.pos) AS chunk_text
FROM ch c JOIN tok t
  ON t.doc_id = c.doc_id
 AND t.pos >= c.chunk_id * {_OVL_STRIDE}
 AND t.pos < c.chunk_id * {_OVL_STRIDE} + {_OVL_SIZE}
GROUP BY t.doc_id, c.chunk_id
"""


EXTRAS10_REGISTRY.update(
    {
        "text_chunks_overlap": QueryDef(
            q_text_chunks_overlap, SQL_TEXT_CHUNKS_OVERLAP
        )
    }
)


# --------------------------------------------------------------------------
# wave 124: multi-source fact fusion (truth discovery) — the conflict-
# resolution stage a KG built from several extractors/sources runs before
# canonical triples are committed

def q_kg_fact_fusion(sf_dir: str):
    """Majority-vote fact fusion over three deterministic 'sources'
    asserting each customer's basedIn nation: sources 1 and 3 assert the
    true nation, source 2 mis-extracts every third customer (nation+1 mod
    25 — the oracle replays the corruption). Fusion = vote counts per
    (subj, obj) via one fold, winner per subj via `topk_per_key` (votes
    desc, obj asc ties) — the whole conflict resolution runs at
    assertion cardinality with no per-group UDF. Output: subj, winning
    obj, its votes, and n_distinct_claims per subj."""
    from .extras.graph import sum_per_key
    from .util import fold_per_key, hash_join, topk_per_key

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def _claims(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        wrong = np.where(k % 3 == 0, (n + 1) % 25, n)
        subj = np.concatenate([k, k, k])
        obj = np.concatenate([n, wrong, n])
        return pa.table(
            {
                "subj": pa.array(subj, pa.int64()),
                "obj": pa.array(obj, pa.int64()),
                "one": pa.array(np.ones(len(subj), np.int64)),
            }
        )

    claims = cust.map_batches(_claims, batch_format="pyarrow")
    votes = fold_per_key(
        claims.map_batches(
            lambda b: pa.table(
                {
                    "so": pc.binary_join_element_wise(
                        pc.cast(b.column("subj"), pa.string()),
                        pc.cast(b.column("obj"), pa.string()),
                        "\x1f",
                    ).combine_chunks(),
                    "one": b.column("one").combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ),
        "so",
        {"votes": ("sum", "one")},
    ).materialize()

    def _split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("so").combine_chunks(), "\x1f")
        return pa.table(
            {
                "subj": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "obj": pc.cast(pc.list_element(parts, 1), pa.int64()),
                "votes": pc.cast(b.column("votes"), pa.int64()).combine_chunks(),
            }
        )

    per_claim = votes.map_batches(_split, batch_format="pyarrow").materialize()
    winners = topk_per_key(per_claim, "subj", "votes", 1, tie_col="obj")
    claims_per_subj = sum_per_key(
        per_claim.map_batches(
            lambda b: pa.table(
                {
                    "subj": b.column("subj").combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "subj",
        "one",
    ).materialize()

    out = hash_join(
        winners.materialize(),
        claims_per_subj.map_batches(
            lambda b: b.rename_columns(["subj", "n_claims"]),
            batch_format="pyarrow",
        ).materialize(),
        on="subj",
        join_type="inner",
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "subj": pc.cast(b.column("subj"), pa.int64()).combine_chunks(),
                "obj": pc.cast(b.column("obj"), pa.int64()).combine_chunks(),
                "votes": pc.cast(b.column("votes"), pa.int64()).combine_chunks(),
                "n_claims": pc.cast(b.column("n_claims"), pa.int64()).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )


SQL_KG_FACT_FUSION = """
WITH claims AS (
  SELECT c_custkey AS subj, c_nationkey AS obj FROM customer
  UNION ALL
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END
  FROM customer
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer
),
v AS (SELECT subj, obj, COUNT(*) AS votes FROM claims GROUP BY subj, obj),
w AS (
  SELECT subj, obj, votes,
         row_number() OVER (PARTITION BY subj
                            ORDER BY votes DESC, obj ASC) AS rn,
         COUNT(*) OVER (PARTITION BY subj) AS n_claims
  FROM v
)
SELECT CAST(subj AS BIGINT) AS subj, CAST(obj AS BIGINT) AS obj,
       CAST(votes AS BIGINT) AS votes, CAST(n_claims AS BIGINT) AS n_claims
FROM w WHERE rn = 1
"""


EXTRAS10_REGISTRY.update(
    {"kg_fact_fusion": QueryDef(q_kg_fact_fusion, SQL_KG_FACT_FUSION)}
)


# --------------------------------------------------------------------------
# wave 125: weighted shortest paths (bounded-round Bellman-Ford) on the
# co-supplier graph, weight = 1000 - shared-order count (strong ties are
# short hops), source = supplier 1

_SSSP_ROUNDS = 3


def q_graph_weighted_sssp(sf_dir: str):
    """Min-plus SSSP (`extras/graph.weighted_sssp`): bounded 3-round
    Bellman-Ford from supplier 1 over the undirected co-supplier graph with
    integer weights w = 1000 − shared_orders. The oracle unrolls the same
    three synchronous relaxations as chained CTEs (the pagerank-oracle
    style); unreached nodes are absent on both sides."""
    from .extras.graph import sum_per_key, weighted_sssp
    from .util import hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    left = li.rename_columns({"l_suppkey": "a"}).materialize()
    right = li.rename_columns({"l_suppkey": "b"}).materialize()
    paired = hash_join(left, right, on="l_orderkey", join_type="inner")

    def _orient(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("a"), b.column("b"))
        t = b.filter(m)
        return pa.table(
            {
                "ab": pc.binary_join_element_wise(
                    pc.cast(t.column("a"), pa.string()),
                    pc.cast(t.column("b"), pa.string()),
                    "\x1f",
                ).combine_chunks(),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    shared = sum_per_key(
        paired.map_batches(_orient, batch_format="pyarrow"), "ab", "one"
    ).materialize()

    def _edges(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("ab").combine_chunks(), "\x1f")
        n = pc.cast(b.column("one"), pa.int64())
        return pa.table(
            {
                "u": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "v": pc.cast(pc.list_element(parts, 1), pa.int64()),
                "w": pc.subtract(pa.scalar(1000, pa.int64()), n).combine_chunks(),
            }
        )

    edges = shared.map_batches(_edges, batch_format="pyarrow")
    return weighted_sssp(edges, [1], rounds=_SSSP_ROUNDS)


SQL_GRAPH_WEIGHTED_SSSP = """
WITH pairs AS (
  SELECT l1.l_suppkey AS u, l2.l_suppkey AS v, COUNT(*) AS c
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
  GROUP BY u, v),
e AS (
  SELECT u, v, 1000 - c AS w FROM pairs
  UNION ALL
  SELECT v, u, 1000 - c FROM pairs),
d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
d1 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d0
    UNION ALL
    SELECT e.v, d0.dist + e.w FROM d0 JOIN e ON e.u = d0.node
  ) GROUP BY node),
d2 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d1
    UNION ALL
    SELECT e.v, d1.dist + e.w FROM d1 JOIN e ON e.u = d1.node
  ) GROUP BY node),
d3 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d2
    UNION ALL
    SELECT e.v, d2.dist + e.w FROM d2 JOIN e ON e.u = d2.node
  ) GROUP BY node)
SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist FROM d3
"""


EXTRAS10_REGISTRY.update(
    {"graph_weighted_sssp": QueryDef(q_graph_weighted_sssp, SQL_GRAPH_WEIGHTED_SSSP)}
)


# --------------------------------------------------------------------------
# wave 126: RAKE keyword extraction statistics

def q_text_rake(sf_dir: str):
    """RAKE keyword statistics (`extras/textstats.rake_scores`): candidate
    phrases = maximal stopword-free runs, per-word freq and degree (sum of
    containing-phrase lengths) as the exact integer pair behind the RAKE
    score degree/freq. Phrase segmentation is a running stopword count —
    the oracle replays it with one window cumsum."""
    from .extras.textstats import rake_scores

    docs = load(sf_dir, "documents", ["doc_id", "text"])
    return rake_scores(docs, "text")


SQL_TEXT_RAKE = r"""
WITH tok AS (
  SELECT doc_id, unnest(arr) AS w, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
ph AS (
  SELECT doc_id, w, pos,
         w IN ('the', 'a', 'of', 'and', 'is', 'in', 'to') AS stop,
         SUM(CASE WHEN w IN ('the', 'a', 'of', 'and', 'is', 'in', 'to')
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS phrase
  FROM tok
),
cand AS (
  SELECT doc_id, w, phrase,
         COUNT(*) OVER (PARTITION BY doc_id, phrase) AS plen
  FROM ph WHERE NOT stop
)
SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(SUM(plen) AS BIGINT) AS degree
FROM cand GROUP BY w
"""


EXTRAS10_REGISTRY.update(
    {"text_rake": QueryDef(q_text_rake, SQL_TEXT_RAKE)}
)


# --------------------------------------------------------------------------
# wave 127: entity-linking alias priors — the dictionary-BUILD side of the
# linking stage (surface form -> candidate entity counts + surface totals),
# harvested from the extraction + canonicalization outputs themselves

def q_kg_alias_priors(sf_dir: str):
    """Alias prior table for entity linking: per (surface form, canonical
    entity) the link count, plus the surface's total mentions — the prior
    P(entity|surface) stays the exact integer pair n_links/n_surface. Built
    by joining the mention stream (actor-pool extraction) with the
    canonicalized basedIn triples on the customer key — i.e. the engine
    harvests its own EL dictionary from a linked corpus, the standard
    bootstrap for the next crawl increment."""
    from .extras.graph import sum_per_key
    from .kg.extract import extract_mentions
    from .kg.pages import synthesize_pages
    from .kg.pipeline import kg_pipeline
    from .util import hash_join

    pages = synthesize_pages(sf_dir)
    mentions = extract_mentions(pages.select_columns(["url", "html"]))

    def _surface(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(
                pc.equal(b.column("pred"), "basedIn"),
                pc.equal(b.column("obj_kind"), "mention"),
            )
        )
        ck = pc.replace_substring_regex(
            t.column("subj").combine_chunks(), r"^Customer#", ""
        )
        return pa.table(
            {
                "ck": pc.cast(ck, pa.int64()),
                "surface": t.column("obj").combine_chunks(),
            }
        )

    surf = mentions.map_batches(_surface, batch_format="pyarrow").materialize()

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _linked(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("pred"), "basedIn"))
        ck = pc.replace_substring_regex(
            t.column("subj").combine_chunks(), r"^urn:cust:", ""
        )
        return pa.table(
            {
                "ck": pc.cast(ck, pa.int64()),
                "entity": t.column("obj").combine_chunks(),
            }
        )

    linked = tri.map_batches(_linked, batch_format="pyarrow").materialize()
    j = hash_join(surf, linked, on="ck", join_type="inner")

    pair = sum_per_key(
        j.map_batches(
            lambda b: pa.table(
                {
                    "se": pc.binary_join_element_wise(
                        b.column("surface").combine_chunks(),
                        b.column("entity").combine_chunks(),
                        "\x1f",
                    ),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "se",
        "one",
    ).materialize()

    def _split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("se").combine_chunks(), "\x1f")
        return pa.table(
            {
                "surface": pc.list_element(parts, 0),
                "entity": pc.list_element(parts, 1),
                "n_links": pc.cast(b.column("one"), pa.int64()).combine_chunks(),
            }
        )

    pairs = pair.map_batches(_split, batch_format="pyarrow").materialize()
    totals = sum_per_key(
        pairs.map_batches(
            lambda b: pa.table(
                {
                    "surface": b.column("surface").combine_chunks(),
                    "n_surface": pc.cast(
                        b.column("n_links"), pa.int64()
                    ).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ),
        "surface",
        "n_surface",
    ).materialize()
    out = hash_join(pairs, totals, on="surface", join_type="inner")
    return out.map_batches(
        lambda b: pa.table(
            {
                "surface": b.column("surface").combine_chunks(),
                "entity": b.column("entity").combine_chunks(),
                "n_links": pc.cast(b.column("n_links"), pa.int64()).combine_chunks(),
                "n_surface": pc.cast(
                    b.column("n_surface"), pa.int64()
                ).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )


def _sql_alias_priors() -> str:
    from .queries_kg import _SQL_VARIANT

    return f"""
WITH var AS (SELECT c_custkey, {_SQL_VARIANT} AS nv, c_nationkey
             FROM customer JOIN nation ON c_nationkey = n_nationkey),
p AS (
  SELECT nv AS surface, 'urn:nation:' || c_nationkey AS entity,
         COUNT(*) AS n_links
  FROM var GROUP BY surface, entity
),
t AS (SELECT surface, SUM(n_links) AS n_surface FROM p GROUP BY surface)
SELECT p.surface, p.entity, CAST(p.n_links AS BIGINT) AS n_links,
       CAST(t.n_surface AS BIGINT) AS n_surface
FROM p JOIN t USING (surface)
"""


EXTRAS10_REGISTRY.update(
    {"kg_alias_priors": QueryDef(q_kg_alias_priors, _sql_alias_priors())}
)


# --------------------------------------------------------------------------
# wave 128: Mondrian multidimensional k-anonymity (LeFevre et al. 2006) —
# the classic greedy median-cut partitioner, bounded-round

_MONDRIAN_K, _MONDRIAN_ROUNDS = 25, 3


def q_anonymize_mondrian(sf_dir: str):
    """Mondrian over (acctbal cents, nationkey) with k=25, 3 rounds
    (`extras/privacy.mondrian_partition`): per round each region picks its
    wider attribute (x on ties), lower-median cuts, splits only when both
    halves keep >= k rows ('=' stamps regions that cannot split). Returns
    the (region path, n) class table; per-round distributed cost is one
    range fold + one per-region median pass + one below-median fold, with
    region-sized (2^rounds) driver state only."""
    from .extras.privacy import mondrian_partition

    cust = load(sf_dir, "customer", ["c_acctbal", "c_nationkey"])

    def _int(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("c_acctbal"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "xc": cents,
                "yc": pc.cast(b.column("c_nationkey"), pa.int64()).combine_chunks(),
            }
        )

    return mondrian_partition(
        cust.map_batches(_int, batch_format="pyarrow"),
        "xc",
        "yc",
        k=_MONDRIAN_K,
        rounds=_MONDRIAN_ROUNDS,
    )


def _sql_mondrian_round(prev: str, cur: str) -> str:
    k = _MONDRIAN_K
    return f"""
{cur}_rng AS (
  SELECT region, x, y,
         max(x) OVER w - min(x) OVER w >= max(y) OVER w - min(y) OVER w
           AS wide_x
  FROM {prev}
  WINDOW w AS (PARTITION BY region)
),
{cur}_med AS (
  SELECT region, x, y, wide_x,
         CASE WHEN wide_x THEN x ELSE y END AS val,
         quantile_disc(CASE WHEN wide_x THEN x ELSE y END, 0.5)
           OVER (PARTITION BY region) AS med
  FROM {cur}_rng
),
{cur}_lo AS (
  SELECT region, x, y, val, med,
         SUM(CASE WHEN val <= med THEN 1 ELSE 0 END)
           OVER (PARTITION BY region) AS n_lo,
         COUNT(*) OVER (PARTITION BY region) AS n
  FROM {cur}_med
),
{cur} AS (
  SELECT CASE WHEN least(n_lo, n - n_lo) >= {k}
              THEN region || (CASE WHEN val <= med THEN 'L' ELSE 'R' END)
              ELSE region || '=' END AS region,
         x, y
  FROM {cur}_lo
)"""


def _sql_mondrian() -> str:
    rounds = "".join(
        "," + _sql_mondrian_round(f"r{i}", f"r{i + 1}")
        for i in range(_MONDRIAN_ROUNDS)
    )
    return f"""
WITH r0 AS (
  SELECT '' AS region,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS x,
         CAST(c_nationkey AS BIGINT) AS y
  FROM customer
){rounds}
SELECT region, CAST(COUNT(*) AS BIGINT) AS n
FROM r{_MONDRIAN_ROUNDS} GROUP BY region
"""


EXTRAS10_REGISTRY.update(
    {"anonymize_mondrian": QueryDef(q_anonymize_mondrian, _sql_mondrian())}
)


# --------------------------------------------------------------------------
# wave 129: classifier evaluation — confusion matrix with marginals (the
# eval report every router/classifier ships with, in exact integers)

def q_ml_confusion_matrix(sf_dir: str):
    """Confusion matrix of the Naive-Bayes language router against the true
    labels: per (true, pred) cell count plus row/column marginals — class
    precision = n/(n_pred) and recall = n/(n_true) stay exact integer
    pairs. Predictions come from the SAME deterministic classifier the
    `text_naive_bayes` oracle pins; the join is doc-cardinality."""
    from .extras.graph import sum_per_key
    from .extras.nbayes import naive_bayes_predict
    from .util import fold_per_key, hash_join

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = naive_bayes_predict(
        docs, text_col="text", label_col="lang", id_col="doc_id"
    ).materialize()

    truth = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "true_label": b.column("lang").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j = hash_join(
        pred.map_batches(
            lambda b: b.select(["doc_id", "pred_label"]), batch_format="pyarrow"
        ).materialize(),
        truth,
        on="doc_id",
        join_type="inner",
    )
    cells = fold_per_key(
        j.map_batches(
            lambda b: pa.table(
                {
                    "tp": pc.binary_join_element_wise(
                        b.column("true_label").combine_chunks(),
                        b.column("pred_label").combine_chunks(),
                        "\x1f",
                    ),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "tp",
        {"n": ("sum", "one")},
    ).take_all()  # label-pair cardinality — tiny by construction
    obs = {}
    n_true: dict[str, int] = {}
    n_pred: dict[str, int] = {}
    for r in cells:
        t, p = r["tp"].split("\x1f", 1)
        n = int(r["n"])
        obs[(t, p)] = n
        n_true[t] = n_true.get(t, 0) + n
        n_pred[p] = n_pred.get(p, 0) + n
    rows = sorted(obs)
    return pa.table(
        {
            "true_label": pa.array([t for t, _ in rows], pa.string()),
            "pred_label": pa.array([p for _, p in rows], pa.string()),
            "n": pa.array([obs[r] for r in rows], pa.int64()),
            "n_true": pa.array([n_true[t] for t, _ in rows], pa.int64()),
            "n_pred": pa.array([n_pred[p] for _, p in rows], pa.int64()),
        }
    )


def _sql_confusion_matrix() -> str:
    return f"""
WITH nb AS ({SQL_TEXT_NAIVE_BAYES}),
cell AS (
  SELECT d.lang AS true_label, nb.pred_label, COUNT(*) AS n
  FROM nb JOIN documents d USING (doc_id)
  GROUP BY true_label, pred_label
),
rt AS (SELECT true_label, SUM(n) AS n_true FROM cell GROUP BY true_label),
ct AS (SELECT pred_label, SUM(n) AS n_pred FROM cell GROUP BY pred_label)
SELECT cell.true_label, cell.pred_label, CAST(cell.n AS BIGINT) AS n,
       CAST(rt.n_true AS BIGINT) AS n_true,
       CAST(ct.n_pred AS BIGINT) AS n_pred
FROM cell JOIN rt USING (true_label) JOIN ct USING (pred_label)
"""


EXTRAS10_REGISTRY.update(
    {"ml_confusion_matrix": QueryDef(q_ml_confusion_matrix, _sql_confusion_matrix())}
)


# --------------------------------------------------------------------------
# wave 130: recency-decayed engagement — exponential time decay with a
# one-week half-life, EXACT because the weight is a power of two applied
# as integer floor-division (both engines floor identically)

def q_events_decayed_engagement(sf_dir: str):
    """Per-user recency-weighted value sum: each event contributes
    floor(cents / 2^age_weeks) with age measured back from the corpus's
    max timestamp — a one-week half-life. The decay is exact integer
    arithmetic (power-of-two floor division), so the whole ranking is
    value-hash stable. One tiny max-fold broadcast + one user-cardinality
    sum fold; negative values are excluded (decay semantics assume
    engagement mass)."""
    from .extras.graph import sum_per_key
    from .util import fold_per_key

    ev = load(sf_dir, "events", ["user_id", "ts", "value"])

    def _ts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "t": pc.cast(b.column("ts"), pa.int64()).combine_chunks(),
            }
        )

    mx = fold_per_key(
        ev.map_batches(_ts, batch_format="pyarrow"), "k", {"t": ("max", "t")}
    ).take_all()
    max_us = int(mx[0]["t"]) if mx else 0
    WEEK_US = 7 * 24 * 3600 * 1_000_000

    def _decay(b: pa.Table) -> pa.Table:
        cents = (
            pc.cast(
                pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        age_w = np.minimum((max_us - ts) // WEEK_US, 62).astype(np.int64)
        keep = cents > 0
        dec = cents[keep] // (np.int64(1) << age_w[keep])
        return pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64())
                .combine_chunks()
                .take(pa.array(np.nonzero(keep)[0])),
                "dec": pa.array(dec, pa.int64()),
            }
        )

    return sum_per_key(
        ev.map_batches(_decay, batch_format="pyarrow"), "user_id", "dec"
    ).rename_columns({"dec": "decayed_cents"})


SQL_EVENTS_DECAYED = """
WITH m AS (SELECT MAX(ts) AS mt FROM events),
e AS (
  SELECT user_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         CAST(least((epoch_us(m.mt) - epoch_us(ts)) // 604800000000, 62)
              AS BIGINT) AS age_w
  FROM events, m
)
SELECT user_id,
       CAST(SUM(c // CAST(power(2, age_w) AS BIGINT)) AS BIGINT) AS decayed_cents
FROM e WHERE c > 0 GROUP BY user_id
"""


EXTRAS10_REGISTRY.update(
    {
        "events_decayed_engagement": QueryDef(
            q_events_decayed_engagement, SQL_EVENTS_DECAYED
        )
    }
)


# --------------------------------------------------------------------------
# wave 131: per-key interval coalescing — temporal-KG validity compaction /
# overlap-sessionization, with the carry-chain done right for max-carries

def q_events_interval_coalesce(sf_dir: str):
    """Coalesce per-user activity intervals [ts, ts + 30 min) into maximal
    overlap sessions (`extras/asof.interval_coalesce`): one range sort,
    per-block islands seeded with a driver-chained incoming max-end carry
    (an island can span MANY blocks), 2 stitch tuples per block. Output
    (user_id, c_from, c_to, n_merged) in epoch micros; the oracle is the
    classic gaps-and-islands window pair."""
    from .extras.asof import interval_coalesce

    HALF_HOUR_US = 30 * 60 * 1_000_000
    ev = load(sf_dir, "events", ["user_id", "ts"])

    def _iv(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64()).combine_chunks(),
                "f": ts.combine_chunks(),
                "t": pc.add(ts, pa.scalar(HALF_HOUR_US, pa.int64())).combine_chunks(),
            }
        )

    return interval_coalesce(
        ev.map_batches(_iv, batch_format="pyarrow"), "user_id", "f", "t"
    )


SQL_EVENTS_INTERVAL_COALESCE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS f, epoch_us(ts) + 1800000000 AS t
  FROM events
),
m AS (
  SELECT user_id, f, t,
         MAX(t) OVER (PARTITION BY user_id ORDER BY f, t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
isl AS (
  SELECT user_id, f, t,
         SUM(CASE WHEN prev_max IS NULL OR f > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY f, t) AS island
  FROM m
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MIN(f) AS BIGINT) AS c_from,
       CAST(MAX(t) AS BIGINT) AS c_to,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM isl GROUP BY user_id, island
"""


EXTRAS10_REGISTRY.update(
    {
        "events_interval_coalesce": QueryDef(
            q_events_interval_coalesce, SQL_EVENTS_INTERVAL_COALESCE
        )
    }
)


# --------------------------------------------------------------------------
# wave 132: RDF patch round trip — diff two snapshots, APPLY the patch to
# the base, certify the patched graph equals the target (the delta-pipeline
# closure: incremental recrawls ship patches, not full dumps)

def q_kg_patch_roundtrip(sf_dir: str):
    """diff(old, new) -> apply(old, patch) == new, certified distributively:
    patch apply = anti-join the removals + union the additions (packed-key
    semi/anti joins — triples never gather); equality is checked by two
    set-difference counts that must BOTH be zero. Scoreboard: (n_add,
    n_del, patched_matches_target). The oracle pins the delta cardinality
    from the recrawl rule and the flag at 1."""
    import pyarrow.compute as _pc

    from .extras.joins import semi_anti_join
    from .kg.pipeline import kg_pipeline
    from .kg.temporal import ASOF_T_US, pages_asof, synthesize_recrawls

    def _triples(pages=None):
        r = kg_pipeline(
            sf_dir, pages=pages, anonymize=False, dedup_pages=pages is None
        )
        return r.triples.select_columns(["subj", "pred", "obj"])

    def _key(b: pa.Table) -> pa.Table:
        k = _pc.binary_join_element_wise(
            b.column("subj"), b.column("pred"), b.column("obj"), "\x1f"
        )
        return b.append_column("__k", k)

    old = _triples().map_batches(_key, batch_format="pyarrow").materialize()
    new = (
        _triples(pages_asof(synthesize_recrawls(sf_dir), ASOF_T_US))
        .map_batches(_key, batch_format="pyarrow")
        .materialize()
    )

    removed = semi_anti_join(
        old, new.select_columns(["__k"]), on="__k", anti=True
    ).materialize()
    added = semi_anti_join(
        new, old.select_columns(["__k"]), on="__k", anti=True
    ).materialize()

    # apply: old - removed + added
    patched = semi_anti_join(
        old, removed.select_columns(["__k"]), on="__k", anti=True
    ).union(added).materialize()

    # set equality, both directions, distributed
    miss = semi_anti_join(
        new, patched.select_columns(["__k"]), on="__k", anti=True
    ).count()
    extra = semi_anti_join(
        patched, new.select_columns(["__k"]), on="__k", anti=True
    ).count()
    return pa.table(
        {
            "n_add": pa.array([added.count()], pa.int64()),
            "n_del": pa.array([removed.count()], pa.int64()),
            "patched_matches_target": pa.array(
                [int(miss == 0 and extra == 0)], pa.int64()
            ),
        }
    )


SQL_KG_PATCH_ROUNDTRIP = """
WITH nn AS (SELECT count(*) AS c FROM documents),
rec AS (SELECT c_custkey FROM customer, nn
        WHERE c_acctbal IS NOT NULL AND (c_custkey % nn.c) % 5 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_add,
       CAST(count(*) AS BIGINT) AS n_del,
       CAST(1 AS BIGINT) AS patched_matches_target
FROM rec
"""


EXTRAS10_REGISTRY.update(
    {"kg_patch_roundtrip": QueryDef(q_kg_patch_roundtrip, SQL_KG_PATCH_ROUNDTRIP)}
)


# --------------------------------------------------------------------------
# wave 133: rank swapping — the classic statistical-disclosure-control
# perturbation (Moore 1996): adjacent-rank records exchange their values,
# preserving every marginal statistic exactly while unlinking record<->value

def q_anonymize_rank_swap(sf_dir: str):
    """Deterministic rank swap of acctbal: global rank by (cents, custkey),
    rank 2i exchanges with 2i+1 (an odd tail keeps its value). Marginals
    (sum, histogram) survive exactly; the record-value link breaks. One
    global rank pass (`util.rank_per_key` under a constant key) + one
    rank-cardinality self-join on the XOR-paired rank fetches the partner
    value. Output (c_custkey, swapped_cents)."""
    from .util import hash_join, rank_per_key

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("c_acctbal"), 100.0), 0.5)),
            pa.int64(),
        )
        t = pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "cents": cents,
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )
        return t.filter(pc.is_valid(t.column("cents")))

    keyed = cust.map_batches(_cents, batch_format="pyarrow").materialize()
    n_total = keyed.count()
    ranked = rank_per_key(
        keyed, "k", "cents", tie_col="c_custkey", rank_col="rn"
    ).materialize()

    def _partner(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        partner = rn ^ 1
        # an odd-count tail's last rank has no partner — keep itself
        partner = np.where(partner >= n_total, rn, partner)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "want_rn": pa.array(partner, pa.int64()),
            }
        )

    def _val(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "want_rn": pc.cast(b.column("rn"), pa.int64()).combine_chunks(),
                "swapped_cents": pc.cast(
                    b.column("cents"), pa.int64()
                ).combine_chunks(),
            }
        )

    out = hash_join(
        ranked.map_batches(_partner, batch_format="pyarrow").materialize(),
        ranked.map_batches(_val, batch_format="pyarrow").materialize(),
        on="want_rn",
        join_type="inner",
    )
    return out.select_columns(["c_custkey", "swapped_cents"])


SQL_ANONYMIZE_RANK_SWAP = """
WITH c AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal IS NOT NULL
),
r AS (
  SELECT c_custkey, cents,
         row_number() OVER (ORDER BY cents, c_custkey) - 1 AS rn,
         COUNT(*) OVER () AS n
  FROM c
),
p AS (
  SELECT c_custkey,
         CASE WHEN xor(rn, 1) >= n THEN rn ELSE xor(rn, 1) END AS want_rn
  FROM r
)
SELECT p.c_custkey, r2.cents AS swapped_cents
FROM p JOIN r r2 ON r2.rn = p.want_rn
"""


EXTRAS10_REGISTRY.update(
    {"anonymize_rank_swap": QueryDef(q_anonymize_rank_swap, SQL_ANONYMIZE_RANK_SWAP)}
)


# --------------------------------------------------------------------------
# wave 134: Spearman rank correlation core — exact integer Σd² with doubled
# average ranks for ties

def q_stats_spearman(sf_dir: str):
    """Spearman core for (l_quantity, integer price cents):
    (n, sum_d2_x4) with d = doubled-average-rank difference — ties stay
    integral, rho = 1 − 6·(Σd²/4)/(n(n²−1)) is one caller-side division.
    Per column: one distinct-count fold + one running sum gives avg2x per
    VALUE; two value-keyed joins stamp rows; one scoreboard fold."""
    from .extras.stats import spearman_pair

    li = load(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def _int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qa": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
                "pb": pc.cast(
                    pc.floor(
                        pc.add(pc.multiply(b.column("l_extendedprice"), 100.0), 0.5)
                    ),
                    pa.int64(),
                ),
            }
        )

    return spearman_pair(li.map_batches(_int, batch_format="pyarrow"), "qa", "pb")


SQL_STATS_SPEARMAN = """
WITH t AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS qa,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pb
  FROM lineitem
),
r AS (
  SELECT 2 * RANK() OVER (ORDER BY qa) + COUNT(*) OVER (PARTITION BY qa) - 1
           AS a2x,
         2 * RANK() OVER (ORDER BY pb) + COUNT(*) OVER (PARTITION BY pb) - 1
           AS b2x
  FROM t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((a2x - b2x) * (a2x - b2x)) AS BIGINT) AS sum_d2_x4
FROM r
"""


EXTRAS10_REGISTRY.update(
    {"stats_spearman": QueryDef(q_stats_spearman, SQL_STATS_SPEARMAN)}
)


# --------------------------------------------------------------------------
# wave 135a: per-supplier lead-time quantiles (ship -> receipt), the
# logistics SLA report — exact per-key discrete quantiles at any key count

def q_supplier_lead_quantiles(sf_dir: str):
    """Per-supplier p50/p90 of shipping delay in days (order date ->
    ship date, one orderkey join), via `extras/stats.group_quantiles` —
    one range sort by (key, value), in-block vectorized quantiles, only
    block-spanning keys re-gathered. Exact DuckDB quantile_disc
    semantics."""
    from .extras.stats import group_quantiles
    from .util import hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    ords = load(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )
    j = hash_join(li.materialize(), ords.materialize(), on="l_orderkey",
                  join_type="inner")

    def _days(b: pa.Table) -> pa.Table:
        d = pc.days_between(b.column("o_orderdate"), b.column("l_shipdate"))
        return pa.table(
            {
                "l_suppkey": b.column("l_suppkey").combine_chunks(),
                "lead_days": pc.cast(d, pa.int64()).combine_chunks(),
            }
        )

    out = group_quantiles(
        j.map_batches(_days, batch_format="pyarrow"),
        "l_suppkey",
        "lead_days",
        [0.5, 0.9],
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "l_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()).combine_chunks(),
                "q": pc.cast(b.column("q"), pa.float64()).combine_chunks(),
                "lead_days": pc.cast(b.column("value"), pa.int64()).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )


SQL_SUPPLIER_LEAD_QUANTILES = """
WITH d AS (
  SELECT l_suppkey,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
           AS lead_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT l_suppkey, 0.5 AS q,
       CAST(quantile_disc(lead_days, 0.5) AS BIGINT) AS lead_days
FROM d GROUP BY l_suppkey
UNION ALL
SELECT l_suppkey, 0.9,
       CAST(quantile_disc(lead_days, 0.9) AS BIGINT) AS lead_days
FROM d GROUP BY l_suppkey
"""


# wave 135b: hapax ratio — the vocabulary-health stat corpus linguists
# check first (fraction of words seen exactly once)

def q_text_hapax(sf_dir: str):
    """Corpus vocabulary health: (n_tokens, n_vocab, n_hapax) — hapax
    legomena counted from ONE `exact_value_counts` fold at vocabulary
    cardinality; the hapax ratio stays the exact integer pair
    n_hapax/n_vocab."""
    from .extras.stats import exact_value_counts
    from .util import fold_per_key

    docs = load(sf_dir, "documents", ["text"])

    def _words(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = toks.flatten()
        return pa.table({"w": flat.filter(pc.not_equal(flat, ""))})

    wc = exact_value_counts(
        docs.map_batches(_words, batch_format="pyarrow"), "w"
    ).materialize()
    tot = fold_per_key(
        wc.map_batches(
            lambda b: pa.table(
                {
                    "k": pa.array(np.zeros(b.num_rows, np.int64)),
                    "n_tokens": pc.cast(b.column("n"), pa.int64()).combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                    "hapax": pc.cast(
                        pc.equal(b.column("n"), 1), pa.int64()
                    ).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ),
        "k",
        {
            "n_tokens": ("sum", "n_tokens"),
            "n_vocab": ("sum", "one"),
            "n_hapax": ("sum", "hapax"),
        },
    ).take_all()
    r = tot[0] if tot else {"n_tokens": 0, "n_vocab": 0, "n_hapax": 0}
    return pa.table(
        {
            "n_tokens": pa.array([int(r["n_tokens"])], pa.int64()),
            "n_vocab": pa.array([int(r["n_vocab"])], pa.int64()),
            "n_hapax": pa.array([int(r["n_hapax"])], pa.int64()),
        }
    )


SQL_TEXT_HAPAX = r"""
WITH tok AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
           x -> x <> '')) AS w
  FROM documents
),
wc AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w)
SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM wc
"""


EXTRAS10_REGISTRY.update(
    {
        "supplier_lead_quantiles": QueryDef(
            q_supplier_lead_quantiles, SQL_SUPPLIER_LEAD_QUANTILES
        ),
        "text_hapax": QueryDef(q_text_hapax, SQL_TEXT_HAPAX),
    }
)
