"""Round-4 wave-19 operators with DuckDB oracles — the web-link-graph
family: href extraction out of raw html, URL canonicalization (the
crawl-dedup normalizer), host-level link-graph aggregation and per-target
anchor-text evidence. The fixture corpus carries deterministic nav links
(pure doc_id arithmetic, `kg/links.py`), so every oracle reconstructs the
expected graph in SQL without parsing html — the Ray side must earn the
match by actually extracting and normalizing the messy surface forms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load
from .queries_kg import SQL_KG_CANONICAL as SQL_KG_CANONICAL_REF

EXTRAS8_REGISTRY: dict[str, QueryDef] = {}


# shared oracle CTE: the three deterministic links per page (coefficients
# mirror kg/links._LINK_COEF exactly)
_SQL_LINKS_CTE = """
nn AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT doc_id, j,
         CASE j WHEN 0 THEN (31 * doc_id + 7) % c
                WHEN 1 THEN (17 * doc_id + 3) % c
                ELSE (53 * doc_id + 11) % c END AS t
  FROM documents, nn, (VALUES (0), (1), (2)) AS v(j)
)
"""


def _canonical_edges(sf_dir: str, with_anchor: bool = False):
    """linked pages -> href extraction -> canonicalization; html projected
    away right after extraction (the MB-scale column never rides further)."""
    from .kg.links import canonicalize_urls, extract_links, linked_pages

    edges = extract_links(linked_pages(sf_dir).select_columns(["url", "html"]))
    edges = canonicalize_urls(edges, "href", "src_url", out_col="dst_url")
    cols = ["src_url", "dst_url"] + (["anchor"] if with_anchor else [])
    return edges.select_columns(cols)


# --------------------------------------------------------------------------
# raw link extraction
# --------------------------------------------------------------------------

def q_kg_link_graph(sf_dir: str):
    """Raw (src_url, href, anchor) edge stream — one vectorized
    split+extract_regex pass per batch over genuine html bytes."""
    from .kg.links import extract_links, linked_pages

    return extract_links(linked_pages(sf_dir).select_columns(["url", "html"]))


SQL_KG_LINK_GRAPH = f"""
WITH {_SQL_LINKS_CTE}
SELECT 'https://example.org/doc/' || doc_id AS src_url,
       CASE j WHEN 0 THEN '/doc/' || t
              WHEN 1 THEN 'HTTPS://EXAMPLE.ORG:443/doc/' || t
                          || '?utm_source=feed&id=' || t
              ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t || '#s'
       END AS href,
       CASE j WHEN 0 THEN 'ref ' || t
              WHEN 1 THEN 'see ' || t
              ELSE 'doc ' || t END AS anchor
FROM e
"""


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

def q_kg_link_canonical(sf_dir: str):
    """Canonical (src_url, dst_url) edges: root-relative resolution against
    the source page, lowercase scheme/host, :443 strip, fragment drop,
    utm_* tracking-param removal (surviving params keep their order)."""
    return _canonical_edges(sf_dir)


SQL_KG_LINK_CANONICAL = f"""
WITH {_SQL_LINKS_CTE}
SELECT 'https://example.org/doc/' || doc_id AS src_url,
       CASE j WHEN 0 THEN 'https://example.org/doc/' || t
              WHEN 1 THEN 'https://example.org/doc/' || t || '?id=' || t
              ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t
       END AS dst_url
FROM e
"""


# --------------------------------------------------------------------------
# host-level link graph
# --------------------------------------------------------------------------

def q_kg_host_graph(sf_dir: str):
    """(src_host, dst_host, n_links) — the domain-level web graph (crawl
    frontier / authority signal). Exact fold via a tab-joined pair key
    through ``exact_value_counts`` (per-batch Arrow partials + one narrow
    sort-scan), correct at any host cardinality."""
    from .kg.links import host_graph

    return host_graph(_canonical_edges(sf_dir))


SQL_KG_HOST_GRAPH = f"""
WITH {_SQL_LINKS_CTE}
SELECT 'example.org' AS src_host,
       CASE WHEN j <= 1 THEN 'example.org'
            ELSE 'h' || (t % 8) || '.example.org' END AS dst_host,
       count(*) AS n_links
FROM e GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# anchor-text evidence per target
# --------------------------------------------------------------------------

def q_kg_anchor_stats(sf_dir: str):
    """Per canonical target url: in-link count, distinct-anchor count, and
    the lexicographically first anchor text (entity-naming evidence). Three
    sort-scan folds joined on the url key; no per-group UDF."""
    from .kg.links import anchor_stats

    return anchor_stats(_canonical_edges(sf_dir, with_anchor=True))


SQL_KG_ANCHOR_STATS = f"""
WITH {_SQL_LINKS_CTE},
ce AS (
  SELECT CASE j WHEN 0 THEN 'https://example.org/doc/' || t
                WHEN 1 THEN 'https://example.org/doc/' || t || '?id=' || t
                ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t
         END AS dst_url,
         CASE j WHEN 0 THEN 'ref ' || t
                WHEN 1 THEN 'see ' || t
                ELSE 'doc ' || t END AS anchor
  FROM e
)
SELECT dst_url, count(*) AS n_inlinks,
       count(DISTINCT anchor) AS n_anchors,
       min(anchor) AS top_anchor
FROM ce GROUP BY dst_url
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_link_graph": QueryDef(q_kg_link_graph, SQL_KG_LINK_GRAPH),
        "kg_link_canonical": QueryDef(q_kg_link_canonical, SQL_KG_LINK_CANONICAL),
        "kg_host_graph": QueryDef(q_kg_host_graph, SQL_KG_HOST_GRAPH),
        "kg_anchor_stats": QueryDef(q_kg_anchor_stats, SQL_KG_ANCHOR_STATS),
    }
)


# --------------------------------------------------------------------------
# wave 20: temporal snapshot, phrase search, seeded graph walk
# --------------------------------------------------------------------------

VALID_AT_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z, mid-corpus


def q_events_valid_at(sf_dir: str):
    """Temporal dimension snapshot: each user's state AS OF a fixed instant,
    read off the SCD-type-2 validity intervals (`extras/window.scd2_history`
    composition) with one stateless interval-containment filter — the
    time-travel query every versioned dimension table exists to answer."""
    from .extras.window import scd2_history

    ev = load(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    iv = scd2_history(ev, "user_id", "ts", "event_id", "event_type")

    def _at(batch: pa.Table) -> pa.Table:
        vf = batch.column("valid_from")
        vt = batch.column("valid_to")
        keep = pc.and_(
            pc.less_equal(vf, VALID_AT_US),
            pc.or_kleene(pc.is_null(vt), pc.greater(vt, VALID_AT_US)),
        )
        t = batch.filter(pc.fill_null(keep, False))
        return t.select(["user_id", "state"])

    return iv.map_batches(_at, batch_format="pyarrow")


SQL_EVENTS_VALID_AT = f"""
WITH s AS (SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT user_id, event_id, event_type AS state,
             CAST(epoch_us(ts) AS BIGINT) AS valid_from
      FROM s WHERE prev IS NULL OR prev <> event_type),
iv AS (SELECT user_id, state, valid_from,
              lead(valid_from) OVER (PARTITION BY user_id
                                     ORDER BY valid_from, event_id) AS valid_to
       FROM c)
SELECT user_id, state FROM iv
WHERE valid_from <= {VALID_AT_US}
  AND (valid_to IS NULL OR valid_to > {VALID_AT_US})
"""


PHRASE = ("batch", "batch")


def q_text_phrase_search(sf_dir: str):
    """Exact token-phrase occurrence counts per document — OVERLAPPING
    matches included (the phrase is self-overlapping by construction, which
    substring/regex counting undercounts). Vectorized shift-AND over the
    flattened token array (`extras/retrieval.phrase_match_counts`); the
    corpus streams, nothing shuffles."""
    from .extras.retrieval import phrase_match_counts

    docs = load(sf_dir, "documents", ["doc_id", "text"])
    return phrase_match_counts(docs, "text", "doc_id", PHRASE)


SQL_TEXT_PHRASE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
m AS (SELECT doc_id,
             CAST(len(list_filter(range(1, len(l)),
                                  i -> l[i] = '{PHRASE[0]}'
                                       AND l[i + 1] = '{PHRASE[1]}'))
                  AS BIGINT) AS n_matches
      FROM t)
SELECT doc_id, n_matches FROM m WHERE n_matches > 0
"""


WALK_SALT = 2026


def q_graph_walk_sample(sf_dir: str):
    """Two seeded uniform random-walk hops per page over the canonical link
    graph (the node2vec corpus-generation primitive): per node the sampled
    neighbor is the SplitMix64-argmin of its out-edges
    (`extras/graph.seeded_walk_step` — one min_per_key, no degree lookup,
    no rank materialization), hop 2 via one int-keyed hash join of the step
    table with itself."""
    from .extras.graph import seeded_walk_step
    from .util import hash_join

    edges = _canonical_edges(sf_dir)

    def _ints(batch: pa.Table) -> pa.Table:
        s = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("src_url"), r"/doc/(?P<d>\d+)"), "d"
            ),
            pa.int64(),
        )
        d = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("dst_url"), r"/doc/(?P<d>\d+)"), "d"
            ),
            pa.int64(),
        )
        return pa.table({"src": s, "dst": d})

    step = seeded_walk_step(
        edges.map_batches(_ints, batch_format="pyarrow"), "src", "dst",
        salt=WALK_SALT,
    ).materialize()
    a = step.rename_columns(["src", "hop1"])
    b = step.rename_columns(["hop1", "hop2"])
    return hash_join(a, b, on="hop1", join_type="inner").select_columns(
        ["src", "hop1", "hop2"]
    )


def _sql_walk() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain("p", "pk", WALK_SALT)
    return f"""
WITH {_SQL_LINKS_CTE},
ie AS (SELECT doc_id AS src, t AS dst FROM e),
p AS (SELECT src, dst, src * 4294967296 + dst AS pk FROM ie),
{chain},
st AS (SELECT src, dst FROM (
         SELECT src, dst,
                row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn
         FROM h3) WHERE rn = 1)
SELECT a.src AS src, a.dst AS hop1, b.dst AS hop2
FROM st a JOIN st b ON b.src = a.dst
"""


EXTRAS8_REGISTRY.update(
    {
        "events_valid_at": QueryDef(q_events_valid_at, SQL_EVENTS_VALID_AT),
        "text_phrase_search": QueryDef(q_text_phrase_search, SQL_TEXT_PHRASE),
        "graph_walk_sample": QueryDef(q_graph_walk_sample, _sql_walk()),
    }
)


# --------------------------------------------------------------------------
# wave 21: link-graph PageRank, boilerplate detection, stratified sampling
# --------------------------------------------------------------------------

def _int_link_edges(sf_dir: str):
    """The canonical hyperlink graph as int (src, dst) doc-id edges —
    multigraph semantics preserved (two distinct surface forms landing on
    the same target stay two edges, exactly as in the SQL edge CTE)."""
    edges = _canonical_edges(sf_dir)

    def _ints(batch: pa.Table) -> pa.Table:
        s = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("src_url"), r"/doc/(?P<d>\d+)"), "d"
            ),
            pa.int64(),
        )
        d = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("dst_url"), r"/doc/(?P<d>\d+)"), "d"
            ),
            pa.int64(),
        )
        return pa.table({"src": s, "dst": d})

    return edges.map_batches(_ints, batch_format="pyarrow")


def q_kg_link_pagerank(sf_dir: str):
    """Page-level PageRank over the EXTRACTED hyperlink graph (the classic
    web-authority signal, distinct from `kg_pagerank`'s entity-triple
    graph): 2 damped iterations of `extras/graph.pagerank_int` in exact
    int64 millionth-units; top-25 pages by (rank desc, node)."""
    from .extras.graph import pagerank_int

    ranks = pagerank_int(_int_link_edges(sf_dir), iterations=2)
    top = ranks.sort(["rank", "node"], descending=[True, False]).limit(25)
    return top.rename_columns({"rank": "pr"})


def _sql_link_pagerank(iterations: int = 2, scale: int = 1_000_000) -> str:
    base = (15 * scale) // 100
    ctes = [
        _SQL_LINKS_CTE.strip(),
        "edges AS (SELECT doc_id AS src, t AS dst FROM e)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"s{i} AS (SELECT eg.dst AS node, sum(r{i-1}.r // deg.d) AS s "
            f"FROM edges eg JOIN deg ON deg.src = eg.src "
            f"JOIN r{i-1} ON r{i-1}.node = eg.src GROUP BY eg.dst)"
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


BOILERPLATE_FRAC = (4, 5)  # term must appear in >= 4/5 of a source's docs


def q_corpus_boilerplate_terms(sf_dir: str):
    """Template/boilerplate detection (the RefinedWeb line-dedup shape at
    token granularity): terms present in >= 80% of a source's documents.
    Per batch the (source, doc, term) distinct is LOCAL (a document never
    spans rows), so partial per-(source, term) doc-counts fold through one
    `sum_per_key` over a tab-packed key; docs-per-source is a bounded
    broadcast. Integer 5·n >= 4·nd compare — no floats."""
    import numpy as np
    import pandas as pd

    from .extras.graph import sum_per_key
    from .extras.stats import exact_value_counts

    docs = load(sf_dir, "documents", ["doc_id", "source", "text"])

    def _pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        # batch-local distinct (doc, term): factorize the (parent, term)
        # pair via term codes — no object sort
        codes, uniq = pd.factorize(flat)
        key = parent.astype(np.int64) * len(uniq) + codes
        _, first = np.unique(key, return_index=True)
        k = np.char.add(
            np.char.add(src[parent[first]].astype("U"), "\t"),
            flat[first].astype("U"),
        )
        return pa.table(
            {
                "st": pa.array(k, pa.string()),
                "c": pa.array(np.ones(len(k), np.int64)),
            }
        )

    counts = sum_per_key(
        docs.map_batches(_pairs, batch_format="pyarrow"), "st", "c"
    )
    nd = {
        r["source"]: r["n"]
        for r in exact_value_counts(
            docs.select_columns(["source"]), "source"
        ).take_all()
    }
    num, den = BOILERPLATE_FRAC

    def _gate(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("st"), "\t")
        src = pc.list_element(parts, 0)
        term = pc.list_element(parts, 1)
        n = batch.column("c").to_numpy(zero_copy_only=False)
        nds = np.array([nd[s] for s in src.to_pylist()], np.int64)
        keep = den * n >= num * nds
        t = pa.table({"source": src, "term": term, "n_docs": pa.array(n, pa.int64())})
        return t.filter(pa.array(keep))

    return counts.map_batches(_gate, batch_format="pyarrow")


SQL_BOILERPLATE = f"""
WITH tok AS (SELECT DISTINCT source, doc_id,
                    unnest(string_split(text, ' ')) AS term
             FROM documents),
sc AS (SELECT source, count(DISTINCT doc_id) AS nd FROM documents GROUP BY source),
tc AS (SELECT source, term, count(*) AS n FROM tok GROUP BY source, term)
SELECT tc.source, term, CAST(n AS BIGINT) AS n_docs
FROM tc JOIN sc USING (source)
WHERE {BOILERPLATE_FRAC[1]} * n >= {BOILERPLATE_FRAC[0]} * nd
"""


SAMPLE_K = 25
SAMPLE_SALT = 777


def q_corpus_stratified_sample(sf_dir: str):
    """Deterministic fixed-k-per-stratum sample (balanced subcorpus
    construction): the k docs of each source with the smallest
    SplitMix64(doc_id) — a seeded uniform draw that is reproducible at any
    parallelism and needs no per-group UDF (`util.topk_per_key` ascending,
    doc_id tie-break)."""
    from .extras.shuffle import sm64_key
    from .util import topk_per_key

    docs = load(sf_dir, "documents", ["doc_id", "source"])

    def _h(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = sm64_key(ids, SAMPLE_SALT)
        return pa.table(
            {
                "source": batch.column("source").combine_chunks(),
                "doc_id": batch.column("doc_id").combine_chunks(),
                "h": pa.array(h, pa.uint64()),
            }
        )

    picked = topk_per_key(
        docs.map_batches(_h, batch_format="pyarrow"),
        "source", "h", SAMPLE_K, descending=False, tie_col="doc_id",
    )
    return picked.select_columns(["source", "doc_id"])


def _sql_stratified_sample() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain("documents", "doc_id", SAMPLE_SALT)
    return f"""
WITH {chain}
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h3) WHERE rn <= {SAMPLE_K}
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_link_pagerank": QueryDef(q_kg_link_pagerank, _sql_link_pagerank()),
        "corpus_boilerplate_terms": QueryDef(
            q_corpus_boilerplate_terms, SQL_BOILERPLATE
        ),
        "corpus_stratified_sample": QueryDef(
            q_corpus_stratified_sample, _sql_stratified_sample()
        ),
    }
)


# --------------------------------------------------------------------------
# wave 22: crawl frontier, anchor naming, redirect-chain resolution
# --------------------------------------------------------------------------

def q_kg_crawl_frontier(sf_dir: str):
    """Crawl-frontier discovery: canonical link targets NOT yet in the page
    table, ranked by in-link evidence — the queue a crawler feeds on.
    Distinct-dst counts fold first (frontier-sized), then ONE hash-partition
    anti join against the corpus-sized crawled-url set (broadcast=False: the
    right side is the corpus, never gathered to the driver)."""
    from .extras.joins import semi_anti_join
    from .extras.stats import exact_value_counts
    from .kg.pages import synthesize_pages

    inlinks = exact_value_counts(
        _canonical_edges(sf_dir).select_columns(["dst_url"]), "dst_url"
    ).rename_columns(["url", "n_inlinks"])
    crawled = synthesize_pages(sf_dir).select_columns(["url"])
    return semi_anti_join(
        inlinks, crawled, on="url", anti=True, broadcast=False
    )


SQL_KG_CRAWL_FRONTIER = f"""
WITH {_SQL_LINKS_CTE},
ce AS (
  SELECT CASE j WHEN 0 THEN 'https://example.org/doc/' || t
                WHEN 1 THEN 'https://example.org/doc/' || t || '?id=' || t
                ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t
         END AS dst_url
  FROM e
)
SELECT dst_url AS url, count(*) AS n_inlinks FROM ce
WHERE dst_url NOT IN (SELECT 'https://example.org/doc/' || doc_id FROM documents)
GROUP BY dst_url
"""


def q_kg_anchor_naming(sf_dir: str):
    """Entity naming from anchor-text evidence: the majority anchor per
    canonical target (votes desc, anchor asc tie) — how web-KG construction
    picks surface names for linked pages. (dst, anchor) vote counts via one
    packed-key `exact_value_counts`, argmax via `topk_per_key` k=1."""
    from .extras.stats import exact_value_counts
    from .util import topk_per_key

    edges = _canonical_edges(sf_dir, with_anchor=True)

    def _pack(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.fill_null(batch.column("dst_url"), ""),
            pc.fill_null(batch.column("anchor"), ""),
            "\t",
        )
        return pa.table({"da": k})

    votes = exact_value_counts(
        edges.map_batches(_pack, batch_format="pyarrow"), "da"
    )

    def _unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("da"), "\t")
        return pa.table(
            {
                "dst_url": pc.list_element(parts, 0),
                "anchor": pc.list_element(parts, 1),
                "n_votes": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    pairs = votes.map_batches(_unpack, batch_format="pyarrow")
    top = topk_per_key(
        pairs, "dst_url", "n_votes", 1, descending=True, tie_col="anchor"
    )
    return top.rename_columns({"anchor": "name"})


SQL_KG_ANCHOR_NAMING = f"""
WITH {_SQL_LINKS_CTE},
ce AS (
  SELECT CASE j WHEN 0 THEN 'https://example.org/doc/' || t
                WHEN 1 THEN 'https://example.org/doc/' || t || '?id=' || t
                ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t
         END AS dst_url,
         CASE j WHEN 0 THEN 'ref ' || t
                WHEN 1 THEN 'see ' || t
                ELSE 'doc ' || t END AS anchor
  FROM e
),
v AS (SELECT dst_url, anchor, count(*) AS n_votes FROM ce GROUP BY dst_url, anchor)
SELECT dst_url, anchor AS name, CAST(n_votes AS BIGINT) AS n_votes FROM (
  SELECT *, row_number() OVER (PARTITION BY dst_url
                               ORDER BY n_votes DESC, anchor) AS rn
  FROM v) WHERE rn = 1
"""


# deterministic redirect fixture: every doc_id d with d % 5 == 1 owns a
# 3-hop alias chain  r/<d>/2 -> r/<d>/1 -> r/<d>/0 -> doc/<d>
_R = "https://example.org/r/"
_D = "https://example.org/doc/"


def _redirect_edges(sf_dir: str):
    docs = load(sf_dir, "documents", ["doc_id"])

    def _chain(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids % 5 == 1]
        s = ids.astype("U20")
        src = np.concatenate(
            [
                np.char.add(np.char.add(_R, s), "/2"),
                np.char.add(np.char.add(_R, s), "/1"),
                np.char.add(np.char.add(_R, s), "/0"),
            ]
        )
        dst = np.concatenate(
            [
                np.char.add(np.char.add(_R, s), "/1"),
                np.char.add(np.char.add(_R, s), "/0"),
                np.char.add(_D, s),
            ]
        )
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    return docs.map_batches(_chain, batch_format="pyarrow")


def q_kg_redirect_resolve(sf_dir: str):
    """HTTP-redirect chain resolution (the url-alias closure that feeds
    crawl dedup): every redirect source mapped to its FINAL target by
    pointer doubling — ``rounds`` self-joins of the (src -> dst) map, each
    round squaring the followed distance, so chains up to 2^rounds resolve
    in O(log chain) edge-sized joins; no driver-side walking."""
    from .util import hash_join

    m = _redirect_edges(sf_dir).materialize()
    cur = m
    for _ in range(2):  # chains of length <= 4
        nxt = cur.rename_columns(["hop", "dst2"])
        j = hash_join(
            cur.rename_columns(["src", "hop"]), nxt, on="hop", join_type="left_outer"
        )

        def _step(batch: pa.Table) -> pa.Table:
            d2 = batch.column("dst2")
            return pa.table(
                {
                    "src": batch.column("src").combine_chunks(),
                    "dst": pc.coalesce(d2, batch.column("hop")).combine_chunks(),
                }
            )

        cur = j.map_batches(_step, batch_format="pyarrow").materialize()
    return cur.rename_columns({"dst": "final_url"})


SQL_KG_REDIRECT = f"""
WITH RECURSIVE d AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 1),
redirects AS (
  SELECT '{_R}' || doc_id || '/2' AS src, '{_R}' || doc_id || '/1' AS dst FROM d
  UNION ALL
  SELECT '{_R}' || doc_id || '/1', '{_R}' || doc_id || '/0' FROM d
  UNION ALL
  SELECT '{_R}' || doc_id || '/0', '{_D}' || doc_id FROM d
),
r(src, cur) AS (
  SELECT src, dst FROM redirects
  UNION ALL
  SELECT r.src, e.dst FROM r JOIN redirects e ON e.src = r.cur
)
SELECT src, cur AS final_url FROM r
WHERE cur NOT IN (SELECT src FROM redirects)
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_crawl_frontier": QueryDef(q_kg_crawl_frontier, SQL_KG_CRAWL_FRONTIER),
        "kg_anchor_naming": QueryDef(q_kg_anchor_naming, SQL_KG_ANCHOR_NAMING),
        "kg_redirect_resolve": QueryDef(q_kg_redirect_resolve, SQL_KG_REDIRECT),
    }
)


# --------------------------------------------------------------------------
# wave 23: KG schema profiling, negative sampling, CSV interchange
# --------------------------------------------------------------------------

def q_kg_predicate_stats(sf_dir: str):
    """KG schema profile: per predicate the triple count, distinct-subject
    and distinct-object counts (the ontology-summary report that guides
    partitioning and SHACL authoring). Distinct counts via `distinct_rows`
    sort-scans + `exact_value_counts` folds; the three PREDICATE-sized
    count tables merge on the driver (bounded by schema size, not data —
    a hash join here trips Ray's empty-partition schema-loss quirk at high
    partition counts and is overkill for a schema-profile output)."""
    from .extras.stats import exact_value_counts
    from .kg.pipeline import kg_pipeline
    from .util import distinct_rows

    tri = kg_pipeline(sf_dir, anonymize=False).triples.select_columns(
        ["subj", "pred", "obj"]
    )
    n_tri = exact_value_counts(tri.select_columns(["pred"]), "pred").rename_columns(
        ["pred", "n_triples"]
    )
    n_subj = exact_value_counts(
        distinct_rows(tri.select_columns(["pred", "subj"]), ["pred", "subj"])
        .select_columns(["pred"]),
        "pred",
    ).rename_columns(["pred", "n_subjects"])
    n_obj = exact_value_counts(
        distinct_rows(tri.select_columns(["pred", "obj"]), ["pred", "obj"])
        .select_columns(["pred"]),
        "pred",
    ).rename_columns(["pred", "n_objects"])
    t = {r["pred"]: r["n_triples"] for r in n_tri.take_all()}
    s = {r["pred"]: r["n_subjects"] for r in n_subj.take_all()}
    o = {r["pred"]: r["n_objects"] for r in n_obj.take_all()}
    preds = sorted(t)
    return pa.table(
        {
            "pred": pa.array(preds, pa.string()),
            "n_triples": pa.array([t[p] for p in preds], pa.int64()),
            "n_subjects": pa.array([s[p] for p in preds], pa.int64()),
            "n_objects": pa.array([o[p] for p in preds], pa.int64()),
        }
    )


SQL_KG_PREDICATE_STATS = f"""
WITH canon AS ({SQL_KG_CANONICAL_REF})
SELECT pred, count(*) AS n_triples,
       count(DISTINCT subj) AS n_subjects,
       count(DISTINCT obj) AS n_objects
FROM canon GROUP BY pred
"""


NEG_SALT = 424242


def q_kg_negative_samples(sf_dir: str):
    """Corrupted-tail negative sampling for KG-embedding training (the
    TransE/DistMult data-prep primitive): for every `basedIn` triple, a
    seeded uniform draw from the predicate's object vocabulary, skip-if-
    positive (+1 cyclic). The vocabulary is a distinct fold broadcast once
    (bounded by the predicate's object domain); the corpus streams through
    one vectorized gather — no shuffle, reproducible at any parallelism."""
    import numpy as np

    from .extras.shuffle import sm64_key
    from .kg.pipeline import kg_pipeline
    from .util import distinct_rows

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _based(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("pred"), "basedIn"))
        return pa.table(
            {"subj": t.column("subj").combine_chunks(), "obj": t.column("obj").combine_chunks()}
        )

    edges = tri.map_batches(_based, batch_format="pyarrow")
    vocab = np.sort(
        np.array(
            [r["obj"] for r in distinct_rows(
                edges.select_columns(["obj"]), ["obj"]
            ).take_all()],
            dtype=object,
        )
    )
    nv = len(vocab)
    pos_of = {v: i for i, v in enumerate(vocab)}

    def _neg(batch: pa.Table) -> pa.Table:
        subj = batch.column("subj")
        k = pc.cast(
            pc.struct_field(pc.extract_regex(subj, r"urn:cust:(?P<k>\d+)"), "k"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        idx = (sm64_key(k, NEG_SALT) % np.uint64(nv)).astype(np.int64)
        true_idx = np.array(
            [pos_of[o] for o in batch.column("obj").to_pylist()], np.int64
        )
        idx = np.where(idx == true_idx, (idx + 1) % nv, idx)
        return pa.table(
            {
                "subj": subj.combine_chunks(),
                "pred": pa.array(["basedIn"] * len(k), pa.string()),
                "pos_obj": batch.column("obj").combine_chunks(),
                "neg_obj": pa.array(vocab[idx], pa.string()),
            }
        )

    return edges.map_batches(_neg, batch_format="pyarrow")


def _sql_negative_samples() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain("b", "k", NEG_SALT)
    return f"""
WITH b AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer),
u AS (SELECT 'urn:nation:' || n_nationkey AS v,
             row_number() OVER (ORDER BY 'urn:nation:' || n_nationkey) - 1 AS idx
      FROM nation),
c AS (SELECT count(*) AS nv FROM nation),
{chain},
pick AS (
  SELECT h3.k, h3.nk, CAST(h3.h % c.nv AS BIGINT) AS idx0,
         (SELECT idx FROM u WHERE v = 'urn:nation:' || h3.nk) AS tidx, c.nv
  FROM h3, c
),
adj AS (SELECT k, nk,
               CASE WHEN idx0 = tidx THEN (idx0 + 1) % nv ELSE idx0 END AS idx
        FROM pick)
SELECT 'urn:cust:' || k AS subj, 'basedIn' AS pred,
       'urn:nation:' || nk AS pos_obj,
       (SELECT v FROM u WHERE u.idx = adj.idx) AS neg_obj
FROM adj
"""


def q_corpus_csv_roundtrip(sf_dir: str):
    """documents -> sharded CSV export (`Dataset.write_csv`) ->
    `read_csv_documents` back -> (doc_id, text). Identity oracle: CSV
    quoting/escaping must round-trip text exactly, ids survive as ints."""
    import shutil
    import tempfile

    from .sources.csvsrc import read_csv_documents

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out_dir = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        docs.write_csv(out_dir)
        back = read_csv_documents(out_dir).select_columns(["doc_id", "text"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_CSV_ROUNDTRIP = "SELECT doc_id, text FROM documents"


EXTRAS8_REGISTRY.update(
    {
        "kg_predicate_stats": QueryDef(q_kg_predicate_stats, SQL_KG_PREDICATE_STATS),
        "kg_negative_samples": QueryDef(
            q_kg_negative_samples, _sql_negative_samples()
        ),
        "corpus_csv_roundtrip": QueryDef(q_corpus_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    }
)


# --------------------------------------------------------------------------
# wave 24: dedup observability + bigram-LM quality scoring
# --------------------------------------------------------------------------

def q_dedup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram (dedup observability: how much of the
    corpus sits in how-big duplicate families): minhash pairs -> connected
    components (`cluster_keepers`, singletons included) -> per-keeper sizes
    -> counts-of-counts. Two `exact_value_counts` sort-scan folds; the
    second operates on cluster-count-sized data."""
    from .extras.dedup import cluster_keepers, minhash_lsh_pairs
    from .extras.stats import exact_value_counts
    from .queries_extras import _corpus_with_dups

    corpus = _corpus_with_dups(sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=32, verify_threshold=0.5
    ).select_columns(["id_a", "id_b"])
    keepers = cluster_keepers(corpus, pairs, id_col="doc_id")
    sizes = exact_value_counts(
        keepers.select_columns(["keeper_id"]), "keeper_id"
    ).rename_columns(["keeper_id", "cluster_size"])
    hist = exact_value_counts(
        sizes.select_columns(["cluster_size"]), "cluster_size"
    ).rename_columns(["cluster_size", "n_clusters"])
    return hist


def _sql_cluster_sizes() -> str:
    from .queries_extras import _SQL_DUP_CTES

    return f"""
WITH RECURSIVE {_SQL_DUP_CTES},
edges AS (SELECT id_a AS a, id_b AS b FROM dup
          UNION ALL SELECT id_b, id_a FROM dup),
reach(id, r) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
keep AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id),
sz AS (SELECT keeper, count(*) AS cluster_size FROM keep GROUP BY keeper)
SELECT cluster_size, count(*) AS n_clusters FROM sz GROUP BY cluster_size
"""


def q_text_bigram_nll(sf_dir: str):
    """Bigram conditional-LM scoring (`extras/textstats.bigram_nll`): each
    adjacent pair contributes floor(1e6·(ln h(w1) − ln c(w1,w2))) micro-nats
    (h = history counts, so P(·|w1) sums to 1); integer per-doc sums are
    reduction-order-proof."""
    from .extras.textstats import bigram_nll

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return bigram_nll(ds, "text", "doc_id")


SQL_TEXT_BIGRAM_NLL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
       FROM tok, UNNEST(range(1, len(arr))) AS r(i)),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
h AS (SELECT w1, count(*) AS hc FROM bg GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(CAST(floor(1000000.0 * (ln(CAST(hc AS DOUBLE))
                                        - ln(CAST(c AS DOUBLE)))) AS BIGINT))
            AS BIGINT) AS nll_micro
FROM bg JOIN c2 USING (w1, w2) JOIN h USING (w1)
GROUP BY doc_id
"""


EXTRAS8_REGISTRY.update(
    {
        "dedup_cluster_sizes": QueryDef(q_dedup_cluster_sizes, _sql_cluster_sizes()),
        "text_bigram_nll": QueryDef(q_text_bigram_nll, SQL_TEXT_BIGRAM_NLL),
    }
)


# --------------------------------------------------------------------------
# wave 25: rolling DAU, graph reciprocity, global id assignment
# --------------------------------------------------------------------------

def q_events_rolling_dau(sf_dir: str):
    """Daily-active-users with a trailing 7-day VALUE-range window (the
    engagement dashboard primitive): distinct (day, user) via one sort-scan
    fold, per-day counts via a second, then the rolling sum over the
    DAY-DOMAIN-sized count table on the driver (bounded by corpus span in
    days, not corpus size) with searchsorted value-range edges — gaps in
    the calendar behave like SQL RANGE, not ROWS."""
    import numpy as np

    from .extras.stats import exact_value_counts
    from .util import distinct_rows

    ev = load(sf_dir, "events", ["user_id", "ts"])

    def _day(batch: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), 86_400_000_000),
            pa.int64(),
        )
        return pa.table(
            {"day": d, "user_id": batch.column("user_id").combine_chunks()}
        )

    du = distinct_rows(
        ev.map_batches(_day, batch_format="pyarrow"), ["day", "user_id"]
    )
    daily = exact_value_counts(du.select_columns(["day"]), "day").rename_columns(
        ["day", "dau"]
    )
    rows = sorted((r["day"], r["dau"]) for r in daily.take_all())
    days = np.array([r[0] for r in rows], np.int64)
    dau = np.array([r[1] for r in rows], np.int64)
    cum = np.concatenate([[0], np.cumsum(dau)])
    lo = np.searchsorted(days, days - 6, side="left")
    dau7 = cum[np.arange(1, len(days) + 1)] - cum[lo]
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "dau": pa.array(dau, pa.int64()),
            "dau_7d": pa.array(dau7, pa.int64()),
        }
    )


SQL_EVENTS_ROLLING_DAU = """
WITH du AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   user_id
            FROM events),
d AS (SELECT day, count(*) AS dau FROM du GROUP BY day)
SELECT day, CAST(dau AS BIGINT) AS dau,
       CAST(sum(dau) OVER (ORDER BY day
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS dau_7d
FROM d
"""


def q_graph_reciprocity(sf_dir: str):
    """Hyperlink reciprocity (mutual-link rate, the web-spam / community
    signal): distinct int edges packed into one int64, probed against their
    own swapped set with a hash-partition semi join (broadcast=False — the
    edge set never gathers). Output: one row (n_edges, n_reciprocal)."""
    import numpy as np

    from .extras.joins import semi_anti_join
    from .util import distinct_rows

    edges = distinct_rows(_int_link_edges(sf_dir), ["src", "dst"])

    def _pack(flip: bool):
        def _p(batch: pa.Table) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            a, b = (d, s) if flip else (s, d)
            return pa.table({"pk": pa.array((a << np.int64(32)) | b, pa.int64())})

        return _p

    fwd = edges.map_batches(_pack(False), batch_format="pyarrow").materialize()
    rev = edges.map_batches(_pack(True), batch_format="pyarrow")
    recip = semi_anti_join(fwd, rev, on="pk", broadcast=False)
    return pa.table(
        {
            "n_edges": pa.array([fwd.count()], pa.int64()),
            "n_reciprocal": pa.array([recip.count()], pa.int64()),
        }
    )


SQL_GRAPH_RECIPROCITY = f"""
WITH {_SQL_LINKS_CTE},
de AS (SELECT DISTINCT doc_id AS src, t AS dst FROM e)
SELECT (SELECT count(*) FROM de) AS n_edges,
       (SELECT count(*) FROM de a
        WHERE EXISTS (SELECT 1 FROM de b
                      WHERE b.src = a.dst AND b.dst = a.src)) AS n_reciprocal
"""


def q_corpus_assign_ids(sf_dir: str):
    """Global dense id assignment (zipWithIndex) in (source, doc_id) order:
    ONE narrow range sort, per-block offsets from driver-folded block row
    counts (one int per block — no data moves twice), new_id = offset +
    arange within the block. The re-keying primitive every corpus merge
    needs."""
    import numpy as np
    import ray

    from .util import coalesce_blocks

    docs = load(sf_dir, "documents", ["doc_id", "source"])
    s = coalesce_blocks(docs.materialize()).sort(["source", "doc_id"]).materialize()
    refs = s.to_arrow_refs()
    counts = ray.get(
        [ray.remote(num_cpus=0.25)(lambda t: t.num_rows).remote(r) for r in refs]
    )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.5)
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id").combine_chunks(),
                "new_id": pa.array(off + np.arange(t.num_rows, dtype=np.int64)),
            }
        )

    import ray.data as rd

    return rd.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


SQL_CORPUS_ASSIGN_IDS = """
SELECT doc_id,
       row_number() OVER (ORDER BY source, doc_id) - 1 AS new_id
FROM documents
"""


EXTRAS8_REGISTRY.update(
    {
        "events_rolling_dau": QueryDef(q_events_rolling_dau, SQL_EVENTS_ROLLING_DAU),
        "graph_reciprocity": QueryDef(q_graph_reciprocity, SQL_GRAPH_RECIPROCITY),
        "corpus_assign_ids": QueryDef(q_corpus_assign_ids, SQL_CORPUS_ASSIGN_IDS),
    }
)


# --------------------------------------------------------------------------
# wave 26: ntile bucketing + equal-width histogram
# --------------------------------------------------------------------------

NTILE_G = 10


def q_stats_ntile(sf_dir: str):
    """Exact ntile(10) over (c_acctbal, c_custkey) — equal-frequency
    bucketing with SQL's remainder rule (first k%g tiles get the extra
    row). ONE narrow (value, id) range sort, g−1 boundary POINT LOOKUPS
    (`util.SortedColumn.rows_at_ranks` — never a rank materialization),
    boundaries broadcast into a stateless lexicographic-searchsorted
    assignment pass over the unsorted table (the `stages/generalization`
    machinery with ntile's start ranks)."""
    import numpy as np

    from .stages.generalization import assign_buckets_np
    from .util import sorted_column

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    sc = sorted_column(
        cust, "c_acctbal", "c_custkey",
        lambda c: pc.cast(c.combine_chunks(), pa.float64()),
    )
    k, g = sc.total, NTILE_G
    base, rem = k // g, k % g
    starts = [b * base + min(b, rem) for b in range(1, g)]
    cut = sc.rows_at_ranks(starts)
    cut_v = cut.column("c_acctbal").to_numpy(zero_copy_only=False)
    cut_id = cut.column("c_custkey").to_numpy(zero_copy_only=False)

    def _assign(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("c_acctbal")))
        v = t.column("c_acctbal").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t.column("c_custkey").to_numpy(zero_copy_only=False)
        tile = assign_buckets_np(v, ids, cut_v, cut_id).astype(np.int64) + 1
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").combine_chunks(),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return cust.map_batches(_assign, batch_format="pyarrow")


SQL_STATS_NTILE = f"""
SELECT c_custkey,
       CAST(ntile({NTILE_G}) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS tile
FROM customer WHERE c_acctbal IS NOT NULL
"""


HIST_BINS = 16


def q_stats_histogram(sf_dir: str):
    """Equal-WIDTH histogram of o_totalprice in integer cents (the
    profiling sibling of the equal-frequency generalization buckets): one
    streaming min/max fold, then per-batch `np.bincount` partials over the
    broadcast bin edges folded on the driver (bin-count-sized). Bin rule
    replicated exactly: idx = clamp((v−lo)·B / (hi−lo+1), 0, B−1) in pure
    int64 — no float division anywhere."""
    import numpy as np

    orders = load(sf_dir, "orders", ["o_totalprice"])

    def _cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"v": c})

    cents = orders.map_batches(_cents, batch_format="pyarrow").materialize()
    import ray

    agg = cents.aggregate(
        *[a for a in (ray.data.aggregate.Min("v"), ray.data.aggregate.Max("v"))]
    )
    lo, hi = int(agg["min(v)"]), int(agg["max(v)"])
    span = hi - lo + 1

    def _bins(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        idx = (v - lo) * HIST_BINS // span
        counts = np.bincount(idx, minlength=HIST_BINS).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(HIST_BINS, dtype=np.int64)),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = cents.map_batches(_bins, batch_format="pyarrow").take_all()
    total = np.zeros(HIST_BINS, np.int64)
    for r in parts:
        total[r["bin"]] += r["n"]
    bins = np.arange(HIST_BINS, dtype=np.int64)
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "lo_cents": pa.array(lo + bins * span // HIST_BINS, pa.int64()),
            "n": pa.array(total, pa.int64()),
        }
    )


SQL_STATS_HISTOGRAM = f"""
WITH c AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v FROM orders),
mm AS (SELECT min(v) AS lo, max(v) AS hi, max(v) - min(v) + 1 AS span FROM c),
b AS (SELECT i AS bin FROM UNNEST(range(0, {HIST_BINS})) AS r(i)),
h AS (SELECT (v - lo) * {HIST_BINS} // span AS bin, count(*) AS n
      FROM c, mm GROUP BY 1)
SELECT b.bin, mm.lo + b.bin * mm.span // {HIST_BINS} AS lo_cents,
       COALESCE(h.n, 0) AS n
FROM b LEFT JOIN h USING (bin), mm
"""


EXTRAS8_REGISTRY.update(
    {
        "stats_ntile": QueryDef(q_stats_ntile, SQL_STATS_NTILE),
        "stats_histogram": QueryDef(q_stats_histogram, SQL_STATS_HISTOGRAM),
    }
)


# --------------------------------------------------------------------------
# wave 27: IFP sameAs candidates, incremental view maintenance, hive layout
# --------------------------------------------------------------------------

def q_kg_ifp_candidates(sf_dir: str):
    """Inverse-functional-property key inference (the silk/dedupe
    entity-resolution rule): two subjects sharing the SAME normalized value
    of an IFP-like predicate become owl:sameAs candidates — the key is the
    balance BAND floor(balance/100) (IFP matching always runs on normalized
    keys: phones strip punctuation, emails lowercase; raw doubles would
    never collide). Reuses `extras/joins.grouped_pair_counts` — distinct
    (value, subj) rows, sorted contiguous-run triangle expansion per value,
    packed-key fold; no self-join, quadratic guard on pathological value
    groups."""
    from .extras.joins import grouped_pair_counts
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _bal(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("pred"), "hasAccountBalance"))
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(t.column("subj"), r"urn:cust:(?P<k>\d+)"), "k"
            ),
            pa.int64(),
        )
        band = pc.cast(
            pc.floor(pc.divide(pc.cast(t.column("obj"), pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({"val": band, "subj": k})

    pairs = grouped_pair_counts(
        tri.map_batches(_bal, batch_format="pyarrow"), "val", "subj",
        min_support=1,
    )

    def _iri(batch: pa.Table) -> pa.Table:
        def f(col):
            return pc.binary_join_element_wise(
                "urn:cust:", pc.cast(batch.column(col), pa.string()), ""
            )

        return pa.table(
            {
                "subj_a": f("item_a"),
                "subj_b": f("item_b"),
                "n_shared": batch.column("n").combine_chunks(),
            }
        )

    return pairs.map_batches(_iri, batch_format="pyarrow")


SQL_KG_IFP = """
WITH v AS (SELECT DISTINCT CAST(floor(c_acctbal / 100.0) AS BIGINT) AS val,
                  c_custkey AS k
           FROM customer WHERE c_acctbal IS NOT NULL)
SELECT 'urn:cust:' || a.k AS subj_a, 'urn:cust:' || b.k AS subj_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM v a JOIN v b ON a.val = b.val AND a.k < b.k
GROUP BY a.k, b.k
"""


def q_kg_incremental_degree(sf_dir: str):
    """Incremental materialized-view maintenance: entity degree counts
    refreshed from a delta WITHOUT rescanning the base — base counts and
    delta counts (both `sum_per_key` folds) union into one final
    count-sized `sum_per_key`. The oracle pins equivalence to a full
    recompute over base ∪ delta (the invariant that makes the shortcut
    legal). Base = subjects of customer triples; delta = nation triples."""
    from .extras.graph import sum_per_key
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _deg(pred_filter):
        def _f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pred_filter(batch))
            import numpy as np

            return pa.table(
                {
                    "node": t.column("subj").combine_chunks(),
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )

        return _f

    base = sum_per_key(
        tri.map_batches(
            _deg(lambda b: pc.starts_with(b.column("subj"), "urn:cust:")),
            batch_format="pyarrow",
        ),
        "node", "c",
    )
    delta = sum_per_key(
        tri.map_batches(
            _deg(lambda b: pc.starts_with(b.column("subj"), "urn:nation:")),
            batch_format="pyarrow",
        ),
        "node", "c",
    )
    merged = sum_per_key(base.union(delta), "node", "c")
    return merged.rename_columns(["node", "degree"])


SQL_KG_INCR_DEGREE = f"""
WITH canon AS ({SQL_KG_CANONICAL_REF})
SELECT subj AS node, count(*) AS degree FROM canon GROUP BY subj
"""


def q_corpus_partitioned_write(sf_dir: str):
    """Hive-partitioned sink + pruned read-back (the resumable-output
    layout: one directory per partition key, failed runs skip finished
    partitions; readers touch ONLY the partition they ask for):
    `write_parquet(partition_cols=['lang'])`, then a read of the single
    `lang=en` directory — the oracle pins that the pruned read equals the
    filtered table."""
    import shutil
    import tempfile

    import ray.data as rd

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="hive_rt_")
    try:
        docs.write_parquet(out_dir, partition_cols=["lang"])
        back = rd.read_parquet(f"{out_dir}/lang=en").select_columns(
            ["doc_id", "text"]
        )
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_PARTITIONED_WRITE = "SELECT doc_id, text FROM documents WHERE lang = 'en'"


EXTRAS8_REGISTRY.update(
    {
        "kg_ifp_candidates": QueryDef(q_kg_ifp_candidates, SQL_KG_IFP),
        "kg_incremental_degree": QueryDef(
            q_kg_incremental_degree, SQL_KG_INCR_DEGREE
        ),
        "corpus_partitioned_write": QueryDef(
            q_corpus_partitioned_write, SQL_PARTITIONED_WRITE
        ),
    }
)


# --------------------------------------------------------------------------
# wave 28: skyline (Pareto frontier) + grouping sets
# --------------------------------------------------------------------------

def q_orders_skyline(sf_dir: str):
    """Skyline / Pareto frontier of orders over (price, date) — rows no
    other row weakly dominates with one strict inequality (the multi-
    criteria shortlist operator). Distributed by the skyline-of-skylines
    identity: per-block VECTORIZED local skylines (sort desc + running
    maxima, no row loop), then one final pass over the partials (frontier-
    sized, orders of magnitude below the input; duplicates of a frontier
    point all survive, as in SQL's NOT EXISTS form)."""
    import numpy as np

    orders = load(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def _prep(batch: pa.Table) -> pa.Table:
        p = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        d = pc.divide(
            pc.cast(batch.column("o_orderdate"), pa.int64()), 86_400_000_000
        )
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").combine_chunks(),
                "price_cents": p,
                "day": d,
            }
        )

    def _skyline_np(p: np.ndarray, d: np.ndarray) -> np.ndarray:
        """Boolean keep mask: not weakly-dominated-with-a-strict-part."""
        order = np.lexsort((-d, -p))  # price desc, then date desc
        ps, ds = p[order], d[order]
        n = len(ps)
        keep_sorted = np.ones(n, dtype=bool)
        if n:
            # best date among STRICTLY higher prices: prefix max over the
            # previous price groups
            grp_start = np.ones(n, dtype=bool)
            grp_start[1:] = ps[1:] != ps[:-1]
            # running max date up to end of previous group
            run_max = np.maximum.accumulate(ds)
            # for each row, max date over all strictly-higher-price rows
            prev_group_end = np.maximum.accumulate(
                np.where(grp_start, np.arange(n) - 1, -1)
            )
            hi_max = np.where(prev_group_end >= 0, run_max[np.maximum(prev_group_end, 0)], np.iinfo(np.int64).min)
            # dominated by a strictly-higher-price row with date >= mine
            dom_hi = hi_max >= ds
            # dominated by an equal-price row with a strictly greater date:
            # within a price group (sorted date desc) that's any non-first
            # row whose date < the group's first date
            grp_first_idx = np.maximum.accumulate(np.where(grp_start, np.arange(n), 0))
            dom_eq = ds < ds[grp_first_idx]
            keep_sorted = ~(dom_hi | dom_eq)
        keep = np.zeros(n, dtype=bool)
        keep[order] = keep_sorted
        return keep

    def _local(batch: pa.Table) -> pa.Table:
        p = batch.column("price_cents").to_numpy(zero_copy_only=False)
        d = batch.column("day").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_skyline_np(p, d)))

    partials = (
        orders.map_batches(_prep, batch_format="pyarrow")
        .map_batches(_local, batch_format="pyarrow")
        .take_all()
    )
    p = np.array([r["price_cents"] for r in partials], np.int64)
    d = np.array([r["day"] for r in partials], np.int64)
    k = np.array([r["o_orderkey"] for r in partials], np.int64)
    m = _skyline_np(p, d)
    return pa.table(
        {
            "o_orderkey": pa.array(k[m], pa.int64()),
            "price_cents": pa.array(p[m], pa.int64()),
            "day": pa.array(d[m], pa.int64()),
        }
    )


SQL_ORDERS_SKYLINE = """
WITH c AS (SELECT o_orderkey,
                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
                  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
           FROM orders)
SELECT o_orderkey, price_cents, day FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.price_cents >= a.price_cents AND b.day >= a.day
    AND (b.price_cents > a.price_cents OR b.day > a.day)
)
"""


def q_events_grouping_sets(sf_dir: str):
    """GROUPING SETS ((event_type), (day)): two independent bounded-domain
    count folds unioned with a NULL filler column each — the multi-
    dimensional report shape without a CUBE shuffle."""
    from .extras.stats import exact_value_counts

    ev = load(sf_dir, "events", ["event_type", "ts"])

    def _day(batch: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), 86_400_000_000),
            pa.int64(),
        )
        return pa.table(
            {"event_type": batch.column("event_type").combine_chunks(), "day": d}
        )

    base = ev.map_batches(_day, batch_format="pyarrow").materialize()
    by_type = exact_value_counts(base.select_columns(["event_type"]), "event_type")

    def _t(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type").combine_chunks(),
                "day": pa.nulls(batch.num_rows, pa.int64()),
                "n": batch.column("n").combine_chunks(),
            }
        )

    by_day = exact_value_counts(base.select_columns(["day"]), "day")

    def _d(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": pa.nulls(batch.num_rows, pa.string()),
                "day": batch.column("day").combine_chunks(),
                "n": batch.column("n").combine_chunks(),
            }
        )

    return by_type.map_batches(_t, batch_format="pyarrow").union(
        by_day.map_batches(_d, batch_format="pyarrow")
    )


SQL_EVENTS_GROUPING_SETS = """
WITH b AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events)
SELECT event_type, day, count(*) AS n
FROM b GROUP BY GROUPING SETS ((event_type), (day))
"""


EXTRAS8_REGISTRY.update(
    {
        "orders_skyline": QueryDef(q_orders_skyline, SQL_ORDERS_SKYLINE),
        "events_grouping_sets": QueryDef(
            q_events_grouping_sets, SQL_EVENTS_GROUPING_SETS
        ),
    }
)


# --------------------------------------------------------------------------
# wave 29: SPARQL CONSTRUCT + DESCRIBE-style subgraph extraction
# --------------------------------------------------------------------------

def q_kg_construct_query(sf_dir: str):
    """SPARQL CONSTRUCT-shaped graph transformation: match the BGP
    (?c basedIn ?n)(?n partOf ?r) and EMIT new `locatedInRegion` triples —
    rule-based enrichment, the inference step that completes the query
    surface (SELECT = `kg_bgp_query`, CONSTRUCT = this). Bindings from
    `kg/bgp.match_bgp` (left-deep joins, dimension-bound arm first), the
    template projection is one stateless vectorized pass; set semantics via
    `distinct_rows` as CONSTRUCT de-duplicates its output graph."""
    from .kg.bgp import match_bgp
    from .kg.pipeline import kg_pipeline
    from .util import distinct_rows

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()
    b = match_bgp(
        tri,
        [("?n", "partOf", "?r"), ("?c", "basedIn", "?n")],
        select=["?c", "?r"],
    )

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "subj": batch.column("c").combine_chunks(),
                "pred": pa.array(["locatedInRegion"] * n, pa.string()),
                "obj": batch.column("r").combine_chunks(),
            }
        )

    return distinct_rows(
        b.map_batches(_emit, batch_format="pyarrow"), ["subj", "pred", "obj"]
    )


SQL_KG_CONSTRUCT = """
SELECT DISTINCT 'urn:cust:' || c_custkey AS subj,
       'locatedInRegion' AS pred,
       'urn:region:' || n_regionkey AS obj
FROM customer JOIN nation ON n_nationkey = c_nationkey
"""


DESCRIBE_SEED = "urn:region:0"
DESCRIBE_HOPS = 2


def q_kg_describe_subgraph(sf_dir: str):
    """DESCRIBE-style k-hop subgraph extraction around a seed entity: all
    triples whose subject is reachable within 2 REVERSE hops of the seed
    (region <- nations <- customers), the entity-page / debugging query.
    Frontier expansion by k semi joins — each hop the corpus-sized triple
    stream is probed against the (bounded) frontier, never the reverse;
    the final filter is one broadcast `is_in` pass."""
    import ray

    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()
    frontier = {DESCRIBE_SEED}
    seen = set(frontier)
    for _ in range(DESCRIBE_HOPS):
        fr = ray.put(pa.array(sorted(frontier), pa.string()))

        def _in_edges(batch: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(batch.column("obj_kind"), "iri"),
                pc.is_in(batch.column("obj"), value_set=ray.get(fr)),
            )
            t = batch.filter(m)
            return pa.table({"subj": pc.unique(t.column("subj").combine_chunks())})

        nxt = set()
        for r in tri.map_batches(_in_edges, batch_format="pyarrow").take_all():
            nxt.add(r["subj"])
        frontier = nxt - seen
        seen |= nxt
        if not frontier:
            break
    keep = ray.put(pa.array(sorted(seen), pa.string()))

    def _sub(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("subj"), value_set=ray.get(keep))
        ).select(["subj", "pred", "obj"])

    return tri.map_batches(_sub, batch_format="pyarrow")


SQL_KG_DESCRIBE = f"""
WITH n0 AS (SELECT 'urn:nation:' || n_nationkey AS n FROM nation
            WHERE n_regionkey = 0),
c0 AS (SELECT 'urn:cust:' || c_custkey AS c FROM customer
       JOIN nation ON n_nationkey = c_nationkey WHERE n_regionkey = 0),
canon AS ({SQL_KG_CANONICAL_REF})
SELECT subj, pred, obj FROM canon
WHERE subj = '{DESCRIBE_SEED}'
   OR subj IN (SELECT n FROM n0)
   OR subj IN (SELECT c FROM c0)
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_construct_query": QueryDef(q_kg_construct_query, SQL_KG_CONSTRUCT),
        "kg_describe_subgraph": QueryDef(q_kg_describe_subgraph, SQL_KG_DESCRIBE),
    }
)


# --------------------------------------------------------------------------
# wave 30: entity salience + key-skew audit
# --------------------------------------------------------------------------

def q_kg_entity_salience(sf_dir: str):
    """Per-page salient entity: tf·idf over LINKED nation mentions — the
    signal KG construction uses to pick a page's primary topic. Mentions
    come from the REAL extraction pass (`kg/extract.extract_mentions` over
    genuine html), variant surface forms normalize via
    upper(replace(_,'_',' ')); counts fold per (url, entity), document
    frequency per entity, score = n_mentions · floor(1e6·(ln N − ln df))
    integer micro-nats; top-1 per page via `topk_per_key` (score desc,
    entity asc)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .extras.graph import sum_per_key
    from .extras.stats import exact_value_counts
    from .kg.extract import extract_mentions
    from .kg.pages import synthesize_pages
    from .util import topk_per_key

    n_pages = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    mentions = extract_mentions(
        synthesize_pages(sf_dir).select_columns(["url", "html"])
    )

    def _ent(batch: pa.Table) -> pa.Table:
        based = batch.filter(pc.equal(batch.column("pred"), "basedIn"))
        part = batch.filter(pc.equal(batch.column("pred"), "partOf"))
        ent_b = pc.utf8_upper(
            pc.replace_substring(based.column("obj").combine_chunks(), "_", " ")
        )
        t1 = pa.table({"url": based.column("url").combine_chunks(), "ent": ent_b})
        t2 = pa.table(
            {
                "url": part.column("url").combine_chunks(),
                "ent": part.column("subj").combine_chunks(),
            }
        )
        out = pa.concat_tables([t1, t2])
        k = pc.binary_join_element_wise(out.column("url"), out.column("ent"), "\t")
        return pa.table({"ue": k})

    cnt = exact_value_counts(
        mentions.map_batches(_ent, batch_format="pyarrow"), "ue"
    ).materialize()

    def _split(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("ue"), "\t")
        return pa.table(
            {
                "url": pc.list_element(parts, 0),
                "ent": pc.list_element(parts, 1),
                "c": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    ue = cnt.map_batches(_split, batch_format="pyarrow").materialize()
    import ray

    df_tbl = exact_value_counts(ue.select_columns(["ent"]), "ent")
    dfs = {r["ent"]: r["n"] for r in df_tbl.take_all()}  # entity-domain-sized
    ents = np.asarray(sorted(dfs))
    idf = np.floor(
        1e6 * (np.log(float(n_pages)) - np.log(np.array([dfs[e] for e in ents], np.float64)))
    ).astype(np.int64)
    ref = ray.put((ents, idf))

    def _score(batch: pa.Table) -> pa.Table:
        es, iv = ray.get(ref)
        e = batch.column("ent").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        s = c * iv[np.searchsorted(es, e)]
        return pa.table(
            {
                "url": batch.column("url").combine_chunks(),
                "ent": batch.column("ent").combine_chunks(),
                "score_micro": pa.array(s, pa.int64()),
            }
        )

    scored = ue.map_batches(_score, batch_format="pyarrow")
    return topk_per_key(
        scored, "url", "score_micro", 1, descending=True, tie_col="ent"
    )


def _sql_entity_salience() -> str:
    from .queries_kg import _SQL_VARIANT, BASE

    return f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
var AS (SELECT c_custkey, {_SQL_VARIANT} AS nv
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
m AS (
  SELECT '{BASE}' || (c_custkey % nd.n) AS url,
         upper(replace(nv, '_', ' ')) AS ent
  FROM var, nd
  UNION ALL
  SELECT '{BASE}' || (n_nationkey % nd.n), n_name FROM nation, nd
),
cnt AS (SELECT url, ent, count(*) AS c FROM m GROUP BY url, ent),
df AS (SELECT ent, count(*) AS d FROM cnt GROUP BY ent),
sc AS (SELECT url, cnt.ent,
              c * CAST(floor(1000000.0 * (ln(CAST(nd.n AS DOUBLE))
                                          - ln(CAST(d AS DOUBLE)))) AS BIGINT)
                AS score_micro
       FROM cnt JOIN df ON df.ent = cnt.ent, nd)
SELECT url, ent, score_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY url
                               ORDER BY score_micro DESC, ent) AS rn
  FROM sc) WHERE rn = 1
"""


def q_stats_key_skew(sf_dir: str):
    """Join-key skew audit: the Gini coefficient of the per-key row-count
    distribution (shuffle-planning observability — a high Gini says salt
    your hot keys). Counts via `exact_value_counts`, inequality via
    `group_gini` over a constant group; both sort-scan folds."""
    from .extras.stats import exact_value_counts, group_gini

    li = load(sf_dir, "lineitem", ["l_suppkey"])
    counts = exact_value_counts(li, "l_suppkey")

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(["l_suppkey"] * batch.num_rows, pa.string()),
                "v": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    return group_gini(counts.map_batches(_tag, batch_format="pyarrow"), "g", "v")


SQL_STATS_KEY_SKEW = """
WITH c AS (SELECT l_suppkey, count(*) AS v FROM lineitem GROUP BY l_suppkey),
s AS (SELECT 'l_suppkey' AS g, v,
             row_number() OVER (ORDER BY v) AS i
      FROM c),
a AS (SELECT g, count(*) AS n, sum(v) AS sv, sum(i * v) AS rs FROM s GROUP BY g)
SELECT g, CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS sum_v,
       CAST(2 * rs - (n + 1) * sv AS DOUBLE) / (1.0 * n * sv) AS gini
FROM a
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_entity_salience": QueryDef(q_kg_entity_salience, _sql_entity_salience()),
        "stats_key_skew": QueryDef(q_stats_key_skew, SQL_STATS_KEY_SKEW),
    }
)


# --------------------------------------------------------------------------
# wave 31: adjacency-list export, seeded A/B experiment analysis
# --------------------------------------------------------------------------

def q_kg_adjacency_export(sf_dir: str):
    """Per-page ordered adjacency list over the canonical link graph — the
    graph-interchange export shape (one row per source, destinations joined
    '|' in lexicographic order). Runs on the generalized
    ``ordered_concat_per_key``: one range sort by (src, dst), runs
    concatenate inside blocks, only 2 boundary fragments per block reach the
    driver."""
    from .extras.window import ordered_concat_per_key

    edges = _canonical_edges(sf_dir)
    return ordered_concat_per_key(
        edges, "src_url", ["dst_url"], "dst_url", sep="|", out_col="adj"
    )


SQL_KG_ADJACENCY = f"""
WITH {_SQL_LINKS_CTE},
ce AS (
  SELECT 'https://example.org/doc/' || doc_id AS src_url,
         CASE j WHEN 0 THEN 'https://example.org/doc/' || t
                WHEN 1 THEN 'https://example.org/doc/' || t || '?id=' || t
                ELSE 'https://h' || (t % 8) || '.example.org/doc/' || t
         END AS dst_url
  FROM e)
SELECT src_url, string_agg(dst_url, '|' ORDER BY dst_url) AS adj
FROM ce GROUP BY src_url
"""


AB_SALT = 77


def q_ab_experiment(sf_dir: str):
    """Seeded A/B experiment read-out: deterministic 50/50 variant
    assignment by SplitMix64(customer) — the unit of randomization is the
    CUSTOMER, so every order of a customer lands in the same arm — then
    exact per-arm aggregates (n, integer-dollar sum, mean, unbiased
    variance). The combiner pattern: per-batch partial sums, a 2-group
    final fold; sums are order-independent integers so the read-out is
    bit-reproducible at any parallelism; mean/variance derive from the
    exact integer sums in a fixed IEEE-754 expression order the SQL oracle
    mirrors."""
    from .extras.shuffle import sm64_key

    ds = load(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    edge = np.uint64(1) << np.uint64(63)

    def _partial(b: pa.Table) -> pa.Table:
        cust = b.column("o_custkey").to_numpy(zero_copy_only=False)
        variant = np.where(sm64_key(cust, AB_SALT) < edge, "A", "B")
        # floor, not round: x.50 dollar ties would split between Arrow's
        # half-to-even and DuckDB's half-away; floor has no tie to break
        d = (
            pc.cast(pc.floor(b.column("o_totalprice")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "variant": pa.array(variant, pa.string()),
                "d": pa.array(d, pa.int64()),
                "dd": pa.array(d * d, pa.int64()),
            }
        )
        g = t.group_by("variant").aggregate(
            [("d", "sum"), ("dd", "sum"), ("d", "count")]
        )
        return g.rename_columns(["variant", "sum_d", "sum_dd", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    final = partials.groupby("variant").sum(["sum_d", "sum_dd", "n"])

    def _finish(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("sum(sum_d)").to_numpy(zero_copy_only=False).astype(np.int64)
        ss = b.column("sum(sum_dd)").to_numpy(zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        sf = s.astype(np.float64)
        mean = sf / nf
        # a - b*c/d association mirrors the SQL text exactly
        var = (ss.astype(np.float64) - sf * sf / nf) / (nf - 1.0)
        return pa.table(
            {
                "variant": b.column("variant").combine_chunks(),
                "n_orders": pa.array(n, pa.int64()),
                "sum_price_d": pa.array(s, pa.int64()),
                "mean_price": pa.array(mean, pa.float64()),
                "var_price": pa.array(var, pa.float64()),
            }
        )

    return final.map_batches(_finish, batch_format="pyarrow")


def _sql_ab_experiment() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        "(SELECT o_custkey, o_totalprice FROM orders)", "o_custkey", AB_SALT
    )
    return f"""
WITH {chain},
v AS (SELECT CASE WHEN h < {1 << 63} THEN 'A' ELSE 'B' END AS variant,
             CAST(floor(o_totalprice) AS BIGINT) AS d
      FROM h3),
a AS (SELECT variant, count(*) AS n, sum(d) AS s, sum(d * d) AS ss
      FROM v GROUP BY variant)
SELECT variant,
       CAST(n AS BIGINT) AS n_orders,
       CAST(s AS BIGINT) AS sum_price_d,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_price,
       (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0) AS var_price
FROM a
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_adjacency_export": QueryDef(q_kg_adjacency_export, SQL_KG_ADJACENCY),
        "ab_experiment": QueryDef(q_ab_experiment, _sql_ab_experiment()),
    }
)


# --------------------------------------------------------------------------
# wave 32: WL structural colors, SPARQL ASK + OPTIONAL
# --------------------------------------------------------------------------

def q_kg_wl_colors(sf_dir: str):
    """Weisfeiler-Lehman structural refinement over the EXTRACTED hyperlink
    graph (2 rounds) — canonical structural labels for isomorphism
    bucketing / blank-node canonicalization. Exact integer pipeline
    (32-bit colors, commutative int64 neighbor sums, SplitMix64 finalizer
    per round) so the refinement is bit-replicable in SQL."""
    from .extras.graph import wl_colors

    return wl_colors(_int_link_edges(sf_dir), rounds=2, salt=101)


def _sm64_pref(p: str, table: str, col: str, salt: int) -> str:
    """Prefixed variant of extras.shuffle.sql_sm64_chain so several hash
    applications can coexist in one WITH clause."""
    from .rng import SM64_GAMMA, _SM64_M1, _SM64_M2
    from .sqlrng import _mul64, _xsh

    return f"""
{p}0 AS (SELECT *, {_mul64(f"CAST({col} AS HUGEINT) + {salt + 1}", SM64_GAMMA)} AS z FROM {table}),
{p}1 AS (SELECT * EXCLUDE (z), {_mul64(_xsh("z", 30), _SM64_M1)} AS z FROM {p}0),
{p}2 AS (SELECT * EXCLUDE (z), {_mul64(_xsh("z", 27), _SM64_M2)} AS z FROM {p}1),
{p}3 AS (SELECT * EXCLUDE (z, {col}), {_xsh("z", 31)} AS h FROM {p}2)"""


def _sql_wl_colors(rounds: int = 2, salt: int = 101) -> str:
    shift = 1 << 32
    ctes = [
        _SQL_LINKS_CTE.strip(),
        "edges AS (SELECT doc_id AS src, t AS dst FROM e)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "od AS (SELECT src AS node, count(*) AS o FROM edges GROUP BY src)",
        "idg AS (SELECT dst AS node, count(*) AS i FROM edges GROUP BY dst)",
        "seed AS (SELECT n.node, COALESCE(od.o, 0) * 1048576 + COALESCE(idg.i, 0) AS x "
        "FROM nodes n LEFT JOIN od ON od.node = n.node LEFT JOIN idg ON idg.node = n.node)",
        _sm64_pref("w0_", "seed", "x", salt).strip(),
        f"c0 AS (SELECT node, CAST(h // {shift} AS BIGINT) AS c FROM w0_3)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"os{r} AS (SELECT e.src AS node, sum(c{r-1}.c) AS s FROM edges e "
            f"JOIN c{r-1} ON c{r-1}.node = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"ins{r} AS (SELECT e.dst AS node, sum(c{r-1}.c) AS s FROM edges e "
            f"JOIN c{r-1} ON c{r-1}.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"m{r} AS (SELECT c{r-1}.node, 5 * c{r-1}.c + 3 * COALESCE(os{r}.s, 0) "
            f"+ 2 * COALESCE(ins{r}.s, 0) AS x FROM c{r-1} "
            f"LEFT JOIN os{r} ON os{r}.node = c{r-1}.node "
            f"LEFT JOIN ins{r} ON ins{r}.node = c{r-1}.node)"
        )
        ctes.append(_sm64_pref(f"w{r}_", f"m{r}", "x", salt + r).strip())
        ctes.append(f"c{r} AS (SELECT node, CAST(h // {shift} AS BIGINT) AS c FROM w{r}_3)")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, c AS wl_color FROM c{rounds}"
    )


def _supplier_triples(sf_dir: str):
    sup = load(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def _lift(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            "urn:supp:", pc.cast(b.column("s_suppkey"), pa.string()), ""
        )
        n = pc.binary_join_element_wise(
            "urn:nation:", pc.cast(b.column("s_nationkey"), pa.string()), ""
        )
        k = b.num_rows
        return pa.table(
            {
                "subj": s,
                "pred": pa.array(["operatesIn"] * k, pa.string()),
                "obj": n,
                "obj_kind": pa.array(["iri"] * k, pa.string()),
            }
        )

    return sup.map_batches(_lift, batch_format="pyarrow")


def q_kg_optional_bgp(sf_dir: str):
    """SPARQL OPTIONAL (left-join) over the KG: every nation with its
    region (required BGP) and its suppliers IF ANY (optional group — at
    small sf most nations have none, so the left-join semantics are
    genuinely exercised: unmatched bindings survive with ?s null)."""
    from .kg.bgp import match_bgp
    from .kg.pipeline import kg_pipeline

    tri = (
        kg_pipeline(sf_dir, anonymize=False)
        .triples.select_columns(["subj", "pred", "obj", "obj_kind"])
        .union(_supplier_triples(sf_dir))
        .materialize()
    )
    return match_bgp(
        tri,
        [("?n", "partOf", "?r")],
        optional=[[("?s", "operatesIn", "?n")]],
        select=["?n", "?r", "?s"],
    )


SQL_KG_OPTIONAL = """
SELECT 'urn:nation:' || n_nationkey AS n,
       'urn:region:' || n_regionkey AS r,
       CASE WHEN s_suppkey IS NULL THEN NULL
            ELSE 'urn:supp:' || s_suppkey END AS s
FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
"""


ASK_BALANCE = 9000.0


def q_kg_ask_query(sf_dir: str):
    """SPARQL ASK — boolean existence probes with streaming early-exit:
    the filtered triple stream is cut by ``limit(1)`` so the executor
    stops pulling blocks at the first witness (backpressure does the
    short-circuit). Two probes, one satisfiable and one not."""
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()

    def _probe(pred: str, test) -> bool:
        def _f(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("pred"), pred)
            t = b.filter(m)
            return t.filter(test(t)).select(["subj"])

        return tri.map_batches(_f, batch_format="pyarrow").limit(1).count() > 0

    high_bal = _probe(
        "hasAccountBalance",
        lambda t: pc.greater(
            pc.cast(t.column("obj"), pa.float64()), ASK_BALANCE
        ),
    )
    ghost_region = _probe(
        "partOf", lambda t: pc.equal(t.column("obj"), "urn:region:99")
    )
    return pa.table(
        {
            "probe": pa.array(["balance_gt_9000", "region_99_exists"], pa.string()),
            "ask": pa.array([high_bal, ghost_region], pa.bool_()),
        }
    )


SQL_KG_ASK = f"""
SELECT 'balance_gt_9000' AS probe,
       EXISTS(SELECT 1 FROM customer WHERE CAST(c_acctbal AS DOUBLE) > {ASK_BALANCE}) AS ask
UNION ALL
SELECT 'region_99_exists',
       EXISTS(SELECT 1 FROM nation WHERE n_regionkey = 99)
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_wl_colors": QueryDef(q_kg_wl_colors, _sql_wl_colors()),
        "kg_optional_bgp": QueryDef(q_kg_optional_bgp, SQL_KG_OPTIONAL),
        "kg_ask_query": QueryDef(q_kg_ask_query, SQL_KG_ASK),
    }
)


# --------------------------------------------------------------------------
# wave 33: bloom-prefiltered semi join, z-order clustering keys
# --------------------------------------------------------------------------

def q_join_bloom_semi(sf_dir: str):
    """EXACT semi join through a bloom prefilter (extras/joins.
    bloom_semi_join): lineitems of URGENT orders. The bloom bits (128 KB)
    broadcast instead of the key set; (1-ε) of non-matching lineitems are
    dropped with NO shuffle; only the surviving sliver pays the exact
    hash-partitioned confirm join — the middle path when the build side
    overflows the broadcast cap and the probe side is the 100-TB stream."""
    from .extras.joins import bloom_semi_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    urgent = load(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).filter(
        lambda r: r["o_orderpriority"] == "1-URGENT"
    )
    return bloom_semi_join(
        li, urgent.select_columns(["o_orderkey"]), on="l_orderkey",
        right_on="o_orderkey",
    )


SQL_JOIN_BLOOM_SEMI = """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_orders_zorder(sf_dir: str):
    """Z-order clustering keys over (customer, price-in-hundreds): the
    Morton interleave as ONE exact int64 sort key whose ranges are 2-D
    locality buckets (row-group pruning on either dimension after one
    narrow sort). 20 bits/dim; zbucket = top byte = the 256-way cluster a
    range partitioner would cut."""
    from .extras.zorder import zorder_key

    ds = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey").combine_chunks(),
                "ck": pc.cast(b.column("o_custkey"), pa.int64()),
                "ph": pc.cast(
                    pc.floor(pc.divide(b.column("o_totalprice"), 100.0)), pa.int64()
                ),
            }
        )

    z = zorder_key(
        ds.map_batches(_prep, batch_format="pyarrow"), "ck", "ph", bits=20
    )
    return z.select_columns(["o_orderkey", "zval", "zbucket"])


def _sql_orders_zorder() -> str:
    from .extras.zorder import sql_zorder_expr

    z = sql_zorder_expr("o_custkey", "CAST(floor(o_totalprice / 100.0) AS BIGINT)")
    return f"""
WITH z AS (SELECT o_orderkey, {z} AS zval FROM orders)
SELECT o_orderkey, zval, zval // {1 << 32} AS zbucket FROM z
"""


EXTRAS8_REGISTRY.update(
    {
        "join_bloom_semi": QueryDef(q_join_bloom_semi, SQL_JOIN_BLOOM_SEMI),
        "orders_zorder": QueryDef(q_orders_zorder, _sql_orders_zorder()),
    }
)


# --------------------------------------------------------------------------
# wave 34: calendar gap-fill, schema-drift audit
# --------------------------------------------------------------------------

GAPFILL_MIN_VALUE = 150.0


def q_events_gapfill(sf_dir: str):
    """Calendar gap-fill: daily counts of high-value purchases with MISSING
    days emitted as zero over the observed [min_day, max_day] span — the
    time-series densification every monitoring consumer needs (a sparse
    groupby silently drops empty days; downstream rolling windows then skip
    them). Day counts via one sort-scan fold; the calendar grid is
    day-domain-sized, so the fill is a bounded driver merge like the other
    grid queries (rolling DAU, anomaly z-scores)."""
    from .extras.stats import exact_value_counts

    ev = load(sf_dir, "events", ["ts", "event_type", "value"])

    def _days(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(b.column("event_type"), "purchase"),
            pc.greater(b.column("value"), GAPFILL_MIN_VALUE),
        )
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"day": pc.cast(t.column("ts"), pa.date32())})

    counts = exact_value_counts(
        ev.map_batches(_days, batch_format="pyarrow"), "day"
    ).take_all()  # bounded: one row per OBSERVED day
    have = {r["day"]: r["n"] for r in counts}
    if not have:
        return pa.table(
            {"day": pa.array([], pa.timestamp("us")), "n": pa.array([], pa.int64())}
        )
    import datetime

    lo, hi = min(have), max(have)
    grid = [lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1)]
    return pa.table(
        {
            # timestamp, not date32: the driver compare canonicalizes
            # datetimes on both engines; raw date32 arrives as python dates
            "day": pa.array(grid, pa.date32()).cast(pa.timestamp("us")),
            "n": pa.array([int(have.get(d, 0)) for d in grid], pa.int64()),
        }
    )


SQL_EVENTS_GAPFILL = f"""
WITH f AS (SELECT CAST(ts AS DATE) AS day FROM events
           WHERE event_type = 'purchase' AND value > {GAPFILL_MIN_VALUE}),
c AS (SELECT day, count(*) AS n FROM f GROUP BY day),
g AS (SELECT unnest(generate_series((SELECT min(day) FROM c),
                                    (SELECT max(day) FROM c),
                                    INTERVAL 1 DAY))::DATE AS day)
SELECT CAST(g.day AS TIMESTAMP) AS day, COALESCE(c.n, 0) AS n FROM g LEFT JOIN c ON c.day = g.day
"""


def q_corpus_schema_drift(sf_dir: str):
    """Schema-drift audit between two corpus snapshots — the ingestion
    regression check (a refreshed crawl silently dropping a column or
    spiking a null rate must fail loudly, not three stages later).
    Snapshot B is a deterministic drift of A (rows doc_id%3!=0, text nulled
    for lang='de', `source` column dropped). Per column: presence in each
    snapshot + exact null counts, computed in ONE streaming pass per
    snapshot (per-batch per-column valid counts, #batches × #cols partial
    rows folded on the driver)."""
    docs = load(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])

    def _drift(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.not_equal(
                pc.subtract(
                    b.column("doc_id"),
                    pc.multiply(pc.divide(b.column("doc_id"), 3), 3),
                ),
                0,
            )
        )
        text = pc.if_else(
            pc.equal(t.column("lang"), "de"),
            pa.scalar(None, pa.string()),
            t.column("text"),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").combine_chunks(),
                "text": text,
                "lang": t.column("lang").combine_chunks(),
                "n_chars": t.column("n_chars").combine_chunks(),
            }
        )

    snap_b = docs.map_batches(_drift, batch_format="pyarrow")

    def _null_partials(b: pa.Table) -> pa.Table:
        cols, nulls, rows = [], [], []
        for c in b.column_names:
            cols.append(c)
            nulls.append(b.column(c).null_count)
            rows.append(b.num_rows)
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "n_null": pa.array(nulls, pa.int64()),
                "n_rows": pa.array(rows, pa.int64()),
            }
        )

    def _fold(ds) -> dict:
        out: dict = {}
        for r in ds.map_batches(_null_partials, batch_format="pyarrow").take_all():
            nn, nr = out.get(r["col"], (0, 0))
            out[r["col"]] = (nn + r["n_null"], nr + r["n_rows"])
        return out

    a, b = _fold(docs), _fold(snap_b)
    cols = sorted(set(a) | set(b))
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "in_a": pa.array([c in a for c in cols], pa.bool_()),
            "in_b": pa.array([c in b for c in cols], pa.bool_()),
            "null_a": pa.array([a.get(c, (0, 0))[0] for c in cols], pa.int64()),
            "null_b": pa.array([b.get(c, (0, 0))[0] for c in cols], pa.int64()),
            "rows_a": pa.array([a.get(c, (0, 0))[1] for c in cols], pa.int64()),
            "rows_b": pa.array([b.get(c, (0, 0))[1] for c in cols], pa.int64()),
        }
    )


SQL_SCHEMA_DRIFT = """
WITH b AS (SELECT doc_id, CASE WHEN lang = 'de' THEN NULL ELSE text END AS text,
                  lang, n_chars
           FROM documents WHERE doc_id % 3 <> 0),
cols(col, in_a, in_b) AS (VALUES ('doc_id', true, true), ('lang', true, true),
       ('n_chars', true, true), ('source', true, false), ('text', true, true)),
na AS (SELECT 'doc_id' AS col, count(*) FILTER (doc_id IS NULL) AS n, count(*) AS r FROM documents
  UNION ALL SELECT 'lang', count(*) FILTER (lang IS NULL), count(*) FROM documents
  UNION ALL SELECT 'n_chars', count(*) FILTER (n_chars IS NULL), count(*) FROM documents
  UNION ALL SELECT 'source', count(*) FILTER (source IS NULL), count(*) FROM documents
  UNION ALL SELECT 'text', count(*) FILTER (text IS NULL), count(*) FROM documents),
nb AS (SELECT 'doc_id' AS col, count(*) FILTER (doc_id IS NULL) AS n, count(*) AS r FROM b
  UNION ALL SELECT 'lang', count(*) FILTER (lang IS NULL), count(*) FROM b
  UNION ALL SELECT 'n_chars', count(*) FILTER (n_chars IS NULL), count(*) FROM b
  UNION ALL SELECT 'text', count(*) FILTER (text IS NULL), count(*) FROM b)
SELECT cols.col, cols.in_a, cols.in_b,
       na.n AS null_a, COALESCE(nb.n, 0) AS null_b,
       na.r AS rows_a, COALESCE(nb.r, 0) AS rows_b
FROM cols JOIN na ON na.col = cols.col LEFT JOIN nb ON nb.col = cols.col
"""


EXTRAS8_REGISTRY.update(
    {
        "events_gapfill": QueryDef(q_events_gapfill, SQL_EVENTS_GAPFILL),
        "corpus_schema_drift": QueryDef(q_corpus_schema_drift, SQL_SCHEMA_DRIFT),
    }
)


# --------------------------------------------------------------------------
# wave 35: fuzzy alias linking, time-boxed funnel conversion
# --------------------------------------------------------------------------

def q_er_fuzzy_link(sf_dir: str):
    """Dictionary fuzzy linking (extras/er.fuzzy_link): a corpus-scale
    stream of typo'd nation mentions (deterministic char-drop at position
    (7·custkey+3) mod len — the rule the oracle replays) is linked back to
    the canonical nation dictionary at edit distance <= 1. Dictionary
    broadcast once; per batch: local factorize-dedup of surface forms,
    vectorized length/end-char candidate pruning, banded O(len) distance
    check on the survivors only; the stream never shuffles."""
    from .extras.er import fuzzy_link

    nat = load(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = {int(k): str(v) for k, v in zip(nat["n_nationkey"], nat["n_name"])}

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def _mention(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        out = []
        for c, n in zip(ck, nk):
            nm = names[int(n)]
            p = (7 * int(c) + 3) % len(nm)
            out.append(nm[:p] + nm[p + 1 :])
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "mention": pa.array(out, pa.string()),
            }
        )

    mentions = cust.map_batches(_mention, batch_format="pyarrow")
    return fuzzy_link(
        mentions, "mention", list(names.values()), keep_cols=["c_custkey"]
    )


SQL_ER_FUZZY = """
WITH m AS (
  SELECT c_custkey,
         substr(n_name, 1, (7 * c_custkey + 3) % length(n_name))
           || substr(n_name, (7 * c_custkey + 3) % length(n_name) + 2) AS mention
  FROM customer JOIN nation ON n_nationkey = c_nationkey)
SELECT c_custkey, mention, n_name AS match,
       CAST(levenshtein(mention, n_name) AS BIGINT) AS dist
FROM m, nation WHERE levenshtein(mention, n_name) <= 1
"""


FUNNEL_WINDOW_H = 24


def q_events_funnel_window(sf_dir: str):
    """Time-boxed funnel conversion: users whose FIRST signup is followed by
    a purchase within 24 h (the product-analytics staple `events_funnel`
    doesn't time-bound). Per-user first signup via one `min_per_key`
    sort-scan; purchases then SEMI-probe that user-keyed table through one
    hash join and a vectorized window compare — converted user ids dedup
    through a distinct fold; output is one count row per conversion day."""
    from .extras.stats import exact_value_counts
    from .util import distinct_rows, hash_join, min_per_key

    ev = load(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _typed(t: str):
        def _f(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("event_type"), t)
            x = b.filter(m)
            return pa.table(
                {
                    "user_id": x.column("user_id").combine_chunks(),
                    "ts": pc.cast(x.column("ts"), pa.int64()),
                }
            )
        return _f

    signups = min_per_key(
        ev.map_batches(_typed("signup"), batch_format="pyarrow"), "user_id", "ts"
    ).rename_columns({"ts": "ts0"})
    purchases = ev.map_batches(_typed("purchase"), batch_format="pyarrow")
    joined = hash_join(purchases, signups, on="user_id", join_type="inner")

    win = FUNNEL_WINDOW_H * 3_600_000_000

    def _conv(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        t0 = b.column("ts0").to_numpy(zero_copy_only=False)
        m = (ts > t0) & (ts <= t0 + win)
        t = b.filter(pa.array(m))
        day = pc.cast(
            pc.floor_temporal(pc.cast(t.column("ts0"), pa.timestamp("us")), unit="day"),
            pa.timestamp("us"),
        )
        return pa.table({"user_id": t.column("user_id").combine_chunks(), "day": day})

    conv = distinct_rows(
        joined.map_batches(_conv, batch_format="pyarrow"), ["user_id", "day"]
    )
    out = exact_value_counts(
        conv.map_batches(
            lambda b: pa.table({"day": b.column("day").combine_chunks()}),
            batch_format="pyarrow",
        ),
        "day",
    )
    return out.rename_columns({"n": "n_converted"})


SQL_FUNNEL_WINDOW = f"""
WITH s AS (SELECT user_id, min(ts) AS ts0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT DISTINCT s.user_id, date_trunc('day', s.ts0) AS day
      FROM s JOIN events p ON p.user_id = s.user_id
      WHERE p.event_type = 'purchase'
        AND p.ts > s.ts0
        AND p.ts <= s.ts0 + INTERVAL {FUNNEL_WINDOW_H} HOURS)
SELECT CAST(day AS TIMESTAMP) AS day, count(*) AS n_converted FROM c GROUP BY day
"""


EXTRAS8_REGISTRY.update(
    {
        "er_fuzzy_link": QueryDef(q_er_fuzzy_link, SQL_ER_FUZZY),
        "events_funnel_window": QueryDef(q_events_funnel_window, SQL_FUNNEL_WINDOW),
    }
)


# --------------------------------------------------------------------------
# wave 36: KLL quantile sketch, zone-map pruned range read
# --------------------------------------------------------------------------

KLL_K = 256
KLL_DECILES = (10, 25, 50, 75, 90)


def q_stats_kll(sf_dir: str):
    """KLL mergeable quantile sketch over lineitem price cents (one pass,
    k·log(n/k) memory, partial sketches fold associatively — the
    approximate complement of the exact narrow-sort quantiles),
    scoreboarded the CMS/HLL way: for each target quantile the EXACT rank
    of the estimate (one vectorized counting pass) must sit within the
    5×(1.33/k) KLL bound — an estimator regression flips within_ok and
    hash-mismatches. n rides along so the oracle certifies row count."""
    from .extras.kll import kll_sketch

    li = load(sf_dir, "lineitem", ["l_extendedprice"])

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                )
            }
        )

    cents = li.map_batches(_cents, batch_format="pyarrow")
    sk = kll_sketch(cents, "c", k=KLL_K)
    n = sk.n
    ests = np.array([sk.quantile(q / 100.0) for q in KLL_DECILES], np.int64)

    # exact ranks of the estimates: one more streaming pass
    import ray

    ref = ray.put(np.sort(ests))

    def _ranks(b: pa.Table) -> pa.Table:
        e = ray.get(ref)
        v = np.sort(b.column("c").to_numpy(zero_copy_only=False))
        r = np.searchsorted(v, e, side="right").astype(np.int64)
        return pa.table({"i": pa.array(np.arange(len(e), dtype=np.int64)), "r": r})

    totals = np.zeros(len(ests), np.int64)
    for row in cents.map_batches(_ranks, batch_format="pyarrow").take_all():
        totals[row["i"]] += row["r"]
    order = np.argsort(ests, kind="stable")
    ranks = np.empty(len(ests), np.int64)
    ranks[order] = totals
    bound = int(np.ceil(5 * 1.33 / KLL_K * n))
    ok = np.abs(ranks - np.array(KLL_DECILES) * n / 100.0) <= bound
    return pa.table(
        {
            "q_pct": pa.array(list(KLL_DECILES), pa.int64()),
            "n": pa.array([n] * len(KLL_DECILES), pa.int64()),
            "within_ok": pa.array(ok.astype(np.int64), pa.int64()),
        }
    )


SQL_STATS_KLL = f"""
SELECT unnest({list(KLL_DECILES)}) AS q_pct,
       (SELECT count(*) FROM lineitem) AS n,
       CAST(1 AS BIGINT) AS within_ok
"""


ZONE_LO, ZONE_HI = 200, 400


def q_corpus_zonemap_prune(sf_dir: str):
    """Zone-map pruned range read (extras/zonemap): the corpus is clustered
    by n_chars (one narrow sort), written one file per block, and the
    [{ZONE_LO}, {ZONE_HI}] range query reads ONLY the files whose footer
    min/max zone overlaps — the manifest lives in the Parquet footers, so
    it cannot drift from the data. Exactness comes from the residual
    in-file filter; the pruning ratio is asserted in the unit test."""
    import shutil
    import tempfile

    from .extras.zonemap import read_pruned, write_zonemapped

    docs = load(sf_dir, "documents", ["doc_id", "n_chars"])
    out = tempfile.mkdtemp(prefix="zonemap_", dir="/tmp")
    try:
        write_zonemapped(docs, out, "n_chars", num_files=8)
        ds, _read, _total = read_pruned(out, "n_chars", ZONE_LO, ZONE_HI)
        return pa.Table.from_pandas(
            ds.select_columns(["doc_id", "n_chars"]).to_pandas(),
            preserve_index=False,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_ZONEMAP = f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars BETWEEN {ZONE_LO} AND {ZONE_HI}
"""


EXTRAS8_REGISTRY.update(
    {
        "stats_kll": QueryDef(q_stats_kll, SQL_STATS_KLL),
        "corpus_zonemap_prune": QueryDef(q_corpus_zonemap_prune, SQL_ZONEMAP),
    }
)


# --------------------------------------------------------------------------
# wave 37: label-propagation communities, named-graph (quad) scoped BGP
# --------------------------------------------------------------------------

def q_graph_label_prop(sf_dir: str):
    """Community detection by synchronous label propagation over the
    extracted hyperlink graph (2 sweeps, mode-of-neighbor-labels with
    smallest-label tie-break — deterministic and SQL-unrollable; distinct
    from min-label contraction, which computes components, not
    communities)."""
    from .extras.graph import label_propagation

    return label_propagation(_int_link_edges(sf_dir), rounds=2)


def _label_prop_ctes(rounds: int = 2) -> list[str]:
    """The label-propagation recurrence as a reusable CTE list (wave-42's
    modularity oracle extends it with degree / intra-edge CTEs)."""
    ctes = [
        _SQL_LINKS_CTE.strip(),
        "ed AS (SELECT doc_id AS src, t AS dst FROM e)",
        "sym AS (SELECT src AS a, dst AS b FROM ed UNION ALL SELECT dst, src FROM ed)",
        "nodes AS (SELECT DISTINCT a AS node FROM sym)",
        "l0 AS (SELECT node, node AS lab FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"nb{r} AS (SELECT s.b AS node, l{r-1}.lab, count(*) AS c "
            f"FROM sym s JOIN l{r-1} ON l{r-1}.node = s.a GROUP BY s.b, l{r-1}.lab)"
        )
        ctes.append(
            f"am{r} AS (SELECT node, lab FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY node ORDER BY c DESC, lab) AS rn FROM nb{r}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{r} AS (SELECT n.node, COALESCE(am{r}.lab, n.node) AS lab "
            f"FROM nodes n LEFT JOIN am{r} ON am{r}.node = n.node)"
        )
    return ctes


def _sql_label_prop(rounds: int = 2) -> str:
    return (
        "WITH "
        + ",\n".join(_label_prop_ctes(rounds))
        + f"\nSELECT node, lab AS label FROM l{rounds}"
    )


def q_kg_named_graph_query(sf_dir: str):
    """Named-graph (quad) scoped BGP: the canonical triples are tagged with
    a provenance graph by subject family (customer facts -> urn:g:cust,
    geo facts -> urn:g:geo), and GRAPH scoping compiles down to the triple
    engine by fusing the graph into the predicate (g || '#' || pred) — the
    classic quad-on-triple-store encoding, zero core changes. The query
    matches basedIn ONLY inside the cust graph and partOf ONLY inside the
    geo graph."""
    from .kg.bgp import match_bgp
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples

    def _scope(b: pa.Table) -> pa.Table:
        g = pc.if_else(
            pc.starts_with(b.column("subj"), "urn:cust:"),
            pa.scalar("urn:g:cust"),
            pa.scalar("urn:g:geo"),
        )
        return pa.table(
            {
                "subj": b.column("subj").combine_chunks(),
                "pred": pc.binary_join_element_wise(g, b.column("pred"), "#"),
                "obj": b.column("obj").combine_chunks(),
            }
        )

    quads = tri.map_batches(_scope, batch_format="pyarrow").materialize()
    return match_bgp(
        quads,
        [
            ("?n", "urn:g:geo#partOf", "urn:region:1"),
            ("?c", "urn:g:cust#basedIn", "?n"),
        ],
        select=["?c", "?n"],
    )


SQL_KG_NAMED_GRAPH = """
SELECT 'urn:cust:' || c_custkey AS c, 'urn:nation:' || n_nationkey AS n
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE n_regionkey = 1
"""


EXTRAS8_REGISTRY.update(
    {
        "graph_label_prop": QueryDef(q_graph_label_prop, _sql_label_prop()),
        "kg_named_graph_query": QueryDef(q_kg_named_graph_query, SQL_KG_NAMED_GRAPH),
    }
)


# --------------------------------------------------------------------------
# wave 38: SPARQL property paths, BGP GROUP BY aggregate
# --------------------------------------------------------------------------

def q_kg_property_path(sf_dir: str):
    """SPARQL 1.1 property path `(basedIn|operatesIn)/partOf` over the
    canonical KG + lifted supplier triples (kg/paths.eval_path): the
    alternation is a stream union, the sequence one hash join — every
    entity (customer or supplier) paired with its region. Also exercises
    the inverse operator in the unit grammar tests."""
    from .kg.paths import eval_path
    from .kg.pipeline import kg_pipeline

    tri = (
        kg_pipeline(sf_dir, anonymize=False)
        .triples.select_columns(["subj", "pred", "obj", "obj_kind"])
        .union(_supplier_triples(sf_dir))
        .materialize()
    )
    return eval_path(tri, "(basedIn|operatesIn)/partOf")


SQL_KG_PROPERTY_PATH = """
SELECT 'urn:cust:' || c_custkey AS s, 'urn:region:' || n_regionkey AS o
FROM customer JOIN nation ON n_nationkey = c_nationkey
UNION ALL
SELECT 'urn:supp:' || s_suppkey, 'urn:region:' || n_regionkey
FROM supplier JOIN nation ON n_nationkey = s_nationkey
"""


def q_kg_select_aggregate(sf_dir: str):
    """SPARQL SELECT + GROUP BY aggregate: `SELECT ?n (COUNT(?c) AS
    n_cust) WHERE { ?c basedIn ?nat } GROUP BY ?nat` — BGP bindings from
    match_bgp, the count one sort-scan fold (never a Ray groupby at
    binding cardinality)."""
    from .extras.stats import exact_value_counts
    from .kg.bgp import match_bgp
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples.materialize()
    b = match_bgp(tri, [("?c", "basedIn", "?nat")], select=["?nat"])
    return exact_value_counts(b, "nat").rename_columns({"n": "n_cust"})


SQL_KG_SELECT_AGG = """
SELECT 'urn:nation:' || c_nationkey AS nat, count(*) AS n_cust
FROM customer GROUP BY c_nationkey
"""


EXTRAS8_REGISTRY.update(
    {
        "kg_property_path": QueryDef(q_kg_property_path, SQL_KG_PROPERTY_PATH),
        "kg_select_aggregate": QueryDef(q_kg_select_aggregate, SQL_KG_SELECT_AGG),
    }
)
