"""Round-4 wave-19 operators with DuckDB oracles — the web-link-graph
family: href extraction out of raw html, URL canonicalization (the
crawl-dedup normalizer), host-level link-graph aggregation and per-target
anchor-text evidence. The fixture corpus carries deterministic nav links
(pure doc_id arithmetic, `kg/links.py`), so every oracle reconstructs the
expected graph in SQL without parsing html — the Ray side must earn the
match by actually extracting and normalizing the messy surface forms.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

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
