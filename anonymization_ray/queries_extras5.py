"""Round-4 wave-11 operators with DuckDB oracles — the at-rest-layout and
approximate-membership family: exact PCA scatter matrices, Z-order (Morton)
clustering keys, bloom-filter cross-corpus dedup, windowed event dedup, and
small-file compaction. Every query value-gated: hash-exact SQL or a
deterministic recall/false-positive scoreboard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS5_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# exact PCA scatter matrix
# --------------------------------------------------------------------------

def q_embed_scatter_matrix(sf_dir: str):
    """Exact integer scatter matrix S = sum_n q_n q_n^T (q = floor(1e6*v),
    upper triangle) over the embeddings table — the distributed half of PCA.
    The eigen step is dim x dim and driver-local; what must be exact and
    distributed is THIS matrix, so that is what the oracle pins (every
    entry, hash-exact)."""
    from .extras.similarity import scatter_matrix

    return scatter_matrix(
        load(sf_dir, "embeddings", ["embedding"]), vec_col="embedding"
    )


SQL_SCATTER = """
WITH e AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS q,
         unnest(range(len(embedding))) AS i
  FROM embeddings)
SELECT a.i AS i, b.i AS j,
       CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS BIGINT) AS s
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


# --------------------------------------------------------------------------
# Z-order clustering key
# --------------------------------------------------------------------------

def q_layout_zorder(sf_dir: str):
    """Morton key over (l_partkey, l_suppkey) for every lineitem row — the
    2-D clustering sort key that lets parquet row-group stats prune box
    queries on either column at rest. Pure bit arithmetic, bit-exact vs the
    unrolled SQL expression."""
    from .extras.layout import add_zorder_column

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    return add_zorder_column(li, "l_partkey", "l_suppkey").select_columns(
        ["l_orderkey", "l_linenumber", "z"]
    )


def _sql_zorder() -> str:
    from .extras.layout import zorder_sql_expr

    return f"""
SELECT l_orderkey, l_linenumber,
       CAST({zorder_sql_expr("l_partkey", "l_suppkey")} AS BIGINT) AS z
FROM lineitem
"""


# --------------------------------------------------------------------------
# bloom cross-corpus dedup
# --------------------------------------------------------------------------

def q_dedup_bloom_cross(sf_dir: str):
    """Membership gate for an incremental crawl: the reference corpus is the
    documents table, the 'new crawl' is the planted-duplicate corpus (every
    original text present verbatim, every perturbed copy absent). The gate:
    (1) ZERO false negatives — every true duplicate must be flagged (bloom
    guarantee; any miss breaks the bit math); (2) false positives within
    3x the analytic (1-e^{-kn/m})^k bound (deterministic given the data —
    the margin only absorbs the small-n variance of the analytic rate).
    Both assertions fold into a constant row the SQL oracle pins."""
    import math

    from .extras.dedup import bloom_cross_dedup
    from .extras.joins import semi_anti_join
    from .queries_extras import _corpus_with_dups

    ref = load(sf_dir, "documents", ["doc_id", "text"])
    new = _corpus_with_dups(sf_dir)
    m_bits, n_hash = 1 << 20, 7
    flags = bloom_cross_dedup(
        new, ref, text_col="text", id_col="doc_id", m_bits=m_bits, n_hash=n_hash
    ).take_all()
    hit = {r["doc_id"] for r in flags if r["bloom_hit"]}
    all_ids = {r["doc_id"] for r in flags}
    # EXACT membership (ground truth) via a distributed text semi-join —
    # some perturbed copies are verbatim members (single-word texts survive
    # the perturbation), so membership must be computed, not assumed by id
    members = {
        r["doc_id"]
        for r in semi_anti_join(new, ref, on="text")
        .select_columns(["doc_id"])
        .take_all()
    }
    no_false_negatives = int(members <= hit)
    non_members = all_ids - members
    fp_rate = (1.0 - math.exp(-n_hash * len(members) / m_bits)) ** n_hash
    n_fp = len(hit & non_members)
    fp_ok = int(n_fp <= max(3, 3 * fp_rate * len(non_members)))
    return pa.table(
        {
            "no_false_negatives": pa.array([no_false_negatives], pa.int64()),
            "fp_bound_ok": pa.array([fp_ok], pa.int64()),
        }
    )


SQL_BLOOM_CROSS = """
SELECT CAST(1 AS BIGINT) AS no_false_negatives, CAST(1 AS BIGINT) AS fp_bound_ok
"""


# --------------------------------------------------------------------------
# windowed event dedup (distinct-within-window)
# --------------------------------------------------------------------------

DEDUP_WINDOW_US = 3_600_000_000  # 1 hour


def q_events_dedup_window(sf_dir: str):
    """Keep an event only when the previous event with the same
    (user, type) is more than an hour older — the log-dedup /
    repeated-signal suppressor. One range sort + carry-chained lag
    (`per_key_window`); the filter is stateless."""
    from .extras.window import per_key_window

    ev = load(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def _prep(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("user_id"), pa.string()),
            batch.column("event_type").combine_chunks(),
            "|",
        )
        return pa.table(
            {
                "k": key,
                "ts": batch.column("ts").combine_chunks(),
                "event_id": batch.column("event_id").combine_chunks(),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    w = per_key_window(
        ev.map_batches(_prep, batch_format="pyarrow"), "k", "ts", "event_id", "one"
    )

    def _keep(batch: pa.Table) -> pa.Table:
        lag = batch.column("lag_us")
        m = pc.or_kleene(pc.is_null(lag), pc.greater(lag, DEDUP_WINDOW_US))
        return pa.table(
            {"event_id": batch.column("event_id").filter(pc.fill_null(m, False))}
        )

    return w.map_batches(_keep, batch_format="pyarrow")


SQL_DEDUP_WINDOW = f"""
WITH l AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS d
  FROM events)
SELECT event_id FROM l WHERE d IS NULL OR d > {DEDUP_WINDOW_US}
"""


# --------------------------------------------------------------------------
# small-file compaction round-trip
# --------------------------------------------------------------------------

def q_corpus_compact_roundtrip(sf_dir: str):
    """documents exploded into 32 small files, compacted back into
    target-sized files (sink-side row packing, no shuffle), read back —
    the oracle is the identity; the test layer asserts the file-count
    drop."""
    import shutil
    import tempfile

    import ray.data as rd

    from .extras.maintenance import compact_parquet

    small = tempfile.mkdtemp(prefix="compact_in_")
    out = tempfile.mkdtemp(prefix="compact_out_")
    try:
        load(sf_dir, "documents", ["doc_id", "text"]).repartition(32).write_parquet(
            small
        )
        shutil.rmtree(out, ignore_errors=True)
        compact_parquet(small, out, target_rows_per_file=100_000)
        return pa.Table.from_pandas(
            rd.read_parquet(out).to_pandas(), preserve_index=False
        )
    finally:
        shutil.rmtree(small, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


SQL_COMPACT = "SELECT doc_id, text FROM documents"


# --------------------------------------------------------------------------
# ROWS-frame rolling sum
# --------------------------------------------------------------------------

ROLL_K = 5


def q_events_rolling_sum(sf_dir: str):
    """Per-user trailing-5-event value sum (ROWS frame, ordered by ts with
    event_id tie-break) — one range sort + halo'd lazy chunk tasks
    (`extras/window.rolling_sum_rows`); integer cents keep the sum
    order-independent."""
    from .extras.window import rolling_sum_rows

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").combine_chunks(),
                "user_id": batch.column("user_id").combine_chunks(),
                "ts": batch.column("ts").combine_chunks(),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    return rolling_sum_rows(
        ev.map_batches(_cents, batch_format="pyarrow"),
        "user_id",
        "ts",
        "event_id",
        "cents",
        ROLL_K,
    ).map_batches(
        lambda b: b.rename_columns(["event_id", "roll_cents"]), batch_format="pyarrow"
    )


SQL_ROLLING_SUM = f"""
SELECT event_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
         AS roll_cents
FROM events
"""


# --------------------------------------------------------------------------
# k-NN label classification over embeddings
# --------------------------------------------------------------------------

KNN_QUERIES = 50
KNN_K = 5


def q_embed_knn_classify(sf_dir: str):
    """5-NN majority-vote label prediction for the first 50 vectors against
    the whole embeddings corpus (self excluded) — the classic
    label-propagation / weak-annotation primitive. The distributed part is
    the exact cosine top-k scan (`brute_force_topk`: query block broadcast
    once, corpus streams); the vote folds over a bounded candidate set
    (queries x k rows). Ties: higher count wins, then smaller label."""
    from .extras.joins import semi_anti_join
    from .extras.similarity import brute_force_topk, load_query_vectors

    emb = load(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    q, qids = load_query_vectors(sf_dir, n=KNN_QUERIES)
    top = brute_force_topk(
        emb.select_columns(["vec_id", "embedding"]), q, qids, k=KNN_K
    ).take_all()
    cand_ids = sorted({r["vec_id"] for r in top})
    lab_rows = semi_anti_join(
        emb.select_columns(["vec_id", "label"]),
        __import__("ray").data.from_arrow(
            pa.table({"vec_id": pa.array(cand_ids, pa.int64())})
        ),
        on="vec_id",
    ).take_all()
    label = {r["vec_id"]: int(r["label"]) for r in lab_rows}
    votes: dict[int, dict[int, int]] = {}
    for r in top:
        votes.setdefault(r["query_id"], {})[label[r["vec_id"]]] = (
            votes.setdefault(r["query_id"], {}).get(label[r["vec_id"]], 0) + 1
        )
    qs = sorted(votes)
    pred = [
        min(votes[qq].items(), key=lambda kv: (-kv[1], kv[0]))[0] for qq in qs
    ]
    return pa.table(
        {
            "query_id": pa.array(qs, pa.int64()),
            "pred_label": pa.array(pred, pa.int64()),
        }
    )


SQL_KNN_CLASSIFY = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings ORDER BY vec_id LIMIT {KNN_QUERIES}),
     scores AS (SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
                FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id),
     ranked AS (SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY s DESC, vec_id) AS rn
                FROM scores),
     lab AS (SELECT r.query_id, e.label, count(*) AS c
             FROM ranked r JOIN embeddings e USING (vec_id)
             WHERE r.rn <= {KNN_K} GROUP BY r.query_id, e.label),
     best AS (SELECT query_id, label,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, label ASC) AS rn
              FROM lab)
SELECT query_id, CAST(label AS BIGINT) AS pred_label FROM best WHERE rn = 1
"""


# --------------------------------------------------------------------------
# right-to-be-forgotten deletion on the materialized store
# --------------------------------------------------------------------------

def q_kg_delete_subjects(sf_dir: str):
    """GDPR-style deletion: a customer graph is materialized (subject-hash
    partitions + manifests), then every customer with custkey % 7 == 0 is
    forgotten via `kg/incremental.delete_subjects` — ONLY the partitions
    those subjects hash to are rewritten (merge_delta discipline). The
    oracle pins the surviving triple set."""
    import shutil
    import tempfile

    import ray.data as rd

    from .kg.incremental import delete_subjects
    from .kg.materialize import materialize_triples, read_layout

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def _triples(b: pa.Table) -> pa.Table:
        def _c(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        subj = _c(
            pc.binary_join_element_wise(
                "urn:cust:", pc.cast(b.column("c_custkey"), pa.string()), ""
            )
        )
        nat = _c(
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
                    [nat, _c(b.column("c_mktsegment").combine_chunks().cast(pa.string()))]
                ),
                "obj_kind": pa.array(["iri"] * n + ["string"] * n),
            }
        )

    out = tempfile.mkdtemp(prefix="kg_forget_")
    try:
        materialize_triples(
            cust.map_batches(_triples, batch_format="pyarrow"),
            out,
            num_partitions=8,
            config={"q": "kg_delete_subjects"},
        )
        forget = cust.filter(
            lambda r: r["c_custkey"] % 7 == 0
        ).map_batches(
            lambda b: pa.table(
                {
                    "subj": pc.binary_join_element_wise(
                        "urn:cust:", pc.cast(b.column("c_custkey"), pa.string()), ""
                    )
                }
            ),
            batch_format="pyarrow",
        )
        delete_subjects(out, forget, delete_input="gdpr-batch-1")
        kept = (
            read_layout(out, "spo")
            .select_columns(["subj", "pred", "obj", "obj_kind"])
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return kept


SQL_KG_DELETE = """
WITH t AS (
  SELECT 'urn:cust:' || c_custkey AS subj, 'basedIn' AS pred,
         'urn:nation:' || c_nationkey AS obj, 'iri' AS obj_kind
  FROM customer WHERE c_custkey % 7 != 0
  UNION ALL
  SELECT 'urn:cust:' || c_custkey, 'inSegment', c_mktsegment, 'string'
  FROM customer WHERE c_custkey % 7 != 0)
SELECT DISTINCT subj, pred, obj, obj_kind FROM t
"""


EXTRAS5_REGISTRY.update(
    {
        "embed_scatter_matrix": QueryDef(q_embed_scatter_matrix, SQL_SCATTER),
        "events_rolling_sum": QueryDef(q_events_rolling_sum, SQL_ROLLING_SUM),
        "embed_knn_classify": QueryDef(q_embed_knn_classify, SQL_KNN_CLASSIFY),
        "kg_delete_subjects": QueryDef(q_kg_delete_subjects, SQL_KG_DELETE),
        "layout_zorder": QueryDef(q_layout_zorder, _sql_zorder()),
        "dedup_bloom_cross": QueryDef(q_dedup_bloom_cross, SQL_BLOOM_CROSS),
        "events_dedup_window": QueryDef(q_events_dedup_window, SQL_DEDUP_WINDOW),
        "corpus_compact_roundtrip": QueryDef(q_corpus_compact_roundtrip, SQL_COMPACT),
    }
)
