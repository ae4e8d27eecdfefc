"""Round-4 wave-7 operators with DuckDB oracles — the training-data audit
family: a mergeable rank-sketch (the 100-TB quantile path), cross-split
leakage detection, distribution-drift testing (exact two-sample KS),
containment near-dup scoring (quote / boilerplate-inclusion detection), and
int8 embedding quantization. Every query value-gated: either hash-exact SQL
or a deterministic error-bound scoreboard (the ``stats_hll_distinct``
pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import QueryDef, load
from .queries_extras import DUP_OFFSET, _corpus_with_dups

EXTRAS3_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# mergeable rank sketch — the sketch path for quantiles
# --------------------------------------------------------------------------

SKETCH_EPS = 0.005
SKETCH_QS = (0.1, 0.5, 0.9, 0.99)


def q_stats_rank_sketch(sf_dir: str):
    """Deterministic eps-rank quantile summary (extras/stats.py
    rank_sketch_quantiles): one streaming pass emits <= 1/eps weighted
    values per block, the driver merges the tiny summaries — quantiles
    WITHOUT the full range sort ``stats_quantiles`` pays. The summary is
    deterministic (stride subsampling, no randomness), so its rank-error
    bound eps*N + #blocks is an invariant; the scoreboard verifies each
    estimate's EXACT rank error against that bound (one counting pass), the
    same oracle pattern as stats_hll_distinct."""
    from .extras.stats import rank_sketch_quantiles

    ds = load(sf_dir, "lineitem", ["l_extendedprice"])
    est, total, blocks = rank_sketch_quantiles(
        ds, "l_extendedprice", list(SKETCH_QS), eps=SKETCH_EPS
    )
    ev = np.array([v if v is not None else np.nan for v in est.column("value").to_pylist()])

    def _counts(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        lt = np.array([(v < e).sum() for e in ev], dtype=np.int64)
        le = np.array([(v <= e).sum() for e in ev], dtype=np.int64)
        return pa.table({"lt": pa.array([lt.tobytes()]), "le": pa.array([le.tobytes()])})

    lt = np.zeros(len(ev), np.int64)
    le = np.zeros(len(ev), np.int64)
    for b in ds.map_batches(_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for plt, ple in zip(b.column("lt").to_pylist(), b.column("le").to_pylist()):
            lt += np.frombuffer(plt, np.int64)
            le += np.frombuffer(ple, np.int64)
    bound = SKETCH_EPS * total + blocks
    ok = []
    for q, l, u in zip(SKETCH_QS, lt, le):
        target = max(1, min(total, int(np.ceil(q * total))))
        err = 0 if l + 1 <= target <= u else min(abs(target - (l + 1)), abs(target - u))
        ok.append(int(err <= bound))
    return pa.table(
        {"q": pa.array(SKETCH_QS, pa.float64()), "within_bound": pa.array(ok, pa.int64())}
    )


SQL_STATS_RANK_SKETCH = " UNION ALL ".join(
    f"SELECT CAST({q} AS DOUBLE) AS q, CAST(1 AS BIGINT) AS within_bound"
    for q in SKETCH_QS
)


# --------------------------------------------------------------------------
# cross-split leakage — train/eval contamination audit
# --------------------------------------------------------------------------

LEAK_SALT = 7
LEAK_TRAIN_FRAC = 0.8


def q_corpus_split_leakage(sf_dir: str):
    """Exact-hash train/eval contamination count over a corpus with planted
    exact duplicates (documents ∪ identical copies at doc_id + 1e6; the
    SplitMix64 split scatters each copy independently of its original, so a
    deterministic ~train_frac share of eval docs leak). Shape: stateless
    split assignment, 16 B content hashes, distinct-train-set by sort +
    boundary scan, ONE int64 semi-join — the corpus text never shuffles."""
    from .extras.shuffle import split_leakage

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _dup(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dup = pa.table(
            {
                "doc_id": pa.array(ids + DUP_OFFSET, pa.int64()),
                "text": batch.column("text").combine_chunks(),
            }
        )
        return pa.concat_tables([batch.select(["doc_id", "text"]), dup])

    corpus = docs.map_batches(_dup, batch_format="pyarrow")
    return split_leakage(
        corpus, "doc_id", "text", train_frac=LEAK_TRAIN_FRAC, salt=LEAK_SALT
    )


def _sql_split_leakage() -> str:
    from .extras.shuffle import sql_sm64_chain

    edge = min(int(LEAK_TRAIN_FRAC * 2**64), 2**64 - 1)
    chain = sql_sm64_chain("corpus", "doc_id", LEAK_SALT)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents
), {chain},
assigned AS (SELECT doc_id, text, h < {edge} AS is_train FROM h3),
tr AS (SELECT DISTINCT text FROM assigned WHERE is_train),
ev AS (SELECT text FROM assigned WHERE NOT is_train)
SELECT (SELECT count(*) FROM assigned WHERE is_train) AS n_train,
       (SELECT count(*) FROM ev) AS n_eval,
       (SELECT count(*) FROM ev WHERE EXISTS (SELECT 1 FROM tr WHERE tr.text = ev.text))
         AS n_leaked
"""


# --------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov — split / corpus-version drift test
# --------------------------------------------------------------------------

def q_stats_ks_drift(sf_dir: str):
    """EXACT two-sample KS statistic between order-value distributions of
    urgent vs low-priority orders (extras/stats.py ks_two_sample): the
    numerator max |c_a·n_b − c_b·n_a| over distinct values is pure int64 —
    no float CDF accumulation — via one narrow range sort + carry-chained
    per-block scans (tie-safe at block boundaries via each block's
    next-first value)."""
    from .extras.stats import ks_two_sample

    t = ks_two_sample(
        load(sf_dir, "orders", ["o_totalprice", "o_orderpriority"]),
        "o_totalprice",
        "o_orderpriority",
        "1-URGENT",
        "5-LOW",
    )
    na = t.column("n_a")[0].as_py()
    nb = t.column("n_b")[0].as_py()
    dn = t.column("d_num")[0].as_py()
    d = dn / (na * nb) if na and nb else 0.0
    return t.append_column("d", pa.array([d], pa.float64()))


SQL_STATS_KS = """
WITH f AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
tot AS (SELECT CAST(count(*) FILTER (WHERE g = 0) AS BIGINT) AS na,
               CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS nb FROM f),
dv AS (SELECT v, CAST(count(*) FILTER (WHERE g = 0) AS BIGINT) AS c0,
              CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS c1
       FROM f GROUP BY v),
cum AS (SELECT v, sum(c0) OVER (ORDER BY v) AS ca, sum(c1) OVER (ORDER BY v) AS cb
        FROM dv)
SELECT na AS n_a, nb AS n_b,
       CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
       CAST(max(abs(ca * nb - cb * na)) AS DOUBLE) / (na * nb) AS d
FROM cum, tot GROUP BY na, nb
"""


# --------------------------------------------------------------------------
# containment near-dup — quote / boilerplate-inclusion detector
# --------------------------------------------------------------------------

def q_dedup_containment(sf_dir: str):
    """EXACT all-pairs max-containment |A∩B| / min(|A|,|B|) >= 0.9 over the
    perturbed corpus — the asymmetric sibling of dedup_ngram_jaccard: a
    truncated copy's shingles are a strict SUBSET of its original's, so
    every planted pair scores exactly 1.0 here regardless of length ratio
    (Jaccard decays with the cut size). Same inverted shingle index, same
    sort-scan reductions; only the scoring map differs."""
    from .extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _corpus_with_dups(sf_dir),
        "text",
        "doc_id",
        threshold=0.9,
        shingle_k=3,
        score="containment",
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET},
         CASE WHEN strpos(text, ' ') > 0 THEN regexp_replace(text, ' \\S+$', '') ELSE text END
  FROM documents
),
tok AS (SELECT id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus),
sh AS (SELECT DISTINCT id, s FROM (
         SELECT id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
         FROM tok, unnest(generate_series(1, len(toks) - 2)) AS t(i)
         WHERE len(toks) >= 3
         UNION ALL
         SELECT id, text AS s FROM tok WHERE len(toks) < 3
       ) u),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
pair_inter AS (SELECT a.id AS ia, b.id AS ib, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id)
SELECT ia AS id_a, ib AS id_b,
       CAST(inter AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM pair_inter
JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib
WHERE CAST(inter AS DOUBLE) / least(sa.n, sb.n) >= 0.9
"""


# --------------------------------------------------------------------------
# int8 embedding quantization — the 4x-memory vector-search path
# --------------------------------------------------------------------------

def q_embed_quantize_int8(sf_dir: str):
    """Scalar int8 quantization of the embedding column (extras/similarity
    quantize_int8): streaming per-dimension extrema -> broadcast bounds ->
    one vectorized code pass. The quantizer expression's op order is
    IEEE-reproducible, so the oracle recomputes all 64 codes per vector in
    SQL; the per-vector Σ code_d · d checksum makes the match value-exact."""
    from .extras.similarity import quantize_int8

    return quantize_int8(load(sf_dir, "embeddings", ["vec_id", "embedding"]), "embedding", "vec_id")


SQL_EMBED_QUANTIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
dims AS (SELECT vec_id, t.i AS d, emb[t.i] AS x
         FROM e, unnest(generate_series(1, len(emb))) AS t(i)),
bounds AS (SELECT d, min(x) AS mn, max(x) AS mx FROM dims GROUP BY d),
codes AS (SELECT vec_id, dims.d,
                 CASE WHEN mx > mn
                      THEN floor((x - mn) * 255.0 / (mx - mn) + 0.5)
                      ELSE 0 END AS code
          FROM dims JOIN bounds USING (d))
SELECT vec_id, CAST(sum(code * d) AS BIGINT) AS code_sum FROM codes GROUP BY vec_id
"""


EXTRAS3_REGISTRY.update(
    {
        "stats_rank_sketch": QueryDef(q_stats_rank_sketch, SQL_STATS_RANK_SKETCH),
        "corpus_split_leakage": QueryDef(q_corpus_split_leakage, _sql_split_leakage()),
        "stats_ks_drift": QueryDef(q_stats_ks_drift, SQL_STATS_KS),
        "dedup_containment": QueryDef(q_dedup_containment, SQL_DEDUP_CONTAINMENT),
        "embed_quantize_int8": QueryDef(q_embed_quantize_int8, SQL_EMBED_QUANTIZE),
    }
)


# --------------------------------------------------------------------------
# sqrt-temperature mixture — multilingual upsampling
# --------------------------------------------------------------------------

TEMP_SALT = 13


def q_corpus_temperature_mix(sf_dir: str):
    """Square-root temperature rebalancing over the language column
    (extras/shuffle.temperature_upsample): every language upsampled by
    sqrt(n_max / n_lang), the multilingual-corpus standard at alpha = 0.5.
    alpha is FIXED at 0.5 because sqrt and one division are the only
    IEEE-correctly-rounded ops in the weight path — the oracle recomputes
    the exact thresholds with no pow()-libm hazard. The expansion itself is
    mixture_sample's stateless deterministic fan-out (no shuffle)."""
    from .extras.shuffle import temperature_upsample

    return temperature_upsample(
        load(sf_dir, "documents", ["doc_id", "lang"]), "lang", "doc_id", salt=TEMP_SALT
    )


def _sql_temperature_mix() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain("(SELECT doc_id, lang FROM documents)", "doc_id", TEMP_SALT)
    return f"""
WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
mx AS (SELECT max(n) AS nmax FROM counts),
w AS (SELECT lang, sqrt(CAST(nmax AS DOUBLE) / n) AS f FROM counts, mx),
plan AS (SELECT lang, CAST(floor(f) AS BIGINT) AS base,
                CAST(trunc((f - floor(f)) * 18446744073709551616.0) AS HUGEINT) AS thr
         FROM w), {chain},
expanded AS (SELECT d.doc_id, d.lang,
                    p.base + CASE WHEN d.h < p.thr THEN 1 ELSE 0 END AS copies
             FROM h3 d JOIN plan p USING (lang))
SELECT doc_id, lang, CAST(t.i AS BIGINT) AS copy_idx
FROM expanded, unnest(generate_series(0, copies - 1)) AS t(i)
WHERE copies > 0
"""


# --------------------------------------------------------------------------
# corpus version diff — the recrawl delta
# --------------------------------------------------------------------------

def q_corpus_version_diff(sf_dir: str):
    """Recrawl delta classification (extras/diff.corpus_version_diff): v2 is
    a deterministic perturbation of the corpus (docs with id%11==3 removed,
    id%7==0 edited, id%13==1 re-added under new ids) and every id is
    classified added/removed/changed/unchanged by content hash — text never
    shuffles, only 24 B (id, hash) rows ride the one full-outer join."""
    from .extras.diff import corpus_version_diff

    v1 = load(sf_dir, "documents", ["doc_id", "text"])

    def _v2(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = np.array(batch.column("text").to_pylist(), dtype=object)
        keep = ids % 11 != 3
        kids, ktxt = ids[keep], texts[keep]
        edit = kids % 7 == 0
        ktxt = ktxt.copy()
        ktxt[edit] = np.array([t + " [v2]" for t in ktxt[edit]], dtype=object)
        add = ids % 13 == 1
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([kids, ids[add] + DUP_OFFSET]), pa.int64()
                ),
                "text": pa.array(
                    np.concatenate([ktxt, texts[add]]), pa.string()
                ),
            }
        )

    v2 = v1.map_batches(_v2, batch_format="pyarrow")
    return corpus_version_diff(v1, v2, "doc_id", "text")


SQL_CORPUS_VERSION_DIFF = f"""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents WHERE doc_id % 13 = 1
),
j AS (SELECT a.text AS t1, b.text AS t2
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
SELECT 'added' AS change_type,
       CAST(count(*) FILTER (WHERE t1 IS NULL) AS BIGINT) AS n FROM j
UNION ALL SELECT 'removed', CAST(count(*) FILTER (WHERE t2 IS NULL) AS BIGINT) FROM j
UNION ALL SELECT 'changed',
       CAST(count(*) FILTER (WHERE t1 IS NOT NULL AND t2 IS NOT NULL AND t1 <> t2) AS BIGINT) FROM j
UNION ALL SELECT 'unchanged', CAST(count(*) FILTER (WHERE t1 = t2) AS BIGINT) FROM j
"""


# --------------------------------------------------------------------------
# column profiling — completeness / cardinality report
# --------------------------------------------------------------------------

PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_stats_profile(sf_dir: str):
    """Per-column ingest profile (extras/stats.profile_columns): null count,
    exact distinct count, min, max for the numeric lineitem columns — one
    streaming extrema/null fold plus one narrow sort-scan distinct pass per
    column."""
    from .extras.stats import profile_columns

    return profile_columns(load(sf_dir, "lineitem", list(PROFILE_COLS)), list(PROFILE_COLS))


SQL_STATS_PROFILE = " UNION ALL ".join(
    f"SELECT '{c}' AS column, CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    f"CAST(min({c}) AS DOUBLE) AS min_v, CAST(max({c}) AS DOUBLE) AS max_v "
    "FROM lineitem"
    for c in PROFILE_COLS
)


# --------------------------------------------------------------------------
# grouped rank sketch — per-group mergeability scoreboard
# --------------------------------------------------------------------------

GROUP_SKETCH_QS = (0.25, 0.9)


def q_stats_group_rank_sketch(sf_dir: str):
    """Per-group mergeable eps-rank sketch with its own exact-rank
    scoreboard (extras/stats.group_rank_sketch_check): per-(group, block)
    stride summaries merge associatively per group — the property that lets
    the sketch replace per-group sorts at 100 TB. One row per
    (priority, q); within_bound gates the exact rank error against
    eps·n_group + #blocks."""
    from .extras.stats import group_rank_sketch_check

    return group_rank_sketch_check(
        load(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        "o_orderpriority",
        "o_totalprice",
        list(GROUP_SKETCH_QS),
        eps=0.01,
    )


SQL_STATS_GROUP_SKETCH = (
    "SELECT DISTINCT o_orderpriority AS grp, CAST(t.q AS DOUBLE) AS q, "
    "CAST(1 AS BIGINT) AS within_bound FROM orders, "
    f"(VALUES {', '.join(f'({q})' for q in GROUP_SKETCH_QS)}) AS t(q)"
)


EXTRAS3_REGISTRY.update(
    {
        "corpus_temperature_mix": QueryDef(
            q_corpus_temperature_mix, _sql_temperature_mix()
        ),
        "corpus_version_diff": QueryDef(q_corpus_version_diff, SQL_CORPUS_VERSION_DIFF),
        "stats_profile": QueryDef(q_stats_profile, SQL_STATS_PROFILE),
        "stats_group_rank_sketch": QueryDef(
            q_stats_group_rank_sketch, SQL_STATS_GROUP_SKETCH
        ),
    }
)


# --------------------------------------------------------------------------
# product-quantization ANN — the 32x-compressed vector-search path
# --------------------------------------------------------------------------

def q_ann_pq_topk(sf_dir: str):
    """PQ ANN gated on deterministic recall (ann_lsh_topk style): the
    planted cosine-1.0 twin encodes to EXACTLY the query's own PQ code
    (identical vector, identical argmin), so its ADC score equals the
    query's self-reconstruction score — the maximum any same-code vector
    can reach — and the 16^8 code space makes same-code strangers
    vanishingly rare. The twin must appear in every query's top-10;
    a regression in codebook training, encoding, or table lookup flips the
    one-row scoreboard and hash-mismatches."""
    from .extras.similarity import load_query_vectors, pq_topk
    from .queries_extras import _planted_embeddings

    corpus = _planted_embeddings(sf_dir)
    q, qids = load_query_vectors(sf_dir, n=5)
    hits = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(corpus, q, qids, k=10, m=8, ksub=16).take_all()
    }
    found = sum(1 for qid in qids if (qid, qid + DUP_OFFSET) in hits)
    return pa.table(
        {"twin_recall_ok": pa.array([int(found == len(qids))], pa.int64())}
    )


SQL_ANN_PQ_RECALL = "SELECT CAST(1 AS BIGINT) AS twin_recall_ok"


EXTRAS3_REGISTRY.update(
    {"ann_pq_topk": QueryDef(q_ann_pq_topk, SQL_ANN_PQ_RECALL)}
)
