"""Training-data extras + relational operator queries with DuckDB oracles.

Dedup / similarity / text-analysis over ``documents``/``embeddings`` plus the
classic relational shapes (pre-aggregated groupby, broadcast join, sort/limit,
windowed aggregate, sessionization) over the TPC-H-ish tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .queries import QueryDef, load

DUP_OFFSET = 1_000_000


# --------------------------------------------------------------------------
# dedup family
# --------------------------------------------------------------------------

def _corpus_with_dups(sf_dir: str) -> rd.Dataset:
    """documents ∪ perturbed copies (doc_id + 1e6, last word dropped) — the
    deterministic near-duplicate corpus used by the pair-finding oracles."""
    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _perturb(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        cut = [t.rsplit(" ", 1)[0] if t and " " in t else t for t in texts]
        dup = pa.table(
            {
                "doc_id": pa.array(ids + DUP_OFFSET, pa.int64()),
                "text": pa.array(cut, pa.string()),
            }
        )
        return pa.concat_tables([batch.select(["doc_id", "text"]), dup])

    return docs.map_batches(_perturb, batch_format="pyarrow")


def q_dedup_exact(sf_dir: str):
    """Exact dedup keepers: min doc_id per identical text."""
    from .extras.dedup import exact_dedup

    return exact_dedup(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


SQL_DEDUP_EXACT = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs over the perturbed corpus. The corpus's
    true pair-jaccard distribution is bimodal (planted near-dups >= 0.78,
    unrelated < 0.3), so with 32 bands x 2 rows the LSH miss probability is
    ~1e-13 per true pair and in-bucket verification removes false candidates
    — a probabilistic operator with an exact SQL oracle."""
    from .extras.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _corpus_with_dups(sf_dir), "text", "doc_id", bands=32, verify_threshold=0.5
    )
    return pairs.select_columns(["id_a", "id_b"])


# shared CTE body: the perturbed corpus and its exact word-3-shingle
# jaccard >= 0.5 duplicate pairs (the ground truth the bimodal corpus makes
# LSH hit exactly) — used by both the pair oracle and the cluster oracle
_SQL_DUP_CTES = f"""corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET},
         CASE WHEN strpos(text, ' ') > 0 THEN regexp_replace(text, ' \\S+$', '') ELSE text END
  FROM documents
),
tok AS (SELECT id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus),
sh AS (SELECT DISTINCT id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
       FROM tok, unnest(generate_series(1, len(toks) - 2)) AS t(i)
       WHERE len(toks) >= 3),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
pair_inter AS (SELECT a.id AS ia, b.id AS ib, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id),
dup AS (SELECT ia AS id_a, ib AS id_b FROM pair_inter
        JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5)"""

SQL_DEDUP_MINHASH = f"WITH {_SQL_DUP_CTES}\nSELECT id_a, id_b FROM dup"


def q_dedup_cluster_keep(sf_dir: str):
    """Full dedup resolution, not just pairs: minhash near-dup pairs ->
    connected components (distributed min-label contraction) -> every doc
    mapped to its cluster keeper (min id; itself when unique). The output is
    what a training-data pipeline actually consumes — filter
    doc_id == keeper_id keeps one representative per duplicate cluster."""
    from .extras.dedup import cluster_keepers, minhash_lsh_pairs

    corpus = _corpus_with_dups(sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=32, verify_threshold=0.5
    ).select_columns(["id_a", "id_b"])
    return cluster_keepers(corpus, pairs, id_col="doc_id")


# min reachable id per document over the exact-jaccard pair graph
# (recursive closure is fine at oracle scale; the Ray side contracts)
SQL_DEDUP_CLUSTER = f"""
WITH RECURSIVE {_SQL_DUP_CTES},
edges AS (SELECT id_a AS a, id_b AS b FROM dup
          UNION ALL SELECT id_b, id_a FROM dup),
reach(id, r) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, min(r) AS keeper_id FROM reach GROUP BY id
"""


def q_corpus_clean(sf_dir: str):
    """Flagship training-data prep composite: token-count quality gate ->
    minhash near-dup pairs among survivors -> cluster keepers -> loser
    anti-filter. Output: kept (doc_id, n_tokens). Fully SQL-expressible, so
    the whole composition is value-level oracle-checked end to end."""
    from .extras.cleanse import clean_corpus

    return clean_corpus(_corpus_with_dups(sf_dir), "text", "doc_id", min_tokens=30)


# same composition in SQL: gate -> both-survivor dup pairs -> component
# closure over survivors -> keep min-id representatives
SQL_CORPUS_CLEAN = f"""
WITH RECURSIVE {_SQL_DUP_CTES},
q AS (SELECT id, CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM corpus),
surv AS (SELECT id, n_tokens FROM q WHERE n_tokens >= 30),
sedges AS (
  SELECT d.id_a AS a, d.id_b AS b FROM dup d
  JOIN surv sa ON sa.id = d.id_a JOIN surv sb ON sb.id = d.id_b
  UNION ALL
  SELECT d.id_b, d.id_a FROM dup d
  JOIN surv sa ON sa.id = d.id_a JOIN surv sb ON sb.id = d.id_b
),
reach(id, r) AS (
  SELECT id, id FROM surv
  UNION
  SELECT e.a, reach.r FROM sedges e JOIN reach ON reach.id = e.b
)
SELECT s.id AS doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens
FROM surv s JOIN (SELECT id, min(r) AS keeper FROM reach GROUP BY id) k
ON s.id = k.id AND s.id = k.keeper
"""


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs. 4x16-bit banding is LOSSLESS for hamming <= 3
    (pigeonhole: 3 flipped bits cannot touch all 4 bands), so the output is
    the exact all-pairs hamming<=3 set — and the token hash (md5 first 8
    bytes LE == DuckDB md5_number_upper) makes the whole signature
    SQL-expressible: a full value-level oracle, not rows-only."""
    from .extras.dedup import simhash_dup_pairs

    pairs = simhash_dup_pairs(_corpus_with_dups(sf_dir), "text", "doc_id", max_hamming=3)
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "id_a": b.column("id_a").combine_chunks(),
                "id_b": b.column("id_b").combine_chunks(),
                "hamming": pc.cast(b.column("hamming"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_DEDUP_SIMHASH = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET},
         CASE WHEN strpos(text, ' ') > 0 THEN regexp_replace(text, ' \\S+$', '') ELSE text END
  FROM documents
),
tok AS (SELECT id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM corpus WHERE trim(text) <> ''),
th AS (SELECT id, md5_number_upper(t) AS h FROM tok),
bits AS (SELECT id, b.b AS b,
                sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) AS b
         GROUP BY id, b.b),
sig0 AS (SELECT id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS UBIGINT) << b)
                                  ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS s
         FROM bits GROUP BY id),
sig AS (SELECT c.id, coalesce(sig0.s, CAST(0 AS UBIGINT)) AS s
        FROM corpus c LEFT JOIN sig0 ON c.id = sig0.id)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.s, b.s)) <= 3
"""


def q_dedup_embedding(sf_dir: str):
    """Embedding cosine near-dup pairs at threshold 0.45."""
    from .extras.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        load(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding",
        "vec_id",
        threshold=0.45,
    )
    return pairs.select_columns(["id_a", "id_b"])


SQL_DEDUP_EMBEDDING = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


def _planted_embeddings(sf_dir: str) -> rd.Dataset:
    """embeddings ∪ x2-scaled copies at vec_id+1e6 — each planted pair has
    cosine exactly 1.0 (identical direction), so hyperplane LSH buckets the
    twins together in EVERY table: deterministic recall for the oracles."""
    base = load(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        vecs = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        dup = pa.table(
            {
                "vec_id": pa.array(ids + DUP_OFFSET, pa.int64()),
                "embedding": pa.array(list(vecs * 2.0), pa.list_(pa.float64())),
            }
        )
        orig = pa.table(
            {
                "vec_id": pc.cast(batch.column("vec_id"), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
        return pa.concat_tables([orig, dup])

    return base.map_batches(_plant, batch_format="pyarrow")


def q_dedup_embedding_lsh(sf_dir: str):
    """Hyperplane-LSH near-dup pairs at threshold 0.9 over the planted-dup
    corpus — unrelated pairs top out near 0.5 and are killed by exact
    verification, planted twins are caught deterministically."""
    from .extras.dedup import embedding_dup_pairs_lsh

    pairs = embedding_dup_pairs_lsh(
        _planted_embeddings(sf_dir), "embedding", "vec_id", threshold=0.9
    )
    return pairs.select_columns(["id_a", "id_b"])


SQL_DEDUP_EMBEDDING_LSH = f"""
WITH corpus AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET}, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)
  FROM embeddings
)
SELECT a.id AS id_a, b.id AS id_b FROM corpus a JOIN corpus b ON a.id < b.id
WHERE list_cosine_similarity(a.e, b.e) >= 0.9
"""


def q_dedup_ngram_jaccard(sf_dir: str):
    """EXACT all-pairs word-3-shingle Jaccard >= 0.5 over the perturbed
    corpus — the no-sketch dedup baseline (minhash approximates this set;
    here the inverted shingle-index self-join finds every qualifying pair).
    Values carry the jaccard itself, so the oracle checks the similarity
    numbers, not just pair membership."""
    from .extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _corpus_with_dups(sf_dir), "text", "doc_id", threshold=0.5, shingle_k=3
    )


# the kernel gives texts shorter than k words ONE whole-text shingle
# (shingle_hash_batch) — the oracle mirrors that branch
SQL_DEDUP_NGRAM_JACCARD = f"""
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
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM pair_inter
JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
"""


# --------------------------------------------------------------------------
# multimodal
# --------------------------------------------------------------------------

def q_multimodal_decode(sf_dir: str):
    """Binary media columns end-to-end: attach REAL PNG payloads with
    closed-form pixels to every document, decode them in the actor-pool
    stage (pure-python zlib PNG path — no codec library), emit integer pixel
    stats. The oracle recomputes the pixel closed form in SQL, so a value
    match certifies the full encode -> binary column -> actor decode
    roundtrip, not just row counts."""
    from .extras.multimodal import attach_media_affine, decode_media_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return decode_media_stats(attach_media_affine(docs, "doc_id"))


SQL_MULTIMODAL_DECODE = """
SELECT d.doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       (SELECT CAST(sum((d.doc_id * 31 + t.i * t.i) % 256) AS BIGINT)
        FROM unnest(range(256)) AS t(i)) AS pixel_sum
FROM documents d
"""


def q_multimodal_jpeg_stats(sf_dir: str):
    """LOSSY codec end-to-end with a value-level oracle: attach REAL baseline
    JPEG payloads (numpy-only codec, ``extras/jpeg.py``) whose 8x8 blocks are
    flat grays ``(doc_id*37 + b*59) % 256``, decode them through the real
    Huffman+IDCT path in the actor-pool stats stage, and compare pixel sums
    against the closed-form reconstruction ``clip(3*round((g-128)/3)+128)``
    recomputed in SQL (DC quantizer 24 => exact-thirds grid, so numpy
    banker's rounding and SQL half-away ROUND agree — see the jpeg module
    docstring)."""
    from .extras.multimodal import attach_media_jpeg_flat, decode_media_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return decode_media_stats(attach_media_jpeg_flat(docs, "doc_id"))


SQL_MULTIMODAL_JPEG_STATS = """
SELECT d.doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       (SELECT CAST(sum(64 * LEAST(255, GREATEST(0,
                3 * ROUND(((d.doc_id * 37 + t.b * 59) % 256 - 128) / 3.0)
                + 128))) AS BIGINT)
        FROM unnest(range(4)) AS t(b)) AS pixel_sum
FROM documents d
"""


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 vectors (exact baseline)."""
    from .extras.similarity import brute_force_topk, load_query_vectors

    q, qids = load_query_vectors(sf_dir, n=5)
    res = brute_force_topk(
        load(sf_dir, "embeddings", ["vec_id", "embedding"]), q, qids, k=10
    )
    return res.select_columns(["query_id", "vec_id"])


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings ORDER BY vec_id LIMIT 5),
scores AS (SELECT q.query_id, e.vec_id,
                  list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
           FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id),
ranked AS (SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
           FROM scores)
SELECT query_id, vec_id FROM ranked WHERE rn <= 10
"""


def q_ann_lsh_topk(sf_dir: str):
    """LSH-bucketed ANN gated on deterministic recall: over the planted-twin
    corpus (each base vector has an exact cosine-1.0 copy at id+1e6, which
    hyperplane LSH buckets with the query in EVERY table), the twin must
    appear in each query's LSH top-10. Returns a 1-row scoreboard
    (kg_text_invariant style) so the probabilistic operator gets a real
    oracle — a recall regression flips the flag and hash-mismatches.
    (On unstructured random embeddings LSH top-k recall is inherently low —
    that behavior is characterized rows-only in tests, not gated here.)"""
    from .extras.similarity import lsh_topk, load_query_vectors

    corpus = _planted_embeddings(sf_dir)
    q, qids = load_query_vectors(sf_dir, n=5)
    hits = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(corpus, q, qids, k=10).take_all()
    }
    found = sum(1 for qid in qids if (qid, qid + DUP_OFFSET) in hits)
    return pa.table(
        {"twin_recall_ok": pa.array([int(found == len(qids))], pa.int64())}
    )


SQL_ANN_LSH_RECALL = "SELECT CAST(1 AS BIGINT) AS twin_recall_ok"


def q_ann_ivf_topk(sf_dir: str):
    """IVF ANN gated on deterministic recall (ann_lsh_topk style): the
    planted cosine-1.0 twin shares its nearest coarse centroid with the
    query by construction, so any nprobe >= 1 must surface it in the top-10.
    One-row scoreboard; a recall regression hash-mismatches."""
    from .extras.similarity import ivf_topk, load_query_vectors

    corpus = _planted_embeddings(sf_dir)
    q, qids = load_query_vectors(sf_dir, n=5)
    hits = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(corpus, q, qids, k=10, nlist=16, nprobe=2).take_all()
    }
    found = sum(1 for qid in qids if (qid, qid + DUP_OFFSET) in hits)
    return pa.table(
        {"twin_recall_ok": pa.array([int(found == len(qids))], pa.int64())}
    )


SQL_ANN_IVF_RECALL = "SELECT CAST(1 AS BIGINT) AS twin_recall_ok"


def q_ann_ivf_exact(sf_dir: str):
    """IVF with nprobe == nlist probes every list — mathematically identical
    to exact brute force, so the full IVF machinery (hash-residue sampling,
    spherical k-means, per-batch list assignment, probe-mask pruning,
    distributed merge) is calibrated against the SAME hash-exact SQL oracle
    as ann_cosine_topk."""
    from .extras.similarity import ivf_topk, load_query_vectors

    q, qids = load_query_vectors(sf_dir, n=5)
    res = ivf_topk(
        load(sf_dir, "embeddings", ["vec_id", "embedding"]),
        q, qids, k=10, nlist=16, nprobe=16,
    )
    return res.select_columns(["query_id", "vec_id"])


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def q_text_tokens(sf_dir: str):
    from .extras.textstats import token_counts

    return token_counts(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


SQL_TEXT_TOKENS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def q_text_bpe_tokens(sf_dir: str):
    """BPE-style pre-tokenizer counts (letter/digit runs + punctuation)."""
    from .extras.textstats import bpe_token_counts

    return bpe_token_counts(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


SQL_TEXT_BPE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
FROM documents
"""

def q_text_quality(sf_dir: str):
    from .extras.textstats import quality_scores

    return quality_scores(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


SQL_TEXT_QUALITY = """
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> x IN ('the','a','of','and','is','in','to'))) END AS n_sw
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN n_tokens > 0 THEN CAST(n_sw AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END AS alpha_ratio
FROM t
"""


def q_text_langid(sf_dir: str):
    """Deterministic language-ID heuristic. The heuristic itself (distinct
    marker-word counts, argmax with the fixed en>de>fr>es tie order, 30%%
    non-ascii charset gate) is exactly replicated in SQL — a value-level
    oracle on the PREDICTION, independent of the corpus's decorative lang
    labels."""
    from .extras.textstats import language_id

    return language_id(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


# exact replica of the marker heuristic: zh only via the charset gate (its
# marker set is empty and all-zero ties resolve to en first)
SQL_TEXT_LANGID = """
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^[:ascii:]]', '', 'g')) AS n_nonascii,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tk
  FROM documents),
n AS (
  SELECT doc_id, n_chars, n_nonascii,
         len(list_filter(tk, x -> x IN ('the','and','is','of','to'))) AS n_en,
         len(list_filter(tk, x -> x IN ('der','die','und','ist','das'))) AS n_de,
         len(list_filter(tk, x -> x IN ('le','la','et','est','les'))) AS n_fr,
         len(list_filter(tk, x -> x IN ('el','la','y','es','los'))) AS n_es
  FROM t)
SELECT doc_id,
  CASE WHEN n_chars > 0 AND CAST(n_nonascii AS DOUBLE) / n_chars > 0.3 THEN 'zh'
       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       WHEN n_fr >= n_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM n
"""


def q_text_fingerprint(sf_dir: str):
    """Content md5 fingerprint (the winnowing variant is tested separately)."""
    from .extras.textstats import fingerprints

    fp = fingerprints(load(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")
    return fp.select_columns(["doc_id", "md5"])


SQL_TEXT_FINGERPRINT = "SELECT doc_id, md5(text) AS md5 FROM documents"


# --------------------------------------------------------------------------
# relational shapes
# --------------------------------------------------------------------------

def q_agg_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pre-aggregated groupby: partial sums inside map_batches,
    then a tiny groupby over per-batch partials (the combiner pattern — the
    shuffle moves #groups x #batches rows, not the table)."""
    ds = load(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        # exact integer-unit sums (cents): float summation order differs
        # between Ray partial aggregation and any SQL engine, so plain double
        # sums are not bit-reproducible; integer sums are order-independent.
        # Arrow-native group_by — no pandas round-trip in the hot combiner
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag").combine_chunks(),
                "l_linestatus": batch.column("l_linestatus").combine_chunks(),
                "qty_i": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
                "price_c": pc.cast(
                    pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0)), pa.int64()
                ),
                "disc_c": pc.cast(
                    pc.round(pc.multiply(batch.column("l_discount"), 100.0)), pa.int64()
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_i", "sum"), ("price_c", "sum"), ("disc_c", "sum"), ("qty_i", "count")]
        )
        return g.select(
            ["l_returnflag", "l_linestatus", "qty_i_sum", "price_c_sum", "disc_c_sum", "qty_i_count"]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_i", "sum_price_c", "sum_disc_c", "count_order"]
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty_i", "sum_price_c", "sum_disc_c", "count_order"])
    )

    def _finish(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("sum(sum_qty_i)"), pa.float64())
        cnt = pc.cast(batch.column("sum(count_order)"), pa.int64())
        price = pc.divide(pc.cast(batch.column("sum(sum_price_c)"), pa.float64()), 100.0)
        disc = pc.divide(pc.cast(batch.column("sum(sum_disc_c)"), pa.float64()), 100.0)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag").combine_chunks(),
                "l_linestatus": batch.column("l_linestatus").combine_chunks(),
                "sum_qty": qty,
                "sum_base_price": price,
                "avg_disc": pc.divide(disc, pc.cast(cnt, pa.float64())),
                "count_order": cnt,
            }
        )

    return final.map_batches(_finish, batch_format="pyarrow")


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
       (CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_join_customer_geo(sf_dir: str):
    """Broadcast join: nation+region ride the closure once; no shuffle."""
    from .queries import _geo_lookup, _with_geo

    ds = _with_geo(load(sf_dir, "customer", ["c_custkey", "c_nationkey"]), _geo_lookup(sf_dir))
    return ds.select_columns(["c_custkey", "n_name", "r_name"])


SQL_JOIN_GEO = """
SELECT c_custkey, n_name, r_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
"""


def q_top_orders(sf_dir: str):
    """sort desc + limit with deterministic tie-break."""
    ds = load(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: truncate-to-hour + groupby."""
    ds = load(sf_dir, "events", ["ts", "event_type", "value"])

    def _trunc(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        # micro-unit integers: order-independent exact sums (see pricing note)
        micro = pc.cast(pc.round(pc.multiply(batch.column("value"), 1e6)), pa.int64())
        return pa.table(
            {
                "event_type": batch.column("event_type").combine_chunks(),
                "hour": hour,
                "value_u": micro,
            }
        )

    g = ds.map_batches(_trunc, batch_format="pyarrow").groupby(["event_type", "hour"]).sum("value_u")

    def _fin(batch: pa.Table) -> pa.Table:
        sv = pc.divide(pc.cast(batch.column("sum(value_u)"), pa.float64()), 1e6)
        return pa.table(
            {
                "event_type": batch.column("event_type").combine_chunks(),
                "hour": batch.column("hour").combine_chunks(),
                "sum_value": sv,
            }
        )

    return g.map_batches(_fin, batch_format="pyarrow")


SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (30 min) per user WITHOUT a per-group UDF:
    one range sort by (user, ts, event_id), then a vectorized per-block
    session-start scan with a one-row halo (the previous block's last
    (user, ts)), and a boundary-carry combine of the per-block per-user
    partials (util.combine_sorted_partials) — per-group Python cost never
    appears at any cardinality."""
    import ray

    from .util import coalesce_blocks, combine_sorted_partials

    GAP_US = 1800 * 1_000_000

    ds = load(sf_dir, "events", ["user_id", "event_id", "ts"]).materialize()
    s = coalesce_blocks(ds).sort(["user_id", "ts", "event_id"]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _halo(t: pa.Table):
        if t.num_rows == 0:
            return None
        u = t.column("user_id")[-1].as_py()
        ts = t.column("ts").to_numpy(zero_copy_only=False)[-1]
        return (u, ts.astype("datetime64[us]").astype(np.int64))

    halos = ray.get([_halo.remote(r) for r in refs])
    refs = [r for r, h in zip(refs, halos) if h is not None]
    halos = [h for h in halos if h is not None]

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, prev) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(u)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = prev is None or u[0] != prev[0]
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = (not new_user[0]) and (ts[0] - prev[1] > GAP_US)
        gap[1:] = (ts[1:] - ts[:-1]) > GAP_US
        start = (new_user | gap).astype(np.int64)
        seg = np.nonzero(new_user)[0]
        if seg.size == 0 or seg[0] != 0:
            # head rows continue the previous block's user — they form a
            # partial segment whose count merges via the boundary carry
            seg = np.concatenate([[0], seg]).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[seg], pa.int64()),
                "n_sessions": pa.array(np.add.reduceat(start, seg), pa.int64()),
            }
        )

    part_refs = [
        _scan.remote(refs[b], halos[b - 1] if b > 0 else None) for b in range(len(refs))
    ]
    return combine_sorted_partials(part_refs, "user_id", "n_sessions")


SQL_EVENTS_SESSIONIZE = """
WITH x AS (SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
           FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions
FROM x GROUP BY user_id
"""


def q_filter_lineitem(sf_dir: str):
    """Filter + projection with column pruning at the read."""
    ds = load(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_extendedprice"]
    )

    def _filter(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), pa.scalar(np.datetime64("1997-01-01", "us"))),
            pc.greater(batch.column("l_discount"), 0.05),
        )
        return batch.filter(m).select(["l_orderkey", "l_linenumber", "l_extendedprice"])

    return ds.map_batches(_filter, batch_format="pyarrow")


SQL_FILTER_LINEITEM = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05
"""


EXTRAS_REGISTRY: dict[str, QueryDef] = {
    "dedup_exact": QueryDef(q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_pairs": QueryDef(q_dedup_minhash, SQL_DEDUP_MINHASH),
    "dedup_cluster_keep": QueryDef(q_dedup_cluster_keep, SQL_DEDUP_CLUSTER),
    "corpus_clean": QueryDef(q_corpus_clean, SQL_CORPUS_CLEAN),
    "dedup_simhash_pairs": QueryDef(q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_embedding_pairs": QueryDef(q_dedup_embedding, SQL_DEDUP_EMBEDDING),
    "dedup_embedding_lsh": QueryDef(q_dedup_embedding_lsh, SQL_DEDUP_EMBEDDING_LSH),
    "dedup_ngram_jaccard": QueryDef(q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM_JACCARD),
    "multimodal_decode": QueryDef(q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "multimodal_jpeg_stats": QueryDef(q_multimodal_jpeg_stats, SQL_MULTIMODAL_JPEG_STATS),
    "ann_cosine_topk": QueryDef(q_ann_topk, SQL_ANN_TOPK),
    "ann_lsh_topk": QueryDef(q_ann_lsh_topk, SQL_ANN_LSH_RECALL),
    "ann_ivf_topk": QueryDef(q_ann_ivf_topk, SQL_ANN_IVF_RECALL),
    "ann_ivf_exact": QueryDef(q_ann_ivf_exact, SQL_ANN_TOPK),
    "text_tokens": QueryDef(q_text_tokens, SQL_TEXT_TOKENS),
    "text_bpe_tokens": QueryDef(q_text_bpe_tokens, SQL_TEXT_BPE),
    "text_quality": QueryDef(q_text_quality, SQL_TEXT_QUALITY),
    "text_langid": QueryDef(q_text_langid, SQL_TEXT_LANGID),
    "text_fingerprint": QueryDef(q_text_fingerprint, SQL_TEXT_FINGERPRINT),
    "agg_pricing_summary": QueryDef(q_agg_pricing_summary, SQL_AGG_PRICING),
    "join_customer_geo": QueryDef(q_join_customer_geo, SQL_JOIN_GEO),
    "top_orders": QueryDef(q_top_orders, SQL_TOP_ORDERS),
    "events_hourly": QueryDef(q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sessionize": QueryDef(q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "filter_lineitem": QueryDef(q_filter_lineitem, SQL_FILTER_LINEITEM),
}


# --------------------------------------------------------------------------
# dateTime operators + triple pivot round-trip
# --------------------------------------------------------------------------

def q_gen_datetime_events(sf_dir: str):
    """A2 dateTime generalization over events.ts (GeneralizationDateTime.java):
    canonical values in epoch millis, Java integer-half midpoints."""
    from .stages.generalization import generalize_column

    ds = load(sf_dir, "events", ["event_id", "ts"])
    out, _ = generalize_column(ds, "ts", "event_id", num_attrs=1, kind="dateTime")
    out = out.select_columns(["event_id", "ts_generalized"])
    from .queries import _as_int64

    return _as_int64(out, ["ts_generalized"])


def q_gen_datetime_buckets(sf_dir: str):
    """A2 dateTime bucket boundary table (epoch-millis integer midpoints)."""
    from .stages.generalization import generalize_column

    ds = load(sf_dir, "events", ["event_id", "ts"])
    _, res = generalize_column(ds, "ts", "event_id", num_attrs=1, kind="dateTime")
    t = res.buckets
    return pa.table(
        {
            "bucket": pc.cast(t.column("bucket"), pa.int64()),
            "min": t.column("min"),
            "max": t.column("max"),
        }
    )


def q_rand_datetime_events(sf_dir: str):
    """A4 dateTime randomization (gaussian whole-second noise), value-hash
    exact via the SplitMix64 rng_mode + sqlrng oracle; the output is projected
    to epoch millis BIGINT so both engines hash identical integer columns."""
    from .stages.randomization import randomize_column

    ds = load(sf_dir, "events", ["event_id", "ts"])
    out = randomize_column(
        ds, "ts", "event_id", num_attrs=1, kind="dateTime", seed=1234, object_type="events",
        rng_mode="splitmix",
    )

    def _to_ms(b: pa.Table) -> pa.Table:
        ms = pc.cast(pc.cast(b.column("ts_randomized"), pa.timestamp("ms")), pa.int64())
        return pa.table({"event_id": b.column("event_id"), "ts_randomized_ms": ms})

    return out.map_batches(_to_ms, batch_format="pyarrow")


def q_pivot_roundtrip(sf_dir: str):
    """Q3 triple-store form: wide -> triples -> hash-partitioned subject pivot
    back to wide (values stringified in both directions)."""
    from .sources.triples import pivot_triples_to_wide, wide_to_triples

    cust = load(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    triples = wide_to_triples(
        cust, "c_custkey", ["c_name", "c_mktsegment", "c_acctbal"], subj_prefix="c:"
    )
    wide = pivot_triples_to_wide(triples, ["c_name", "c_mktsegment", "c_acctbal"])
    return wide.rename_columns({"subj": "subj_iri"})


SQL_PIVOT_ROUNDTRIP = """
SELECT 'c:' || c_custkey AS subj_iri, c_name, c_mktsegment,
       CAST(c_acctbal AS VARCHAR) AS c_acctbal
FROM customer
"""

# epoch millis of a timestamp in DuckDB: epoch_ms(ts)
SQL_GEN_DATETIME = """
WITH stats AS (SELECT count(*) AS k FROM events WHERE ts IS NOT NULL),
gk AS (SELECT k, {g} AS g FROM stats),
s AS (SELECT event_id AS id, row_number() OVER (ORDER BY ts, event_id) - 1 AS rnk
      FROM events WHERE ts IS NOT NULL),
assigned AS (SELECT s.id, (gk.g * s.rnk) // gk.k AS bucket FROM s CROSS JOIN gk)
SELECT t.event_id, assigned.bucket AS ts_generalized
FROM events t LEFT JOIN assigned ON assigned.id = t.event_id
"""

SQL_GEN_DATETIME_BUCKETS = """
WITH stats AS (SELECT count(*) AS k FROM events WHERE ts IS NOT NULL),
gk AS (SELECT k, {g} AS g FROM stats),
s AS (SELECT epoch_ms(ts) AS v, row_number() OVER (ORDER BY ts, event_id) - 1 AS rnk
      FROM events WHERE ts IS NOT NULL),
cuts AS (SELECT p.p, (p.p * gk.k) // gk.g AS c FROM gk,
         (SELECT unnest(range(1, (SELECT g FROM gk)))) AS p(p)),
bvals AS (SELECT cuts.p, (s1.v + s2.v) // 2 AS bv FROM cuts
          JOIN s s1 ON s1.rnk = cuts.c - 1 JOIN s s2 ON s2.rnk = cuts.c),
bkts AS (SELECT unnest(range(0, (SELECT g FROM gk))) AS bucket)
SELECT bkts.bucket, bmin.bv AS min, bmax.bv AS max
FROM bkts LEFT JOIN bvals bmin ON bmin.p = bkts.bucket
          LEFT JOIN bvals bmax ON bmax.p = bkts.bucket + 1
"""

from .queries import _sql_gk as _gk  # noqa: E402
from .rng import attribute_seed64 as _seed64  # noqa: E402
from .sqlrng import sql_rand_date as _sql_rand_date  # noqa: E402
from .sqlrng import sql_rand_datetime as _sql_rand_datetime  # noqa: E402

EXTRAS_REGISTRY.update(
    {
        "gen_datetime_events": QueryDef(
            q_gen_datetime_events, SQL_GEN_DATETIME.format(g=_gk("k", 1))
        ),
        "gen_datetime_buckets": QueryDef(
            q_gen_datetime_buckets, SQL_GEN_DATETIME_BUCKETS.format(g=_gk("k", 1))
        ),
        "rand_datetime_events": QueryDef(
            q_rand_datetime_events,
            _sql_rand_datetime(
                "events", "event_id", "ts", _gk("k", 1),
                _seed64(1234, "events", "ts"), "ts_randomized_ms",
            ),
        ),
        "pivot_triples_roundtrip": QueryDef(q_pivot_roundtrip, SQL_PIVOT_ROUNDTRIP),
    }
)


def q_ann_join_top1(sf_dir: str):
    """ANN JOIN (query set == corpus) via the pre-bucketed banded self-join
    + distributed top-k (`lsh_ann_join`): each planted vector's top-1
    neighbor is its exact-direction twin (cosine 1.0, bucketed together in
    every table), so the global-exact SQL top-1 is a full oracle."""
    from .extras.similarity import lsh_ann_join

    res = lsh_ann_join(_planted_embeddings(sf_dir), k=1)
    return res.select_columns(["query_id", "vec_id"])


SQL_ANN_JOIN_TOP1 = f"""
WITH corpus AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET}, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)
  FROM embeddings
),
scores AS (SELECT a.id AS query_id, b.id AS vec_id,
                  list_cosine_similarity(a.e, b.e) AS s
           FROM corpus a JOIN corpus b ON a.id <> b.id),
ranked AS (SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
           FROM scores)
SELECT query_id, vec_id FROM ranked WHERE rn = 1
"""

EXTRAS_REGISTRY.update(
    {"ann_lsh_join_top1": QueryDef(q_ann_join_top1, SQL_ANN_JOIN_TOP1)}
)


def q_rand_date_window_scale(sf_dir: str):
    """A4 date randomization's deterministic noise scale in DAY units over
    orders.o_orderdate — RandomizationDate.java:32-37 measures distance with
    ChronoUnit.DAYS; the window walk itself is Randomization.java:42-52."""
    from .stages.randomization import window_noise_scale

    ds = load(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out = window_noise_scale(ds, "o_orderdate", "o_orderkey", num_attrs=1, kind="date")
    return out.select_columns(["o_orderkey", "noise_scale"])


from .queries import SQL_RAND_WINDOW as _SQL_RAND_WINDOW_NUM  # noqa: E402

SQL_RAND_DATE_WINDOW = (
    _SQL_RAND_WINDOW_NUM.replace("customer", "orders")
    .replace("c_custkey", "o_orderkey")
    .replace(
        "CAST(c_acctbal AS DOUBLE)",
        "CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)",
    )
    .replace("c_acctbal IS NOT NULL", "o_orderdate IS NOT NULL")
    .replace("ORDER BY c_acctbal, o_orderkey", "ORDER BY CAST(o_orderdate AS DATE), o_orderkey")
)


def q_rand_date_orders(sf_dir: str):
    """A4 date randomization end-to-end (RandomizationDate.java:40-58:
    gaussian whole-day noise, reflected into [min, max]) — value-hash exact
    via the SplitMix64 rng_mode + sqlrng oracle; projected to epoch-day
    BIGINT so both engines hash identical integer columns."""
    from .stages.randomization import randomize_column

    ds = load(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out = randomize_column(
        ds, "o_orderdate", "o_orderkey", num_attrs=1, kind="date", seed=1234,
        object_type="orders", rng_mode="splitmix",
    )

    def _to_day(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b.column("o_orderdate_randomized"), pa.int32()), pa.int64())
        return pa.table({"o_orderkey": b.column("o_orderkey"), "o_orderdate_randomized_day": day})

    return out.map_batches(_to_day, batch_format="pyarrow")


EXTRAS_REGISTRY.update(
    {
        "rand_date_window_scale": QueryDef(q_rand_date_window_scale, SQL_RAND_DATE_WINDOW),
        "rand_date_orders": QueryDef(
            q_rand_date_orders,
            _sql_rand_date(
                "orders", "o_orderkey", "o_orderdate", _gk("k", 1),
                _seed64(1234, "orders", "o_orderdate"), "o_orderdate_randomized_day",
            ),
        ),
    }
)


def q_events_asof(sf_dir: str):
    """AS-OF join (custom operator): each even-id event matched to the
    latest odd-id event of the same user at or before its timestamp — one
    co-sort of both streams + per-block carry scan (extras/asof.py).
    (user_id, ts) pairs are unique in this corpus, so the answer is
    deterministic (the same precondition DuckDB ASOF needs)."""
    from .extras.asof import asof_join

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _parity(want: int):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), want)
            return b.filter(m)

        return f

    left = ev.map_batches(_parity(0), batch_format="pyarrow").drop_columns(["value"])
    right = ev.map_batches(_parity(1), batch_format="pyarrow").rename_columns(
        {"event_id": "r_event_id", "value": "r_value"}
    )
    out = asof_join(
        left, right, key_col="user_id", time_col="ts",
        right_cols=["r_event_id", "r_value"], left_cols=["event_id"],
    )
    return out.select_columns(["event_id", "user_id", "r_event_id", "r_value"])


SQL_EVENTS_ASOF = """
SELECT l.event_id, l.user_id, r.event_id AS r_event_id, r.value AS r_value
FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""

EXTRAS_REGISTRY.update({"events_asof_join": QueryDef(q_events_asof, SQL_EVENTS_ASOF)})


def q_join_anti_customers(sf_dir: str):
    """Broadcast ANTI join: customers with no high-value (>300k) order. The
    filtered orders side is distinct-reduced per block and broadcast once
    (ray.put); the customer stream filters with one vectorized is_in — no
    shuffle of either side (extras/joins.py). The filter is pushed into the
    orders read path before the distinct reduce."""
    from .extras.joins import semi_anti_join

    cust = load(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = load(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 300000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return semi_anti_join(
        cust, orders, on="c_custkey", right_on="o_custkey", anti=True
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""

EXTRAS_REGISTRY.update(
    {"join_anti_customers": QueryDef(q_join_anti_customers, SQL_JOIN_ANTI)}
)


_IV_SPAN_US = 3_600_000_000  # 1 h — interval span AND join granule


def q_events_interval(sf_dir: str):
    """RANGE (interval-containment) join (custom operator): each even-id
    event matched to every odd-id event of the same user whose 1-hour
    window [ts, ts+1h) contains it — granule-replicated hash join, no sort,
    no per-key UDF (extras/asof.py interval_join). Granule == span, so the
    build side replicates at most 2x."""
    from .extras.asof import interval_join

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _parity(want: int):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), want)
            return b.filter(m)

        return f

    points = ev.map_batches(_parity(0), batch_format="pyarrow")

    def _mk_iv(b: pa.Table) -> pa.Table:
        b = _parity(1)(b)
        ts = b.column("ts").combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "iv_event_id": b.column("event_id").combine_chunks(),
                "user_id": b.column("user_id").combine_chunks(),
                "start": ts,
                "end": pc.add(ts, _IV_SPAN_US),
            }
        )

    intervals = ev.map_batches(_mk_iv, batch_format="pyarrow")
    out = interval_join(
        points, intervals,
        key_col="user_id", ts_col="ts", start_col="start", end_col="end",
        granule_us=_IV_SPAN_US,
    )
    return out.select_columns(["event_id", "user_id", "iv_event_id"])


SQL_EVENTS_INTERVAL = """
SELECT l.event_id, l.user_id, r.event_id AS iv_event_id
FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
ON l.user_id = r.user_id
AND l.ts >= r.ts AND l.ts < r.ts + INTERVAL 1 HOUR
"""

EXTRAS_REGISTRY.update(
    {"events_interval_join": QueryDef(q_events_interval, SQL_EVENTS_INTERVAL)}
)


def q_corpus_pack(sf_dir: str):
    """Sequence packing for LLM pretraining: docs hash-assigned to 4 training
    shards (MINSTD, partition-independent), each shard greedily packed in
    doc-id order into 512-token bins (extras/pack.py). The oracle replays the
    inherently-sequential greedy rule as a recursive CTE."""
    from .extras.pack import pack_sequences

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _len(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(b.column("text"), r"\S+"), pa.int64()
                ),
            }
        )

    return pack_sequences(
        docs.map_batches(_len, batch_format="pyarrow"),
        "doc_id", "n_tokens", budget=512, num_shards=4,
    )


SQL_CORPUS_PACK = """
WITH RECURSIVE d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS len,
         ((doc_id % 2147483647) * 48271) % 2147483647 % 4 AS shard
  FROM documents),
o AS (SELECT doc_id, len, shard,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM d),
r(shard, rn, doc_id, bin, fill, pos) AS (
  SELECT shard, rn, doc_id, CAST(0 AS BIGINT), len, CAST(0 AS BIGINT)
  FROM o WHERE rn = 1
  UNION ALL
  SELECT n.shard, n.rn, n.doc_id,
         CASE WHEN r.fill + n.len <= 512 THEN r.bin ELSE r.bin + 1 END,
         CASE WHEN r.fill + n.len <= 512 THEN r.fill + n.len ELSE n.len END,
         CASE WHEN r.fill + n.len <= 512 THEN r.pos + 1 ELSE CAST(0 AS BIGINT) END
  FROM r JOIN o n ON n.shard = r.shard AND n.rn = r.rn + 1
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, pos FROM r
"""


def q_events_window(sf_dir: str):
    """SQL window-function family per user (row_number, lag delta, running
    sum) via one range sort + per-block scans with a driver-chained carry —
    extras/window.py. Running sum in integer cents (identical
    floor(v*100+0.5) formula on both sides) so float order-dependence can't
    break the value hash."""
    from .extras.window import per_key_window

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "user_id": b.column("user_id").combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "cents": cents,
            }
        )

    out = per_key_window(
        ev.map_batches(_cents, batch_format="pyarrow"),
        "user_id", "ts", "event_id", "cents",
    )
    return out.map_batches(
        lambda b: b.rename_columns(["event_id", "user_id", "rn", "lag_us", "cum_cents"]),
        batch_format="pyarrow",
    )


SQL_EVENTS_WINDOW = """
SELECT event_id, user_id,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS lag_us,
  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_sliding_count(sf_dir: str):
    """SLIDING-window aggregate by composition: for every event, the number
    of same-user events in the trailing hour (inclusive of itself). Each
    event spawns the interval [ts, ts+1h) — an event's trailing window then
    contains exactly the events whose intervals cover it — so the operator
    is interval_join + the no-groupby exact_value_counts. No per-key UDF,
    no window sort."""
    from .extras.asof import interval_join
    from .extras.stats import exact_value_counts

    ev = load(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _mk_iv(b: pa.Table) -> pa.Table:
        ts = b.column("ts").combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "start": ts,
                "end": pc.add(ts, _IV_SPAN_US),
            }
        )

    pairs = interval_join(
        ev,
        ev.map_batches(_mk_iv, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", start_col="start", end_col="end",
        granule_us=_IV_SPAN_US,
    )
    counts = exact_value_counts(pairs.select_columns(["event_id"]), "event_id")
    return counts.map_batches(
        lambda b: pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "n_trailing_hour": pc.cast(b.column("n"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_SLIDING = """
SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_trailing_hour
FROM events a JOIN events b
ON a.user_id = b.user_id
AND a.ts >= b.ts AND a.ts < b.ts + INTERVAL 1 HOUR
GROUP BY a.event_id
"""

EXTRAS_REGISTRY.update(
    {"events_sliding_count": QueryDef(q_events_sliding_count, SQL_EVENTS_SLIDING),
     "events_window_funcs": QueryDef(q_events_window, SQL_EVENTS_WINDOW),
     "corpus_pack": QueryDef(q_corpus_pack, SQL_CORPUS_PACK)}
)


_QS = (0.01, 0.25, 0.5, 0.75, 0.99)


def q_stats_quantiles(sf_dir: str):
    """Exact discrete quantiles from the narrow-sort machinery (point
    lookups at the quantile ranks; the column is never materialized)."""
    from .extras.stats import exact_quantiles

    ds = load(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice", list(_QS), id_col="l_orderkey")


SQL_STATS_QUANTILES = " UNION ALL ".join(
    f"SELECT {q} AS q, quantile_disc(l_extendedprice, {q}) AS value FROM lineitem"
    for q in _QS
)


def q_stats_distinct(sf_dir: str):
    """Exact distinct count without a groupby (per-block unique + range sort
    + boundary scan)."""
    from .extras.stats import count_distinct_exact

    n = count_distinct_exact(load(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey")
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


SQL_STATS_DISTINCT = "SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct FROM lineitem"


def q_stats_heavy_hitters(sf_dir: str):
    """Exact top-10 customers by order count; per-value totals never ride a
    Ray groupby (Arrow partial counts + boundary-carry segment sums)."""
    from .extras.stats import heavy_hitters

    hh = heavy_hitters(load(sf_dir, "orders", ["o_custkey"]), "o_custkey", k=10)
    return hh.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
                "n": pc.cast(b.column("n"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_STATS_HEAVY = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders
GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 10
"""


def q_stats_hll(sf_dir: str):
    """HyperLogLog distinct estimate, gated on its theoretical error bound
    (ann_lsh_topk style): the sketch is deterministic (fixed hash, registers
    merged by max), so |est/exact - 1| <= 5x the standard HLL error
    1.04/sqrt(m) is a stable invariant — the 1-row scoreboard gives the
    sketch a real oracle; an estimator regression flips the flag and
    hash-mismatches. The raw estimate's distribution is characterized in
    unit tests."""
    from .extras.stats import count_distinct_exact, hll_count_distinct

    ds = load(sf_dir, "lineitem", ["l_orderkey"])
    n = hll_count_distinct(ds, "l_orderkey")
    exact = count_distinct_exact(ds, "l_orderkey")
    bound = 5 * 1.04 / (1 << 6)  # p=12 -> m=4096, sqrt(m)=64
    ok = int(abs(n / exact - 1.0) <= bound) if exact else 1
    return pa.table({"hll_within_bound": pa.array([ok], pa.int64())})


SQL_STATS_HLL = "SELECT CAST(1 AS BIGINT) AS hll_within_bound"


def q_stats_group_quantiles(sf_dir: str):
    """Exact per-supplier price quartiles — the GROUPED quantile operator:
    one (key, val) range sort, in-block vectorized solve for contained keys,
    boundary-spanning keys re-gathered into one small task (extras/stats.py
    group_quantiles). Output stays distributed (key-sized)."""
    from .extras.stats import group_quantiles

    ds = load(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    return group_quantiles(ds, "l_suppkey", "l_extendedprice", [0.25, 0.5, 0.75])


# quantile_disc requires a CONSTANT q in DuckDB — one arm per quantile
SQL_STATS_GROUP_Q = " UNION ALL ".join(
    f"SELECT l_suppkey, {q} AS q, quantile_disc(l_extendedprice, {q}) AS value "
    "FROM lineitem GROUP BY l_suppkey"
    for q in (0.25, 0.5, 0.75)
)


EXTRAS_REGISTRY.update(
    {
        "stats_quantiles": QueryDef(q_stats_quantiles, SQL_STATS_QUANTILES),
        "stats_distinct": QueryDef(q_stats_distinct, SQL_STATS_DISTINCT),
        "stats_heavy_hitters": QueryDef(q_stats_heavy_hitters, SQL_STATS_HEAVY),
        "stats_hll_distinct": QueryDef(q_stats_hll, SQL_STATS_HLL),
        "stats_group_quantiles": QueryDef(q_stats_group_quantiles, SQL_STATS_GROUP_Q),
    }
)


def q_sample_lineitem(sf_dir: str):
    """Deterministic systematic sampling (5%): keep rows where the key falls
    in a fixed residue class — reproducible across runs/partitionings and
    SQL-mirrorable (hash-based sampling would tie the oracle to a specific
    hash implementation)."""
    ds = load(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def _sample(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = ((ok * 7 + ln) % 20) == 3
        return batch.filter(pa.array(mask))

    return ds.map_batches(_sample, batch_format="pyarrow")


SQL_SAMPLE_LINEITEM = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE (l_orderkey * 7 + l_linenumber) % 20 = 3
"""

def q_sample_stratified(sf_dir: str):
    """Deterministic STRATIFIED sample — exactly 3 customers per nation,
    chosen by a MINSTD hash order (partition-independent and
    SQL-expressible, so the oracle is exact). Per-key selection rides
    ``util.topk_per_key`` (range sort + boundary carry, no per-group UDF):
    at crawl scale this is 'n documents per domain', key cardinality
    O(corpus)."""
    from .util import topk_per_key

    ds = load(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def _h(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        hv = ((ck % 2147483647) * 48271) % 2147483647
        return batch.append_column("hv", pa.array(hv, pa.int64()))

    ranked = topk_per_key(
        ds.map_batches(_h, batch_format="pyarrow"),
        "c_nationkey", "hv", 3, descending=False, tie_col="c_custkey",
    )
    return ranked.select_columns(["c_custkey", "c_nationkey"])


SQL_SAMPLE_STRATIFIED = """
WITH h AS (SELECT c_custkey, c_nationkey,
                  ((c_custkey % 2147483647) * 48271) % 2147483647 AS hv
           FROM customer)
SELECT c_custkey, c_nationkey FROM (
  SELECT c_custkey, c_nationkey,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY hv, c_custkey) AS rn
  FROM h) WHERE rn <= 3
"""

EXTRAS_REGISTRY.update(
    {
        "sample_lineitem": QueryDef(q_sample_lineitem, SQL_SAMPLE_LINEITEM),
        "sample_stratified": QueryDef(q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    }
)


def q_graph_triangles(sf_dir: str):
    """Triangle count on the co-supplier graph (suppliers sharing an order).

    Edge build is a self-join on l_orderkey (pairs-per-order is bounded by
    order size, so the blowup is constant-factor at any corpus scale), then
    folded-key dedup; the count itself is extras.graph.triangle_count's
    wedge-join + closure plan. Exact SQL oracle (id-oriented triangles)."""
    from .extras.graph import triangle_count
    from .util import distinct_rows, hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    left = li.rename_columns({"l_suppkey": "a"}).materialize()
    right = li.rename_columns({"l_suppkey": "b"}).materialize()
    paired = hash_join(left, right, on="l_orderkey", join_type="inner")

    def _orient(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("a"), b.column("b"))
        t = b.filter(m)
        return pa.table({"a": t.column("a").combine_chunks(), "b": t.column("b").combine_chunks()})

    edges = distinct_rows(paired.map_batches(_orient, batch_format="pyarrow"), ["a", "b"])
    return triangle_count(edges)


SQL_GRAPH_TRIANGLES = """
WITH pairs AS (
  SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM pairs e1 JOIN pairs e2 ON e2.a = e1.b
              JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
"""

EXTRAS_REGISTRY.update(
    {"graph_triangles": QueryDef(q_graph_triangles, SQL_GRAPH_TRIANGLES)}
)


BM25_QUERY_TERMS = ["dup", "hash"]


def q_bm25_topk(sf_dir: str):
    """BM25 top-10 retrieval over the documents corpus (extras/retrieval.py):
    inverted-index postings in one vectorized pass, query-term prefilter (the
    corpus never shuffles), integer-scaled scoring summed per doc with the
    sort+carry sum_per_key. The integer formulation makes the full ranking
    value-hash exact against the SQL oracle."""
    from .extras.retrieval import bm25_topk

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, BM25_QUERY_TERMS, k=10)


SQL_BM25_TOPK = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM corpus),
tok2 AS (SELECT * FROM tok WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
q AS (SELECT unnest({BM25_QUERY_TERMS!r}) AS term),
tf AS (SELECT t.term, t.doc_id, count(*) AS tf FROM tok2 t JOIN q USING(term)
       GROUP BY t.term, t.doc_id),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nl AS (SELECT (SELECT count(*) FROM dl) AS n, (SELECT sum(dl) FROM dl) AS l),
idf AS (SELECT term,
               CAST(floor(1000000 * ln(1.0 + (nl.n - df.df + 0.5) / (df.df + 0.5))) AS BIGINT) AS w
        FROM df, nl),
contrib AS (SELECT tf.doc_id,
                   (idf.w * 2200 * tf.tf) //
                   (1000 * tf.tf + (1200 * (250 + (750 * dl.dl * nl.n) // nl.l)) // 1000) AS c
            FROM tf JOIN idf USING(term) JOIN dl USING(doc_id), nl),
s AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM s ORDER BY score DESC, doc_id LIMIT 10
"""

EXTRAS_REGISTRY.update({"bm25_topk": QueryDef(q_bm25_topk, SQL_BM25_TOPK)})


# rules for the registry query: the email PII rule (exercises the scrubber
# plumbing) plus two rules that actually fire on the synthetic corpus
REDACT_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("name", r"\bcustomer\b", "<NAME>"),
    ("tool", r"\bspark\b", "<TOOL>"),
]


def q_text_redact(sf_dir: str):
    """PII / pattern redaction over documents (extras/redact.py): sequential
    RE2 count+replace kernels in one streaming map_batches pass — the
    unstructured-text sibling of the reference's Masking stage. Returns
    every doc's redacted text and the number of replacements performed."""
    from .extras.redact import redact_text

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return redact_text(ds, REDACT_RULES)


def _sql_redact_chain(rules) -> str:
    steps = ["s0 AS (SELECT doc_id, text AS t, CAST(0 AS BIGINT) AS n FROM documents)"]
    for i, (_name, pat, repl) in enumerate(rules, start=1):
        steps.append(
            f"s{i} AS (SELECT doc_id, regexp_replace(t, '{pat}', '{repl}', 'g') AS t, "
            f"n + len(regexp_extract_all(t, '{pat}')) AS n FROM s{i - 1})"
        )
    last = f"s{len(rules)}"
    return (
        "WITH "
        + ",\n".join(steps)
        + f"\nSELECT doc_id, t AS text_redacted, n AS n_redactions FROM {last}"
    )


SQL_TEXT_REDACT = _sql_redact_chain(REDACT_RULES)

EXTRAS_REGISTRY.update({"text_redact": QueryDef(q_text_redact, SQL_TEXT_REDACT)})


def q_text_repetition(sf_dir: str):
    """Within-doc duplicate-bigram stats (Gopher repetition quality gate) —
    extras/textstats.repetition_stats, exact integer counts per document."""
    from .extras.textstats import repetition_stats

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return repetition_stats(ds, "text", "doc_id")


SQL_TEXT_REPETITION = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(arr) AS term,
         generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
bg AS (SELECT doc_id,
              term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
       FROM tok),
bg2 AS (SELECT * FROM bg WHERE bigram IS NOT NULL)
SELECT doc_id,
       count(*) AS n_bigrams,
       count(DISTINCT bigram) AS n_distinct,
       count(*) - count(DISTINCT bigram) AS n_dup
FROM bg2 GROUP BY doc_id
"""

EXTRAS_REGISTRY.update(
    {"text_repetition": QueryDef(q_text_repetition, SQL_TEXT_REPETITION)}
)


# benchmark-membership rule for the decontamination query: every 89th doc
# plays the held-out eval suite; the corpus under test is everything else
DECON_BENCH_MOD = 89
DECON_N = 3


def q_text_decontaminate(sf_dir: str):
    """Benchmark decontamination (extras/decontaminate.py): the distinct
    word-trigram set of the small benchmark slice is broadcast once via
    ray.put; an actor-pool scan flags every other document sharing a trigram
    with it, with exact matched-occurrence counts."""
    from .extras.decontaminate import decontaminate, ngram_set

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _split(bench: bool):
        def _f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % DECON_BENCH_MOD) == 0
            return batch.filter(pa.array(m if bench else ~m))

        return _f

    bench_grams = ngram_set(
        docs.map_batches(_split(True), batch_format="pyarrow"), "text", DECON_N
    )
    corpus = docs.map_batches(_split(False), batch_format="pyarrow")
    return decontaminate(corpus, bench_grams, n=DECON_N)


SQL_TEXT_DECONTAMINATE = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(arr) AS term,
         generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
ng AS (SELECT doc_id,
              term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS ngram
       FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
ng2 AS (SELECT * FROM ng WHERE ngram IS NOT NULL),
bench AS (SELECT DISTINCT ngram FROM ng2 WHERE doc_id % {DECON_BENCH_MOD} = 0)
SELECT doc_id, count(*) AS n_hits
FROM ng2
WHERE doc_id % {DECON_BENCH_MOD} <> 0
  AND ngram IN (SELECT ngram FROM bench)
GROUP BY doc_id
"""

EXTRAS_REGISTRY.update(
    {"text_decontaminate": QueryDef(q_text_decontaminate, SQL_TEXT_DECONTAMINATE)}
)


# --------------------------------------------------------------------------
# corpus ordering / split / chunking (training-prep family)
# --------------------------------------------------------------------------

SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SALT = 7
SHUFFLE_SALT = 0
CHUNK_SIZE = 64


def q_corpus_shuffle(sf_dir: str):
    """Reproducible global shuffle order (extras/shuffle.py): pos = rank of
    (SplitMix64(doc_id), doc_id) — one narrow sort + metadata-prefix-sum
    position stamping; identical at any parallelism."""
    from .extras.shuffle import deterministic_shuffle

    return deterministic_shuffle(
        load(sf_dir, "documents", ["doc_id"]), "doc_id", salt=SHUFFLE_SALT
    )


def _sql_corpus_shuffle() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain("(SELECT doc_id FROM documents)", "doc_id", SHUFFLE_SALT)
    return (
        f"WITH {chain}\n"
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos FROM h3"
    )


def q_corpus_split(sf_dir: str):
    """Stable hash-based train/val/test assignment (extras/shuffle.py):
    integer-threshold compare on SplitMix64(doc_id) — a document never moves
    between splits when the corpus is re-sharded or grown elsewhere."""
    from .extras.shuffle import split_assign

    return split_assign(
        load(sf_dir, "documents", ["doc_id"]), "doc_id", SPLIT_FRACTIONS, salt=SPLIT_SALT
    )


def _sql_corpus_split() -> str:
    from .extras.shuffle import sql_sm64_chain

    names = list(SPLIT_FRACTIONS)
    cum, whens = 0.0, []
    for n in names[:-1]:
        cum += SPLIT_FRACTIONS[n]
        whens.append(f"WHEN h < {int(cum * 2**64)} THEN '{n}'")
    chain = sql_sm64_chain("(SELECT doc_id FROM documents)", "doc_id", SPLIT_SALT)
    return (
        f"WITH {chain}\n"
        f"SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split FROM h3"
    )


def q_text_chunks(sf_dir: str):
    """Context-length chunking (extras/chunk.py): non-overlapping 64-token
    windows with reassembled chunk text, all Arrow kernels, no shuffle."""
    from .extras.chunk import chunk_documents

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, size=CHUNK_SIZE)


SQL_TEXT_CHUNKS = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(arr) AS term,
         generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
)
SELECT doc_id,
       CAST((pos - 1) // {CHUNK_SIZE} AS BIGINT) AS chunk_id,
       count(*) AS n_tokens,
       string_agg(term, ' ' ORDER BY pos) AS chunk_text
FROM tok GROUP BY doc_id, chunk_id
"""

EXTRAS_REGISTRY.update(
    {
        "corpus_shuffle": QueryDef(q_corpus_shuffle, _sql_corpus_shuffle()),
        "corpus_split": QueryDef(q_corpus_split, _sql_corpus_split()),
        "text_chunks": QueryDef(q_text_chunks, SQL_TEXT_CHUNKS),
    }
)


MIX_WEIGHTS = {"src0": 2.0, "src1": 2.5, "src2": 0.5, "src3": 0.0}
MIX_DEFAULT = 1.0
MIX_SALT = 11
SPAN_N = 5


def q_corpus_mix(sf_dir: str):
    """Deterministic mixture weighting (extras/shuffle.mixture_sample):
    per-source up/down-sampling by integer-threshold hash draw; stateless
    streaming fan-out, pure function of (doc_id, source)."""
    from .extras.shuffle import mixture_sample

    ds = load(sf_dir, "documents", ["doc_id", "source"])
    return mixture_sample(
        ds, "source", MIX_WEIGHTS, "doc_id", default=MIX_DEFAULT, salt=MIX_SALT
    )


def _sql_corpus_mix() -> str:
    from .extras.shuffle import sql_sm64_chain

    base_w, thr_w = [], []
    for s, w in MIX_WEIGHTS.items():
        base_w.append(f"WHEN '{s}' THEN {int(np.floor(w))}")
        thr_w.append(f"WHEN '{s}' THEN {int((w - np.floor(w)) * 2**64)}")
    dflt_b = int(np.floor(MIX_DEFAULT))
    dflt_t = int((MIX_DEFAULT - np.floor(MIX_DEFAULT)) * 2**64)
    chain = sql_sm64_chain(
        "(SELECT doc_id, source FROM documents)", "doc_id", MIX_SALT
    )
    return f"""WITH {chain},
c AS (SELECT doc_id, source,
        CASE source {' '.join(base_w)} ELSE {dflt_b} END
      + CASE WHEN h < (CASE source {' '.join(thr_w)} ELSE {dflt_t} END) THEN 1 ELSE 0 END AS cnt
      FROM h3)
SELECT doc_id, source, CAST(unnest(range(cnt)) AS BIGINT) AS copy_idx FROM c"""


def q_text_dup_spans(sf_dir: str):
    """Cross-document duplicate n-gram spans (extras/dedup.duplicate_span_stats):
    per doc, total 5-grams and how many occurrences duplicate an earlier
    (doc_id, pos) occurrence anywhere in the corpus — the exact-substring
    dedup accounting, via one (ngram, packed) sort + boundary-carried scan."""
    from .extras.dedup import duplicate_span_stats

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return duplicate_span_stats(ds, "text", "doc_id", n=SPAN_N)


def _sql_text_dup_spans() -> str:
    lead = " || ' ' || ".join(
        ["term"] + [f"lead(term,{i}) OVER w" for i in range(1, SPAN_N)]
    )
    return rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(arr) AS term,
         generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
ng AS (SELECT doc_id, pos, {lead} AS ngram
       FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
ng2 AS (SELECT * FROM ng WHERE ngram IS NOT NULL),
m AS (SELECT *, min(doc_id * 1048576 + pos) OVER (PARTITION BY ngram) AS fk FROM ng2)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN doc_id * 1048576 + pos <> fk THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM m GROUP BY doc_id
"""


EXTRAS_REGISTRY.update(
    {
        "corpus_mix": QueryDef(q_corpus_mix, _sql_corpus_mix()),
        "text_dup_spans": QueryDef(q_text_dup_spans, _sql_text_dup_spans()),
    }
)


QG_QUANTILE = 0.25


def q_corpus_quality_gate(sf_dir: str):
    """Global-statistic-gated filter (the FineWeb/Gopher 'drop the worst
    quartile' shape): exact p25 of per-doc token counts is computed by the
    narrow-sort quantile machinery, returned to the driver as ONE scalar,
    and broadcast into a streaming filter — docs must clear the token
    threshold AND be majority-alphabetic (integer cross-multiplication, no
    float compare). Two passes over a NARROW stats projection; the text
    column is read once."""
    from .extras.stats import exact_quantiles

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _stats(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks(),
                "n_tokens": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
                "n_alpha": pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
            }
        )

    stats = docs.map_batches(_stats, batch_format="pyarrow").materialize()
    qt = exact_quantiles(stats, "n_tokens", [QG_QUANTILE], id_col="doc_id")
    thr = int(qt.column("value")[0].as_py())

    def _gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("n_tokens"), thr),
            pc.greater_equal(
                pc.multiply(batch.column("n_alpha"), 2), batch.column("n_chars")
            ),
        )
        return batch.filter(keep).select(["doc_id", "n_tokens"])

    return stats.map_batches(_gate, batch_format="pyarrow")


SQL_CORPUS_QUALITY_GATE = rf"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents),
t AS (SELECT quantile_disc(n_tokens, {QG_QUANTILE}) AS thr FROM s)
SELECT doc_id, n_tokens FROM s, t
WHERE n_tokens >= thr AND 2 * n_alpha >= n_chars
"""

EXTRAS_REGISTRY.update(
    {"corpus_quality_gate": QueryDef(q_corpus_quality_gate, SQL_CORPUS_QUALITY_GATE)}
)


def q_dedup_semantic(sf_dir: str):
    """Semantic dedup (SemDeDup shape): embedding-cosine near-dup PAIRS
    (distributed block-pair join, exact) resolved into per-vector cluster
    keepers — min vec_id of each connected component in the similarity
    graph, itself for singletons. filter(vec_id == keeper_id) is the dedup."""
    from .extras.dedup import cluster_keepers, embedding_dup_pairs

    emb = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.45
    ).select_columns(["id_a", "id_b"])
    return cluster_keepers(emb.select_columns(["vec_id"]), pairs, id_col="vec_id")


SQL_DEDUP_SEMANTIC = f"""
WITH RECURSIVE dup AS ({SQL_DEDUP_EMBEDDING}),
edges AS (SELECT id_a AS a, id_b AS b FROM dup
          UNION ALL SELECT id_b, id_a FROM dup),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS vec_id, min(r) AS keeper_id FROM reach GROUP BY id
"""

EXTRAS_REGISTRY.update(
    {"dedup_semantic": QueryDef(q_dedup_semantic, SQL_DEDUP_SEMANTIC)}
)


def q_text_normalize(sf_dir: str):
    """Canonical text normalization (extras/textstats.normalize_text): NFC +
    control-char strip + whitespace collapse + trim, all Arrow kernels."""
    from .extras.textstats import normalize_text

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return normalize_text(ds, "text", "doc_id")


SQL_TEXT_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(nfc_normalize(text),
                                          '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                           '\s+', ' ', 'g')) AS text_norm,
       CAST(trim(regexp_replace(regexp_replace(nfc_normalize(text),
                                               '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                                '\s+', ' ', 'g')) <> text AS BIGINT) AS changed
FROM documents
"""

EXTRAS_REGISTRY.update({"text_normalize": QueryDef(q_text_normalize, SQL_TEXT_NORMALIZE)})


def q_text_unigram_nll(sf_dir: str):
    """Unigram-LM perplexity scoring (extras/textstats.unigram_nll): corpus
    token counts via sort+boundary-scan, broadcast once; per-doc score is an
    order-independent INTEGER sum of floor(1e6*(ln N - ln c)) per token."""
    from .extras.textstats import unigram_nll

    ds = load(sf_dir, "documents", ["doc_id", "text"])
    return unigram_nll(ds, "text", "doc_id")


SQL_TEXT_UNIGRAM_NLL = r"""
WITH tok AS (
  SELECT doc_id, unnest(arr) AS term
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tot AS (SELECT count(*) AS n FROM tok)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CAST(floor(1000000.0 * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))) AS BIGINT)) AS BIGINT) AS nll_micro
FROM tok JOIN cnt USING (term), tot
GROUP BY doc_id
"""

EXTRAS_REGISTRY.update(
    {"text_unigram_nll": QueryDef(q_text_unigram_nll, SQL_TEXT_UNIGRAM_NLL)}
)


def q_top_orders_per_customer(sf_dir: str):
    """Distributed top-k-per-key as a standalone relational operator
    (util.topk_per_key): each customer's 3 highest-value orders — one range
    sort + per-block within-key ranks with boundary carry, no per-group UDF
    at customer cardinality. Prices in integer cents for hash-exactness."""
    from .util import topk_per_key

    ds = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "o_custkey": b.column("o_custkey").combine_chunks(),
                "o_orderkey": b.column("o_orderkey").combine_chunks(),
                "price_cents": cents,
            }
        )

    narrow = ds.map_batches(_cents, batch_format="pyarrow")
    return topk_per_key(
        narrow, "o_custkey", "price_cents", 3, descending=True, tie_col="o_orderkey"
    ).select_columns(["o_custkey", "o_orderkey", "price_cents"])


SQL_TOP_ORDERS_PER_CUSTOMER = """
WITH c AS (SELECT o_custkey, o_orderkey,
                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
           FROM orders),
r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY price_cents DESC, o_orderkey) AS rn
      FROM c)
SELECT o_custkey, o_orderkey, price_cents FROM r WHERE rn <= 3
"""

EXTRAS_REGISTRY.update(
    {
        "top_orders_per_customer": QueryDef(
            q_top_orders_per_customer, SQL_TOP_ORDERS_PER_CUSTOMER
        )
    }
)


def q_text_dsir(sf_dir: str):
    """DSIR importance weighting (extras/textstats.dsir_logweights): add-one
    smoothed unigram log-ratio between the lang='en' target subset and the
    raw corpus, per-term integer micro-nat weights summed per document —
    order-independent, so the iterative count/broadcast/score plan is
    value-hash gated against the SQL replica."""
    from .extras.textstats import dsir_logweights

    ds = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_logweights(ds, "text", "doc_id", "lang", "en")


SQL_TEXT_DSIR = r"""
WITH tok AS (
  SELECT doc_id, lang, unnest(arr) AS term
  FROM (SELECT doc_id, lang,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
raw AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tgt AS (SELECT term, count(*) AS c FROM tok WHERE lang = 'en' GROUP BY term),
nr AS (SELECT count(*) AS n FROM tok),
nt AS (SELECT count(*) AS n FROM tok WHERE lang = 'en'),
v AS (SELECT count(*) AS v FROM raw),
w AS (SELECT raw.term,
             CAST(floor(1000000.0 * (
                 ln(CAST(COALESCE(tgt.c, 0) + 1 AS DOUBLE))
               - ln(CAST(nt.n + v.v AS DOUBLE))
               - ln(CAST(raw.c + 1 AS DOUBLE))
               + ln(CAST(nr.n + v.v AS DOUBLE)))) AS BIGINT) AS w
      FROM raw LEFT JOIN tgt USING (term), nr, nt, v)
SELECT doc_id, count(*) AS n_tokens, CAST(sum(w.w) AS BIGINT) AS logw_micro
FROM tok JOIN w USING (term)
GROUP BY doc_id
"""

EXTRAS_REGISTRY.update({"text_dsir": QueryDef(q_text_dsir, SQL_TEXT_DSIR)})


def q_graph_bfs_reach(sf_dir: str):
    """Multi-hop reachability (extras/graph.bfs_hops): 3-hop BFS distances
    from the minimum supplier over the bipartite supplier<->part graph drawn
    from lineitem (part nodes offset by 1e7). Frontier BFS — per hop one
    edge join + distinct + visited anti-probe, cost independent of path
    multiplicity; the oracle's bounded recursive CTE enumerates paths and
    takes min(dist), pinning the same fixpoint."""
    from .extras.graph import bfs_hops
    from .util import distinct_rows

    PART_OFFSET = 10_000_000
    li = load(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def _edges(b: pa.Table) -> pa.Table:
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        ) + PART_OFFSET
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, p])),
                "dst": pa.array(np.concatenate([p, s])),
            }
        )

    edges = distinct_rows(
        li.map_batches(_edges, batch_format="pyarrow"), ["src", "dst"]
    )
    seed = int(load(sf_dir, "supplier", ["s_suppkey"]).min("s_suppkey"))
    return bfs_hops(edges, [seed], 3)


SQL_GRAPH_BFS_REACH = """
WITH RECURSIVE bip AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey + 10000000 AS p FROM lineitem),
edges AS (SELECT s AS src, p AS dst FROM bip UNION ALL SELECT p, s FROM bip),
seed AS (SELECT min(s_suppkey) AS s FROM supplier),
reach(node, dist) AS (
  SELECT CAST(s AS BIGINT), 0 FROM seed
  UNION ALL
  SELECT e.dst, r.dist + 1 FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.dist < 3)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM reach GROUP BY node
"""

EXTRAS_REGISTRY.update(
    {"graph_bfs_reach": QueryDef(q_graph_bfs_reach, SQL_GRAPH_BFS_REACH)}
)


def q_multimodal_wav_stats(sf_dir: str):
    """Audio end-to-end with a value-level oracle: attach REAL mono PCM16
    WAV payloads (pure struct+numpy codec) with closed-form samples
    ``s[j] = (doc_id*13 + j*7) % 2001 - 1000``, decode them through the
    RIFF chunk walk in the actor-pool audio-stats stage, and compare the
    integer waveform statistics (sum |s|, sign changes) against the same
    closed form recomputed in SQL."""
    from .extras.multimodal import attach_media_wav, decode_audio_stats

    docs = load(sf_dir, "documents", ["doc_id"])
    return decode_audio_stats(attach_media_wav(docs, "doc_id"))


SQL_MULTIMODAL_WAV_STATS = """
SELECT d.doc_id,
       CAST(800 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(100 AS BIGINT) AS duration_ms,
       (SELECT CAST(sum(abs((d.doc_id * 13 + t.j * 7) % 2001 - 1000)) AS BIGINT)
        FROM unnest(range(800)) AS t(j)) AS sum_abs,
       (SELECT CAST(sum(CASE WHEN ((d.doc_id * 13 + (t.j - 1) * 7) % 2001 - 1000 < 0)
                              <> ((d.doc_id * 13 + t.j * 7) % 2001 - 1000 < 0)
                         THEN 1 ELSE 0 END) AS BIGINT)
        FROM unnest(range(1, 800)) AS t(j)) AS zero_crossings
FROM documents d
"""

EXTRAS_REGISTRY.update(
    {"multimodal_wav_stats": QueryDef(q_multimodal_wav_stats, SQL_MULTIMODAL_WAV_STATS)}
)


def q_multimodal_video_stats(sf_dir: str):
    """Video end-to-end with a value-level oracle: attach REAL monochrome
    Y4M streams (12 frames of closed-form pixels
    ``(doc_id*17 + f*29 + j*3) % 256``), decode + stride-sample every 3rd
    frame in the actor-pool sampler, and compare the sampled-frame pixel
    sums against the same closed form recomputed in SQL."""
    from .extras.multimodal import attach_media_y4m, sample_video_frames

    docs = load(sf_dir, "documents", ["doc_id"])
    return sample_video_frames(attach_media_y4m(docs, "doc_id"), stride=3)


SQL_MULTIMODAL_VIDEO_STATS = """
SELECT d.doc_id,
       CAST(12 AS BIGINT) AS n_frames,
       CAST(25 AS BIGINT) AS fps,
       CAST(4 AS BIGINT) AS frames_sampled,
       (SELECT CAST(sum((d.doc_id * 17 + f.f * 29 + j.j * 3) % 256) AS BIGINT)
        FROM unnest(range(0, 12, 3)) AS f(f), unnest(range(256)) AS j(j))
         AS sampled_pixel_sum
FROM documents d
"""

EXTRAS_REGISTRY.update(
    {
        "multimodal_video_stats": QueryDef(
            q_multimodal_video_stats, SQL_MULTIMODAL_VIDEO_STATS
        )
    }
)


def q_text_paragraph_dedup(sf_dir: str):
    """CCNet-style repeated-paragraph removal (extras/dedup.paragraph_dedup):
    fixed 8-word windows stand in for paragraphs on this newline-free corpus;
    only each chunk's corpus-wide FIRST occurrence (by doc_id, pos) survives,
    and surviving chunks reassemble per doc in position order. Runs over the
    perturbed dup corpus so repeats actually exist."""
    from .extras.dedup import paragraph_dedup

    return paragraph_dedup(_corpus_with_dups(sf_dir), "text", "doc_id", window_words=8)


SQL_TEXT_PARAGRAPH_DEDUP = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN text LIKE '% %' THEN regexp_replace(text, ' [^ ]*$', '') ELSE text END AS text
  FROM documents
),
arr AS (SELECT doc_id, str_split(text, ' ') AS words FROM corpus),
idx AS (
  SELECT doc_id, words,
         unnest(range(0, CAST(ceil(len(words) / 8.0) AS BIGINT))) AS pos
  FROM arr
),
chunks AS (
  SELECT doc_id, pos,
         array_to_string(words[pos * 8 + 1 : (pos + 1) * 8], ' ') AS chunk
  FROM idx
),
firsts AS (
  SELECT chunk, min(doc_id * 1048576 + pos) AS first_key FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       string_agg(c.chunk, ' ' ORDER BY c.pos) AS text_dedup,
       count(*) AS n_chunks
FROM chunks c JOIN firsts f ON c.chunk = f.chunk
WHERE c.doc_id * 1048576 + c.pos = f.first_key
GROUP BY c.doc_id
"""

EXTRAS_REGISTRY.update(
    {"text_paragraph_dedup": QueryDef(q_text_paragraph_dedup, SQL_TEXT_PARAGRAPH_DEDUP)}
)


def q_cluster_kmeans(sf_dir: str):
    """Integer k-means over the embeddings table (extras/cluster.kmeans_int):
    k=4 clusters, 3 Lloyd's iterations from the deterministic smallest-id
    init; centroids broadcast each pass, corpus never shuffles. Integer
    micro-unit arithmetic makes the assignment engine-independent — the
    oracle replays the exact recurrence unrolled in SQL."""
    from .extras.cluster import kmeans_int

    ds = load(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_int(ds, "embedding", "vec_id", k=4, iters=3)


def _sql_kmeans(k: int, iters: int) -> str:
    parts = [
        r"""WITH vec AS (
  SELECT vec_id,
         CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM embeddings
),
seed AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT %d),
cent0 AS (
  SELECT CAST(dense_rank() OVER (ORDER BY v.vec_id) - 1 AS BIGINT) AS cl, v.d, v.q
  FROM vec v JOIN seed s USING (vec_id)
)""" % k
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
dist{i} AS (
  SELECT v.vec_id, c.cl, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
  FROM vec v JOIN cent{i - 1} c USING (d)
  GROUP BY v.vec_id, c.cl
),
best{i} AS (
  SELECT vec_id, (array_agg(cl ORDER BY dist, cl))[1] AS cl
  FROM dist{i} GROUP BY vec_id
),
cent{i} AS (
  SELECT b.cl, v.d,
         CAST(floor(CAST(sum(v.q) AS DOUBLE) / count(*)) AS BIGINT) AS q
  FROM vec v JOIN best{i} b USING (vec_id)
  GROUP BY b.cl, v.d
)"""
        )
    parts.append(
        f""",
fin AS (
  SELECT v.vec_id, c.cl, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
  FROM vec v JOIN cent{iters} c USING (d)
  GROUP BY v.vec_id, c.cl
)
SELECT vec_id,
       (array_agg(cl ORDER BY dist, cl))[1] AS cluster,
       min(dist) AS dist_sq
FROM fin GROUP BY vec_id"""
    )
    return "".join(parts)


SQL_CLUSTER_KMEANS = _sql_kmeans(4, 3)

EXTRAS_REGISTRY.update(
    {"cluster_kmeans": QueryDef(q_cluster_kmeans, SQL_CLUSTER_KMEANS)}
)


def q_agg_rollup(sf_dir: str):
    """GROUP BY ROLLUP over (l_returnflag, l_linestatus): the corpus-sized
    scan is ONE partial-combiner pass (Arrow group_by inside map_batches +
    tiny groupby over per-batch partials, exactly the pricing-summary shape);
    the super-aggregate levels then derive from the FINE aggregate — a table
    bounded by group cardinality (6 rows here), so the rollup itself is a
    bounded driver fold, never a second scan."""
    ds = load(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag").combine_chunks(),
                "l_linestatus": batch.column("l_linestatus").combine_chunks(),
                "qty_c": pc.cast(
                    pc.round(pc.multiply(batch.column("l_quantity"), 100.0)), pa.int64()
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("qty_c", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "n_rows"]
        )

    fine = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty_c", "n_rows"])
        .take_all()
    )
    rows = [
        (r["l_returnflag"], r["l_linestatus"], r["sum(sum_qty_c)"], r["sum(n_rows)"])
        for r in fine
    ]
    lvl1: dict[str, list[int]] = {}
    total = [0, 0]
    for f, s, q, n in rows:
        a = lvl1.setdefault(f, [0, 0])
        a[0] += q
        a[1] += n
        total[0] += q
        total[1] += n
    out = rows + [(f, None, q, n) for f, (q, n) in sorted(lvl1.items())]
    out.append((None, None, total[0], total[1]))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in out], pa.string()),
            "l_linestatus": pa.array([r[1] for r in out], pa.string()),
            "sum_qty_c": pa.array([r[2] for r in out], pa.int64()),
            "n_rows": pa.array([r[3] for r in out], pa.int64()),
        }
    )


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

EXTRAS_REGISTRY.update({"agg_rollup": QueryDef(q_agg_rollup, SQL_AGG_ROLLUP)})


def q_stats_histogram(sf_dir: str):
    """Fixed-width histogram over events.value: pass 1 = global min/max
    (tiny aggregate), pass 2 = vectorized integer bucket assignment +
    per-batch bincount partials combined in a bucket-sized groupby. Exact
    integer bucket formula replicated in SQL."""
    nbins = 20
    ds = load(sf_dir, "events", ["value"])

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {"v_c": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())}
        )

    vc = ds.map_batches(_cents, batch_format="pyarrow")
    lo = vc.min("v_c")
    hi = vc.max("v_c")
    span = hi - lo + 1

    def _bucket(b: pa.Table) -> pa.Table:
        v = b.column("v_c").to_numpy(zero_copy_only=False)
        bk = (v - lo) * nbins // span
        cnt = np.bincount(bk, minlength=nbins)
        return pa.table(
            {
                "bucket": pa.array(np.arange(nbins, dtype=np.int64), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = (
        vc.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["bucket", "n"]).filter(
            pc.greater(t.column("sum(n)"), 0)
        ),
        batch_format="pyarrow",
    )


SQL_STATS_HISTOGRAM = """
WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
b AS (SELECT min(v_c) AS lo, max(v_c) - min(v_c) + 1 AS span FROM c)
SELECT (v_c - lo) * 20 // span AS bucket, count(*) AS n
FROM c, b GROUP BY 1
"""

EXTRAS_REGISTRY.update({"stats_histogram": QueryDef(q_stats_histogram, SQL_STATS_HISTOGRAM)})


def q_join_full_outer(sf_dir: str):
    """FULL OUTER join: customers outside residue class 5 vs order counts of
    customers outside residue class 3 — unmatched rows survive on BOTH sides
    at every scale factor (custkey % 15 in {3,6,9,12} -> left-only; % 15 in
    {5,10} -> right-only). Hash-partitioned Ray-native join; the count side
    is pre-aggregated with the partial-combiner pattern so the join moves
    counts, not orders."""
    from .util import default_num_partitions

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _left(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.not_equal(
                pc.subtract(
                    b.column("c_custkey"),
                    pc.multiply(pc.divide(b.column("c_custkey"), 5), 5),
                ),
                0,
            )
        )
        return pa.table(
            {
                "custkey": t.column("c_custkey").combine_chunks(),
                "acctbal_c": pc.cast(
                    pc.round(pc.multiply(t.column("c_acctbal"), 100.0)), pa.int64()
                ),
            }
        )

    left = cust.map_batches(_left, batch_format="pyarrow")

    orders = load(sf_dir, "orders", ["o_custkey"])

    def _partial(b: pa.Table) -> pa.Table:
        k = b.column("o_custkey")
        t = b.filter(
            pc.not_equal(pc.subtract(k, pc.multiply(pc.divide(k, 3), 3)), 0)
        )
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["custkey", "n_orders"])

    right = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("custkey")
        .sum("n_orders")
        .map_batches(
            lambda t: t.rename_columns(["custkey", "n_orders"]),
            batch_format="pyarrow",
        )
    )
    return left.join(
        right,
        join_type="full_outer",
        num_partitions=default_num_partitions(),
        on=("custkey",),
    )


SQL_JOIN_FULL_OUTER = """
WITH l AS (SELECT c_custkey AS custkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
           FROM customer WHERE c_custkey % 5 <> 0),
r AS (SELECT o_custkey AS custkey, count(*) AS n_orders
      FROM orders WHERE o_custkey % 3 <> 0 GROUP BY o_custkey)
SELECT COALESCE(l.custkey, r.custkey) AS custkey, l.acctbal_c, r.n_orders
FROM l FULL OUTER JOIN r USING (custkey)
"""

EXTRAS_REGISTRY.update({"join_full_outer": QueryDef(q_join_full_outer, SQL_JOIN_FULL_OUTER)})


def q_events_funnel(sf_dir: str):
    """Two-step conversion funnel: per user, the earliest 'signup', then the
    earliest 'purchase' STRICTLY after it within a 7-day window. Both steps
    are partial-combiner min-aggregates (Arrow group_by inside map_batches,
    tiny groupby over partials); the window probe hash-joins purchases to
    the per-user signup table so the event stream never gathers."""
    from .util import hash_join

    win_us = 7 * 24 * 3600 * 1_000_000
    ev = load(sf_dir, "events", ["user_id", "event_type", "ts"])

    def _step(kind: str, out_col: str):
        def _min_partial(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("event_type"), kind))
            tt = pa.table(
                {
                    "user_id": t.column("user_id").combine_chunks(),
                    out_col: t.column("ts").cast(pa.int64()),
                }
            )
            return tt.group_by("user_id").aggregate([(out_col, "min")]).rename_columns(
                ["user_id", out_col]
            )

        return (
            ev.map_batches(_min_partial, batch_format="pyarrow")
            .groupby("user_id")
            .min(out_col)
            .map_batches(
                lambda t: t.rename_columns(["user_id", out_col]),
                batch_format="pyarrow",
            )
        )

    t0 = _step("signup", "t0_us")

    def _pur(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "purchase"))
        return pa.table(
            {
                "user_id": t.column("user_id").combine_chunks(),
                "p_us": t.column("ts").cast(pa.int64()),
            }
        )

    probe = hash_join(
        ev.map_batches(_pur, batch_format="pyarrow"), t0, on="user_id",
        join_type="inner",
    )

    def _in_window(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater(b.column("p_us"), b.column("t0_us")),
            pc.less_equal(b.column("p_us"), pc.add(b.column("t0_us"), win_us)),
        )
        t = b.filter(m)
        return (
            t.select(["user_id", "p_us"])
            .group_by("user_id")
            .aggregate([("p_us", "min")])
            .rename_columns(["user_id", "t1_us"])
        )

    t1 = (
        probe.map_batches(_in_window, batch_format="pyarrow")
        .groupby("user_id")
        .min("t1_us")
        .map_batches(
            lambda t: t.rename_columns(["user_id", "t1_us"]), batch_format="pyarrow"
        )
    )
    out = hash_join(t0, t1, on="user_id", join_type="left_outer")

    def _conv(b: pa.Table) -> pa.Table:
        return b.append_column(
            "converted",
            pc.cast(pc.is_valid(b.column("t1_us")), pa.int64()),
        )

    return out.map_batches(_conv, batch_format="pyarrow")


SQL_EVENTS_FUNNEL = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t0_us
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, min(epoch_us(e.ts)) AS t1_us
      FROM s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > s.t0_us
        AND epoch_us(e.ts) <= s.t0_us + 604800000000
      GROUP BY s.user_id)
SELECT s.user_id, s.t0_us, p.t1_us,
       CAST(p.t1_us IS NOT NULL AS BIGINT) AS converted
FROM s LEFT JOIN p USING (user_id)
"""

EXTRAS_REGISTRY.update({"events_funnel": QueryDef(q_events_funnel, SQL_EVENTS_FUNNEL)})


def q_events_json_extract(sf_dir: str):
    """Vectorized JSON sidecar extraction: parse the `props` JSON column with
    polars' Rust json_path_match kernel inside map_batches (no per-row Python
    json.loads), then per-event-type integer stats via an in-batch partial
    combiner + tiny final groupby. The crawl-scale shape: metadata sidecars
    parse where the data lives; only (type, 4 ints) partials shuffle."""
    ev = load(sf_dir, "events", ["event_type", "props"])

    def _extract(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b).with_columns(
            pl.col("props").str.json_path_match("$.k").cast(pl.Int64).alias("k")
        )
        part = (
            df.drop_nulls("k")
            .group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("k").sum().alias("sum_k"),
                pl.col("k").min().alias("min_k"),
                pl.col("k").max().alias("max_k"),
            )
        )
        return part.to_arrow().cast(
            pa.schema(
                {
                    "event_type": pa.string(),
                    "n": pa.int64(),
                    "sum_k": pa.int64(),
                    "min_k": pa.int64(),
                    "max_k": pa.int64(),
                }
            )
        )

    def _final(t: pa.Table) -> pa.Table:
        return t.rename_columns(["event_type", "n", "sum_k", "min_k", "max_k"])

    return (
        ev.map_batches(_extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            rd.aggregate.Sum("n"),
            rd.aggregate.Sum("sum_k"),
            rd.aggregate.Min("min_k"),
            rd.aggregate.Max("max_k"),
        )
        .map_batches(_final, batch_format="pyarrow")
    )


SQL_EVENTS_JSON_EXTRACT = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
WHERE k IS NOT NULL
GROUP BY event_type
"""


def q_stats_corr(sf_dir: str):
    """Pairwise Pearson correlation over lineitem numeric columns in ONE
    streaming pass: fixed-point (cents) int64 moment partials per batch
    (vectorized numpy, exact — per-batch moments bounded well under 2^63),
    a distributed combine level that folds ~4096 partial rows into one
    decimal128(38) row each (exact 128-bit, applied log-many times at true
    scale — one level suffices through ~10^10 rows), then a bounded driver
    gather + arbitrary-precision Python reduction. The double corr formula
    is applied to identical exact integers on both sides, so the doubles
    are bit-equal to the SQL oracle's HUGEINT-moment replica. The corpus
    never shuffles; only tiny moment rows move."""
    li = load(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def _partial(b: pa.Table) -> pa.Table:
        v = {
            c: pc.cast(pc.round(pc.multiply(b.column(c), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for c in cols
        }
        row: dict[str, list] = {"n": [np.int64(b.num_rows)]}
        for c in cols:
            row[f"s_{c}"] = [v[c].sum(dtype=np.int64)]
            row[f"ss_{c}"] = [(v[c] * v[c]).sum(dtype=np.int64)]
        for a, c in pairs:
            row[f"sp_{a}_{c}"] = [(v[a] * v[c]).sum(dtype=np.int64)]
        return pa.table({k: pa.array(vv, pa.int64()) for k, vv in row.items()})

    dec = pa.decimal128(38, 0)

    def _combine(t: pa.Table) -> pa.Table:
        # exact 128-bit fold of up to ~4096 partial rows into one; Python-int
        # sums here are off the hot path (10 ints per partial row)
        return pa.table(
            {
                c: pa.array(
                    [sum(int(x) for x in t.column(c).to_pylist())], dec
                )
                for c in t.column_names
            }
        )

    parts = (
        li.map_batches(_partial, batch_format="pyarrow")
        .map_batches(_combine, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    tot: dict[str, int] = {}
    for r in parts:
        for k, v in r.items():
            tot[k] = tot.get(k, 0) + int(v)
    n = tot["n"]
    out_x, out_y, out_corr = [], [], []
    for a, c in pairs:
        num = n * tot[f"sp_{a}_{c}"] - tot[f"s_{a}"] * tot[f"s_{c}"]
        va = n * tot[f"ss_{a}"] - tot[f"s_{a}"] ** 2
        vc = n * tot[f"ss_{c}"] - tot[f"s_{c}"] ** 2
        out_x.append(a)
        out_y.append(c)
        out_corr.append(float(num) / np.sqrt(float(va) * float(vc)))
    return pa.table(
        {
            "x_col": pa.array(out_x, pa.string()),
            "y_col": pa.array(out_y, pa.string()),
            "corr": pa.array(out_corr, pa.float64()),
        }
    )


SQL_STATS_CORR = """
WITH m AS (
  SELECT count(*)::HUGEINT AS n,
         sum(CAST(round(l_quantity      * 100) AS HUGEINT)) AS s_q,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS s_p,
         sum(CAST(round(l_discount      * 100) AS HUGEINT)) AS s_d,
         sum(CAST(round(l_quantity      * 100) AS HUGEINT) * CAST(round(l_quantity      * 100) AS HUGEINT)) AS ss_q,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS ss_p,
         sum(CAST(round(l_discount      * 100) AS HUGEINT) * CAST(round(l_discount      * 100) AS HUGEINT)) AS ss_d,
         sum(CAST(round(l_quantity      * 100) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sp_qp,
         sum(CAST(round(l_quantity      * 100) AS HUGEINT) * CAST(round(l_discount      * 100) AS HUGEINT)) AS sp_qd,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT) * CAST(round(l_discount      * 100) AS HUGEINT)) AS sp_pd
  FROM lineitem
)
SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col,
       CAST(n * sp_qp - s_q * s_p AS DOUBLE)
         / sqrt(CAST(n * ss_q - s_q * s_q AS DOUBLE) * CAST(n * ss_p - s_p * s_p AS DOUBLE)) AS corr
FROM m
UNION ALL
SELECT 'l_quantity', 'l_discount',
       CAST(n * sp_qd - s_q * s_d AS DOUBLE)
         / sqrt(CAST(n * ss_q - s_q * s_q AS DOUBLE) * CAST(n * ss_d - s_d * s_d AS DOUBLE))
FROM m
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       CAST(n * sp_pd - s_p * s_d AS DOUBLE)
         / sqrt(CAST(n * ss_p - s_p * s_p AS DOUBLE) * CAST(n * ss_d - s_d * s_d AS DOUBLE))
FROM m
"""


EXTRAS_REGISTRY.update(
    {
        "events_json_extract": QueryDef(q_events_json_extract, SQL_EVENTS_JSON_EXTRACT),
        "stats_corr": QueryDef(q_stats_corr, SQL_STATS_CORR),
    }
)


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-activity day, distinct
    active users per (cohort_day, day_offset). The 100-TB shape: first-day
    per user via ``min_per_key`` (sort + boundary scan — no per-group
    aggregate at user cardinality), ONE hash join keyed on user_id to stamp
    cohorts onto events, distinct (cohort, offset, user) via the same
    sort-scan dedup, and only the day-grid-bounded (cohort, offset) partial
    counts ever reach a Ray groupby."""
    from .util import distinct_rows, hash_join, min_per_key

    ev = load(sf_dir, "events", ["user_id", "ts"])
    US_DAY = 86_400_000_000

    def _days(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "day": pa.array(np.floor_divide(us, US_DAY), pa.int64()),
            }
        )

    days = ev.map_batches(_days, batch_format="pyarrow")
    firsts = min_per_key(days, "user_id", "day").rename_columns({"day": "cohort_day"})
    joined = hash_join(days, firsts, on="user_id", join_type="inner")

    def _offset(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        c = b.column("cohort_day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": b.column("cohort_day").combine_chunks(),
                "day_offset": pa.array(d - c, pa.int64()),
                "user_id": b.column("user_id").combine_chunks(),
            }
        )

    active = distinct_rows(
        joined.map_batches(_offset, batch_format="pyarrow"),
        ["cohort_day", "day_offset", "user_id"],
    )

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["cohort_day", "day_offset"]).aggregate([("user_id", "count")])
        return g.rename_columns(["cohort_day", "day_offset", "n"])

    def _final(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cohort_day", "day_offset", "n_users"])

    return (
        active.map_batches(_partial, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .sum("n")
        .map_batches(_final, batch_format="pyarrow")
    )


SQL_EVENTS_RETENTION = """
WITH e AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
d AS (SELECT DISTINCT f.cohort_day, e.day - f.cohort_day AS day_offset, e.user_id
      FROM e JOIN f USING (user_id))
SELECT cohort_day, day_offset, count(*) AS n_users
FROM d GROUP BY cohort_day, day_offset
"""


BLOOM_PRICE_MIN = 420_000.0


def q_join_bloom_semi(sf_dir: str):
    """Semi join with a broadcast Bloom prefilter: lineitem rows whose order
    is high-value. The scale story: the Bloom bitmap is a FIXED 16 KiB
    broadcast regardless of filter-side cardinality (an exact key set is
    not broadcastable at 10^9 keys), it prunes the big side BEFORE the
    shuffle, and the exact hash join that removes Bloom false positives only
    ever sees the pre-filtered survivors. Bitmap built distributed: one
    packed-uint8 partial per batch, OR-folded on the driver (bounded gather:
    n_batches x 16 KiB)."""
    import ray

    from .util import hash_join

    M_BITS = 1 << 17  # 16 KiB packed
    C2 = np.uint64(0x9E3779B97F4A7C15)

    def _mix(x: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer over uint64 keys
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _probes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = keys.astype(np.uint64)
        h1 = _mix(u) % np.uint64(M_BITS)
        h2 = _mix(u ^ C2) % np.uint64(M_BITS)
        return h1, h2

    hi = load(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), BLOOM_PRICE_MIN)),
        batch_format="pyarrow",
    )

    def _bitmap(b: pa.Table) -> pa.Table:
        bits = np.zeros(M_BITS // 8, np.uint8)
        keys = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        for h in _probes(keys):
            idx = (h // 8).astype(np.int64)
            np.bitwise_or.at(bits, idx, np.uint8(1) << (h % 8).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = hi.map_batches(_bitmap, batch_format="pyarrow").take_all()
    bloom = np.zeros(M_BITS // 8, np.uint8)
    for r in partials:
        bloom |= np.frombuffer(r["bits"], np.uint8)
    bloom_ref = ray.put(bloom)

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def _prefilter(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        h1, h2 = _probes(keys)
        ok = np.ones(len(keys), bool)
        for h in (h1, h2):
            ok &= (bits[(h // 8).astype(np.int64)] >> (h % 8).astype(np.uint8)) & 1 == 1
        return b.filter(pa.array(ok))

    survivors = li.map_batches(_prefilter, batch_format="pyarrow")
    keys_only = hi.select_columns(["o_orderkey"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )
    return hash_join(survivors, keys_only, on="l_orderkey", join_type="inner")


SQL_JOIN_BLOOM_SEMI = f"""
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > {BLOOM_PRICE_MIN})
"""


def q_dedup_url_canonical(sf_dir: str):
    """Canonical-URL dedup over a deterministic messy-crawl table (clean url
    + one cased/fragment/utm/trailing-slash variant per doc, like
    ``_corpus_with_dups``): general vectorized canonicalization — lowercase
    scheme+host, strip fragment, drop utm_* params, strip trailing slash —
    then earliest capture per canonical url via ``min_per_key``. Everything
    is RE2 kernels over Arrow columns; the dedup is the sort+boundary-scan
    shape, so no per-group aggregate at url cardinality."""
    from .util import min_per_key

    docs = load(sf_dir, "documents", ["doc_id"])

    def _raw(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        ids = pc.cast(b.column("doc_id"), pa.string())
        base = pc.binary_join_element_wise(
            pa.array(["https://example.org/doc/"] * len(d), pa.string()), ids, ""
        )
        suffix = pa.array(
            np.select(
                [d % 4 == 0, d % 4 == 1, d % 4 == 2],
                ["", "#frag", "?utm_source=feed"],
                default="/",
            ),
            pa.string(),
        )
        variant = pc.binary_join_element_wise(base, suffix, "")
        # variant 0 differs by host case instead of a suffix
        upper_host = pc.binary_join_element_wise(
            pa.array(["https://EXAMPLE.org/doc/"] * len(d), pa.string()), ids, ""
        )
        variant = pc.if_else(pa.array(d % 4 == 0), upper_host, variant)
        ts0 = 1_600_000_000 + (d * 7919) % 100_000
        ts1 = ts0 + ((d % 2) * 2 - 1) * (1 + (d * 104_729) % 1000)
        return pa.table(
            {
                "url": pa.concat_arrays(
                    [base.combine_chunks(), variant.combine_chunks()]
                ),
                "ts": pa.array(np.concatenate([ts0, ts1]), pa.int64()),
            }
        )

    raw = docs.map_batches(_raw, batch_format="pyarrow")

    def _canon(b: pa.Table) -> pa.Table:
        u = b.column("url")
        u = pc.replace_substring_regex(u, r"#.*$", "")          # fragment
        u = pc.replace_substring_regex(u, r"utm_[^&#]*&", "")   # utm_, more follow
        u = pc.replace_substring_regex(u, r"[?&]utm_[^&#]*$", "")  # utm_ last
        u = pc.replace_substring_regex(u, r"^(.+[^/:])/$", r"\1")  # trailing slash
        parts = pc.extract_regex(u, r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)(?P<rest>.*)$")
        head = pc.utf8_lower(pc.struct_field(parts, "head"))
        rest = pc.struct_field(parts, "rest")
        return pa.table(
            {
                "url": pc.binary_join_element_wise(head, rest, ""),
                "ts": b.column("ts").combine_chunks(),
            }
        )

    canon = raw.map_batches(_canon, batch_format="pyarrow")
    return min_per_key(canon, "url", "ts").rename_columns({"ts": "first_ts"})


SQL_DEDUP_URL_CANONICAL = """
WITH raw AS (
  SELECT doc_id AS d,
         CAST(1600000000 + (doc_id * 7919) % 100000 AS BIGINT) AS ts
  FROM documents
)
SELECT 'https://example.org/doc/' || d AS url,
       CAST(least(ts, ts + ((d % 2) * 2 - 1) * (1 + (d * 104729) % 1000))
            AS BIGINT) AS first_ts
FROM raw
"""


EXTRAS_REGISTRY.update(
    {
        "events_retention": QueryDef(q_events_retention, SQL_EVENTS_RETENTION),
        "join_bloom_semi": QueryDef(q_join_bloom_semi, SQL_JOIN_BLOOM_SEMI),
        "dedup_url_canonical": QueryDef(
            q_dedup_url_canonical, SQL_DEDUP_URL_CANONICAL
        ),
    }
)


def q_stats_entropy(sf_dir: str):
    """Corpus unigram Shannon entropy in exact integer micro-nats: a token
    with corpus count c of N total contributes c * floor(1e6*(ln N - ln c)),
    so the corpus-wide sum is order-independent (same trick as
    ``text_unigram_nll``; int64-safe through N ~ 4e11 tokens). Shape: ONE
    tokenize pass -> ``exact_value_counts`` (sort+boundary-scan, never a Ray
    groupby at vocabulary cardinality) -> two bounded folds over the narrow
    (term, n) stream: block-partial token totals first, then block-partial
    entropy sums against the broadcast total — the vocabulary itself never
    gathers to the driver."""
    from .extras.stats import exact_value_counts

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _tokens(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        return pa.table({"term": flat.filter(pc.not_equal(flat, ""))})

    counts = exact_value_counts(
        docs.map_batches(_tokens, batch_format="pyarrow"), "term"
    ).materialize()

    def _tot(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_tok": pa.array([int(n.sum())], pa.int64()),
                "n_term": pa.array([b.num_rows], pa.int64()),
            }
        )

    partials = counts.map_batches(_tot, batch_format="pyarrow").take_all()
    n_tokens = sum(r["n_tok"] for r in partials)
    n_terms = sum(r["n_term"] for r in partials)
    ln_n = np.log(float(n_tokens)) if n_tokens else 0.0

    def _ent(b: pa.Table) -> pa.Table:
        c = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        per_term = np.floor(
            1_000_000.0 * (ln_n - np.log(c.astype(np.float64)))
        ).astype(np.int64)
        return pa.table({"e": pa.array([int((c * per_term).sum())], pa.int64())})

    ent = sum(
        r["e"] for r in counts.map_batches(_ent, batch_format="pyarrow").take_all()
    )
    return pa.table(
        {
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_terms": pa.array([n_terms], pa.int64()),
            "entropy_micro": pa.array([ent], pa.int64()),
        }
    )


SQL_STATS_ENTROPY = r"""
WITH tok AS (
  SELECT unnest(arr) AS term
  FROM (SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tot AS (SELECT count(*) AS n FROM tok)
SELECT CAST(n AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(c * CAST(floor(1000000.0 * (ln(CAST(n AS DOUBLE))
                                            - ln(CAST(c AS DOUBLE)))) AS BIGINT))
            AS BIGINT) AS entropy_micro
FROM cnt, tot
GROUP BY n
"""


EXTRAS_REGISTRY.update(
    {"stats_entropy": QueryDef(q_stats_entropy, SQL_STATS_ENTROPY)}
)


SAMPLE_W_KEY64 = 0x5EEDB10C_0F00D5_01 % (1 << 64)
SAMPLE_W_K = 20


def q_sample_weighted(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): doc i gets key = -ln(1 - u_i) / w_i with w_i = n_chars
    and u_i an exact SplitMix64 counter uniform keyed by doc_id
    (partition-independent — no rank coordination, any task computes any
    row's key), sample = k smallest keys. One stateless pass computes keys;
    the only wide step is a narrow (key, id, w) sort + limit. The oracle
    replays the identical uniform with HUGEINT mod-2^64 SQL (sqlrng) and the
    identical double ops; ln here is the one transcendental — same ~1-ulp
    caveat as sqlrng's gaussians, order flips need a coincidence at the k-th
    rank boundary (~2^-40/row, value-hash-verified in practice)."""
    from .rng import _sm64_mix, SM64_GAMMA

    docs = load(sf_dir, "documents", ["doc_id", "n_chars"])

    def _keys(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(over="ignore"):
            z = _sm64_mix(np.uint64(SAMPLE_W_KEY64) + ids * np.uint64(SM64_GAMMA))
        u = (z >> np.uint64(11)).astype(np.float64) * (1.0 / 9007199254740992.0)
        key = -np.log(1.0 - u) / w
        return pa.table(
            {
                "es_key": pa.array(key, pa.float64()),
                "doc_id": b.column("doc_id").combine_chunks(),
                "n_chars": b.column("n_chars").combine_chunks(),
            }
        )

    return (
        docs.map_batches(_keys, batch_format="pyarrow")
        .sort(["es_key", "doc_id"])
        .limit(SAMPLE_W_K)
        .select_columns(["doc_id", "n_chars"])
    )


def _sql_sample_weighted() -> str:
    from .sqlrng import _sm64_chain

    chain = _sm64_chain(
        "sw", "documents", "doc_id, n_chars", {"u": "doc_id"}, SAMPLE_W_KEY64
    )
    return f"""
WITH {chain}
SELECT doc_id, n_chars FROM swu
ORDER BY -ln(1.0 - u) / CAST(n_chars AS DOUBLE), doc_id
LIMIT {SAMPLE_W_K}
"""


EXTRAS_REGISTRY.update(
    {"sample_weighted": QueryDef(q_sample_weighted, _sql_sample_weighted())}
)


def q_text_tfidf_topterms(sf_dir: str):
    """Per-document top-3 TF-IDF terms in exact integer form: score =
    tf * floor(1e6*(ln N - ln df)). Per-doc term frequencies are complete
    inside one batch (a document never spans batches), df comes from
    ``exact_value_counts`` over the (doc, term) pairs, the idf table is
    vocabulary-bounded and broadcast once (same documented swap-for-top-V
    caveat as ``text_unigram_nll``), and the top-3 selection is
    ``topk_per_key`` — sort + boundary-carried within-key ranks, never a
    per-group UDF."""
    import ray

    from .extras.stats import exact_value_counts
    from .util import topk_per_key

    docs = load(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def _tf(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        ids = batch.column("doc_id").combine_chunks().take(parent.filter(keep))
        g = (
            pa.table({"doc_id": ids, "term": flat.filter(keep)})
            .group_by(["doc_id", "term"])
            .aggregate([("term", "count")])
        )
        return g.rename_columns(["doc_id", "term", "tf"])

    tf = docs.map_batches(_tf, batch_format="pyarrow").materialize()
    df = exact_value_counts(tf.select_columns(["term"]), "term").materialize()
    parts = [t for t in ray.get(df.to_arrow_refs()) if t.num_rows]
    if parts:
        vocab = pa.concat_tables(parts)
        terms = np.asarray(vocab.column("term").to_pylist())
        d = vocab.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(terms)
        terms = terms[order]
        idf = np.floor(1_000_000.0 * (np.log(float(n_docs)) - np.log(d[order]))).astype(
            np.int64
        )
    else:
        terms, idf = np.array([], dtype=str), np.array([], np.int64)
    ref = ray.put((terms, idf))

    def _score(b: pa.Table) -> pa.Table:
        ts, iv = ray.get(ref)
        t = np.asarray(b.column("term").to_pylist())
        c = b.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ts, t)
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "term": b.column("term").combine_chunks(),
                "score": pa.array(c * iv[pos], pa.int64()),
            }
        )

    scored = tf.map_batches(_score, batch_format="pyarrow")
    return topk_per_key(scored, "doc_id", "score", 3, descending=True, tie_col="term")


SQL_TEXT_TFIDF = r"""
WITH tok AS (
  SELECT doc_id, unnest(arr) AS term
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS arr
        FROM documents)
),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS d FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, term,
             c * CAST(floor(1000000.0 * (ln(CAST(n AS DOUBLE))
                                         - ln(CAST(d AS DOUBLE)))) AS BIGINT)
                 AS score
      FROM tf JOIN df USING (term), nd),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM s)
SELECT doc_id, term, CAST(score AS BIGINT) AS score FROM r WHERE rn <= 3
"""


COLLOC_MIN_COUNT = 5
COLLOC_TOPK = 20


def q_text_collocations(sf_dir: str):
    """Corpus-wide PMI collocations (phrase mining): word bigrams scored by
    floor(1e6 * (ln c_ab - ln N_bi - ln c_a - ln c_b + 2 ln N_uni)), top-20
    by (pmi, bigram). Bigram + unigram counts via ``exact_value_counts``
    (sort+boundary-scan); the unigram table is vocabulary-bounded and
    broadcast; bigram scoring streams over the narrow (bigram, count) stream
    with a count >= 5 support filter BEFORE any gather, and only the top-k
    sort touches scored rows."""
    import ray

    from .extras.stats import exact_value_counts

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _tok(batch: pa.Table):
        txt = batch.column("text").combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        return flat.filter(keep), parent.filter(keep)

    def _unigrams(batch: pa.Table) -> pa.Table:
        flat, _ = _tok(batch)
        return pa.table({"term": flat})

    def _bigrams(batch: pa.Table) -> pa.Table:
        flat, parent = _tok(batch)
        if len(flat) < 2:
            return pa.table({"bg": pa.array([], pa.string())})
        a = flat.slice(0, len(flat) - 1)
        b = flat.slice(1)
        same = pc.equal(parent.slice(0, len(parent) - 1), parent.slice(1))
        bg = pc.binary_join_element_wise(a, b, "\x00")
        return pa.table({"bg": bg.filter(same)})

    uni = exact_value_counts(
        docs.map_batches(_unigrams, batch_format="pyarrow"), "term"
    ).materialize()
    big = exact_value_counts(
        docs.map_batches(_bigrams, batch_format="pyarrow"), "bg"
    ).materialize()

    def _tot(col):
        def _f(b: pa.Table) -> pa.Table:
            n = b.column("n").to_numpy(zero_copy_only=False)
            return pa.table({"t": pa.array([int(n.sum())], pa.int64())})

        return _f

    n_uni = sum(r["t"] for r in uni.map_batches(_tot("n"), batch_format="pyarrow").take_all())
    n_bi = sum(r["t"] for r in big.map_batches(_tot("n"), batch_format="pyarrow").take_all())
    parts = [t for t in ray.get(uni.to_arrow_refs()) if t.num_rows]
    terms = np.asarray(pa.concat_tables(parts).column("term").to_pylist())
    cnts = np.concatenate(
        [t.column("n").to_numpy(zero_copy_only=False) for t in parts]
    ).astype(np.float64)
    order = np.argsort(terms)
    terms, cnts = terms[order], cnts[order]
    ref = ray.put((terms, cnts))
    const = 2.0 * np.log(float(n_uni)) - np.log(float(n_bi)) if n_bi else 0.0

    def _pmi(b: pa.Table) -> pa.Table:
        ts, cs = ray.get(ref)
        t = b.filter(pc.greater_equal(b.column("n"), COLLOC_MIN_COUNT))
        if t.num_rows == 0:
            return pa.table(
                {
                    "term_a": pa.array([], pa.string()),
                    "term_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "pmi_micro": pa.array([], pa.int64()),
                }
            )
        parts = pc.split_pattern(t.column("bg"), "\x00")
        a = pc.list_element(parts, 0)
        bterm = pc.list_element(parts, 1)
        c_ab = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = cs[np.searchsorted(ts, np.asarray(a.to_pylist()))]
        c_b = cs[np.searchsorted(ts, np.asarray(bterm.to_pylist()))]
        pmi = np.floor(
            1_000_000.0 * (np.log(c_ab) - np.log(c_a) - np.log(c_b) + const)
        ).astype(np.int64)
        return pa.table(
            {
                "term_a": a,
                "term_b": bterm,
                "n_pairs": t.column("n").combine_chunks(),
                "pmi_micro": pa.array(pmi, pa.int64()),
            }
        )

    return (
        big.map_batches(_pmi, batch_format="pyarrow")
        .sort(["pmi_micro", "term_a", "term_b"], descending=[True, False, False])
        .limit(COLLOC_TOPK)
    )


SQL_TEXT_COLLOCATIONS = rf"""
WITH arrs AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
tok AS (SELECT unnest(arr) AS term FROM arrs),
bgs AS (
  SELECT unnest(list_transform(range(1, array_length(arr)),
                               i -> arr[i] || chr(0) || arr[i + 1])) AS bg
  FROM arrs WHERE array_length(arr) >= 2
),
uni AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
big AS (SELECT bg, count(*) AS c FROM bgs GROUP BY bg HAVING count(*) >= {COLLOC_MIN_COUNT}),
tot AS (SELECT (SELECT count(*) FROM tok) AS n_uni, (SELECT count(*) FROM bgs) AS n_bi),
s AS (
  SELECT split_part(bg, chr(0), 1) AS term_a,
         split_part(bg, chr(0), 2) AS term_b,
         CAST(big.c AS BIGINT) AS n_pairs,
         CAST(floor(1000000.0 * (ln(CAST(big.c AS DOUBLE))
                                 - ln(CAST(ca.c AS DOUBLE))
                                 - ln(CAST(cb.c AS DOUBLE))
                                 + 2.0 * ln(CAST(n_uni AS DOUBLE))
                                 - ln(CAST(n_bi AS DOUBLE)))) AS BIGINT)
             AS pmi_micro
  FROM big, tot
  JOIN uni ca ON ca.term = split_part(bg, chr(0), 1)
  JOIN uni cb ON cb.term = split_part(bg, chr(0), 2)
)
SELECT term_a, term_b, n_pairs, pmi_micro FROM s
ORDER BY pmi_micro DESC, term_a, term_b
LIMIT {COLLOC_TOPK}
"""


def q_events_sliding_distinct(sf_dir: str):
    """Trailing 3-hour sliding DISTINCT active users per hour: each (hour,
    user) activity is replicated to the <=3 window anchors that cover it
    (granule replication — the same no-range-shuffle trick as the interval
    join), then one sort-scan distinct over (window, user) and day-bounded
    counts. DISTINCT-across-a-window is the pattern HLL approximates at
    scale; this is the exact variant."""
    from .util import distinct_rows

    ev = load(sf_dir, "events", ["user_id", "ts"])
    US_H = 3_600_000_000

    def _rep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        hour = np.floor_divide(us, US_H)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        wins = np.concatenate([hour, hour + 1, hour + 2])
        return pa.table(
            {
                "win_hour": pa.array(wins, pa.int64()),
                "user_id": pa.array(np.tile(uid, 3), pa.int64()),
            }
        )

    wu = distinct_rows(
        ev.map_batches(_rep, batch_format="pyarrow"), ["win_hour", "user_id"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["win_hour"]).aggregate([("user_id", "count")])
        return g.rename_columns(["win_hour", "n"])

    def _final(t: pa.Table) -> pa.Table:
        return t.rename_columns(["win_hour", "n_users"])

    return (
        wu.map_batches(_partial, batch_format="pyarrow")
        .groupby("win_hour")
        .sum("n")
        .map_batches(_final, batch_format="pyarrow")
    )


SQL_EVENTS_SLIDING_DISTINCT = """
WITH e AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour FROM events),
r AS (SELECT DISTINCT hour + d.off AS win_hour, user_id
      FROM e, (VALUES (0), (1), (2)) AS d(off))
SELECT win_hour, count(*) AS n_users FROM r GROUP BY win_hour
"""


EXTRAS_REGISTRY.update(
    {
        "text_tfidf_topterms": QueryDef(q_text_tfidf_topterms, SQL_TEXT_TFIDF),
        "text_collocations": QueryDef(q_text_collocations, SQL_TEXT_COLLOCATIONS),
        "events_sliding_distinct": QueryDef(
            q_events_sliding_distinct, SQL_EVENTS_SLIDING_DISTINCT
        ),
    }
)


def q_multimodal_image_dedup(sf_dir: str):
    """Image near-dup dedup by perceptual hash: REAL PNG payloads decode in
    an actor pool into 8x8 average-hashes (all-integer bit rule, so the
    fingerprint is engine-exact), then keeper + group size per hash. The
    affine corpus pixels depend on doc_id % 256, so genuine duplicate groups
    exist (ids 256 apart render identical images). Dedup is the folded-key
    sort-scan pair: ``min_per_key`` for the keeper, ``sum_per_key`` for the
    group size, joined on the fingerprint — no per-group aggregate at hash
    cardinality, and the MB-scale payloads never travel past decode."""
    from .extras.graph import sum_per_key
    from .extras.multimodal import ahash_media, attach_media_affine
    from .util import hash_join, min_per_key

    docs = load(sf_dir, "documents", ["doc_id"])
    hashed = ahash_media(attach_media_affine(docs, "doc_id")).materialize()

    def _fold(b: pa.Table) -> pa.Table:
        # uint64 pack: bit 63 of the hash can be set, so a signed pack
        # would wrap negative and corrupt the split on the way back out
        hi = b.column("hash_hi").to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = b.column("hash_lo").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "h": pa.array((hi << np.uint64(32)) | lo, pa.uint64()),
                "doc_id": b.column("doc_id").combine_chunks(),
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    folded = hashed.map_batches(_fold, batch_format="pyarrow")
    keeper = min_per_key(
        folded.select_columns(["h", "doc_id"]), "h", "doc_id"
    ).rename_columns({"doc_id": "keeper_id"})
    sizes = sum_per_key(folded.select_columns(["h", "c"]), "h", "c").rename_columns(
        {"c": "n_imgs"}
    )
    joined = hash_join(keeper, sizes, on="h", join_type="inner")

    def _split(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "hash_hi": pa.array((h >> np.uint64(32)).astype(np.int64), pa.int64()),
                "hash_lo": pa.array(
                    (h & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
                "keeper_id": b.column("keeper_id").combine_chunks(),
                "n_imgs": b.column("n_imgs").combine_chunks(),
            }
        )

    return joined.map_batches(_split, batch_format="pyarrow")


# the SQL recomputes pixels, cells, bits, and both int64-safe 32-bit hash
# halves closed-form from the affine corpus definition.
SQL_MULTIMODAL_IMAGE_DEDUP = """
WITH cells AS (
  SELECT d.doc_id, k.k,
         ((d.doc_id*31 + ((2*(k.k//8))*16 + 2*(k.k%8)) * ((2*(k.k//8))*16 + 2*(k.k%8))) % 256
        + (d.doc_id*31 + ((2*(k.k//8))*16 + 2*(k.k%8) + 1) * ((2*(k.k//8))*16 + 2*(k.k%8) + 1)) % 256
        + (d.doc_id*31 + ((2*(k.k//8) + 1)*16 + 2*(k.k%8)) * ((2*(k.k//8) + 1)*16 + 2*(k.k%8))) % 256
        + (d.doc_id*31 + ((2*(k.k//8) + 1)*16 + 2*(k.k%8) + 1) * ((2*(k.k//8) + 1)*16 + 2*(k.k%8) + 1)) % 256
         ) AS cell
  FROM documents d, unnest(range(64)) AS k(k)
),
tot AS (SELECT doc_id, sum(cell) AS total FROM cells GROUP BY doc_id),
bits AS (SELECT c.doc_id, c.k,
                CASE WHEN c.cell * 64 > t.total THEN 1 ELSE 0 END AS b
         FROM cells c JOIN tot t USING (doc_id)),
h AS (SELECT doc_id,
             CAST(sum(CASE WHEN k >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(sum(CASE WHEN k < 32 THEN b * (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id)
SELECT hash_hi, hash_lo, min(doc_id) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_imgs
FROM h GROUP BY hash_hi, hash_lo
"""


EXTRAS_REGISTRY.update(
    {
        "multimodal_image_dedup": QueryDef(
            q_multimodal_image_dedup, SQL_MULTIMODAL_IMAGE_DEDUP
        )
    }
)


def q_events_anomaly_zscore(sf_dir: str):
    """Per-event-type daily-volume anomaly scores: z = (c - mean)/std over
    each type's daily counts. Counting is the distributed part (in-batch
    partials, day-grid-bounded groupby); the day-grid aggregate is tiny, so
    moments and z-scores fold on the driver with the EXACT op sequence the
    SQL replica uses (integer moments -> one IEEE divide each for mean/var,
    correctly-rounded sqrt, one subtract, one divide) — the doubles are
    bit-equal, same discipline as ``stats_corr``."""
    ev = load(sf_dir, "events", ["event_type", "ts"])
    US_DAY = 86_400_000_000

    def _partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b.column("event_type").combine_chunks(),
                "day": pa.array(np.floor_divide(us, US_DAY), pa.int64()),
            }
        )
        g = t.group_by(["event_type", "day"]).aggregate([("day", "count")])
        return g.rename_columns(["event_type", "day", "n"])

    rows = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum("n")
        .take_all()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["day"], int(r["sum(n)"])))
    et_out, day_out, n_out, z_out = [], [], [], []
    for et in sorted(by_type):
        dc = by_type[et]
        cs = np.array([c for _, c in dc], np.int64)
        d = len(cs)
        s, ss = int(cs.sum()), int((cs * cs).sum())
        mean = np.float64(s) / np.float64(d)
        std = np.sqrt(np.float64(d * ss - s * s) / np.float64(d * d))
        for (day, c) in dc:
            et_out.append(et)
            day_out.append(day)
            n_out.append(c)
            z_out.append(float((np.float64(c) - mean) / std))
    return pa.table(
        {
            "event_type": pa.array(et_out, pa.string()),
            "day": pa.array(day_out, pa.int64()),
            "n_events": pa.array(n_out, pa.int64()),
            "z": pa.array(z_out, pa.float64()),
        }
    )


SQL_EVENTS_ANOMALY_ZSCORE = """
WITH dc AS (SELECT event_type,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                   count(*) AS c
            FROM events GROUP BY event_type, day),
st AS (SELECT event_type, count(*) AS dnum,
              CAST(sum(c) AS BIGINT) AS s,
              CAST(sum(c * c) AS BIGINT) AS ss
       FROM dc GROUP BY event_type)
SELECT dc.event_type, dc.day, CAST(dc.c AS BIGINT) AS n_events,
       (CAST(dc.c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(dnum AS DOUBLE))
         / sqrt(CAST(dnum * ss - s * s AS DOUBLE)
                / CAST(dnum * dnum AS DOUBLE)) AS z
FROM dc JOIN st USING (event_type)
"""


JACCARD_MIN_COMMON = 2
JACCARD_TOPK = 50


def q_graph_jaccard_parts(sf_dir: str):
    """Node-similarity by neighbor-set Jaccard over the order-part bipartite
    graph (the link-prediction / related-items primitive): parts scored by
    |shared orders| / |union of orders|, all-integer
    (jaccard_micro = (1e6·c) // (dA+dB-c)). Wedge generation is an
    order-keyed self-join with per-order-bounded fan-out, pair counts and
    degrees are folded-key sort-scans, degrees attach through two hash joins
    (the part table is corpus-scale — never broadcast), and only the
    support-filtered scored pairs reach the final top-k sort."""
    from .extras.graph import sum_per_key
    from .util import distinct_rows, hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    op = distinct_rows(
        li.rename_columns({"l_orderkey": "o", "l_partkey": "p"}), ["o", "p"]
    )

    def _ones(key: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: b.column(key).combine_chunks(),
                    "c": pa.array(np.ones(b.num_rows, np.int64)),
                }
            )

        return _f

    deg = sum_per_key(op.map_batches(_ones("p"), batch_format="pyarrow"), "p", "c")
    left = op.rename_columns({"p": "pa_"})
    right = op.rename_columns({"p": "pb_"})
    wedges = hash_join(left, right, on="o", join_type="inner")

    def _fold(b: pa.Table) -> pa.Table:
        a = b.column("pa_").to_numpy(zero_copy_only=False)
        bb = b.column("pb_").to_numpy(zero_copy_only=False)
        m = a < bb
        return pa.table(
            {
                "pair": pa.array(a[m] * (1 << 32) + bb[m], pa.int64()),
                "c": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    pairs = sum_per_key(
        wedges.map_batches(_fold, batch_format="pyarrow"), "pair", "c"
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("c"), JACCARD_MIN_COMMON)),
        batch_format="pyarrow",
    )

    def _split(b: pa.Table) -> pa.Table:
        pr = b.column("pair").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part_a": pa.array(pr >> 32, pa.int64()),
                "part_b": pa.array(pr & 0xFFFFFFFF, pa.int64()),
                "n_common": b.column("c").combine_chunks(),
            }
        )

    scored = hash_join(
        hash_join(
            pairs.map_batches(_split, batch_format="pyarrow"),
            deg.rename_columns({"p": "part_a", "c": "d_a"}),
            on="part_a",
            join_type="inner",
        ),
        deg.rename_columns({"p": "part_b", "c": "d_b"}),
        on="part_b",
        join_type="inner",
    )

    def _jac(b: pa.Table) -> pa.Table:
        c = b.column("n_common").to_numpy(zero_copy_only=False)
        da = b.column("d_a").to_numpy(zero_copy_only=False)
        db = b.column("d_b").to_numpy(zero_copy_only=False)
        jm = (1_000_000 * c) // (da + db - c)
        return pa.table(
            {
                "part_a": b.column("part_a").combine_chunks(),
                "part_b": b.column("part_b").combine_chunks(),
                "n_common": b.column("n_common").combine_chunks(),
                "d_a": b.column("d_a").combine_chunks(),
                "d_b": b.column("d_b").combine_chunks(),
                "jaccard_micro": pa.array(jm, pa.int64()),
            }
        )

    return (
        scored.map_batches(_jac, batch_format="pyarrow")
        .sort(["jaccard_micro", "part_a", "part_b"], descending=[True, False, False])
        .limit(JACCARD_TOPK)
    )


SQL_GRAPH_JACCARD_PARTS = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
deg AS (SELECT p, count(*) AS d FROM op GROUP BY p),
pairs AS (SELECT a.p AS part_a, b.p AS part_b, count(*) AS c
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p
          HAVING count(*) >= {JACCARD_MIN_COMMON})
SELECT part_a, part_b, CAST(c AS BIGINT) AS n_common,
       CAST(da.d AS BIGINT) AS d_a, CAST(db.d AS BIGINT) AS d_b,
       CAST((1000000 * c) // (da.d + db.d - c) AS BIGINT) AS jaccard_micro
FROM pairs JOIN deg da ON da.p = pairs.part_a JOIN deg db ON db.p = pairs.part_b
ORDER BY jaccard_micro DESC, part_a, part_b
LIMIT {JACCARD_TOPK}
"""


EXTRAS_REGISTRY.update(
    {
        "events_anomaly_zscore": QueryDef(
            q_events_anomaly_zscore, SQL_EVENTS_ANOMALY_ZSCORE
        ),
        "graph_jaccard_parts": QueryDef(q_graph_jaccard_parts, SQL_GRAPH_JACCARD_PARTS),
    }
)


def q_events_markov_transitions(sf_dir: str):
    """Per-user event-sequence transition counts (the Markov-chain /
    session-flow statistic): consecutive (from_type, to_type) pairs in each
    user's time-ordered stream, counted corpus-wide. Same distributed shape
    as sessionize: ONE range sort by (user, ts, event_id), vectorized
    per-block adjacent-pair scan with a one-row halo (the previous block's
    last (user, type)), in-block partial counts, and only the
    type-grid-bounded partials reach a Ray groupby."""
    import ray

    from .util import coalesce_blocks

    ds = load(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"]).materialize()
    s = coalesce_blocks(ds).sort(["user_id", "ts", "event_id"]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _halo(t: pa.Table):
        if t.num_rows == 0:
            return None
        return (
            t.column("user_id")[-1].as_py(),
            t.column("event_type")[-1].as_py(),
        )

    halos = ray.get([_halo.remote(r) for r in refs])
    refs = [r for r, h in zip(refs, halos) if h is not None]
    halos = [h for h in halos if h is not None]

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, prev) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").combine_chunks()
        same = pa.array(u[1:] == u[:-1])
        frm = et.slice(0, len(u) - 1).filter(same)
        to = et.slice(1).filter(same)
        if prev is not None and len(u) and u[0] == prev[0]:
            frm = pa.concat_arrays([pa.array([prev[1]], pa.string()), frm])
            to = pa.concat_arrays([et.slice(0, 1), to])
        g = (
            pa.table({"from_type": frm, "to_type": to})
            .group_by(["from_type", "to_type"])
            .aggregate([("to_type", "count")])
        )
        return g.rename_columns(["from_type", "to_type", "n"])

    part_refs = [
        _scan.remote(refs[b], halos[b - 1] if b > 0 else None) for b in range(len(refs))
    ]
    parts = ray.data.from_arrow_refs(part_refs)

    def _final(t: pa.Table) -> pa.Table:
        return t.rename_columns(["from_type", "to_type", "n"])

    return (
        parts.groupby(["from_type", "to_type"]).sum("n").map_batches(
            _final, batch_format="pyarrow"
        )
    )


SQL_EVENTS_MARKOV = """
WITH x AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS pt
           FROM events)
SELECT pt AS from_type, event_type AS to_type, count(*) AS n
FROM x WHERE pt IS NOT NULL GROUP BY pt, event_type
"""


EXTRAS_REGISTRY.update(
    {
        "events_markov_transitions": QueryDef(
            q_events_markov_transitions, SQL_EVENTS_MARKOV
        )
    }
)


def q_dedup_editdist(sf_dir: str):
    """Typo-level fuzzy dedup: all customer-name pairs within Levenshtein
    distance 1 via FastSS deletion-neighborhood blocking (extras.dedup.
    editdist_pairs) — variants shuffle as (int64 hash, id) rows through one
    hash self-join, verification is exact vectorized u8-matrix comparison.
    The reference has no fuzzy matching; this is the record-linkage member
    of the dedup family over the person-like table."""
    from .extras.dedup import editdist_pairs

    cust = load(sf_dir, "customer", ["c_custkey", "c_name"])
    return editdist_pairs(cust, "c_name", "c_custkey")


SQL_DEDUP_EDITDIST = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


EXTRAS_REGISTRY.update(
    {"dedup_editdist": QueryDef(q_dedup_editdist, SQL_DEDUP_EDITDIST)}
)


def q_stats_mad(sf_dir: str):
    """Robust location/scale statistics: median and median-absolute-deviation
    of l_quantity. Two chained exact discrete quantiles (DuckDB
    quantile_disc semantics), each ONE narrow (value, id) range sort + a
    point lookup at rank ceil(n/2)-1 — the median never gathers the column
    to the driver, and the second pass broadcasts the first median as a
    scalar into a vectorized |x - med| map. abs-difference on doubles is
    exact IEEE, so the MAD element is bit-equal to the SQL replica."""
    from .extras.stats import exact_quantiles

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    med = exact_quantiles(li, "l_quantity", [0.5]).column("value")[0].as_py()

    def _dev(b: pa.Table) -> pa.Table:
        return pa.table(
            {"dev": pc.abs(pc.subtract(b.column("l_quantity"), med))}
        )

    dev = li.map_batches(_dev, batch_format="pyarrow")
    mad = exact_quantiles(dev, "dev", [0.5]).column("value")[0].as_py()
    return pa.table(
        {
            "median": pa.array([med], pa.float64()),
            "mad": pa.array([mad], pa.float64()),
        }
    )


SQL_STATS_MAD = """
WITH m AS (SELECT quantile_disc(l_quantity, 0.5) AS med FROM lineitem)
SELECT med AS median,
       (SELECT quantile_disc(abs(l_quantity - m.med), 0.5) FROM lineitem) AS mad
FROM m
"""


EXTRAS_REGISTRY.update({"stats_mad": QueryDef(q_stats_mad, SQL_STATS_MAD)})


def q_events_ntile(sf_dir: str):
    """NTILE(4) quartile assignment within each event_type ordered by
    (value, event_id) — the per-key equal-height bucketing window function.
    Rank comes from the existing per-key window pass (ONE range sort +
    boundary-carried block scans, extras.window.per_key_window); per-key
    totals are the type-grid-bounded exact counts, broadcast as a dict into
    one vectorized map that replays SQL NTILE's first-(c mod n)-buckets-
    get-one-extra rule in integer arithmetic."""
    from .extras.stats import exact_value_counts
    from .extras.window import per_key_window

    ev = load(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        lambda b: b.append_column("_one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    ranked = per_key_window(ev, "event_type", "value", "event_id", "_one")
    counts = {
        r["event_type"]: r["n"]
        for r in exact_value_counts(
            load(sf_dir, "events", ["event_type"]), "event_type"
        ).take_all()
    }
    keys = np.array(sorted(counts), dtype=object)
    cs = np.array([counts[k] for k in keys], np.int64)

    def _ntile(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        rn = b.column("rn").to_numpy(zero_copy_only=False)  # 1-based
        c = cs[np.searchsorted(keys.astype(str), et.astype(str))]
        base, rem = c // 4, c % 4
        head = rem * (base + 1)
        q = np.where(
            rn <= head,
            (rn - 1) // np.maximum(base + 1, 1) + 1,
            rem + (rn - head - 1) // np.maximum(base, 1) + 1,
        )
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "event_type": b.column("event_type").combine_chunks(),
                "quartile": pa.array(q.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(_ntile, batch_format="pyarrow")


SQL_EVENTS_NTILE = """
SELECT event_id, event_type,
       CAST(ntile(4) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events
"""


EXTRAS_REGISTRY.update({"events_ntile": QueryDef(q_events_ntile, SQL_EVENTS_NTILE)})


def q_graph_kcore(sf_dir: str):
    """k-core decomposition (k=68) of the part co-occurrence graph (parts
    sharing an order): iterative peeling via extras.graph.kcore — per round
    one sort-scan degree count + an anti semi-join on the removed node set.
    Surfaces the dense sub-community the way k-core is used for graph
    cleaning / community seeding at crawl scale. Oracle = the same peel
    unrolled a fixed 8 rounds in SQL (idempotent past the fixpoint; the
    Ray side early-exits when a round removes nothing)."""
    from .extras.graph import kcore
    from .util import distinct_rows, hash_join

    li = load(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    left = li.rename_columns({"l_partkey": "a"}).materialize()
    right = li.rename_columns({"l_partkey": "b"}).materialize()
    paired = hash_join(left, right, on="l_orderkey", join_type="inner")

    def _orient(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("a"), b.column("b"))
        t = b.filter(m)
        return pa.table(
            {"a": t.column("a").combine_chunks(), "b": t.column("b").combine_chunks()}
        )

    edges = distinct_rows(paired.map_batches(_orient, batch_format="pyarrow"), ["a", "b"])
    return kcore(edges, 68, max_rounds=8)


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    parts = [
        """WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
d{i} AS MATERIALIZED (SELECT n, count(*) c
         FROM (SELECT a AS n FROM e{i} UNION ALL SELECT b FROM e{i})
         GROUP BY n),
e{i + 1} AS MATERIALIZED (SELECT a, b FROM e{i}
             WHERE a IN (SELECT n FROM d{i} WHERE c >= {k})
               AND b IN (SELECT n FROM d{i} WHERE c >= {k}))"""
        )
    parts.append(
        f""",
dT AS (SELECT n, count(*) c
       FROM (SELECT a AS n FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
       GROUP BY n)
SELECT n AS node, CAST(c AS BIGINT) AS deg FROM dT WHERE c >= {k}"""
    )
    return "".join(parts)


SQL_GRAPH_KCORE = _kcore_unrolled_sql(68, 8)


EXTRAS_REGISTRY.update({"graph_kcore": QueryDef(q_graph_kcore, SQL_GRAPH_KCORE)})


def q_text_classifier(sf_dir: str):
    """FastText-shape linear quality-classifier scoring: hashed
    bag-of-words (md5-64 % 4096 buckets, the simhash hash contract) against
    a broadcast integer weight vector, summed per document over token
    OCCURRENCES, thresholded at 0 for the keep decision. The model rides the
    warm-actor-pool inference shape (extras.classify); the deterministic
    closed-form weight table is what lets DuckDB replay scoring bit-exactly."""
    from .extras.classify import classifier_scores

    return classifier_scores(load(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_CLASSIFIER = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents),
tf AS (SELECT doc_id, t FROM tok WHERE t <> ''),
b AS (SELECT doc_id, CAST(md5_number_upper(t) % 4096 AS BIGINT) AS bk FROM tf),
s AS (SELECT doc_id, SUM((bk * 2654435761) % 1001 - 500) AS score
      FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
       CAST(COALESCE(s.score, 0) >= 0 AS BIGINT) AS keep
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


EXTRAS_REGISTRY.update(
    {"text_classifier_score": QueryDef(q_text_classifier, SQL_TEXT_CLASSIFIER)}
)


def q_events_percent_rank(sf_dir: str):
    """percent_rank / cume_dist within each event_type ordered by
    (value, event_id) — the normalized-rank window pair, emitted in integer
    micro-units (floor(1e6·x)) so the float64 division is bit-identical on
    both engines (same floor-division contract as cluster_kmeans). The
    (value, event_id) order is UNIQUE, so SQL rank == row_number and the
    one per-key window pass (extras.window.per_key_window) supplies both."""
    from .extras.stats import exact_value_counts
    from .extras.window import per_key_window

    ev = load(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        lambda b: b.append_column("_one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    ranked = per_key_window(ev, "event_type", "value", "event_id", "_one")
    counts = {
        r["event_type"]: r["n"]
        for r in exact_value_counts(
            load(sf_dir, "events", ["event_type"]), "event_type"
        ).take_all()
    }
    keys = np.array(sorted(counts), dtype=object)
    cs = np.array([counts[k] for k in keys], np.int64)

    def _ranks(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.float64)
        c = cs[np.searchsorted(keys.astype(str), et.astype(str))].astype(np.float64)
        pr = np.where(c > 1, np.floor(1e6 * ((rn - 1.0) / np.maximum(c - 1.0, 1.0))), 0.0)
        cd = np.floor(1e6 * (rn / c))
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "event_type": b.column("event_type").combine_chunks(),
                "pr_micro": pa.array(pr.astype(np.int64), pa.int64()),
                "cd_micro": pa.array(cd.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(_ranks, batch_format="pyarrow")


SQL_EVENTS_PERCENT_RANK = """
SELECT event_id, event_type,
       CAST(floor(1000000.0 * percent_rank() OVER w) AS BIGINT) AS pr_micro,
       CAST(floor(1000000.0 * cume_dist() OVER w) AS BIGINT) AS cd_micro
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


EXTRAS_REGISTRY.update(
    {"events_percent_rank": QueryDef(q_events_percent_rank, SQL_EVENTS_PERCENT_RANK)}
)


def q_stats_cms(sf_dir: str):
    """Count-Min sketch frequency estimates for a deterministic bounded
    probe set (partkeys ≡ 1 mod 101), scoreboarded against exact counts the
    HLL way: the sketch is deterministic (fixed SplitMix64 hashes, merge by
    sum), so ge_ok (CMS never underestimates) and within_ok (overestimate
    <= 5·e·N/w, 5x the CM expected collision mass) are stable invariants —
    an estimator regression flips a flag and hash-mismatches. exact_count
    rides along so the oracle also certifies the probe counts themselves."""
    from .extras.stats import cms_estimate, cms_sketch

    li = load(sf_dir, "lineitem", ["l_partkey"])
    mat = cms_sketch(li, "l_partkey", w=2048, d=4)
    n = int(mat[0].sum())
    bound = int(np.ceil(5 * np.e * n / 2048))

    def _exact_probes(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array((pk - 1) % 101 == 0))
        return pa.table({"l_partkey": t.column("l_partkey").combine_chunks()})

    from .extras.stats import exact_value_counts

    probes = exact_value_counts(
        li.map_batches(_exact_probes, batch_format="pyarrow"), "l_partkey"
    ).to_pandas()
    keys = probes["l_partkey"].to_numpy().astype(np.int64)
    exact = probes["n"].to_numpy().astype(np.int64)
    est = cms_estimate(mat, keys)
    return pa.table(
        {
            "l_partkey": pa.array(keys, pa.int64()),
            "exact_count": pa.array(exact, pa.int64()),
            "ge_ok": pa.array((est >= exact).astype(np.int64), pa.int64()),
            "within_ok": pa.array(
                (est - exact <= bound).astype(np.int64), pa.int64()
            ),
        }
    )


SQL_STATS_CMS = """
SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_count,
       CAST(1 AS BIGINT) AS ge_ok, CAST(1 AS BIGINT) AS within_ok
FROM lineitem WHERE (l_partkey - 1) % 101 = 0
GROUP BY l_partkey
"""


EXTRAS_REGISTRY.update({"stats_cms": QueryDef(q_stats_cms, SQL_STATS_CMS)})


def q_text_bpe_train(sf_dir: str):
    """BPE tokenizer TRAINING (first 4 merge rules): distributed word-count
    fan-in, bounded-vocab greedy merge loop on the driver (the HuggingFace
    tokenizers split — the corpus streams exactly once). The oracle replays
    the whole trainer in SQL: per round, pair counts via a lead() window
    over exploded symbol rows, winner by (count DESC, pair ASC), and greedy
    leftmost non-overlapping merging as the odd-ranked positions of each
    maximal run of consecutive matches (two window functions), unrolled 4
    rounds."""
    from .extras.bpe import bpe_merges

    return bpe_merges(load(sf_dir, "documents", ["doc_id", "text"]), rounds=4)


def _bpe_unrolled_sql(rounds: int) -> str:
    parts = [
        """WITH words AS MATERIALIZED (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
    FROM documents) WHERE t <> '' GROUP BY t),
r0 AS MATERIALIZED (
  SELECT w AS wid, j AS pos, substr(w, CAST(j AS INTEGER), 1) AS sym, n
  FROM (SELECT w, n, unnest(range(1, length(w) + 1)) AS j FROM words))"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
b{i} AS MATERIALIZED (
  SELECT pr, CAST(sum(n) AS BIGINT) AS c FROM (
    SELECT sym || ' ' || lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS pr, n
    FROM r{i}) WHERE pr IS NOT NULL
  GROUP BY pr ORDER BY c DESC, pr LIMIT 1),
g{i} AS (
  SELECT *, CASE WHEN hit = 1 THEN
      row_number() OVER (PARTITION BY wid, grp ORDER BY pos) % 2
    ELSE 0 END AS chosen
  FROM (
    SELECT *, CASE WHEN hit = 1 THEN pos - row_number()
        OVER (PARTITION BY wid, hit ORDER BY pos) ELSE NULL END AS grp
    FROM (
      SELECT wid, pos, sym, n,
             CASE WHEN sym || ' ' || lead(sym) OVER (PARTITION BY wid ORDER BY pos)
                  = (SELECT pr FROM b{i}) THEN 1 ELSE 0 END AS hit
      FROM r{i}))),
r{i + 1} AS MATERIALIZED (
  SELECT wid, CAST(row_number() OVER (PARTITION BY wid ORDER BY pos) AS BIGINT) AS pos,
         CASE WHEN chosen = 1 THEN sym || nxt ELSE sym END AS sym, n
  FROM (SELECT *, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt,
               lag(chosen) OVER (PARTITION BY wid ORDER BY pos) AS prevch
        FROM g{i})
  WHERE prevch IS NULL OR prevch = 0)"""
        )
    arms = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS rank, pr AS pair, "
        f"replace(pr, ' ', '') AS merged, c FROM b{i}"
        for i in range(rounds)
    )
    parts.append(f"\nSELECT * FROM ({arms})")
    return "".join(parts)


SQL_TEXT_BPE_TRAIN = _bpe_unrolled_sql(4)


EXTRAS_REGISTRY.update(
    {"text_bpe_train": QueryDef(q_text_bpe_train, SQL_TEXT_BPE_TRAIN)}
)


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority top-10) as a scale-honest join
    tree: filters pushed to every read, the customer-segment and
    filtered-order key sets applied as broadcast semi-joins (valve to a
    shuffle join above the cap), revenue summed per order via the
    sort+boundary-scan ``sum_per_key`` (never a high-cardinality Ray
    groupby), and the order attributes re-attached only to the 10 winners.
    Revenue is exact integer 1e-4 units: price(2dp)·(1-disc)(2dp) is a
    4-decimal value, so round(x·1e4) is the true decimal on both engines."""
    import datetime as _dt

    from .extras.graph import sum_per_key
    from .extras.joins import semi_anti_join

    cut = pa.scalar(_dt.datetime(1995, 3, 15), pa.timestamp("us"))

    cust = load(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    ords = load(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut)),
        batch_format="pyarrow",
    )
    ords = semi_anti_join(ords, cust, on="o_custkey", right_on="c_custkey").materialize()

    def _rev(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("l_shipdate"), cut))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                    ),
                    1e4,
                )
            ),
            pa.int64(),
        )
        return pa.table({"l_orderkey": t.column("l_orderkey").combine_chunks(), "rev_u": rev})

    li = load(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(_rev, batch_format="pyarrow")
    li = semi_anti_join(li, ords, on="l_orderkey", right_on="o_orderkey")
    top = (
        sum_per_key(li, "l_orderkey", "rev_u")
        .sort(["rev_u", "l_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    keys = pa.array(top["l_orderkey"].to_numpy(), pa.int64())
    attrs = (
        ords.map_batches(
            lambda b: b.filter(pc.is_in(b.column("o_orderkey"), value_set=keys)),
            batch_format="pyarrow",
        )
        .to_pandas()[["o_orderkey", "o_orderdate", "o_orderpriority"]]
    )
    out = top.rename(columns={"rev_u": "revenue_u"}).merge(
        attrs, left_on="l_orderkey", right_on="o_orderkey"
    )
    return pa.Table.from_pandas(
        out[["l_orderkey", "revenue_u", "o_orderdate", "o_orderpriority"]],
        preserve_index=False,
    ).set_column(
        1,
        "revenue_u",
        pc.cast(
            pa.Table.from_pandas(out[["revenue_u"]], preserve_index=False).column(0),
            pa.int64(),
        ),
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_u,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_u DESC, l_orderkey
LIMIT 10
"""


EXTRAS_REGISTRY.update({"tpch_q3_top_orders": QueryDef(q_tpch_q3, SQL_TPCH_Q3)})


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape (local-supplier volume for one region, 1996): the
    region/nation/supplier dimensions broadcast as vectorized lookup arrays
    (tiny/bounded sides — one ray.put, searchsorted per batch); the two
    BIG-side joins (orders⋈customer, lineitem⋈orders') are honest
    hash-partitioned shuffles; the supplier-nation == customer-nation
    correlation is a per-row vectorized equality after the lookup, and the
    final per-nation revenue is a 5-row ``sum_per_key``. Integer 1e-4
    revenue units as in tpch_q3_top_orders."""
    import datetime as _dt

    import ray

    from .extras.graph import sum_per_key
    from .util import hash_join

    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1997, 1, 1), pa.timestamp("us"))

    nat = load(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = load(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia.r_name == "ASIA"]
    names = dict(zip(asia.n_nationkey.astype(int), asia.n_name))
    nkeys = np.array(sorted(names), np.int64)

    sup = load(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup.s_nationkey.isin(nkeys)]
    sk = np.sort(sup.s_suppkey.to_numpy().astype(np.int64))
    sn = sup.set_index("s_suppkey").s_nationkey.loc[sk].to_numpy().astype(np.int64)
    sk_ref, sn_ref = ray.put(sk), ray.put(sn)

    cust = load(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(
            pc.is_in(b.column("c_nationkey"), value_set=pa.array(nkeys, pa.int64()))
        ).rename_columns(["o_custkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    ords = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    oc = hash_join(ords, cust, on="o_custkey", join_type="inner").map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]).rename_columns(
            ["l_orderkey", "c_nationkey"]
        ),
        batch_format="pyarrow",
    )

    def _rev(b: pa.Table) -> pa.Table:
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                    ),
                    1e4,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").combine_chunks(),
                "l_suppkey": b.column("l_suppkey").combine_chunks(),
                "rev_u": rev,
            }
        )

    li = load(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(_rev, batch_format="pyarrow")
    lo_j = hash_join(li, oc, on="l_orderkey", join_type="inner")

    def _local(b: pa.Table) -> pa.Table:
        skeys = ray.get(sk_ref)
        snats = ray.get(sn_ref)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(skeys, s)
        idx = np.clip(idx, 0, max(len(skeys) - 1, 0))
        ok = (len(skeys) > 0) & (skeys[idx] == s)
        snat = np.where(ok, snats[idx] if len(skeys) else 0, -1)
        cnat = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        m = ok & (snat == cnat)
        t = b.filter(pa.array(m))
        return pa.table(
            {
                "nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
                "rev_u": t.column("rev_u").combine_chunks(),
            }
        )

    per_nat = sum_per_key(
        lo_j.map_batches(_local, batch_format="pyarrow"), "nationkey", "rev_u"
    ).to_pandas()
    per_nat["n_name"] = per_nat.nationkey.map(names)
    per_nat = per_nat.sort_values(["rev_u", "n_name"], ascending=[False, True])
    return pa.table(
        {
            "n_name": pa.array(per_nat.n_name, pa.string()),
            "revenue_u": pa.array(per_nat.rev_u.astype(np.int64), pa.int64()),
        }
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_u
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_u DESC, n_name
"""


EXTRAS_REGISTRY.update({"tpch_q5_local_volume": QueryDef(q_tpch_q5, SQL_TPCH_Q5)})


TOKEN_BUDGET = 20_000


def q_corpus_token_budget(sf_dir: str):
    """Fixed-token-budget subsample: keep the corpus PREFIX in
    deterministic-shuffle order whose running token total stays within the
    budget ("train on the first N tokens") — the global prefix-sum gate
    (extras.shuffle.token_budget_cut): one narrow range sort, per-block
    scalar token sums + driver exclusive offsets, vectorized in-block
    cumsum compare. Token counts use the repo-wide whitespace contract."""
    from .extras.shuffle import token_budget_cut

    docs = load(sf_dir, "documents", ["doc_id", "text"])

    def _ntok(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.utf8_trim_whitespace(txt), "").to_numpy(zero_copy_only=False)
        n = np.where(empty, 0, n)
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    return token_budget_cut(
        docs.map_batches(_ntok, batch_format="pyarrow"),
        "doc_id",
        "n_tokens",
        TOKEN_BUDGET,
        salt=SHUFFLE_SALT,
    )


def _sql_corpus_token_budget() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        """(SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
    FROM documents)""",
        "doc_id",
        SHUFFLE_SALT,
    )
    return (
        f"WITH {chain},\n"
        "c AS (SELECT doc_id, n_tokens,\n"
        "             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum\n"
        "      FROM h3)\n"
        f"SELECT doc_id, n_tokens, cum FROM c WHERE cum <= {TOKEN_BUDGET}"
    )


EXTRAS_REGISTRY.update(
    {
        "corpus_token_budget": QueryDef(
            q_corpus_token_budget, _sql_corpus_token_budget()
        )
    }
)


_URLF_HOSTS = ["tracker.net", "blog.example.org"]
_URLF_PREFIX = "/p3/"


def q_url_blocklist(sf_dir: str):
    """UT1-style URL blocklist gate over a deterministic messy-crawl url
    table (five host shapes per doc_id, incl. subdomains of a blocked
    registrable domain): broadcast host set + vectorized RE2 host/path
    split, dot-suffix membership at every level, path-prefix block
    (extras.urls.url_blocklist_filter). The oracle replays the same regex
    split and suffix chain in DuckDB."""
    from .extras.urls import url_blocklist_filter

    docs = load(sf_dir, "documents", ["doc_id"])

    def _urls(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        host = np.select(
            [d % 5 == 0, d % 5 == 1, d % 5 == 2, d % 5 == 3],
            ["ads.tracker.net", "www.example.org", "blog.example.org", "cdn.safe.com"],
            default="safe.com",
        )
        url = np.char.add(
            np.char.add(
                np.char.add(np.char.add("https://", host.astype(str)), "/p"),
                (d % 7).astype(str),
            ),
            np.char.add("/doc", d.astype(str)),
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "url": pa.array(url, pa.string()),
            }
        )

    synth = docs.map_batches(_urls, batch_format="pyarrow")
    return url_blocklist_filter(synth, "url", _URLF_HOSTS, [_URLF_PREFIX])


SQL_URL_BLOCKLIST = """
WITH u AS (
  SELECT doc_id,
         'https://' ||
         CASE doc_id % 5 WHEN 0 THEN 'ads.tracker.net'
                         WHEN 1 THEN 'www.example.org'
                         WHEN 2 THEN 'blog.example.org'
                         WHEN 3 THEN 'cdn.safe.com'
                         ELSE 'safe.com' END ||
         '/p' || CAST(doc_id % 7 AS VARCHAR) || '/doc' || CAST(doc_id AS VARCHAR)
         AS url
  FROM documents),
hp AS (
  SELECT doc_id, url,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/]*)(/.*)?$', 1) AS host,
         coalesce(regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/]*)(/.*)?$', 2), '') AS path
  FROM u),
sfx AS (
  SELECT *, regexp_replace(host, '^[^.]*\\.', '') AS s1 FROM hp),
sfx2 AS (
  SELECT *, regexp_replace(s1, '^[^.]*\\.', '') AS s2 FROM sfx),
sfx3 AS (
  SELECT *, regexp_replace(s2, '^[^.]*\\.', '') AS s3 FROM sfx2)
SELECT doc_id, url FROM sfx3
WHERE regexp_matches(lower(url), '^[a-z][a-z0-9+.-]*://')
  AND host NOT IN ('tracker.net', 'blog.example.org')
  AND s1 NOT IN ('tracker.net', 'blog.example.org')
  AND s2 NOT IN ('tracker.net', 'blog.example.org')
  AND s3 NOT IN ('tracker.net', 'blog.example.org')
  AND NOT starts_with(path, '/p3/')
"""


EXTRAS_REGISTRY.update(
    {"url_blocklist_filter": QueryDef(q_url_blocklist, SQL_URL_BLOCKLIST)}
)


RR_SALT = 77


def q_dp_randomized_response(sf_dir: str):
    """Warner randomized-response counts per market segment (truth bit =
    c_acctbal > 0, lied about w.p. 1/4 on a SplitMix64 per-row coin keyed by
    c_custkey) — a local-DP mechanism whose seeded coin the SQL oracle
    replays bit-for-bit (extras.privacy)."""
    from .extras.privacy import randomized_response_counts

    cust = load(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])

    def _truth(b: pa.Table) -> pa.Table:
        pos = pc.fill_null(pc.greater(b.column("c_acctbal"), 0.0), False)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "truth": pc.cast(pos, pa.int64()),
                "c_mktsegment": b.column("c_mktsegment").combine_chunks(),
            }
        )

    return randomized_response_counts(
        cust.map_batches(_truth, batch_format="pyarrow"),
        "c_custkey",
        "truth",
        "c_mktsegment",
        salt=RR_SALT,
    )


def _sql_dp_rr() -> str:
    from .extras.shuffle import sql_sm64_chain
    from .extras.privacy import TRUTH_THRESHOLD

    chain = sql_sm64_chain(
        "(SELECT c_custkey, c_mktsegment, "
        "CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS truth FROM customer)",
        "c_custkey",
        RR_SALT,
    )
    return (
        f"WITH {chain},\n"
        f"r AS (SELECT c_mktsegment,\n"
        f"             CASE WHEN h < {TRUTH_THRESHOLD} THEN truth ELSE 1 - truth END AS rep\n"
        "      FROM h3)\n"
        "SELECT c_mktsegment, count(*) AS n,\n"
        "       CAST(sum(rep) AS BIGINT) AS reported_pos,\n"
        "       CAST(4 * sum(rep) - count(*) AS BIGINT) AS est2\n"
        "FROM r GROUP BY c_mktsegment"
    )


EXTRAS_REGISTRY.update(
    {"dp_randomized_response": QueryDef(q_dp_randomized_response, _sql_dp_rr())}
)


RESAMPLE_STRIDE_US = 21_600 * 1_000_000  # 6h buckets


def q_events_resample(sf_dir: str):
    """Gap-filled 6h resampling of each user's event stream with forward
    fill (extras.window.resample_ffill): per (user, bucket) keep the last
    sample (by ts, event_id), densify the grid from the user's first to
    last bucket, carry values forward over gaps. Values enter as integer
    cents (floor(value*100), null -> 0)."""
    from .extras.window import resample_ffill

    ev = load(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        v = pc.coalesce(b.column("value"), pa.scalar(0.0))
        return pa.table(
            {
                "user_id": b.column("user_id").combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "event_id": b.column("event_id").combine_chunks(),
                "v_cents": pc.cast(pc.floor(pc.multiply(v, 100.0)), pa.int64()),
            }
        )

    out = resample_ffill(
        ev.map_batches(_cents, batch_format="pyarrow"),
        "user_id",
        "ts",
        "event_id",
        "v_cents",
        RESAMPLE_STRIDE_US,
    )
    return out


SQL_EVENTS_RESAMPLE = f"""
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts) * 1000000 / {RESAMPLE_STRIDE_US}) AS BIGINT) AS bkt,
         ts, event_id,
         CAST(floor(coalesce(value, 0) * 100) AS BIGINT) AS v_cents
  FROM events),
last AS (
  SELECT user_id, bkt, v_cents FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, bkt ORDER BY ts DESC, event_id DESC) AS rn
    FROM e) WHERE rn = 1),
bounds AS (SELECT user_id, min(bkt) AS mn, max(bkt) AS mx FROM last GROUP BY 1),
grid AS (SELECT user_id, unnest(range(mn, mx + 1)) AS bkt FROM bounds),
filled AS (
  SELECT g.user_id, g.bkt,
         last_value(l.v_cents IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bkt) AS v_cents
  FROM grid g LEFT JOIN last l ON l.user_id = g.user_id AND l.bkt = g.bkt)
SELECT user_id, bkt, v_cents FROM filled
"""


EXTRAS_REGISTRY.update(
    {"events_resample": QueryDef(q_events_resample, SQL_EVENTS_RESAMPLE)}
)


def q_stats_ols(sf_dir: str):
    """Distributed simple linear regression (price ~ quantity over lineitem)
    via exact integer moment sums (extras.stats.ols_simple): one streaming
    pass, one partial-sums row per block, arbitrary-precision driver fold;
    floats only in the final single-rounded divisions, mirrored expression-
    for-expression by the HUGEINT->DOUBLE SQL."""
    from .extras.stats import ols_simple

    li = load(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def _ints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pc.cast(pc.floor(b.column("l_quantity")), pa.int64()),
                "y": pc.cast(pc.floor(b.column("l_extendedprice")), pa.int64()),
            }
        )

    return ols_simple(li.map_batches(_ints, batch_format="pyarrow"), "x", "y")


SQL_STATS_OLS = """
WITH t AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM t),
s2 AS (SELECT n, sx, sy,
              n * sxy - sx * sy AS snum,
              n * sxx - sx * sx AS sden,
              n * syy - sy * sy AS yden,
              CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       FROM m)
SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       (CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE))
         * (CAST(snum AS DOUBLE) / CAST(yden AS DOUBLE)) AS r2
FROM s2
"""


EXTRAS_REGISTRY.update({"stats_ols": QueryDef(q_stats_ols, SQL_STATS_OLS)})


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape (returned-item report, top 20 customers): lineitems
    flagged 'R' pre-aggregated to per-order revenue with the sort-based
    sum_per_key, order->customer attribution via ONE quarter-filtered hash
    join (the only shuffle), a second sum_per_key at customer cardinality,
    then the 20 winners re-attached to customer attributes with a broadcast
    is_in filter + the nation lookup. Revenue in exact integer 1e-4 units
    as in Q3/Q5."""
    import datetime as _dt

    from .extras.graph import sum_per_key
    from .extras.joins import semi_anti_join
    from .queries import _geo_lookup
    from .util import hash_join

    lo = pa.scalar(_dt.datetime(1995, 10, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))

    ords = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    ).materialize()

    def _rev(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                    ),
                    1e4,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey").combine_chunks(), "rev_u": rev}
        )

    li = load(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(_rev, batch_format="pyarrow")
    li = semi_anti_join(li, ords, on="l_orderkey", right_on="o_orderkey")
    per_order = sum_per_key(li, "l_orderkey", "rev_u")

    def _okey(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["o_orderkey" if c == "l_orderkey" else c for c in b.column_names]
        )

    attributed = hash_join(
        per_order.map_batches(_okey, batch_format="pyarrow"), ords, on="o_orderkey"
    )

    def _ckey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("o_custkey").combine_chunks(),
                "rev_u": pc.cast(b.column("rev_u"), pa.int64()).combine_chunks(),
            }
        )

    per_cust = sum_per_key(
        attributed.map_batches(_ckey, batch_format="pyarrow"), "c_custkey", "rev_u"
    )
    top = (
        per_cust.sort(["rev_u", "c_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    keys = pa.array(top["c_custkey"].to_numpy(), pa.int64())
    geo = _geo_lookup(sf_dir)
    attrs = (
        load(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_custkey"), value_set=keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    attrs["n_name"] = [geo[int(nk)][0] for nk in attrs["c_nationkey"]]
    out = top.rename(columns={"rev_u": "revenue_u"}).merge(attrs, on="c_custkey")
    out = out[["c_custkey", "c_name", "revenue_u", "c_acctbal", "n_name"]]
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.set_column(
        t.column_names.index("revenue_u"),
        "revenue_u",
        pc.cast(t.column("revenue_u"), pa.int64()),
    )


SQL_TPCH_Q10 = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_u,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue_u DESC, c.c_custkey
LIMIT 20
"""


EXTRAS_REGISTRY.update({"tpch_q10_returned": QueryDef(q_tpch_q10, SQL_TPCH_Q10)})


WINNOW_K, WINNOW_W = 8, 4


def q_text_winnowing(sf_dir: str):
    """Winnowing fingerprints (k=8 char grams, window w=4, rightmost-min
    tie rule) over documents — extras.textstats.winnowing_fingerprints."""
    from .extras.textstats import winnowing_fingerprints

    return winnowing_fingerprints(
        load(sf_dir, "documents", ["doc_id", "text"]),
        "text",
        "doc_id",
        k=WINNOW_K,
        w=WINNOW_W,
    )


SQL_TEXT_WINNOWING = f"""
WITH d AS (SELECT doc_id, text FROM documents
           WHERE text IS NOT NULL AND length(text) >= {WINNOW_K + WINNOW_W - 1}),
g AS (SELECT doc_id, i - 1 AS p,
             md5_number_upper(substr(text, i, {WINNOW_K})) AS h
      FROM d, LATERAL unnest(range(1, length(text) - {WINNOW_K} + 2)) AS t(i)),
wm AS (SELECT doc_id, p AS j,
              min(h) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS mh,
              count(*) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS cnt
       FROM g),
wins AS (SELECT doc_id, j, mh FROM wm WHERE cnt = {WINNOW_W}),
sel AS (SELECT w.doc_id, max(g.p) AS pos, any_value(w.mh) AS mh
        FROM wins w JOIN g ON g.doc_id = w.doc_id
                          AND g.p BETWEEN w.j AND w.j + {WINNOW_W - 1}
                          AND g.h = w.mh
        GROUP BY w.doc_id, w.j)
SELECT DISTINCT doc_id, pos,
       CAST(mh % 9223372036854775808 AS BIGINT) AS fp
FROM sel
"""


EXTRAS_REGISTRY.update(
    {"text_winnowing": QueryDef(q_text_winnowing, SQL_TEXT_WINNOWING)}
)


def q_embed_centroids(sf_dir: str):
    """Per-label embedding centroids in exact integer microunits
    (extras.similarity.group_centroids): floor(v*1e6) int64 accumulation,
    one bincount partial per block, sort-based sum_per_key finale; the mean
    is a single division of exact integers."""
    from .extras.similarity import group_centroids

    return group_centroids(
        load(sf_dir, "embeddings", ["vec_id", "embedding", "label"]),
        "embedding",
        "label",
    )


SQL_EMBED_CENTROIDS = """
WITH u AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, dim,
       count(*) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_q
FROM u GROUP BY label, dim
"""


EXTRAS_REGISTRY.update(
    {"embed_centroids": QueryDef(q_embed_centroids, SQL_EMBED_CENTROIDS)}
)


def q_agg_cube(sf_dir: str):
    """GROUP BY CUBE over (l_returnflag, l_linestatus): the corpus scan is
    the SAME one-pass partial-combiner as the rollup; all four grouping
    sets (fine, by-flag, by-status, grand total) then derive from the
    bounded FINE aggregate on the driver — no second scan, no extra
    shuffle."""
    ds = load(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag").combine_chunks(),
                "l_linestatus": batch.column("l_linestatus").combine_chunks(),
                "qty_c": pc.cast(
                    pc.round(pc.multiply(batch.column("l_quantity"), 100.0)), pa.int64()
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("qty_c", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty_c", "n_rows"])

    fine = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty_c", "n_rows"])
        .take_all()
    )
    rows = [
        (r["l_returnflag"], r["l_linestatus"], r["sum(sum_qty_c)"], r["sum(n_rows)"])
        for r in fine
    ]
    by_f: dict[str, list[int]] = {}
    by_s: dict[str, list[int]] = {}
    total = [0, 0]
    for f, s, q, n in rows:
        af = by_f.setdefault(f, [0, 0])
        af[0] += q
        af[1] += n
        as_ = by_s.setdefault(s, [0, 0])
        as_[0] += q
        as_[1] += n
        total[0] += q
        total[1] += n
    out = rows
    out += [(f, None, q, n) for f, (q, n) in sorted(by_f.items())]
    out += [(None, s, q, n) for s, (q, n) in sorted(by_s.items())]
    out.append((None, None, total[0], total[1]))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in out], pa.string()),
            "l_linestatus": pa.array([r[1] for r in out], pa.string()),
            "sum_qty_c": pa.array([r[2] for r in out], pa.int64()),
            "n_rows": pa.array([r[3] for r in out], pa.int64()),
        }
    )


SQL_AGG_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


EXTRAS_REGISTRY.update({"agg_cube": QueryDef(q_agg_cube, SQL_AGG_CUBE)})


def q_part_min_supplier(sf_dir: str):
    """Argmin-per-group (the TPC-H Q2 shape over lineitem): for every part,
    the supplier quoting the lowest unit price (round(extendedprice*100) /
    quantity as a double — the same single-rounded expression both engines
    order by), ties to the smallest suppkey. One range sort + boundary-
    carry top-1 per key (util.topk_per_key) — no per-group UDF."""
    from .util import topk_per_key

    li = load(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )

    def _unit(b: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()
        )
        unit = pc.divide(pc.cast(price_c, pa.float64()), b.column("l_quantity"))
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").combine_chunks(),
                "l_suppkey": b.column("l_suppkey").combine_chunks(),
                "unit_price": unit,
            }
        )

    u = li.map_batches(_unit, batch_format="pyarrow")
    return topk_per_key(
        u, "l_partkey", "unit_price", 1, descending=False, tie_col="l_suppkey"
    )


SQL_PART_MIN_SUPPLIER = """
SELECT l_partkey, l_suppkey, unit_price FROM (
  SELECT l_partkey, l_suppkey,
         CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / l_quantity
           AS unit_price,
         row_number() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)
                      / l_quantity,
                    l_suppkey) AS rn
  FROM lineitem)
WHERE rn = 1
"""


EXTRAS_REGISTRY.update(
    {"part_min_supplier": QueryDef(q_part_min_supplier, SQL_PART_MIN_SUPPLIER)}
)


def q_stats_group_mode(sf_dir: str):
    """Mode per group (most frequent source per language, ties to the
    lexicographically smallest source): exact (lang, source) counts via the
    partial-combiner + sort-based sum_per_key, then boundary-carry top-1
    per key — mode at ANY group cardinality without a per-group UDF."""
    from .extras.graph import sum_per_key
    from .util import topk_per_key

    docs = load(sf_dir, "documents", ["lang", "source"])

    def _pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k2": pc.binary_join_element_wise(
                    pc.fill_null(b.column("lang"), "\x00"),
                    pc.fill_null(b.column("source"), "\x00"),
                    "\x1f",
                ),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k2"]).aggregate([("one", "sum")])
        return g.rename_columns(["k2", "one"])

    counts = sum_per_key(
        docs.map_batches(_pairs, batch_format="pyarrow"), "k2", "one"
    )

    def _split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("k2").combine_chunks(), "\x1f")
        return pa.table(
            {
                "lang": pc.list_element(parts, 0),
                "source": pc.list_element(parts, 1),
                "cnt": pc.cast(b.column("one"), pa.int64()).combine_chunks(),
            }
        )

    return topk_per_key(
        counts.map_batches(_split, batch_format="pyarrow"),
        "lang",
        "cnt",
        1,
        descending=True,
        tie_col="source",
    )


SQL_STATS_GROUP_MODE = """
SELECT lang, source, cnt FROM (
  SELECT lang, source, count(*) AS cnt,
         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, source) AS rn
  FROM documents GROUP BY lang, source)
WHERE rn = 1
"""


EXTRAS_REGISTRY.update(
    {"stats_group_mode": QueryDef(q_stats_group_mode, SQL_STATS_GROUP_MODE)}
)


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 shape (order-priority checking): count orders per priority
    in a quarter where EXISTS a lineitem shipped after the order date. The
    EXISTS collapses to per-order max(l_shipdate) (boundary-carry top-1 —
    never a groupby), ONE quarter-filtered hash join, a vectorized
    compare, and a domain-sized count fold."""
    import datetime as _dt

    from .util import hash_join, topk_per_key

    lo = pa.scalar(_dt.datetime(1995, 7, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1995, 10, 1), pa.timestamp("us"))

    ords = load(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    from .extras.joins import semi_anti_join

    li = semi_anti_join(
        load(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]),
        ords,
        on="l_orderkey",
        right_on="o_orderkey",
    )
    maxship = topk_per_key(
        li, "l_orderkey", "l_shipdate", 1, descending=True, tie_col=None
    )

    def _okey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey").combine_chunks(),
                "max_ship": b.column("l_shipdate").combine_chunks(),
            }
        )

    j = hash_join(
        ords, maxship.map_batches(_okey, batch_format="pyarrow"), on="o_orderkey"
    )

    def _cnt(b: pa.Table) -> pa.Table:
        ok = pc.fill_null(pc.greater(b.column("max_ship"), b.column("o_orderdate")), False)
        t = pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority").combine_chunks(),
                "one": pc.cast(ok, pa.int64()),
            }
        )
        g = t.group_by(["o_orderpriority"]).aggregate([("one", "sum")])
        return g.rename_columns(["o_orderpriority", "order_count"])

    parts = j.map_batches(_cnt, batch_format="pyarrow").take_all()
    agg: dict[str, int] = {}
    for r in parts:
        agg[r["o_orderpriority"]] = agg.get(r["o_orderpriority"], 0) + int(
            r["order_count"]
        )
    items = sorted((k, v) for k, v in agg.items() if v > 0)
    return pa.table(
        {
            "o_orderpriority": pa.array([k for k, _ in items], pa.string()),
            "order_count": pa.array([v for _, v in items], pa.int64()),
        }
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-07-01'
  AND o.o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


EXTRAS_REGISTRY.update({"tpch_q4_order_priority": QueryDef(q_tpch_q4, SQL_TPCH_Q4)})


GROUP_SAMPLE_K = 40


def q_sample_per_group(sf_dir: str):
    """Class-balanced deterministic subsample: per language keep the
    GROUP_SAMPLE_K docs with the smallest SplitMix64(doc_id) — the standard
    per-class cap for balancing a training corpus, expressed as one range
    sort + boundary-carry top-k per key (no per-group UDF, identical at any
    parallelism)."""
    from .extras.shuffle import sm64_key
    from .util import topk_per_key

    docs = load(sf_dir, "documents", ["doc_id", "lang"])

    def _h(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "lang": b.column("lang").combine_chunks(),
                "h": pa.array(sm64_key(ids, SHUFFLE_SALT), pa.uint64()),
            }
        )

    out = topk_per_key(
        docs.map_batches(_h, batch_format="pyarrow"),
        "lang",
        "h",
        GROUP_SAMPLE_K,
        descending=False,
        tie_col="doc_id",
    )
    return out.select_columns(["doc_id", "lang"])


def _sql_sample_per_group() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        "(SELECT doc_id, lang FROM documents)", "doc_id", SHUFFLE_SALT
    )
    return (
        f"WITH {chain},\n"
        "r AS (SELECT doc_id, lang,\n"
        "             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn\n"
        "      FROM h3)\n"
        f"SELECT doc_id, lang FROM r WHERE rn <= {GROUP_SAMPLE_K}"
    )


EXTRAS_REGISTRY.update(
    {"sample_per_group": QueryDef(q_sample_per_group, _sql_sample_per_group())}
)


def q_corpus_interleave(sf_dir: str):
    """Deterministic round-robin source interleaving (the fixed-ratio data
    mixing used when probabilistic mixing isn't reproducible enough): docs
    are ranked within their source by SplitMix64(doc_id), and the global
    order index is rank * n_sources + source_index — exact round-robin,
    a pure function of ids. Ranks come from the boundary-carry per-key
    window (extras.window.per_key_window) — one narrow sort, no groupby."""
    from .extras.shuffle import sm64_key
    from .extras.window import per_key_window

    docs = load(sf_dir, "documents", ["doc_id", "source"])
    # source index: bounded domain, gathered once (sorted for determinism)
    srcs = sorted(load(sf_dir, "documents", ["source"]).unique("source"))
    sidx = {s: i for i, s in enumerate(srcs)}
    ns = len(srcs)

    def _h(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h63 = sm64_key(ids, SHUFFLE_SALT).astype(np.int64) & np.int64(
            0x7FFFFFFFFFFFFFFF
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "source": b.column("source").combine_chunks(),
                "h": pa.array(h63, pa.int64()),
                # window val_col: only rn is consumed here, and 63-bit hashes
                # would overflow the window's int64 running sum across blocks
                # (per_key_window's documented pre-scale contract) — ones keep
                # the sum trivially in range
                "hv": pa.array(np.ones(len(h63), np.int64)),
            }
        )

    w = per_key_window(
        docs.map_batches(_h, batch_format="pyarrow"),
        "source",
        "h",
        "doc_id",
        "hv",
    )

    def _order(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        src = b.column("source").to_numpy(zero_copy_only=False)
        si = np.array([sidx[s] for s in src], np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "source": b.column("source").combine_chunks(),
                "order_idx": pa.array((rn - 1) * ns + si, pa.int64()),
            }
        )

    return w.map_batches(_order, batch_format="pyarrow")


def _sql_corpus_interleave() -> str:
    from .extras.shuffle import sql_sm64_chain

    chain = sql_sm64_chain(
        "(SELECT doc_id, source FROM documents)", "doc_id", SHUFFLE_SALT
    )
    return (
        f"WITH {chain},\n"
        "m AS (SELECT h % 9223372036854775808 AS h63, doc_id, source FROM h3),\n"
        "s AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS si\n"
        "      FROM (SELECT DISTINCT source FROM documents)),\n"
        "r AS (SELECT doc_id, m.source,\n"
        "             row_number() OVER (PARTITION BY m.source ORDER BY h63, doc_id) AS rn\n"
        "      FROM m)\n"
        "SELECT r.doc_id, r.source,\n"
        "       (r.rn - 1) * (SELECT count(*) FROM s) + s.si AS order_idx\n"
        "FROM r JOIN s ON s.source = r.source"
    )


EXTRAS_REGISTRY.update(
    {"corpus_interleave": QueryDef(q_corpus_interleave, _sql_corpus_interleave())}
)


def q_dedup_prefix(sf_dir: str):
    """Prefix-duplicate flags over the perturbed corpus (every truncated
    copy is by construction a prefix of its original): one narrow sort by
    (text, id) + adjacent starts_with — the lexicographic-successor
    argument makes the adjacent test exact for ALL prefix pairs
    (extras.dedup.prefix_dup_flags)."""
    from .extras.dedup import prefix_dup_flags

    return prefix_dup_flags(_corpus_with_dups(sf_dir), "text", "doc_id")


SQL_DEDUP_PREFIX = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET},
         CASE WHEN strpos(text, ' ') > 0 THEN regexp_replace(text, ' \\S+$', '') ELSE text END
  FROM documents
),
f AS (SELECT id AS doc_id, text,
             lead(text) OVER (ORDER BY text, id) AS succ
      FROM corpus WHERE text IS NOT NULL)
SELECT doc_id, coalesce(starts_with(succ, text), FALSE) AS is_prefix_dup FROM f
"""


EXTRAS_REGISTRY.update({"dedup_prefix": QueryDef(q_dedup_prefix, SQL_DEDUP_PREFIX)})


PSEUDO_SALT = "release-2026-08"


def q_anonymize_pseudonym(sf_dir: str):
    """Keyed deterministic pseudonymization of customer names
    (extras.privacy.pseudonymize_column): md5-64(value|salt) mod 2^32 with
    a readable prefix — join-preserving, unlinkable across salt
    rotations."""
    from .extras.privacy import pseudonymize_column

    out = pseudonymize_column(
        load(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_name",
        salt=PSEUDO_SALT,
        prefix="CUST_",
    )
    return out.select_columns(["c_custkey", "c_name_pseudonym"])


SQL_ANONYMIZE_PSEUDONYM = f"""
SELECT c_custkey,
       CASE WHEN c_name IS NULL THEN NULL
            ELSE 'CUST_' || CAST(CAST(md5_number_upper(c_name || '|{PSEUDO_SALT}')
                                      % 4294967296 AS BIGINT) AS VARCHAR)
       END AS c_name_pseudonym
FROM customer
"""


EXTRAS_REGISTRY.update(
    {"anonymize_pseudonym": QueryDef(q_anonymize_pseudonym, SQL_ANONYMIZE_PSEUDONYM)}
)


def q_anonymize_suppress(sf_dir: str):
    """Cell suppression over the (mktsegment, nationkey) contingency table
    (extras.privacy.suppress_small_cells): cells under n/150 rows get both
    attributes replaced by the masking sentinel — the enforcement-side
    complement of the k-anonymity KPI."""
    from .extras.privacy import suppress_small_cells

    cust = load(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_nationkey"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "c_mktsegment": b.column("c_mktsegment").combine_chunks(),
                "nat": pc.cast(b.column("c_nationkey"), pa.string()),
            }
        )

    ds = cust.map_batches(_prep, batch_format="pyarrow")
    thr = max(1, ds.count() // 150)
    return suppress_small_cells(ds, ["c_mktsegment", "nat"], thr)


SQL_ANONYMIZE_SUPPRESS = """
WITH thr AS (SELECT greatest(1, count(*) // 150) AS t FROM customer),
c AS (SELECT c_custkey, c_mktsegment, CAST(c_nationkey AS VARCHAR) AS nat
      FROM customer),
cnt AS (SELECT c_mktsegment, nat, count(*) AS n FROM c GROUP BY 1, 2)
SELECT c.c_custkey,
       CASE WHEN cnt.n < thr.t THEN '*****' ELSE c.c_mktsegment END AS c_mktsegment,
       CASE WHEN cnt.n < thr.t THEN '*****' ELSE c.nat END AS nat
FROM c JOIN cnt USING (c_mktsegment, nat) CROSS JOIN thr
"""


EXTRAS_REGISTRY.update(
    {"anonymize_suppress": QueryDef(q_anonymize_suppress, SQL_ANONYMIZE_SUPPRESS)}
)


RATE_LIMIT_N = 3


def q_events_rate_limit(sf_dir: str):
    """Deterministic per-key rate limiting: keep each user's FIRST
    RATE_LIMIT_N events per hour (by ts, then event_id) — the crawl-
    politeness / event-throttling shape. One range sort + boundary-carry
    top-k per (user, hour) composite key; identical at any parallelism."""
    from .util import topk_per_key

    ev = load(sf_dir, "events", ["event_id", "ts", "user_id"])

    def _key(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_id": b.column("event_id").combine_chunks(),
                "user_id": b.column("user_id").combine_chunks(),
                "ts": b.column("ts").combine_chunks(),
                "uh": pa.array(uid * 1_000_000 + hour % 1_000_000, pa.int64()),
            }
        )

    kept = topk_per_key(
        ev.map_batches(_key, batch_format="pyarrow"),
        "uh",
        "ts",
        RATE_LIMIT_N,
        descending=False,
        tie_col="event_id",
    )
    return kept.select_columns(["event_id", "user_id"])


SQL_EVENTS_RATE_LIMIT = f"""
SELECT event_id, user_id FROM (
  SELECT event_id, user_id,
         row_number() OVER (
           PARTITION BY user_id,
                        CAST(floor(epoch(ts) / 3600) AS BIGINT) % 1000000
           ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn <= {RATE_LIMIT_N}
"""


EXTRAS_REGISTRY.update(
    {"events_rate_limit": QueryDef(q_events_rate_limit, SQL_EVENTS_RATE_LIMIT)}
)


def q_stats_group_hll(sf_dir: str):
    """Per-event-type HLL distinct-user estimates gated on the theoretical
    error bound per group (the grouped sibling of stats_hll_distinct):
    each group's |est/exact - 1| <= 5*1.04/sqrt(m) flag is the scoreboard
    the SQL oracle pins to 1. Exact counts come from the sort-based
    distinct_rows + sum_per_key pipeline, never a Ray groupby."""
    from .extras.graph import sum_per_key
    from .extras.stats import group_hll_distinct
    from .util import distinct_rows

    ev = load(sf_dir, "events", ["event_type", "user_id"])
    ests = group_hll_distinct(ev, "user_id", "event_type")

    uniq = distinct_rows(ev, ["event_type", "user_id"])

    def _ones(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type").combine_chunks(),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    exact_rows = sum_per_key(
        uniq.map_batches(_ones, batch_format="pyarrow"), "event_type", "one"
    ).take_all()
    bound = 5 * 1.04 / (1 << 6)  # p=12
    out = []
    for r in sorted(exact_rows, key=lambda r: r["event_type"]):
        g, exact = r["event_type"], int(r["one"])
        est = ests.get(str(g), 0)
        out.append((g, int(abs(est / exact - 1.0) <= bound) if exact else 1))
    return pa.table(
        {
            "event_type": pa.array([g for g, _ in out], pa.string()),
            "hll_within_bound": pa.array([f for _, f in out], pa.int64()),
        }
    )


SQL_STATS_GROUP_HLL = """
SELECT event_type, CAST(1 AS BIGINT) AS hll_within_bound
FROM events GROUP BY event_type
"""


EXTRAS_REGISTRY.update(
    {"stats_group_hll": QueryDef(q_stats_group_hll, SQL_STATS_GROUP_HLL)}
)
