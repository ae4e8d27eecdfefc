"""Round-4 wave-17/18 operators with DuckDB oracles — the model-audit,
split-hygiene and KG-lifecycle family: dedup-aware train/val splitting
(near-dup clusters never straddle the split boundary), exact tie-corrected
Mann-Whitney AUC per group, a Gopher-style document quality rule suite,
owl:sameAs equivalence rewrite over the canonical triple store, SHACL-lite
domain/range/datatype validation (violations out), and broadcast-gazetteer
concept tagging. Every query value-gated hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS7_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# dedup-aware train/val split
# --------------------------------------------------------------------------

DEDUP_SPLIT_SALT = 1014
DEDUP_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.2}


def q_corpus_split_dedup_aware(sf_dir: str):
    """Train/val split that can never leak near-duplicates across the
    boundary: minhash near-dup pairs -> connected components -> every doc
    hashed into its split by its CLUSTER KEEPER id, not its own id, so a
    whole duplicate cluster lands on one side (the split-hygiene rule that
    makes held-out perplexity honest). Composition of the registry's dedup
    resolution (`extras/dedup.cluster_keepers`) with the SplitMix64
    integer-threshold assignment (`extras/shuffle`)."""
    from .extras.dedup import cluster_keepers, minhash_lsh_pairs
    from .extras.shuffle import sm64_key
    from .queries_extras import _corpus_with_dups

    corpus = _corpus_with_dups(sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=32, verify_threshold=0.5
    ).select_columns(["id_a", "id_b"])
    keepers = cluster_keepers(corpus, pairs, id_col="doc_id")

    names = list(DEDUP_SPLIT_FRACTIONS)
    edges = []
    cum = 0.0
    for n in names[:-1]:
        cum += DEDUP_SPLIT_FRACTIONS[n]
        edges.append(np.uint64(min(int(cum * 2**64), 2**64 - 1)))

    def _assign(batch: pa.Table) -> pa.Table:
        keeper = batch.column("keeper_id").to_numpy(zero_copy_only=False)
        h = sm64_key(keeper, DEDUP_SPLIT_SALT)
        out = np.full(len(h), names[-1], dtype=object)
        prev = np.zeros(len(h), dtype=bool)
        for name, edge in zip(names, edges):
            m = (h < edge) & ~prev
            out[m] = name
            prev |= m
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks(),
                "split": pa.array(out, pa.string()),
            }
        )

    return keepers.map_batches(_assign, batch_format="pyarrow")


def _sql_split_dedup_aware() -> str:
    from .extras.shuffle import sql_sm64_chain
    from .queries_extras import _SQL_DUP_CTES

    names = list(DEDUP_SPLIT_FRACTIONS)
    cum, whens = 0.0, []
    for n in names[:-1]:
        cum += DEDUP_SPLIT_FRACTIONS[n]
        whens.append(f"WHEN h < {int(cum * 2**64)} THEN '{n}'")
    chain = sql_sm64_chain("keep", "keeper", DEDUP_SPLIT_SALT)
    return f"""
WITH RECURSIVE {_SQL_DUP_CTES},
edges AS (SELECT id_a AS a, id_b AS b FROM dup
          UNION ALL SELECT id_b, id_a FROM dup),
reach(id, r) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
keep AS (SELECT id AS doc_id, min(r) AS keeper FROM reach GROUP BY id),
{chain}
SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split FROM h3
"""


# --------------------------------------------------------------------------
# exact grouped Mann-Whitney AUC
# --------------------------------------------------------------------------

def q_stats_group_auc(sf_dir: str):
    """Per-returnflag AUC of extended price (cents) predicting a high-
    quantity order line (l_quantity >= 26): exact tie-corrected rank-sum via
    `extras/stats.group_rank_auc` — distinct (group, score) counts folded
    through one narrow sort, 2U accumulated per block with driver-folded
    per-group carries; ONE float division per group at the end."""
    from .extras.stats import group_rank_auc

    li = load(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": b.column("l_returnflag").combine_chunks(),
                "v": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                ),
                "lab": pc.cast(
                    pc.greater_equal(b.column("l_quantity"), 26.0), pa.int64()
                ),
            }
        )

    out = group_rank_auc(
        li.map_batches(_prep, batch_format="pyarrow"), "g", "v", "lab"
    )
    return out.rename_columns(["l_returnflag", "n_pos", "n_neg", "auc"])


# 2*avg_rank = 2*rank() + ties - 1 stays integer; AUC = (sum over positives
# of 2*avg_rank - n1*(n1+1)) / (2*n1*n0), one float division
SQL_GROUP_AUC = """
WITH b AS (SELECT l_returnflag AS g,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                  CASE WHEN l_quantity >= 26 THEN 1 ELSE 0 END AS lab
           FROM lineitem),
r AS (SELECT g, lab,
             2 * rank() OVER (PARTITION BY g ORDER BY v)
               + count(*) OVER (PARTITION BY g, v) - 1 AS r2
      FROM b),
s AS (SELECT g, sum(CASE WHEN lab = 1 THEN r2 ELSE 0 END) AS r2sum,
             sum(lab) AS n1, count(*) - sum(lab) AS n0
      FROM r GROUP BY g)
SELECT g AS l_returnflag, CAST(n1 AS BIGINT) AS n_pos,
       CAST(n0 AS BIGINT) AS n_neg,
       CAST(r2sum - n1 * (n1 + 1) AS DOUBLE) / (2.0 * n1 * n0) AS auc
FROM s
"""


# --------------------------------------------------------------------------
# Gopher-style quality rule suite
# --------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 15, 100_000


def q_text_gopher_rules(sf_dir: str):
    """Gopher-rule document quality suite (Rae et al. 2021 §A1.1 shape) in
    integer arithmetic — per doc: word-count bounds, mean word length in
    [3, 10] (3n <= chars <= 10n, no float), >= 80 % words containing an
    alphabetic char (5·n_alpha >= 4·n), >= 2 stop-word occurrences, and
    symbol-to-word ratio <= 0.1 ('#' chars + '...' runs; 10·sym <= n).
    All flags per doc plus the conjunctive keep bit; one streaming
    Arrow-kernel pass, no Python per row."""
    docs = load(sf_dir, "documents", ["doc_id", "text"])
    stop_arr = pa.array(GOPHER_STOPWORDS, pa.string())

    def _rules(b: pa.Table) -> pa.Table:
        text = b.column("text").combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        ndocs = len(text)
        ne = nonempty.to_numpy(zero_copy_only=False)
        n_words = np.bincount(parent[ne], minlength=ndocs).astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        )
        n_alpha = np.bincount(parent[alpha & ne], minlength=ndocs).astype(np.int64)
        stop = pc.is_in(
            pc.utf8_lower(flat), value_set=stop_arr
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parent[stop & ne], minlength=ndocs).astype(np.int64)
        # mean word length bounds: total non-whitespace chars vs word count
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = (
            pc.count_substring_regex(text, r"\s")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        wchars = n_chars - n_ws
        n_hash = (
            pc.count_substring(text, "#").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_ell = (
            pc.count_substring(text, "...")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sym = n_hash + n_ell
        p_len = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
        p_wlen = (3 * n_words <= wchars) & (wchars <= 10 * n_words)
        p_alpha = 5 * n_alpha >= 4 * n_words
        p_stop = n_stop >= 2
        p_sym = 10 * sym <= n_words
        keep = p_len & p_wlen & p_alpha & p_stop & p_sym
        i64 = lambda a: pa.array(a.astype(np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "n_words": pa.array(n_words, pa.int64()),
                "pass_len": i64(p_len),
                "pass_wordlen": i64(p_wlen),
                "pass_alpha": i64(p_alpha),
                "pass_stop": i64(p_stop),
                "pass_symbol": i64(p_sym),
                "keep": i64(keep),
            }
        )

    return docs.map_batches(_rules, batch_format="pyarrow")


_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

SQL_GOPHER = rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         length(regexp_replace(text, '\s', '', 'g')) AS wchars,
         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
           AS n_stop,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\.\.\.')) AS sym
  FROM t),
f AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         CASE WHEN n_words >= {GOPHER_MIN_WORDS}
               AND n_words <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS pass_len,
         CASE WHEN 3 * n_words <= wchars AND wchars <= 10 * n_words
              THEN 1 ELSE 0 END AS pass_wordlen,
         CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS pass_alpha,
         CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS pass_stop,
         CASE WHEN 10 * sym <= n_words THEN 1 ELSE 0 END AS pass_symbol
  FROM m)
SELECT doc_id, n_words,
       CAST(pass_len AS BIGINT) AS pass_len,
       CAST(pass_wordlen AS BIGINT) AS pass_wordlen,
       CAST(pass_alpha AS BIGINT) AS pass_alpha,
       CAST(pass_stop AS BIGINT) AS pass_stop,
       CAST(pass_symbol AS BIGINT) AS pass_symbol,
       CAST(pass_len * pass_wordlen * pass_alpha * pass_stop * pass_symbol
            AS BIGINT) AS keep
FROM f
"""


EXTRAS7_REGISTRY.update(
    {
        "corpus_split_dedup_aware": QueryDef(
            q_corpus_split_dedup_aware, _sql_split_dedup_aware()
        ),
        "stats_group_auc": QueryDef(q_stats_group_auc, SQL_GROUP_AUC),
        "text_gopher_rules": QueryDef(q_text_gopher_rules, SQL_GOPHER),
    }
)


# --------------------------------------------------------------------------
# owl:sameAs equivalence rewrite over the canonical store
# --------------------------------------------------------------------------

SAMEAS_STRIDE = 100  # urn:cust:k ~ urn:cust:k+1 for k % STRIDE == 0


def q_kg_sameas_rewrite(sf_dir: str):
    """owl:sameAs closure applied to the triple stream: an external alias
    edge set (here the deterministic `urn:cust:k ~ urn:cust:k+1` for
    k % 100 == 0, both ends existing) closes into equivalence classes
    (`kg/canonicalize.canonicalize_components` — driver union-find under the
    edge cap, distributed min-label contraction above), every class maps to
    its min IRI, and the corpus-scale triple stream rewrites subj/obj
    through ONE broadcast gather (alias sets are ontology-scale, not
    corpus-scale) followed by a distinct fold — merged duplicates collapse
    to set semantics. The triples never shuffle for the closure itself."""
    import ray

    from .kg.canonicalize import canonicalize_components
    from .kg.pipeline import kg_pipeline
    from .util import distinct_rows

    tri = kg_pipeline(sf_dir, anonymize=False).triples.select_columns(
        ["subj", "pred", "obj", "obj_kind"]
    )
    cust = load(sf_dir, "customer", ["c_custkey"])

    # keep only edges whose +1 endpoint exists (the max custkey has no +1)
    maxk_tbl = cust.map_batches(
        lambda b: pa.table(
            {"m": pa.array([int(b.column("c_custkey").to_numpy().max())], pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    maxk = int(maxk_tbl["m"].max())

    def _edges_capped(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False)
        src = k[(k % SAMEAS_STRIDE == 0) & (k + 1 <= maxk)]
        return pa.table(
            {
                "edge_a": pa.array([f"urn:cust:{x}" for x in src], pa.string()),
                "edge_b": pa.array([f"urn:cust:{x + 1}" for x in src], pa.string()),
            }
        )

    mapping = canonicalize_components(
        cust.map_batches(_edges_capped, batch_format="pyarrow")
    )
    if not isinstance(mapping, pa.Table):
        mapping = pa.concat_tables(
            [t for t in ray.get(mapping.to_arrow_refs()) if t.num_rows]
        )
    mref = ray.put(
        (mapping.column("node").combine_chunks(), mapping.column("canonical").combine_chunks())
    )

    def _rewrite(b: pa.Table) -> pa.Table:
        nodes, canon = ray.get(mref)

        def _sub(col):
            idx = pc.index_in(col, value_set=nodes)
            rep = pc.take(canon, idx)
            return pc.if_else(pc.is_valid(idx), rep, col)

        return pa.table(
            {
                "subj": _sub(b.column("subj").combine_chunks()),
                "pred": b.column("pred").combine_chunks(),
                "obj": pc.if_else(
                    pc.equal(b.column("obj_kind"), "iri"),
                    _sub(b.column("obj").combine_chunks()),
                    b.column("obj").combine_chunks(),
                ),
                "obj_kind": b.column("obj_kind").combine_chunks(),
            }
        )

    return distinct_rows(
        tri.map_batches(_rewrite, batch_format="pyarrow"),
        ["subj", "pred", "obj", "obj_kind"],
    )


def _sql_sameas() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH canon AS ({SQL_KG_CANONICAL}),
mx AS (SELECT max(c_custkey) AS m FROM customer),
alias AS (SELECT 'urn:cust:' || c_custkey AS a, 'urn:cust:' || (c_custkey + 1) AS b
          FROM customer, mx
          WHERE c_custkey % {SAMEAS_STRIDE} = 0 AND c_custkey + 1 <= mx.m),
-- closure is trivial for stride pairs (min = the even end), expressed
-- generally: every node maps to the min of its 2-node component
map AS (SELECT a AS node, least(a, b) AS canon FROM alias
        UNION ALL SELECT b, least(a, b) FROM alias)
SELECT DISTINCT
  coalesce(ms.canon, canon.subj) AS subj, pred,
  CASE WHEN obj_kind = 'iri' THEN coalesce(mo.canon, obj) ELSE obj END AS obj,
  obj_kind
FROM canon
LEFT JOIN map ms ON ms.node = canon.subj
LEFT JOIN map mo ON canon.obj_kind = 'iri' AND mo.node = canon.obj
"""


# --------------------------------------------------------------------------
# SHACL-lite constraint validation (violations out, not booleans)
# --------------------------------------------------------------------------

def q_kg_validate_shacl(sf_dir: str):
    """Domain/range/datatype validation of the triple stream against a
    broadcast shape table (SHACL NodeShape essentials): `basedIn` must run
    urn:cust: -> urn:nation:, `partOf` urn:nation: -> urn:region:,
    `hasAccountBalance` must carry a double literal. A deterministic
    corruption (every custkey % 13 == 0 basedIn retargeted to its REGION —
    the classic wrong-granularity link) makes the violation set non-empty
    and exactly predictable. One vectorized starts_with/equality scan per
    constraint column; the stream never shuffles. Output: violating triples
    + the rule they break."""
    from .kg.pipeline import kg_pipeline

    tri = kg_pipeline(sf_dir, anonymize=False).triples.select_columns(
        ["subj", "pred", "obj", "obj_kind"]
    )
    nat = load(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    n2r = {
        int(r["n_nationkey"]): int(r["n_regionkey"]) for r in nat.take_all()
    }  # ontology-sized

    reg_of = np.zeros(max(n2r) + 1, dtype=np.int64)
    for nk, rk in n2r.items():
        reg_of[nk] = rk

    def _corrupt(b: pa.Table) -> pa.Table:
        pred = b.column("pred").combine_chunks()
        obj = b.column("obj").combine_chunks()
        is_based = pc.equal(pred, "basedIn")
        if not pc.any(is_based).as_py():
            return b
        # vectorized id surgery: numeric tail of subj/obj via one slice each
        # (non-basedIn rows get a parse-safe placeholder before the cast)
        k = pc.cast(
            pc.utf8_slice_codeunits(
                pc.if_else(
                    is_based,
                    b.column("subj").combine_chunks(),
                    pa.scalar("urn:cust:0"),
                ),
                9,
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        hit = is_based.to_numpy(zero_copy_only=False) & (k % 13 == 0)
        nk = np.where(
            hit,
            pc.cast(
                pc.utf8_slice_codeunits(
                    pc.if_else(is_based, obj, pa.scalar("urn:nation:0")), 11
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False),
            0,
        )
        retarget = pa.array(
            np.char.add("urn:region:", reg_of[nk].astype(str)), pa.string()
        )
        new_obj = pc.if_else(pa.array(hit), retarget, obj)
        return b.set_column(b.column_names.index("obj"), "obj", new_obj)

    def _validate(b: pa.Table) -> pa.Table:
        pred = b.column("pred")
        subj = b.column("subj")
        obj = b.column("obj")
        kind = b.column("obj_kind")
        rules = [
            ("basedIn", "urn:cust:", "urn:nation:", "iri", "range:basedIn"),
            ("partOf", "urn:nation:", "urn:region:", "iri", "range:partOf"),
            ("hasAccountBalance", "urn:cust:", None, "double", "datatype"),
        ]
        bad_mask = None
        rule_col = np.full(b.num_rows, "", dtype=object)
        for p, dom, rng, k, name in rules:
            m = pc.equal(pred, p)
            ok = pc.starts_with(subj, dom)
            if rng is not None:
                ok = pc.and_(ok, pc.starts_with(obj, rng))
            ok = pc.and_(ok, pc.equal(kind, k))
            viol = pc.and_(m, pc.invert(ok)).to_numpy(zero_copy_only=False)
            rule_col[viol] = name
            bad_mask = viol if bad_mask is None else (bad_mask | viol)
        out = b.append_column("rule", pa.array(rule_col, pa.string()))
        return out.filter(pa.array(bad_mask))

    return tri.map_batches(_corrupt, batch_format="pyarrow").map_batches(
        _validate, batch_format="pyarrow"
    )


def _sql_shacl() -> str:
    from .queries_kg import SQL_KG_CANONICAL

    return f"""
WITH canon AS ({SQL_KG_CANONICAL}),
corrupted AS (
  SELECT subj, pred,
         CASE WHEN pred = 'basedIn'
               AND CAST(split_part(subj, ':', 3) AS BIGINT) % 13 = 0
              THEN 'urn:region:' || (SELECT n_regionkey FROM nation
                    WHERE n_nationkey = CAST(split_part(obj, ':', 3) AS BIGINT))
              ELSE obj END AS obj,
         obj_kind
  FROM canon)
SELECT subj, pred, obj, obj_kind, 'range:basedIn' AS rule FROM corrupted
WHERE pred = 'basedIn' AND NOT (subj LIKE 'urn:cust:%'
      AND obj LIKE 'urn:nation:%' AND obj_kind = 'iri')
UNION ALL
SELECT subj, pred, obj, obj_kind, 'range:partOf' FROM corrupted
WHERE pred = 'partOf' AND NOT (subj LIKE 'urn:nation:%'
      AND obj LIKE 'urn:region:%' AND obj_kind = 'iri')
UNION ALL
SELECT subj, pred, obj, obj_kind, 'datatype' FROM corrupted
WHERE pred = 'hasAccountBalance'
  AND NOT (subj LIKE 'urn:cust:%' AND obj_kind = 'double')
"""


# --------------------------------------------------------------------------
# broadcast-gazetteer concept tagging
# --------------------------------------------------------------------------

GAZETTEER = {
    "spark": "urn:term:spark",
    "hash": "urn:term:hash",
    "join": "urn:term:join",
    "sort": "urn:term:sort",
    "window": "urn:term:window",
    "stream": "urn:term:stream",
}


def q_kg_concept_tags(sf_dir: str):
    """Dictionary-based entity linking (gazetteer/wikification shape):
    a broadcast concept dictionary tags every document with (doc_id,
    concept IRI, n_mentions). Tokens flatten once per batch, membership is
    one `index_in` against the broadcast term array, per-(doc, term) counts
    come from a single bincount over `parent·|gaz| + term_idx` codes —
    complete within the batch because a document's text is one row; no
    cross-batch fold, no shuffle, no per-row Python."""
    docs = load(sf_dir, "documents", ["doc_id", "text"])
    terms = list(GAZETTEER)
    term_arr = pa.array(terms, pa.string())
    iris = np.array([GAZETTEER[t] for t in terms], dtype=object)
    nt = len(terms)

    def _tag(b: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(b.column("text").combine_chunks())
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.utf8_lower(pc.list_flatten(toks))
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tid = pc.index_in(flat, value_set=term_arr)
        hit = pc.is_valid(tid).to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "concept": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        codes = parent[hit] * nt + tid.to_numpy(zero_copy_only=False)[hit].astype(
            np.int64
        )
        cnt = np.bincount(codes, minlength=b.num_rows * nt)
        nz = np.nonzero(cnt)[0]
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz // nt], pa.int64()),
                "concept": pa.array(iris[nz % nt], pa.string()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    return docs.map_batches(_tag, batch_format="pyarrow")


_GAZ_SQL = ", ".join(f"('{t}', '{GAZETTEER[t]}')" for t in GAZETTEER)

SQL_CONCEPT_TAGS = rf"""
WITH gaz(term, iri) AS (VALUES {_GAZ_SQL}),
tok AS (
  SELECT doc_id, lower(unnest(list_filter(
           regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
  FROM documents)
SELECT doc_id, gaz.iri AS concept, CAST(count(*) AS BIGINT) AS n
FROM tok JOIN gaz ON tok.w = gaz.term
GROUP BY doc_id, gaz.iri
"""


EXTRAS7_REGISTRY.update(
    {
        "kg_sameas_rewrite": QueryDef(q_kg_sameas_rewrite, _sql_sameas()),
        "kg_validate_shacl": QueryDef(q_kg_validate_shacl, _sql_shacl()),
        "kg_concept_tags": QueryDef(q_kg_concept_tags, SQL_CONCEPT_TAGS),
    }
)


# --------------------------------------------------------------------------
# exact per-group Gini coefficient
# --------------------------------------------------------------------------

def q_stats_gini(sf_dir: str):
    """Per-source Gini coefficient of document length (n_chars) — the
    corpus-concentration audit (is one crawl source dominated by a few huge
    pages?). `extras/stats.group_gini`: one (source, value) range sort,
    per-block rank-weighted partials, driver-folded row-count carries, one
    float division per group."""
    from .extras.stats import group_gini

    docs = load(sf_dir, "documents", ["source", "n_chars"])
    out = group_gini(docs, "source", "n_chars")
    return out


SQL_GINI = """
WITH s AS (SELECT source, n_chars AS v,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars)
                    AS i
           FROM documents),
a AS (SELECT source, count(*) AS n, sum(v) AS sv, sum(i * v) AS rs
      FROM s GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS sum_v,
       CAST(2 * rs - (n + 1) * sv AS DOUBLE) / (1.0 * n * sv) AS gini
FROM a
"""


EXTRAS7_REGISTRY.update(
    {"stats_gini": QueryDef(q_stats_gini, SQL_GINI)}
)


# --------------------------------------------------------------------------
# SCD-type-2 history build
# --------------------------------------------------------------------------

def q_events_scd2(sf_dir: str):
    """Slowly-changing-dimension type-2 build over the event log: each
    user's ordered event_type stream collapses to validity intervals
    (state, valid_from, valid_to-null-while-current). One range sort +
    per-block change-point masks with a (key, state) boundary carry and a
    driver-chained forward halo for interval close (`extras/window.
    scd2_history`); timestamps exchanged as int64 microseconds."""
    from .extras.window import scd2_history

    ev = load(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return scd2_history(ev, "user_id", "ts", "event_id", "event_type")


SQL_SCD2 = """
WITH s AS (SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT user_id, event_id, event_type AS state,
             CAST(epoch_us(ts) AS BIGINT) AS valid_from
      FROM s WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to
FROM c
"""


EXTRAS7_REGISTRY.update({"events_scd2": QueryDef(q_events_scd2, SQL_SCD2)})
