"""KPI stage — equivalence classes, randomization similarity, k-anonymity.

Reference semantics (``service/KpiService.java``):

- K2 equivalence classes: group records by the tuple of *all*
  ``<attr>_generalized`` bindings (unbound for masked/randomized attrs; null
  originals form their own group) — ``QueryBuildingService.java:142-163``
- K3 randomization similarity: per randomized attribute,
  benchmark = 2 * mean(|orig - randomized|) over non-null records; a record's
  similar-set = records whose ORIGINAL value lies within
  [randomized_r - benchmark, randomized_r + benchmark] (inclusive); records
  with null originals are mutually similar — ``KpiService.java:102-154``
- K4 k-anonymity = min over records of |equivalence class ∩ (∩ similarity
  sets)| — ``KpiService.java:75-99``; stored as ``soya:kanonymity``.

Scale design: equivalence classes are one hash groupby; benchmarks are
streaming (sum, count) partial aggregates; the class∩similarity intersection
is computed inside ``groupby(gen_cols).map_groups`` — co-locating each
equivalence class once, vectorized searchsorted for the single-randomized-
attribute case, chunked boolean intersection otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .codecs import CODECS

# sentinel used to make null group keys groupable
_NULL_INT = -2147483648
_NULL_STR = "\x00<null>"


@dataclass
class RandomizedAttr:
    orig_col: str
    rand_col: str
    kind: str  # numeric|date|dateTime
    benchmark: float | None = None  # filled by compute_benchmarks


def _canon(batch_col: pa.ChunkedArray, kind: str) -> np.ndarray:
    arr = CODECS[kind].to_numeric(batch_col)
    return arr.to_numpy(zero_copy_only=False).astype(np.float64)


def compute_benchmarks(
    ds: ray.data.Dataset, rand_attrs: list[RandomizedAttr]
) -> list[RandomizedAttr]:
    """benchmark = 2 * mean(|orig - randomized|) over non-null originals
    (``KpiService.java:146-148``). One streaming pass for all attributes."""
    if not rand_attrs:
        return rand_attrs

    def _partial(batch: pa.Table) -> pa.Table:
        row = {}
        for i, ra in enumerate(rand_attrs):
            o = _canon(batch.column(ra.orig_col), ra.kind)
            r = _canon(batch.column(ra.rand_col), ra.kind)
            valid = ~(np.isnan(o) | np.isnan(r))
            row[f"s{i}"] = [float(np.abs(o[valid] - r[valid]).sum())]
            row[f"c{i}"] = [int(valid.sum())]
        return pa.table(row)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    cols = [f"s{i}" for i in range(len(rand_attrs))] + [f"c{i}" for i in range(len(rand_attrs))]
    sums = parts.sum(cols)
    if not isinstance(sums, dict):
        sums = {f"sum({cols[0]})": sums}
    out = []
    for i, ra in enumerate(rand_attrs):
        c = sums.get(f"sum(c{i})") or 0
        b = (2.0 * (sums.get(f"sum(s{i})") or 0.0) / c) if c else None
        out.append(RandomizedAttr(ra.orig_col, ra.rand_col, ra.kind, b))
    return out


def _group_key_batch(batch: pa.Table, gen_cols: list[str]) -> pa.Table:
    """Null-safe group key columns (nulls form their own group, matching the
    SPARQL GROUP BY over OPTIONAL bindings)."""
    cols = {}
    for c in gen_cols:
        a = batch.column(c)
        if pa.types.is_integer(a.type):
            cols[f"_k_{c}"] = pc.coalesce(pc.cast(a, pa.int64()), pa.scalar(_NULL_INT, pa.int64()))
        else:
            cols[f"_k_{c}"] = pc.coalesce(pc.cast(a, pa.string()), pa.scalar(_NULL_STR, pa.string()))
    for name, arr in cols.items():
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, arr)
    return batch


def equivalence_classes(ds: ray.data.Dataset, gen_cols: list[str]) -> ray.data.Dataset:
    """K2: one row per generalized-tuple class with its size (``class_size``)."""
    keyed = ds.map_batches(lambda b: _group_key_batch(b, gen_cols), batch_format="pyarrow")
    key_cols = [f"_k_{c}" for c in gen_cols]
    grouped = keyed.groupby(key_cols).count()

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [c[3:] if c.startswith("_k_") else ("class_size" if c == "count()" else c) for c in batch.column_names]
        )

    return grouped.map_batches(_rename, batch_format="pyarrow")


def _group_min_intersection(
    group: pa.Table, rand_attrs: list[RandomizedAttr], chunk: int = 1024
) -> int:
    """Min over records in one equivalence class of
    |{x in class : for every randomized attr, orig_x within r's range}|."""
    m = group.num_rows
    if not rand_attrs:
        return m
    origs, rands, nulls = [], [], []
    for ra in rand_attrs:
        o = _canon(group.column(ra.orig_col), ra.kind)
        r = _canon(group.column(ra.rand_col), ra.kind)
        origs.append(o)
        rands.append(r)
        nulls.append(np.isnan(o))

    if len(rand_attrs) == 1:
        # vectorized: counts via searchsorted over sorted originals
        ra, o, r, isnull = rand_attrs[0], origs[0], rands[0], nulls[0]
        b = ra.benchmark or 0.0
        o_sorted = np.sort(o[~isnull])
        n_null = int(isnull.sum())
        counts = np.empty(m, dtype=np.int64)
        nn = ~isnull
        if nn.any():
            lo = np.searchsorted(o_sorted, r[nn] - b, side="left")
            hi = np.searchsorted(o_sorted, r[nn] + b, side="right")
            counts[nn] = hi - lo
        counts[isnull] = n_null
        return int(counts.min()) if m else 0

    best = m
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        mask = np.ones((e - s, m), dtype=bool)
        for o, r, isnull, ra in zip(origs, rands, nulls, rand_attrs):
            b = ra.benchmark or 0.0
            r_chunk = r[s:e, None]
            null_chunk = isnull[s:e, None]
            in_range = (~np.isnan(o)[None, :]) & (o[None, :] >= r_chunk - b) & (o[None, :] <= r_chunk + b)
            mask &= np.where(null_chunk, isnull[None, :], in_range)
        best = min(best, int(mask.sum(axis=1).min()))
    return best


def _k_anonymity_single_class(ds: ray.data.Dataset, ra: RandomizedAttr) -> int:
    """All-masked configs put EVERY record into one equivalence class —
    a ``map_groups`` over that class would hand the whole dataset to one
    task. For the single-randomized-attribute case the intersection count is
    a pure range-count (rank(r+b) - rank(r-b) over sorted originals), so it
    distributes as a sort-merge: originals and query points are both range
    sorted; each query block scans only the original blocks overlapping its
    value range ±benchmark, accumulating per-block searchsorted counts —
    memory per task is bounded by two blocks at any input size."""
    from ..util import sorted_column

    def _narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o": pa.array(_canon(batch.column(ra.orig_col), ra.kind), pa.float64()),
                "r": pa.array(_canon(batch.column(ra.rand_col), ra.kind), pa.float64()),
            }
        )

    narrow = ds.map_batches(_narrow, batch_format="pyarrow").materialize()
    m = narrow.count()
    if m == 0:
        return 0
    b = ra.benchmark or 0.0

    # sorted non-null originals (valid_mask drops the NaN originals)
    sc_o = sorted_column(narrow, "o", "r", lambda a: a)
    n_null = m - sc_o.total
    if sc_o.total == 0:
        return n_null

    # sorted query points: the randomized values of non-NULL-original rows
    def _queries(batch: pa.Table) -> pa.Table:
        o = batch.column("o").to_numpy(zero_copy_only=False)
        return pa.table({"q": batch.column("r").filter(pa.array(~np.isnan(o)))})

    q = narrow.map_batches(_queries, batch_format="pyarrow")
    sc_q = sorted_column(q.map_batches(
        lambda t: t.append_column("qid", pc.cast(t.column("q"), pa.float64())),
        batch_format="pyarrow",
    ), "q", "qid", lambda a: a)
    if sc_q.total < sc_o.total:
        # a NaN randomized value on a non-null original: its range count is 0
        # in the per-class reference semantics
        return 0

    # driver holds only per-block boundary values of the sorted originals
    import ray as _ray

    @_ray.remote(num_cpus=0.25)
    def _bounds(t: pa.Table):
        v = t.column("o")
        return (v[0].as_py(), v[-1].as_py())

    obounds = _ray.get([_bounds.remote(rref) for rref in sc_o.refs])
    firsts = np.array([x[0] for x in obounds])
    lasts = np.array([x[1] for x in obounds])

    @_ray.remote
    def _qblock_min(qt: pa.Table, *oblocks: pa.Table) -> int:
        r = qt.column("q").to_numpy(zero_copy_only=False)
        counts = np.zeros(len(r), dtype=np.int64)
        for ob in oblocks:
            ov = ob.column("o").to_numpy(zero_copy_only=False)
            counts += np.searchsorted(ov, r + b, side="right") - np.searchsorted(
                ov, r - b, side="left"
            )
        return int(counts.min()) if len(r) else 0  # blocks are never empty

    futs = []
    for qi, qref in enumerate(sc_q.refs):
        qlo, qhi = None, None
        # block value range from the sorted structure's own boundary probes
        t = sc_q.rows_at_ranks([int(sc_q.offsets[qi]), int(sc_q.offsets[qi + 1]) - 1])
        vals = t.column("q").to_pylist()
        qlo, qhi = min(vals), max(vals)
        # original blocks overlapping [qlo-b, qhi+b]
        sel = [
            sc_o.refs[bi]
            for bi in range(len(sc_o.refs))
            if lasts[bi] >= qlo - b and firsts[bi] <= qhi + b
        ]
        futs.append(_qblock_min.remote(qref, *sel))
    mins = _ray.get(futs)
    best = min(mins) if mins else sc_o.total
    return min(best, n_null) if n_null else best


def k_anonymity(
    ds: ray.data.Dataset,
    gen_cols: list[str],
    rand_attrs: list[RandomizedAttr],
) -> int:
    """K4. ``rand_attrs`` must carry benchmarks (``compute_benchmarks``)."""
    if not gen_cols and not rand_attrs:
        return ds.count()
    if not gen_cols and len(rand_attrs) == 1:
        return _k_anonymity_single_class(ds, rand_attrs[0])
    if not gen_cols:
        # single class containing every record (multi-randomized-attribute:
        # the intersection is not a pure range count; the chunked O(m^2/chunk)
        # per-class path below applies — exact multi-attribute similarity at
        # giant class sizes is inherently quadratic)
        keyed = ds.map_batches(
            lambda b: b.append_column("_k_all", pa.array([0] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
        gen_key_cols = ["_k_all"]
    else:
        keyed = ds.map_batches(lambda b: _group_key_batch(b, gen_cols), batch_format="pyarrow")
        gen_key_cols = [f"_k_{c}" for c in gen_cols]

    if not rand_attrs:
        grouped = keyed.groupby(gen_key_cols).count()
        return int(grouped.min("count()"))

    def _per_group(group: pa.Table) -> pa.Table:
        return pa.table({"group_min": [_group_min_intersection(group, rand_attrs)]})

    mins = keyed.groupby(gen_key_cols).map_groups(_per_group, batch_format="pyarrow")
    return int(mins.min("group_min"))


# --------------------------------------------------------------------------
# extended privacy KPIs (beyond the reference's k-anonymity family):
# l-diversity (Machanavajjhala et al., TKDD 2007) and t-closeness
# (Li, Li, Venkatasubramanian, ICDE 2007) — both public-literature
# definitions over the same equivalence classes K2/K4 use.
# --------------------------------------------------------------------------


def _class_key(batch: pa.Table, gen_cols: list[str], sep: str) -> pa.Array:
    """Readable composite class key: null-safe stringified gen cols joined
    with ``sep`` (callers pick a sep absent from the generalized values)."""
    kb = _group_key_batch(batch, gen_cols)
    parts = [pc.cast(kb.column(f"_k_{c}"), pa.string()) for c in gen_cols]
    if len(parts) == 1:
        return parts[0].combine_chunks()
    return pc.binary_join_element_wise(*parts, sep)


def l_diversity(
    ds: ray.data.Dataset, gen_cols: list[str], sensitive_col: str
) -> int:
    """Distinct l-diversity: min over equivalence classes (tuples of
    ``gen_cols``) of the number of DISTINCT non-null ``sensitive_col``
    values in the class.

    Shape (no Ray groupby at any class cardinality): narrow
    (class_key, sensitive) pair stream -> sort-based ``distinct_rows`` ->
    per-batch partial counts -> sort-based ``sum_per_key`` -> streaming
    global min. Null sensitive values are excluded (matching SQL
    ``count(DISTINCT ...)``); classes whose rows are all-null drop out."""
    from ..extras.graph import sum_per_key
    from ..util import distinct_rows

    def _pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ckey": _class_key(b, gen_cols, "|"),
                "sens": pc.cast(b.column(sensitive_col), pa.string()).combine_chunks(),
            }
        )
        return t.filter(pc.is_valid(t.column("sens")))

    uniq = distinct_rows(
        ds.map_batches(_pairs, batch_format="pyarrow"), ["ckey", "sens"]
    )

    def _ones(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ckey": b.column("ckey").combine_chunks(),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    counts = sum_per_key(
        uniq.map_batches(_ones, batch_format="pyarrow"), "ckey", "one"
    )
    return int(counts.min("one"))


def t_closeness_table(
    ds: ray.data.Dataset,
    gen_cols: list[str],
    sensitive_col: str,
    *,
    key_sep: str = "|",
) -> ray.data.Dataset:
    """t-closeness scoreboard with the equal-distance (total-variation)
    ground metric for a categorical sensitive attribute, in EXACT integer
    arithmetic.

    For each equivalence class c:  tv_num(c) = sum over the sensitive domain
    of |n_cv * N - N_v * n_c|  (absent values contribute N_v * n_c), so the
    class's t value is tv_num / (2 * n_c * N) — left as an exact integer
    numerator + (class_size, n_total) so no float summation order can drift.
    Overflow bound: requires max(n_cv, N_v) * N < 2^63; beyond ~3e9 rows
    pre-scale the counts (mirrors duplicate_span_stats' explicit guard
    style).

    Shapes: narrow (class_key, sensitive) pair stream, per-batch partial
    group_by + sort-based ``sum_per_key`` at class cardinality; only the
    sensitive DOMAIN (assumed small-categorical) is gathered driver-side
    for the N_v broadcast. Three class-cardinality hash joins stitch the
    per-class sums (n_c, sum|.|, sum N_v-present)."""
    from ..extras.graph import sum_per_key
    from ..util import hash_join

    SEP = "\x1f"  # internal (class, sens) composite sep; sens must not contain it

    def _pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ckey": _class_key(b, gen_cols, key_sep),
                "sens": pc.cast(b.column(sensitive_col), pa.string()).combine_chunks(),
            }
        )
        return t.filter(pc.is_valid(t.column("sens")))

    pairs = ds.map_batches(_pairs, batch_format="pyarrow").materialize()

    def _k2(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k2": pc.binary_join_element_wise(
                    b.column("ckey").combine_chunks(),
                    b.column("sens").combine_chunks(),
                    SEP,
                ),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    cv = sum_per_key(pairs.map_batches(_k2, batch_format="pyarrow"), "k2", "one")

    def _split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("k2").combine_chunks(), SEP)
        return pa.table(
            {
                "ckey": pc.list_element(parts, 0),
                "sens": pc.list_element(parts, 1),
                "n_cv": pc.cast(b.column("one"), pa.int64()).combine_chunks(),
            }
        )

    cvs = cv.map_batches(_split, batch_format="pyarrow").materialize()

    nc = sum_per_key(
        cvs.map_batches(
            lambda b: pa.table(
                {
                    "ckey": b.column("ckey").combine_chunks(),
                    "n_c": pc.cast(b.column("n_cv"), pa.int64()).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ),
        "ckey",
        "n_c",
    )

    # sensitive domain: small-categorical by contract -> bounded driver gather
    nv_rows = sum_per_key(
        pairs.map_batches(
            lambda b: pa.table(
                {
                    "sens": b.column("sens").combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "sens",
        "one",
    ).take_all()
    nv_map = {r["sens"]: int(r["one"]) for r in nv_rows}
    n_total = sum(nv_map.values())
    sv_arr = np.array(sorted(nv_map), dtype=str)
    nv_arr = np.array([nv_map[s] for s in sv_arr], np.int64)

    j = hash_join(cvs, nc, on="ckey")

    def _terms(b: pa.Table) -> pa.Table:
        n_cv = b.column("n_cv").to_numpy(zero_copy_only=False).astype(np.int64)
        n_c = b.column("n_c").to_numpy(zero_copy_only=False).astype(np.int64)
        sens = b.column("sens").to_numpy(zero_copy_only=False).astype(str)
        n_v = nv_arr[np.searchsorted(sv_arr, sens)]
        term = np.abs(n_cv * n_total - n_v * n_c)
        return pa.table(
            {
                "ckey": b.column("ckey").combine_chunks(),
                "term": pa.array(term, pa.int64()),
                "nvp": pa.array(n_v, pa.int64()),
            }
        )

    t = j.map_batches(_terms, batch_format="pyarrow").materialize()
    t1 = sum_per_key(t.select_columns(["ckey", "term"]), "ckey", "term")
    snv = sum_per_key(t.select_columns(["ckey", "nvp"]), "ckey", "nvp")

    # materialize the inner join: a lazy join output can emit an empty
    # first block, which would skip the outer join's schema broadcast
    # (see util.hash_join) — class-cardinality tables, so this is tiny
    f = hash_join(hash_join(t1, snv, on="ckey").materialize(), nc, on="ckey")

    def _final(b: pa.Table) -> pa.Table:
        term = b.column("term").to_numpy(zero_copy_only=False).astype(np.int64)
        snvv = b.column("nvp").to_numpy(zero_copy_only=False).astype(np.int64)
        n_c = b.column("n_c").to_numpy(zero_copy_only=False).astype(np.int64)
        tv = term + n_c * (n_total - snvv)
        return pa.table(
            {
                "class_key": b.column("ckey").combine_chunks(),
                "class_size": pa.array(n_c, pa.int64()),
                "tv_num": pa.array(tv, pa.int64()),
                "n_total": pa.array(np.full(len(n_c), n_total, np.int64)),
            }
        )

    return f.map_batches(_final, batch_format="pyarrow")
