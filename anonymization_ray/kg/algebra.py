"""SPARQL 1.1 solution-sequence algebra over BGP binding streams — FILTER,
VALUES and MINUS, the three modifiers that turn `match_bgp` conjunctions
into the full WHERE-clause surface (reference parity: the Jena service
evaluates these inside ARQ; here each is a stateless vectorized pass or a
filter-join over the lazy binding Dataset — bindings never collect on the
driver).

Scale notes
-----------
- FILTER is embarrassingly parallel: one `pyarrow.compute` kernel per
  condition per batch, conditions ANDed.
- VALUES is inline data (small by construction — it's literally typed into
  the query), so it broadcasts: the tuple set rides `ray.put` once and each
  batch checks membership with one `is_in` over a packed key.
- MINUS removes bindings that agree with some minus-binding on the shared
  variables — an anti semi-join on the packed shared-var key; broadcast when
  the minus side is small, hash-partitioned `left_anti` otherwise
  (``extras.joins.semi_anti_join`` picks per the flag).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SEP = "\x1f"  # cannot appear in IRIs or our literal surface forms

_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def filter_bindings(
    bindings: rd.Dataset,
    conditions: list[tuple],
) -> rd.Dataset:
    """SPARQL FILTER: keep bindings where every condition holds (&&).

    Each condition is ``(var, op, value)`` with op in ``== != < <= > >=
    regex``. ``value`` may be:

    - another variable name (column-to-column compare),
    - an int/float (the var column is cast to float64 first — the
      ``xsd:double(?v) > k`` idiom over literal surface forms),
    - a string (plain term compare; for ``regex`` it is the pattern).

    Errors (uncastable literals) follow SPARQL: an error eliminates the
    row — the cast uses a null-on-failure path and nulls never pass."""

    def _apply(batch: pa.Table) -> pa.Table:
        mask = None
        for var, op, value in conditions:
            col = batch.column(var)
            if op == "regex":
                m = pc.match_substring_regex(col, value)
            else:
                kern = _CMP[op]
                if isinstance(value, (int, float)) and not isinstance(value, bool):
                    ct = col.type if hasattr(col, "type") else col.chunks[0].type
                    if pa.types.is_integer(ct) or pa.types.is_floating(ct):
                        # already-numeric column (HAVING over aggregates)
                        m = kern(
                            pc.cast(col, pa.float64()),
                            pa.scalar(float(value), pa.float64()),
                        )
                        m = pc.fill_null(m, False)
                        mask = m if mask is None else pc.and_(mask, m)
                        continue
                    # null-on-failure cast (Arrow's cast raises on garbage,
                    # so non-numeric surface forms are nulled first):
                    # FILTER type errors eliminate the row, per SPARQL
                    numeric = pc.match_substring_regex(
                        col, r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"
                    )
                    clean = pc.if_else(
                        pc.fill_null(numeric, False), col, pa.scalar(None, pa.string())
                    )
                    num = pc.cast(clean, pa.float64())
                    m = kern(num, pa.scalar(float(value), pa.float64()))
                elif isinstance(value, str) and value in batch.column_names:
                    m = kern(col, batch.column(value))
                else:
                    m = kern(col, pa.scalar(value, pa.string()))
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return bindings.map_batches(_apply, batch_format="pyarrow")


def _packed(batch_cols: list[pa.ChunkedArray | pa.Array]) -> pa.Array:
    parts: list = []
    for c in batch_cols:
        parts.append(pc.cast(c, pa.string()))
        parts.append(_SEP)
    return pc.binary_join_element_wise(*parts[:-1], "")


def values_bindings(
    bindings: rd.Dataset,
    variables: list[str],
    rows: list[tuple],
) -> rd.Dataset:
    """SPARQL VALUES: restrict bindings to the inline tuple block. Inline
    data is small by construction, so the packed tuple set broadcasts once
    and each batch filters with one `is_in` — no shuffle, no join."""
    import ray

    keyset = pa.array(
        [_SEP.join(str(v) for v in r) for r in rows], pa.string()
    )
    key_ref = ray.put(pc.unique(keyset))

    def _apply(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        key = _packed([batch.column(v) for v in variables])
        return batch.filter(pc.fill_null(pc.is_in(key, value_set=ks), False))

    return bindings.map_batches(_apply, batch_format="pyarrow")


def minus_bindings(
    bindings: rd.Dataset,
    minus: rd.Dataset,
    *,
    broadcast: bool = True,
) -> rd.Dataset:
    """SPARQL MINUS: drop bindings that agree with at least one minus-side
    binding on the variables the two sides share (column-name intersection;
    SPARQL's disjoint-domain corner — no shared vars removes nothing — is
    honored by returning ``bindings`` unchanged)."""
    # a lazy rename_columns can leave stale '?var' names in Dataset.schema()
    # metadata while the blocks already carry bare names — strip the prefix
    # on BOTH sides so the intersection never silently misses (a miss would
    # make MINUS a no-op, which is exactly the failure mode SPARQL's
    # disjoint-domain rule would mask)
    b_names = [c.lstrip("?") for c in bindings.schema().names]
    m_names = {c.lstrip("?") for c in minus.schema().names}
    shared = [c for c in b_names if c in m_names]
    if not shared:
        return bindings

    from ..extras.joins import semi_anti_join

    def _key(cols: list[str]):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.append_column("__mk", _packed([batch.column(c) for c in cols]))

        return _f

    keyed = bindings.map_batches(_key(shared), batch_format="pyarrow")
    mkeyed = minus.map_batches(_key(shared), batch_format="pyarrow").select_columns(
        ["__mk"]
    )
    out = semi_anti_join(keyed, mkeyed, on="__mk", anti=True, broadcast=broadcast)
    return out.drop_columns(["__mk"])


def aggregate_bindings(
    bindings: rd.Dataset,
    group_vars: list[str],
    aggs: list[tuple[str, str | None, str]],
    *,
    having: list[tuple] | None = None,
) -> rd.Dataset:
    """SPARQL GROUP BY + aggregates (+ HAVING) over a binding stream.

    ``aggs`` entries are ``(op, var, out)`` with op in ``sum count min
    max``; ``count`` ignores var (COUNT(*)). Sum columns must be
    exact-integer (derive fixed-point micro-units upstream — the repo-wide
    reduction-order-proof contract); AVG is a post-map over (sum, count).

    One ``util.fold_per_key`` pass: per-batch Arrow-C partials on the packed
    group key, one narrow range sort, per-block folds, driver merge of the
    block-spanning edge keys only. Group variables are recovered through a
    ``min`` fold (they are constant within a group by construction).
    ``having`` reuses the FILTER condition surface on aggregate columns."""
    spec: dict[str, tuple[str, str | None]] = {}
    for v in group_vars:
        spec[v] = ("min", v)
    for op, var, out in aggs:
        spec[out] = (op, var)

    def _key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__gk", _packed([batch.column(v) for v in group_vars])
        )

    from ..util import fold_per_key

    keyed = bindings.map_batches(_key, batch_format="pyarrow")
    folded = fold_per_key(keyed, "__gk", spec).drop_columns(["__gk"])
    if having:
        folded = filter_bindings(folded, having)
    return folded


def distinct_bindings(bindings: rd.Dataset, cols: list[str] | None = None) -> rd.Dataset:
    """SELECT DISTINCT: set-fold the binding stream (sort + boundary scan,
    never a Ray groupby)."""
    from ..util import distinct_rows

    names = cols or [c.lstrip("?") for c in bindings.schema().names]
    return distinct_rows(bindings.select_columns(names), names)


def order_limit_bindings(
    bindings: rd.Dataset,
    order: list[tuple[str, bool]],
    limit: int,
    *,
    offset: int = 0,
) -> pa.Table:
    """ORDER BY ... LIMIT ... OFFSET ... — the top-k solution modifier.
    One range sort + limit(offset+limit); the OFFSET slice gathers only the
    (offset+limit)-sized head (inline-small by construction — SPARQL LIMIT
    is typed into the query). Ties must be broken by a trailing unique
    column in ``order`` or the boundary row is partition-dependent."""
    cols = [c for c, _ in order]
    desc = [d for _, d in order]
    head = bindings.sort(cols, descending=desc).limit(offset + limit)
    t = pa.concat_tables(
        [pa.table(b) for b in head.iter_batches(batch_format="pyarrow")]
    )
    t = t.take(pc.sort_indices(t, sort_keys=[(c, "descending" if d else "ascending") for c, d in order]))
    return t.slice(offset, limit)


def union_bindings(groups: list[rd.Dataset]) -> rd.Dataset:
    """SPARQL UNION over binding groups with DIFFERENT variable sets: the
    output schema is the variable union (first-seen order) and each group is
    null-padded for the variables it does not bind — exactly the spec's
    solution-sequence union. A stateless per-batch pad, then stream unions
    (no shuffle, no driver gather)."""
    if not groups:
        raise ValueError("empty UNION")
    all_vars: list[str] = []
    for g in groups:
        for c in g.schema().names:
            c = c.lstrip("?")
            if c not in all_vars:
                all_vars.append(c)

    def _pad(have: list[str]):
        def _f(batch: pa.Table) -> pa.Table:
            cols = {}
            for v in all_vars:
                if v in batch.column_names:
                    cols[v] = batch.column(v)
                else:
                    cols[v] = pa.nulls(batch.num_rows, pa.string())
            return pa.table(cols)

        return _f

    padded = [
        g.map_batches(_pad([c.lstrip("?") for c in g.schema().names]),
                      batch_format="pyarrow")
        for g in groups
    ]
    out = padded[0]
    for p in padded[1:]:
        out = out.union(p)
    return out


def bind_bindings(bindings: rd.Dataset, out: str, expr: tuple) -> rd.Dataset:
    """SPARQL BIND(expr AS ?out): append a computed variable. Expression
    forms (vectorized, one kernel chain per batch):

    - ``("concat", [p1, p2, ...])`` — parts are variable names (current
      columns) or string literals;
    - ``("add"|"sub"|"mul", a, b)`` — a/b are variable names or numeric
      literals, evaluated in float64."""

    def _apply(batch: pa.Table) -> pa.Table:
        kind = expr[0]
        if kind == "concat":
            parts = [
                pc.cast(batch.column(p), pa.string())
                if isinstance(p, str) and p in batch.column_names
                else pa.scalar(str(p), pa.string())
                for p in expr[1]
            ]
            # binary_join_element_wise needs array operands; broadcast
            # literals against the batch length
            arrs = [
                p if not isinstance(p, pa.Scalar)
                else pa.array([p.as_py()] * batch.num_rows, pa.string())
                for p in parts
            ]
            val = pc.binary_join_element_wise(*arrs, "")
        else:
            def _term(t):
                if isinstance(t, str) and t in batch.column_names:
                    return pc.cast(batch.column(t), pa.float64())
                return pa.scalar(float(t), pa.float64())

            a, b = _term(expr[1]), _term(expr[2])
            val = {"add": pc.add, "sub": pc.subtract, "mul": pc.multiply}[kind](a, b)
        return batch.append_column(out, val)

    return bindings.map_batches(_apply, batch_format="pyarrow")


def exists_filter(
    bindings: rd.Dataset,
    group: rd.Dataset,
    *,
    negate: bool = False,
    broadcast: bool = True,
) -> rd.Dataset:
    """SPARQL FILTER EXISTS / NOT EXISTS { pattern } for well-designed
    patterns (the group's shared variables are bound by the outer block):
    a semi join (EXISTS) or anti join (NOT EXISTS) on the packed shared-var
    key — the correlated-subquery semantics without row-at-a-time
    evaluation."""
    b_names = [c.lstrip("?") for c in bindings.schema().names]
    g_names = {c.lstrip("?") for c in group.schema().names}
    shared = [c for c in b_names if c in g_names]
    if not shared:
        raise ValueError(
            "FILTER EXISTS group shares no variable with the outer block"
        )

    from ..extras.joins import semi_anti_join

    def _key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__ek", _packed([batch.column(c) for c in shared])
        )

    keyed = bindings.map_batches(_key, batch_format="pyarrow")
    gkeyed = group.map_batches(_key, batch_format="pyarrow").select_columns(["__ek"])
    out = semi_anti_join(keyed, gkeyed, on="__ek", anti=negate, broadcast=broadcast)
    return out.drop_columns(["__ek"])
