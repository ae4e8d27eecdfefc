"""SPARQL 1.1 property-path evaluation over a triple Dataset: sequence
(`a/b`), alternation (`a|b`), inverse (`^a`), grouping, negated property
sets (`!p`, `!(p1|p2)` — one inverted-membership scan), and the transitive
operators `a+` / `a*` (ArbitraryLengthPath — SET semantics per the spec,
closed by iterated squaring in O(log diameter) hash joins; `*` adds the
zero-length (t, t) identity over every graph term).

Compilation is algebraic, Ray-Data-first:

- an atom is ONE filtered projection of the triple stream (constant-pred
  scans read only their POS row-group range at scale);
- `^` swaps the projection (free);
- `/` is one hash-partitioned join per step on the shared node column;
- `|` is a stream union (no shuffle).

Bag semantics for the non-transitive operators (the oracle mirrors with
UNION ALL + joins); `+`/`*` are set-valued as SPARQL specifies, so a
transitive subexpression contributes each (s, o) pair once regardless of
how many paths witness it. Grammar (recursive descent):

    alt    := seq ('|' seq)*
    seq    := postfix ('/' postfix)*
    postfix:= unary ('+' | '*' | '{n}' | '{n,m}')*
    unary  := '^' unary | '!' npset | '(' alt ')' | predicate
    npset  := predicate | '(' predicate ('|' predicate)* ')'

`p{n,m}` is the bounded-repetition Jena extension (the reference engine is
Jena): set-valued union of the n..m-fold compositions, unrolled as m-1
hash joins (m is a query-text literal, so the unroll never depends on
data); `{0,m}` adds the zero-length identity.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import default_num_partitions, distinct_rows

_TOKEN = re.compile(r"\s*(\{[0-9]+(?:,[0-9]+)?\}|[/|()^+*!]|[^\s/|()^+*!{}]+)")


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            raise ValueError(f"bad path syntax at {s[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


def parse_path(s: str):
    toks = _tokenize(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat(t=None):
        nonlocal pos
        if pos >= len(toks) or (t is not None and toks[pos] != t):
            raise ValueError(f"expected {t or 'token'} at position {pos} in {s!r}")
        pos += 1
        return toks[pos - 1]

    def pred_name():
        t = eat()
        if t in "/|()^+*!":
            raise ValueError(f"expected predicate, got {t!r} in {s!r}")
        return t

    def unary():
        if peek() == "^":
            eat("^")
            return ("inv", unary())
        if peek() == "!":
            # negated property set: !p or !(p1|p2) — plain forward
            # predicates only (the spec's ^-inside-! form is not supported)
            eat("!")
            if peek() == "(":
                eat("(")
                preds = [pred_name()]
                while peek() == "|":
                    eat("|")
                    preds.append(pred_name())
                eat(")")
            else:
                preds = [pred_name()]
            return ("npred", preds)
        if peek() == "(":
            eat("(")
            e = alt()
            eat(")")
            return e
        return ("pred", pred_name())

    def postfix():
        e = unary()
        while True:
            t = peek()
            if t in ("+", "*"):
                e = ("plus" if eat() == "+" else "star", e)
            elif t is not None and t.startswith("{"):
                body = eat()[1:-1]
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo, hi = int(lo_s), int(hi_s)
                else:
                    lo = hi = int(body)
                if hi < lo:
                    raise ValueError(f"bad repetition bounds {{{body}}} in {s!r}")
                e = ("rep", e, lo, hi)
            else:
                return e

    def seq():
        parts = [postfix()]
        while peek() == "/":
            eat("/")
            parts.append(postfix())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def alt():
        parts = [seq()]
        while peek() == "|":
            eat("|")
            parts.append(seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    e = alt()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {s!r}")
    return e


def eval_path(
    triples: rd.Dataset, path, *, num_partitions: int | None = None
) -> rd.Dataset:
    """Pairs Dataset[(s, o)] reachable via ``path`` (a string or a parsed
    tree). Bag semantics."""
    if isinstance(path, str):
        path = parse_path(path)
    nparts = num_partitions or max(2, min(default_num_partitions(), 8))

    def go(e) -> rd.Dataset:
        kind = e[0]
        if kind == "pred":
            p = e[1]

            def _scan(b: pa.Table, _p=p) -> pa.Table:
                t = b.filter(pc.equal(b.column("pred"), _p))
                return pa.table(
                    {"s": t.column("subj").combine_chunks(), "o": t.column("obj").combine_chunks()}
                )

            return triples.map_batches(_scan, batch_format="pyarrow")
        if kind == "npred":
            preds = pa.array(e[1], pa.string())

            def _nscan(b: pa.Table, _ps=preds) -> pa.Table:
                m = pc.is_in(b.column("pred").combine_chunks(), value_set=_ps)
                t = b.filter(pc.invert(pc.fill_null(m, False)))
                return pa.table(
                    {"s": t.column("subj").combine_chunks(),
                     "o": t.column("obj").combine_chunks()}
                )

            return triples.map_batches(_nscan, batch_format="pyarrow")
        if kind == "inv":
            return go(e[1]).rename_columns({"s": "o", "o": "s"}).select_columns(["s", "o"])
        if kind == "seq":
            cur = go(e[1][0])
            for step in e[1][1:]:
                nxt = go(step).rename_columns({"s": "o", "o": "o2"})
                cur = (
                    cur.join(
                        nxt.materialize(), join_type="inner",
                        num_partitions=nparts, on=("o",),
                    )
                    .select_columns(["s", "o2"])
                    .rename_columns({"o2": "o"})
                )
            return cur
        if kind == "alt":
            parts = [go(p) for p in e[1]]
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            return out
        if kind in ("plus", "star"):
            closed = _transitive(go(e[1]), nparts)
            if kind == "star":
                # zero-length paths: (t, t) for every term of the graph
                # (subject/object positions — predicates are edge labels
                # here, not nodes). The distinct fold after the union
                # absorbs cycles already present in the closure.
                def _terms(b: pa.Table) -> pa.Table:
                    t = pc.unique(
                        pa.concat_arrays(
                            [
                                b.column("subj").combine_chunks().cast(pa.string()),
                                b.column("obj").combine_chunks().cast(pa.string()),
                            ]
                        )
                    )
                    return pa.table({"s": t, "o": t})

                ident = triples.map_batches(_terms, batch_format="pyarrow")
                closed = distinct_rows(closed.union(ident), ["s", "o"])
            return closed
        if kind == "rep":
            # bounded repetition p{n,m} (Jena property-path extension;
            # reference engine `pom.xml:31` is Jena) — SET semantics like
            # the other ArbitraryLengthPath forms. Powers compose by one
            # hash join per level (m is a small literal, the unroll is
            # bounded by the query text, never the data); the distinct
            # fold collapses multi-witness pairs.
            _, inner, lo, hi = e
            base = distinct_rows(go(inner), ["s", "o"]).materialize()
            power = base
            acc: rd.Dataset | None = base if lo <= 1 else None
            for k in range(2, hi + 1):
                nxt = base.rename_columns({"s": "o", "o": "o2"})
                power = (
                    power.join(
                        nxt.materialize(), join_type="inner",
                        num_partitions=nparts, on=("o",),
                    )
                    .select_columns(["s", "o2"])
                    .rename_columns({"o2": "o"})
                ).materialize()
                if k >= lo:
                    acc = power if acc is None else acc.union(power)
            if hi == 0 or acc is None:
                acc = rd.from_arrow(
                    pa.table({"s": pa.array([], pa.string()),
                              "o": pa.array([], pa.string())})
                )
            if lo == 0:
                def _terms0(b: pa.Table) -> pa.Table:
                    t = pc.unique(
                        pa.concat_arrays(
                            [
                                b.column("subj").combine_chunks().cast(pa.string()),
                                b.column("obj").combine_chunks().cast(pa.string()),
                            ]
                        )
                    )
                    return pa.table({"s": t, "o": t})

                acc = acc.union(
                    triples.map_batches(_terms0, batch_format="pyarrow")
                )
            return distinct_rows(acc, ["s", "o"])
        raise ValueError(f"unknown node {e!r}")

    return go(path)


def _transitive(pairs: rd.Dataset, nparts: int, *, max_iter: int = 16) -> rd.Dataset:
    """Transitive closure of a pair stream by iterated squaring — after k
    rounds every path of length <= 2^k is closed, so a chain of diameter d
    costs O(log d) hash joins (the SPARQL ArbitraryLengthPath contract is
    SET semantics, so each round ends in one ``distinct_rows`` sort-scan
    fold, which also makes the fixpoint test an exact count compare).
    Cycles converge: distinct pairs are bounded by n^2 and monotone."""
    cur = distinct_rows(pairs, ["s", "o"]).materialize()
    n = cur.count()
    for _ in range(max_iter):
        if n == 0:
            return cur
        hop = cur.rename_columns({"s": "o", "o": "o2"}).materialize()
        nxt = (
            cur.join(hop, join_type="inner", num_partitions=nparts, on=("o",))
            .select_columns(["s", "o2"])
            .rename_columns({"o2": "o"})
        )
        merged = distinct_rows(cur.union(nxt), ["s", "o"]).materialize()
        m = merged.count()
        if m == n:
            return merged
        cur, n = merged, m
    raise RuntimeError(
        f"transitive closure did not converge in {max_iter} squaring rounds "
        f"(paths of length 2^{max_iter} exist?) — raise max_iter"
    )
