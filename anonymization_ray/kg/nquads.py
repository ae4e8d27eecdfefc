"""N-Quads serialization — the named-graph (quad) interchange format.

W3C RDF 1.1 N-Quads: one statement per line, ``<s> <p> o <g> .`` with the
graph label optional (a label-less line is a default-graph triple, exactly
N-Triples). The engine models quads as a ``graph`` column beside the
canonical (subj, pred, obj, obj_kind) schema — the same quad-on-triple
encoding ``kg_named_graph_query`` compiles through, now round-trippable on
the wire. Like N-Triples (and unlike Turtle), the format is
line-splittable: a 100 TB dump reads back with per-file parallelism and
byte-range line splits.

Reuses ``ntriples``'s IRI-ification, escaping and datatype mapping so the
two formats stay lexically identical where they overlap.
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import ray.data as rd

from .ntriples import (
    XSD,
    _KIND_TO_XSD,
    _XSD_TO_KIND,
    _esc,
    _iri,
    _un_iri,
    _unesc,
)

_QLINE = re.compile(
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^<([^>]*)>)?)(?: <([^>]*)>)? \.$"
)

DEFAULT_GRAPH = ""


def render_quad_lines(batch: pa.Table) -> pa.Table:
    """(subj, pred, obj, obj_kind[, graph]) rows -> one N-Quads line per
    row; a null/empty graph renders as a default-graph (N-Triples) line."""
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    kinds = batch.column("obj_kind").to_pylist()
    graphs = (
        batch.column("graph").to_pylist()
        if "graph" in batch.column_names
        else [None] * batch.num_rows
    )
    lines = []
    for s, p, o, k, g in zip(subs, preds, objs, kinds, graphs):
        if k == "iri":
            ot = f"<{_iri(o)}>"
        elif k in _KIND_TO_XSD:
            ot = f'"{_esc(o)}"^^<{XSD}{_KIND_TO_XSD[k]}>'
        else:
            ot = f'"{_esc(o)}"'
        gt = f" <{_iri(g)}>" if g else ""
        lines.append(f"<{_iri(s)}> <{_iri(p)}> {ot}{gt} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def parse_quad_lines(batch: pa.Table, *, line_col: str = "text") -> pa.Table:
    """N-Quads lines -> (subj, pred, obj, obj_kind, graph) rows; the graph
    column is '' for default-graph lines (N-Triples input parses too)."""
    subs, preds, objs, kinds, graphs = [], [], [], [], []
    for line in batch.column(line_col).to_pylist():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _QLINE.match(line)
        if not m:
            raise ValueError(f"malformed N-Quads line: {line[:120]!r}")
        s, p, o_iri, o_lit, dtype, g = m.groups()
        subs.append(_un_iri(s))
        preds.append(_un_iri(p))
        if o_iri is not None:
            objs.append(_un_iri(o_iri))
            kinds.append("iri")
        else:
            objs.append(_unesc(o_lit))
            if dtype:
                kinds.append(
                    _XSD_TO_KIND.get(dtype[len(XSD):], "string")
                    if dtype.startswith(XSD)
                    else "string"
                )
            else:
                kinds.append("string")
        graphs.append(_un_iri(g) if g else DEFAULT_GRAPH)
    return pa.table(
        {
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "obj_kind": pa.array(kinds, pa.string()),
            "graph": pa.array(graphs, pa.string()),
        }
    )


def write_nquads(quads: rd.Dataset, out_dir: str) -> int:
    """Distributed N-Quads dump: one content-hash-named ``part-<sha>.nq``
    per block (idempotent re-runs, append-safe — same contract as
    ``write_ntriples``). Returns the number of files."""
    os.makedirs(out_dir, exist_ok=True)
    rendered = quads.map_batches(render_quad_lines, batch_format="pyarrow")

    def _dump(batch: pa.Table) -> pa.Table:
        body = ("\n".join(batch.column("line").to_pylist()) + "\n").encode()
        name = f"part-{hashlib.sha256(body).hexdigest()[:16]}.nq"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name], pa.string())})

    return len(rendered.map_batches(_dump, batch_format="pyarrow").take_all())


def read_nquads(path: str) -> rd.Dataset:
    """N-Quads dump -> (subj, pred, obj, obj_kind, graph) rows — per-file
    parallel + line-splittable like every text source."""
    return rd.read_text(path).map_batches(parse_quad_lines, batch_format="pyarrow")
