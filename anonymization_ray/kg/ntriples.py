"""N-Triples serialization of the triple Dataset (W3C RDF 1.1 N-Triples).

The reference materializes its graph through Jena, whose wire formats are
the RDF serializations; this repo's native layouts are sorted Parquet
(``materialize.py``), and N-Triples is the interchange path: one triple per
line, ``<s> <p> o .``, so the format is line-splittable — a 100 TB dump
reads back with per-file parallelism and byte-range line splits, the same
property the WARC/JSONL sources exploit.

Mapping (deterministic both ways):
- ``subj`` / ``pred`` are IRI-ified with the vocabulary base when they are
  not already absolute IRIs (``urn:cust:3`` stays; ``basedIn`` becomes
  ``https://example.org/voc#basedIn``);
- ``obj_kind == 'iri'`` serializes as an IRI ref, everything else as a
  literal; non-string kinds carry an ``^^<xsd:...>`` datatype suffix and
  round-trip back into the same ``obj_kind``;
- literal escaping per the spec's ECHAR set (``\\`` ``\"`` ``\\n`` ``\\r``
  ``\\t``).

Writer: stateless ``map_batches`` renders lines; each block lands as one
``part-<sha>.nt`` file named by content hash — deterministic, append-safe,
and a crashed writer re-run overwrites the same file instead of duplicating
rows. Reader: ``ray.data.read_text`` + a compiled-regex line parser.
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import ray.data as rd

VOC_BASE = "https://example.org/voc#"
XSD = "http://www.w3.org/2001/XMLSchema#"
_KIND_TO_XSD = {"double": "double", "integer": "integer", "date": "date",
                "dateTime": "dateTime", "boolean": "boolean"}
_XSD_TO_KIND = {v: k for k, v in _KIND_TO_XSD.items()}

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_LINE = re.compile(
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^<([^>]*)>)?) \.$"
)
_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _iri(term: str) -> str:
    return term if _ABS_IRI.match(term) else VOC_BASE + term


def _un_iri(iri: str) -> str:
    return iri[len(VOC_BASE):] if iri.startswith(VOC_BASE) else iri


def _esc(lit: str) -> str:
    return "".join(_ESC.get(ch, ch) for ch in lit)


def _unesc(lit: str) -> str:
    return re.sub(r"\\[\\\"nrt]", lambda m: _UNESC[m.group(0)], lit)


def render_lines(batch: pa.Table) -> pa.Table:
    """(subj, pred, obj, obj_kind) rows -> one N-Triples line per row."""
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    kinds = batch.column("obj_kind").to_pylist()
    lines = []
    for s, p, o, k in zip(subs, preds, objs, kinds):
        if k == "iri":
            ot = f"<{_iri(o)}>"
        elif k in _KIND_TO_XSD:
            ot = f'"{_esc(o)}"^^<{XSD}{_KIND_TO_XSD[k]}>'
        else:
            ot = f'"{_esc(o)}"'
        lines.append(f"<{_iri(s)}> <{_iri(p)}> {ot} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def parse_lines(batch: pa.Table, *, line_col: str = "text") -> pa.Table:
    """N-Triples lines -> (subj, pred, obj, obj_kind) rows; blank lines and
    ``#`` comments skipped, anything else malformed raises."""
    subs, preds, objs, kinds = [], [], [], []
    for line in batch.column(line_col).to_pylist():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE.match(line)
        if not m:
            raise ValueError(f"malformed N-Triples line: {line[:120]!r}")
        s, p, o_iri, o_lit, dtype = m.groups()
        subs.append(_un_iri(s))
        preds.append(_un_iri(p))
        if o_iri is not None:
            objs.append(_un_iri(o_iri))
            kinds.append("iri")
        else:
            objs.append(_unesc(o_lit))
            if dtype:
                kinds.append(_XSD_TO_KIND.get(dtype[len(XSD):], "string")
                             if dtype.startswith(XSD) else "string")
            else:
                kinds.append("string")
    return pa.table(
        {
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "obj_kind": pa.array(kinds, pa.string()),
        }
    )


def write_ntriples(triples: rd.Dataset, out_dir: str) -> int:
    """Distributed N-Triples dump: one ``part-<sha>.nt`` per block, named by
    content hash (idempotent re-runs). Returns the number of files."""
    os.makedirs(out_dir, exist_ok=True)
    rendered = triples.map_batches(render_lines, batch_format="pyarrow")

    def _dump(batch: pa.Table) -> pa.Table:
        body = ("\n".join(batch.column("line").to_pylist()) + "\n").encode()
        name = f"part-{hashlib.sha256(body).hexdigest()[:16]}.nt"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name], pa.string())})

    return len(rendered.map_batches(_dump, batch_format="pyarrow").take_all())


def read_ntriples(path: str) -> rd.Dataset:
    """Read an N-Triples dump back into (subj, pred, obj, obj_kind) rows —
    per-file parallel, line-splittable like every text source."""
    return rd.read_text(path).map_batches(parse_lines, batch_format="pyarrow")
