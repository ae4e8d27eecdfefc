"""Turtle (W3C RDF 1.1 Turtle) reader — the last reference input format.

The reference ships Turtle example inputs (``exampleInputs/*.ttl``) that
Jena would read via ``RDFDataMgr``; this engine reads N-Triples
(``ntriples.py``) and JSON-LD (``sources/jsonld.py``) but until now not the
abbreviated Turtle syntax. Honest subset covering the full RDF 1.1 Turtle
core grammar minus three constructs that REFUSE loudly (long ``\"\"\"``
strings, ``[ p o ]`` anonymous property lists, ``( ... )`` collections —
none appear in the reference corpus):

- ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE`` directives;
- prefixed names (kept in their COMPACT ``pfx:local`` spelling, matching
  ``parse_jsonld``'s convention; ``expand=True`` resolves them through the
  collected prefix map), ``<IRI>`` refs, ``a`` -> rdf:type;
- ``;`` predicate lists, ``,`` object lists, ``#`` comments;
- literals: escaped ``"..."`` strings, ``@lang`` tags (kind 'string'),
  ``^^`` datatypes (kind = the datatype's local name — same mapping as
  ``parse_jsonld.literal_kind``), bare numerics (integer / decimal /
  double by exponent) and booleans;
- ``_:label`` blank nodes and bare ``[]`` (fresh blank node).

Scale note: Turtle is NOT line-splittable — prefixes are document-global
and statements span lines — so this is a REQUEST-scale interchange reader
(per-FILE parallelism via ``read_turtle_files``); bulk triple exchange at
corpus scale goes through sorted Parquet (``materialize.py``) or N-Triples
(byte-range splittable), as documented there.

Reference analog: Jena ``RDFDataMgr.read`` dispatch on content type
(``AnonymizationService.java:139-149``).
"""

from __future__ import annotations

import re

import pyarrow as pa

RDF_TYPE = "rdf:type"

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<longstr>\"\"\"|''')
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<sstring>'(?:[^'\\\n]|\\.)*')
    | (?P<dtype>\^\^)
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<punct>[;,\[\]()])
    | (?P<name>[^\s;,\[\]()"'<@]+)
    """,
    re.X,
)

_UNESC = re.compile(r"\\(.)")
_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", '"': '"', "'": "'", "\\": "\\",
            "b": "\b", "f": "\f"}

_INTEGER = re.compile(r"^[+-]?\d+$")
_DECIMAL = re.compile(r"^[+-]?\d*\.\d+$")
_DOUBLE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _unescape(s: str) -> str:
    return _UNESC.sub(lambda m: _ESCAPES.get(m.group(1), m.group(1)), s)


def _tokenize(text: str) -> list[str]:
    out: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"turtle: cannot tokenize at offset {pos}: "
                             f"{text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "longstr":
            raise NotImplementedError(
                "turtle: long (triple-quoted) literals are outside the "
                "honest subset — re-serialize as escaped single-line strings"
            )
        tok = m.group()
        if kind == "name":
            # a statement-terminating '.' glues onto the preceding token
            # when unspaced (PN_LOCAL and numeric literals cannot END with
            # '.'), so split trailing dots off as punctuation
            while tok.endswith(".") and tok != ".":
                out.append(tok[:-1])
                out.append(".")
                break
            else:
                out.append(tok)
            continue
        out.append(tok)
    return out


def parse_turtle(text: str, *, expand: bool = False) -> pa.Table:
    """Turtle document -> (subj, pred, obj, obj_kind) table (the engine's
    canonical triple schema, identical to ``parse_jsonld``'s output)."""
    toks = _tokenize(text)
    prefixes: dict[str, str] = {}
    base = [""]
    rows: list[tuple[str, str, str, str]] = []
    bnode = [0]
    i = 0

    def resolve(tok: str) -> str:
        """Term token -> engine spelling (compact by default)."""
        if tok.startswith("<"):
            iri = tok[1:-1]
            if base[0] and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = base[0] + iri
            return iri
        if tok == "a":
            return RDF_TYPE if not expand else (
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
        if tok.startswith("_:"):
            return tok
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if expand and pfx in prefixes:
                return prefixes[pfx] + local
            return tok
        raise ValueError(f"turtle: expected IRI / prefixed name, got {tok!r}")

    def literal(tok: str, j: int) -> tuple[str, str, int]:
        """-> (lexical, kind, next index)."""
        if tok.startswith('"') or tok.startswith("'"):
            lex = _unescape(tok[1:-1])
            if j < len(toks) and toks[j] == "^^":
                dt = toks[j + 1]
                dt_iri = resolve(dt) if dt.startswith("<") else dt
                local = dt_iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                local = local.split(":", 1)[-1]
                return lex, local, j + 2
            if j < len(toks) and toks[j].startswith("@"):
                return lex, "string", j + 1
            return lex, "string", j
        if tok in ("true", "false"):
            return tok, "boolean", j
        if _INTEGER.match(tok):
            return tok, "integer", j
        if _DECIMAL.match(tok):
            return tok, "decimal", j
        if _DOUBLE.match(tok):
            return repr(float(tok)), "double", j
        raise ValueError(f"turtle: unparseable object token {tok!r}")

    def obj_term(j: int, sid: str, pred: str) -> int:
        tok = toks[j]
        if tok == "[":
            if j + 1 < len(toks) and toks[j + 1] == "]":
                bnode[0] += 1
                rows.append((sid, pred, f"_:a{bnode[0]}", "iri"))
                return j + 2
            raise NotImplementedError(
                "turtle: anonymous property lists [ p o ] are outside the "
                "honest subset — name the node with _:label instead"
            )
        if tok == "(":
            raise NotImplementedError(
                "turtle: collections ( ... ) are outside the honest subset "
                "— serialize rdf:first/rdf:rest chains explicitly"
            )
        if tok.startswith(("<", "_:")) or (
            ":" in tok
            and not tok.startswith(('"', "'"))
            and not _DOUBLE.match(tok)
        ):
            rows.append((sid, pred, resolve(tok), "iri"))
            return j + 1
        lex, kind, j2 = literal(tok, j + 1)
        rows.append((sid, pred, lex, kind))
        return j2

    while i < len(toks):
        tok = toks[i]
        low = tok.lower()
        if low in ("@prefix", "prefix"):
            pfx = toks[i + 1]
            if not pfx.endswith(":"):
                raise ValueError(f"turtle: bad prefix declaration {pfx!r}")
            prefixes[pfx[:-1]] = toks[i + 2][1:-1]
            i += 3
            if i < len(toks) and toks[i] == ".":
                i += 1  # @prefix ends with '.', SPARQL PREFIX does not
            continue
        if low in ("@base", "base"):
            base[0] = toks[i + 1][1:-1]
            i += 2
            if i < len(toks) and toks[i] == ".":
                i += 1
            continue
        # statement: subject predicate-object list '.'
        if tok == "[":
            if i + 1 < len(toks) and toks[i + 1] == "]":
                bnode[0] += 1
                sid = f"_:a{bnode[0]}"
                i += 2
            else:
                raise NotImplementedError(
                    "turtle: anonymous property lists [ p o ] are outside "
                    "the honest subset"
                )
        else:
            sid = resolve(tok)
            i += 1
        while True:
            pred = resolve(toks[i])
            i += 1
            while True:
                i = obj_term(i, sid, pred)
                if i < len(toks) and toks[i] == ",":
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ";":
                i += 1
                # trailing ';' before '.' is legal
                if i < len(toks) and toks[i] == ".":
                    break
                continue
            break
        if i >= len(toks) or toks[i] != ".":
            raise ValueError(
                f"turtle: expected '.' to close statement near token {i}"
            )
        i += 1

    if not rows:
        return pa.table(
            {
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "obj_kind": pa.array([], pa.string()),
            }
        )
    s, p, o, k = zip(*rows)
    return pa.table(
        {
            "subj": pa.array(s, pa.string()),
            "pred": pa.array(p, pa.string()),
            "obj": pa.array(o, pa.string()),
            "obj_kind": pa.array(k, pa.string()),
        }
    )


def read_turtle_files(paths: list[str] | str, *, expand: bool = False):
    """Turtle file(s) -> triple Dataset, one parse task per FILE (the
    format's natural parallelism unit — see module docstring)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def _parse(b: pa.Table) -> pa.Table:
        tables = [
            parse_turtle(bytes(x).decode("utf-8"), expand=expand)
            for x in b.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables) if tables else parse_turtle("")

    return ds.map_batches(_parse, batch_format="pyarrow")
