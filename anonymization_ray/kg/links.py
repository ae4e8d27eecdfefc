"""Web-link-graph construction — href extraction, URL canonicalization,
host-graph and anchor-text aggregation over crawled pages.

The reference engine has no crawl surface (its graph is the request's RDF
model, `AnonymizationService.java:139-149`); at web scale the hyperlink
graph IS the backbone of KG construction (entity popularity, crawl
frontier, anchor-text evidence), so this family is first-class here:

- ``extract_links``: ``<a href>`` edges out of raw html — the same
  fully-vectorized split+``extract_regex`` shape as
  ``kg/extract.MentionExtractor`` (one RE2 pass over flattened fragments,
  page urls follow via ``list_parent_indices``; no per-page Python).
- ``canonicalize_urls``: the crawl-dedup normalizer (lowercase scheme/host,
  default-port strip, fragment drop, tracking-param removal, root-relative
  resolution). Vectorized Arrow kernels except the query-string param
  filter, which runs over the batch's UNIQUE query strings only (the same
  vocabulary-bounded idiom as ``extras/dedup.simhash_signatures`` — query
  strings repeat massively in web data).
- ``host_graph`` / ``anchor_stats``: aggregations over the edge stream
  built from ``exact_value_counts`` / ``distinct_rows`` / ``min_per_key``
  sort-scan folds — no Ray groupby at any cardinality.

Test fixture: ``linked_pages`` appends a deterministic ``<nav>`` block to
the synthesized page corpus (three links per page, pure doc_id arithmetic,
mirrored exactly in the DuckDB oracles in ``queries_extras8.py``). The nav
sits outside the first ``<p>`` and contains no ``<li `` opener, so the
text-extraction invariant and mention extraction are untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

# --------------------------------------------------------------------------
# fixture: deterministic link synthesis (mirrored in SQL oracles)
# --------------------------------------------------------------------------

# per page d (n = corpus size): three outlinks with deliberately messy
# surface forms so the canonicalizer has real work to do
#   j=0  t=(31d+7)%n   root-relative            /doc/<t>
#   j=1  t=(17d+3)%n   shouty absolute + port + tracking param
#                      HTTPS://EXAMPLE.ORG:443/doc/<t>?utm_source=feed&id=<t>
#   j=2  t=(53d+11)%n  subdomain + fragment     https://h<t%8>.example.org/doc/<t>#s
_LINK_COEF = ((31, 7), (17, 3), (53, 11))


def _nav_block(doc_id: int, n_docs: int) -> str:
    t0 = (_LINK_COEF[0][0] * doc_id + _LINK_COEF[0][1]) % n_docs
    t1 = (_LINK_COEF[1][0] * doc_id + _LINK_COEF[1][1]) % n_docs
    t2 = (_LINK_COEF[2][0] * doc_id + _LINK_COEF[2][1]) % n_docs
    return (
        f'<nav><a href="/doc/{t0}">ref {t0}</a>'
        f'<a href="HTTPS://EXAMPLE.ORG:443/doc/{t1}?utm_source=feed&id={t1}">see {t1}</a>'
        f'<a href="https://h{t2 % 8}.example.org/doc/{t2}#s">doc {t2}</a></nav>'
    )


def linked_pages(sf_dir: str) -> rd.Dataset:
    """``kg.pages.synthesize_pages`` with the deterministic nav block spliced
    in before ``</body>``. Fixture generator (per-row Python is fine here,
    as in ``pages._render``); the ENGINE stages below are vectorized."""
    from .pages import synthesize_pages

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def _add_nav(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        out = []
        for u, h in zip(urls, htmls):
            did = int(u.rsplit("/", 1)[1])
            out.append(
                h.replace(b"</body>", _nav_block(did, n_docs).encode() + b"</body>")
            )
        return batch.set_column(
            batch.column_names.index("html"), "html", pa.array(out, pa.binary())
        )

    return synthesize_pages(sf_dir).map_batches(_add_nav, batch_format="pyarrow")


# --------------------------------------------------------------------------
# engine: href extraction
# --------------------------------------------------------------------------

_HREF_RE = r'^(?P<href>[^"]*)">(?P<anchor>[^<]*)</a>'

_EDGE_SCHEMA = pa.schema(
    [("src_url", pa.string()), ("href", pa.string()), ("anchor", pa.string())]
)


def extract_links(pages: rd.Dataset) -> rd.Dataset:
    """(src_url, href, anchor) — every ``<a href="...">text</a>`` in every
    page. One ``split_pattern`` + one RE2 ``extract_regex`` over the
    flattened fragments per batch; page urls via ``list_parent_indices``."""

    def _extract(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column("html"), pa.string())
        frags = pc.split_pattern(html, '<a href="')
        flat = pc.list_flatten(frags).combine_chunks()
        srcs = batch.column("url").combine_chunks().take(
            pc.list_parent_indices(frags)
        )
        m = pc.extract_regex(flat, _HREF_RE)
        keep = pc.is_valid(m)
        mm = m.filter(keep)
        if len(mm) == 0:
            return _EDGE_SCHEMA.empty_table()
        return pa.table(
            {
                "src_url": srcs.filter(keep),
                "href": pc.struct_field(mm, "href"),
                "anchor": pc.struct_field(mm, "anchor"),
            }
        ).cast(_EDGE_SCHEMA)

    return pages.map_batches(_extract, batch_format="pyarrow")


# --------------------------------------------------------------------------
# engine: URL canonicalization
# --------------------------------------------------------------------------

_BASE_RE = r"^(?P<sh>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
_URL_PARTS_RE = (
    r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<h>[^/?#]*)"
    r"(?P<p>[^?#]*)(?P<q>\?[^#]*)?(?:#.*)?$"
)


def _filter_query(q: str, drop_prefixes: tuple[str, ...]) -> str:
    """'?a=1&utm_x=2' -> '?a=1' (param order preserved; all params dropped
    -> empty string). Runs only on UNIQUE query strings per batch."""
    if not q:
        return ""
    kept = [
        p
        for p in q[1:].split("&")
        if p and not any(p.startswith(d) for d in drop_prefixes)
    ]
    return "?" + "&".join(kept) if kept else ""


def canonicalize_urls(
    ds: rd.Dataset,
    href_col: str,
    base_col: str,
    out_col: str = "dst_url",
    *,
    drop_param_prefixes: tuple[str, ...] = ("utm_",),
) -> rd.Dataset:
    """Add ``out_col`` — the canonical absolute form of ``href_col``:

    - root-relative hrefs (``/path``) resolve against ``base_col``'s
      scheme://host (itself lowercased)
    - scheme and host lowercase; default ports stripped (http:80, https:443)
    - fragment dropped; empty path becomes ``/``
    - query params with a ``drop_param_prefixes`` prefix removed (order of
      survivors preserved; tracking-param hygiene a la ClueWeb/CC dedup)

    Protocol-relative hrefs (``//host/path``) inherit the base's scheme
    (browser behavior). Hrefs that are none of absolute / root-relative /
    protocol-relative (``../`` paths, ``mailto:``) canonicalize to null —
    the crawl-frontier convention: only resolvable http(s) edges enter the
    graph."""

    def _canon(batch: pa.Table) -> pa.Table:
        href = pc.fill_null(batch.column(href_col).combine_chunks(), "")
        base = pc.fill_null(batch.column(base_col).combine_chunks(), "")
        base_sh = pc.utf8_lower(
            pc.fill_null(
                pc.struct_field(pc.extract_regex(base, _BASE_RE), "sh"), ""
            )
        )
        base_scheme = pc.replace_substring_regex(
            base_sh, r"://.*$", "", max_replacements=1
        )
        is_proto_rel = pc.starts_with(href, "//")
        is_rel = pc.and_(pc.starts_with(href, "/"), pc.invert(is_proto_rel))
        absu = pc.if_else(
            is_rel, pc.binary_join_element_wise(base_sh, href, ""), href
        )
        absu = pc.if_else(
            is_proto_rel,
            pc.binary_join_element_wise(base_scheme, ":", href, ""),
            absu,
        )
        m = pc.extract_regex(absu, _URL_PARTS_RE)
        valid = pc.is_valid(m)
        scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(m, "s"), ""))
        host = pc.utf8_lower(pc.fill_null(pc.struct_field(m, "h"), ""))
        host = pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(host, r":443$", ""),
            host,
        )
        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, r":80$", ""),
            host,
        )
        path = pc.fill_null(pc.struct_field(m, "p"), "")
        path = pc.if_else(pc.equal(path, ""), "/", path)
        # query-param filter over the unique query strings only
        qarr = pc.fill_null(pc.struct_field(m, "q"), "").to_numpy(
            zero_copy_only=False
        )
        codes, uniq = pd.factorize(qarr)
        fq = np.array(
            [_filter_query(u, drop_param_prefixes) for u in uniq], dtype=object
        )[codes] if len(uniq) else np.array([], dtype=object)
        canon = pc.binary_join_element_wise(
            scheme, pa.array(["://"] * len(host)), host, path,
            pa.array(fq, pa.string()), "",
        )
        http_ok = pc.is_in(scheme, value_set=pa.array(["http", "https"]))
        canon = pc.if_else(pc.and_(valid, http_ok), canon, pa.nulls(len(canon), pa.string()))
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, canon)

    return ds.map_batches(_canon, batch_format="pyarrow")


def host_of(ds: rd.Dataset, url_col: str, out_col: str) -> rd.Dataset:
    """Add ``out_col`` — the host of an (already canonical) url."""

    def _host(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(batch.column(url_col).combine_chunks(), "")
        m = pc.extract_regex(u, r"^[a-z][a-z0-9+.\-]*://(?P<h>[^/?#]*)")
        h = pc.struct_field(m, "h")
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, h)

    return ds.map_batches(_host, batch_format="pyarrow")


# --------------------------------------------------------------------------
# engine: graph-level aggregations (sort-scan folds, no Ray groupby)
# --------------------------------------------------------------------------

def host_graph(edges: rd.Dataset) -> rd.Dataset:
    """(src_host, dst_host, n_links) from canonical (src_url, dst_url)
    edges. Hosts fold via ``exact_value_counts`` over a tab-joined pair key
    (per-batch partials + one narrow sort-scan; host-pair cardinality is
    tiny relative to edges, but the fold is exact at ANY cardinality)."""
    from ..extras.stats import exact_value_counts

    e = host_of(edges, "src_url", "src_host")
    e = host_of(e, "dst_url", "dst_host")

    def _pair(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.fill_null(batch.column("src_host"), ""),
            pc.fill_null(batch.column("dst_host"), ""),
            "\t",
        )
        return pa.table({"pair": k})

    counts = exact_value_counts(e.map_batches(_pair, batch_format="pyarrow"), "pair")

    def _split(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("pair"), "\t")
        return pa.table(
            {
                "src_host": pc.list_element(parts, 0),
                "dst_host": pc.list_element(parts, 1),
                "n_links": batch.column("n"),
            }
        )

    return counts.map_batches(_split, batch_format="pyarrow")


def anchor_stats(edges: rd.Dataset) -> rd.Dataset:
    """Per canonical dst_url: in-link count, distinct anchor-text count and
    the lexicographically first anchor (the anchor-text evidence table that
    feeds entity naming in web-KG construction). Three narrow sort-scan
    folds (``exact_value_counts`` / ``distinct_rows`` + ``min_per_key``)
    joined on the url key — no per-group UDF anywhere."""
    from ..extras.stats import exact_value_counts
    from ..util import distinct_rows, hash_join, min_per_key

    def _drop_null_dst(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("dst_url")))

    narrow = edges.select_columns(["dst_url", "anchor"]).map_batches(
        _drop_null_dst, batch_format="pyarrow"
    )
    inlinks = exact_value_counts(
        narrow.select_columns(["dst_url"]), "dst_url"
    ).rename_columns(["dst_url", "n_inlinks"])
    pairs = distinct_rows(narrow, ["dst_url", "anchor"])
    n_anchors = exact_value_counts(
        pairs.select_columns(["dst_url"]), "dst_url"
    ).rename_columns(["dst_url", "n_anchors"])
    top = min_per_key(pairs, "dst_url", "anchor").rename_columns(
        ["dst_url", "top_anchor"]
    )
    out = hash_join(inlinks, n_anchors, on="dst_url", join_type="inner")
    return hash_join(out, top, on="dst_url", join_type="inner")
