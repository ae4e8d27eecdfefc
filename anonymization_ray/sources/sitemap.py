"""XML sitemap source — crawl-frontier ingestion (sitemaps.org protocol).

Sitemaps are how sites advertise their url inventory to crawlers; a
crawl pipeline ingests them to seed/refresh its frontier next to link
discovery (`kg_crawl_frontier`). This source handles the ``<urlset>``
document shape (``<url><loc/><lastmod/><priority/></url>`` entries) and
the ``<sitemapindex>`` shape (``<sitemap><loc/></sitemap>`` pointing at
child sitemaps, returned as rows for the fetch scheduler to follow —
this container has no network, so following them is the caller's job).

Ray shape mirrors the WARC source contract: ``read_binary_files``
parallelizes per file; inside a task the payload parses VECTORIZED —
one ``split_pattern`` on the entry tag, then Arrow ``extract_regex``
(RE2) per field over the flattened entry array. No XML DOM, no Python
loop over entries: the subset grammar sitemaps actually use (no nested
url elements, fields in any order) is regular. ``priority`` lands as
exact integer micro-units; ``lastmod`` parses W3C datetimes to
timestamp[us] (date-only forms get midnight)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_LOC_RE = r"<loc>\s*(?P<loc>[^<\s][^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*(?P<lastmod>[^<]+?)\s*</lastmod>"
_PRIORITY_RE = r"<priority>\s*(?P<priority>[0-9.]+)\s*</priority>"

# XML entity escaping for <loc> values (the spec REQUIRES escaping; a raw
# '&' in a query string is invalid XML). & first on escape, last on
# unescape, so the passes compose without double-translation.
_XML_ESCAPES = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                ("'", "&apos;"), ('"', "&quot;"))


def _xml_escape(arr):
    for raw, ent in _XML_ESCAPES:
        arr = pc.replace_substring(arr, raw, ent)
    return arr


def _xml_unescape(arr):
    for raw, ent in reversed(_XML_ESCAPES):
        arr = pc.replace_substring(arr, ent, raw)
    return arr


def _entries(xml: pa.Array, tag: str) -> pa.Array:
    parts = pc.split_pattern(xml, f"<{tag}>")
    flat = pc.list_flatten(pc.list_slice(parts, 1, None))
    # keep only the element body (terminator optional on the last chunk)
    return pc.list_element(pc.split_pattern(flat, f"</{tag}>"), 0)


def read_sitemaps(paths: str | list[str]) -> rd.Dataset:
    """Sitemap file(s)/dir -> Dataset[(url, lastmod, priority_micro)].

    ``<sitemapindex>`` child locations are emitted too, flagged with
    ``is_index=True`` so a scheduler can expand them."""
    ds = rd.read_binary_files(paths, file_extensions=["xml"])

    def _parse(batch: pa.Table) -> pa.Table:
        xml = pc.cast(batch.column("bytes"), pa.string())
        urls = _entries(xml, "url")
        locs = _xml_unescape(
            pc.struct_field(pc.extract_regex(urls, _LOC_RE), "loc")
        )
        lastmod = pc.struct_field(
            pc.extract_regex(urls, _LASTMOD_RE), "lastmod"
        )
        # date-only W3C forms -> midnight; fractional seconds truncated
        # (W3C allows them; strptime %S does not) — second resolution is
        # what sitemap lastmods mean in practice
        lm = pc.cast(
            pc.strptime(
                pc.replace_substring_regex(
                    pc.replace_substring_regex(
                        pc.fill_null(lastmod, ""),
                        r"^(\d{4}-\d{2}-\d{2})$",
                        r"\1T00:00:00Z",
                    ),
                    r"\.\d+",
                    "",
                ),
                format="%Y-%m-%dT%H:%M:%S%z",
                unit="us",
                error_is_null=True,
            ),
            pa.timestamp("us"),
        )
        prio = pc.struct_field(pc.extract_regex(urls, _PRIORITY_RE), "priority")
        prio_micro = pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(pc.fill_null(prio, "0.5"), pa.float64()),
                    pa.scalar(1_000_000.0),
                )
            ),
            pa.int64(),
        )
        n_urls = len(locs)

        idx_entries = _entries(xml, "sitemap")
        idx_locs = _xml_unescape(
            pc.struct_field(pc.extract_regex(idx_entries, _LOC_RE), "loc")
        )
        n_idx = len(idx_locs)

        out = pa.table(
            {
                "url": pa.concat_arrays(
                    [locs.combine_chunks() if isinstance(locs, pa.ChunkedArray) else locs,
                     idx_locs.combine_chunks() if isinstance(idx_locs, pa.ChunkedArray) else idx_locs]
                ),
                "lastmod": pa.concat_arrays(
                    [lm.combine_chunks() if isinstance(lm, pa.ChunkedArray) else lm,
                     pa.nulls(n_idx, pa.timestamp("us"))]
                ),
                "priority_micro": pa.concat_arrays(
                    [prio_micro.combine_chunks() if isinstance(prio_micro, pa.ChunkedArray) else prio_micro,
                     pa.nulls(n_idx, pa.int64())]
                ),
                "is_index": pa.array(
                    [False] * n_urls + [True] * n_idx, pa.bool_()
                ),
            }
        )
        # malformed entries without a <loc> carry no url — drop them
        return out.filter(pc.is_valid(out.column("url")))

    return ds.map_batches(_parse, batch_format="pyarrow")


def write_sitemap_shards(
    ds: rd.Dataset,
    out_dir: str,
    *,
    url_col: str = "url",
    lastmod_col: str | None = None,
    priority_micro_col: str | None = None,
) -> pa.Table:
    """One ``<urlset>`` shard per block (content-hash filenames — retry
    idempotent, same contract as `sources/arrowfmt.py`); returns the
    (path, rows) manifest."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        urls = pc.cast(batch.column(url_col), pa.string())
        loc = pc.binary_join_element_wise(
            pa.scalar("<loc>"), _xml_escape(urls), pa.scalar("</loc>"),
            pa.scalar(""),
        )
        if lastmod_col:
            # cast to second resolution first: Arrow's %S would otherwise
            # print fractional digits, which are noise at lastmod precision
            lm = pc.strftime(
                pc.cast(
                    pc.floor_temporal(
                        batch.column(lastmod_col), unit="second"
                    ),
                    pa.timestamp("s"),
                ),
                format="%Y-%m-%dT%H:%M:%SZ",
            )
            lm_part = pc.if_else(
                pc.is_valid(lm),
                pc.binary_join_element_wise(
                    pa.scalar("<lastmod>"),
                    pc.fill_null(lm, ""),
                    pa.scalar("</lastmod>"),
                    pa.scalar(""),
                ),
                pa.scalar(""),
            )
        else:
            lm_part = pa.scalar("")
        if priority_micro_col:
            # priority is one-decimal by convention; round micro-units to
            # tenths and format w.t exactly (no float printf)
            pr = batch.column(priority_micro_col)
            tenths = pc.cast(
                pc.round(pc.divide(pc.cast(pr, pa.float64()), 100_000.0)),
                pa.int64(),
            )
            pr_str = pc.binary_join_element_wise(
                pc.cast(pc.divide(tenths, 10), pa.string()),
                pc.cast(
                    pc.subtract(tenths, pc.multiply(pc.divide(tenths, 10), 10)),
                    pa.string(),
                ),
                pa.scalar("."),
            )
            pr_part = pc.if_else(
                pc.is_valid(pr),
                pc.binary_join_element_wise(
                    pa.scalar("<priority>"),
                    pc.fill_null(pr_str, ""),
                    pa.scalar("</priority>"),
                    pa.scalar(""),
                ),
                pa.scalar(""),
            )
        else:
            pr_part = pa.scalar("")
        rows = pc.binary_join_element_wise(
            pa.scalar("<url>"), loc, lm_part, pr_part, pa.scalar("</url>"),
            pa.scalar(""),
        )
        rows_arr = (
            rows.combine_chunks() if isinstance(rows, pa.ChunkedArray) else rows
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(rows_arr)], pa.int32()), rows_arr
            ),
            pa.scalar("\n"),
        )[0].as_py()
        body = "\n".join(
            [
                "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
                "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">",
                joined,
                "</urlset>",
            ]
        )
        payload = body.encode()
        name = hashlib.sha1(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}.xml")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path], pa.string()),
             "rows": pa.array([batch.num_rows], pa.int64())}
        )

    import ray

    man = ds.map_batches(_write, batch_format="pyarrow")
    return pa.concat_tables(
        [t for t in ray.get(man.to_arrow_refs())]
    )
