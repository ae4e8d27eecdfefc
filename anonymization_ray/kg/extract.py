"""Text extraction + mention/triple extraction.

- ``extract_text``: stateless zero-copy ``map_batches`` over Arrow; the
  per-row invariant is byte-identical extracted text per url vs the page
  table's ``text`` column (BASELINE.json input_hint).
- ``extract_mentions``: an actor-pool stage (callable class) holding compiled
  patterns — the analog of a warm NER/gazetteer model. Emits mention-level
  triple rows ``(url, subj, pred, obj, obj_kind)`` where obj_kind is
  ``mention`` (needs linking) or a literal datatype.

Reference analog: S1/S2 parsing (AnonymizationService.java:139-149,
FaltJsonService.java:40-93) re-imagined as web-scale extraction per the north
star; the reference has no extraction stage of its own.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TEXT_RE = r"<p>(?P<t>[\s\S]*?)</p>"


def _html_utf8(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """binary html -> string, surviving invalid UTF-8 (routine in real
    crawls: mislabeled encodings, truncated multibyte sequences). Fast path
    is the zero-copy Arrow cast; only a batch that actually contains invalid
    bytes pays the per-row lossy decode (U+FFFD replacement, the same policy
    as the WARC ingestion sanitizer in pipelines/corpus.py)."""
    try:
        return pc.cast(col, pa.string())
    except pa.ArrowInvalid:
        vals = col.to_pylist()
        # chunked so downstream kernels see the same shape as the cast path
        return pa.chunked_array(
            [
                pa.array(
                    [None if v is None else v.decode("utf-8", "replace") for v in vals],
                    pa.string(),
                )
            ]
        )


def extract_text(pages: rd.Dataset, out_col: str = "text_extracted") -> rd.Dataset:
    """Add ``text_extracted`` — contents of the page's first <p> block.

    Vectorized RE2 via pyarrow.compute; html stays binary (zero-copy batch),
    decoded only inside the kernel.
    """

    def _extract(batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch.column("html"))
        st = pc.extract_regex(html, TEXT_RE)
        txt = pc.struct_field(st, "t")
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, txt)

    return pages.map_batches(_extract, batch_format="pyarrow")


_MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_kind", pa.string()),
    ]
)


class MentionExtractor:
    """Actor-pool callable; the analog of a warm NER/gazetteer model.

    Multi-match extraction stays fully vectorized: pages are split on the
    fact-element opener (``pc.split_pattern`` on ``<li ``) so every fact
    lands in its own fragment, then ONE ``pc.extract_regex`` per pattern
    runs over the flattened fragment array (RE2, C++); page urls follow via
    ``list_parent_indices``. No per-page Python — this stage bounds
    ``kg_docs_per_sec`` at crawl scale."""

    CUSTOMER_FACT = (
        r'^data-e="customer"><b>(?P<c>Customer#\d+)</b> maintains an account '
        r"balance of <span>(?P<b>[^<]*)</span> and is based in <i>(?P<n>[^<]+)</i>\.</li>"
    )
    NATION_FACT = r'^data-e="nation"><i>(?P<a>[^<]+)</i> is part of <i>(?P<r>[^<]+)</i>\.</li>'

    @staticmethod
    def _rows(urls, subj, obj, pred: str, kind: str) -> pa.Table:
        n = len(subj)
        return pa.table(
            {
                "url": urls,
                "subj": subj,
                "pred": pa.array([pred] * n, pa.string()),
                "obj": obj,
                "obj_kind": pa.array([kind] * n, pa.string()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = _html_utf8(batch.column("html"))
        frags = pc.split_pattern(html, "<li ")
        flat = pc.list_flatten(frags).combine_chunks()
        page_urls = batch.column("url").combine_chunks().take(
            pc.list_parent_indices(frags)
        )
        tables: list[pa.Table] = []

        cust = pc.extract_regex(flat, self.CUSTOMER_FACT)
        cmask = pc.is_valid(cust)
        cs, cu = cust.filter(cmask), page_urls.filter(cmask)
        if len(cs):
            subj = pc.struct_field(cs, "c")
            bal = pc.struct_field(cs, "b")
            has_bal = pc.not_equal(bal, "")
            tables.append(
                self._rows(
                    cu.filter(has_bal), subj.filter(has_bal), bal.filter(has_bal),
                    "hasAccountBalance", "double",
                )
            )
            tables.append(self._rows(cu, subj, pc.struct_field(cs, "n"), "basedIn", "mention"))

        nat = pc.extract_regex(flat, self.NATION_FACT)
        nmask = pc.is_valid(nat)
        ns, nu = nat.filter(nmask), page_urls.filter(nmask)
        if len(ns):
            tables.append(
                self._rows(nu, pc.struct_field(ns, "a"), pc.struct_field(ns, "r"), "partOf", "mention")
            )
        if not tables:
            return _MENTION_SCHEMA.empty_table()
        return pa.concat_tables(tables).cast(_MENTION_SCHEMA)


def extract_mentions(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
) -> rd.Dataset:
    """Mention-level triples via the extractor actor pool. Small batches —
    pages carry MB-scale html; project html away right after this stage."""
    if concurrency is None:
        from ..util import actor_pool_size

        concurrency = actor_pool_size(divisor=4)
    return pages.map_batches(
        MentionExtractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
