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

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TEXT_RE = r"<p>(?P<t>[\s\S]*?)</p>"


def extract_text(pages: rd.Dataset, out_col: str = "text_extracted") -> rd.Dataset:
    """Add ``text_extracted`` — contents of the page's first <p> block.

    Vectorized RE2 via pyarrow.compute; html stays binary (zero-copy batch),
    decoded only inside the kernel.
    """

    def _extract(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column("html"), pa.string())
        st = pc.extract_regex(html, TEXT_RE)
        txt = pc.struct_field(st, "t")
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, txt)

    return pages.map_batches(_extract, batch_format="pyarrow")


class MentionExtractor:
    """Actor-pool callable: compiled patterns live for the actor's lifetime
    (once per worker, not once per batch)."""

    CUSTOMER_FACT = (
        r'<li data-e="customer"><b>(Customer#\d+)</b> maintains an account '
        r"balance of <span>([^<]*)</span> and is based in <i>([^<]+)</i>\.</li>"
    )
    NATION_FACT = r'<li data-e="nation"><i>([^<]+)</i> is part of <i>([^<]+)</i>\.</li>'

    def __init__(self) -> None:
        self._cust = re.compile(self.CUSTOMER_FACT)
        self._nation = re.compile(self.NATION_FACT)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        out_url: list[str] = []
        out_s: list[str] = []
        out_p: list[str] = []
        out_o: list[str] = []
        out_k: list[str] = []
        for url, html in zip(urls, htmls):
            h = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
            for cust, bal, nat in self._cust.findall(h):
                if bal:
                    out_url.append(url)
                    out_s.append(cust)
                    out_p.append("hasAccountBalance")
                    out_o.append(bal)
                    out_k.append("double")
                out_url.append(url)
                out_s.append(cust)
                out_p.append("basedIn")
                out_o.append(nat)
                out_k.append("mention")
            for nat, reg in self._nation.findall(h):
                out_url.append(url)
                out_s.append(nat)
                out_p.append("partOf")
                out_o.append(reg)
                out_k.append("mention")
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "subj": pa.array(out_s, pa.string()),
                "pred": pa.array(out_p, pa.string()),
                "obj": pa.array(out_o, pa.string()),
                "obj_kind": pa.array(out_k, pa.string()),
            }
        )


def extract_mentions(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
) -> rd.Dataset:
    """Mention-level triples via the extractor actor pool. Small batches —
    pages carry MB-scale html; project html away right after this stage."""
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, cpus // 4), max(4, cpus))
    return pages.map_batches(
        MentionExtractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
