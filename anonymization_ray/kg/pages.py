"""Deterministic Common-Crawl-style page synthesis (test fixture generator).

The north rule's input is a Parquet table of web pages
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
(BASELINE.json input_hint). No such table ships with the driver's testdata, so
we synthesize it *deterministically* (a pure function of the sf tables — no
RNG, no wall clock) from ``documents`` + ``customer``/``nation``/``region``:

- one page per document; ``url = https://example.org/doc/<doc_id>``
- ``text`` = the document's text; ``html`` wraps it in ``<p>…</p>`` so the
  text-extraction invariant (byte-identical text per url) is checkable
- customer facts land on page ``c_custkey % n_docs``; nation facts on page
  ``n_nationkey % n_docs``. Nation mentions appear in one of three variant
  surface forms chosen by ``c_custkey % 3`` (exact / lower / underscores→
  spaces) so entity linking + canonicalization have real work to do.

Every choice is mirrored in the DuckDB oracles (queries_kg.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

BASE_URL = "https://example.org/doc/"
BASE_TS = 1704067200  # 2024-01-01T00:00:00Z, fixed epoch for warc_ts


def nation_variant(n_name: str, style: int) -> str:
    if style == 1:
        return n_name.lower()
    if style == 2:
        return n_name.replace("_", " ")
    return n_name


def customer_fact(c_custkey: int, c_acctbal: float | None, n_name: str) -> str:
    variant = nation_variant(n_name, c_custkey % 3)
    bal = "" if c_acctbal is None else repr(float(c_acctbal))
    return (
        f'<li data-e="customer"><b>Customer#{c_custkey}</b> maintains an account '
        f'balance of <span>{bal}</span> and is based in <i>{variant}</i>.</li>'
    )


def nation_fact(n_name: str, r_name: str) -> str:
    return f'<li data-e="nation"><i>{n_name}</i> is part of <i>{r_name}</i>.</li>'


def synthesize_pages(sf_dir: str) -> rd.Dataset:
    """Dataset of (url, warc_ts, html, text, lang) pages."""
    # fact assignment: driver-side build of page_id -> facts (dimension-scale
    # data only; the big `documents` side streams through map_batches)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal", "c_nationkey"]
    ).to_pydict()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))
    nmap = {
        k: (n, rmap[r])
        for k, n, r in zip(nation["n_nationkey"], nation["n_name"], nation["n_regionkey"])
    }

    facts: dict[int, list[str]] = {}
    for ck, bal, nk in zip(cust["c_custkey"], cust["c_acctbal"], cust["c_nationkey"]):
        facts.setdefault(ck % n_docs, []).append(customer_fact(ck, bal, nmap[nk][0]))
    for nk, (nn, rn) in nmap.items():
        facts.setdefault(nk % n_docs, []).append(nation_fact(nn, rn))

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # fine-grained input blocks: everything downstream (render, replicate,
    # fingerprint, extraction) fuses onto these tasks, so the block count IS
    # the pipeline's parallelism ceiling
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=max(4 * cpus, 64),
    )

    def _render(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls, tss, htmls = [], [], []
        for did, text in zip(doc_ids, texts):
            urls.append(f"{BASE_URL}{did}")
            tss.append((BASE_TS + did) * 1_000_000)  # micros
            fl = "".join(facts.get(did, []))
            htmls.append(
                (
                    f"<html><head><title>Doc {did}</title></head><body>"
                    f"<article><p>{text}</p></article><ul>{fl}</ul></body></html>"
                ).encode("utf-8")
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return docs.map_batches(_render, batch_format="pyarrow")


def replicate_pages(pages: rd.Dataset, factor: int) -> rd.Dataset:
    """Replicate the page corpus with distinct urls (bench/scaling helper:
    the sandbox's sf corpora are far smaller than the 10^12-doc target, so
    scaling runs inflate the input to make the job compute-bound)."""
    if factor <= 1:
        return pages

    def _rep(batch: pa.Table):
        # generator UDF: one bounded output batch per replica — a single
        # concatenated table would be ``factor`` x the input block and blow
        # the object store under high task concurrency
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        htmls = batch.column("html").to_pylist()
        for r in range(factor):
            t = batch.set_column(
                batch.column_names.index("url"),
                "url",
                pa.array([f"{u}#r{r}" for u in urls], pa.string()),
            )
            # distinct content per replica (a trailing marker word) so the
            # exact-dedup pre-filter doesn't collapse the inflated corpus
            t = t.set_column(
                t.column_names.index("text"),
                "text",
                pa.array([f"{x} r{r}" for x in texts], pa.string()),
            )
            t = t.set_column(
                t.column_names.index("html"),
                "html",
                pa.array(
                    [h.replace(b"</p>", f" r{r}</p>".encode(), 1) for h in htmls], pa.binary()
                ),
            )
            yield t

    return pages.map_batches(_rep, batch_format="pyarrow", batch_size=512)
