"""Temporal KG construction: crawl-snapshot ("as-of") page selection.

A Common-Crawl-style corpus is a MULTI-VERSION page store — the same url is
refetched across crawls, each capture stamped ``warc_ts``. The KG built "as
of" time T must extract from exactly one capture per url: the latest with
``warc_ts <= T`` (recrawls supersede, too-new captures are invisible). The
reference service is single-snapshot; this is the lifecycle operator a
10^12-doc store needs to answer "what did the graph say last March".

Scale shape: one ``topk_per_key(k=1)`` full-row rank per url — a range sort
+ boundary scan, no per-group UDF — after a stateless timestamp filter. The
html payload rides exactly one all-to-all (same contract as ingestion-time
url dedup, pipelines/corpus.py).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .pages import BASE_TS, synthesize_pages

# recrawl fixture schedule (mirrored verbatim in the SQL oracle):
# v2 refetches pages doc_id%5==0 at +RECRAWL_OFFSET_S with customer account
# balances bumped +1000; v3 refetches doc_id%10==0 at +2*RECRAWL_OFFSET_S
# with +2000 (the negative control: it postdates ASOF_T and must never
# surface). Offsets dwarf the per-doc ts spread (ts1 = BASE_TS + doc_id), so
# ordering is uniform for any corpus under 10^7 docs (guarded).
RECRAWL_OFFSET_S = 10_000_000
ASOF_T_US = (BASE_TS + 15_000_000) * 1_000_000

_SPAN = re.compile(r"<span>([^<]*)</span>")


def pages_asof(pages: rd.Dataset, t_us: int) -> rd.Dataset:
    """Latest capture per url with warc_ts <= t_us (page schema preserved,
    helper columns dropped). Captures at identical (url, ts) tie-break on
    the payload hash so the winner never depends on partitioning."""
    import numpy as np
    import pandas as pd

    from ..util import topk_per_key

    def _key(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("warc_ts"), pa.timestamp("us")).cast(pa.int64())
        hh = pd.util.hash_array(
            np.array(b.column("html").to_pylist(), object)
        ).astype(np.int64)
        return b.append_column("ts_us", ts).append_column(
            "hh", pa.array(hh, pa.int64())
        )

    keyed = pages.map_batches(_key, batch_format="pyarrow").filter(
        expr=f"ts_us <= {t_us}"
    )
    win = topk_per_key(keyed, "url", "ts_us", 1, descending=True, tie_col="hh")
    out = win.drop_columns(["ts_us", "hh"])
    if out.schema() is None:
        # every capture post-dates T: a legal EMPTY snapshot. Ray loses the
        # schema through the lazy drop; rebuild it explicitly (win still
        # carries it as explicit blocks)
        from ..util import empty_like

        out = empty_like(win, exclude=("ts_us", "hh"))
    return out


def _bump_balances(html: bytes, delta: float) -> bytes:
    def _sub(m: re.Match) -> str:
        g = m.group(1)
        if not g:
            return m.group(0)
        # double add then shortest-roundtrip repr — bit-identical to the
        # oracle's CAST(c_acctbal + delta AS VARCHAR)
        return f"<span>{float(g) + delta!r}</span>"

    return _SPAN.sub(_sub, html.decode("utf-8")).encode("utf-8")


def synthesize_recrawls(sf_dir: str) -> rd.Dataset:
    """Deterministic multi-crawl page fixture: base crawl ∪ v2 ∪ v3 (see
    module docstring). Pure function of the sf tables, per-row Python only
    in the fixture generator (never in the operators under test)."""
    base = synthesize_pages(sf_dir)

    def _recrawl(mod: int, offset_s: int, delta: float):
        def _f(b: pa.Table) -> pa.Table:
            import numpy as np

            dids = pc.cast(
                pc.struct_field(
                    pc.extract_regex(b.column("url"), r"/doc/(?P<d>\d+)"), "d"
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            if len(dids) and dids.max() >= 10_000_000:
                raise ValueError("recrawl fixture requires doc_id < 1e7")
            t = b.filter(pa.array(dids % mod == 0))
            if t.num_rows == 0:
                return t
            ts = pc.add(
                pc.cast(t.column("warc_ts"), pa.timestamp("us")).cast(pa.int64()),
                offset_s * 1_000_000,
            )
            htmls = [
                _bump_balances(h, delta) for h in t.column("html").to_pylist()
            ]
            return pa.table(
                {
                    "url": t.column("url").combine_chunks(),
                    "warc_ts": pc.cast(ts, pa.timestamp("us")),
                    "html": pa.array(htmls, pa.binary()),
                    "text": t.column("text").combine_chunks(),
                    "lang": t.column("lang").combine_chunks(),
                }
            )

        return _f

    v2 = base.map_batches(_recrawl(5, RECRAWL_OFFSET_S, 1000.0), batch_format="pyarrow")
    v3 = base.map_batches(
        _recrawl(10, 2 * RECRAWL_OFFSET_S, 2000.0), batch_format="pyarrow"
    )
    return base.union(v2).union(v3)
