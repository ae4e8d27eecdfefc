"""URL blocklist filtering — the crawl-side hygiene gate.

The UT1-blocklist / RefinedWeb-style stage: drop pages whose url host is on
a blocked-domain list (suffix match: ``example.org`` blocks
``bad.example.org``) or whose path starts with a blocked prefix. The
reference engine has no crawl surface; this is the URL sibling of its
delete-originals pass.

Shape: the blocklist is SMALL (UT1 is a few million domains — bounded),
broadcast once via ``ray.put``; the scan is stateless vectorized Arrow —
one RE2 ``extract_regex`` splits scheme://host/path, host membership is
``pc.is_in`` against the broadcast set (exact host + each dot-suffix level
up to ``max_suffix_depth`` labels), path prefixes are ``starts_with`` ORs.
The corpus never shuffles and streams at input-byte rate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_URL_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]*)(?P<path>/.*)?$"


def url_blocklist_filter(
    ds: rd.Dataset,
    url_col: str,
    blocked_hosts: list[str],
    blocked_path_prefixes: list[str] = (),
    *,
    max_suffix_depth: int = 4,
) -> rd.Dataset:
    """Rows whose url survives the blocklist: host (case-insensitive, any
    registrable suffix of it up to ``max_suffix_depth`` labels) not in
    ``blocked_hosts`` AND path not starting with any blocked prefix.
    Non-url strings (no scheme) are conservatively DROPPED."""
    hosts = pa.array(sorted({h.lower() for h in blocked_hosts}), pa.string())
    hosts_ref = ray.put(hosts)
    prefixes = tuple(blocked_path_prefixes)

    def _keep(batch: pa.Table) -> pa.Table:
        hset = ray.get(hosts_ref)
        u = pc.utf8_lower(pc.fill_null(batch.column(url_col).combine_chunks(), ""))
        m = pc.extract_regex(u, _URL_RE)
        valid = pc.is_valid(m)
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        path = pc.fill_null(pc.struct_field(m, "path"), "")
        blocked = pc.is_in(host, value_set=hset)
        # suffix levels: strip one leading label at a time
        cur = host
        for _ in range(max_suffix_depth - 1):
            cur = pc.replace_substring_regex(cur, r"^[^.]*\.", "", max_replacements=1)
            blocked = pc.or_(blocked, pc.is_in(cur, value_set=hset))
        for p in prefixes:
            blocked = pc.or_(blocked, pc.starts_with(path, p))
        keep = pc.and_(valid, pc.invert(blocked))
        return batch.filter(pc.fill_null(keep, False))

    return ds.map_batches(_keep, batch_format="pyarrow")
