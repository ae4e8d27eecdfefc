"""robots.txt evaluation — longest-match allow/disallow crawl filtering.

The politeness gate every crawl pipeline runs before fetching or before
admitting fetched pages into a corpus (Common Crawl honors robots at
crawl time; RefinedWeb re-filters). Semantics follow RFC 9309 / the
Google spec for the path-rule subset: per host, the rule whose prefix
is the LONGEST match on the url's path decides; on a length tie Allow
wins; a url whose host has no matching rule is allowed.

Ray shape: the parsed rule set is blocklist-sized (hosts × few rules),
broadcast once via ``ray.put``; each batch runs one vectorized
best-match sweep — per RULE one `starts_with` + compare pass over the
batch (rules are the small side; the corpus never shuffles). A rule
set above ``max_rules`` refuses loudly rather than silently degrading
the broadcast into a worker OOM: at that size, hash-partition BOTH
sides by host and evaluate per partition.

Group/agent selection (User-agent sections) happens at parse time:
`parse_robots_rules` keeps the section matching the given agent (or
'*'), mirroring how real crawlers resolve one group per host before
evaluating paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .urls import _URL_RE


def parse_robots_rules(
    texts: dict[str, str], agent: str = "*"
) -> list[tuple[str, bool, str]]:
    """{host: robots.txt body} -> [(host, allow, path_prefix)] for the
    section whose User-agent best matches ``agent`` ('*' fallback)."""
    rules: list[tuple[str, bool, str]] = []
    want = agent.lower()
    for host, body in texts.items():
        best_specific = None  # exact-agent section beats '*'
        star = []
        cur_agents: list[str] = []
        cur_rules: list[tuple[bool, str]] = []
        sections = []

        def _flush():
            if cur_agents:
                sections.append((list(cur_agents), list(cur_rules)))

        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if cur_rules:
                    _flush()
                    cur_agents, cur_rules = [], []
                cur_agents.append(val.lower())
            elif key in ("allow", "disallow"):
                if val:  # empty Disallow: = allow all, contributes no rule
                    cur_rules.append((key == "allow", val))
        _flush()
        for agents, sect in sections:
            if want in agents and want != "*":
                best_specific = sect
            if "*" in agents:
                star = sect
        chosen = best_specific if best_specific is not None else star
        rules.extend((host.lower(), allow, pfx) for allow, pfx in chosen)
    return rules


def robots_filter(
    ds: rd.Dataset,
    rules: list[tuple[str, bool, str]],
    url_col: str = "url",
    *,
    max_rules: int = 2_000_000,
) -> rd.Dataset:
    """Rows whose url the rule set admits (longest match; tie -> Allow;
    no matching rule -> allowed; non-urls conservatively dropped)."""
    if len(rules) > max_rules:
        raise ValueError(
            f"{len(rules)} robots rules — above max_rules ({max_rules}); "
            "hash-partition corpus and rules by host instead of broadcast"
        )
    rules_ref = ray.put(
        [(h.lower(), bool(a), str(p)) for h, a, p in rules]
    )

    def _keep(batch: pa.Table) -> pa.Table:
        rls = ray.get(rules_ref)
        u = pc.fill_null(batch.column(url_col).combine_chunks(), "")
        m = pc.extract_regex(pc.utf8_lower(u), _URL_RE)
        valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        path = pc.fill_null(pc.struct_field(m, "path"), "/")
        best_len = np.full(batch.num_rows, -1, dtype=np.int64)
        best_allow = np.ones(batch.num_rows, dtype=bool)
        for rh, allow, pfx in rls:
            hit = pc.and_(
                pc.equal(host, rh), pc.starts_with(path, pfx)
            ).to_numpy(zero_copy_only=False)
            hit = np.asarray(hit, dtype=bool) & valid
            l = len(pfx)
            better = hit & (
                (l > best_len) | ((l == best_len) & allow & ~best_allow)
            )
            best_len[better] = l
            best_allow[better] = allow
        keep = valid & best_allow
        return batch.filter(pa.array(keep))

    return ds.map_batches(_keep, batch_format="pyarrow")
