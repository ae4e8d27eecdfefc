"""Pattern redaction / PII scrubbing over an unstructured-text column.

The reference engine masks STRUCTURED attribute values (Masking.java — fixed
replacement per configured attribute); a web-crawl training pipeline needs the
unstructured-text sibling: scrub every occurrence of configured patterns
(emails, phone numbers, IPs, SSNs, names) from a ``text`` column before the
corpus is packed. This is that operator, Ray-Data-first:

- one stateless ``map_batches`` pass, ``batch_format="pyarrow"`` (zero-copy);
- rules are applied SEQUENTIALLY per batch with Arrow's RE2 kernels
  (``count_substring_regex`` to count on the current state, then
  ``replace_substring_regex``) — no Python-level row loop anywhere;
- no shuffle, no materialization: the stage streams and scales linearly with
  input bytes, which is exactly what a scrub pass over 100 TB must do.

Arrow and DuckDB both compile patterns with RE2, so the transform is
value-hash exact against a chained ``regexp_replace(..., 'g')`` SQL oracle —
the same sequential semantics expressed as one CTE per rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Default PII rule set, applied IN ORDER (structured forms first so the
# greedy phone pattern cannot eat an SSN or a dotted IP).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_text(
    ds: rd.Dataset,
    rules: list[tuple[str, str, str]] | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Dataset[(id_col, text_redacted, n_redactions)].

    ``rules`` is an ordered list of ``(name, re2_pattern, replacement)``;
    defaults to :data:`PII_RULES`. Each rule counts its matches on the text
    AS LEFT BY the previous rule, then replaces globally — so the count is
    the number of replacements actually performed, and chained SQL
    ``regexp_replace`` reproduces the output byte-for-byte.
    """
    use = list(rules if rules is not None else PII_RULES)

    def _scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        total = None
        for _name, pat, repl in use:
            n = pc.count_substring_regex(txt, pat)
            total = n if total is None else pc.add(total, n)
            txt = pc.replace_substring_regex(txt, pat, repl)
        if total is None:
            total = pa.array([0] * len(batch), pa.int64())
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "text_redacted": txt,
                "n_redactions": pc.cast(total, pa.int64()),
            }
        )

    return ds.map_batches(_scrub, batch_format="pyarrow")
