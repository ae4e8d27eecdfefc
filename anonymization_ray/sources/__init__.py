from .triples import pivot_triples_to_wide, wide_to_triples  # noqa: F401
from .warc import read_warc, warc_pages, parse_warc  # noqa: F401
from .jsonl import read_jsonl_documents  # noqa: F401
