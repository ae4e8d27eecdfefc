from .triples import pivot_triples_to_wide, wide_to_triples  # noqa: F401
