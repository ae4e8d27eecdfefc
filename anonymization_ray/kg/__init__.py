from .pages import synthesize_pages  # noqa: F401
from .extract import extract_text, extract_mentions  # noqa: F401
from .link import build_alias_index, link_mentions  # noqa: F401
from .canonicalize import (  # noqa: F401
    apply_canonical_mapping,
    canonicalize_components,
    canonicalize_components_distributed,
)
from .materialize import materialize_triples, resume_missing_partitions  # noqa: F401
from .anonymize import anonymize_triples, skolemize, TriplePredicateConfig  # noqa: F401
from .pipeline import kg_pipeline, verify_text_invariant, KgRunResult  # noqa: F401
from .checkpoint import (  # noqa: F401
    extract_link_checkpointed,
    kg_pipeline_checkpointed,
)
from .turtle import parse_turtle, read_turtle_files  # noqa: F401
from .nquads import read_nquads, write_nquads  # noqa: F401
from .literals import canonicalize_literals  # noqa: F401
