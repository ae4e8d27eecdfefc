from .masking import mask_column  # noqa: F401
from .generalization import generalize_column, GeneralizationResult, assign_buckets_np  # noqa: F401
from .generalization_object import (  # noqa: F401
    generalize_object_column,
    ObjectGeneralizationResult,
)
from .randomization import randomize_column, randomize_ranks_np  # noqa: F401
from .kpi import (  # noqa: F401
    RandomizedAttr,
    compute_benchmarks,
    equivalence_classes,
    k_anonymity,
)
