from .anonymize import anonymize_table, AnonymizeResult  # noqa: F401
from .flat import anonymize_flat_request, RequestModelError  # noqa: F401
