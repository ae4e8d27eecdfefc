from .anonymize import anonymize_table, AnonymizeResult  # noqa: F401
