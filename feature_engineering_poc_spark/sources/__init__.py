"""Source readers (S1-S5)."""

from .reader import SchemaValidationError, read_source

__all__ = ["read_source", "SchemaValidationError"]
