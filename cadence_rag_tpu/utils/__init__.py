"""Small shared utilities (errors, time handling)."""

from .errors import ApiError  # noqa: F401
