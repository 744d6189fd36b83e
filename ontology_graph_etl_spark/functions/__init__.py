"""Scalar expression helpers — the reference's per-record Python functions
re-expressed as JVM-side Column expressions (whole-stage-codegen'd, never
row-at-a-time Python). SURVEY.md §2.6.
"""

from .json_fields import extract_json_fields
from .text import (
    first_prefix,
    format_merge_statement,
    sanitize_value,
    stable_surrogate_id,
    whitespace_tokens,
)
from .url import normalize_url, url_domain, url_host

__all__ = [
    "extract_json_fields",
    "first_prefix",
    "format_merge_statement",
    "normalize_url",
    "sanitize_value",
    "stable_surrogate_id",
    "url_domain",
    "url_host",
    "whitespace_tokens",
]
