"""Structured Streaming surface (SURVEY.md §2.10) — batch-equivalent
window/session/dedup transforms shared between batch and stream plans."""

from . import windows

__all__ = ["windows"]
