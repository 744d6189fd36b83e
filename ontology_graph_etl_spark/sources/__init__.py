"""Sources — config-driven tabular extraction (the reference's
worksheet_metadata concept), HTTP enrichment (mockable mapInPandas), and
multimodal binary-column ingestion plumbing."""

from . import enrichment, multimodal, tabular

__all__ = ["enrichment", "multimodal", "tabular"]
