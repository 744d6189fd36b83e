"""Operator library — the reference's operator inventory (SURVEY.md §2)
plus the large-scale pipeline extensions, each as a composable function
over DataFrames. Everything here is declarative DataFrame API so Catalyst
owns physical planning (broadcast vs shuffle, AQE skew handling)."""

from . import (
    dedup,
    gatestats,
    graph,
    grouped,
    relational,
    similarity,
    sketches,
    textops,
    upsert,
    util,
)

__all__ = [
    "dedup",
    "gatestats",
    "graph",
    "grouped",
    "relational",
    "similarity",
    "sketches",
    "textops",
    "upsert",
    "util",
]
