"""Cypher-codegen compatibility sink (SURVEY.md §1.3: "kept only as a
compatibility/debug output").

The reference's core IR is string-templated Cypher (main.py:62,91,299).
The engine's IR is the Catalyst plan; this sink exists so a user migrating
from the reference can still emit the statement files their tooling
expects. Unlike the reference, values are escaped (quote-injection was a
latent defect — SURVEY.md §5 b) and generation is distributed (one text
file tree, one statement per line).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape(col: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(col.cast("string"), r"\\", r"\\\\"), r"'", r"\\'"
    )


def node_merge_statements(nodes: DataFrame) -> DataFrame:
    """One ``MERGE (n:Label {id}) ON CREATE SET n.name=...`` per node
    (reference template main.py:299). Returns a single-column ``value``
    DataFrame ready for the text sink. ``type`` is optional — concept
    nodes (build_concept_graph output) don't carry one and fall back to
    the label, matching the reference where ``type`` equals the sheet's
    node type."""
    type_col = F.col("type") if "type" in nodes.columns else F.lit(None)
    return nodes.select(
        F.concat(
            F.lit("MERGE (n:"),
            F.col("label"),
            F.lit(" {id: '"),
            _escape(F.col("id")),
            F.lit("'}) ON CREATE SET n.name = '"),
            _escape(F.col("name")),
            F.lit("', n.type = '"),
            _escape(F.coalesce(type_col, F.col("label"))),
            F.lit("'"),
        ).alias("value")
    )


def edge_create_statements(edges: DataFrame) -> DataFrame:
    """One ``MATCH (a) MATCH (b) CREATE (a)-[r]->(b)`` per edge
    (reference template main.py:91)."""
    return edges.select(
        F.concat(
            F.lit("MATCH (a {id: '"),
            _escape(F.col("src")),
            F.lit("'}) MATCH (b {id: '"),
            _escape(F.col("dst")),
            F.lit("'}) CREATE (a)-[r:"),
            F.col("relationship"),
            F.lit("]->(b)"),
        ).alias("value")
    )


def write_statements(statements: DataFrame, path: str) -> None:
    statements.write.mode("overwrite").text(path)
