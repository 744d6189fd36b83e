"""Persistent graph storage — nodes/edges Parquet tables partitioned for
traversal pruning (SURVEY.md §1.3: nodes by ``label``, edges by
``relationship``).

The reference's store is Neo4j (remote, main.py:29); here the canonical
store is two Parquet tables. Partitioning by label/relationship means a
traversal like ``one_hop(rel="TREATS")`` scans exactly one partition
directory — at 100 TB the difference between touching 3,210 edges and
3.2 billion. Writes are idempotent overwrites (the recovery model:
recompute + atomic replace, SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .io import write_parquet


class GraphStore:
    """Nodes/edges Parquet layout rooted at ``path``:
    ``{path}/nodes/label=<L>/...``, ``{path}/edges/relationship=<R>/...``.
    """

    def __init__(self, path: str):
        self.path = path
        self.nodes_path = os.path.join(path, "nodes")
        self.edges_path = os.path.join(path, "edges")

    def save(self, nodes: DataFrame, edges: DataFrame) -> None:
        """Overwrite both tables, partitioned for pruning. The canonical
        schema: nodes(id, label, **props); edges(src, dst, relationship)."""
        write_parquet(nodes, self.nodes_path, partition_by=("label",))
        write_parquet(edges, self.edges_path, partition_by=("relationship",))

    def nodes(self, spark: SparkSession, label: str | None = None) -> DataFrame:
        """Load nodes; a ``label`` filter becomes a partition filter (zero
        non-matching files read — check PartitionFilters in .explain)."""
        df = spark.read.parquet(self.nodes_path)
        return df.where(df.label == label) if label is not None else df

    def edges(
        self, spark: SparkSession, relationship: str | None = None
    ) -> DataFrame:
        df = spark.read.parquet(self.edges_path)
        return (
            df.where(df.relationship == relationship)
            if relationship is not None
            else df
        )
