"""Neo4j push sink — optional, connection config from parameters/env only
(never source code; the reference hardcodes production credentials at
main.py:28-31, deliberately not reproduced).

Batching parity with the bug fixed: the reference slices
``queries[start:end]`` with ``end = start + batch_size - 1``
(main.py:319-324), silently dropping the last statement of every batch.
Here batching is a plain ``range`` stride over a per-partition buffer —
every statement executes exactly once, and partitions write in parallel
(the reference is single-threaded).

The ``neo4j`` driver is not installed in this environment; the import is
deferred to call time and the batching logic is pure-Python testable via
``iter_batches``.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame


def iter_batches(statements: list, batch_size: int) -> Iterator[list]:
    """Correct, lossless batching (regression target: SURVEY.md §5 a)."""
    for start in range(0, len(statements), batch_size):
        yield statements[start : start + batch_size]


def write_statements_to_neo4j(
    statements: DataFrame,
    uri: str | None = None,
    auth: tuple[str, str] | None = None,
    batch_size: int = 1000,
) -> None:
    """Execute one write transaction per ``batch_size`` statements, per
    partition (reference run_cypher_file, main.py:304-330 — parallelized
    and off-by-one-free). Expects a single string column of statements."""
    uri = uri or os.environ.get("NEO4J_URI")
    if uri is None:
        raise ValueError("Neo4j URI must come from parameter or NEO4J_URI env")
    user = (auth or (os.environ.get("NEO4J_USER"), os.environ.get("NEO4J_PASSWORD")))[0]
    password = (auth or (None, os.environ.get("NEO4J_PASSWORD")))[1]
    col = statements.columns[0]

    def push(rows: Iterable) -> None:
        from neo4j import GraphDatabase  # deferred: optional dependency

        buffered = [row[col] for row in rows]
        with GraphDatabase.driver(uri, auth=(user, password)) as driver:
            with driver.session() as session:
                for batch in iter_batches(buffered, batch_size):
                    def tx_fn(tx, queries=batch):
                        for q in queries:
                            tx.run(q)

                    session.execute_write(tx_fn)

    statements.foreachPartition(push)
