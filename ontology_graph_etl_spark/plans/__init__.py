"""Query plans — the driver-checkable registry binding every operator
(SURVEY.md §2) to a (Spark plan, DuckDB oracle SQL) pair."""

from .registry import QUERIES, oracle_sql, queries

__all__ = ["QUERIES", "oracle_sql", "queries"]
