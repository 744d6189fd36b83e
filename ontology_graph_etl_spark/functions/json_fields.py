"""Semi-structured JSON column extraction.

The reference is a JSON ETL end to end (JSONL scans main.py:54-55,
whole-doc dicts main.py:335-336), but an EMBEDDED json-string column —
the `events.props` shape, ubiquitous in event pipelines — needs typed
extraction before it can join/aggregate. Spark-first form below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
) -> DataFrame:
    """Project typed top-level fields out of a JSON-string column:
    ``fields`` maps output column name → Spark type string (``"int"``,
    ``"string"``, ``"double"``, ...). Appends one column per field.

    ONE ``from_json`` parse per row with a pinned schema (the S1
    schema-discipline applied to an embedded column) — NOT N
    ``get_json_object`` calls, which re-parse the document once per
    field; with a handful of fields that is the difference between one
    scan-speed pass and several. Malformed or missing fields yield
    NULL (``from_json`` PERMISSIVE default), same as any engine's
    json_extract, so the extraction is oracle-comparable (q109).

    Scale shape: zero shuffle, whole-stage-codegen'd JsonToStructs;
    column pruning still reaches the parquet scan for every other
    column.
    """
    if not fields:
        raise ValueError("fields must name at least one output column")
    clash = set(fields) & set(df.columns)
    if clash:
        raise ValueError(
            f"extract_json_fields outputs {sorted(clash)} already exist "
            "on the input"
        )
    ddl = ", ".join(f"`{name}` {typ}" for name, typ in fields.items())
    schema = StructType.fromDDL(ddl)
    parsed = F.from_json(F.col(json_col), schema)
    return df.select(
        *df.columns,
        *[parsed[name].alias(name) for name in fields],
    )
