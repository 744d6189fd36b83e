"""Config-driven relationship extraction (SURVEY.md §2.1 S5/S6).

The reference drives Excel extraction from a ``worksheet_metadata``
list-of-dicts — per-sheet column ordinals, node types, and relationship
name (main.py:182-266) — then loops rows with header-skip, a
stop-at-first-empty-key break, and a null-dst filter (main.py:278-302).

Here the metadata is a declarative ``SheetConfig``; extraction is one
generic DataFrame transform. The sheet→(types, relationship) table below
matches the *generated corpus* (= the older metadata main.py:98-181,
verified against each relationships_sheetN.cypher — see FIXTURES.md §3),
including the trailing-space type names the reference leaks into node
properties (main.py:243,248,253,258,263 — kept verbatim for parity; the
cleaned view is one ``rtrim`` away and deliberately NOT applied here).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.relational import prefix_scan


@dataclass(frozen=True)
class SheetConfig:
    """Per-sheet extraction config (the worksheet_metadata record,
    reference main.py:185-189 shape)."""

    sheet_index: int
    node1_type: str
    node2_type: str
    relationship: str
    # column ordinals into the raw sheet row (reference main.py:292-293);
    # most sheets use (0,1,2,3), sheet2 uses (0,1,8,6), sheet4 (12,13,0,1)
    column_node1_value: int = 0
    column_node1_id: int = 1
    column_node2_value: int = 2
    column_node2_id: int = 3


#: Corpus-verified metadata (FIXTURES.md §3; relationship counts measured
#: across the 16 generated cypher files — TREATS dominates at 3,210/3,790).
WORKSHEET_METADATA: dict[int, SheetConfig] = {
    1: SheetConfig(1, "SurgicalExtent", "SurgicalProcedureType", "TYPE_OF"),
    2: SheetConfig(2, "MedicationAPI", "OutcomeType", "CAUSED_OUTCOME",
                   column_node2_value=8, column_node2_id=6),
    3: SheetConfig(3, "NeoplasmType", "Gene", "HAS_BIOMARKER"),
    4: SheetConfig(4, "MedicationAPI", "NeoplasmType", "TREATS",
                   column_node1_value=12, column_node1_id=13,
                   column_node2_value=0, column_node2_id=1),
    5: SheetConfig(5, "MedicationAPI", "Gene", "HAS_TARGET"),
    7: SheetConfig(7, "MedicationAPI", "Gene", "HAS_PREDICTIVE_BIOMARKER"),
    8: SheetConfig(8, "DiseaseType", "Technique", "HAS_REASON"),
    9: SheetConfig(9, "NeoplasmType", "MorphologyType", "HAS_MORPHOLOGY"),
    10: SheetConfig(10, "NeoplasmType", "Stage", "HAS_STAGE"),
    11: SheetConfig(11, "MedicationAPI", "Mechanism", "HAS_MECHANISM"),
    12: SheetConfig(12, "NeoplasmType", "BodyPart", "HAS_LOCATION"),
    13: SheetConfig(13, "NeoplasmType", "SurgicalExtent ", "TREATS"),
    14: SheetConfig(14, "NeoplasmType", "Behavior ", "HAS_BEHAVIOR"),
    15: SheetConfig(15, "NeoplasmType", "Technique ", "TREATS"),
    16: SheetConfig(16, "MedicationAPI", "DiseaseType ", "CAUSED_SIDE_EFFECT"),
    17: SheetConfig(17, "MedicationAPI", "MedicationClass ", "MEMBER_OF"),
    # Newer metadata's extra entry (main.py:185-189) — no generated file
    # in the snapshot, kept for forward parity:
    18: SheetConfig(18, "SurgicalExtent", "OutcomeType", "ASSOCIATED_WITH"),
}


def extract_relationships(
    raw_rows: DataFrame, config: SheetConfig, order_col: str = "line_no"
) -> DataFrame:
    """Generic sheet → relationship-rows extraction.

    Reproduces the reference's loop semantics declaratively:
    - header skip: callers pass data rows (FIXTURES tables already do);
      for raw reads use the reader's ``header`` option (P6).
    - stop at first empty key (main.py:285-286): ``prefix_scan`` on the
      explicit ``order_col`` — order-dependent semantics need the ingest
      order column (SURVEY.md §7).
    - null-dst filter (main.py:294-295).

    ``raw_rows`` columns are addressed by ordinal like the reference does;
    the output is the canonical (node1_*, node2_*, relationship) shape.
    """
    cols = [c for c in raw_rows.columns if c != order_col]
    pick = lambda i: F.col(cols[i])  # noqa: E731
    projected = raw_rows.select(
        F.col(order_col),
        pick(config.column_node1_value).cast("string").alias("node1_value"),
        pick(config.column_node1_id).cast("string").alias("node1_id"),
        pick(config.column_node2_value).cast("string").alias("node2_value"),
        pick(config.column_node2_id).cast("string").alias("node2_id"),
    )
    prefix = prefix_scan(projected, order_col, F.col("node1_value").isNull())
    return (
        prefix.where(F.col("node2_id").isNotNull())
        .select(
            F.col(order_col),
            "node1_id",
            "node1_value",
            F.lit(config.node1_type).alias("node1_type"),
            "node2_id",
            "node2_value",
            F.lit(config.node2_type).alias("node2_type"),
            F.lit(config.relationship).alias("relationship"),
        )
    )
