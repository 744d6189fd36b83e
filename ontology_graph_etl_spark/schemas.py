"""Pinned StructTypes for every input shape the engine reads.

The reference accesses fields dynamically by dict key or column ordinal
(reference main.py:60-77, main.py:292-293); here every schema is explicit
so Spark never infers twice and scans prune columns (SURVEY.md §1.2-1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Reference-parity input schemas (SURVEY.md §1.2, recovered from main.py)
# ---------------------------------------------------------------------------

#: data/concept.json — JSONL, one concept per line (reference main.py:60-77)
CONCEPT_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("semantic_type", StringType(), True),
        StructField("cui", StringType(), True),
        StructField("search_type", StringType(), True),
        StructField("description", StringType(), True),
        StructField("property_concept", StringType(), True),
    ]
)

#: data/concept_hierarchy.json — JSONL (reference main.py:89-90)
CONCEPT_HIERARCHY_SCHEMA = StructType(
    [
        StructField("child_id", LongType(), False),
        StructField("parent_id", LongType(), False),
    ]
)

#: data/concept_property_types.json — JSONL (reference main.py:378-383)
CONCEPT_PROPERTY_TYPES_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("property_types", ArrayType(StringType()), True),
        StructField("node_type", StringType(), True),
    ]
)

#: data/concept_id_mapping.json — whole-doc dict {str(id) -> entity_id}
#: (reference main.py:335-336); relationalized to two columns.
CONCEPT_ID_MAPPING_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("entity_id", LongType(), False),
    ]
)

#: Flattened spreadsheet relationship rows (reference main.py:278-302,
#: metadata main.py:182-266); FIXTURES.md §3.
RELATIONSHIP_ROW_SCHEMA = StructType(
    [
        StructField("sheet_index", IntegerType(), False),
        StructField("line_no", LongType(), False),
        StructField("node1_id", StringType(), True),
        StructField("node1_value", StringType(), True),
        StructField("node1_type", StringType(), True),
        StructField("node2_id", StringType(), True),
        StructField("node2_value", StringType(), True),
        StructField("node2_type", StringType(), True),
        StructField("relationship", StringType(), True),
    ]
)

#: HTTP enrichment response rows (reference main.py:377-382), relationalized.
PROPERTY_TYPE_EVENT_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("raw_type", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Property-graph canonical model (GraphFrames convention, SURVEY.md §1.3)
# ---------------------------------------------------------------------------

NODES_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("label", StringType(), False),
        StructField("name", StringType(), True),
        StructField("type", StringType(), True),
        StructField("properties", MapType(StringType(), StringType()), True),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("relationship", StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md) — pinned so readers never infer
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

#: Multimodal asset table shape (SURVEY north-star extensions): opaque binary
#: payload + typed metadata; decode/feature steps are Pandas-UDF plumbing.
MULTIMODAL_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)
