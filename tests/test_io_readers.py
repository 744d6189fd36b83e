"""Reader/writer tests for io.py — the reference-shaped input paths
(JSONL S1/S2, whole-doc JSON S3/S4, text lines S7) and canonical sinks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ontology_graph_etl_spark import io as oio

CONCEPT_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("semantic_type", StringType(), True),
    ]
)


def test_read_jsonl_pinned_schema_and_line_no(spark, tmp_path):
    path = str(tmp_path / "concepts.json")
    records = [
        {"id": 191083, "name": "lung neoplasm", "semantic_type": "Neoplasm"},
        {"id": 385464, "name": "melanoma", "semantic_type": "Neoplasm"},
        {"id": 100001, "name": "BRAF", "semantic_type": "Gene", "extra": "ignored"},
    ]
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    df = oio.read_jsonl(spark, path, CONCEPT_SCHEMA, with_line_no=True)
    assert df.columns == ["id", "name", "semantic_type", "line_no"]
    rows = df.orderBy("line_no").collect()
    assert [r.id for r in rows] == [191083, 385464, 100001]
    # line_no is strictly increasing in file order (single-file scan)
    assert rows[0].line_no < rows[1].line_no < rows[2].line_no


def test_read_json_doc_dict(spark, tmp_path):
    path = str(tmp_path / "mapping.json")
    with open(path, "w") as f:
        json.dump({"191083": 7000001, "385464": 7000002}, f)
    df = oio.read_json_doc(spark, path)
    row = df.first()
    assert row["191083"] == 7000001


def test_read_text_lines(spark, tmp_path):
    path = str(tmp_path / "stmts.cypher")
    with open(path, "w") as f:
        f.write("MERGE (a)\nMERGE (b)\nMERGE (c)\n")
    df = oio.read_text_lines(spark, path)
    assert df.count() == 3
    assert df.columns == ["value"]


def test_write_parquet_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "Concept", "a"), ("2", "Gene", "b"), ("3", "Gene", "c")],
        ["id", "label", "name"],
    )
    out = str(tmp_path / "nodes")
    oio.write_parquet(df, out, partition_by=("label",))
    # label partitioning materialized on disk → partition pruning works
    assert os.path.isdir(os.path.join(out, "label=Gene"))
    back = spark.read.parquet(out)
    assert back.count() == 3
    pruned = back.where(F.col("label") == "Gene")
    assert pruned.count() == 2


def test_write_text_lines_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("stmt1",), ("stmt2",)], ["statement"])
    out = str(tmp_path / "stmts")
    oio.write_text_lines(df, out)
    back = spark.read.text(out)
    assert {r.value for r in back.collect()} == {"stmt1", "stmt2"}


def test_graph_store_partition_pruning(spark, tmp_path):
    """GraphStore writes label/relationship-partitioned tables and a
    filtered read prunes partitions (PartitionFilters in the scan)."""
    from ontology_graph_etl_spark.graph_store import GraphStore

    nodes = spark.createDataFrame(
        [("1", "Gene", "BRAF"), ("2", "Gene", "EGFR"), ("3", "Drug", "dab")],
        ["id", "label", "name"],
    )
    edges = spark.createDataFrame(
        [("3", "1", "HAS_TARGET"), ("3", "2", "TREATS")],
        ["src", "dst", "relationship"],
    )
    store = GraphStore(str(tmp_path / "g"))
    store.save(nodes, edges)

    genes = store.nodes(spark, label="Gene")
    assert genes.count() == 2
    targets = store.edges(spark, relationship="HAS_TARGET")
    assert targets.count() == 1
    plan = targets._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "HAS_TARGET" in plan
    # full load sees everything, partition col preserved
    assert store.nodes(spark).count() == 3


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT an Exchange in
    the physical plan (write-side pre-shuffle amortizes the nightly join)."""
    import uuid

    suffix = uuid.uuid4().hex[:8]
    li, od = f"li_{suffix}", f"od_{suffix}"
    lineitem = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("orderkey"), (F.col("id") % 7).alias("qty")
    )
    orders = spark.range(0, 500).select(
        F.col("id").alias("orderkey"), (F.col("id") % 3).alias("prio")
    )
    oio.write_bucketed_table(lineitem, li, "orderkey", num_buckets=8)
    oio.write_bucketed_table(orders, od, "orderkey", num_buckets=8)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li).join(spark.table(od), "orderkey")
            .groupBy("prio").agg(F.sum("qty").alias("total"))
        )
        assert joined.count() == 3
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both scans read bucketed layout; no Exchange on the join key —
        # the sort-merge join consumes bucket-partitioned input directly
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql(f"DROP TABLE IF EXISTS {li}")
        spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_read_jsonl_quarantine_splits_bad_rows(spark, tmp_path):
    """PERMISSIVE quarantine ingest: well-formed rows come out typed,
    malformed lines land in the bad frame VERBATIM (re-ingestable),
    nothing is silently NULLed away, and a schema clash raises."""
    import pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ontology_graph_etl_spark.io import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    lines = [
        '{"id": 1, "name": "a"}',
        "not json at all",
        '{"id": 2, "name": "b"}',
        '{"id": "oops"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert sorted(map(tuple, good.collect())) == [(1, "a"), (2, "b")]
    assert good.columns == ["id", "name"]
    raws = sorted(r.raw for r in bad.collect())
    assert raws == sorted(["not json at all", '{"id": "oops"}'])
    clash = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_quarantine(spark, str(p), clash)
