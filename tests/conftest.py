"""Shared fixtures: one local SparkSession per test session, DuckDB
oracle connection with the driver's pre-registered views."""

from __future__ import annotations

import os

import duckdb
import pytest

from ontology_graph_etl_spark.io import TESTDATA_TABLES
from ontology_graph_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ontology-graph-etl-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
