"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (scan → 3-way join → agg →
top-k through Catalyst); ``queries()`` / ``oracle_sql()`` expose the full
operator registry from ``ontology_graph_etl_spark.plans.registry`` —
one entry per implemented operator of SURVEY.md §2, each Spark plan
paired with the DuckDB oracle the driver hash-compares at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_graph_etl_spark.io import load_table
from ontology_graph_etl_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation with
    top-k — scan → broadcast-dim join → fact join → partial agg → top-k
    (TakeOrderedAndProject), all Catalyst-planned. Driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation_name").asc())
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for EVERY registered query — zero rows-only
    entries since round 4. The three formerly weak spots all carry full
    hash-checked oracles: q53 approximate aggregates (exact values +
    within-tolerance booleans), q61 hyperplane-LSH ANN (md5-derived
    plane hash re-derived in SQL), and q63 ml-lib IVF (a recall-contract
    row — measured recall@k against the exact twin, thresholded — whose
    green CORRECTNESS_r04 hash row pins the contract; its fully
    deterministic twin q86 is additionally value-hash-checked)."""
    return registry.oracle_sql()
