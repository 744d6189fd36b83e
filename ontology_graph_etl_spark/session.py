"""SparkSession factory with scale-ready defaults.

The reference (main.py) is single-threaded Python with manual batching
(main.py:304,317-324) and offset-resume (main.py:332,341-346); here all
parallelism, batching, and recovery is delegated to Spark. These conf
defaults are chosen for a large cluster and are harmless on local[N]:

- AQE on: runtime join-strategy switching, skew-join splitting, and
  partition coalescing replace any hand-tuned batch sizing.
- Arrow on: every pandas interchange (the few mapInPandas paths) is
  vectorized, never row-at-a-time pickling.
- shuffle.partitions: overridable; on a real cluster this should be
  ~2-3x total cores or left to AQE's coalescing with a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ontology-graph-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    master is configured — tests and the bench run single-JVM, but every
    plan the engine produces is partition-aware and cluster-ready.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Timestamps in testdata are naive; pin the session to UTC so
        # window/date_trunc results are independent of host timezone
        # (and match DuckDB, which treats naive timestamps as-is).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
