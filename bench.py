"""Benchmark runner — times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: one query per engine subsystem — scans/joins/aggs
(q20/q21), window + top-k (q22/q23), first-wins upsert (q14), graph
motifs + closure (q31/q32), sessionization (q41), MinHash near-dup
(q50), cosine top-k ANN (q51), tf-idf (q52), SimHash (q55), sign-bucket
embedding LSH (q82), and the full curation composition (q85) — i.e. the
plans a 100 TB training-data pipeline actually runs. Rounds 1-2 ran the
first 21 names; q82/q85 append in round 3 so per-query history stays
comparable.

Methodology: one warm-up run of q20 (JVM/codegen warm), then each query
executed once with a count-style action that materializes the full
result but doesn't ship rows to the driver.
"""

from __future__ import annotations

import json
import os
import time

from ontology_graph_etl_spark.plans.registry import queries
from ontology_graph_etl_spark.session import get_spark

HEADLINE = [
    "q14_upsert_first_wins",
    "q20_join3",
    "q26_asof_join",
    "q21_agg_suite",
    "q22_sort_limit",
    "q23_window_rank",
    "q31_two_hop_motif",
    "q32_closure",
    "q41_session_window",
    "q50_minhash_simjoin",
    "q51_cosine_topk",
    "q52_tfidf_topterms",
    "q55_simhash",
    "q28_interval_join",
    "q37_pagerank",
    "q46_funnel",
    "q67_lsh_dedup_clusters",
    "q70_decontaminate",
    "q73_event_correlation",
    "q74_sequence_pack",
    "q78_incremental_dedup",
    "q82_lsh_neardup",
    "q85_curate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="ontology-graph-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = queries()
    # warm-up: JVM JIT + codegen + parquet footer cache, plus one trivial
    # pandas_udf action so Arrow Python workers are spawned before timing
    # (any long-lived deployment runs with warm workers; the spawn cost
    # is per-executor-lifetime, not per-query)
    registry["q20_join3"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(s):
        return s

    spark.range(32, numPartitions=32).select(_warm("id")).count()

    # Each query is timed twice. The first (cold) run includes Catalyst
    # analysis + whole-stage-codegen janino compilation — a one-time cost
    # per plan shape that dominates at this scale (SCALING.md: warm
    # execution of several headline queries is 3-8x the cold number). The
    # second (warm) run is steady-state execution, the number that
    # actually projects to long-lived 100 TB jobs. Headline stays cold
    # for continuity with earlier rounds.
    def _release_checkpoints() -> None:
        # Iterative/similarity queries localCheckpoint intermediates;
        # the blocks free only when the ContextCleaner notices the
        # dropped references. Left to GC timing, blocks from 21 queries
        # x 2 runs pile up and late queries slow down erratically
        # (round 1: q70 "warm" measured above its cold run under the
        # driver). Deterministic fix: every localCheckpoint registers in
        # the context's persistent-RDD map, and each timing below starts
        # from a fresh invocation of the query function — so between
        # timings every persistent RDD is dead weight and is unpersisted
        # (blocking) explicitly. No reliance on System.gc() heuristics.
        entries = (
            spark.sparkContext._jsc.sc().getPersistentRDDs().toList()
        )
        it = entries.iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        registry[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)
        _release_checkpoints()
        start = time.perf_counter()
        registry[name](spark, sf_dir).count()
        warm[name] = round(time.perf_counter() - start, 3)
        _release_checkpoints()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "value_warm": round(sum(warm.values()), 3),
                "queries_warm": warm,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
