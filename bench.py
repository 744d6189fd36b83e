"""Benchmark runner — times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines: first the full
record (cold+warm per-query timings, plan fingerprints, loadavg), then
a SHORT summary line
{"metric": ..., "value": total_sec, "unit": "sec", "value_warm": ...,
 "sf": ..., "queries": {...}, "plans_sha": ..., "plans_unstable_n": N}
printed LAST so the driver's bounded tail capture always ends with a
complete parseable line (BENCH_r04 was lost to a single oversized line).

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

Round-4 additions that make a noisy bench host distinguishable from
plan drift inside the artifact itself: per-query PLAN FINGERPRINTS
(sha256 of the executed plan, normalized for run-varying expression /
plan ids) recorded for both the cold and warm invocation — identical
fingerprints + divergent times ⇒ host interference, divergent
fingerprints ⇒ genuine plan change — plus 1-minute loadavg snapshots
before and after the run. q90-q92 join the headline set so the newest
operators accumulate per-round history; earlier names keep their
positions so per-query history stays comparable.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
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
    "q90_lpa_communities",
    "q91_snapshot_diff",
    "q92_distribution_drift",
    # round-4 additions: boilerplate removal, duplicate-span tagging,
    # multimodal frame sampling — new operators start accumulating
    # per-round performance history immediately (round-3 verdict #8).
    "q93_boilerplate",
    "q94_dup_spans",
    "q95_frame_sample",
    "q96_temperature_mix",
    "q97_rolling_agg",
    "q98_numeric_drift",
    # round-5 additions: LSH pair-generator fidelity (approx + exact
    # twin + quality join; cheap at sf0.1 once the brute side spreads
    # across cores), then the five new curation operators — new names
    # append so per-query history stays position-comparable
    "q99_lsh_quality",
    "q100_apportion_budget",
    "q101_winsorize",
    "q102_exact_k_sample",
    "q103_quality_gate",
    "q104_corpus_profile",
    "q105_fill_budget",
    "q106_personalized_pagerank",
    # round-6 additions: hierarchy depth histogram (closure + two
    # map-side aggregates) and weighted Bernoulli sampling (zero
    # shuffle)
    "q107_depth_histogram",
    "q108_weighted_sample",
    "q109_json_extract",
    # round-7 additions: exact duplicated-span removal (gram-keyed
    # first-occurrence rank + in-row reassembly), topological depth
    # (frontier iteration over the raw edge list), and BM25 retrieval
    # (query-term-pruned tf + broadcast query side)
    "q110_span_removal",
    "q111_topo_depth",
    "q113_bm25_topk",
    "q115_hybrid_retrieval",
    "q118_star_rollup",
    # round-9 additions: the four certified-but-untimed round-7 names
    # (requested in the r7 verdict) plus this round's two new
    # operators — deterministic Lloyd training and the stored
    # dedup-index screen — so every certified operator carries
    # per-round timing + fingerprint history
    "q112_depth_histogram_roots",
    "q114_multi_profile",
    "q116_pivot",
    "q117_unpivot",
    "q119_kmeans_train",
    "q120_index_screen",
    "q121_retrieval_eval",
    "q122_ivf_trained_topk",
    "q123_quantize_recon",
    "q124_bpe_pair_stats",
    "q125_leakage_free_split",
    # round-10 additions: the four round-9 snapshot-tail operators
    # (k-core peel, SCD2 historization, hard-negative mining, BPE
    # training) plus this round's BPE tokenization — every certified
    # operator accumulates per-round timing + fingerprint history
    "q126_kcore",
    "q127_scd2_historize",
    "q128_hard_negatives",
    "q129_bpe_train",
    "q130_bpe_encode",
    "q131_exact_substring_spans",
    "q132_exact_substring_removal",
    "q133_doc_chunks",
    "q134_containment_pairs",
    "q135_interval_overlap",
    # round-11 additions: the containment-at-scale sketch screen (the
    # production counterpart q134's exact baseline measures) and the
    # certified persisted-IVF build/merge/search lifecycle
    "q136_containment_sketch",
    "q137_stored_ivf_search",
    "q138_substring_index_screen",
    "q139_bigram_logprob",
    "q140_cluster_balanced_sample",
    "q141_retrieval_pipeline",
    # round-12 additions: the certified shard-export lifecycle (write
    # + partitioned read-back + order re-derivation — carries its
    # per-invocation parquet write like the other stored-artifact
    # rows) and the one-call exact-budget mix composition
    "q142_shard_export",
    "q143_token_budget_mix",
    "q144_tokenizer_fertility",
    "q145_ngram_novelty",
    "q146_semantic_outlier_gate",
    "q147_winnow_fingerprints",
    # round-13 additions
    "q148_model_quality_gate",
    "q149_fixpoint_removal",
    "q150_bpe_train_deep",
    "q151_multimodal_neardup",
    "q152_ccnet_pipeline",
    "q153_fuzzy_join",
    "q154_gapfill_locf",
    "q155_adamic_adar",
    "q156_scc",
    "q157_assoc_pairs",
    "q158_random_walks",
    "q159_group_ols",
    "q160_vocab_drift",
    "q161_transition_matrix",
    "q162_categorical_profile",
    "q163_hll_lifecycle",
    "q164_cdc_apply",
    # round-14 additions: the frozen-gate-statistics lifecycle (the
    # fifth stored artifact — both rows carry their per-invocation
    # store build+write like the other lifecycle rows)
    "q165_frozen_gate_screen",
    "q166_ccnet_frozen_screen",
    "q167_bipartite_project",
    "q168_corpus_health",
    "q169_drift_baseline",
    "q170_robust_zscore",
    "q171_crosstab_chi2",
    "q172_ingest_micro_batch",
    "q173_binned_cutoff_screen",
    "q174_weighted_paths",
    "q175_boundary_chunks",
    "q176_pq_ivf_search",
    "q177_cutoff_calibration",
    "q178_semantic_join",
    # round-16 additions: the semantic-dedup (PQ-IVF) ingest store —
    # carries its per-invocation index build like the other
    # stored-lifecycle rows; the steady mode prices the screen alone
    "q179_semantic_ingest",
    # the stored-quantizer calibration report (per-invocation
    # build+merge+brute-force truth — the periodic job's full price)
    # and the URL/domain web-hygiene gate
    "q180_ivf_calibration",
    "q181_web_hygiene",
    # unigram-LM tokenizer training (driver-side EM over the
    # corpus-independent word table after one distributed count pass)
    "q182_unigram_train",
    # cross-encoder rerank of the q115 fused top-k (pair frame stays
    # top-k-sized; one corpus touch for the shortlist text fetch)
    "q183_rerank",
    # PQ-IVF calibration (per-invocation stored+fresh PQ builds +
    # brute-force truth — the periodic job's full price) and the
    # stored URL index in the ingest loop
    "q184_pq_calibration",
    "q185_url_ingest",
]

# The round-2 21-query gate subset (the driver's 2x-vs-baseline bar is
# judged on these names). Kept as a named subset so it can run as its
# OWN bench invocation — a fresh JVM with no 50+ preceding queries of
# accumulated JVM/GC/codegen state. Round 11's driver artifact had q32
# at 2.7x and q73 at 3.4x of their round-2 per-query records while
# their plan fingerprints were unchanged; because BENCH_r02 predates
# fingerprints, only a position-controlled reading (this subset, first
# thing in its own process) can adjudicate session-position load vs a
# real regression. Run: SPARK_GRAFT_BENCH_SUBSET=r2gate python bench.py
# Listed EXPLICITLY (review r12): HEADLINE[:21] was positional — any
# future insertion before index 21 would silently change the
# adjudicated query set, producing a normal-looking gate record over
# the wrong queries. These are the round-2 record's names, frozen.
R2_GATE = [
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
]
assert R2_GATE == HEADLINE[:21], (
    "R2_GATE must stay a prefix of HEADLINE — the gate subset is "
    "frozen to the round-2 record's names; append new queries after "
    "index 21, never insert before it"
)

SUBSETS = {"r2gate": R2_GATE, "full": HEADLINE}

# Run-varying atoms inside an executed-plan string: expression ids
# (#123), codegen/plan ids, exchange reuse ids, higher-order-function
# lambda variable numbering (x_1 vs x_11 across invocations), and
# temp-directory scan paths (q120 writes its index artifact to a fresh
# mkdtemp per invocation — the path is run-varying by construction,
# the plan over it is not). Everything else (operator tree, join
# strategies, pushed filters, partitioning) is the plan identity we
# want to pin across runs and rounds.
_PLAN_ID_RE = re.compile(
    r"#\d+|plan_id=\d+|\[id=#?\d+\]|, id=#?\d+|(?<=lambda )\w+_\d+"
    r"|/tmp/[^\s,\]\)]*"
    # Spark truncates long expression dumps (DataFilters etc.) at a
    # fixed char budget ending in "..." — run-varying id WIDTHS
    # upstream shift the cut point, so the word touching the ellipsis
    # differs by a character between invocations (q122's argmax
    # filter). Drop the truncated fragment; the untruncated prefix
    # still fingerprints the plan.
    r"|\S*\.\.\."
    # subexpression-elimination aliases (_common_expr_N) draw from a
    # GLOBAL counter, so the same plan gets a different N per run
    # (q159's covar² projection was the first to trip it). The alias
    # number carries no plan identity — strip it like expression ids.
    r"|_common_expr_\d+"
)


def _plan_fingerprint(df) -> str:
    s = df._jdf.queryExecution().simpleString()
    return hashlib.sha256(_PLAN_ID_RE.sub("", s).encode()).hexdigest()[:16]


def steady_main(sf_dir: str, sf_val) -> None:
    """Steady-state mode (SPARK_GRAFT_BENCH_SUBSET=steady): the
    certified stored-artifact queries rebuild their store per
    invocation BY DESIGN — the hash must cover build + sidecar +
    screen — which makes the headline number increasingly a measure
    of certification overhead, not engine speed (r14 VERDICT watch
    item). This mode prices the deployment loop instead: every store
    builds ONCE outside the timers, then each per-batch screen/search
    pass is timed cold + warm — the cost a long-lived ingest actually
    pays for batch N, which the lifecycle contracts say is
    independent of N. Same two-line JSON output, metric
    ``steady_state_screen_wall_time``."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ontology_graph_etl_spark import pipelines
    from ontology_graph_etl_spark.io import load_table
    from ontology_graph_etl_spark.operators import (
        dedup,
        gatestats,
        sketches,
        similarity,
        textops,
    )

    spark = get_spark(app_name="ontology-graph-etl-spark-bench-steady")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="bench_steady_")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    orders = load_table(spark, sf_dir, "orders")
    ref_docs = docs.where(F.col("doc_id") % 6 != 0)
    batch_docs = docs.where(F.col("doc_id") % 6 == 0)

    # ---- one-time builds (UNTIMED - the amortize-to-zero term) ----
    t0 = time.perf_counter()
    dd = scratch + "/bands"
    dedup.write_dedup_index(
        dedup.prepare_dedup_index(
            ref_docs, "doc_id", "text",
            num_hashes=64, bands=16, shingle_n=3, base_hash="xxhash64",
        ),
        dd, num_hashes=64, bands=16, shingle_n=3, base_hash="xxhash64",
    )
    ss = scratch + "/substr"
    textops.write_substring_index(ref_docs, ss, "doc_id", "text", min_len=30)
    cc = scratch + "/ccnet"
    gatestats.build_ccnet_store(
        ref_docs.select("doc_id", "text"), cc, langs=["en", "und"],
        keep_pct=34, lam=0.7,
    )
    bl = scratch + "/baseline"
    gatestats.build_drift_baseline(
        ref_docs, bl, cat_cols=["lang"], num_cols=["n_chars"]
    )
    hl = scratch + "/hll"
    sketches.write_cardinality_sketches(
        sketches.build_cardinality_sketches(ref_docs, ["lang"], "doc_id"),
        hl, ["lang"], "doc_id",
    )
    gc = scratch + "/cutoffs"
    gatestats.write_gate_cutoffs(
        gatestats.build_gate_cutoffs(
            orders.where(F.col("o_orderkey") % 2 == 0),
            "o_orderkey", "o_orderpriority", "o_totalprice", keep_pct=25,
        ),
        gc, "o_orderpriority", "o_totalprice", 25,
    )
    bc = scratch + "/binned"
    gatestats.build_binned_cutoff_store(
        docs.where(F.col("doc_id") % 3 != 0), bc, "lang", "n_chars", 40,
        n_bins=64,
    )
    ivf = scratch + "/ivf"
    similarity.write_ivf_index(
        emb.where(F.col("vec_id") % 5 != 0), ivf, num_lists=8,
        train_rounds=0,
    )
    pq = scratch + "/pq"
    similarity.write_pq_ivf_index(
        emb.where(F.col("vec_id") % 4 != 0), pq, num_lists=8, m=4, ksub=16,
    )
    build_sec = round(time.perf_counter() - t0, 3)

    screens = {
        "dedup_band_screen": lambda: dedup.screen_against_index(
            spark, dd, batch_docs, "doc_id", "text", threshold=0.5
        ),
        "substring_screen": lambda: textops.screen_against_substring_index(
            spark, ss, batch_docs, "doc_id", "text"
        ),
        "ccnet_screen": lambda: gatestats.screen_ccnet_frozen(
            spark, cc, batch_docs.select("doc_id", "text")
        ),
        "gate_screen": lambda: gatestats.screen_against_cutoffs(
            spark, gc,
            orders.where(F.col("o_orderkey") % 2 == 1).select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
        ),
        "binned_cutoff_screen": lambda:
            gatestats.screen_against_binned_cutoffs(
                spark, bc, docs.where(F.col("doc_id") % 3 == 0)
            ),
        "drift_psi": lambda: gatestats.psi_against_baseline(
            spark, bl, batch_docs
        ),
        "hll_estimate": lambda: sketches.estimate_cardinality(
            spark, hl, ["lang"]
        ),
        "ivf_search": lambda: similarity.search_ivf_index(
            spark, ivf, emb.where(F.col("vec_id") < 10), k=5, nprobe=3
        ),
        "pq_ivf_search": lambda: similarity.search_pq_ivf_index(
            spark, pq, emb.where(F.col("vec_id") % 43 == 0), emb,
            k=5, nprobe=3, rescore_mult=10,
        ),
        "semantic_screen": lambda: similarity.screen_pq_ivf_index(
            spark, pq, emb.where(F.col("vec_id") % 4 == 0),
            threshold=0.35, nprobe=3,
        ),
        "ingest_composition": lambda: pipelines.ingest_micro_batch(
            spark, batch_docs, "doc_id", "text",
            dedup_index_path=dd, substring_index_path=ss,
            ccnet_store_dir=cc, drift_baseline_path=bl,
            hll_store_path=hl, merge_accepted=False,
        ),
    }
    def run_once(fn) -> float:
        # crc-over-every-column action, NOT bare .count(): several
        # screens end in keyed left joins that Catalyst join-eliminates
        # under a column-free count — we'd time only the batch scan
        # (the /verify recipe's timing gotcha)
        start = time.perf_counter()
        df = fn()
        df.agg(
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "|", *[F.col(c).cast("string") for c in df.columns]
                    )
                )
            )
        ).collect()
        return round(time.perf_counter() - start, 3)

    load_before = os.getloadavg()
    timings, warm = {}, {}
    for name, fn in screens.items():
        timings[name] = run_once(fn)
        warm[name] = run_once(fn)
    shutil.rmtree(scratch, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "steady_state_screen_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_warm": round(sum(warm.values()), 3),
        "queries_warm": warm,
        "store_build_sec": build_sec,
        "sf": sf_val,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(full, separators=(",", ":")))
    summary = dict(full)
    summary.pop("queries_warm")
    summary.pop("loadavg_before")
    summary.pop("loadavg_after")
    print(json.dumps(summary, separators=(",", ":")))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    subset = os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "full")
    if subset == "steady":
        sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
        steady_main(sf_dir, sf_val)
        return
    headline = SUBSETS.get(subset)
    if headline is None:
        # comma-separated explicit names: any unknown name is an
        # ERROR, not a silent drop — a typo in an adjudication run
        # must not produce a normal-looking record over the wrong set
        headline = [n for n in subset.split(",") if n]
        unknown = [n for n in headline if n not in set(HEADLINE)]
        if unknown or not headline:
            raise SystemExit(
                f"unknown bench subset/queries: {unknown or subset!r} "
                f"(named subsets: {sorted(SUBSETS)})"
            )
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

    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    plans: dict[str, str] = {}
    plans_unstable: list[str] = []
    for name in headline:
        # construction stays INSIDE the timed window: iterative queries
        # (pagerank/closure/LPA) run jobs while building their result
        # frame, and rounds 1-3 timed exactly construction + count
        start = time.perf_counter()
        cold_df = registry[name](spark, sf_dir)
        cold_df.count()
        timings[name] = round(time.perf_counter() - start, 3)
        fp_cold = _plan_fingerprint(cold_df)  # after count: outside timing
        _release_checkpoints()
        start = time.perf_counter()
        warm_df = registry[name](spark, sf_dir)
        warm_df.count()
        warm[name] = round(time.perf_counter() - start, 3)
        if _plan_fingerprint(warm_df) != fp_cold:
            plans_unstable.append(name)
        plans[name] = fp_cold
        _release_checkpoints()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_warm": round(sum(warm.values()), 3),
        "queries_warm": warm,
        "sf": sf_val,
        "plans": plans,
        "plans_unstable": plans_unstable,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    # The driver records only the LAST ~2000 chars of stdout and parses
    # the final complete JSON line it finds. Round 4's single full-record
    # line outgrew that capture once `plans` was embedded, truncating the
    # headline `value` off the FRONT and leaving BENCH_r04 `parsed: null`.
    # Contract since round 5: the full record (fingerprints, warm dict,
    # loadavg — the human/judge view) prints FIRST, and a short summary
    # line prints LAST — headline numbers + the cold per-query dict +
    # one sha256 over the canonical plans dict (plan identity is still
    # checkable round-over-round: same plans => same sha). The summary
    # stays well under the capture window (~1.3k chars at 33 queries).
    print(json.dumps(full, separators=(",", ":")))
    plans_sha = hashlib.sha256(
        json.dumps(plans, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()[:16]
    # Round-10 regression: the full-name 3-decimal `queries` dict
    # outgrew 1800 chars at 69 queries, the guard popped it, and
    # BENCH_r10 lost per-query times entirely — the identical-
    # fingerprint/divergent-times adjudication then needed
    # builder-local anchors. Contract since round 11: the summary's
    # `queries` dict is COMPACT (short qNN keys, 1-decimal seconds —
    # ~12 chars a query, ≈1.2k at 100 queries) so it stays inside the
    # driver's ~2000-char tail capture; full-name 3-decimal timings
    # remain in the first-line full record.
    summary = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "value_warm": round(sum(warm.values()), 3),
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": {
            n.split("_", 1)[0]: round(t, 1) for n, t in timings.items()
        },
        "plans_sha": plans_sha,
        "plans_unstable_n": len(plans_unstable),
    }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1800:  # belt-and-braces: never outgrow the capture
        summary.pop("queries")
        line = json.dumps(summary, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
