"""Mergeable cardinality sketches — a stored HyperLogLog lifecycle.

The fourth stored-artifact lifecycle (dedup bands, IVF lists,
substring fingerprints, now cardinality registers): per-group
DataSketches HLL sketches built once, persisted as parquet binary,
appended per ingest batch in O(batch), and unioned at query time —
corpus-free distinct counting for dashboards, drift monitors and
mixture planners. HLL register merge is a pointwise max, so
estimates are ORDER-INDEPENDENT and deterministic for a given input
set: the same corpus always yields the same estimate, which is what
lets a driver-checked query project estimation quality into a
hash-checkable boolean (the q53 approx-aggregate contract-oracle
pattern).

Engine notes: `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` are Spark 3.5+ built-ins (Apache DataSketches
HLL_4); lg_k = 12 gives ~1.6 % relative standard error at ~4 KB per
group. All three run JVM-side with map-side partial aggregation —
the sketch IS the partial aggregate, which is the whole point at
100 TB: per-executor registers merge up a tree instead of shuffling
raw values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import read_json_sidecar, write_json_sidecar

_SIDECAR = "_hll_params.json"
_PARAM_KEYS = ("lg_k", "group_cols", "value_col")


def build_cardinality_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + row count per group over
    ``value_col``. Null values are skipped by the sketch (never
    counted); ``n_rows`` counts all rows for audit."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def write_cardinality_sketches(
    sketches: DataFrame,
    path: str,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    mode: str = "overwrite",
) -> None:
    """Persist per-group sketches with their parameter sidecar.
    ``mode="append"`` is the ingest-batch maintenance path: O(batch)
    file adds, the stored rows are never read or rewritten; the
    sidecar's lg_k/value_col are validated first — unioning registers
    built under a different lg_k silently corrupts estimates, so a
    mismatch refuses loudly."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = sketches.sparkSession
    params = {
        "lg_k": int(lg_k),
        "group_cols": list(group_cols),
        "value_col": str(value_col),
    }
    if mode == "append":
        stored = read_json_sidecar(
            spark,
            path,
            _SIDECAR,
            _PARAM_KEYS,
            "hll sketch store",
            "rebuild via write_cardinality_sketches(mode='overwrite')",
        )
        got = {k: stored[k] for k in _PARAM_KEYS}
        if got != params:
            raise ValueError(
                f"hll sketch store at {path} was built with {got}; "
                f"refusing to append rows built with {params}"
            )
    sketches.write.mode(mode).parquet(path)
    if mode == "overwrite":
        write_json_sidecar(spark, path, _SIDECAR, params)


def merge_cardinality_sketches(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> None:
    """Ingest-batch maintenance: sketch the batch under the STORED
    parameters and append — the stored registers are never read;
    re-unioning happens lazily at estimate time (HLL union is
    associative and commutative, so batch granularity is free)."""
    stored = read_json_sidecar(
        spark,
        path,
        _SIDECAR,
        _PARAM_KEYS,
        "hll sketch store",
        "rebuild via write_cardinality_sketches(mode='overwrite')",
    )
    sk = build_cardinality_sketches(
        batch, group_cols, value_col, lg_k=int(stored["lg_k"])
    )
    write_cardinality_sketches(
        sk,
        path,
        group_cols,
        value_col,
        lg_k=int(stored["lg_k"]),
        mode="append",
    )


def estimate_cardinality(
    spark: SparkSession, path: str, group_cols: Sequence[str]
) -> DataFrame:
    """Union the stored registers per group and estimate: one scan of
    the sketch store (groups × batches rows, corpus-free), one
    group-keyed union-merge, one estimate per group. Returns
    ``(group..., estimate, n_rows)`` with ``n_rows`` the audit row
    total across batches."""
    read_json_sidecar(
        spark,
        path,
        _SIDECAR,
        _PARAM_KEYS,
        "hll sketch store",
        "rebuild via write_cardinality_sketches(mode='overwrite')",
    )
    stored = spark.read.parquet(path)
    return stored.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def compact_cardinality_sketches(spark: SparkSession, path: str) -> int:
    """Rewrite the sketch store as ONE register row per group —
    unions all batch rows' registers (`hll_union_agg`, the same
    merge the estimator performs lazily) and sums the audit row
    counts, so estimate-time cost drops from groups × batches rows
    to groups rows. Estimates are unchanged by construction: HLL
    union is associative, commutative and idempotent, so pre-merging
    batches is exactly the estimator's own fold.

    Crash-atomic staged swap, the :func:`textops.
    compact_substring_index` device verbatim: write the compacted
    generation to ``<path>.compact``, copy the sidecar, then two
    renames (live → ``.old``, staged → live). A crash between
    renames leaves both complete generations on disk; rename either
    back to recover. SINGLE WRITER REQUIRED — a concurrent
    :func:`merge_cardinality_sketches` appending between the staged
    read and the first rename writes into what becomes ``.old`` and
    is deleted after the swap; serialize merges and compactions
    through one writer. Returns the compacted row (group) count.
    """
    from .util import hadoop_path_and_fs

    stored_params = read_json_sidecar(
        spark,
        path,
        _SIDECAR,
        _PARAM_KEYS,
        "hll sketch store",
        "rebuild via write_cardinality_sketches(mode='overwrite')",
    )
    base = path.rstrip("/")
    staged = base + ".compact"
    group_cols = list(stored_params["group_cols"])
    merged = (
        spark.read.parquet(base)
        .groupBy(*group_cols)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )
    merged.write.mode("overwrite").parquet(staged)
    n = spark.read.parquet(staged).count()
    write_json_sidecar(spark, staged, _SIDECAR, stored_params)
    cur, fs = hadoop_path_and_fs(spark, base)
    new, _ = hadoop_path_and_fs(spark, staged)
    old, _ = hadoop_path_and_fs(spark, base + ".old")
    fs.delete(old, True)
    if not fs.rename(cur, old):
        raise IOError(f"hll compaction: could not stage out {base}")
    if not fs.rename(new, cur):
        fs.rename(old, cur)
        raise IOError(f"hll compaction: could not swap in {staged}")
    fs.delete(old, True)
    return int(n)
