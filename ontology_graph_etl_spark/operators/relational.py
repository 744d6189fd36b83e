"""Relational operator core (SURVEY.md §2.3-2.4, §2.7).

The reference implements these as per-row Python `if`s and dict lookups
(main.py:292-295, 335-336, 351-355); here each is a lazy DataFrame
transform. Join strategy is left to Catalyst/AQE except where a side is
known-small, which we hint with ``broadcast`` (the reference's in-memory
dict lookup, main.py:335-336, IS a broadcast hash join semantically).
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import broadcast_if_small, epoch_double, epoch_units


def prefix_scan(df: DataFrame, order_col: str, stop_predicate: Column) -> DataFrame:
    """S5 — ordered-prefix scan: rows strictly before the first row (in
    ``order_col`` order) satisfying ``stop_predicate``.

    Mirrors the reference's "break at first empty key" Excel loop
    (main.py:285-286). Order-dependent semantics need an explicit order
    column in an unordered engine (SURVEY.md §7 risks). Computed as a
    min-aggregate + cross-joined scalar so it stays a two-stage
    distributed plan (no window over a global sort, no driver collect).
    """
    boundary = df.where(stop_predicate).agg(
        F.min(order_col).alias("__stop_at")
    )
    return (
        df.crossJoin(F.broadcast(boundary))
        .where(
            F.col("__stop_at").isNull() | (F.col(order_col) < F.col("__stop_at"))
        )
        .drop("__stop_at")
    )


def project_by_ordinal(df: DataFrame, mapping: dict[str, int]) -> DataFrame:
    """S6 — config-driven column projection by ordinal.

    The reference drives extraction from ``worksheet_metadata`` ordinal
    configs (main.py:182-266, row[column_node1_id] at main.py:292-293);
    here the config is ``{out_name: ordinal}`` applied to any DataFrame.
    """
    cols = df.columns
    return df.select(
        *[F.col(cols[ordinal]).alias(out) for out, ordinal in mapping.items()]
    )


def lookup_join(
    df: DataFrame, mapping: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """J1 — broadcast hash lookup join (reference dict lookup,
    main.py:335-336, 351-352). The mapping side is broadcast: at 100 TB
    the fact side never shuffles for a dimension lookup."""
    return df.join(F.broadcast(mapping), on, how)


def anti_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J2 — anti join (the reference's printed ``'not found: '`` audit,
    main.py:354-355, relationalized)."""
    return df.join(F.broadcast(other), on, "left_anti")


def semi_contains_join(
    lines: DataFrame, probes: DataFrame, line_col: str, probe_col: str
) -> DataFrame:
    """J4 — substring semi join (theta): keep lines containing any probe
    value (reference's commented-out missing-id scan, main.py:385-398).

    Broadcast nested-loop is the only strategy for a contains-theta join;
    correct at scale only because the probe side is small — which is the
    precondition the reference's use case satisfies (a list of ids).
    """
    return lines.join(
        F.broadcast(probes),
        F.expr(f"contains({line_col}, cast({probe_col} as string))"),
        "left_semi",
    )


def conditional_props(
    df: DataFrame, id_cols: Sequence[str], prop_cols: Sequence[str]
) -> DataFrame:
    """P2 — conditional property inclusion: empty-string properties become
    null (the reference omits falsy properties from generated Cypher,
    main.py:64-77; relationally that is a null, SURVEY.md §2.3)."""
    keep = [F.col(c) for c in id_cols]
    props = [
        F.when(
            F.col(c).isNotNull() & (F.col(c).cast("string") != ""), F.col(c)
        ).alias(c)
        for c in prop_cols
    ]
    return df.select(*keep, *props)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Top-k: ``orderBy().limit()`` — Spark plans this as TakeOrderedAndProject
    (per-partition heap + driver merge of k rows), never a global sort.
    Callers must include a unique tie-break column for determinism."""
    return df.orderBy(*order_by).limit(k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi join: append a random salt (0..num_salts-1) to
    the (large, skewed) left side's key and replicate each right-side row
    once per salt value, then join on (key, salt).

    This splits a hot key's rows across ``num_salts`` reducers at the
    cost of replicating the right side ``num_salts``×. Use when a single
    key dominates (AQE's skew-join splits sort-merge partitions, but a
    build-side megakey on a non-broadcastable join still serializes);
    for ordinary skew prefer plain join + AQE.

    ``F.rand`` is seeded per-partition by Spark — the salt is
    nondeterministic but the JOIN RESULT is identical to the unsalted
    join for the supported join types (every left row still meets every
    matching right row exactly once, because the right side carries all
    salt values). Right/full outer joins are rejected: an unmatched
    right row would surface once per salt replica.
    """
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "cross"
    ):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right "
            "rows are replicated per salt (use a plain join + AQE)"
        )
    salt = (F.rand() * num_salts).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(num_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join: each ``points`` row is matched to
    every ``intervals`` row with ``start <= point < end`` (half-open).
    Columns are compared on their original types; ``bucket_width`` is in
    the units of the columns' epoch/long cast (seconds for timestamps).

    Spark plans a raw inequality join as broadcast-nested-loop — O(n·m)
    and a driver-memory bomb at scale. The scalable composition buckets
    the domain: every interval is replicated to each ``bucket_width``-
    sized bucket it overlaps (``sequence`` + ``explode`` — JVM-side, no
    UDF), points land in exactly one bucket, and the match becomes an
    EQUI join on bucket id plus a residual range filter. Shuffle cost is
    O(n + m·avg_spans); pick ``bucket_width`` ≈ the typical interval
    length so most intervals replicate to ~2 buckets. Intervals with
    NULL or inverted bounds produce no matches (dropped pre-join).
    """
    if how != "inner":
        raise ValueError("interval_join supports only how='inner'")
    p_units, per_s = epoch_units(
        F.col(point_col), points.schema[point_col].dataType
    )
    s_units, _ = epoch_units(
        F.col(start_col), intervals.schema[start_col].dataType
    )
    e_units, _ = epoch_units(
        F.col(end_col), intervals.schema[end_col].dataType
    )
    # timestamps bucket in microsecond units (sub-second exact, and the
    # only ANSI-legal epoch form); numeric domains bucket in their own
    # units. bucket_width stays in seconds either way.
    width = bucket_width * per_s
    p_bucket = F.floor(p_units / width)
    i = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) < F.col(end_col))
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(s_units / width),
                # end is exclusive: a bucket starting exactly at `end`
                # cannot contain a match
                F.floor((e_units - 1) / width),
            )
        ),
    )
    p = points.withColumn("__bucket", p_bucket)
    return (
        p.join(i, "__bucket")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    direction: str = "backward",
    tolerance: float | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """As-of join: each left row is matched with the single right row of
    the same key nearest in time — ``direction="backward"`` takes the
    latest ``right_ts <= left_ts`` (equality matches),
    ``direction="forward"`` the earliest ``right_ts >= left_ts`` — the
    pandas/polars ``merge_asof`` surface. ``tolerance`` (seconds for
    temporal columns, same units for numeric ones) nulls the payload
    when the matched row is further than that from the left timestamp.

    Spark has no as-of join operator; the scalable composition is
    union + window: tag both sides, sort each key partition by
    (ts, side), and carry the last-seen right payload forward with
    ``last(ignorenulls)``. ONE hash shuffle on the key, no range
    explosion, no per-key driver loop — the plan a 100 TB event/feature
    join needs. (A join + filter + rank formulation explodes to all
    key-pairs before pruning; this never materializes them.)

    SKEW POSTURE: per-key as-of semantics inherently serialize each
    key's rows into one window partition, so one hot key (a symbol with
    half the ticks, a device with half the events) becomes one
    straggler task. ``bucket_width`` (same units as ``tolerance``)
    activates the segmented plan: rows hash-shuffle on
    ``(key, floor(ts/width))`` so a hot key's timeline splits into many
    parallel partitions; each segment scans locally, and cross-segment
    carry-in is resolved on the per-segment AGGREGATE frame (one row
    per (key, segment) — the same hierarchical-prefix trick as
    sequence packing, textops.py::pack_sequences). Output is identical
    to the default plan (property-tested); cost is one extra small
    shuffle, so reach for it when a key can exceed ~a few million rows,
    and size ``bucket_width`` so a hot key spreads over hundreds of
    segments. The hot-key partition ceases to exist rather than being
    worked around.

    Right rows with duplicate (key, ts) are resolved latest-wins by
    their sort order; pre-dedup the right side for full determinism.
    Returns all left columns plus ``payload_cols`` from the right side.

    The carried value is a STRUCT of all payload columns (plus the
    matched ``right_ts``, for tolerance), not per-column
    ``last(ignorenulls)``: the struct is non-null whenever a right row
    exists, so a matched row's NULL payload field stays NULL (per-column
    carry would skip it and leak an older row's value), and all payload
    fields always come from the SAME right row.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof_join direction {direction!r}")
    l = left.withColumn("__is_left", F.lit(1))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias(left_ts),
            F.struct(
                F.col(right_ts).alias("__match_ts"),
                *[F.col(c) for c in payload_cols],
            ).alias("__rp"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    # null struct on the left side, typed like the real payload struct
    l = l.withColumn("__rp", F.lit(None).cast(r.schema["__rp"].dataType))
    unioned = l.select(r.columns).unionByName(r)
    backward = direction == "backward"
    if bucket_width is None:
        if backward:
            # right rows sort before left rows at equal ts → equality
            # matches; carry the last-seen right struct forward
            w = (
                Window.partitionBy(on)
                .orderBy(F.col(left_ts).asc(), F.col("__is_left").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            match = F.last(F.col("__rp"), ignorenulls=True).over(w)
        else:
            # left rows sort before right rows at equal ts → equality
            # matches; take the first right struct at-or-after
            w = (
                Window.partitionBy(on)
                .orderBy(F.col(left_ts).asc(), F.col("__is_left").desc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            match = F.first(F.col("__rp"), ignorenulls=True).over(w)
        carried = unioned.withColumn("__match", match)
    else:
        carried = _asof_segmented(
            unioned, on, left_ts, backward, bucket_width
        )
    if tolerance is not None:
        # __match_ts keeps the RIGHT column's original type inside the
        # struct (the union may have widened the top-level ts column),
        # so each side converts to epoch seconds with its own dtype —
        # mixing them (e.g. date vs timestamp) would compute wrong gaps.
        left_ts_dt = carried.schema[left_ts].dataType
        right_ts_dt = right.schema[right_ts].dataType
        gap = F.abs(
            epoch_double(F.col("__match").getField("__match_ts"), right_ts_dt)
            - epoch_double(F.col(left_ts), left_ts_dt)
        )
        carried = carried.withColumn(
            "__match", F.when(gap <= tolerance, F.col("__match"))
        )
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col("__match").getField(c).alias(c) for c in payload_cols],
        )
    )


def _asof_segmented(
    unioned: DataFrame,
    on: str,
    ts: str,
    backward: bool,
    width: float,
) -> DataFrame:
    """Skew-resistant as-of carry: partition the tagged union by
    ``(key, floor(ts/width))`` so a hot key's timeline parallelizes.

    Three stages, all shuffling on (key, segment) except the tiny
    carry window:

    1. in-segment scan — the usual (ts, side) window, but per segment;
    2. per-segment boundary — each segment's last (backward) / first
       (forward) right struct, ONE ROW per (key, segment);
    3. carry-in — on that aggregate frame, the last/first non-null
       boundary over strictly earlier/later segments. This window is
       per-key again but over segment COUNTS (thousands), not row
       counts (millions) — if keys ever span millions of segments,
       apply the same trick recursively.

    A left row's match = its in-segment match, else the carry-in.
    """
    from pyspark.sql import Window

    dt = unioned.schema[ts].dataType
    seg = F.floor(epoch_double(F.col(ts), dt) / F.lit(float(width)))
    u = unioned.withColumn("__seg", seg)
    if backward:
        w_in = (
            Window.partitionBy(on, "__seg")
            .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = F.last("__rp", ignorenulls=True).over(w_in)
    else:
        w_in = (
            Window.partitionBy(on, "__seg")
            .orderBy(F.col(ts).asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        within = F.first("__rp", ignorenulls=True).over(w_in)
    u = u.withColumn("__within", within)
    right_rows = u.where(F.col("__is_left") == 0)
    pick = F.max_by if backward else F.min_by
    seg_bound = right_rows.groupBy(on, "__seg").agg(
        pick("__rp", F.col(ts)).alias("__bound")
    )
    segs = (
        u.select(on, "__seg")
        .distinct()
        .join(seg_bound, [on, "__seg"], "left")
    )
    if backward:
        w_c = (
            Window.partitionBy(on)
            .orderBy(F.col("__seg").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = F.last("__bound", ignorenulls=True).over(w_c)
    else:
        w_c = (
            Window.partitionBy(on)
            .orderBy(F.col("__seg").asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry = F.first("__bound", ignorenulls=True).over(w_c)
    carry_df = segs.select(on, "__seg", carry.alias("__carry"))
    return u.join(carry_df, [on, "__seg"], "left").withColumn(
        "__match", F.coalesce("__within", "__carry")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Deterministic per-stratum sampling: a row survives iff the first
    4 md5 hex digits of its key fall below its stratum's threshold
    (``floor(fraction * 2^16)`` in hex).

    Unlike ``df.sampleBy`` (seeded RNG whose draws move with
    partitioning and row order), the keep/drop decision is a pure
    per-row function of the key — stable across runs, engines,
    partitionings, and appends (a re-ingested row keeps its fate), and
    reproducible in any engine with md5 (the DuckDB oracle q68 checks
    exactly that). Zero shuffle, zero state — the 100 TB form of "give
    me 10% of each stratum". Strata absent from ``fractions`` are
    dropped; fractions ≥ 1.0 keep the whole stratum.
    """
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        in_stratum = F.col(strata_col) == stratum
        if frac >= 1.0:
            cond = in_stratum
        else:
            threshold = format(max(int(frac * 65536), 0), "04x")
            cond = in_stratum & (h < F.lit(threshold))
        keep = keep | cond
    return df.where(keep)


def domain_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Resample to a target domain mixture: keep as many rows as possible
    while the surviving rows' domain proportions match ``weights``
    (integer percents). The standard pre-training "mix web/code/books at
    40/30/30" step.

    Two passes. Pass 1 aggregates per-domain counts — a handful of rows
    regardless of corpus size (domains are few by construction), safe to
    bring to the driver. The largest exactly-mixed output is
    ``T = min_d(count_d * 100 // weight_d)`` — the most-underrepresented
    domain binds everything else. Pass 2 is a pure per-row filter: a row
    survives iff the first 8 md5 hex digits of its key (a uniform 32-bit
    integer) fall under its domain's integer-arithmetic threshold
    ``(weight*T//100) * 2^32 // count_d``. Like
    :func:`stratified_sample` this is deterministic across runs, engines,
    and partitionings, costs zero shuffles on the data pass, and is
    reproducible in any engine with md5 (oracle q75). Per-domain output
    sizes are binomial around the target (hash sampling is rate-based,
    not exact-count); domains absent from ``weights`` are dropped.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return _mix_by_integer_weights(df, key_col, domain_col, counts, weights, 100)


def _mix_by_integer_weights(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    counts: dict,
    weights: dict,
    scale: int,
) -> DataFrame:
    """Shared mixing core: keep-rate thresholds from integer weights on
    an integer ``scale`` — all-integer arithmetic, so the thresholds
    (and therefore the surviving row set) are engine-portable."""
    active = {
        d: w for d, w in weights.items() if w > 0 and counts.get(d, 0) > 0
    }
    if not active:
        return df.where(F.lit(False))
    total = min(counts[d] * scale // w for d, w in active.items())
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    keep = F.lit(False)
    for d, w in active.items():
        target = w * total // scale
        cut = target * (1 << 32) // counts[d]
        keep = keep | ((F.col(domain_col) == d) & (h < F.lit(cut)))
    return df.where(keep)


def temperature_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
) -> DataFrame:
    """Temperature-scaled domain resampling at alpha = 0.5 (the
    UniMax/multilingual-sampling move): target shares are proportional
    to ``sqrt(count_d)`` instead of raw counts, flattening the head
    domains and boosting the tail without any hand-written weight
    table. Down-sampling only (an engine can't invent rows): the output
    is the largest total whose per-domain shares match the sqrt
    weights, with the most-underrepresented domain binding the rest.

    Engine-portability is why alpha is PINNED at 0.5: ``sqrt`` is
    correctly rounded under IEEE 754, so ``floor(sqrt(n))`` equals
    Python's ``math.isqrt(n)`` for any count below 2^52 and the integer
    thresholds derived from it are bit-identical in every engine —
    a float ``pow(n, alpha)`` is NOT correctly rounded and may differ
    in the last ulp across libm implementations, which would flip
    thresholds and break hash-compared oracles (q96). For other
    temperatures, compute a weight table offline and call
    :func:`domain_mix`.

    Same cost shape as domain_mix: one tiny per-domain count aggregate,
    then a zero-shuffle per-row md5-threshold filter.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weights = {d: math.isqrt(n) for d, n in counts.items()}
    return _mix_by_integer_weights(
        df, key_col, domain_col, counts, weights, max(1, sum(weights.values()))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    max_weight: int | None = None,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each row with
    probability ``weight / max_weight`` — the soft quality-sampling
    move (CCNet/RefinedWeb-style "sample proportional to the quality
    score" instead of a hard gate), as a pure per-row function of the
    key. The uniform draw is the first 8 md5 hex digits of the key (a
    32-bit uniform); the per-row threshold is
    ``hex8(weight * 2^32 div max_weight)`` — integral weights
    (enforced) and integer division make the kept set bit-identical
    across engines, runs, partitionings, and appends, exactly like
    :func:`stratified_sample`'s fixed thresholds but with the
    threshold varying per row.

    ``max_weight=None`` computes the exact column max (one two-scalar
    aggregate, broadcast back — the :func:`winsorize` shape); pass a
    constant to pin the normalization across snapshots (so a new
    heavier document can't silently re-scale everyone's keep
    probability). Rows with ``weight >= max_weight`` always keep
    (probability capped at 1); ``weight <= 0`` never keeps.

    Scale shape: zero-shuffle scan-speed filter (plus the tiny max
    aggregate when ``max_weight`` is computed). The threshold is pure
    BIGINT arithmetic (``least(w, max_w) * 2^32 div max_w`` — never a
    float or rounding decimal, so the floor matches DuckDB's exact
    ``//`` to the bit); the normalizer must stay below 2^31 (any
    realistic char/token/byte count does) and BOTH paths enforce it —
    an explicit ``max_weight`` raises ``ValueError`` up front, the
    computed max carries an in-plan ``raise_error`` guard so an
    over-bound weight column fails loudly instead of overflowing the
    2^32 product.
    """
    _require_integral_weights(df, weight_col, "weighted_sample")
    w = F.col(weight_col)
    if max_weight is None:
        if "__mw" in df.columns:
            raise ValueError("weighted_sample internal column __mw exists")
        # Same < 2^31 bound the explicit-constant path validates: a
        # computed max at or above it would overflow the
        # least(w, mw) * 2^32 BIGINT product (ANSI errors opaquely,
        # non-ANSI silently wraps and diverges from any oracle). The
        # guard lives inside the one-row aggregate so the plan stays
        # lazy — no extra driver-side collect.
        guarded = df.agg(F.max(w).cast("long").alias("__mw_raw")).select(
            F.when(
                F.col("__mw_raw").isNull() | (F.col("__mw_raw") < 2**31),
                F.col("__mw_raw"),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"weighted_sample: computed max of {weight_col}"
                            " is "
                        ),
                        F.col("__mw_raw").cast("string"),
                        F.lit(
                            " >= 2^31; pass an explicit max_weight or"
                            " rescale the weight column"
                        ),
                    )
                )
            )
            .alias("__mw")
        )
        d = df.crossJoin(F.broadcast(guarded))
        mw: Column = F.col("__mw")
        num = f"(least(CAST(`{weight_col}` AS BIGINT), __mw) * 4294967296)"
        thr_expr = F.expr(f"{num} div __mw")
    else:
        if not (0 < max_weight < 2**31):
            raise ValueError(
                f"max_weight must be in (0, 2^31), got {max_weight}"
            )
        d = df
        mw = F.lit(int(max_weight)).cast("long")
        num = (
            f"(least(CAST(`{weight_col}` AS BIGINT), "
            f"{int(max_weight)}) * 4294967296)"
        )
        thr_expr = F.expr(f"{num} div {int(max_weight)}")
    h8 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr = F.format_string("%08x", thr_expr)
    keep = (
        F.when(w.isNull() | (w <= 0), F.lit(False))
        .when(w >= mw, F.lit(True))
        .otherwise(h8 < thr)
    )
    return d.where(keep).select(*df.columns)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Dataset snapshot diff — the recurring-ingest audit: full outer
    join on ``id_col``, each id classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` by comparing ``compare_cols``
    (null-safe, via a md5 over the concatenated null-tagged values so
    arbitrarily many columns compare in one expression). One
    co-partitioned shuffle join; at 100 TB both sides are scans plus
    one exchange each on the id.
    """

    def _fp(side: DataFrame) -> DataFrame:
        tagged = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in compare_cols
        ]
        return side.select(
            F.col(id_col),
            F.md5(F.concat_ws("\x01", *tagged)).alias("__fp"),
        )

    o = _fp(old).withColumnRenamed("__fp", "__fp_old")
    n = _fp(new).withColumnRenamed("__fp", "__fp_new")
    status = (
        F.when(F.col("__fp_old").isNull(), "added")
        .when(F.col("__fp_new").isNull(), "removed")
        .when(F.col("__fp_old") != F.col("__fp_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(F.col(id_col), status.alias("status"))
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    category_col: str,
    min_share: float = 1e-6,
) -> DataFrame:
    """Categorical distribution drift between two snapshots: per
    category, the share in each side and the PSI contribution
    ``(share_a - share_b) * ln(share_a / share_b)`` (Population
    Stability Index — sum the column for the headline drift score;
    > 0.2 conventionally means action). Shares clamp at ``min_share``
    so categories present on one side only contribute finite terms.

    Single-pass union-pivot plan (round-5 rewrite): tag each side, one
    map-side-combined groupBy over the union counts both sides per
    category, and the two totals come from one unpartitioned window
    over the category-sized count table. The earlier per-side
    agg + crossJoin + full-outer-join form forked each side's count
    subtree into two consumers with no exchange reuse — each snapshot
    was SCANNED TWICE per action (4 FileScans for 2 sides; at 100 TB
    the scan is the whole cost). Now: one scan per side, ONE shuffle
    total, no join at all — a category absent from a side simply
    counts 0 there, which is exactly the full-outer semantics.
    """
    tagged = a.select(
        F.col(category_col).alias("category"), F.lit(0).alias("__s")
    ).unionByName(
        b.select(F.col(category_col).alias("category"), F.lit(1).alias("__s"))
    )
    counts = tagged.groupBy("category").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("__nb"),
    )
    w = Window.partitionBy()  # count table is category-sized: tiny
    counts = counts.select(
        "category",
        (F.col("__na") / F.sum("__na").over(w)).alias("share_a"),
        (F.col("__nb") / F.sum("__nb").over(w)).alias("share_b"),
    )
    ca = F.greatest(F.coalesce("share_a", F.lit(0.0)), F.lit(min_share))
    cb = F.greatest(F.coalesce("share_b", F.lit(0.0)), F.lit(min_share))
    return (
        counts
        .select(
            "category",
            F.round(ca, 6).alias("share_a"),
            F.round(cb, 6).alias("share_b"),
            F.round((ca - cb) * F.log(ca / cb), 6).alias("psi_contrib"),
        )
    )


def rolling_time_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    out_prefix: str = "",
    bucket_width: int | None = None,
) -> DataFrame:
    """Per-row trailing time-window aggregate: for every event, the
    count and sum of ``value_col`` over the same key's events in
    ``[ts - window_seconds, ts]`` — the RANGE-frame window (peers by
    time distance, not row position) behind moving averages, rate
    limits, and rolling health metrics.

    The sum is emitted in integer cents (``sum_cents``): the timestamp
    goes through the ANSI-safe epoch conversion (micros for timestamps,
    seconds for dates/numerics — util.epoch_units) for the frame bound,
    and the value becomes a half-up-rounded integer before aggregation, so the result is exact
    and engine-portable — a float sum accumulates in shuffle order and
    flips last-ulp digits across engines, which a rounded projection
    can still leak at bucket boundaries.

    ``out_prefix`` names the output columns ``<prefix>n_in_window`` /
    ``<prefix>sum_cents`` so several window widths can stack on one
    frame; a collision with existing columns raises instead of
    silently producing ambiguous references.

    Scale shape: ONE shuffle on the key (the window sort is per key);
    a hot key serializes its partition exactly like asof_join.

    SKEW POSTURE: ``bucket_width`` (seconds, must be >= window_seconds)
    activates the segmented plan, the rolling-window sibling of
    ``asof_join``'s: rows hash-shuffle on ``(key, floor(ts/width))`` so
    a hot key's timeline splits into many parallel window partitions.
    Because the trailing frame reaches back at most ``window_seconds``
    and a segment is at least that wide, a row's frame spans its own
    segment plus AT MOST the previous one — so each segment borrows
    exactly the previous segment's final ``window_seconds`` of rows as
    read-only CONTEXT copies (<= 2x replication worst case, in practice
    ~window/bucket fraction), computes the ordinary RANGE frame locally,
    and emits only its own rows. Output is identical to the default plan
    (property-tested, including a 50%-hot-key spread check); cost is the
    bounded row replication plus the same single shuffle, now on a
    well-spread composite key. Requires non-null ``ts_col`` (the default
    plan sorts nulls into the frame head; the segmented plan has no
    segment for them).
    """
    ts_units, per_s = epoch_units(F.col(ts_col), df.schema[ts_col].dataType)
    cents = F.round(F.col(value_col) * 100).cast("long")
    n_col = f"{out_prefix}n_in_window"
    s_col = f"{out_prefix}sum_cents"
    clash = {
        n_col, s_col, "__rolling_cents", "__units", "__seg", "__own"
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"rolling_time_aggregate output columns {sorted(clash)} already "
            "exist on the input; pass out_prefix= to disambiguate (e.g. "
            "stacking several window widths)"
        )
    win_units = window_seconds * per_s
    if bucket_width is None:
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_units)
            .rangeBetween(-win_units, 0)
        )
        # both aggregates in ONE projection so Catalyst plans a single
        # Window node (chained withColumn yields two Window/Sort pairs)
        return (
            df.withColumn("__rolling_cents", cents)
            .select(
                "*",
                F.count(F.lit(1)).over(w).cast("long").alias(n_col),
                F.sum("__rolling_cents").over(w).alias(s_col),
            )
            .drop("__rolling_cents")
        )
    if bucket_width < window_seconds:
        raise ValueError(
            "bucket_width must be >= window_seconds so a trailing frame "
            f"spans at most two segments (got bucket_width={bucket_width} "
            f"< window_seconds={window_seconds})"
        )
    seg_units = int(bucket_width) * per_s
    u = df.withColumn("__rolling_cents", cents).withColumn(
        "__units", ts_units
    )
    # floor division via pmod keeps everything exact integer arithmetic
    # (long `div` truncates toward zero, wrong for negative epochs; a
    # plain double divide can't round-trip microsecond magnitudes)
    pm = F.pmod(F.col("__units"), F.lit(seg_units))
    u = u.withColumn(
        "__seg", ((F.col("__units") - pm) / F.lit(seg_units)).cast("long")
    )
    own = u.withColumn("__own", F.lit(True))
    ctx = (
        u.where(pm >= F.lit(seg_units - win_units))
        .withColumn("__seg", F.col("__seg") + 1)
        .withColumn("__own", F.lit(False))
    )
    w = (
        Window.partitionBy(key_col, "__seg")
        .orderBy(F.col("__units"))
        .rangeBetween(-win_units, 0)
    )
    return (
        own.unionByName(ctx)
        .select(
            "*",
            F.count(F.lit(1)).over(w).cast("long").alias(n_col),
            F.sum("__rolling_cents").over(w).alias(s_col),
        )
        .where(F.col("__own"))
        .drop("__rolling_cents", "__units", "__seg", "__own")
    )


def numeric_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    n_bins: int = 10,
    min_share: float = 1e-6,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Numeric distribution drift between two snapshots — the companion
    to :func:`distribution_drift` for continuous columns: side A (the
    reference snapshot) fixes ``n_bins`` equal-frequency bins via its
    exact interior quantiles, both sides are histogrammed into those
    bins, and each bin gets the PSI contribution. Output:
    ``(bin, share_a, share_b, psi_contrib)`` with ``bin`` = number of
    bin edges strictly below the value.

    Exact percentiles (not approx) on purpose: the edges are the
    contract between the two histograms and across engines —
    ``percentile`` uses the same linear interpolation as DuckDB's
    ``quantile_cont`` (the q44 precedent), so an external auditor
    re-derives identical bins. Equal edges (near-constant columns)
    collapse via dedup, so degenerate inputs yield fewer, valid bins.
    NULL values are excluded from both sides (they are a
    missing-rate metric, not a position in a numeric distribution).

    Scale shape: one exact-percentile aggregate over side A (a single
    sort-based agg, k-1 scalars to the driver), then each side is a
    scan + literal-comparison binning + tiny per-bin count — nothing
    data-sized shuffles except the percentile sort. ``approx=True`` is
    the 100 TB path: the edges come from ``percentile_approx`` (a
    mergeable KLL-style sketch — map-side partials, no global sort;
    rank error <= 1/approx_accuracy), and ONLY the edge values change —
    the binning, PSI arithmetic, and output schema are identical, so on
    well-separated data the approximate edges land in the same gaps and
    the result matches the exact plan bin-for-bin (pytest-pinned). The
    exact default stays the oracle contract (q98): DuckDB re-derives
    ``percentile``'s interpolated edges, not the sketch's.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    av = a.where(F.col(value_col).isNotNull())
    bv = b.where(F.col(value_col).isNotNull())
    if approx:
        edge_agg = F.percentile_approx(
            F.col(value_col),
            F.array(*[F.lit(q) for q in qs]),
            F.lit(approx_accuracy),
        )
    else:
        edge_agg = F.percentile(
            F.col(value_col), F.array(*[F.lit(q) for q in qs])
        )
    edges_row = av.agg(edge_agg).first()[0]
    edges = sorted(set(float(e) for e in (edges_row or [])))

    def binned(side: DataFrame) -> DataFrame:
        bin_expr = F.lit(0).cast("long")
        for e in edges:
            bin_expr = bin_expr + (
                F.col(value_col) > F.lit(e)
            ).cast("long")
        return side.select(bin_expr.alias("bin"))

    out = distribution_drift(binned(av), binned(bv), "bin", min_share)
    return out.select(
        F.col("category").alias("bin"), "share_a", "share_b", "psi_contrib"
    )


def _require_integral_weights(
    df: DataFrame, weight_col: str, op: str
) -> None:
    """The budget operators are exact-integer contracts (largest-
    remainder quotas, running-sum cutoffs): a fractional weight column
    would be silently truncated by their long arithmetic, so reject it
    loudly — pre-quantize (e.g. token counts, char counts, integer
    cents) before apportioning."""
    dt = df.schema[weight_col].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{op} requires an integral weight column (token/char/cent "
            f"counts); got {weight_col}: {dt} — quantize it first"
        )


def apportion_budget(
    df: DataFrame,
    domain_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder apportionment of an integer ``budget`` (token
    count, document quota, sampling allowance) across domains,
    proportional to each domain's summed ``weight_col`` — the exact-sum
    counterpart of :func:`domain_mix`/:func:`temperature_mix`'s
    share-based filters: allocations are integers and add up to EXACTLY
    ``budget`` (floor quotas first, then the domains with the largest
    remainders — ties to the smaller domain name — each get +1).

    All-integer arithmetic end to end (products routed through
    DECIMAL(38,0) so a 10^15 budget times a 10^15 weight cannot
    overflow a long): no float shares, so the result is bit-identical
    in any engine and hash-comparable against a SQL oracle (q100).
    Domains with zero/negative total weight get allocation 0 and do not
    compete for remainders.

    Scale shape: one partial-aggregated shuffle to the per-domain
    weight table (domain-count-sized, i.e. tiny), then windows over
    that TINY table to rank remainders — the data-sized input is
    touched exactly once, and nothing domain-quadratic exists. Output:
    ``(domain, weight, allocation)``, one row per domain.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    _require_integral_weights(df, weight_col, "apportion_budget")
    dec = "decimal(38,0)"
    w = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(F.col(weight_col)).cast("long").alias("weight"))
    )
    pos = F.greatest(F.col("weight"), F.lit(0)).cast(dec)
    total = Window.partitionBy()  # domain table is tiny by contract
    w = w.withColumn("__total", F.sum(pos).over(total))
    prod = F.lit(budget).cast(dec) * pos
    # mod first, then divide the EXACT multiple: decimal division in
    # Spark rounds half-up at a derived scale, so floor(prod/total)
    # could round a .9999995 quotient across an integer boundary;
    # (prod - prod % total) / total is exact by construction
    rem_raw = prod % F.col("__total")
    base = F.when(
        F.col("__total") > 0,
        ((prod - rem_raw) / F.col("__total")).cast("long"),
    ).otherwise(F.lit(0))
    rem = F.when(
        F.col("__total") > 0, rem_raw.cast(dec)
    ).otherwise(F.lit(None).cast(dec))
    w = w.withColumn("__base", base).withColumn("__rem", rem)
    w = w.withColumn("__leftover", F.lit(budget) - F.sum("__base").over(total))
    rank_w = Window.partitionBy().orderBy(
        F.col("__rem").desc_nulls_last(), F.col("domain").asc()
    )
    w = w.withColumn("__rk", F.row_number().over(rank_w))
    extra = (
        (F.col("__rk") <= F.col("__leftover"))
        & F.col("__rem").isNotNull()
        & (F.col("weight") > 0)
    ).cast("long")
    return w.select(
        "domain",
        "weight",
        (F.col("__base") + extra).alias("allocation"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    approx: bool = False,
    approx_accuracy: int = 10_000,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization — clip ``value_col`` to its [``lower_q``,
    ``upper_q``] quantile range, the standard tail-taming step before a
    quality score feeds a sampling weight or a training-mix ratio (one
    runaway outlier would otherwise own the distribution). Appends
    ``<col>_w`` (clipped value) plus ``clipped_low``/``clipped_high``
    flags so downstream can count or audit the affected rows; NULL
    values pass through NULL with both flags false.

    Exact ``percentile`` edges by default — same linear interpolation
    as DuckDB's ``quantile_cont`` (the q44 precedent), so the clip
    bounds are engine-portable and q101 hash-checks end to end.
    ``approx=True`` is the 100 TB path (same contract as
    :func:`numeric_drift`): a mergeable ``percentile_approx`` sketch
    replaces the global sort, only the two bound scalars change.

    Scale shape: one two-scalar aggregate over the column, then a
    zero-shuffle per-row projection.
    """
    if not (0.0 <= lower_q < upper_q <= 1.0):
        raise ValueError(
            f"need 0 <= lower_q < upper_q <= 1, got ({lower_q}, {upper_q})"
        )
    out = out_col or f"{value_col}_w"
    clash = {out, "clipped_low", "clipped_high"} & set(df.columns)
    if clash:
        raise ValueError(
            f"winsorize output columns {sorted(clash)} already exist; "
            "pass out_col= to disambiguate"
        )
    v = df.where(F.col(value_col).isNotNull())
    qarr = F.array(F.lit(lower_q), F.lit(upper_q))
    if approx:
        agg = F.percentile_approx(
            F.col(value_col), qarr, F.lit(approx_accuracy)
        )
    else:
        agg = F.percentile(F.col(value_col), qarr)
    bounds = v.agg(agg.alias("__b")).select(
        F.col("__b")[0].alias("__lo"), F.col("__b")[1].alias("__hi")
    )
    c = F.col(value_col)
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            "*",
            F.when(c.isNull(), F.lit(None))
            .otherwise(F.least(F.greatest(c, F.col("__lo")), F.col("__hi")))
            .alias(out),
            # coalesce: if the column is entirely NULL the bounds are
            # NULL and the comparisons 3-value-logic to NULL — the flag
            # contract is a non-null boolean either way
            F.coalesce(c.isNotNull() & (c < F.col("__lo")), F.lit(False))
            .alias("clipped_low"),
            F.coalesce(c.isNotNull() & (c > F.col("__hi")), F.lit(False))
            .alias("clipped_high"),
        )
        .drop("__lo", "__hi")
    )


def stratified_sample_exact_k(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, selected by md5
    order of the key — the exact-count sibling of
    :func:`stratified_sample` (whose Bernoulli thresholds give a
    *binomial* per-stratum count). "Give me 1 000 documents per source
    for the eval set, the same 1 000 every run on every engine": the
    md5 rank is a pure function of the key, so the picked set is stable
    across runs, partitionings, and appends, and any engine with md5
    re-derives it (the q102 oracle does).

    Scale shape: ONE hash shuffle on the stratum; the ``row_number <=
    k`` filter is recognized by Spark's InferWindowGroupLimit rule, so
    each map task keeps only its local top-k per stratum before the
    exchange — the shuffle carries O(k * strata * tasks), not the
    corpus. Ties (md5 collisions) break on the raw key, keeping the
    rank total. Keys are expected non-null (they are identifiers);
    NULL keys hash to NULL and sort engine-specifically (Spark asc =
    nulls first, DuckDB default = nulls last), so filter them out
    before sampling if a cross-engine-reproducible pick matters.
    """
    if k <= 0:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def quality_percentile_gate(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    score_col: str,
    keep_pct: int,
    buckets: int = 256,
) -> DataFrame:
    """Per-domain quality gate: flag the top ``keep_pct`` percent of
    rows in every stratum, ranked by ``score_col`` — the
    FineWeb/DataComp-style "keep the best X% per dump/domain" pass,
    which a global cutoff cannot express (a weak domain's best docs
    lose to a strong domain's average ones).

    ``keep_pct`` is an INTEGER percent on purpose: the keep set is
    ``rank <= ceil(n_stratum * keep_pct / 100)``, evaluated as
    ``(rank-1)*100 < n*keep_pct`` in pure integer arithmetic — no float
    fraction whose binary representation could flip a boundary row
    between engines. Ranking is total (score desc, key asc), so the
    flagged set is deterministic under any partitioning. Emits every
    row with ``quality_rank`` and a ``keep`` flag (audit-friendly, like
    :func:`dedup.cluster_representatives`); filter on ``keep`` for the
    gated corpus.

    Scale shape (the round-6 cutoff-rank plan): a plain
    ``Window.partitionBy(stratum)`` puts a full stratum in ONE window
    task with no WindowGroupLimit pruning possible (the limit is a
    per-stratum fraction, unknown map-side) — at 100 TB a dominant
    stratum sorts through a single task. Instead the score range is cut
    into ``buckets`` equi-width slices per stratum (score is monotone
    in the slice index, so slices are contiguous runs of the rank
    order; equal scores always share a slice, so tie-breaks never
    straddle one):

    1. per-stratum ``min``/``max`` of the score — one map-side-combined
       aggregate, stratum-sized result, pinned (``localCheckpoint``) so
       its scan runs once, not once per consumer;
    2. a per-``(stratum, slice)`` window ranks locally —
       ``buckets``-way parallel per stratum, one corpus shuffle;
    3. per-slice counts from a second column-pruned map-side-combined
       pass (the :func:`fill_budget` / ``sequence_pack`` second-pass
       trade) are prefix-summed on the tiny ``strata x buckets`` frame;
       ``quality_rank = offset + local_rank``, and the stratum total
       ``n`` rides the same tiny frame.

    Output is bit-identical to the ``buckets=1`` flat plan
    (property-tested, including a 50 %-hot-stratum case). NULL scores
    land in a trailing slice (Spark's ``DESC`` = nulls last). The tiny
    count frame joins back by ``(stratum, slice)``; with pathologically
    many strata lower ``buckets`` to keep it small. ``buckets=1`` keeps
    the flat two-window plan.
    """
    if not (0 < keep_pct <= 100):
        raise ValueError(f"keep_pct must be in (0, 100], got {keep_pct}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    clash = {
        "quality_rank", "keep", "__n", "__bkt", "__lo", "__hi", "__qs",
        "__cnt", "__off", "__rnl",
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"quality_percentile_gate output columns {sorted(clash)} "
            "already exist on the input"
        )
    if buckets == 1:
        w = Window.partitionBy(strata_col).orderBy(
            F.col(score_col).desc(), F.col(key_col).asc()
        )
        wc = Window.partitionBy(strata_col)
        return (
            df.withColumn("quality_rank", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wc))
            .withColumn(
                "keep",
                (F.col("quality_rank").cast("long") - 1) * 100
                < F.col("__n") * F.lit(keep_pct),
            )
            .drop("__n")
        )
    s = F.col(score_col)
    # materialized once inside broadcast_if_small (localCheckpoint) —
    # no caller-side checkpoint, or the frame would materialize twice
    mm = df.groupBy(F.col(strata_col).alias("__qs")).agg(
        F.min(s).cast("double").alias("__lo"),
        F.max(s).cast("double").alias("__hi"),
    )
    # slice index ascending in RANK order (score desc): max -> 0,
    # min -> buckets-1, NULLs -> buckets (desc = nulls last). Equal
    # scores share a slice by construction; the double arithmetic is a
    # monotone map so slice runs are contiguous in the rank order.
    bkt = (
        F.when(s.isNull(), F.lit(buckets))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("__hi") - s.cast("double"))
                    / (F.col("__hi") - F.col("__lo"))
                    * buckets
                ),
                F.lit(buckets - 1),
            )
        )
        .cast("int")
    )
    b = (
        df.join(
            # strata-domain-sized by contract; gate the hint on a
            # measured count so a corpus-scaled stratum domain falls
            # back to a shuffle join (util.broadcast_if_small)
            broadcast_if_small(mm),
            F.col(strata_col).eqNullSafe(F.col("__qs")),
        )
        .withColumn("__bkt", bkt)
        .drop("__qs", "__lo", "__hi")
    )
    wl = Window.partitionBy(strata_col, "__bkt").orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    local = b.withColumn("__rnl", F.row_number().over(wl))
    counts = b.groupBy(
        F.col(strata_col).alias("__qs"), F.col("__bkt")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    wo = (
        Window.partitionBy("__qs")
        .orderBy(F.col("__bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("__qs")
    offsets = counts.select(
        "__qs",
        "__bkt",
        F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(wn).alias("__n"),
    )
    return (
        local.join(
            # strata×bucket-sized, but NOT hinted: offsets' lineage is
            # a corpus-scan groupBy, so a count-gated hint would pay a
            # second corpus aggregate, and a forced hint on a
            # corpus-scaled stratum domain is a driver OOM — AQE
            # broadcasts it from its measured runtime size instead
            offsets,
            F.col(strata_col).eqNullSafe(F.col("__qs"))
            & (local["__bkt"] == offsets["__bkt"]),
        )
        .withColumn(
            "quality_rank", (F.col("__off") + F.col("__rnl")).cast("int")
        )
        .withColumn(
            "keep",
            # coalesce only to pin non-null schema parity with the flat
            # plan (__n is a window sum, nullable by type though never
            # null in fact — the inner join always matches)
            F.coalesce(
                (F.col("quality_rank").cast("long") - 1) * 100
                < F.col("__n") * F.lit(keep_pct),
                F.lit(False),
            ),
        )
        .select(*df.columns, "quality_rank", "keep")
    )


def group_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str | Sequence[str],
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group numeric profile — the corpus-report aggregate behind a
    dataset card: count, sum, min, max, and exact p50/p90 of
    ``value_col`` for every group. One partial-aggregated shuffle; the
    exact percentiles use the same interpolation as DuckDB's
    ``quantile_cont`` (q44 precedent) so the whole report row
    hash-matches an external auditor's SQL. NULL values are excluded
    from the percentile/min/max by aggregate semantics but counted in
    ``n_rows`` (missing-rate is visible as n_rows vs n_values).

    ``value_col`` may be a SEQUENCE of columns: a dataset card
    profiles many numerics, and k separate calls would pay k full
    scans + k shuffles. The multi-column form computes every profile
    in the SAME single aggregate pass — shared ``n_rows`` plus one
    struct column per value column (fields ``n_values, total, min_v,
    max_v, p50, p90``, the single-column report minus the shared
    count; pytest-pinned equal to k single-column calls). A length-1
    sequence still gets the struct shape; the plain-string form keeps
    the historical flat schema (the q104 oracle contract, untouched).

    ``approx=True`` is the 100 TB path, same contract as
    :func:`numeric_drift` / :func:`winsorize`: ``percentile_approx``'s
    mergeable sketch (map-side partials, rank error <=
    1/approx_accuracy) replaces the exact per-group percentile buffers;
    only the two percentile values can move, the report columns and
    types are identical (pytest-pinned on well-separated data). The
    exact default stays the q104 oracle contract.

    ``total`` stays exact for integral columns (long; a SUM over 2^63
    of anything is out of contract) and rounds to 6 for fractional
    ones — a blanket long cast would silently truncate a double sum.
    """

    def _aggs(col_name: str) -> list[Column]:
        c = F.col(col_name)
        integral = df.schema[col_name].dataType.simpleString() in (
            "tinyint", "smallint", "int", "bigint"
        )
        total = (
            F.sum(c).cast("long") if integral else F.round(F.sum(c), 6)
        )
        if approx:
            # percentile_approx returns the input type; cast to double
            # so the report schema is identical to the exact plan's
            def pctl(q: float) -> Column:
                return F.percentile_approx(
                    c, F.lit(q), F.lit(approx_accuracy)
                ).cast("double")
        else:
            def pctl(q: float) -> Column:
                return F.percentile(c, F.lit(q))
        return [
            F.count(c).cast("long").alias("n_values"),
            total.alias("total"),
            F.min(c).alias("min_v"),
            F.max(c).alias("max_v"),
            F.round(pctl(0.5), 6).alias("p50"),
            F.round(pctl(0.9), 6).alias("p90"),
        ]

    n_rows = F.count(F.lit(1)).cast("long").alias("n_rows")
    grouped = df.groupBy(*[F.col(g) for g in group_cols])
    if isinstance(value_col, str):
        return grouped.agg(n_rows, *_aggs(value_col))
    if not value_col:
        raise ValueError("group_profile: value_col sequence is empty")
    clash = set(value_col) & ({"n_rows"} | set(group_cols))
    if clash:
        raise ValueError(
            f"group_profile: value columns {sorted(clash)} clash with "
            "the group/report columns"
        )
    return grouped.agg(
        n_rows,
        *[F.struct(*_aggs(c)).alias(c) for c in value_col],
    )


def fill_budget(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weight_col: str,
    allocations: DataFrame,
    buckets: int = 256,
) -> DataFrame:
    """Greedy budget fill — the selection step that turns
    :func:`apportion_budget`'s per-domain allocations into an actual
    document set: within each domain, take rows in md5(key) order
    (deterministic corpus shuffle, same device as
    :func:`stratified_sample_exact_k`) while the running ``weight_col``
    sum stays within the domain's allocation. Together the pair is the
    whole "make me an exactly-N-token mix" move: apportion decides how
    much each domain gets, fill decides which rows deliver it.

    ``allocations`` carries ``(domain, allocation)`` — the
    :func:`apportion_budget` output contract. Emits every input row
    with ``cum_weight`` (inclusive running sum) and ``keep``
    (``cum_weight <= allocation``; domains absent from ``allocations``
    keep nothing), so the audit questions — how full did each budget
    get, which doc was the cutoff — are one filter away. Greedy-prefix
    semantics mean a budget may underfill by less than one row's weight
    (no partial documents; exact-to-the-token packing is
    ``textops.pack_sequences``' job downstream).

    Scale shape (the round-6 hierarchical plan): mix DOMAINS ARE FEW by
    construction, so a plain ``Window.partitionBy(domain)`` running sum
    would sort the entire corpus through a handful of window tasks —
    the same hot-key shape :func:`textops.sequence_pack` and the as-of
    ``bucket_width=`` plans already solve. Instead the md5 order key is
    split on its first hex chars into ``buckets`` ordered, contiguous
    slices per domain:

    1. a per-``(domain, bucket)`` window computes within-bucket running
       sums — ``buckets``-way parallel per domain, one corpus shuffle;
    2. per-bucket totals come from a SECOND column-pruned pass with a
       map-side-combined aggregate (the shuffle carries only the
       ``domains x buckets`` partials — the same second-pass trade as
       :func:`textops.sequence_pack`; an exchange shared with the
       window doesn't materialize because column pruning and inferred
       join-null filters make the subtrees differ, and pinning the
       corpus-sized frame to share it would cost more than the pruned
       re-scan);
    3. the tiny totals frame is prefix-summed bucket-major per domain
       and broadcast back as offsets; ``cum_weight = offset + local``.

    The bucket prefix is a PREFIX of the md5 order key, so bucket-major
    order equals the single-window order and the output is bit-identical
    to ``buckets=1`` (property-tested). ``buckets=1`` keeps the plain
    single-window plan. Plus a broadcast join of the (tiny) allocation
    table. All-integer comparisons; the kept set is a pure function of
    keys and weights, stable across engines and partitionings (q105).
    """
    _require_integral_weights(df, weight_col, "fill_budget")
    clash = {
        "cum_weight", "keep", "__alloc", "__fb_domain", "__okey", "__bkt",
        "__local", "__off", "__fb_dom", "__fb_bkt",
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"fill_budget output columns {sorted(clash)} already exist "
            "on the input"
        )
    chars = {1: 0, 16: 1, 256: 2, 4096: 3}.get(buckets)
    if chars is None:
        raise ValueError(
            f"buckets must be one of 1, 16, 256, 4096, got {buckets}"
        )
    okey = F.md5(F.col(key_col).cast("string"))
    # alias the allocation side so a df column literally named "domain"
    # (the usual case) can't collide with the join key
    alloc = F.broadcast(
        allocations.select(
            F.col("domain").alias("__fb_domain"),
            F.col("allocation").alias("__alloc"),
        )
    )
    if chars == 0:
        w = (
            Window.partitionBy(domain_col)
            .orderBy(okey.asc(), F.col(key_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        summed = df.withColumn(
            "cum_weight", F.sum(F.col(weight_col)).over(w).cast("long")
        )
    else:
        part = df.withColumn("__okey", okey).withColumn(
            "__bkt", F.substring(F.col("__okey"), 1, chars)
        )
        wl = (
            Window.partitionBy(domain_col, "__bkt")
            .orderBy(F.col("__okey").asc(), F.col(key_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = part.withColumn(
            "__local", F.sum(F.col(weight_col)).over(wl).cast("long")
        )
        totals = part.groupBy(
            F.col(domain_col).alias("__fb_dom"), F.col("__bkt")
        ).agg(F.sum(F.col(weight_col)).cast("long").alias("__t"))
        wo = (
            Window.partitionBy("__fb_dom")
            .orderBy(F.col("__bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = totals.select(
            "__fb_dom",
            F.col("__bkt").alias("__fb_bkt"),
            F.coalesce(F.sum("__t").over(wo), F.lit(0))
            .cast("long")
            .alias("__off"),
        )
        # NULL-SAFE join keys: a NULL domain (or a NULL key, whose md5
        # bucket is NULL) is a window group like any other in the flat
        # plan — an equi join would silently drop those rows instead of
        # emitting them with keep=false
        summed = (
            local.join(
                # domain×bucket-sized (buckets ≤ 4096) but NOT hinted:
                # offsets' lineage is a corpus-scan groupBy (a gating
                # count would re-run it) and domains can scale — AQE
                # broadcasts from the measured runtime size instead
                offsets,
                F.col(domain_col).eqNullSafe(F.col("__fb_dom"))
                & F.col("__bkt").eqNullSafe(F.col("__fb_bkt")),
            )
            .withColumn(
                "cum_weight", (F.col("__off") + F.col("__local")).cast("long")
            )
            .select(*df.columns, "cum_weight")
        )
    return (
        summed.join(alloc, F.col(domain_col) == F.col("__fb_domain"), "left")
        .withColumn(
            "keep",
            F.coalesce(F.col("cum_weight") <= F.col("__alloc"), F.lit(False)),
        )
        .drop("__fb_domain", "__alloc")
    )


def historize(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """SCD type-2 historization — compress a per-key change stream into
    validity intervals: consecutive rows (ordered by ``ts_col``, ties by
    ``tie_col``) whose ``attr_cols`` tuple is unchanged collapse into one
    row carrying ``valid_from`` (first ``ts_col`` of the run),
    ``valid_to`` (the NEXT run's ``valid_from``; NULL on the key's
    current run) and ``n_rows`` (rows collapsed). The classic
    dimension-historization / gaps-and-islands operator every
    large-scale ETL re-derives; the reference's MERGE surface (A4,
    main.py upsert paths) keeps only the latest state — this keeps the
    full interval history, which is what a reproducible
    training-snapshot story needs ("which priority was active when
    this example was sampled?").

    Plan shape: everything is windows over ONE hash partitioning by
    ``key_cols`` — the change flag (null-safe ``lag`` compare per
    attribute: NULL→NULL is NOT a change, NULL→value is — the round-6
    window→join NULL lesson baked in), the running run-id sum, the
    per-run group-by, and the ``lead`` that closes each interval all
    reuse the same (key)-keyed exchange, so the operator costs a
    single shuffle of the input regardless of attribute count. Skew =
    one mega-key's history lands on one task: histories are bounded by
    time (a key's rows per snapshot cadence), not by corpus size, so
    the partition stays memory-sized at 100 TB; a pathological key
    would segment by coarse time bucket first (the q41 device).
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    # lag() is NULL on the key's first row, where eqNullSafe against a
    # non-NULL attr already yields False -> flagged as a change; an
    # all-NULL first attr tuple would compare equal to the lag NULLs,
    # so force the first row explicitly
    first_row = F.lag(F.lit(1)).over(w).isNull()
    runs = df.withColumn(
        "__chg", (changed | first_row).cast("int")
    ).withColumn(
        "__run",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    grouped = runs.groupBy(*key_cols, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    wk = Window.partitionBy(*keys).orderBy(F.col("__run").asc())
    return grouped.withColumn(
        "valid_to", F.lead("valid_from").over(wk)
    ).select(
        *key_cols, *attr_cols, "valid_from", "valid_to", "n_rows"
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_width: int = 86400,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Interval-OVERLAP join — both sides are intervals, matched when
    ``[l.start, l.end]`` and ``[r.start, r.end]`` intersect (CLOSED
    bounds: touching endpoints overlap), optionally within equal
    ``on`` keys. The two-sided sibling of :func:`interval_join`
    (point-in-interval) — the concurrency/collision primitive
    (sessions active at the same time, orders in flight together,
    leases that conflict) that Spark would otherwise plan as a
    broadcast-nested-loop inequality join, O(n·m) and a driver-memory
    bomb at scale.

    Scalable composition: each side replicates to every
    ``bucket_width``-sized bucket its interval covers (``sequence`` +
    ``explode``, JVM-side), the match becomes an EQUI join on
    ``(on..., bucket)`` plus the residual overlap filter, and the
    duplicate matches a pair would produce in every shared bucket are
    eliminated WITHOUT a distinct: a pair is emitted only in the
    bucket of ``greatest(l.start, r.start)`` — the overlap's first
    instant, which both intervals cover exactly when they overlap, so
    each qualifying pair survives in exactly one bucket. Shuffle cost
    O(n·avg_spans + m·avg_spans); pick ``bucket_width`` near the
    typical interval length so spans stay ~2. NULL or inverted
    intervals are dropped pre-join (no-match, the interval_join
    convention). Output columns: ``on`` keys once, then both sides'
    remaining columns suffixed with ``suffixes``.
    """
    on = list(on)

    def prep(df: DataFrame, suffix: str):
        # each bound converts through ITS OWN type's scale, then both
        # normalize to the finer of the two — a timestamp start paired
        # with a date end (micros vs seconds) would otherwise bucket
        # the end on the wrong scale and silently drop/duplicate
        # matches. Cross-side consistency is free: floor(units/width)
        # with width = bucket_width * per_s is the same bucket
        # numbering at either scale.
        s_units, s_per = epoch_units(
            F.col(start_col), df.schema[start_col].dataType
        )
        e_units, e_per = epoch_units(
            F.col(end_col), df.schema[end_col].dataType
        )
        per_s = max(s_per, e_per)
        if s_per != per_s:
            s_units = s_units * F.lit(per_s // s_per)
        if e_per != per_s:
            e_units = e_units * F.lit(per_s // e_per)
        width = bucket_width * per_s
        out = df.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(start_col) <= F.col(end_col))
        ).select(
            *on,
            F.floor(s_units / width).alias(f"__sb{suffix}"),
            F.explode(
                F.sequence(
                    F.floor(s_units / width), F.floor(e_units / width)
                )
            ).alias("__bucket"),
            *[
                F.col(c).alias(c + suffix)
                for c in df.columns
                if c not in on
            ],
        )
        return out

    ls, rs = suffixes
    l = prep(left, ls)
    r = prep(right, rs)
    pair_start_bucket = F.greatest(
        F.col(f"__sb{ls}"), F.col(f"__sb{rs}")
    )
    joined = (
        l.join(r, on + ["__bucket"])
        .where(
            (F.col(start_col + ls) <= F.col(end_col + rs))
            & (F.col(start_col + rs) <= F.col(end_col + ls))
            # one-bucket emission: only the bucket holding the
            # overlap's first instant (= the later start) survives
            & (F.col("__bucket") == pair_start_bucket)
        )
        .drop("__bucket", f"__sb{ls}", f"__sb{rs}")
    )
    return joined


def gapfill_locf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    trunc: str = "hour",
    tie_col: str | None = None,
) -> DataFrame:
    """Time-series resample + gap fill: bucket each key's observations
    to a regular grid (``date_trunc(trunc)``; ``bucket`` must be the
    matching interval literal) and emit one row per key per bucket
    from the key's first observed bucket through its last, carrying
    the last observed value forward across empty buckets (LOCF — the
    standard dashboard/feature-store densification every event
    pipeline re-derives). Per observed bucket the carried value is the
    LATEST observation (``ts_col`` order, ties by ``tie_col``; without
    a tie column, equal-timestamp ties resolve to the largest value —
    pass ``tie_col`` for total determinism). Output: keys, ``bucket``,
    ``value_col`` (filled), ``observed`` flag, ``n_obs`` (observations
    in the bucket; 0 on filled rows). CONTRACT: ``value_col`` must be
    non-null — ``observed`` means "a row landed in this bucket" (row
    existence), and a null observation would be carried forward as
    the bucket's value verbatim; coalesce or filter nulls upstream if
    the stream can produce them.

    Plan shape — deliberately NOT the naive grid build (per-key
    min/max → sequence → explode → left join back → fill window: four
    shuffles, two of them carrying the exploded grid): one groupBy to
    per-(key, bucket) aggregates, then a single ``lead`` window per
    key, then each observed row explodes ``sequence(bucket,
    next_bucket - step)`` carrying its value — the fill IS the
    explode, so the grid never shuffles and LOCF needs no second
    window. Two exchanges total, both of corpus-aggregate (not grid)
    size. Skew: a key whose neighboring observations straddle a long
    outage explodes span/bucket rows from one row — bounded by
    wall-clock span over bucket width, independent of data volume;
    pathological spans (years × second buckets) should cap the
    sequence upstream or coarsen ``trunc``.
    """
    keys = list(key_cols)
    ords = [F.col(ts_col).alias("__o0")] + (
        [F.col(tie_col).alias("__o1")] if tie_col else []
    )
    pick = F.struct(*ords, F.col(value_col).alias("__v"))
    obs = df.groupBy(
        *keys, F.date_trunc(trunc, F.col(ts_col)).alias("bucket")
    ).agg(
        F.max(pick).getField("__v").alias("__v"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col("bucket").asc()
    )
    step = F.expr(f"interval {bucket}")
    nxt = F.lead("bucket").over(w)
    run = obs.withColumn(
        "__end",
        F.coalesce(nxt - step, F.col("bucket")),
    )
    return run.select(
        *keys,
        F.col("bucket").alias("__b0"),
        F.explode(F.sequence(F.col("bucket"), F.col("__end"), step)).alias(
            "bucket"
        ),
        "__v",
        "__n",
    ).select(
        *keys,
        "bucket",
        F.col("__v").alias(value_col),
        (F.col("bucket") == F.col("__b0")).alias("observed"),
        F.when(F.col("bucket") == F.col("__b0"), F.col("__n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_obs"),
    )


def association_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Market-basket pair mining: for every unordered item pair
    co-occurring in at least ``min_pair_count`` baskets, emit
    ``pair_count``, each item's basket count, ``support``
    (pair/baskets), ``confidence_ab`` (pair/count_a) and ``lift``
    (pair·baskets / (count_a·count_b)) — the Apriori-at-k=2 /
    co-occurrence-statistics stage of recommendation and
    data-exploration pipelines (rounded 6dp, the cross-engine float
    contract).

    Plan shape: one distinct to basket-item pairs, one basket-keyed
    self-join (``a < b`` halves the square) feeding one pair-keyed
    count, then two broadcast-sized joins against the item-count
    table and a 1-row cross join for the basket total — the fact
    frame shuffles twice (basket key, then pair key), never more.
    Skew is PER-BASKET quadratic: a degenerate basket of m items
    emits m²/2 pair rows — ``max_basket_size`` drops oversized
    baskets whole (the standard frequent-itemset hygiene filter:
    a basket containing half the catalog carries no signal); basket
    sizes are domain-bounded (order line counts), not corpus-scaled,
    so the pair frame grows linearly with baskets at 100 TB.
    """
    b = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        ok = (
            b.groupBy("basket")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") <= max_basket_size)
            .select("basket")
        )
        b = b.join(ok, "basket", "semi")
    n_baskets = b.agg(
        F.count_distinct(F.col("basket")).cast("long").alias("__n")
    )
    ic = b.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("c"))
    x = b.select("basket", F.col("item").alias("item_a"))
    y = b.select("basket", F.col("item").alias("item_b"))
    pc = (
        x.join(y, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    ca = ic.select(F.col("item").alias("item_a"), F.col("c").alias("count_a"))
    cb = ic.select(F.col("item").alias("item_b"), F.col("c").alias("count_b"))
    return (
        pc.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(F.col("pair_count") / F.col("__n"), 6).alias("support"),
            F.round(F.col("pair_count") / F.col("count_a"), 6).alias(
                "confidence_ab"
            ),
            # double math BEFORE the multiplies: pair_count·n_baskets
            # and count_a·count_b overflow BIGINT at corpus scale
            # (ANSI makes that an error, not a wrap) — and the oracle
            # computes in double anyway
            F.round(
                F.col("pair_count").cast("double") * F.col("__n")
                / (F.col("count_a").cast("double") * F.col("count_b")),
                6,
            ).alias("lift"),
        )
    )


def group_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit: ``slope``,
    ``intercept`` and ``r2`` of ``y ~ x`` for each group, plus ``n``
    — the trend-extraction aggregate behind drift dashboards and
    per-segment forecasting baselines (rounded 6dp, the cross-engine
    float contract; groups with zero x-variance get NULLs, never a
    division error).

    Numerics are the design constraint, not the algebra: the raw
    textbook moments (``n·Σxy − Σx·Σy``...) catastrophically cancel
    when x sits far from 0 (epoch-seconds x: ~9e17 − ~9e17), so this
    uses the engines' single-pass STABLE aggregates — ``covar_samp``
    / ``var_samp`` / ``corr`` are Welford-style updates in both
    Spark and DuckDB, and slope/intercept/r² derive from them without
    re-expanding the cancelling products. Callers should still
    rebase wide-origin x (e.g. hours since the corpus min timestamp,
    an EXACT stored value, not a computed mean) so the intercept's
    magnitude stays within 6dp rounding tolerance of slope·x̄ error.
    One shuffle on the group key, everything partial-aggregable;
    skew = one giant group's stream folds on one task — the same
    bounded exposure as every keyed aggregate here.
    """
    x, y = F.col(x_col), F.col(y_col)
    # nullif guards: var_samp = 0 on constant-x (or constant-y) groups,
    # and ANSI mode turns the division into an error instead of a NULL
    # fit — including INSIDE corr's own finalizer, so r² is written as
    # covar²/(varx·vary) rather than corr(x,y)²
    cov = F.covar_samp(x, y)
    slope = cov / F.nullif(F.var_samp(x), F.lit(0.0))
    r2 = (cov * cov) / F.nullif(
        F.var_samp(x) * F.var_samp(y), F.lit(0.0)
    )
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(slope, 6).alias("slope"),
            F.round(F.avg(y) - slope * F.avg(x), 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    state_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition statistics over per-key event
    streams: for every observed ``(prev_state, next_state)`` pair, the
    transition count and the row-normalized conditional probability
    ``P(next | prev)`` (rounded 6dp) — the behavioral-model summary
    behind session analysis, journey mining and synthetic-sequence
    generators. Transitions are counted WITHIN a key's stream
    (ordered by ``order_col``, ties by ``tie_col``), never across
    keys.

    Plan shape: one key-partitioned ``lag`` window produces the pair
    stream, one (prev, next)-keyed partial-aggregable count, and the
    per-prev normalizer is a window over the (much smaller) count
    frame — the corpus shuffles twice, the second time already
    aggregated to the state-pair domain. Skew: a hot user's stream is
    one window partition (time-bounded per key, the q127 historize
    argument); a hot STATE pair combines map-side.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(order_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
        .where(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wn = Window.partitionBy("prev_state")
    return pairs.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn), 6).alias("prob"),
    )


def categorical_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Dataset-card profile for CATEGORICAL columns — the counterpart
    of :func:`group_profile`'s numeric card: per column, row/null
    counts, distinct cardinality, Shannon entropy (bits) of the
    non-null value distribution, and the modal value with its share
    (count ties broken toward the LARGER value, for determinism).
    The quality-report stage that catches single-value columns,
    near-constant skew, and unexpectedly high-cardinality
    categoricals before they hit a shuffle key.

    Plan shape: every column profiles in ONE corpus pass — rows
    unpivot to a (column, value) stream via an inline
    array-of-structs explode (k columns cost one scan, not k; the
    q114 argument), one (column, value)-keyed partial-aggregable
    count collapses to the value domain, per-column totals come from
    a WINDOW over that domain-sized frame (never a groupBy+join-back,
    which forks the count lineage and re-scans the corpus per
    consumer), and the rollup (entropy sum, max_by modal pick) never
    touches the corpus again. Nulls count per
    column but stay out of the entropy/mode; an all-NULL column
    reports ``n_rows == n_nulls`` (the __nn window sum coalesces to
    0) with NULL entropy/top_value/top_share, since no non-null
    distribution exists. Hot values combine
    map-side; a corpus-cardinality column (an id mistakenly
    profiled) makes the count frame corpus-sized — profile
    categoricals, not keys.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    counts = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # per-column totals as a WINDOW over the count frame, not a
    # groupBy + join-back: the join form forks the count lineage and
    # re-executes the corpus scan per consumer (the round-5
    # fork-without-reuse class — observed as a second FileScan in the
    # executed plan; the plan pin guards it)
    wc = Window.partitionBy("column")
    enriched = counts.select(
        "column",
        "value",
        "c",
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("c"))).over(wc),
            F.lit(0),
        )
        .cast("long")
        .alias("__nulls"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNotNull(), F.col("c"))).over(
                wc
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__nn"),
    )
    p = F.col("c") / F.col("__nn")
    return (
        enriched.groupBy("column")
        .agg(
            (F.first("__nn") + F.first("__nulls")).cast("long").alias(
                "n_rows"
            ),
            F.first("__nulls").alias("n_nulls"),
            F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_distinct"),
            F.round(
                -F.sum(
                    F.when(F.col("value").isNotNull(), p * F.log2(p))
                ),
                6,
            ).alias("entropy"),
            F.max_by(
                "value",
                F.when(
                    F.col("value").isNotNull(),
                    F.struct(
                        F.col("c").alias("c"), F.col("value").alias("v")
                    ),
                ),
            ).alias("top_value"),
            F.round(
                F.max(F.when(F.col("value").isNotNull(), F.col("c")))
                / F.first("__nn"),
                6,
            ).alias("top_share"),
        )
    )


def robust_zscore(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: float = 3.5,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Robust per-group outlier flagging via the modified z-score
    (Iglewicz & Hoaglin): ``0.6745 * (x - median) / MAD``, where MAD
    is the median absolute deviation — the data-cleaning gate that
    survives exactly the rows it exists to catch (mean/stddev z-scores
    are dragged toward the outliers; one runaway value inflates sigma
    until nothing flags). Appends ``robust_z`` (rounded 6dp, the
    cross-engine float contract) and ``is_outlier`` (|z'| > ``z``;
    3.5 is the textbook threshold). NULL values and all-constant
    groups (MAD = 0) yield NULL ``robust_z`` and ``is_outlier`` false
    — a constant group has no outliers by this statistic, not
    infinitely many.

    Plan shape: two grouped percentile aggregates (exact ``percentile``
    by default — DuckDB's ``quantile_cont`` interpolation, the q44
    precedent — so the flags are engine-portable), each collapsing to
    a group-domain-sized frame joined back NULL-SAFELY (a NULL group
    key is a group like any other) with NO forced broadcast hint —
    AQE sees the aggregate's actual output size at runtime and picks
    the broadcast join itself, so a corpus-scaled group domain
    degrades to a shuffle join instead of a forced-broadcast OOM,
    with zero extra jobs (r15: a count-gated hint re-executed the
    percentile aggregates and measured 1.7-3x slower); the corpus is
    scanned twice (once per statistic — MAD needs the median first)
    and never shuffles on anything but the group key inside the
    aggregates. ``approx=True`` swaps both percentiles for the
    mergeable sketch (the :func:`winsorize`/:func:`numeric_drift`
    contract): no global sort, group medians off by ≤
    1/approx_accuracy rank error, flags drift only on
    boundary-adjacent rows."""
    keys = list(group_cols)
    if not keys:
        raise ValueError("robust_zscore needs at least one group col")
    akeys = [f"__rzk{i}" for i in range(len(keys))]
    clash = (
        {"robust_z", "is_outlier", "__med", "__mad"} | set(akeys)
    ) & set(df.columns)
    if clash:
        raise ValueError(
            f"robust_zscore output columns {sorted(clash)} already "
            "exist on the input"
        )
    v = F.col(value_col).cast("double")

    def _join_stats(left: DataFrame, stats: DataFrame) -> DataFrame:
        # NULL-SAFE key equality: groupBy computes a NULL-key group,
        # and a plain equi join would silently never match it back —
        # rows with a NULL group key got stats computed but NULL
        # robust_z / is_outlier=false (the screen_against_cutoffs
        # contract, applied here; r14 ADVICE fix). NO forced broadcast
        # hint: the stats frame is group-domain-sized by contract, but
        # a corpus-scaled domain would turn an undeclinable hint into
        # a driver OOM — AQE reads the aggregate's ACTUAL output size
        # at the stage boundary and converts to a broadcast join when
        # it is small (measured: AQE picks broadcast here at every
        # test scale; a count-gated hint was 1.7-4x slower because the
        # gating count re-executed the percentile aggregate).
        renamed = stats.select(
            *[F.col(k).alias(a) for k, a in zip(keys, akeys)],
            *[c for c in stats.columns if c not in keys],
        )
        cond = reduce(
            lambda x, y: x & y,
            [F.col(k).eqNullSafe(F.col(a)) for k, a in zip(keys, akeys)],
        )
        return left.join(renamed, cond, "left").drop(*akeys)

    def med(col):
        if approx:
            return F.percentile_approx(
                col, F.lit(0.5), F.lit(approx_accuracy)
            )
        return F.percentile(col, F.lit(0.5))

    meds = df.where(v.isNotNull()).groupBy(*keys).agg(
        med(v).alias("__med")
    )
    with_med = _join_stats(df, meds)
    mads = (
        with_med.where(v.isNotNull())
        .groupBy(*keys)
        .agg(med(F.abs(v - F.col("__med"))).alias("__mad"))
    )
    scored = _join_stats(with_med, mads)
    rz = F.when(
        v.isNotNull() & (F.col("__mad") > 0),
        F.round(
            F.lit(0.6745) * (v - F.col("__med")) / F.col("__mad"), 6
        ),
    )
    return (
        scored.withColumn("robust_z", rz)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > F.lit(z), F.lit(False)),
        )
        .drop("__med", "__mad")
    )


def crosstab_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Chi-square association between two categorical columns — the
    contingency-table stage of a dataset profile (is the label
    distribution independent of the source? does dump correlate with
    language?), emitted per OBSERVED cell with the table-level
    statistics riding along: ``(a, b, observed, expected,
    std_residual, chi2, cramers_v)`` (6dp-rounded doubles, the
    cross-engine float contract). ``chi2`` uses the algebraic
    identity ``Σ(o−e)²/e = Σ o²/e − n`` so UNOBSERVED cells (o=0,
    e>0) are fully accounted for without materializing them;
    ``cramers_v = sqrt(chi2 / (n · min(ka−1, kb−1)))`` is the
    [0,1]-normalized effect size (NULL when either column is
    constant — no association is definable). NULL categories count
    as a real category (tagged sentinel, the q162 device).

    Plan shape (the q162 lesson applied to two columns): ONE corpus
    pass to the (a, b) cell counts; row totals, column totals, grand
    total, domain cardinalities, and the chi2 sum are all WINDOWS
    over that domain-sized cell frame — never a groupBy+join-back,
    which would fork the count lineage and re-scan the corpus per
    consumer. Hot cells combine map-side; the cell frame is
    |A|×|B|-bounded, so everything after the first aggregate is
    domain-sized regardless of corpus scale.
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("\x00null"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("\x00null"))
    cells = df.groupBy(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    wr = Window.partitionBy("a")
    wc = Window.partitionBy("b")
    wt = Window.partitionBy()
    en = cells.select(
        "a",
        "b",
        "observed",
        F.sum("observed").over(wr).cast("double").alias("__rt"),
        F.sum("observed").over(wc).cast("double").alias("__ct"),
        F.sum("observed").over(wt).cast("double").alias("__n"),
        F.size(F.collect_set("a").over(wt)).cast("long").alias("__ka"),
        F.size(F.collect_set("b").over(wt)).cast("long").alias("__kb"),
    ).withColumn("__e", F.col("__rt") * F.col("__ct") / F.col("__n"))
    chi2 = (
        F.sum(
            F.col("observed").cast("double")
            * F.col("observed")
            / F.col("__e")
        ).over(wt)
        - F.col("__n")
    )
    dof_min = F.least(F.col("__ka") - 1, F.col("__kb") - 1)
    return (
        en.withColumn("__chi2", chi2)
        .select(
            "a",
            "b",
            "observed",
            F.round("__e", 6).alias("expected"),
            F.round(
                (F.col("observed") - F.col("__e"))
                / F.sqrt(F.col("__e")),
                6,
            ).alias("std_residual"),
            F.round("__chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("__chi2")
                    / (F.col("__n") * F.nullif(dof_min, F.lit(0)))
                ),
                6,
            ).alias("cramers_v"),
        )
    )
