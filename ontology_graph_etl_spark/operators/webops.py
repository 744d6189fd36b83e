"""URL/domain-level web hygiene — the gate FineWeb/RefinedWeb-class
pipelines run before any text pass: normalized-URL exact dedup and
domain-level admission (blocklist + per-domain contribution cap).
These are the cheapest filters in the stack — pure string expressions
plus two keyed shuffles — so at 100 TB they run first and shrink
everything downstream. SURVEY.md §2 round-16 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url import normalize_url, url_domain


def web_hygiene_gate(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocked_domains: DataFrame | list[str] | None = None,
    max_per_domain: int | None = None,
) -> DataFrame:
    """One audited pass of URL-level hygiene. Adds to every input row:

    * ``norm_url`` — :func:`functions.url.normalize_url` (scheme and
      fragment dropped, host lowercased, ``utm_*`` params removed) —
      the dedup identity;
    * ``domain`` — :func:`functions.url.url_domain` (host minus one
      leading ``www.``) — the admission key;
    * ``blocked`` — domain appears in ``blocked_domains`` (a 1-column
      DataFrame or a Python list; blocklists are dictionary-sized so
      the membership join is broadcast);
    * ``url_dup`` — an UNBLOCKED row whose ``norm_url`` was already
      claimed by a smaller ``id_col`` (first-wins, the q14/q54
      deterministic-order contract). Blocked rows are excluded from
      the identity pool — a blocked fetch must not shadow a
      legitimate copy of the same URL — and carry ``url_dup=False``;
    * ``domain_rank`` — 1-based position of the row among its
      domain's SURVIVORS (not blocked, not dup), ordered by
      ``id_col``; NULL for non-survivors;
    * ``keep`` — survivor AND (no cap, or ``domain_rank <=
      max_per_domain``) — the RefinedWeb per-domain contribution cap,
      applied deterministically to the smallest ids so reruns keep
      the same rows.

    Stage order is part of the contract: blocklist → URL dedup →
    domain cap. The cap counts only rows that could actually be
    admitted, so a domain full of duplicates cannot starve its own
    fresh pages.

    Scale shape: one shuffle keyed by ``norm_url`` (the dedup
    window), one keyed by ``domain`` (the cap window over survivors
    only — rejected rows never enter it), one id-keyed join-back for
    the rank, and a broadcast for the blocklist. No collect, no UDF;
    every derived column is a codegen'd string expression. Hot
    domains skew the cap window; AQE's skew handling applies, and the
    window's input is already blocklist/dedup-pruned.
    """
    spark = df.sparkSession
    out = df.withColumn("norm_url", normalize_url(F.col(url_col)))
    out = out.withColumn("domain", url_domain(F.col(url_col)))
    if blocked_domains is None:
        out = out.withColumn("blocked", F.lit(False))
    else:
        if isinstance(blocked_domains, list):
            bl = spark.createDataFrame(
                [(d,) for d in blocked_domains], "domain string"
            )
        else:
            bl = blocked_domains.select(
                F.col(blocked_domains.columns[0]).alias("domain")
            )
        marker = bl.distinct().withColumn("__blk", F.lit(True))
        out = (
            out.join(F.broadcast(marker), "domain", "left")
            .withColumn("blocked", F.coalesce("__blk", F.lit(False)))
            .drop("__blk")
        )
    w_url = Window.partitionBy("norm_url")
    first_id = F.min(
        F.when(~F.col("blocked"), F.col(id_col))
    ).over(w_url)
    out = out.withColumn(
        "url_dup",
        ~F.col("blocked") & (F.col(id_col) != first_id),
    )
    survivors = out.where(~F.col("blocked") & ~F.col("url_dup")).select(
        F.col(id_col).alias("__sid"),
        F.row_number()
        .over(Window.partitionBy("domain").orderBy(F.col(id_col).asc()))
        .alias("domain_rank"),
    )
    out = out.join(
        survivors, F.col(id_col) == F.col("__sid"), "left"
    ).drop("__sid")
    is_survivor = ~F.col("blocked") & ~F.col("url_dup")
    if max_per_domain is None:
        keep = is_survivor
    else:
        keep = is_survivor & (
            F.col("domain_rank") <= F.lit(int(max_per_domain))
        )
    return out.withColumn("keep", keep)
