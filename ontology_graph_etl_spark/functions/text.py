"""Scalar functions with reference parity (SURVEY.md §2.6, F1-F6).

Each maps a per-record Python function from the reference to a Catalyst
expression so it participates in whole-stage codegen and never crosses
the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Same character class the reference strips to (main.py:44-49).
SANITIZE_PATTERN = r"[^a-zA-Z0-9\s]"


def sanitize_value(col: Column) -> Column:
    """F1 — regex sanitize (reference ``sanitize_value``, main.py:44-49).

    Casts to string first (the reference calls ``str(value)``) and maps
    null to empty string, exactly matching the reference's
    ``if value is None: return ""`` branch.
    """
    return F.coalesce(
        F.regexp_replace(col.cast("string"), SANITIZE_PATTERN, ""), F.lit("")
    )


def whitespace_tokens(col: Column, lowercase: bool = True) -> Column:
    """THE tokenization policy: split on ``\\s+`` runs, drop empties,
    lowercase by default. Every text operator (token stats, language-ID,
    quality, tf-idf, MinHash/SimHash/Jaccard dedup) MUST use this helper —
    the DuckDB oracles mirror it with ``regexp_split_to_array(· , '\\s+')``,
    and any site with its own inline split silently diverges from them.
    """
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(base, r"\s+"), lambda t: t != "")


def first_prefix(col: Column, sep: str = ":") -> Column:
    """F3 — split + first element (reference ``type.split(':')[0]``,
    main.py:380-382)."""
    return F.split(col, sep).getItem(0)


def format_merge_statement(
    label: str, id_col: Column, name_col: Column
) -> Column:
    """F2 — string templating (reference string.Template, main.py:62,299).

    Kept only for the cypher-codegen compatibility sink; the engine's
    core path treats data as data, which is what makes the reference's
    quote-injection defect (SURVEY.md §5 b) structurally impossible here.
    Unlike the reference, quotes in the name are escaped.
    """
    escaped = F.regexp_replace(name_col.cast("string"), r"'", r"\\'")
    return F.concat(
        F.lit(f"MERGE (n:{label} {{id: '"),
        id_col.cast("string"),
        F.lit("'}) ON CREATE SET n.name = '"),
        escaped,
        F.lit("'"),
    )


def stable_surrogate_id(*cols: Column) -> Column:
    """F6 replacement — deterministic surrogate id.

    The reference generates *random* 16-char Cypher variable names
    (main.py:290-291), making runs unreproducible. A content hash keeps
    the same uniqueness property while staying deterministic across runs
    and executors (no driver-side state, safe under retries).
    """
    return F.sha2(F.concat_ws("|", *[c.cast("string") for c in cols]), 256)
