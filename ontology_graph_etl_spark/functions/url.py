"""URL normalization expressions — the web-hygiene layer every
FineWeb/RefinedWeb-class pipeline runs BEFORE any text pass (URL-exact
dedup and domain gating are the cheapest filters in the stack, so they
go first at 100 TB). Pure JVM-side Column expressions (regexp + array
ops, whole-stage-codegen'd — no UDF, no driver round-trip), so both
the Spark plan and a SQL oracle derive identical strings.

Normalization contract (deliberately mechanical — canonicalization
beyond it, e.g. public-suffix registrable domains or IDN/punycode, is
out of scope and documented as such):

* :func:`url_host` — the authority's host: scheme and userinfo
  stripped, cut at the first ``/``, ``?`` or ``#``, ``:port`` suffix
  dropped, lowercased.
* :func:`url_domain` — :func:`url_host` minus one leading ``www.``
  (the conventional alias; full public-suffix reduction needs a
  suffix table and is a lookup join, not an expression).
* :func:`normalize_url` — the DEDUP identity: scheme and fragment
  dropped, host (with port) lowercased, path kept verbatim,
  ``utm_*`` tracking parameters removed from the query string
  (remaining parameters keep their order; an emptied query drops its
  ``?``). Two URLs that normalize equal are the same fetch for
  dedup purposes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme prefix, per RFC 3986 ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"
#: userinfo up to an @ BEFORE any path/query/fragment delimiter
_USERINFO_RE = r"^[^/?#@]*@"


def _authority_and_rest(url: Column) -> Column:
    """scheme and userinfo stripped — host[:port] + path + query +
    fragment remains."""
    return F.regexp_replace(
        F.regexp_replace(url, _SCHEME_RE, ""), _USERINFO_RE, ""
    )


def url_host(url: Column) -> Column:
    """Lowercased host of ``url`` (port stripped). NULL-safe: NULL in,
    NULL out; a scheme-less input is treated as starting at the
    authority (``example.com/x`` works)."""
    bare = _authority_and_rest(url)
    hostport = F.regexp_extract(bare, r"^([^/?#]*)", 1)
    return F.lower(F.regexp_replace(hostport, r":\d*$", ""))


def url_domain(url: Column) -> Column:
    """:func:`url_host` minus one leading ``www.`` — the domain key
    the per-domain gate groups by."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def normalize_url(url: Column) -> Column:
    """The dedup-identity form: ``lower(host[:port]) + path +
    filtered-query`` — scheme dropped, fragment dropped, ``utm_*``
    params removed (order of the survivors preserved), an emptied
    query loses its ``?``. Path case is preserved (paths are
    case-sensitive per RFC; hosts are not)."""
    bare = _authority_and_rest(url)
    no_frag = F.regexp_extract(bare, r"^([^#]*)", 1)
    hostport = F.regexp_extract(no_frag, r"^([^/?#]*)", 1)
    path = F.regexp_extract(no_frag, r"^[^/?#]*([^?#]*)", 1)
    qs = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.filter(
            F.split(qs, "&"),
            lambda p: ~p.startswith("utm_"),
        ),
        "&",
    )
    return F.concat(
        F.lower(hostport),
        path,
        F.when(
            (qs != "") & (kept != ""), F.concat(F.lit("?"), kept)
        ).otherwise(F.lit("")),
    )
