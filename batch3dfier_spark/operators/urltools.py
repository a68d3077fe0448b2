"""URL canonicalization + canonical-URL dedup for web corpora.

Common-Crawl-style pipelines dedup fetches of the SAME resource that
differ only in URL spelling: scheme/host case, default ports, fragment,
tracking parameters (utm_*, gclid, fbclid), empty query strings, and
query-parameter order.  Canonicalization rewrites every URL to one
normal form so a plain exact dedup on the canonical string collapses
them — no fuzzy matching, no shuffle beyond the final groupBy.

Everything here is pure JVM expression (regexp_extract /
regexp_replace / split / array_sort / concat): whole-stage codegen,
no Python, no higher-order-function lambdas (array_sort is used with
its natural string ordering, which is the same binary ordering DuckDB's
list_sort applies — byte-identical for the ASCII charset URLs live in).
Every rewrite is replayed by an exact DuckDB twin (`sql_url_canonical`)
built from the same patterns in the same order; the patterns are in the
java.regex ∩ RE2 subset (no lookaround, no backreferences).

Canonical form (applied in this order):
1. lowercase the scheme and the host[:port]
2. drop the fragment (#... to end)
3. drop tracking params utm_*/gclid/fbclid (value and separator)
4. drop a default port (:80 on http, :443 on https)
5. sort remaining query params byte-lexicographically
6. drop an empty query ('?' with nothing after it)
7. drop a single trailing slash on a non-root path (both at the end
   of the URL and immediately before the query string)

The reference has no URL operator (its keys are tile ids); this module
is part of the engine's training-data surface (brief: "the operations
a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_canonical", "url_dedup", "sql_url_canonical"]

# (java_pattern == re2_pattern for every entry — kept as one string)
_TRACK = r"(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def url_canonical(url: Column) -> Column:
    """Canonical form of `url` as a pure-JVM expression chain."""
    u = F.coalesce(url, F.lit(""))
    # 1. lowercase scheme://host[:port] (authority ends at /, ?, or #)
    scheme_host = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    # 2. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. drop tracking params: as first param (keep the '?'), as a
    #    later param (eat the '&'), repeated-pass-free because the 'g'
    #    flag handles every non-overlapping occurrence and the two
    #    rewrites cannot re-create each other's pattern
    u = F.regexp_replace(u, r"&" + _TRACK, "")
    u = F.regexp_replace(u, r"\?" + _TRACK + r"&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACK + r"$", "")
    # 4. default ports
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443(?=[/?#]|$)", "$1")
    # 5. sort query params (split on '?': base + query)
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&", -1)), "&")
    u = F.when(query == "", base).otherwise(F.concat(base, F.lit("?"), sorted_q))
    # 6. empty query
    u = F.regexp_replace(u, r"\?$", "")
    # 7. single trailing slash on a non-root path — at end of URL or
    #    just before the query (unmatched optional group substitutes ""
    #    in both java.regex and RE2)
    u = F.regexp_replace(
        u,
        r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/[^?#]*[^/?#])/(\?.*)?$",
        "$1$2",
    )
    return u


def sql_url_canonical(url: str = "url") -> str:
    """DuckDB twin of url_canonical: identical patterns, same order.
    Returns a SQL expression over column/expression `url`."""
    u = f"COALESCE({url}, '')"
    sh = f"LOWER(REGEXP_EXTRACT({u}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))"
    rest = f"REGEXP_REPLACE({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    u = f"({sh} || {rest})"
    u = f"REGEXP_REPLACE({u}, '#.*$', '')"
    u = f"REGEXP_REPLACE({u}, '&{_TRACK}', '', 'g')"
    u = f"REGEXP_REPLACE({u}, '\\?{_TRACK}&', '?', 'g')"
    u = f"REGEXP_REPLACE({u}, '\\?{_TRACK}$', '')"
    # RE2 has no lookahead: spell the default-port rule with a captured
    # tail instead of (?=...) — same language, same rewrite
    u = f"REGEXP_REPLACE({u}, '^(http://[^/?#:]*):80([/?#].*)?$', '\\1\\2')"
    u = f"REGEXP_REPLACE({u}, '^(https://[^/?#:]*):443([/?#].*)?$', '\\1\\2')"
    base = f"REGEXP_EXTRACT({u}, '^([^?]*)', 1)"
    query = f"REGEXP_EXTRACT({u}, '^[^?]*\\?(.*)$', 1)"
    sq = f"ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT({query}, '&')), '&')"
    u = f"(CASE WHEN {query} = '' THEN {base} ELSE {base} || '?' || {sq} END)"
    u = f"REGEXP_REPLACE({u}, '\\?$', '')"
    u = (
        f"REGEXP_REPLACE({u}, "
        f"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/[^?#]*[^/?#])/(\\?.*)?$', "
        f"'\\1\\2')"
    )
    return u


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per CANONICAL url — the lowest id wins (the
    deterministic survivor rule every dedup in this engine uses).
    One shuffle (groupBy canonical); the min survivor aggregates
    map-side, so a hot canonical URL (a boilerplate redirect target
    fetched billions of times) combines before the exchange instead of
    piling onto one task."""
    canon = df.withColumn("url_canon", url_canonical(F.col(url_col)))
    survivors = canon.groupBy("url_canon").agg(
        F.min(F.col(id_col)).alias(id_col)
    )
    return canon.join(survivors, on=["url_canon", id_col], how="inner")
