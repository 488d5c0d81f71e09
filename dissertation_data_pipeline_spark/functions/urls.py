"""[EXT] URL canonicalization — the crawl-pipeline step before
URL-level dedup.

Reference provenance: the reference builds document ids from URLs
(``src/legal_pipeline/utils/io.py`` — doc-id-from-URL, covered by
``fs13_doc_id_from_url``) but never canonicalizes; at crawl scale the
same page arrives as dozens of byte-distinct URLs (scheme/host case,
default ports, tracking params, param order, fragments) and URL-level
exact dedup is the cheapest dedup tier — it runs BEFORE any content
is fetched.

Everything here is deliberately regex + array expressions (NOT
``F.parse_url``): ``parse_url`` delegates to java.net.URI, whose edge
semantics (bare '?', empty fragments, userinfo) cannot be reproduced
exactly in another engine, and the whole point of these functions is
that the DuckDB oracle applies the identical rules via the identical
regexes. All JVM-side codegen — no UDFs, no shuffles.

Canonicalization rules (each stated once, both engines):
1. trim; scheme and host lowercase (path/query stay case-sensitive);
2. fragment dropped;
3. default ports dropped (http:80, https:443);
4. tracking params dropped: ``utm_*``, ``fbclid``, ``gclid``, ``ref``;
5. surviving query params sorted bytewise (param order never
   distinguishes resources in practice, and sorting makes the
   canonical form order-insensitive);
6. an empty path becomes '/'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: params that never distinguish resources (tracking/attribution)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme, '' when the value does not parse as a URL."""
    return F.lower(F.regexp_extract(F.trim(_c(col)), _SCHEME_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host with default ports stripped (http:80,
    https:443); non-default ports are kept — they address distinct
    services."""
    raw = F.lower(F.regexp_extract(F.trim(_c(col)), _HOST_RE, 1))
    scheme = url_scheme(col)
    no_port = F.regexp_extract(raw, r"^(.*?)(:\d+)?$", 1)
    port = F.regexp_extract(raw, r":(\d+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.when(default | (port == ""), no_port).otherwise(raw)


def url_registered_domain(col: Column | str) -> Column:
    """Last two dot-labels of the host — the registrable-domain
    HEURISTIC. A correct answer needs the Public Suffix List (co.uk,
    com.au, ...); shipping a point-in-time PSL snapshot would rot and
    a live fetch is out (no network), so the two-label rule is the
    documented approximation — same trade the reference makes with
    its hand-rolled state map."""
    # the domain is a NAME — ports never belong to it, even though
    # url_host keeps non-default ports (host:port addresses a service)
    bare = F.regexp_extract(url_host(col), r"^(.*?)(:\d+)?$", 1)
    return F.regexp_extract(bare, r"([^.]+\.[^.]+)$", 1)


def canonicalize_url(col: Column | str) -> Column:
    """The full canonical form (see module docstring for the rules).
    Non-URL values (no scheme://) canonicalize to NULL — callers
    decide whether that is a filter or an error."""
    s = F.trim(_c(col))
    scheme = url_scheme(col)
    host = url_host(col)
    path = F.regexp_extract(s, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(s, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def url_canonical_sql(expr: str) -> str:
    """The DuckDB twin of :func:`canonicalize_url` + host/domain —
    returns a SQL struct expression ``{canon, host, domain}`` applying
    the identical regexes and rules to ``expr``. Lives beside the
    engine function so the two rule sets cannot drift apart."""
    s = f"trim({expr})"
    scheme = f"lower(regexp_extract({s}, '{_SCHEME_RE}', 1))"
    raw_host = f"lower(regexp_extract({s}, '{_HOST_RE}', 1))"
    no_port = f"regexp_extract({raw_host}, '^(.*?)(:\\d+)?$', 1)"
    port = f"regexp_extract({raw_host}, ':(\\d+)$', 1)"
    host = (
        f"CASE WHEN (({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443') OR {port} = '') "
        f"THEN {no_port} ELSE {raw_host} END"
    )
    path0 = f"regexp_extract({s}, '{_PATH_RE}', 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"regexp_extract({s}, '{_QUERY_RE}', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    qpart = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    canon = (
        f"CASE WHEN {scheme} = '' THEN NULL "
        f"ELSE {scheme} || '://' || {host} || {path} || {qpart} END"
    )
    bare = f"regexp_extract({host}, '^(.*?)(:\\d+)?$', 1)"
    domain = f"regexp_extract({bare}, '([^.]+\\.[^.]+)$', 1)"
    return f"{{'canon': {canon}, 'host': {host}, 'domain': {domain}}}"
