"""URL canonicalization - the crawl-frontier staple.

Deduplication keys, politeness grouping and host-level statistics all
need ONE canonical spelling per URL: scheme and host are
case-insensitive (RFC 3986 6.2.2.1), default ports are redundant
(6.2.3), fragments never reach the server, and duplicate slashes are
the most common crawler-side path noise.  Everything here is a pure
``pyspark.sql.functions`` expression chain (whole-stage codegen, no
UDF) over the Java/RE2 regex common subset, so a DuckDB twin can
mirror it term for term - the repo's oracle discipline.

Scale note: canonicalization is a per-row map - no shuffle - and
``host_of`` is THE partitioning key for politeness/host-stats
aggregations downstream (one shuffle on a low-cardinality-ish key;
skew from mega-hosts is what operators/skew.py's salting exists for).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def host_of(url: Column) -> Column:
    """Lowercased host without port; empty string when there is none."""
    auth = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))


def normalize_url(url: Column) -> Column:
    """Canonical URL spelling:

    - scheme and host lowercased (userinfo dropped - crawl frontiers
      never keep credentials);
    - default ports stripped (``:80`` for http, ``:443`` for https,
      plus the degenerate bare ``:``);
    - fragment removed;
    - duplicate slashes in the PATH collapsed (the query string is
      opaque per RFC 3986 - ``?next=https://a//b`` keeps its slashes),
      empty path -> ``/``;
    - a trailing bare ``?`` removed.

    Rows without a ``scheme://`` prefix pass through unchanged (a
    frontier also carries mailto:/javascript: noise - not ours to
    rewrite)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = host_of(url)
    port = F.regexp_extract(
        F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2),
        r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)) \
        .otherwise(host)
    rest = F.regexp_replace(
        F.regexp_replace(url, r"#.*$", ""),            # fragment
        _SCHEME_RE + r"[^/?#]*", "")                   # scheme+authority
    # split at the FIRST '?': the query is opaque (RFC 3986), only the
    # path gets the duplicate-slash collapse
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")       # dup slashes
    query = F.regexp_replace(query, r"^\?$", "")       # bare '?'
    path = F.when(path == "", F.lit("/")).otherwise(path)
    out = F.concat(scheme, F.lit("://"), hostport, path, query)
    return F.when(scheme == "", url).otherwise(out)
