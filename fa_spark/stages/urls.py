"""URL canonicalization (round 4 — the pre-dedup normalization layer a
Common-Crawl-scale pipeline needs before any url-keyed operator: the
reference dedups files by path string (rdfind semantics,
/root/reference/src/core/analyzer.py:315-364); at web scale the same
page arrives as `HTTP://WWW.Example.com:80/a/?utm_source=x&b=2&a=1#top`
and `http://example.com/a?a=1&b=2`, and url-keyed dedup/lineage must see
one key.

Pure Catalyst — regexp component split + higher-order array ops, no UDF,
whole-stage codegen; canonicalizing 10^12 urls costs one projection.

Rules (the crawler-standard subset whose semantics are unambiguous):
  1. drop the fragment (`#...`)
  2. lowercase the scheme and host
  3. drop the default port (`:80` http, `:443` https); other ports kept
  4. drop tracking params (utm_* prefix + the exact-name set), keep the
     rest SORTED byte-wise (param order never distinguishes resources)
  5. empty path -> `/`; otherwise strip ONE trailing slash (except root)
  6. optional `strip_www`: fold a leading `www.` off the host (off by
     default — it merges distinct origins, callers opt in for dedup keys)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# "ref" is deliberately NOT in the default set: it is not unambiguously a
# tracking param (e.g. GitHub's ?ref=<branch> selects a distinct resource),
# and the module rule is "semantics are unambiguous".  Callers that know
# their corpus can pass their own set via `tracking_params`.
TRACKING_PARAM_NAMES = ("gclid", "fbclid", "msclkid", "igshid")
TRACKING_PARAM_PREFIXES = ("utm_",)


def _keep_param(p: Column, names: tuple[str, ...]) -> Column:
    name = F.regexp_extract(p, r"^([^=]*)", 1)
    keep = (p != "") & ~F.lower(name).isin(*names)
    for pref in TRACKING_PARAM_PREFIXES:
        keep = keep & ~F.lower(name).startswith(pref)
    return keep


def _norm_query(query: Column, names: tuple[str, ...]) -> Column:
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: _keep_param(p, names))
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))


def normalize_url_expr(
    col,
    strip_www: bool = False,
    tracking_params: tuple[str, ...] = TRACKING_PARAM_NAMES,
) -> Column:
    """Canonical form of a URL column (see module docstring for rules).
    Scheme-less input is passed through with only fragment/query cleanup
    (no host to case-fold)."""
    u = F.regexp_replace(col, r"#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))  # 2.
    # 3. default ports (anchored regexp_replace — no substring-from-end)
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).otherwise(
        F.when(
            scheme == "https", F.regexp_replace(hostport, r":443$", "")
        ).otherwise(hostport)
    )
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    # 5. `(.)/$` needs a char before the slash, so root "/" never matches
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    with_scheme = F.concat(
        scheme, F.lit("://"), hostport, path, _norm_query(query, tracking_params)
    )
    # scheme-less input: strip fragment + tracking only, no case folding
    bare_path = F.regexp_extract(u, r"^([^?]*)", 1)
    bare_query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    return F.when(scheme != "", with_scheme).otherwise(
        F.concat(bare_path, _norm_query(bare_query, tracking_params))
    )


def normalize_urls(
    df: DataFrame, col: str = "url", out_col: str = "canonical_url",
    strip_www: bool = False,
    tracking_params: tuple[str, ...] = TRACKING_PARAM_NAMES,
) -> DataFrame:
    """df + a canonical_url column (normalize_url_expr)."""
    return df.withColumn(
        out_col, normalize_url_expr(F.col(col), strip_www, tracking_params)
    )


def surt_key_expr(col) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL column
    — the index/dedup key CDX indexes use for Common-Crawl-style
    archives: host segments reversed and comma-joined so one domain's
    pages sort contiguously, e.g.
    `http://www.news.example.com/a?q=1#top` -> `com,example,news)/a?q=1`.

    Pure Catalyst (regexp split + reverse + array_join, zero UDF): at
    10^12 urls the key is one codegen projection, and range-partitioning
    on it co-locates each registered domain. Rules (standard SURT):
    lowercase host, strip userinfo (`user:pass@`), fold a leading
    `www.`, drop only the SCHEME'S OWN default port (`:80` for http,
    `:443` for https — `http://host:443` keeps its port and stays a
    distinct key), reverse dot-segments with commas, `)` then path
    (`/` if empty) and `?query` if present; scheme and fragment
    dropped. Scheme-less input yields NULL (no host to transform)."""
    u = col
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    # userinfo precedes the host; per RFC 3986 the host starts after
    # the LAST '@' in the authority (userinfo itself may contain '@' in
    # malformed/phishing-shaped URLs like http://a@b@evil.com/), so
    # strip GREEDILY to the last '@' — hostport cannot contain '/'
    hostport = F.regexp_replace(hostport, r"^.*@", "")
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    default_port = (
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .otherwise(F.lit(""))
    )
    # a non-default port trails the REVERSED host (com,example:8080)) —
    # it must not ride the TLD segment through the reversal
    port = F.regexp_extract(hostport, r":0*(\d+)$", 1)
    port = F.when(port == default_port, F.lit("")).otherwise(port)
    host = F.regexp_replace(hostport, r":\d+$", "")
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    key = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(host != "", key).otherwise(F.lit(None))
