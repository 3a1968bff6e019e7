"""URL canonicalization: the web-ER entity key.

For Common-Crawl-style corpora the first, cheapest entity-resolution
signal is the URL itself: the same page is crawled as
``HTTP://WWW.Site.com:80//a/b/?utm_source=tw&b=2&a=1#frag`` one day
and ``http://site.com/a/b?a=1&b=2`` the next. Canonicalizing before
blocking collapses these for free — no pairwise scoring spent on
them. The reference engine operates below this layer (it scores
strings it is given); this operator is part of the cluster-scale ER
reimagining, same family as operators/pprl.py.

Canonical form (documented contract, deterministic, pure Catalyst —
every step is a built-in string/array function, so the DuckDB oracle
replicates it exactly; see __spark_entry__.py q95):

1.  trim; strip the fragment (``#...``).
2.  no ``://`` → returned trimmed and otherwise untouched (opaque
    ids, relative links).
3.  scheme and host lowercased; a leading ``www.`` dropped.
4.  default ports dropped (http:80, https:443); explicit non-default
    ports kept.
5.  path: runs of ``/`` collapsed, trailing ``/`` dropped, empty
    path → ``/`` (so ``http://h`` and ``http://h/`` unify).
6.  query: split on ``&``; empty params and tracking params dropped
    (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``);
    survivors sorted bytewise and rejoined; empty → no ``?``.

Scale: one projection per record — no shuffle, no UDF, no join. At
10^12 rows this is a free map stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PRED = (
    "p <> '' AND substr(p, 1, 4) <> 'utm_'"
    " AND p NOT LIKE 'fbclid=%' AND p <> 'fbclid'"
    " AND p NOT LIKE 'gclid=%' AND p <> 'gclid'"
    " AND p NOT LIKE 'msclkid=%' AND p <> 'msclkid'"
    " AND p NOT LIKE 'ref=%' AND p <> 'ref'"
)


def canonical_url(col: str) -> Column:
    """Canonical form of URL column ``col`` (a single Catalyst
    expression; see module docstring for the contract)."""
    t = f"trim({col})"
    nf = f"regexp_replace({t}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nf}, '^([^:/?#]+)://', 1))"
    rest = f"regexp_replace({nf}, '^[^:/?#]+://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"substr({rest}, length({hostport}) + 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    host_lc = f"lower(regexp_replace({hostport}, ':[0-9]+$', ''))"
    host = (
        f"CASE WHEN {host_lc} LIKE 'www.%' THEN substr({host_lc}, 5)"
        f" ELSE {host_lc} END"
    )
    keep_port = (
        f"({port} <> ''"
        f" AND NOT ({scheme} = 'http' AND {port} = '80')"
        f" AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    p1 = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({pathq}, '^([^?]*)', 1), '/{{2,}}', '/'),"
        f" '/$', '')"
    )
    path = f"CASE WHEN {p1} = '' THEN '/' ELSE {p1} END"
    qs = (
        f"array_join(array_sort(filter(split("
        f"regexp_extract({pathq}, '\\\\?(.*)$', 1), '&'),"
        f" p -> {_TRACKING_PRED})), '&')"
    )
    return F.expr(
        f"CASE WHEN position('://' IN {nf}) = 0 THEN {t}"
        f" ELSE {scheme} || '://' || {host}"
        f" || (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
        f" || {path}"
        f" || (CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)"
        f" END"
    )


def canonicalize_urls(
    df: DataFrame, col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Append ``out_col`` = canonical form of ``col``."""
    return df.withColumn(out_col, canonical_url(col))


# Multi-label public suffixes recognized by registrable_domain — a
# deliberately small, FIXED subset of the Mozilla Public Suffix List
# (publicsuffix.org): the common ccTLD second-level registries. The
# full list is a data file swap (broadcast it and join, or regenerate
# this literal); the extraction logic is suffix-count-based and does
# not change. Kept as a literal so the expression stays a pure
# Catalyst projection with zero joins.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def registrable_domain(col: str) -> Column:
    """eTLD+1 of a (canonical, lowercase) host column.

    ``news.bbc.co.uk`` → ``bbc.co.uk``; ``www.example.com`` →
    ``example.com`` (callers strip ``www.`` via canonical_url first);
    a host that IS a listed suffix or shorter is returned whole.
    This is the block key web-scale ER actually wants: raw-host
    blocking splits one site's crawl variants (m./news./cdn.) into
    different blocks and misses their pairs. Pure projection, no
    shuffle."""
    suf = ", ".join(f"'{s}'" for s in MULTIPART_SUFFIXES)
    multi = (
        f"size(filter(array({suf}),"
        f" s -> {col} = s OR {col} LIKE '%.' || s)) > 0"
    )
    take = f"CASE WHEN {multi} THEN 3 ELSE 2 END"
    parts = f"split({col}, '\\\\.')"
    n = f"size({parts})"
    return F.expr(
        f"CASE WHEN {n} <= {take} THEN {col}"
        f" ELSE array_join(slice({parts}, {n} - {take} + 1, {take}),"
        f" '.') END"
    )


def reversed_host(col: str) -> Column:
    """SURT-style sort key: host labels reversed (``news.bbc.co.uk``
    → ``uk.co.bbc.news``). Sorting/range-partitioning a 10^12-row
    crawl on this key co-locates every host of a site — the Common
    Crawl index ordering — so per-site scans become partition-pruned
    range reads instead of shuffles."""
    return F.expr(
        f"array_join(reverse(split({col}, '\\\\.')), '.')"
    )
