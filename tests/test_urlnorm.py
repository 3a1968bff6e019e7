"""URL canonicalization: hand-pinned contract cases + plan purity."""

import pytest

from sassy_spark.functions.urlnorm import (
    canonicalize_urls,
    registrable_domain,
    reversed_host,
)

pytestmark = pytest.mark.usefixtures("spark")

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Site.com:80//a/b/?utm_source=tw&b=2&a=1#frag",
     "http://site.com/a/b?a=1&b=2"),
    ("https://Example.COM:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com:443/x", "http://example.com:443/x"),
    ("http://host.com", "http://host.com/"),
    ("http://host.com/", "http://host.com/"),
    ("http://host.com/a//b///c/", "http://host.com/a/b/c"),
    ("http://host.com/p?gclid=abc&", "http://host.com/p"),
    ("http://host.com/p?z=9&a=1&ref=foo", "http://host.com/p?a=1&z=9"),
    ("http://host.com/p?ref", "http://host.com/p"),
    ("http://host.com/p?utm=keepme", "http://host.com/p?utm=keepme"),
    ("  http://host.com/x  ", "http://host.com/x"),
    ("not-a-url", "not-a-url"),
    ("  plain text  ", "plain text"),
    ("http://www.w.com/", "http://w.com/"),
]


def test_canonical_url_hand_pinned(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {r["i"]: r["url_canon"] for r in canonicalize_urls(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_canonical_collapses_crawl_variants(spark):
    # the ER point: all spellings of one page share one key
    variants = [
        "http://www.news.org/2024/story?utm_campaign=x",
        "HTTP://news.org:80/2024//story/",
        "http://News.Org/2024/story#comments",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    keys = {r["url_canon"] for r in canonicalize_urls(df).collect()}
    assert keys == {"http://news.org/2024/story"}


DOMAIN_CASES = [
    ("news.bbc.co.uk", "bbc.co.uk", "uk.co.bbc.news"),
    ("www.example.com", "example.com", "com.example.www"),
    ("example.com", "example.com", "com.example"),
    ("a.b.c.example.net", "example.net", "net.example.c.b.a"),
    ("shop.site3.com.au", "site3.com.au", "au.com.site3.shop"),
    ("co.uk", "co.uk", "uk.co"),
    ("x.co.uk", "x.co.uk", "uk.co.x"),
    ("localhost", "localhost", "localhost"),
]


def test_registrable_domain_and_surt_key(spark):
    df = spark.createDataFrame(
        [(h,) for h, _, _ in DOMAIN_CASES], "host string"
    )
    got = {
        r["host"]: (r["reg"], r["rev"])
        for r in df.select(
            "host",
            registrable_domain("host").alias("reg"),
            reversed_host("host").alias("rev"),
        ).collect()
    }
    for host, reg, rev in DOMAIN_CASES:
        assert got[host] == (reg, rev), f"{host}: {got[host]}"


def test_registrable_domain_unifies_site_crawl(spark):
    # the blocking point: every subdomain of one site keys together
    hosts = ["bbc.co.uk", "news.bbc.co.uk", "m.news.bbc.co.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    keys = {
        r[0] for r in df.select(registrable_domain("host")).collect()
    }
    assert keys == {"bbc.co.uk"}


def test_canonicalize_is_pure_catalyst(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan  # no shuffle: a pure map stage
