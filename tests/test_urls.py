import pandas as pd
from pyspark.sql import functions as F

from gdal_vfr_spark.functions import urls


def _host_and_domain(spark, url_values):
    df = spark.createDataFrame(pd.DataFrame({"url": url_values}))
    rows = urls.with_url_parts(df).select("url", "host", "registered_domain").collect()
    return {r["url"]: (r["host"], r["registered_domain"]) for r in rows}


def test_host_extraction_authority_grammar(spark):
    got = _host_and_domain(
        spark,
        [
            "https://www.Example.COM/path?q=1",
            "http://user:pw@shop.beta.co.uk:8443/x",
            "https://gamma.org",
            "ftp+ssh://a.b.c.d.example.org/file",
            "not-a-url",
            "https://localhost/x",
        ],
    )
    assert got["https://www.Example.COM/path?q=1"] == ("www.example.com", "example.com")
    # userinfo and port are stripped; co.uk is a two-level suffix
    assert got["http://user:pw@shop.beta.co.uk:8443/x"] == (
        "shop.beta.co.uk",
        "beta.co.uk",
    )
    assert got["https://gamma.org"] == ("gamma.org", "gamma.org")
    # deep subdomains collapse to the last two labels
    assert got["ftp+ssh://a.b.c.d.example.org/file"] == (
        "a.b.c.d.example.org",
        "example.org",
    )
    # schemeless input -> '' host (groups bad rows, never NULL-keys)
    assert got["not-a-url"] == ("", "")
    # single-label host passes through
    assert got["https://localhost/x"] == ("localhost", "localhost")


def test_domain_stats_and_cap(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "url": [
                "https://a.x.com/1",
                "https://b.x.com/2",
                "https://a.x.com/3",
                "https://y.org/4",
                "https://a.x.com/5",
                "https://y.org/6",
            ],
            "n_chars": [10, 20, 30, 40, 50, 60],
        }
    )
    df = spark.createDataFrame(pdf)
    stats = {
        r["registered_domain"]: (r["n_docs"], r["n_hosts"], r["sum_size"])
        for r in urls.domain_stats(df, size_col="n_chars").collect()
    }
    assert stats == {"x.com": (4, 2, 110), "y.org": (2, 1, 100)}

    kept = urls.cap_per_domain(df, 2, order_by=[F.desc("n_chars")])
    got = sorted((r["registered_domain"], r["doc_id"]) for r in kept.collect())
    # x.com keeps the two largest (doc 4: 50, doc 2: 30); y.org keeps both
    assert got == [("x.com", 2), ("x.com", 4), ("y.org", 3), ("y.org", 5)]


def test_canonicalize_url_cases(spark):
    from gdal_vfr_spark.functions.urls import canonicalize_url_expr

    cases = [
        ("HTTPS://WWW.Example.COM:443/a?utm_source=x&id=1#frag",
         "https://www.example.com/a?id=1"),
        ("http://Host.cz:80/", "http://host.cz"),
        ("http://host.cz:8080/x", "http://host.cz:8080/x"),  # non-default port kept
        ("https://u:p@site.co.uk/path/?utm_a=1&utm_b=2", "https://site.co.uk/path/"),  # non-root trailing slash kept
        ("https://a.b/?fbclid=9", "https://a.b"),
        ("https://a.b/p?id=2&gclid=z&x=3", "https://a.b/p?id=2&x=3"),
        ("no-scheme-at-all", "no-scheme-at-all"),  # passthrough
        ("https://a.b/#only-frag", "https://a.b"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url_expr("url").alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_blocklist_suffix_semantics(spark):
    """Exact-host, parent-domain, and overlapping-rule matches; the
    most specific matched domain is reported; unlisted hosts and
    LOOK-ALIKE hosts (evilgamma.org — not a subdomain) survive."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "url": [
                    "https://media.beta.co.uk/a",      # subdomain of blocked
                    "https://gamma.org/b",             # exact domain
                    "https://CDN.gamma.org/c",         # matches 2 rules
                    "https://evilgamma.org/d",         # look-alike, survives
                    "https://www.alpha-news.com/e",    # unlisted, survives
                    "http://user:pw@x.delta-portal.cz:8080/f",  # authority noise
                ],
            }
        )
    )
    blocked = spark.createDataFrame(
        pd.DataFrame({"domain": ["beta.co.uk", "gamma.org", "cdn.gamma.org",
                                 "delta-portal.cz"]})
    )
    hits = {
        r["doc_id"]: r["matched_domain"]
        for r in urls.blocklist_hits(docs, blocked).collect()
    }
    assert hits == {
        1: "beta.co.uk",
        2: "gamma.org",
        3: "cdn.gamma.org",  # most specific of the two matching rules
        6: "delta-portal.cz",
    }
    survivors = sorted(
        r["doc_id"] for r in urls.blocklist_filter(docs, blocked).collect()
    )
    assert survivors == [4, 5]


def test_host_suffixes_expr(spark):
    df = spark.createDataFrame(pd.DataFrame({"h": ["a.b.co.uk", "x", ""]}))
    got = {
        r["h"]: r["s"]
        for r in df.select("h", urls.host_suffixes_expr("h").alias("s")).collect()
    }
    assert got["a.b.co.uk"] == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    assert got["x"] == ["x"]
    assert got[""] == [""]
