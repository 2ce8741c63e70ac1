"""URL analytics for the web-corpus side: host extraction, a
registered-domain heuristic, and per-domain policies (stats, caps).

The reference engine's analogue is its layer-code munging — the pure
string functions that normalize feature identity before grouping
(vfr4ogr/vfrogr.py:885 key synthesis, utils.py:178-180 extension
dispatch). A web-corpus engine needs the same move one level up:
documents group by the REGISTERED DOMAIN of their URL, which is what
per-domain quotas, per-site quality priors, and domain-level dedup in
training-data pipelines key on (C4/RefinedWeb-style per-domain caps).

Everything here is a pure Catalyst expression chain — JVM regex and
array ops inside whole-stage codegen, zero Python boundary — so the
hot path scales like any other projection. The regex subset is valid
and equivalent in Java (Spark) and RE2 (DuckDB oracle): no
backreferences, no lookaround, explicit character classes.

Scale note: per-domain groupBy/windows shuffle on the registered
domain, which is Zipf-skewed in real crawls (a few megasites own a
large share of pages). The skew machinery (plans/skew.py: hot-key
sampling + salted repartition, AQE skew splitting) applies to this key
exactly as it does to the megacity cell key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Authority = everything between "://" (plus optional userinfo@) and
# the first "/", "?", "#" or ":" (port). Lowercased afterwards: host
# names are case-insensitive (RFC 3986 §3.2.2), paths are not.
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

# Two-level public suffixes the heuristic recognizes. A production
# deployment would broadcast-join the full public-suffix list (a
# ~10^4-row dimension table — trivially broadcastable); the heuristic
# keeps the function dependency-free and the cross-engine oracle
# byte-identical. Kept sorted and lowercase.
SECOND_LEVEL_SUFFIXES = (
    "ac.uk",
    "co.jp",
    "co.nz",
    "co.uk",
    "com.au",
    "com.br",
    "gov.uk",
    "org.uk",
)


def host_expr(url: Column | str) -> Column:
    """Lowercased host of an absolute URL ('' when the URL has no
    scheme://authority part — bad rows group together and are easy to
    filter, instead of poisoning a NULL-keyed partition)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain_expr(host: Column | str) -> Column:
    """Registered domain of a host: the last two labels, or the last
    THREE when the host ends in a recognized two-level public suffix
    (shop.beta.co.uk -> beta.co.uk, not co.uk). Hosts with fewer than
    two labels pass through unchanged."""
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    suffix2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    suffix3 = F.concat_ws(".", F.element_at(labels, -3), suffix2)
    is_2l_suffix = suffix2.isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when((n >= 3) & is_2l_suffix, suffix3)
        .when(n >= 2, suffix2)
        .otherwise(host)
    )


# Query parameters that never change page identity — analytics/click
# trackers. Kept small and explicit so the cross-engine twin stays
# byte-identical; extend per deployment.
TRACKING_PARAM_RE = "utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_eid"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_NOUSER_RE = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)"


def canonicalize_url_expr(url: Column | str) -> Column:
    """URL canonicalization for crawl dedup — the normalization every
    web pipeline applies before URL-level dedup/frontier-merge so that
    trivially-distinct spellings of one page collapse to one key:

    - fragment stripped (never sent to the server),
    - scheme and host lowercased (RFC 3986 §6.2.2.1), userinfo dropped,
    - default ports stripped (:80 for http, :443 for https),
    - tracking query params removed (TRACKING_PARAM_RE), separators
      repaired, dangling ?/& stripped,
    - a bare "/" root path dropped.

    Pure Catalyst regexp chain (Java∩RE2 subset — no lookaround, so the
    default-port strip uses a captured-delimiter rewrite instead of a
    lookahead); URLs without a scheme://authority pass through
    unchanged. DuckDB twin mirrors the chain with regexp_replace 'g'."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _AUTH_NOUSER_RE, 1))
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(host, ":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(u, _REST_RE, 1)
    rest = F.regexp_replace(rest, f"([?&])(?:{TRACKING_PARAM_RE})=[^&]*", "$1")
    rest = F.regexp_replace(rest, "&&+", "&")
    rest = F.regexp_replace(rest, "\\?&", "?")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "^/$", "")
    return F.when(scheme == F.lit(""), url).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def host_suffixes_expr(host: Column | str) -> Column:
    """All domain suffixes of a host, most-specific first:
    a.b.co.uk -> [a.b.co.uk, b.co.uk, co.uk, uk]. The length of the
    array is the host's label count (bounded ~4-6 in real crawls), so
    exploding it is a constant per-row fan-out. Pure Catalyst
    (sequence + slice inside transform), stays in codegen."""
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(labels, i, n), ".")
    )


def blocklist_hits(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """(id, host, matched_domain) for every document whose URL host IS
    a blocked domain or is a SUBDOMAIN of one — the UT1/RefinedWeb-style
    URL filter semantics (block "casino.example" and
    "ads.casino.example" falls with it).

    Scale shape: the host explodes into its suffix chain (bounded
    label-count rows per doc) and equi-joins the blocklist on the bare
    suffix — never a regex/LIKE scan over the list. Catalyst broadcasts
    the typical 10^4-row list; a UT1-scale 10^6-row list falls back to
    a shuffle equi-join on the suffix key, which AQE handles like any
    narrow join. When several block rules cover one host the most
    specific (longest) matched domain is reported; suffixes of one host
    have strictly decreasing lengths, so max_by is deterministic."""
    parts = with_url_parts(df, url_col)
    sfx = parts.select(
        id_col,
        "host",
        F.explode(host_suffixes_expr(F.col("host"))).alias("__sfx"),
    )
    rules = blocked.select(F.col(domain_col).alias("__sfx")).distinct()
    hits = sfx.join(rules, on="__sfx")
    return hits.groupBy(id_col, "host").agg(
        F.max_by("__sfx", F.length("__sfx")).alias("matched_domain")
    )


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Documents surviving the domain blocklist (anti-join on the hit
    id set — the corpus side stays full-width only through a narrow
    key join, text never shuffles twice)."""
    hits = blocklist_hits(df, blocked, url_col, id_col, domain_col)
    return df.join(hits.select(id_col), on=id_col, how="left_anti")


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append host + registered_domain columns (chained projections —
    stays inside whole-stage codegen like the text ops)."""
    out = df.withColumn("host", host_expr(url_col))
    return out.withColumn("registered_domain", registered_domain_expr("host"))


def domain_stats(
    df: DataFrame, url_col: str = "url", size_col: str | None = None
) -> DataFrame:
    """Per-registered-domain corpus stats: page count, distinct hosts,
    and (optionally) total payload size. One partial+final hash
    aggregate; all outputs are order-free integers so the cross-engine
    oracle is exact."""
    parts = with_url_parts(df, url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("sum_size"))
    return parts.groupBy("registered_domain").agg(*aggs)


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_docs`` documents per registered domain — the
    standard anti-megasite quota in training-data pipelines. Which
    docs survive is deterministic: ``order_by`` ranks within the
    domain (default: by ``id_col``), ties broken by ``id_col``. One
    window shuffle on the domain key; at crawl scale pair with the
    skew plans for the megasite domains."""
    order = list(order_by) if order_by else []
    order.append(F.asc(id_col))
    w = Window.partitionBy("registered_domain").orderBy(*order)
    return (
        with_url_parts(df, url_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_docs)
        .drop("__rn")
    )
