"""Byte-identical HTML -> text extraction (BASELINE.json:input_hint
per-row invariant: 'byte-identical extracted text per url')."""

from pyspark.sql import functions as F

from gdal_vfr_spark import datagen
from gdal_vfr_spark.functions import html_text

CASES = [
    # (html, expected extracted text)
    (b"<html><body>hello world</body></html>", "hello world"),
    (b"<p>a</p><p>b</p>", "a b"),  # tags become separators
    (b"<div>x<script>if(a<b&&c>0){go()}</script>y</div>", "x y"),
    (b"<style type='text/css'>p{color:red}</style>t", "t"),
    (b"<script>\nmulti\nline\n</script>after", "after"),
    (b"<p>&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;</p>", "<tag> & \"q\" 's'"),
    (b"&amp;lt;", "&lt;"),  # single-pass decode, not recursive
    (b"  a \t b \n\n c  ", "a b c"),
    (b"<scriptx>not a script</scriptx>", "not a script"),
    (b"", ""),
]


def test_expr_extraction_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html binary"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_text.extract_text_expr("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i][0], got[i], want)


def test_arrow_path_matches_expr_path(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html binary"
    )
    expr = df.select("i", html_text.extract_text_expr("html").alias("t"))
    arrow = html_text.extract_text_arrow(df, "html", out_col="t").select("i", "t")
    both = expr.alias("a").join(arrow.alias("b"), "i")
    n_diff = both.where(F.col("a.t") != F.col("b.t")).count()
    assert n_diff == 0
    assert arrow.count() == len(CASES)


def test_webpages_per_url_invariant(spark):
    """The north-star invariant on the webpages table itself:
    extract(html) == text, byte-identical, for every url."""
    pages = datagen.gen_webpages(spark, n=500, seed=7)
    ext = pages.select(
        "url", "text", html_text.extract_text_expr("html").alias("t")
    )
    n_total = ext.count()
    n_match = ext.where(
        F.col("t").eqNullSafe(F.coalesce(F.trim(F.regexp_replace("text", html_text.WS_RE, " ")), F.lit("")))
    ).count()
    assert n_total == 500 and n_match == n_total


def test_escape_roundtrip(spark):
    raw = '<a href="x">&amp; \'q\'</a>'
    df = spark.createDataFrame([(raw,)], "text string")
    out = df.select(
        html_text.extract_text_expr(
            F.concat(F.lit("<p>"), html_text.escape_text_expr("text"), F.lit("</p>")),
            binary=False,
        ).alias("t")
    ).collect()[0]["t"]
    assert out == raw


def test_hypothesis_arrow_expr_parity(spark):
    """Property test: Java-regex (expr) and Python-re (Arrow) paths are
    byte-identical on adversarial strings — angle brackets, partial
    entities, script/style fragments, whitespace runs."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.sampled_from(
        list("abzAZ09 \t\n\r<>&;/\"'=!-")
        + ["<script>", "</script>", "<style", "&amp;", "&lt;", "&#39;", "<p>", "</p>"]
    )
    texts = st.lists(alphabet, max_size=30).map("".join)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(texts, min_size=1, max_size=20))
    def check(batch):
        df = spark.createDataFrame(
            [(i, t.encode("utf-8")) for i, t in enumerate(batch)], "i int, html binary"
        )
        expr = {
            r["i"]: r["t"]
            for r in df.select("i", html_text.extract_text_expr("html").alias("t")).collect()
        }
        arrow = {
            r["i"]: r["t"]
            for r in html_text.extract_text_arrow(df, "html", out_col="t")
            .select("i", "t")
            .collect()
        }
        assert expr == arrow

    check()
