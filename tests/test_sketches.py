"""Sketch operators (operators/sketches.py): HLL register parity with
a pure-python twin, exact mergeability (the incremental-rollup
property), CMS overestimate bound, and heavy-hitter accuracy on a
skewed stream."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gdal_vfr_spark.operators import sketches as sk


def _py_hll_registers(values):
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[: sk.HLL_HEX_CHARS], 16)
        m = 1 << sk.HLL_P
        w_bits = 4 * sk.HLL_HEX_CHARS - sk.HLL_P
        idx, w = h % m, h // m
        rho = w_bits + 1 if w == 0 else w_bits + 1 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.createDataFrame(
        [(f"key-{i}",) for i in range(4000)], "k string"
    ).cache()


def test_hll_registers_match_python_twin(spark, keys_df):
    got = {r["idx"]: r["mj"] for r in sk.hll_registers(keys_df, "k").collect()}
    want = _py_hll_registers([f"key-{i}" for i in range(4000)])
    assert got == want


def test_hll_merge_equals_sketch_of_union(spark, keys_df):
    a = sk.hll_registers(keys_df.where(F.col("k") < "key-3"), "k")
    b = sk.hll_registers(keys_df.where(F.col("k") >= "key-3"), "k")
    merged = {r["idx"]: r["mj"] for r in sk.hll_merge(a, b).collect()}
    whole = {r["idx"]: r["mj"] for r in sk.hll_registers(keys_df, "k").collect()}
    assert merged == whole


def test_hll_estimate_within_error_bound(spark, keys_df):
    row = sk.hll_distinct(keys_df, "k").collect()[0]
    est = sk.hll_estimate(row)
    # standard error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est - 4000) / 4000 < 0.26
    # duplicates must not move the sketch (set semantics)
    dup = keys_df.unionByName(keys_df)
    row2 = sk.hll_distinct(dup, "k").collect()[0]
    assert row.asDict() == row2.asDict()


def test_hll_null_keys_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    assert sk.hll_distinct(df, "k").collect()[0]["nonzero_regs"] == 2


@pytest.fixture(scope="module")
def token_stream(spark):
    # Zipf-ish skew: tok0 appears 1000x, tok<i> appears 1000//(i+1).
    # Tokens are alphanumeric so tokens_expr round-trips them whole.
    rows = []
    for i in range(50):
        rows.extend([(f"tok{i}",)] * (1000 // (i + 1)))
    return spark.createDataFrame(rows, "token string").cache()


def test_cms_never_underestimates(spark, token_stream):
    counters = sk.cms_counters(token_stream)
    est = {
        r["token"]: r["est_occ"]
        for r in sk.cms_estimate(counters, token_stream).collect()
    }
    true = {
        r["token"]: r["n"]
        for r in token_stream.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    for t, n in true.items():
        assert est[t] >= n, t
    # at width 1024 with 50 tokens, collisions are unlikely enough that
    # the heavy hitter is exact and the top ordering holds
    assert est["tok0"] == 1000


def test_cms_merge_equals_counters_of_union(spark, token_stream):
    # split into a deterministic partition of the multiset
    w = token_stream.withColumn("rn", F.monotonically_increasing_id())
    a = w.where(F.col("rn") % 2 == 0).select("token")
    b = w.where(F.col("rn") % 2 == 1).select("token")
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sk.cms_merge(sk.cms_counters(a), sk.cms_counters(b)).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sk.cms_counters(token_stream).collect()
    }
    assert merged == whole


def test_cms_topk_matches_true_heavy_hitters(spark, token_stream):
    docs = token_stream.groupBy().agg(
        F.concat_ws(" ", F.collect_list("token")).alias("text")
    )
    top = sk.cms_topk(docs, n=5).collect()
    assert [r["token"] for r in top][:3] == ["tok0", "tok1", "tok2"]
    assert top[0]["est_occ"] == 1000


def test_bloom_no_false_negatives_and_merge(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
    flt = sk.bloom_build(keys, "k")
    kept = sk.bloom_probe(keys, "k", flt).count()
    assert kept == 500  # every inserted key must pass
    # merge: filters over two halves OR'd == filter over the union
    a = sk.bloom_build(keys.where(F.col("k") < "k3"), "k")
    b = sk.bloom_build(keys.where(F.col("k") >= "k3"), "k")
    merged = {
        r["word"]: r["bits"]
        for r in a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    whole = {r["word"]: r["bits"] for r in flt.collect()}
    assert merged == whole


def test_bloom_probe_preserves_duplicate_rows(spark):
    # round-4 advice (medium): grouping on the raw columns merged
    # duplicate probe rows, so sum(__hit) became 2k != k and an
    # inserted key vanished entirely. Probing [k1, k1, k2] against a
    # filter containing both must return all three rows.
    keys = spark.createDataFrame([("k1",), ("k2",)], "k string")
    flt = sk.bloom_build(keys, "k")
    probe = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "k string")
    out = sorted(r["k"] for r in sk.bloom_probe(probe, "k", flt).collect())
    assert out == ["k1", "k1", "k2"]


def test_bloom_prunes_absent_keys(spark):
    present = spark.createDataFrame([(f"in{i}",) for i in range(100)], "k string")
    absent = spark.createDataFrame([(f"out{i}",) for i in range(2000)], "k string")
    flt = sk.bloom_build(present, "k")
    fp = sk.bloom_probe(absent, "k", flt).count()
    # k=4, m=2^20, n=400 bits set -> FP rate ~ (400/2^20)^4 ~ 1e-14;
    # any survivor would mean a broken hash/mask path
    assert fp == 0


def test_decontaminate_bloom_matches_exact_path(spark):
    from gdal_vfr_spark.operators.dedup import decontaminate, decontaminate_bloom

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"w{i}" for i in range(5, 40))),
            (3, "totally unrelated " + " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(8, 25)),)], "text string"
    )
    exact = {(r["doc_id"], r["n_contaminated"]) for r in decontaminate(docs, bench).collect()}
    bloom = {(r["doc_id"], r["n_contaminated"]) for r in decontaminate_bloom(docs, bench).collect()}
    assert exact == bloom and exact


def test_hll_grouped_matches_per_group_sketches(spark):
    rows = [("a", f"x{i}") for i in range(300)] + [("b", f"y{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, k string")
    grouped = {
        r["g"]: (r["nonzero_regs"], r["denom_scaled"], r["est_e6"])
        for r in sk.hll_distinct(df, "k", group_cols=("g",)).collect()
    }
    for g in ("a", "b"):
        solo = sk.hll_distinct(df.where(F.col("g") == g), "k").collect()[0]
        assert grouped[g] == (
            solo["nonzero_regs"],
            solo["denom_scaled"],
            solo["est_e6"],
        ), g


def test_log2_histogram_and_percentile(spark):
    vals = [0, 1, 2, 3, 4, 7, 8, 100, 1000, 1000, 1024]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = {(r["bin"], r["n"]) for r in sk.log2_histogram(df, "v").collect()}
    # bitlength bins: 0->0, 1->1, {2,3}->2, {4,7}->3, 8->4, 100->7,
    # {1000,1000}->10, 1024->11
    assert hist == {(0, 1), (1, 1), (2, 2), (3, 2), (4, 1), (7, 1), (10, 2), (11, 1)}
    # merge = histogram of the union (halves split by row parity)
    w = df.withColumn("rn", F.monotonically_increasing_id())
    a = sk.log2_histogram(w.where(F.col("rn") % 2 == 0).select("v"), "v")
    b = sk.log2_histogram(w.where(F.col("rn") % 2 == 1).select("v"), "v")
    merged = {(r["bin"], r["n"]) for r in sk.histogram_merge(a, b).collect()}
    assert merged == hist
    # percentile estimate lands inside the right power-of-two band
    rows = sk.log2_histogram(df, "v").collect()
    p50 = sk.histogram_percentile(rows, 0.5)
    assert 4.0 <= p50 <= 8.0  # the median (7) lives in bin 3 = [4, 8)


def test_bottomk_quantile_sketch_python_twin(spark):
    """The sketch's sample selection and rank indexing match a pure-
    python twin exactly (hash threshold, bottom-k cut, floor-rank
    quantile), and the exact count survives the sampling."""
    n = 400
    rows = [(i, "s%d" % (i % 4), (i * 37) % 997) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    k, ovs = 8, 2
    out = {
        r["source"]: r
        for r in sk.bottomk_quantile_sketch(
            df, id_col="doc_id", value_col="v", k=k, oversample=ovs,
            qs=(0.5, 0.9), group_cols=("source",),
        ).collect()
    }
    h60 = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    for src in ("s0", "s1", "s2", "s3"):
        grp = [(i, v) for i, s, v in rows if s == src]
        n_g = len(grp)
        thr = ((1 << 60) // n_g) * (ovs * k) if n_g > ovs * k else (1 << 60)
        samp = sorted(
            ((h60(i), i, v) for i, v in grp if h60(i) < thr)
        )[:k]
        vals = sorted(v for _, _, v in samp)
        s = len(vals)
        assert out[src]["n_rows"] == n_g
        assert out[src]["sample_n"] == s
        import math
        assert out[src]["q_50"] == vals[math.floor(0.5 * (s - 1))]
        assert out[src]["q_90"] == vals[math.floor(0.9 * (s - 1))]


def test_bottomk_merge_equals_whole(spark):
    """Snapshot mergeability: bottomk_merge over two disjoint halves
    equals bottomk_sample over the union — same sample rows, summed
    exact counts."""
    rows = [(i, "g%d" % (i % 2), i * 13 % 503) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    a = df.where("doc_id < 150")
    b = df.where("doc_id >= 150")
    k = 16
    whole = sk.bottomk_sample(df, "doc_id", "v", k=k, group_cols=("g",))
    merged = sk.bottomk_merge(
        sk.bottomk_sample(a, "doc_id", "v", k=k, group_cols=("g",)),
        sk.bottomk_sample(b, "doc_id", "v", k=k, group_cols=("g",)),
        k=k,
        group_cols=("g",),
    )
    key = lambda r: (r["g"], r["n_rows"], r["__h"], r["__id"], r["__v"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_decontaminate_bloom_plan_variant_parity(spark):
    """checkpoint=False (the explain-audit plan-visibility mode) must
    return exactly the production path's rows — same logical work,
    materialization only differs."""
    import pandas as pd

    from gdal_vfr_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [
                    " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))
                    for i in range(40)
                ],
            }
        )
    )
    bench = docs.where("doc_id % 10 = 3").select("text")
    key = lambda r: (r["doc_id"], r["n_contaminated"])
    prod = sorted(map(key, dd.decontaminate_bloom(docs, bench, n=5).collect()))
    lazy = sorted(
        map(key, dd.decontaminate_bloom(docs, bench, n=5, checkpoint=False).collect())
    )
    assert prod == lazy and len(prod) > 0
