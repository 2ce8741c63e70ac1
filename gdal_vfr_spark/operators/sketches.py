"""Distributed mergeable sketches: HyperLogLog distinct counting and
Count-Min frequency estimation, engine-exact.

Why sketches are first-class at 100 TB: exact distinct counts and
exact per-token frequencies need a full shuffle of the key domain
(groupBy key), which at web scale is the most expensive stage of a
corpus-profiling pass. Both sketches here reduce that to a
CONSTANT-size aggregate state (2^p HLL registers / depth x width CMS
counters) built with one map-side-combining groupBy over a tiny key
space — the shuffle moves kilobytes regardless of corpus size, and
partial sketches from different partitions/days/snapshots merge
exactly (register max / counter sum), which is what makes them
incremental-pipeline-safe.

Engine-exactness (the repo's oracle discipline): all hashing derives
from md5 (`functions/text_expr.py` rationale) and every step is
integer arithmetic (bigint shifts, `div`, `%`), so the DuckDB twins
in `__spark_entry__.py` reproduce the sketch state bit-for-bit. The
only float op is the final HLL estimate's single literal-constant
division + round, written identically in both engines — no
transcendentals cross the engine boundary (the libm-parity lesson
from round 3's pow flake).

Reference anchor: the reference's per-layer feature accounting
(vfr4ogr/vfrogr.py:381-383 summary totals) is exact because it is
single-node; these sketches are the scale-out formulation of the same
corpus-accounting need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --- HyperLogLog ---------------------------------------------------------
#
# 60-bit hash from the first 15 md5 hex chars (both engines parse hex
# exactly). `h % m` picks the register; the remaining W_BITS = 60 - p
# bits (h div m) feed the rank. rho is computed WITHOUT floats via the
# bit-length identity: bitlen(w) = length(bin(w)) for w > 0, so
# rho = W_BITS - bitlen(w) + 1, and rho = W_BITS + 1 when w == 0
# (bin(0) = '0' in both engines, so the w = 0 case must be explicit).

HLL_P = 8  # m = 256 registers, ~6.5% standard error, 2 KB of state
HLL_HEX_CHARS = 15  # 60 hash bits


def hash60_expr(key: Column) -> Column:
    """60-bit nonnegative bigint hash, identical in both engines.
    DuckDB twin: ('0x' || substr(md5(k), 1, 15))::UBIGINT."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, HLL_HEX_CHARS), 16, 10
    ).cast("long")


def hll_registers(df: DataFrame, key, p: int = HLL_P) -> DataFrame:
    """HLL sketch state: one row per non-empty register, (idx, mj).

    groupBy(idx).max(rho) over at most 2^p distinct keys: each input
    partition reduces to <= 2^p rows map-side before the shuffle, so
    the exchanged state is O(2^p) per partition — the property that
    lets one sketch a 10^12-row corpus with a kilobyte-scale shuffle.
    NULL keys are skipped (count(DISTINCT key) semantics).
    """
    key = F.col(key) if isinstance(key, str) else key
    m = 1 << p
    w_bits = 4 * HLL_HEX_CHARS - p
    hashed = df.where(key.isNotNull()).select(hash60_expr(key).alias("h"))
    hw = hashed.select(
        F.pmod(F.col("h"), F.lit(m)).alias("idx"),
        F.expr(f"h div {m}").alias("w"),  # div = exact bigint division
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
    )
    return (
        hw.select("idx", rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables: elementwise max. Exactly the sketch
    of the unioned inputs (pinned in tests) — the incremental/daily
    rollup property."""
    return a.unionByName(b).groupBy("idx").agg(F.max("mj").alias("mj"))


def hll_summary(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row summary of a register table.

    Columns (all bigint — integer-exact across engines):
      m             — register count (2^p)
      nonzero_regs  — registers observed at least once
      denom_scaled  — sum over ALL m registers of 2^(RHO_MAX - mj)
                      with mj = 0 for absent registers; this is the
                      raw-HLL harmonic denominator scaled by 2^RHO_MAX,
                      an exact integer (max m * 2^53 < 2^63)
      est_e6        — raw HLL estimate in MICRO-units:
                      round(alpha_m * m^2 * 2^RHO_MAX * 1e6 / denom_scaled).
                      The numerator is one double literal baked into
                      the plan, so the only runtime float op is a
                      single division + round, identical in DuckDB.

    The small-range (linear-counting) correction needs ln(); libm
    parity across engines is not guaranteed, so it deliberately stays
    OUT of the oracle-checked columns — `hll_estimate` applies it
    driver-side from this summary.
    """
    m = 1 << p
    rho_max = 4 * HLL_HEX_CHARS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numerator = alpha * m * m * (2.0**rho_max) * 1e6
    agg = registers.agg(
        F.count("*").cast("long").alias("nonzero_regs"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rho_max} - mj)"))
        .cast("long")
        .alias("present_denom"),
    )
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        "nonzero_regs",
        (
            F.col("present_denom")
            + (F.lit(m) - F.col("nonzero_regs")) * F.lit(2**rho_max).cast("long")
        ).alias("denom_scaled"),
    ).select(
        "m",
        "nonzero_regs",
        "denom_scaled",
        F.round(F.lit(numerator) / F.col("denom_scaled"))
        .cast("long")
        .alias("est_e6"),
    )


def hll_distinct(df: DataFrame, key, p: int = HLL_P) -> DataFrame:
    """End-to-end: sketch + one-row summary."""
    return hll_summary(hll_registers(df, key, p), p)


def hll_estimate(summary_row, p: int = HLL_P) -> float:
    """Driver-side estimate with the standard small-range correction
    (linear counting when est <= 2.5m and zero registers exist).
    Operates on a collected `hll_summary` row; the ln() stays off the
    engine-parity path by design."""
    import math

    m = 1 << p
    est = summary_row["est_e6"] / 1e6
    zeros = m - summary_row["nonzero_regs"]
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


# --- Count-Min -----------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket_expr(token: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of `token` under hash row `row`: first 8 md5 hex chars of
    'row:token', mod width. DuckDB twin:
    ('0x' || substr(md5(row || ':' || t), 1, 8))::UBIGINT % width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), token)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def _with_rows(df: DataFrame, token_col: str, depth: int, width: int) -> DataFrame:
    """(token) -> (token, row, bucket) for row in [0, depth)."""
    rows = df.select(
        F.col(token_col).alias("token"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    # One bucket expression per row value keeps the md5 input a plain
    # concat (no int->string cast in the hot expression); the CASE is
    # tiny (depth branches) and stays in whole-stage codegen.
    bucket = F.lit(None).cast("long")
    for r in range(depth):
        bucket = F.when(F.col("row") == r, cms_bucket_expr(F.col("token"), r, width)).otherwise(bucket)
    return rows.select("token", "row", bucket.alias("bucket"))


def cms_counters(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Counter table (row, bucket, cnt) from a token stream WITH
    multiplicity. groupBy over depth*width keys — map-side combine
    reduces every partition to <= depth*width rows before the shuffle,
    the constant-state property. Counters from disjoint corpora merge
    by summing cnt (pinned in tests)."""
    return (
        _with_rows(tokens, token_col, depth, width)
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two counter tables: elementwise sum."""
    return (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated occurrence count per candidate token: min over the
    depth rows of the candidate's counter (the CMS point query —
    always >= the true count; error bound e*N/width with prob
    1 - (1/2)^depth). The counter table is depth*width rows, so it is
    broadcast — candidates never shuffle."""
    cand = candidates.select(F.col(token_col).alias("token")).distinct()
    expanded = _with_rows(cand, "token", depth, width)
    return (
        expanded.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_occ"))
    )


def cms_topk(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Sketch-backed heavy hitters over a document corpus: tokenize
    (shared tokenizer => identical DuckDB twin), build the counter
    table, estimate every distinct token, keep the top n by
    (est_occ desc, token asc).

    At 100-TB scale the candidate set would come from a per-partition
    pre-top-k (or a space-saving pass), not a full distinct — here the
    distinct token set doubles as the candidate stream, which keeps
    the oracle exact while exercising the same counter/estimate path.
    """
    from gdal_vfr_spark.functions.text_expr import tokens_expr

    toks = docs.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counters = cms_counters(toks, "token", depth, width)
    est = cms_estimate(counters, toks, "token", depth, width)
    return est.orderBy(F.desc("est_occ"), F.asc("token")).limit(n)
