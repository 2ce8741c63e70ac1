"""Distributed mergeable sketches, engine-exact: HyperLogLog
(distinct), Count-Min (frequency), Bloom filter (membership), and a
log2-bin histogram (distribution).

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


def hll_registers(df: DataFrame, key, p: int = HLL_P, group_cols=()) -> DataFrame:
    """HLL sketch state: one row per non-empty register,
    (*group_cols, idx, mj).

    groupBy(idx).max(rho) over at most 2^p distinct keys per group:
    each input partition reduces to <= groups * 2^p rows map-side
    before the shuffle, so the exchanged state is constant per group —
    the property that lets one sketch a 10^12-row corpus with a
    kilobyte-scale shuffle. With group_cols this is the GROUPED
    count-distinct shape (distinct X per Y) that otherwise needs a
    full (Y, X) shuffle. NULL keys are skipped (count(DISTINCT key)
    semantics).
    """
    key = F.col(key) if isinstance(key, str) else key
    m = 1 << p
    w_bits = 4 * HLL_HEX_CHARS - p
    groups = list(group_cols)
    hashed = df.where(key.isNotNull()).select(
        *groups, hash60_expr(key).alias("h")
    )
    hw = hashed.select(
        *groups,
        F.pmod(F.col("h"), F.lit(m)).alias("idx"),
        F.expr(f"h div {m}").alias("w"),  # div = exact bigint division
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
    )
    return (
        hw.select(*groups, "idx", rho.alias("rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables: elementwise max (grouped tables
    merge per group). Exactly the sketch of the unioned inputs
    (pinned in tests) — the incremental/daily rollup property."""
    u = a.unionByName(b)
    keys = [c for c in u.columns if c != "mj"]
    return u.groupBy(*keys).agg(F.max("mj").alias("mj"))


def hll_summary(registers: DataFrame, p: int = HLL_P, group_cols=()) -> DataFrame:
    """Summary of a register table — one row (or one per group).

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
    groups = list(group_cols)
    aggs = [
        F.count("*").cast("long").alias("nonzero_regs"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rho_max} - mj)"))
        .cast("long")
        .alias("present_denom"),
    ]
    agg = registers.groupBy(*groups).agg(*aggs) if groups else registers.agg(*aggs)
    return agg.select(
        *groups,
        F.lit(m).cast("long").alias("m"),
        "nonzero_regs",
        (
            F.col("present_denom")
            + (F.lit(m) - F.col("nonzero_regs")) * F.lit(2**rho_max).cast("long")
        ).alias("denom_scaled"),
    ).select(
        *groups,
        "m",
        "nonzero_regs",
        "denom_scaled",
        F.round(F.lit(numerator) / F.col("denom_scaled"))
        .cast("long")
        .alias("est_e6"),
    )


def hll_distinct(df: DataFrame, key, p: int = HLL_P, group_cols=()) -> DataFrame:
    """End-to-end: sketch + summary (one row per group, or one row)."""
    return hll_summary(hll_registers(df, key, p, group_cols), p, group_cols)


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


def _slices_from_digest(digest: Column, n: int, hx: int, m: int) -> Column:
    """n disjoint hx-hex slices of one md5 digest, each mod m — the
    one-digest-per-key trick shared by the CMS and Bloom builders.
    The digest must be PROJECTED into its own column first (see
    _with_rows); a single-expression variant that inlines md5 into
    the generator input re-grinds one digest per slice because
    Catalyst does not CSE inside generator inputs (round-4 advice:
    the unused single-expression variants were deleted so this
    projected-digest path is the one blessed path).
    DuckDB twin per slice: ('0x' || substr(md5(t), 1+hx*i, hx))::UBIGINT % m."""
    return F.array(
        *[
            F.pmod(
                F.conv(F.substring(digest, 1 + hx * i, hx), 16, 10).cast("long"),
                F.lit(m),
            )
            for i in range(n)
        ]
    )


def _with_rows(df: DataFrame, token_col: str, depth: int, width: int) -> DataFrame:
    """(token) -> (token, row, bucket) for row in [0, depth).

    The digest is PROJECTED into its own column before the slices:
    Catalyst does not eliminate the repeated md5 subexpression inside
    a generator input (measured 1.3s vs 0.9s per 3M tokens), so the
    two-step projection is what actually yields the one-digest win."""
    return df.select(
        F.col(token_col).alias("token"), F.md5(F.col(token_col)).alias("__dig")
    ).select(
        "token",
        F.posexplode(_slices_from_digest(F.col("__dig"), depth, 8, width)).alias(
            "row", "bucket"
        ),
    )


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
    # Round-6: aggregate the stream to (token, occurrences) FIRST (one
    # map-side-combined shuffle of the distinct vocabulary — a shuffle
    # this query already pays inside cms_estimate's candidate
    # distinct), then md5 each DISTINCT token once. The counter table
    # is identical because cnt is additive: sum of per-token occurrence
    # counts == count of raw stream rows per (row, bucket). The old
    # plan tokenized the corpus twice and ground one md5 + 4 bucket
    # slices per token OCCURRENCE (measured 8.4 s at sf1.0 vs ~2 s).
    occ = toks.groupBy("token").agg(F.count("*").alias("__occ")).persist()
    wrows = occ.select(
        "token", "__occ", F.md5(F.col("token")).alias("__dig")
    ).select(
        "__occ",
        F.posexplode(_slices_from_digest(F.col("__dig"), depth, 8, width)).alias(
            "row", "bucket"
        ),
    )
    counters = wrows.groupBy("row", "bucket").agg(F.sum("__occ").alias("cnt"))
    est = cms_estimate(counters, occ, "token", depth, width)
    return est.orderBy(F.desc("est_occ"), F.asc("token")).limit(n)


# --- Bloom filter --------------------------------------------------------
#
# Relational Bloom filter: the filter IS a (word, bits) table of
# <= m/32 rows built with one map-side-combining bit_or groupBy, so it
# broadcasts at a fixed size (128 KB of bits at the default 2^20)
# regardless of how many keys went in — the structure that replaces an
# exact-set broadcast when the set outgrows it (10^8 benchmark
# shingles ~ 1.6 GB of 16-hex keys vs a fixed-size filter). Words are
# 32-bit (stored in bigint) so shift masks stay positive — no signed
# two's-complement parity traps between engines.

BLOOM_BITS = 1 << 20
BLOOM_K = 4
BLOOM_WORD = 32


def _bloom_hex(m: int) -> int:
    """Hex chars per hash slice: ceil(log16(m))."""
    return max(1, ((m - 1).bit_length() + 3) >> 2)


def _with_bloom_bits(
    df: DataFrame, key_col: str, k: int, m: int
) -> DataFrame:
    """(.., key) -> (.., __word, __mask) for each of the k hash bits.
    Digest projected first — same generator-input CSE rationale as
    _with_rows."""
    hx = _bloom_hex(m)
    if hx * k > 32:
        raise ValueError("k hash slices exceed one md5 digest")
    return (
        df.withColumn("__dig", F.md5(F.col(key_col)))
        .withColumn(
            "__bit", F.explode(_slices_from_digest(F.col("__dig"), k, hx, m))
        )
        .withColumn("__word", F.expr(f"__bit div {BLOOM_WORD}"))
        .withColumn(
            "__mask",
            F.expr(f"shiftleft(cast(1 as bigint), cast(__bit % {BLOOM_WORD} as int))"),
        )
        .drop("__bit", "__dig")
    )


def bloom_build(
    keys: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_BITS
) -> DataFrame:
    """Build the (word, bits) filter table from a key column. bit_or
    is the map-side-combining merge — partial filters from any
    partitioning OR together exactly (pinned in tests)."""
    return (
        _with_bloom_bits(keys.select(key_col), key_col, k, m)
        .groupBy(F.col("__word").alias("word"))
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_BITS,
) -> DataFrame:
    """Keep the rows of `df` whose key is POSSIBLY in the filter (all
    k bits set — no false negatives; false positives at the standard
    (1 - e^{-kn/m})^k rate must be removed by an exact confirm if
    exactness is required). The filter table broadcasts; the probe is
    map-side + one regroup per input ROW: rows are tagged with a
    unique id before the bit explode so duplicate input rows are
    preserved with their multiplicity (round-4 advice: grouping on
    the raw columns merged duplicates, making sum(__hit) = 2k != k
    and silently DROPPING an inserted key — a false negative)."""
    cols = df.columns
    tagged = df.withColumn("__rid", F.monotonically_increasing_id())
    flt = bloom.select(F.col("word").alias("__bword"), F.col("bits").alias("__bbits"))
    probed = _with_bloom_bits(tagged, key_col, k, m).join(
        F.broadcast(flt), F.col("__word") == F.col("__bword"), "left"
    )
    hit = (
        F.coalesce(F.col("__bbits"), F.lit(0)).bitwiseAND(F.col("__mask"))
        == F.col("__mask")
    )
    return (
        probed.withColumn("__hit", hit.cast("int"))
        .groupBy("__rid", *cols)
        .agg(F.sum("__hit").alias("__nhit"))
        .where(F.col("__nhit") == k)
        .select(*cols)
    )


# --- log2 histogram ------------------------------------------------------


def log2_histogram(df: DataFrame, value_col, group_cols=()) -> DataFrame:
    """Mergeable distribution sketch: counts per power-of-two bin,
    bin = bitlength(value) (so bin b holds values in [2^(b-1), 2^b));
    values <= 0 land in bin 0. Integer-exact via the same bin()
    bit-length identity the HLL rank uses — no floats, no log().

    One map-side-combining groupBy over <= 64 bins (per group):
    constant state, merge = per-bin sum. This is the distribution
    member of the sketch family (HLL = distinct, CMS = frequency,
    Bloom = membership): corpus length/size profiles at 10^12 rows
    for a 64-row shuffle, at the cost of power-of-two resolution.
    Percentile estimates come from `histogram_percentile` driver-side.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    groups = list(group_cols)
    b = (
        F.when(v <= 0, F.lit(0))
        .otherwise(F.length(F.bin(v.cast("long"))))
        .cast("int")
        .alias("bin")
    )
    return (
        df.select(*groups, b)
        .groupBy(*groups, "bin")
        .agg(F.count("*").alias("n"))
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two histogram tables: per-bin sum (grouped tables merge
    per group) — exactly the histogram of the unioned inputs."""
    u = a.unionByName(b)
    keys = [c for c in u.columns if c != "n"]
    return u.groupBy(*keys).agg(F.sum("n").alias("n"))


def histogram_percentile(rows, q: float) -> float:
    """Driver-side percentile estimate from collected histogram rows
    [(bin, n), ...]: walk bins to the q-quantile bin, interpolate
    linearly inside it ([2^(b-1), 2^b)). Error bounded by the bin
    width (a factor-of-2 band) — the price of 64-row state."""
    hist = sorted((r["bin"], r["n"]) for r in rows)
    total = sum(n for _, n in hist)
    if total == 0:
        return 0.0
    target = q * total
    seen = 0
    for b, n in hist:
        if seen + n >= target:
            lo = 0.0 if b == 0 else float(1 << (b - 1))
            hi = 1.0 if b == 0 else float(1 << b)
            frac = (target - seen) / n
            return lo + frac * (hi - lo)
        seen += n
    return float(1 << hist[-1][0])


# --- bottom-k quantile sketch --------------------------------------------
#
# The quantile member of the sketch family (HLL = distinct, CMS =
# frequency, Bloom = membership, log2-histogram = coarse distribution):
# exact-rank quantile estimates from a FIXED-size uniform row sample —
# the k rows whose 60-bit id-hash is smallest ("bottom-k" / KMV
# sampling). Bottom-k sets are exactly mergeable (the k smallest of a
# union are among the union of each side's k smallest), so per-
# partition / per-day sketches combine without re-reading data.
#
# Skew shape at 10^12 rows — three bounded stages, no window over an
# unbounded partition:
#   1. exact per-group counts: one map-side-combining groupBy (the
#      counts are also the sketch's exact n_rows output);
#   2. threshold pre-filter: keep rows with h < T_g where T_g =
#      (2^60 div n_g) * (oversample*k) — map-only after a broadcast
#      join of the tiny stats table, integer-exact in both engines,
#      expected survivors oversample*k per group REGARDLESS of group
#      size (the hot-group analogue of cell-frequency sampling);
#   3. the final bottom-k cut + quantile indexing runs on those
#      ~oversample*k survivors per group — the only window in the plan
#      partitions over <= a few thousand rows by construction.

BOTTOMK_K = 64
BOTTOMK_OVS = 4
_H60_MAX = 1 << 60


def bottomk_quantile_sketch(
    df: DataFrame,
    id_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
    oversample: int = BOTTOMK_OVS,
    qs=(0.5, 0.9, 0.99),
    group_cols=(),
) -> DataFrame:
    """Per-group exact row count + rank-based quantile estimates of
    `value_col` from a deterministic bottom-k-by-id-hash sample.

    The sample is selected on hash(id), independent of the value, so it
    is a uniform row sample; the q-quantile estimate is the sampled
    value at rank floor(q*(s-1))+1 (no interpolation — the returned
    value always occurs in the data, and the indexing is bit-identical
    in the DuckDB twin). Output: group_cols..., n_rows (exact),
    sample_n, q_<pct> per requested quantile.

    Rows with NULL id hash never survive (md5 of NULL) — ids must be
    non-null (documents contract). If a group has fewer than
    oversample*k rows the threshold keeps everything and the sketch is
    exact."""
    from pyspark.sql import Window

    groups = list(group_cols)
    base = df.select(
        *groups,
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    ).withColumn("__h", hash60_expr(F.col("__id")))
    stats = base.groupBy(*groups).agg(F.count("*").alias("n_rows"))
    if groups:
        joined = base.join(F.broadcast(stats), on=groups)
    else:
        joined = base.crossJoin(F.broadcast(stats))
    cut_rows = oversample * k
    thr = F.when(F.col("n_rows") <= F.lit(cut_rows), F.lit(_H60_MAX)).otherwise(
        F.expr(f"{_H60_MAX} div n_rows") * F.lit(cut_rows)
    )
    samp = joined.where(F.col("__h") < thr)
    w = Window.partitionBy(*[F.col(g) for g in groups] or [F.lit(1)]).orderBy(
        "__h", "__id"
    )
    cut = samp.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    agg = cut.groupBy(*groups).agg(
        F.first("n_rows").alias("n_rows"),
        F.count("*").alias("sample_n"),
        F.sort_array(F.collect_list("__v")).alias("__vals"),
    )
    qcols = [
        F.element_at(
            "__vals",
            (F.floor(F.lit(float(q)) * (F.col("sample_n") - 1)) + 1).cast("int"),
        ).alias(f"q_{int(round(q * 100))}")
        for q in qs
    ]
    return agg.select(*groups, "n_rows", "sample_n", *qcols)


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
    oversample: int = BOTTOMK_OVS,
    group_cols=(),
) -> DataFrame:
    """The sketch STATE: per-group (h, id, value) bottom-k sample rows
    plus the exact partial count — what a per-snapshot pipeline stores
    and later merges with bottomk_merge. Same three-stage shape as
    bottomk_quantile_sketch."""
    from pyspark.sql import Window

    groups = list(group_cols)
    base = df.select(
        *groups, F.col(id_col).alias("__id"), F.col(value_col).alias("__v")
    ).withColumn("__h", hash60_expr(F.col("__id")))
    stats = base.groupBy(*groups).agg(F.count("*").alias("n_rows"))
    if groups:
        joined = base.join(F.broadcast(stats), on=groups)
    else:
        joined = base.crossJoin(F.broadcast(stats))
    cut_rows = oversample * k
    thr = F.when(F.col("n_rows") <= F.lit(cut_rows), F.lit(_H60_MAX)).otherwise(
        F.expr(f"{_H60_MAX} div n_rows") * F.lit(cut_rows)
    )
    samp = joined.where(F.col("__h") < thr)
    w = Window.partitionBy(*[F.col(g) for g in groups] or [F.lit(1)]).orderBy(
        "__h", "__id"
    )
    return (
        samp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*groups, "n_rows", "__h", "__id", "__v")
    )


def bottomk_merge(a: DataFrame, b: DataFrame, k: int = BOTTOMK_K, group_cols=()) -> DataFrame:
    """Merge two bottomk_sample tables: union, re-cut to the k smallest
    hashes per group, and sum the exact partial counts. Exactly the
    sample bottomk_sample would have produced over the unioned inputs
    (each side kept at least its k smallest hashes, and the union's k
    smallest are among them). Preconditions: the two inputs cover
    DISJOINT row sets (ids may not repeat across sides — counts are
    summed), and each side's sample is full (sample count == k) or its
    group was below the threshold cutover; a threshold-filtered side
    with fewer than k survivors (probability ~exp(-oversample*k/8),
    negligible at the defaults) could have discarded a union-bottom-k
    row."""
    from pyspark.sql import Window

    groups = list(group_cols)
    u = a.unionByName(b)
    n_a = a.groupBy(*groups).agg(F.first("n_rows").alias("__na"))
    n_b = b.groupBy(*groups).agg(F.first("n_rows").alias("__nb"))
    if groups:
        totals = n_a.join(n_b, on=groups, how="full").select(
            *groups,
            (F.coalesce("__na", F.lit(0)) + F.coalesce("__nb", F.lit(0))).alias(
                "n_rows"
            ),
        )
    else:
        totals = n_a.crossJoin(n_b).select(
            (F.coalesce("__na", F.lit(0)) + F.coalesce("__nb", F.lit(0))).alias(
                "n_rows"
            )
        )
    w = Window.partitionBy(*[F.col(g) for g in groups] or [F.lit(1)]).orderBy(
        "__h", "__id"
    )
    cut = (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn", "n_rows")
    )
    if groups:
        return cut.join(F.broadcast(totals), on=groups).select(
            *groups, "n_rows", "__h", "__id", "__v"
        )
    return cut.crossJoin(F.broadcast(totals)).select("n_rows", "__h", "__id", "__v")
