"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning (sampling happens
per-partition), so a repartition changes the sample — useless for
reproducible corpus construction at 100 TB. These operators sample by
CONTENT HASH of a key column instead: membership is a pure function of
the row, so the sample is stable under any partitioning, any engine
(md5 is the cross-engine workhorse this repo's oracles already rely
on), and any rerun. Pure Catalyst — a map-side filter, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 2^32 buckets from the first 8 hex chars of md5 — plenty of
# resolution for per-million sampling rates.
_BUCKETS = 1 << 32


def hash_bucket_expr(key) -> F.Column:
    """Stable bucket in [0, 2^32): first 8 md5 hex chars of the key
    rendered as a string. conv() parses hex on the JVM; the DuckDB twin
    is ('0x' || substr(md5(k), 1, 8))::UBIGINT."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep rows whose key-hash bucket falls under fraction — a
    deterministic, partitioning-independent Bernoulli sample."""
    return df.where(hash_bucket_expr(key) < F.lit(int(fraction * _BUCKETS)))


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 5% of the head language). Strata absent from
    `fractions` get default_fraction. One map-side filter; the
    threshold is a CASE over the stratum column."""
    thr = F.lit(int(default_fraction * _BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(int(frac * _BUCKETS))
        ).otherwise(thr)
    return df.where(hash_bucket_expr(key) < thr)


def temperature_quota_sample(
    docs: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature resampling across sources — the data-mixing step of
    multilingual/multi-source LLM training (upweight small sources,
    cap the head; public technique, e.g. the alpha-temperature mixing
    of multilingual-BERT/XLM-style pipelines). Implemented at a FIXED
    temperature alpha=0.5 with INTEGER arithmetic end to end so the
    cross-engine oracle is exact:

      w_s     = floor(sqrt(n_s))        (IEEE sqrt is correctly
                                         rounded -> floor is exact and
                                         identical in every engine)
      quota_s = min(n_s, ceil(budget * w_s / W)),  W = sum(w_s)
                (pure bigint arithmetic: (a + c - 1) div c)

    and the quota_s survivors per source are the deterministic
    md5-first docs (rank over (md5(id), id) — the same content-hash
    ordering the other samplers use, stable under any partitioning).

    Scale shape: the per-source count aggregate is tiny (one row per
    source — collect-free: quotas join back as a broadcast); selection
    is ONE rank window per source key. Zipf-skewed head sources pair
    with the skew plans like every per-key window here."""
    from pyspark.sql import Window

    counts = docs.groupBy(source_col).agg(F.count("*").alias("__n"))
    w = F.floor(F.sqrt(F.col("__n").cast("double"))).cast("long")
    weights = counts.withColumn("__w", w)
    tot = weights.agg(F.sum("__w").alias("W"))
    quotas = weights.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.col("__n"),
            F.expr(f"(CAST({budget} AS BIGINT) * __w + W - 1) div W"),
        ).alias("__quota"),
    )
    rk = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        docs.join(F.broadcast(quotas), source_col)
        .withColumn("__rk", F.row_number().over(rk))
        .where(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__quota")
    )


def epoch_upsample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Fractional-epoch upsampling — the mixture-weights step of LLM
    training-data assembly (a source with weight 2.25 contributes each
    doc 2 times plus a deterministic 25% of docs a 3rd time): each row
    is replicated floor(w) times, +1 more iff its md5 bucket falls
    under frac(w) — so the extra-copy subset is a stable hash sample,
    partitioning/rerun-independent, and the emitted multiset is a pure
    function of the data. Output = input rows + `copy_idx` (1-based).

    Map-side explode only, no shuffle; at 100 TB the writer behind it
    sees each copy as an ordinary row (downstream shuffles pay the
    replication factor, which is the point of the mixture).
    """
    n_copies = F.lit(None).cast("long")
    for src, w in sorted(weights.items()):
        base = int(w)
        frac = w - base
        extra = (hash_bucket_expr(F.col(id_col)) < F.lit(int(frac * _BUCKETS))).cast(
            "long"
        )
        n_copies = F.when(
            F.col(source_col) == F.lit(src), F.lit(base) + extra
        ).otherwise(n_copies)
    dbase = int(default_weight)
    dfrac = default_weight - dbase
    dextra = (
        hash_bucket_expr(F.col(id_col)) < F.lit(int(dfrac * _BUCKETS))
    ).cast("long")
    n_copies = F.coalesce(n_copies, F.lit(dbase) + dextra)
    # sequence(1, 0) would DESCEND ([1, 0]) — weights under 1.0 must
    # instead drop the row, so empty out the array explicitly
    copies = F.when(
        F.col("__n") >= 1, F.sequence(F.lit(1).cast("long"), F.col("__n"))
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("__n", n_copies)
        .select("*", F.explode(copies).alias("copy_idx"))
        .drop("__n")
    )
