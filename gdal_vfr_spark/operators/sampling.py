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
