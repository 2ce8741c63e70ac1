"""Aggregations — SURVEY.md §2.4 (A1-A6): the reference's primary
correctness observables (per-layer feature counts, geometry-presence
counts, change tallies), as partial+final hash aggregations.

Skew note: per-layer / per-cell counts over a megacity hotspot put one
huge group on one reducer. `salted_count` does the classic two-phase
salted aggregation; AQE skew splitting covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def layer_counts(df: DataFrame, layer_col: str = "layer") -> DataFrame:
    """A1 — GetFeatureCount() per layer (vfrogr.py:409-426,:361-383)."""
    return df.groupBy(layer_col).agg(F.count("*").alias("n")).orderBy(layer_col)


def geometry_presence(df: DataFrame, geom_cols: list[str]) -> DataFrame:
    """A2 — `-e/--extended` per-geometry-column non-null counts
    (vfrogr.py:745-762). count() skips nulls, so one pass suffices."""
    return df.agg(
        F.count("*").alias("n_total"),
        *[F.count(F.col(c)).alias(f"n_{c}") for c in geom_cols],
    )


def change_tally(changes: DataFrame, layer_col: str = "layer", action_col: str = "action") -> DataFrame:
    """A3 — added/updated/deleted per layer (vfrogr.py:617-627)."""
    return (
        changes.groupBy(layer_col, action_col)
        .agg(F.count("*").alias("n"))
        .orderBy(layer_col, action_col)
    )


def null_geometry_tally(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """A4 — features lacking the selected geometry (vfrogr.py:592-598,
    :630-634; golden: 9/221 AdresniMista)."""
    return df.agg(
        F.sum(F.when(F.col(geom_col).isNull(), 1).otherwise(0)).alias("n_missing"),
        F.count("*").alias("n_total"),
    )


def max_fid(df: DataFrame, fid_col: str = "fid") -> int:
    """A5 — SELECT max(ogc_fid) (vfrpg.py:184-211): sequence resync
    before append. Deterministic row_number FIDs make this informational."""
    row = df.agg(F.max(fid_col).alias("m")).first()
    return int(row["m"]) if row["m"] is not None else 0


def salted_count(
    df: DataFrame, key_col: str, n_salt: int = 16, salt_src: str | None = None
) -> DataFrame:
    """Two-phase count for skewed keys (megacity cells, SURVEY.md §4
    item 2): partial count per (key, salt) then final sum per key.
    Results identical to groupBy(key).count(); the first shuffle fans a
    hot key across n_salt reducers.

    NOTE: for plain counts Spark's partial aggregation already combines
    map-side, so this matters for high-cardinality payloads (collect_set
    / exact distinct) more than for count(*) — provided for those.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt))
        if salt_src
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    return (
        df.withColumn("__salt", salt)
        .groupBy(key_col, "__salt")
        .agg(F.count("*").alias("__partial"))
        .groupBy(key_col)
        .agg(F.sum("__partial").alias("n"))
    )
