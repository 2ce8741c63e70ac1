"""Aggregations — SURVEY.md §2.4 (A1-A6): the reference's primary
correctness observables (per-layer feature counts, geometry-presence
counts, change tallies), as partial+final hash aggregations.

Skew note: per-layer / per-cell counts over a megacity hotspot put one
huge group on one reducer. `salted_count` does the classic two-phase
salted aggregation; AQE skew splitting covers the join side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def polygon_validity_expr():
    """A2-adjacent STRUCTURAL geometry validity as a vectorized Arrow
    UDF over WKB polygon columns (the north-star's "geometry-validity
    checks"; the reference surfaces validity via presence counts and
    the Nespravny flag — this adds the structural layer OGR's IsValid
    would catch before any of that): a polygon/multipolygon is
    structurally valid iff it parses, has >= 1 ring, and every ring is
    CLOSED (first == last vertex), has >= 4 points, and only finite
    coordinates. NULL stays NULL (absent geometry is A4's business,
    not invalidity).

    Vectorized batch decode (one Python call per Arrow batch, the
    repo-wide UDF rule); full topological validity (self-intersection)
    is out of scope without a geometry lib in this container and is
    documented as such."""
    from pyspark.sql.types import BooleanType

    from gdal_vfr_spark.geo import wkb

    @F.pandas_udf(BooleanType())
    def _valid(buf: pd.Series) -> pd.Series:
        out: list[bool | None] = []
        for b in buf:
            if b is None:
                out.append(None)
                continue
            try:
                rings = wkb.decode_rings(bytes(b))
                ok = bool(rings) and all(
                    len(r) >= 4
                    and np.isfinite(r).all()
                    and r[0, 0] == r[-1, 0]
                    and r[0, 1] == r[-1, 1]
                    for r in rings
                )
            except Exception:
                ok = False
            out.append(ok)
        return pd.Series(out, dtype=object)

    return _valid


def geometry_validity_stats(df: DataFrame, geom_col: str) -> DataFrame:
    """Per-table structural-validity tally for one WKB polygon column:
    (n_valid, n_invalid, n_null). One Arrow pass + one partial+final
    aggregate."""
    v = polygon_validity_expr()(F.col(geom_col))
    return df.agg(
        F.sum(F.when(v, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(~v, 1).otherwise(0)).alias("n_invalid"),
        F.sum(F.when(F.col(geom_col).isNull(), 1).otherwise(0)).alias("n_null"),
    )


def shape_stats_expr():
    """Vectorized WKB shape statistics — the geometry-stats companion
    to polygon_validity_expr (the reference exposes geometry only
    through OGR; area/length/centroid are the OGR_G_Area/Centroid
    analogues a spatial QA pass runs per layer): one Arrow batch pass
    decoding each (Multi)Polygon and returning a struct

        (area, perimeter, cx, cy)

    with shoelace area (shells add, holes subtract — orientation
    normalized, so writer ring direction does not matter), perimeter
    over every ring, and the area-weighted shoelace centroid. NULL in,
    NULL out; unparseable or zero-area geometry yields NULL stats
    (perimeter still reported when rings parse). Per-ring arithmetic
    is numpy float64 over the packed coordinate arrays — no per-vertex
    Python."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from gdal_vfr_spark.geo import wkb

    out_schema = StructType(
        [
            StructField("area", DoubleType()),
            StructField("perimeter", DoubleType()),
            StructField("cx", DoubleType()),
            StructField("cy", DoubleType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _stats(buf: pd.Series) -> pd.DataFrame:
        rows: list[tuple] = []
        for b in buf:
            if b is None:
                rows.append((None, None, None, None))
                continue
            try:
                polys = wkb.decode_polygons(bytes(b))
            except Exception:
                rows.append((None, None, None, None))
                continue
            a_tot = 0.0
            cx6 = 0.0
            cy6 = 0.0
            perim = 0.0
            for rings in polys:
                for j, r in enumerate(rings):
                    x, y = r[:, 0], r[:, 1]
                    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                    a2 = float(cross.sum())
                    # shells add, holes subtract, independent of the
                    # ring's written orientation
                    sgn = (1.0 if j == 0 else -1.0) * (1.0 if a2 >= 0 else -1.0)
                    a_tot += sgn * a2 / 2.0
                    cx6 += sgn * float(((x[:-1] + x[1:]) * cross).sum())
                    cy6 += sgn * float(((y[:-1] + y[1:]) * cross).sum())
                    ex = np.diff(x)
                    ey = np.diff(y)
                    perim += float(np.sqrt(ex * ex + ey * ey).sum())
            if a_tot == 0.0:
                rows.append((None, perim, None, None))
            else:
                rows.append((a_tot, perim, cx6 / (6.0 * a_tot), cy6 / (6.0 * a_tot)))
        return pd.DataFrame(rows, columns=["area", "perimeter", "cx", "cy"])

    return _stats


def geometry_shape_stats(df: DataFrame, geom_col: str, *key_cols: str) -> DataFrame:
    """Per-feature shape stats for one WKB polygon column: key columns
    + (area, perimeter, cx, cy). One Arrow pass, map-only — at 100 TB
    this pipelines with the scan, no shuffle."""
    st = shape_stats_expr()(F.col(geom_col)).alias("__st")
    return df.select(*key_cols, st).select(
        *key_cols,
        F.col("__st.area").alias("area"),
        F.col("__st.perimeter").alias("perimeter"),
        F.col("__st.cx").alias("cx"),
        F.col("__st.cy").alias("cy"),
    )
