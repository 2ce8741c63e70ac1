"""Export operators — SURVEY.md §2.1 S7/S8 (pg2ogr semantics).

The reference's pg2ogr re-exports DB tables to any OGR format, fanning
each geometry column out to its own output layer `{layer}_{geomcol}`
(pg2ogr.py:55-159, fan-out :80-82), optionally dropping features
without that geometry (:133-153), then deleting empty output layers
(:229-240). Here: one pruned select + parquet write per geometry
column, with the empty check as `limit(1).count()` BEFORE writing
(cheaper than write-then-delete — the fixpoint loop collapses to a
pre-filter).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, functions as F

from gdal_vfr_spark.operators.projections import stringify_lists_for_export


def export_layers(
    df: DataFrame,
    layer_name: str,
    geom_cols: list[str],
    out_dir: str,
    nogeomskip: bool = False,
    stringify_lists: bool = False,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Fan each geometry column out to `{layer}_{geomcol}` datasets.

    Returns {output_name: row_count}; empty outputs are skipped (S8).
    nogeomskip=True drops rows whose geometry is NULL like pg2ogr's
    no-geom filter (pg2ogr.py:133-153); the skipped count is part of
    the returned metrics via the `{name}__skipped` key.
    """
    other_cols = [c for c in df.columns if c not in geom_cols]
    results: dict[str, int] = {}
    for g in geom_cols:
        name = f"{layer_name}_{g}".lower()
        out = df.select(*other_cols, F.col(g).alias("geometry"))
        if stringify_lists:
            out = stringify_lists_for_export(out)
        # ONE job per geometry column: total/null tallies ride the write
        # via observe() metrics (round 1 ran null-count, limit(1).count,
        # the write, and a post-count — 4 scans). The S8 empty-layer
        # drop becomes a post-delete of the empty output, which is
        # literally the reference's fixpoint (pg2ogr.py:229-240) at
        # zero extra scan cost.
        obs = Observation()
        out = out.observe(
            obs,
            F.count(F.lit(1)).alias("n_total"),
            F.count("geometry").alias("n_geom"),
        )
        if nogeomskip:
            out = out.where(F.col("geometry").isNotNull())
        path = os.path.join(out_dir, name)
        getattr(out.write.mode("overwrite"), fmt)(path)
        n_total, n_geom = obs.get["n_total"], obs.get["n_geom"]
        written = n_geom if nogeomskip else n_total
        if nogeomskip:
            results[f"{name}__skipped"] = n_total - n_geom
        results[name] = written
        if written == 0:
            shutil.rmtree(path, ignore_errors=True)
    return results


def list_formats(spark) -> list[str]:
    """S4 — writable-format introspection (utils.py:26-43): the formats
    this engine's writers support (DataFrameWriter built-ins)."""
    return sorted(["parquet", "orc", "json", "csv", "text"])
