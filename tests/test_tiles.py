import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_vfr_spark import datagen
from gdal_vfr_spark.geo import cells, tiles


def test_tile_key_matches_truth(spark):
    pages = datagen.gen_webpages(spark, n=2000, seed=13)
    out = tiles.with_tile_key(pages, res=datagen.TILE_RES)
    bad = out.where(F.col("tile_key") != F.col("truth_tile_key")).count()
    assert bad == 0


def test_tile_prefix_is_parent(spark):
    pages = datagen.gen_webpages(spark, n=500, seed=13).where("lon is not null")
    out = (
        tiles.with_tile_key(pages, res=15)
        .withColumn("pfx", tiles.tile_prefix_expr("tile_key", 6, tile_res=15))
        .select("tile_key", "pfx")
        .collect()
    )
    tk = np.asarray([r["tile_key"] for r in out])
    want = cells.cell_parent(tk, 6)
    got = np.asarray([r["pfx"] for r in out])
    assert np.array_equal(got, want)


def test_write_tiled_roundtrip(spark, tmp_path):
    pages = datagen.gen_webpages(spark, n=1000, seed=17)
    path = str(tmp_path / "tiled")
    tiles.write_tiled(pages, path, res=15, prefix_res=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    # partition pruning: filtering on tile_prefix prunes input files
    one_pfx = back.select("tile_prefix").where("tile_prefix >= 0").first()[0]
    plan = back.where(F.col("tile_prefix") == one_pfx)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "tile_prefix" in plan


def test_tile_join_matches_truth(spark):
    pages = datagen.gen_webpages(spark, n=1000, seed=19).where("lon is not null")
    # raster side: payload per occupied tile (derived from truth keys)
    raster = (
        pages.select(F.col("truth_tile_key").alias("tile_key"))
        .distinct()
        .withColumn("payload", F.col("tile_key") % 97)
    )
    joined = tiles.tile_join(pages, raster, res=datagen.TILE_RES)
    assert joined.count() == pages.count()
    bad = joined.where(F.col("payload") != F.col("truth_tile_key") % 97).count()
    assert bad == 0


def test_read_tiles_bbox_prunes_partitions(spark, tmp_path):
    """read_tiles_bbox must (a) return exactly the brute bbox filter's
    rows and (b) prune at the PARTITION level (PartitionFilters on the
    scan; fewer directories read than exist)."""
    import os

    from pyspark.sql import functions as F

    from gdal_vfr_spark.geo import tiles

    pages = datagen.gen_webpages(spark, n=4000, seed=37).where("lon is not null")
    path = str(tmp_path / "tiled")
    tiles.write_tiled(pages, path, prefix_res=10)
    n_dirs = len([d for d in os.listdir(path) if d.startswith("tile_prefix=")])
    bbox = (14.2, 49.7, 14.6, 50.1)
    out = tiles.read_tiles_bbox(spark, path, *bbox, prefix_res=10)
    want = pages.where(
        (F.col("lon") >= bbox[0]) & (F.col("lon") < bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") < bbox[3])
    )
    assert sorted(r["url"] for r in out.collect()) == sorted(
        r["url"] for r in want.collect()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile_prefix" in plan
    # the IN-list covers fewer prefixes than the table has partitions
    from gdal_vfr_spark.geo import cells

    n_probe = len(cells.cover_bbox(*bbox, 10))
    assert 0 < n_probe < n_dirs
