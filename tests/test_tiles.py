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
