import numpy as np
import pandas as pd

from gdal_vfr_spark import datagen
from gdal_vfr_spark.geo import wkb
from gdal_vfr_spark.geo.pip import PackedPolygonIndex, point_in_polygon_join


def test_packed_index_contains():
    sq = wkb.polygon(
        [np.asarray([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)]
    )
    hole = wkb.polygon(
        [
            np.asarray([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]], dtype=float),
            np.asarray([[12, 12], [14, 12], [14, 14], [12, 14], [12, 12]], dtype=float),
        ]
    )
    idx = PackedPolygonIndex.build([(1, sq), (2, hole)])
    px = np.asarray([1.0, 3.0, 13.0, 15.0, -1.0])
    py = np.asarray([1.0, 1.0, 13.0, 15.0, 1.0])
    pidx = np.asarray([0, 0, 1, 1, 0])
    got = idx.contains(pidx, px, py)
    # (13,13) is inside the hole -> outside; (15,15) inside shell
    assert got.tolist() == [True, False, False, True, False]


def test_pip_join_matches_ground_truth(spark):
    pages = datagen.gen_webpages(spark, n=3000, seed=7)
    obce = datagen.gen_obce(spark, seed=7)
    joined = point_in_polygon_join(
        pages,
        obce,
        poly_key="kod",
        geom_col="originalni_hranice",
        out_key="obec_kod",
    )
    rows = joined.select("url", "obec_kod", "truth_obec_kod").collect()
    n_geo = pages.where("lon is not null").count()
    assert len(rows) == n_geo  # every geotagged page matched exactly one obec
    for r in rows:
        assert r["obec_kod"] == r["truth_obec_kod"], r


def test_pip_join_left_keeps_nulls(spark):
    pages = datagen.gen_webpages(spark, n=500, seed=11)
    obce = datagen.gen_obce(spark, seed=11)
    joined = point_in_polygon_join(
        pages, obce, poly_key="kod", geom_col="originalni_hranice",
        out_key="obec_kod", how="left",
    )
    assert joined.count() == 500
    nulls = joined.where("obec_kod is null").count()
    assert nulls == pages.where("lon is null").count()


def test_pip_counts_per_obec(spark):
    """The reference's headline observable: per-layer feature counts
    (vfrogr.py:409-426) — here per-municipality page counts."""
    from pyspark.sql import functions as F

    pages = datagen.gen_webpages(spark, n=2000, seed=3)
    obce = datagen.gen_obce(spark, seed=3)
    joined = point_in_polygon_join(
        pages, obce, poly_key="kod", geom_col="originalni_hranice", out_key="obec_kod"
    )
    got = {
        r["obec_kod"]: r["n"]
        for r in joined.groupBy("obec_kod").agg(F.count("*").alias("n")).collect()
    }
    truth = (
        pages.where("truth_obec_kod >= 0")
        .groupBy("truth_obec_kod")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {r["truth_obec_kod"]: r["n"] for r in truth}
    assert got == want
