import numpy as np
import pandas as pd

from gdal_vfr_spark import datagen
from gdal_vfr_spark.geo.knn import PackedPointIndex, knn_batch, knn_join


def brute_knn(qx, qy, tx, ty, tk, k):
    """Reference implementation: full distance matrix + stable sort."""
    out = []
    for i in range(len(qx)):
        d2 = (tx - qx[i]) ** 2 + (ty - qy[i]) ** 2
        order = np.lexsort((tk, d2))[:k]
        out.append([(int(tk[j]), float(d2[j])) for j in order])
    return out


def test_knn_batch_exact_vs_brute():
    rng = np.random.default_rng(0)
    tx = rng.uniform(14, 15, 300)
    ty = rng.uniform(49.5, 50.5, 300)
    tk = rng.permutation(300).astype(np.int64)
    qx = rng.uniform(14, 15, 500)
    qy = rng.uniform(49.5, 50.5, 500)
    idx = PackedPointIndex.build(tx, ty, tk, res=12)
    qi, keys, d2, rank = knn_batch(idx, qx, qy, k=3)
    want = brute_knn(qx, qy, tx, ty, tk, 3)
    got: dict[int, list] = {}
    for a, b, c, r in zip(qi, keys, d2, rank):
        got.setdefault(int(a), []).append((int(r), int(b), float(c)))
    assert len(got) == 500
    for i in range(500):
        mine = [(kk, dd) for _, kk, dd in sorted(got[i])]
        assert mine == want[i], i


def test_knn_batch_few_targets():
    # fewer targets than k: returns all of them
    idx = PackedPointIndex.build([14.1, 14.9], [50.0, 50.1], [7, 3], res=10)
    qi, keys, d2, rank = knn_batch(idx, np.asarray([14.5]), np.asarray([50.0]), k=5)
    assert sorted(keys.tolist()) == [3, 7]


def test_knn_join_spark(spark):
    pages = datagen.gen_webpages(spark, n=400, seed=21)
    # targets: obce grid centers, key = kod (known by construction)
    centers = []
    dx, dy = (datagen.LON1 - datagen.LON0) / datagen.GRID, (
        datagen.LAT1 - datagen.LAT0
    ) / datagen.GRID
    for iy in range(datagen.GRID):
        for ix in range(datagen.GRID):
            centers.append(
                {
                    "kod": datagen.OBEC_BASE + iy * datagen.GRID + ix,
                    "lon": datagen.LON0 + (ix + 0.5) * dx,
                    "lat": datagen.LAT0 + (iy + 0.5) * dy,
                }
            )
    targets = spark.createDataFrame(pd.DataFrame(centers))
    out = knn_join(pages, targets, k=1, target_key="kod").collect()
    pages_pd = pages.where("lon is not null").toPandas()
    assert len(out) == len(pages_pd)
    # nearest center of a grid == containing cell == truth_obec_kod
    truth = dict(zip(pages_pd["url"], pages_pd["truth_obec_kod"]))
    for r in out:
        assert r["neighbor_key"] == truth[r["url"]], r


def test_knn_join_k3_matches_brute(spark):
    rng = np.random.default_rng(4)
    tpdf = pd.DataFrame(
        {
            "kod": np.arange(50, dtype=np.int64),
            "lon": rng.uniform(14, 15, 50),
            "lat": rng.uniform(49.5, 50.5, 50),
        }
    )
    qpdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(200)],
            "lon": rng.uniform(14, 15, 200),
            "lat": rng.uniform(49.5, 50.5, 200),
        }
    )
    out = (
        knn_join(
            spark.createDataFrame(qpdf),
            spark.createDataFrame(tpdf),
            k=3,
            target_key="kod",
        )
        .orderBy("url", "rank")
        .collect()
    )
    want = brute_knn(
        qpdf["lon"].to_numpy(),
        qpdf["lat"].to_numpy(),
        tpdf["lon"].to_numpy(),
        tpdf["lat"].to_numpy(),
        tpdf["kod"].to_numpy(),
        3,
    )
    got: dict[str, list] = {}
    for r in out:
        got.setdefault(r["url"], []).append((r["neighbor_key"], r["dist2"]))
    for i in range(200):
        assert [(k, d) for k, d in got[f"u{i}"]] == want[i], i
