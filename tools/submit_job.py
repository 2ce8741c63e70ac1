"""spark-submit entry for the north-rule deployment mode.

The engine must run via `spark-submit --py-files` on a multi-executor
cluster (north rule). This job deliberately builds a BARE SparkSession
and never touches sys.path or addPyFile — the gdal_vfr_spark import
works on driver and executors only if --py-files shipped it, which is
exactly what it proves.

Usage (local stand-in for a cluster; swap --master for a real one):

    ZIP=$(python -c "import sys; sys.path.insert(0, '.'); \
          from gdal_vfr_spark.session import package_zip; print(package_zip())")
    /opt/spark/bin/spark-submit --master 'local[8]' \
        --conf spark.sql.shuffle.partitions=8 \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        --py-files "$ZIP" tools/submit_job.py 4000000

Prints one JSON line: {"pages": N, "sec": s, "pages_per_sec": r}.
Run at two cluster sizes (N and 4N executors) for the scaling-
efficiency measurement; bench.py automates that locally.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = SparkSession.builder.appName("vfr_spatial_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # import AFTER the session exists: proves --py-files shipped the
    # package (no sys.path manipulation anywhere in this file)
    from gdal_vfr_spark import datagen
    from gdal_vfr_spark.geo import tiles
    from gdal_vfr_spark.geo.pip import PIPJoiner

    pages = datagen.gen_webpages_sql(spark, n)
    joiner = PIPJoiner(
        datagen.gen_obce(spark, densify=64),
        poly_key="kod",
        geom_col="originalni_hranice",
        out_key="obec_kod",
    )
    t0 = time.time()
    out = tiles.with_tile_key(joiner.apply(pages), res=tiles.DEFAULT_TILE_RES).groupBy(
        "obec_kod", tiles.tile_prefix_expr("tile_key", 6).alias("tile_prefix")
    ).agg(F.count("*").alias("n_pages"))
    out.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    geo = int(n * 19 / 20)  # 1/20 of generated pages lack a geotag
    print(json.dumps({"pages": geo, "sec": round(dt, 3), "pages_per_sec": round(geo / dt)}))
    spark.stop()


if __name__ == "__main__":
    main()
