"""Round-6 diagnostic: where does dedup_minhash_lsh spend its time at
a given SF? Prints band-bucket size distribution, candidate pair
count, final pair count, and stage timings for isolated pieces.

Usage: python tools/diag_minhash_r06.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gdal_vfr_spark import get_spark
from gdal_vfr_spark.operators import dedup
from gdal_vfr_spark.functions.text_expr import band_keys_expr


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark("diag_minhash", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    t0 = time.time()
    sig = (
        dedup.with_minhash(
            docs.repartition(spark.sparkContext.defaultParallelism, "doc_id"),
            "text", 16, 5,
        )
        .select("doc_id", "minhash")
        .persist()
    )
    n = sig.count()
    t_sig = time.time() - t0
    print(f"docs={n} signature grind: {t_sig:.2f}s")

    exploded = sig.select(
        "doc_id", F.explode(band_keys_expr(F.col("minhash"), 8, 2)).alias("band_key")
    )
    t0 = time.time()
    stats = exploded.groupBy("band_key").count()
    dist = stats.groupBy("count").agg(F.count("*").alias("n_buckets")).orderBy("count").collect()
    t_stats = time.time() - t0
    total_pairs = sum(r["count"] * (r["count"] - 1) // 2 * r["n_buckets"] for r in dist)
    top = sorted(dist, key=lambda r: -r["count"])[:5]
    print(f"bucket stats: {t_stats:.2f}s; candidate pairs (pre-distinct) = {total_pairs}")
    print("largest buckets (size, how many):", [(r["count"], r["n_buckets"]) for r in top])

    t0 = time.time()
    a = exploded.select(F.col("doc_id").alias("id_a"), "band_key")
    b = exploded.select(F.col("doc_id").alias("id_b"), "band_key")
    pairs = (
        a.join(b, on="band_key").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )
    np_ = pairs.count()
    t_pairs = time.time() - t0
    print(f"distinct pairs = {np_}  join+distinct: {t_pairs:.2f}s")

    t0 = time.time()
    full = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    full.write.mode("overwrite").format("noop").save()
    print(f"full operator: {time.time()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
