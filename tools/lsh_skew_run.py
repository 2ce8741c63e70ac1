"""MinHash-LSH hot-bucket skew evidence at scale (round-4 verdict
item 5).

The band self-join's candidate blowup is quadratic in the largest
bucket: a boilerplate template duplicated B times co-buckets in every
band, so all-pairs emits ~bands * B^2/2 rows from ONE reducer's
partition — the LSH analogue of the exact-substring hot-hash window.
This script plants exactly that corpus shape (N mostly-unique docs +
one template cluster of C near-identical variants), then measures:

1. the band-bucket size distribution (max bucket, buckets over the
   cap, and the WOULD-BE uncapped candidate-pair count sum B*(B-1)/2
   — computed from a map-side-combined groupBy, never by running the
   blowup);
2. wall time + output size of the CAPPED pair join
   (minhash_lsh_pairs(max_bucket=...)): hot buckets emit O(B)
   component-preserving star rows (semantics oracle-checked at sf0.01
   by dedup_lsh_star; component equivalence pinned in
   tests/test_dedup_text.py).

Docs are generated distributedly in pure Catalyst (spark.range ->
hashed word sequences; the cluster docs share a 12-word template with
a per-doc variant token so exact dedup would NOT collapse them).
Prints ONE JSON line for BASELINE.md.

Usage (idle host): python tools/lsh_skew_run.py [n_docs=10000000] [cluster=100000]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _wait_for_idle  # noqa: E402

NUM_HASHES, BANDS, CAP = 16, 8, 64


def gen_docs(spark, n_docs: int, cluster: int):
    from pyspark.sql import functions as F

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("doc_id") * F.lit(p)) % F.lit(49999)).cast("string"),
        )
        for p in (7919, 104729, 1299709, 15485863, 32452843, 49979687,
                  67867967, 86028121, 104395301, 122949823, 141650939, 160481183)
    ]
    unique_text = F.concat_ws(" ", *words)
    template = (
        "cookie banner accept all manage preferences privacy policy terms conditions site nav"
    )
    cluster_text = F.concat(
        F.lit(template + " v"), (F.col("doc_id") % F.lit(13)).cast("string")
    )
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") < cluster, cluster_text)
        .otherwise(unique_text)
        .alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cluster = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from pyspark.sql import functions as F

    from gdal_vfr_spark import get_spark
    from gdal_vfr_spark.operators import dedup
    from gdal_vfr_spark.operators.dedup import band_keys_expr, with_minhash

    _wait_for_idle()
    spark = get_spark(
        "lsh_skew_run", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    docs = gen_docs(spark, n_docs, cluster)

    # --- 1. bucket distribution (map-side-combined: one shuffle of
    # (band_key, partial count), O(1) output per bucket) ---
    t0 = time.time()
    rows = NUM_HASHES // BANDS
    exploded = with_minhash(
        docs.repartition(spark.sparkContext.defaultParallelism, "doc_id"),
        "text",
        NUM_HASHES,
    ).select(
        "doc_id",
        F.explode(band_keys_expr(F.col("minhash"), BANDS, rows)).alias("band_key"),
    )
    bstats = exploded.groupBy("band_key").agg(F.count("*").alias("bn"))
    dist = bstats.agg(
        F.count("*").alias("n_buckets"),
        F.max("bn").alias("max_bucket"),
        F.sum(F.when(F.col("bn") > CAP, 1).otherwise(0)).alias("buckets_over_cap"),
        F.sum(F.col("bn") * (F.col("bn") - 1) / 2).alias("uncapped_pairs"),
        F.expr("percentile_approx(bn, 0.99)").alias("p99_bucket"),
    ).collect()[0]
    stats_s = time.time() - t0

    # --- 2. the capped pair join end-to-end ---
    t1 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=NUM_HASHES, bands=BANDS, max_bucket=CAP
    )
    n_pairs = pairs.count()
    capped_s = time.time() - t1

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cluster_size": cluster,
                "num_hashes": NUM_HASHES,
                "bands": BANDS,
                "max_bucket_cap": CAP,
                "n_buckets": int(dist["n_buckets"]),
                "max_bucket": int(dist["max_bucket"]),
                "p99_bucket": int(dist["p99_bucket"]),
                "buckets_over_cap": int(dist["buckets_over_cap"]),
                "uncapped_would_be_pairs": int(dist["uncapped_pairs"]),
                "capped_pairs": n_pairs,
                "bucket_stats_sec": round(stats_s, 1),
                "capped_join_sec": round(capped_s, 1),
                "docs_per_sec_capped": round(n_docs / capped_s),
            }
        )
    )


if __name__ == "__main__":
    main()
