"""SemDeDup at-scale evidence: hot-cluster skew + two-level scaling.

SemDeDup's within-cluster pairwise term is quadratic in the largest
cluster — the semantic analogue of the LSH hot bucket
(tools/lsh_skew_run.py) and the exact-substring hot hash. This script
plants exactly that shape: N unit vectors around 128 anchors, one
anchor OVERSIZED 8x (every 16th id folds into cluster 0) and
near-duplicate-dense (tiny jitter, so the drop rule fires on almost
the whole cluster), the rest moderately spread (mostly survivors).
It then measures `similarity.semantic_dedup`'s blocked Arrow path:

1. cluster-size distribution (max cluster, p99) from the assignment
   alone — one map-side-combined groupBy;
2. end-to-end wall time + survivor counts at TWO parallelism levels
   (subprocess workers on the same parquet input, lo then hi), with
   vectors/sec and scaling efficiency — the same two-level protocol
   shape as bench.py's spatial metric.

The blocked drop rule never materializes pair rows and caps its
scratch matrix at ~256 MB (block height adapts to cluster size), so
the hot cluster costs more BLOCK ITERATIONS inside one task, never
memory. Prints ONE JSON line for BASELINE.md.

Usage (idle host): python tools/semdedup_scale_run.py [n=500000] [lo=8] [hi=32]
Worker mode (internal): semdedup_scale_run.py --worker <cpus> <parquet>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
K = 128
TAU = 0.9
INPUT = "/tmp/semdedup_scale_input"


def gen_vectors(spark, n: int):
    """Deterministic unit-ish vectors: anchor (seeded per cluster) +
    integer-arithmetic jitter. Cluster id: one seed row per anchor
    (ids 0..127), then every 16th id folds into cluster 0 (8x
    oversized, near-dup dense: jitter 0.02); other clusters get
    jitter 0.6 (pairwise cosine mostly under TAU)."""
    import numpy as np
    import pandas as pd

    rngs = [np.random.default_rng(c) for c in range(K)]
    anchors = np.stack([r.normal(size=DIM) for r in rngs])
    anchors /= np.sqrt((anchors * anchors).sum(1))[:, None]

    def synth(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            c = np.where(
                (ids >= K) & (ids % 16 == 0), 0, ids % K
            ).astype(np.int64)
            amp = np.where(c == 0, 0.02, 0.6)
            # counter-based deterministic jitter, vectorized
            j = np.empty((len(ids), DIM))
            for d in range(DIM):
                j[:, d] = (
                    ((ids * 2654435761 + (d + 1) * 40503) % 100003) / 100003.0
                    - 0.5
                )
            v = anchors[c] + j * amp[:, None]
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [row.tolist() for row in v]}
            )

    return spark.range(n).mapInPandas(
        synth, schema="vec_id long, embedding array<double>"
    )


def run_worker(cpus: int, path: str) -> None:
    from pyspark.sql import functions as F

    from gdal_vfr_spark import get_spark
    from gdal_vfr_spark.operators import similarity

    spark = get_spark(
        f"semdedup_scale_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = spark.read.parquet(path)
    n = emb.count()  # warm the input cache path / JIT
    best = None
    survivors = None
    for _ in range(2):
        t0 = time.time()
        survivors = similarity.semantic_dedup(
            emb, threshold=TAU, n_centroids=K, n_iter=2, dim=DIM
        ).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    hot_kept = (
        similarity.semantic_dedup(
            emb, threshold=TAU, n_centroids=K, n_iter=2, dim=DIM
        )
        .where(F.col("cid") == 0)
        .count()
    )
    print(
        "WORKER "
        + json.dumps(
            {
                "cpus": cpus,
                "n": n,
                "survivors": survivors,
                "hot_cluster_survivors": hot_kept,
                "sec": round(best, 2),
                "vecs_per_sec": int(n / best),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), sys.argv[3])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from bench import _wait_for_idle
    from gdal_vfr_spark import get_spark
    from gdal_vfr_spark.operators import similarity

    _wait_for_idle()
    spark = get_spark(
        "semdedup_scale_prepare",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    gen_vectors(spark, n).write.mode("overwrite").parquet(INPUT)
    emb = spark.read.parquet(INPUT)

    # cluster-size distribution from the assignment alone (map-side-
    # combined groupBy — the cheap skew probe a pipeline would run
    # before committing to a k)
    cents = similarity.kmeans_centroids(
        emb, k=K, n_iter=2, dim=DIM
    )
    sizes = (
        emb.withColumn(
            "cid", similarity._assign_arrow_udf(cents)(F.col("embedding"))
        )
        .groupBy("cid")
        .count()
    )
    dist = sizes.agg(
        F.count("*").alias("n_clusters"),
        F.max("count").alias("max_cluster"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_cluster"),
    ).collect()[0]
    spark.stop()

    out: dict = {
        "n_vectors": n,
        "dim": DIM,
        "k": K,
        "threshold": TAU,
        "n_clusters": int(dist["n_clusters"]),
        "max_cluster": int(dist["max_cluster"]),
        "p99_cluster": int(dist["p99_cluster"]),
        "levels": {},
    }
    for cpus in (lo, hi):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), INPUT],
            capture_output=True,
            text=True,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("WORKER ")),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"worker local[{cpus}] failed:\n{proc.stderr[-2000:]}"
            )
        out["levels"][f"local[{cpus}]"] = json.loads(line[len("WORKER "):])
    lo_r = out["levels"][f"local[{lo}]"]["vecs_per_sec"]
    hi_r = out["levels"][f"local[{hi}]"]["vecs_per_sec"]
    out["scaling_efficiency"] = round((hi_r / lo_r) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
