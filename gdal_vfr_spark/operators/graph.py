"""Link-graph analytics for web corpora: fixed-point PageRank.

Engine addition (no reference analogue): domain/page authority scores
are a standard web-corpus curation signal (quality priors, crawl
frontier ordering). Public construction (Brin/Page 1998), implemented
Spark-first as an iterative DataFrame job like
operators.dedup.connected_components.

Cross-engine exactness (the repo's oracle rules): ranks are kept in
FIXED-POINT bigints (micro-units). Per-edge contribution is integer
division pr // outdeg (exact, order-free), the per-node sum is a
bigint sum (order-free), and the damping step is floor(0.85 * sum) —
one float multiply of a < 2^53 integer, IEEE-identical everywhere.
The DuckDB oracle unrolls the same iterations as CTEs (the
kmeans_centroids pattern).

Scale notes (100 TB): each iteration is one groupBy(dst) shuffle of
the contribution table plus a broadcast-or-shuffle join back to ranks;
outdeg is computed once. Dangling nodes (no out-edges) leak their mass
by design here — documented divergence from the redistribute-variant;
at corpus scale the standard fix is one extra scalar aggregate per
iteration, same shape. Driver holds only scalars (N); lineage is cut
per iteration with localCheckpoint like connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000


def pagerank_fp(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr_fp) after n_iter iterations; pr_fp in micro-units.

    init: floor(PR_SCALE / N) per node. update:
    pr'(v) = base + floor(damping * sum_{u->v}(pr(u) // outdeg(u)))
    with base = floor((1 - damping) * PR_SCALE / N)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr_fp", F.lit(0).cast("long"))
    init = PR_SCALE // n
    base = int((1.0 - damping) * PR_SCALE / n)  # floor via int()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("pr_fp", F.lit(init).cast("long"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("pr_fp div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)))
                ).cast("long").alias("pr_fp"),
            )
            .localCheckpoint()
        )
    return ranks
