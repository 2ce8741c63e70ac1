"""Set operations — SURVEY.md §2.6 (SO1/SO2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetric_diff(a: DataFrame, b: DataFrame, col: str = "name") -> DataFrame:
    """SO1 — compare_list(a, b) (utils.py:108-120): '+ x' for names only
    in a, '- x' for names only in b (the reference's layer-consistency
    check between OGR layers and raw XML nodes, vfrogr.py:952-953)."""
    only_a = a.select(col).exceptAll(b.select(col)).withColumn("diff", F.lit("+"))
    only_b = b.select(col).exceptAll(a.select(col)).withColumn("diff", F.lit("-"))
    return only_a.unionByName(only_b).orderBy("diff", col)


def union_batches(dfs: list[DataFrame]) -> DataFrame:
    """SO2 — multi-file runs union successive files (vfrogr.py:934-1025
    run() loop, auto-append vfrogr.py:1020-1021)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
