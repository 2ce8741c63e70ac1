"""As-of (temporal nearest-before) join — engine extra.

Absent in the reference (SURVEY.md §2.11 lists theta/as-of joins as
explicit absences) but a staple of event-to-snapshot alignment in
web-scale pipelines (e.g. page crawl_ts -> latest polygon validity
interval, PlatiOd/PlatiDo semantics in §1.3). Implemented as the
canonical Spark decomposition: cogroup on the equi-key, Arrow-batched
pandas merge_asof per group (cf. public cogroup example in Spark docs).

Scale shape: both sides shuffle once on the key; each group is merged
in one vectorized pandas call. Skewed keys are split by AQE; for a
pathological single key, pre-salt by time bucket.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `on` value <= left's `on` (direction='backward'), matched within
    the same `by` key. Right side must be unique per (by, on) for
    deterministic output — enforce upstream with a window dedup.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields)
    for c in rcols:
        fields.append(right.schema[c])
    schema = T.StructType(fields)

    lsel = left
    rsel = right.select(by, on, *rcols)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[f.name for f in fields])
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if len(rpdf) == 0:
            for c in rcols:
                lpdf[c] = None
            return lpdf
        rpdf = rpdf.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            on=on,
            direction=direction,
            suffixes=("", "__r"),
        )
        return merged[[f.name for f in fields]]

    return (
        lsel.groupBy(by)
        .cogroup(rsel.groupBy(by))
        .applyInPandas(merge, schema=schema)
    )


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of (backward) join with NO Python boundary — the scale path.

    Union both sides (right rows carry their payload, left rows carry
    nulls), one window sort per key, and `last(ignorenulls)` forwards
    each right payload to every later left row. Same result as
    asof_join(direction='backward') when the right side is unique per
    (by, on) and its payload columns are non-null (a null payload value
    would be skipped by ignorenulls — enforce upstream).

    Scale shape: ONE shuffle (the window's hash partition on `by`),
    everything inside whole-stage codegen; vs the cogroup variant's two
    shuffles plus per-group Arrow round-trips — at millions of small
    groups the per-group overhead dominates, this form doesn't pay it.
    Ties (left.on == right.on) match, like merge_asof backward: right
    rows sort before left rows at equal timestamps.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lcols = [c for c in left.columns]
    l2 = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols if c not in (by, on)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    r2 = right.where(F.col(on).isNotNull()).select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, on)],
        *[F.col(c) for c in rcols],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}") for c in rcols]
    )
    return filled.where(F.col("__is_left") == 1).select(
        *lcols, *[F.col(f"__f_{c}").alias(c) for c in rcols]
    )
