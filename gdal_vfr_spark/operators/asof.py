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
from pyspark.sql import DataFrame


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
