"""Gap-based sessionization of event streams (engine addition; the
reference has no event-analytics analogue — its closest shape is the
per-file pass loop, vfrogr.py:935-1003, which groups work by batch the
way sessions group events by inactivity gap).

Standard web/event-analytics operator: a user's events are split into
sessions wherever the inter-event gap exceeds a threshold. Pure
Catalyst — two window passes over ONE shuffle on the user key (lag to
flag session starts, running sum to number them), then a hash
aggregate for the per-session rollup. Deterministic: events order by
(ts, event_id) so equal timestamps cannot flip session numbering.

Scale notes (100 TB): the only shuffle is partitionBy(user) — the same
Zipf-skew caveat as every per-user window (pair with plans/skew.py for
bot-grade hot users). State is O(1) per row in the window pass; the
session rollup combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): session index (1-based, in time
    order), event count, start/end timestamps, duration in seconds.

    A session starts at the first event and at every event whose gap
    from the previous event of the SAME user exceeds gap_minutes."""
    ts = F.col(ts_col).cast("timestamp")
    w_order = Window.partitionBy(user_col).orderBy(ts.asc(), F.col(id_col).asc())
    prev_ts = F.lag(ts).over(w_order)
    new_sess = F.when(
        prev_ts.isNull()
        | (ts.cast("long") - prev_ts.cast("long") > F.lit(gap_minutes * 60)),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = events.select(
        F.col(user_col),
        F.col(id_col),
        ts.alias("__ts"),
        F.sum(new_sess).over(w_run).alias("session_idx"),
    )
    return (
        numbered.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("__ts").alias("session_start"),
            F.max("__ts").alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            F.col("session_end").cast("long") - F.col("session_start").cast("long"),
        )
    )
