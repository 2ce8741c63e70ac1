"""Incremental ingestion as Structured Streaming.

The reference is batch-only: daily change FILES applied as merges
(SURVEY.md §2.10). This module provides the noted-but-optional stream
facade: `Trigger.AvailableNow` over a change-file directory reproduces
M3 exactly (each micro-batch = one change batch -> MERGE via
foreachBatch), plus watermarked tumbling-window aggregation over an
event stream — the streaming twin of __spark_entry__'s
`w_tumbling_hour` batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gdal_vfr_spark.operators.merge import ParquetTable


def change_stream_merge(
    spark,
    changes_dir: str,
    schema,
    target_path: str,
    checkpoint_dir: str,
    key: str = "gml_id",
):
    """Apply all currently-available change files into the target table
    (one MERGE per micro-batch), then stop — Trigger.AvailableNow
    semantics: a resumable batch job wearing the streaming API, with the
    source offset log as the batch-level lineage (complementing
    plans.lineage's partition-level log).
    """
    table = ParquetTable(spark, target_path)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.merge(batch_df, key=key)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one change file per merge, like the reference's per-file loop
        .parquet(changes_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts + exact decimal sums (late
    rows beyond the watermark are dropped, state is bounded)."""
    # event-time watermarks require TIMESTAMP (LTZ); parquet written
    # from pandas arrives as TIMESTAMP_NTZ
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )
