"""Structured Streaming operators over the ``events`` stream table.

The reference has no streaming surface (SURVEY.md §2.9); these are
beyond-reference pipeline operators. Each transformation is written
once and applied to BOTH a batch DataFrame and a streaming DataFrame
(``readStream``) — the batch run doubles as the correctness oracle
for the stream (tested with ``Trigger.AvailableNow`` + memory sink).

Scale notes: windowed aggregation shuffles on (window, key) with
partial aggregation; the watermark bounds state for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "hourly_event_stats",
    "read_event_stream",
    "run_stream_to_memory",
    "sessionize",
]


def hourly_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling-window per-type counts + value sum/avg. Works on
    batch and streaming inputs alike; the watermark is only attached
    on streams (batch ignores late-data semantics)."""
    df = events
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Decimal-exact sum (input values carry 2 decimals), cast
            # back to double: the result is independent of partition /
            # aggregation order, unlike a raw double sum — required for
            # bit-exact parity between batch, streaming, and the
            # DuckDB oracle.
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session-window aggregation per user (built-in session_window —
    stateful on streams, plain agg on batch)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, gap)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            F.col(user_col),
            "n_events",
        )
    )


def read_event_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet directory (the standard way
    to replay a table as a stream)."""
    # Testdata events store TIMESTAMP(NANOS); read nanos as long and
    # truncate to micros, same normalization as sources.load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain a stream with AvailableNow into an in-memory table named
    ``query_name`` (test/verification harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
