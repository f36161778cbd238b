"""Event-time windowed aggregation with watermarks (late-data handling).

The training-data ingest side of the engine needs windowed stream
stats (arrival rates per type, per-window quality counters) where LATE
events — arriving after the watermark has passed their window — must
not corrupt already-emitted windows. This is the canonical Structured
Streaming shape:

    readStream
      -> withWatermark(ts, delay)
      -> groupBy(window(ts, size), keys) . agg(...)
      -> append sink (a window row is emitted exactly once, when the
         watermark passes its end; later stragglers are dropped)

State is bounded: Spark discards window state once the watermark
passes, so memory is O(open windows), not O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, key, n, total_value) per closed window."""
    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n", "total_value",
        )
    )


def run_windowed_counts(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, schema,
    window: str = "1 hour", watermark: str = "10 minutes",
):
    """Parquet-dir stream -> watermarked windowed counts -> parquet sink
    (append mode: finalized windows only), availableNow trigger."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = windowed_event_counts(stream, window=window, watermark=watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
