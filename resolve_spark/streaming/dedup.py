"""Streaming dedup — custom stateful operator over Structured Streaming.

The batch dedup family (operators/dedup.py) answers "which of these
rows duplicate each other"; a TRAINING-DATA INGEST stream needs the
online form: "have I ever seen this content before, across all previous
micro-batches". That is a keyed-state problem, so it runs as
``applyInPandasWithState`` (the Spark-native custom stateful operator):

    readStream
      -> content_fingerprint(text)  (native xxhash64 over normalized text)
      -> groupBy(fingerprint)
      -> applyInPandasWithState:  state = (first_seen count)
           first row of a never-seen fingerprint -> emitted (is_first=true)
           everything else -> emitted with is_first=false + dup_of count
      -> sink keeps only is_first rows for the training corpus

State is one small struct per distinct fingerprint; Spark checkpoints
it with the stream, so the dedup survives restarts exactly-once. At
100 TB the state size is bounded by DISTINCT content (hashes only, not
text) and is hash-partitioned across executors by the groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from resolve_spark.functions.text import content_fingerprint

OUTPUT_SCHEMA = (
    "fingerprint long, doc_id long, text string, is_first boolean, "
    "prior_dupes int"
)
STATE_SCHEMA = "seen int"


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (seen,) = state.get if state.exists else (0,)
    for pdf in batches:
        pdf = pdf.sort_values("doc_id", kind="stable")
        n = len(pdf)
        out = pd.DataFrame({
            "fingerprint": pdf["fingerprint"],
            "doc_id": pdf["doc_id"],
            "text": pdf["text"],
            # only the very first occurrence EVER (across batches) is new
            "is_first": [seen + i == 0 for i in range(n)],
            "prior_dupes": [seen + i for i in range(n)],
        })
        seen += n
        yield out
    state.update((seen,))


def streaming_dedup(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arriving documents -> rows annotated with is_first / prior_dupes.

    ``stream`` must be a streaming DataFrame with (id_col, text_col).
    Downstream keeps ``is_first`` rows as the deduplicated corpus.
    """
    keyed = stream.select(
        content_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, schema,
    id_col: str = "doc_id", text_col: str = "text",
):
    """Wire the operator: parquet dir stream -> stateful dedup -> parquet
    sink, availableNow trigger (process-everything-then-stop)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = streaming_dedup(stream, id_col, text_col)
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
