"""Incremental (streaming) ingest + match.

The reference has NO streaming (SURVEY.md §2.10); its only incremental
surface is the REST API adding one entity at a time (S2/S11). The Spark
equivalent is Structured Streaming over an arriving-files directory:

    readStream(parquet dir)
      -> normalize + blocking keys           (same Column exprs as batch)
      -> foreachBatch:
           match arrivals against the existing entity store
           (block-key equi-join, fused scoring, threshold)
           append arrivals to the store, append matches to a log

foreachBatch is the right tool here (not a stateful operator): each
micro-batch joins against the mutable entity table — a batch join per
trigger — while normalization/blocking stay on the streaming plan.
Writes are idempotent per batch_id (each batch owns one partition and a
retried batch overwrites it), so stream-checkpoint replay AND mid-batch
failure retry both land exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resolve_spark.operators import blocking as B
from resolve_spark.operators.matching import find_matches
from resolve_spark.plans.pipeline import PipelineConfig, ResolvePipeline


class IncrementalResolver:
    """Micro-batch ER: arrivals matched against the store, then absorbed."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig, store_dir: str,
                 matches_dir: str, threshold: float | None = None):
        self.spark = spark
        self.cfg = cfg
        self.store_dir = store_dir
        self.matches_dir = matches_dir
        self.threshold = threshold if threshold is not None else cfg.threshold
        self._pipe = ResolvePipeline(spark, cfg)

    def prepare(self, df: DataFrame) -> DataFrame:
        out = self._pipe.blocked(self._pipe.normalized(df))
        if "block_key" not in out.columns:
            # canopy-less configs (e.g. the files shape): the first
            # multi-pass key (token signature) serves as the equi-join key
            out = out.withColumn("block_key", F.element_at("block_keys", 1))
        return out

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        prepared = self.prepare(batch).persist()
        # dynamic partition overwrite writes no _SUCCESS marker; the
        # store exists iff at least one batch partition landed
        store_exists = os.path.isdir(self.store_dir) and any(
            e.startswith("_batch_id=") for e in os.listdir(self.store_dir)
        )
        if store_exists:
            # exclude THIS batch's own partition: a retried batch must
            # match against exactly the store state the first attempt
            # saw, even if the first attempt's store write landed
            store = (
                self.spark.read.parquet(self.store_dir)
                .where(F.col("_batch_id") != batch_id)
                .drop("_batch_id")
            )
            queries = prepared.withColumnRenamed(self.cfg.id_col, "query_id")
            matches = find_matches(
                queries, store, list(self.cfg.specs),
                entity_id=self.cfg.id_col,
                block_key="block_key",
                threshold=self.threshold,
            ).withColumn("batch_id", F.lit(batch_id))
            self._idempotent_write(matches, "batch_id", self.matches_dir)
        self._idempotent_write(
            prepared.drop("block_keys").withColumn("_batch_id", F.lit(batch_id)),
            "_batch_id", self.store_dir,
        )
        prepared.unpersist()

    @staticmethod
    def _idempotent_write(df: DataFrame, batch_col: str, path: str) -> None:
        """Exactly-once-per-batch sink: each micro-batch owns one
        ``batch_col`` partition and a retried batch dynamically
        OVERWRITES its own partition instead of appending a duplicate."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(batch_col)
            .parquet(path)
        )

    def start(self, input_dir: str, checkpoint_dir: str, schema,
              trigger_once: bool = True):
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
