"""Structured-Streaming incremental ingest + match tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from resolve_spark import datagen
from resolve_spark.plans import pipeline as P
from resolve_spark.streaming.incremental import IncrementalResolver


def test_incremental_ingest_and_match(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    store_dir = str(tmp_path / "store")
    matches_dir = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    files = datagen.with_record_id(
        datagen.synth_files(spark, n_base=300, dup_rate=0.3)
    ).persist()
    base = files.where(~F.col("is_variant"))
    variants = files.where(F.col("is_variant"))
    schema = files.schema

    resolver = IncrementalResolver(
        spark, P.files_pipeline_config(), store_dir, matches_dir
    )

    # wave 1: base records arrive; store is empty -> no matches
    base.write.mode("overwrite").parquet(input_dir)
    q = resolver.start(input_dir, ckpt, schema)
    q.awaitTermination(300)
    store1 = spark.read.parquet(store_dir)
    assert store1.count() == base.count()
    assert not os.path.isdir(matches_dir)  # no matches written in wave 1

    # wave 2: the planted variants arrive -> they match stored bases
    variants.write.mode("append").parquet(input_dir)
    q = resolver.start(input_dir, ckpt, schema)
    q.awaitTermination(300)

    store2 = spark.read.parquet(store_dir)
    assert store2.count() == files.count()
    matches = spark.read.parquet(matches_dir)
    n_var = variants.count()
    # the overwhelming majority of variants find their base
    matched_queries = matches.select("query_id").distinct().count()
    assert matched_queries >= 0.95 * n_var, (matched_queries, n_var)
    # exactly-once: replaying with the same checkpoint adds nothing
    q = resolver.start(input_dir, ckpt, schema)
    q.awaitTermination(300)
    assert spark.read.parquet(store_dir).count() == store2.count()


def test_process_batch_retry_is_idempotent(spark, tmp_path):
    """A mid-batch failure retry (same batch_id replayed) must not
    duplicate rows in the store or the match log."""
    store_dir = str(tmp_path / "store")
    matches_dir = str(tmp_path / "matches")
    files = datagen.with_record_id(
        datagen.synth_files(spark, n_base=200, dup_rate=0.3)
    ).persist()
    base = files.where(~F.col("is_variant"))
    variants = files.where(F.col("is_variant"))
    resolver = IncrementalResolver(
        spark, P.files_pipeline_config(), store_dir, matches_dir
    )
    resolver.process_batch(base, batch_id=0)
    n0 = spark.read.parquet(store_dir).count()
    assert n0 == base.count()

    resolver.process_batch(variants, batch_id=1)
    n1 = spark.read.parquet(store_dir).count()
    m1 = spark.read.parquet(matches_dir).count()
    assert n1 == files.count() and m1 > 0

    # retry of batch 1 (foreachBatch redelivery after failure)
    resolver.process_batch(variants, batch_id=1)
    assert spark.read.parquet(store_dir).count() == n1
    assert spark.read.parquet(matches_dir).count() == m1


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: state persists across micro-batches
    AND across stream restarts (checkpointed) — a duplicate arriving in
    a later wave is flagged, never re-emitted as first."""
    from resolve_spark.streaming.dedup import run_streaming_dedup

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(input_dir)

    wave1 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor"),
         (3, "THE QUICK  brown fox")],  # normalized dup of doc 1
        ["doc_id", "text"],
    )
    schema = wave1.schema
    wave1.write.mode("overwrite").parquet(input_dir)
    q = run_streaming_dedup(spark, input_dir, out_dir, ckpt, schema)
    q.awaitTermination(300)

    got1 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert got1[1]["is_first"] and not got1[3]["is_first"]
    assert got1[3]["prior_dupes"] == 1 and got1[2]["is_first"]

    # wave 2 after a RESTART: new doc + another dup of doc 1
    wave2 = spark.createDataFrame(
        [(4, "completely new text"), (5, "the quick brown fox")],
        ["doc_id", "text"],
    )
    wave2.write.mode("append").parquet(input_dir)
    q = run_streaming_dedup(spark, input_dir, out_dir, ckpt, schema)
    q.awaitTermination(300)

    got2 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert got2[4]["is_first"]
    assert not got2[5]["is_first"]          # state survived the restart
    assert got2[5]["prior_dupes"] == 2       # doc 1 + doc 3 seen before
    firsts = {d for d, r in got2.items() if r["is_first"]}
    assert firsts == {1, 2, 4}


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """Watermarked windowed agg: append mode emits each closed window
    once; an event arriving AFTER the watermark passed its window is
    dropped, not double-counted."""
    import datetime as dt

    from resolve_spark.streaming.windows import run_windowed_counts

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(input_dir)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, etype="click", value=1.0):
        return (eid, t0 + dt.timedelta(minutes=minutes), etype, value)

    cols = ["event_id", "ts", "event_type", "value"]
    # wave 1: hour-0 events and an hour-3 event that pushes the
    # watermark far past hour 0 (watermark = max ts - 10 min)
    wave1 = spark.createDataFrame(
        [ev(1, 5), ev(2, 20), ev(3, 185)], cols)
    wave1.write.mode("overwrite").parquet(input_dir)
    q = run_windowed_counts(spark, input_dir, out_dir, ckpt, wave1.schema)
    q.awaitTermination(300)
    rows1 = {(r["window_start"].hour, r["event_type"]): r["n"]
             for r in spark.read.parquet(out_dir).collect()}
    assert rows1[(0, "click")] == 2          # hour-0 window closed and emitted
    assert (3, "click") not in rows1          # hour-3 window still open

    # wave 2: a LATE hour-0 event (watermark has long passed) + one more
    # hour-3 event + an hour-5 event to close hour 3
    wave2 = spark.createDataFrame(
        [ev(4, 25), ev(5, 190), ev(6, 320)], cols)
    wave2.write.mode("append").parquet(input_dir)
    q = run_windowed_counts(spark, input_dir, out_dir, ckpt, wave1.schema)
    q.awaitTermination(300)
    rows2 = {(r["window_start"].hour, r["event_type"]): r["n"]
             for r in spark.read.parquet(out_dir).collect()}
    assert rows2[(0, "click")] == 2          # late event 4 DROPPED
    assert rows2[(3, "click")] == 2          # hour-3 closed with both events
