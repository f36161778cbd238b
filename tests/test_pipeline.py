"""End-to-end pipeline tests: the BASELINE.json correctness gate.

- pairwise F1 >= 0.99 on labeled pairs at the shared blocking key
- sha256(content) invariant preserved end-to-end
- checkpoint resume: stage outputs identical, upstream stages skipped
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark import datagen
from resolve_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def files_df(spark):
    df = datagen.with_record_id(datagen.synth_files(spark, n_base=800, dup_rate=0.25))
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def run(spark, files_df):
    pipe = P.ResolvePipeline(spark, P.files_pipeline_config())
    return pipe.run(files_df)


def test_duplicates_planted(files_df):
    n_total = files_df.count()
    n_var = files_df.where("is_variant").count()
    assert n_total > 800 and n_var > 100


def test_pairwise_f1_gate(spark, files_df, run):
    labeled = datagen.labeled_pairs(files_df)
    metrics = P.pairwise_f1(run.clusters, labeled, run.pairs)
    # the authoritative BASELINE.json target
    assert metrics["blocking_recall"] >= 0.99, metrics
    assert metrics["f1"] >= 0.99, metrics


def test_sha256_invariant(files_df, run):
    checked = P.assert_sha256_invariant(run, files_df, "record_id")
    assert checked == files_df.count()


def test_cluster_output_shape(run):
    row = run.clusters.limit(1).collect()[0]
    assert set(run.clusters.columns) == {"rid", "cluster_id", "cluster_size"}
    assert row["cluster_size"] >= 1
    assert run.stats is not None
    assert {"cluster_id", "size", "avg_score", "field", "mode_value",
            "agreement", "confidence"} <= set(run.stats.columns)


def test_edges_schema_and_threshold(run):
    # files-pipeline default threshold (0.87 since the round-4 fp-band
    # analysis; see files_pipeline_config docstring)
    assert run.edges.where(F.col("score") < 0.87).count() == 0
    cols = set(run.edges.columns)
    assert {"id_a", "id_b", "block_key", "field_scores", "weighted_score",
            "score", "matched_on"} <= cols


def test_checkpoint_resume(spark, files_df, tmp_path):
    ckdir = str(tmp_path / "ck")
    pipe = P.ResolvePipeline(spark, P.files_pipeline_config(), checkpoint_dir=ckdir)
    run1 = pipe.run(files_df, input_fp="fp-A")
    c1 = sorted((r["rid"], r["cluster_id"]) for r in run1.clusters.collect())
    assert run1.counters.get("pairs_generated", 0) > 0

    # rerun with same input fingerprint: every stage resumes from disk
    pipe2 = P.ResolvePipeline(spark, P.files_pipeline_config(), checkpoint_dir=ckdir)
    run2 = pipe2.run(files_df, input_fp="fp-A")
    c2 = sorted((r["rid"], r["cluster_id"]) for r in run2.clusters.collect())
    assert c1 == c2
    for stage in ("normalized", "blocked", "pairs", "edges", "clusters"):
        lin = pipe2.ckpt.lineage(stage)
        assert lin is not None and lin["rows_out"] > 0
        assert lin["partitions"], "per-partition lineage must be recorded"

    # changed input fingerprint invalidates and recomputes
    lin_before = pipe2.ckpt.lineage("normalized")["completed_at"]
    run3 = pipe2.run(files_df, input_fp="fp-B")
    lin_after = pipe2.ckpt.lineage("normalized")["completed_at"]
    assert lin_after > lin_before
    assert sorted((r["rid"], r["cluster_id"]) for r in run3.clusters.collect()) == c1


def test_entities_pipeline_reference_shape(spark):
    ents = datagen.entity_rows(spark)
    pipe = P.ResolvePipeline(spark, P.entities_pipeline_config())
    run = pipe.run(ents)
    clusters = {r["rid"]: r["cluster_id"] for r in run.clusters.collect()}
    # planted duplicate pair e-001/e-002 must co-cluster; others are singletons
    assert clusters["e-001"] == clusters["e-002"]
    others = [clusters[f"e-{i:03d}"] for i in range(3, 11)]
    assert len(set(others)) == 8
    assert clusters["e-003"] not in (clusters["e-001"],)


def test_checkpoint_crash_recovery(spark, files_df, tmp_path):
    """A stage without its _lineage.json sidecar (crash mid-write) must
    recompute, while completed upstream stages resume from disk."""
    import os
    ckdir = str(tmp_path / "crash")
    pipe = P.ResolvePipeline(spark, P.files_pipeline_config(), checkpoint_dir=ckdir)
    run1 = pipe.run(files_df, input_fp="fp-C")
    c1 = sorted((r["rid"], r["cluster_id"]) for r in run1.clusters.collect())
    norm_done = pipe.ckpt.lineage("normalized")["completed_at"]

    # simulate a crash during the edges stage: sidecar never landed
    os.remove(os.path.join(ckdir, "edges", "_lineage.json"))
    run2 = pipe.run(files_df, input_fp="fp-C")
    assert sorted((r["rid"], r["cluster_id"]) for r in run2.clusters.collect()) == c1
    # edges recomputed (fresh sidecar), normalized untouched (resumed)
    assert pipe.ckpt.lineage("edges")["completed_at"] > norm_done
    assert pipe.ckpt.lineage("normalized")["completed_at"] == norm_done


def test_entities_pipeline_f1_gate(spark):
    """Reference-domain (person/business) F1 gate: planted duplicate
    variants in the style of the reference's own fixture pair must
    co-cluster at pairwise F1 >= 0.99 under reference scoring
    semantics (canopy blocking name+zip, default field weights,
    vector blend)."""
    ents = datagen.synth_entities(spark, n_base=1500, dup_rate=0.25).persist()
    pipe = P.ResolvePipeline(spark, P.entities_pipeline_config())
    run = pipe.run(ents)
    labeled = datagen.labeled_entity_pairs(ents)
    m = P.pairwise_f1(run.clusters, labeled, run.pairs)
    assert m["blocking_recall"] >= 0.99, m
    assert m["f1"] >= 0.99, m


def test_pluggable_embedder_through_pipeline(spark):
    """E2 — a custom embed function injects through PipelineConfig and
    drives the vectors the pipeline scores with (embed.go:66-197 batch
    semantics: order-preserving sub-batches; wrong dim raises)."""
    import dataclasses

    import numpy as np

    from resolve_spark.functions.embedding import embedder_udf
    from pyspark.sql import functions as F

    calls = []

    def toy_embed(texts):
        calls.append(len(texts))
        return [
            np.full(16, (len(t) % 7) / 7.0, dtype=np.float32) for t in texts
        ]

    ents = datagen.entity_rows(spark)
    cfg = dataclasses.replace(P.entities_pipeline_config(), embed_fn=toy_embed)
    pipe = P.ResolvePipeline(spark, cfg)
    norm = pipe.normalized(ents)
    rows = norm.select("combined_text", "vector").collect()
    for r in rows:
        want = (len(r["combined_text"]) % 7) / 7.0
        assert r["vector"] is not None and abs(r["vector"][0] - want) < 1e-6
    # full run still converges with the injected embedder
    run = pipe.run(ents)
    clusters = {r["rid"]: r["cluster_id"] for r in run.clusters.collect()}
    assert clusters["e-001"] == clusters["e-002"]

    # dim mismatch is an error, not a silent pad
    bad = embedder_udf(lambda ts: [np.zeros(3, np.float32) for _ in ts], dim=16)
    df = spark.createDataFrame([("x",)], ["t"]).select(bad(F.col("t")).alias("v"))
    import pytest as _pytest
    with _pytest.raises(Exception, match="expected"):
        df.collect()


def test_length_ratio_gate_prunes_before_scoring(spark):
    """The files-config length-ratio gate (round-4) must drop grossly
    length-mismatched candidate pairs BEFORE any scoring kernel and
    keep near-equal-length pairs; gate=None scores everything."""
    from resolve_spark import datagen

    files = datagen.with_record_id(
        datagen.synth_files(spark, n_base=400, dup_rate=0.5)
    )
    import dataclasses

    gated_cfg = P.files_pipeline_config()
    assert gated_cfg.length_ratio_gate == 0.9
    run_gated = P.ResolvePipeline(spark, gated_cfg).run(files)
    open_cfg = dataclasses.replace(gated_cfg, length_ratio_gate=None)
    run_open = P.ResolvePipeline(spark, open_cfg).run(files)

    lens = files.selectExpr("record_id", "length(content) AS L")
    def ratios(run):
        return (
            run.edges.select("id_a", "id_b")
            .join(lens.selectExpr("record_id as id_a", "L as la"), "id_a")
            .join(lens.selectExpr("record_id as id_b", "L as lb"), "id_b")
            .selectExpr("least(la, lb) / greatest(la, lb) AS r")
        )
    assert ratios(run_gated).where("r < 0.9").count() == 0
    # the gate must not change the true-pair decisions: same F1 inputs
    labeled = datagen.labeled_pairs(files)
    mg = P.pairwise_f1(run_gated.clusters, labeled, run_gated.pairs)
    mo = P.pairwise_f1(run_open.clusters, labeled, run_open.pairs)
    assert mg["fn"] == mo["fn"] == 0
    assert mg["tp"] == mo["tp"]
    assert mg["fp"] <= mo["fp"]


def test_incremental_matches_full_recompute(spark, files_df, run):
    # deterministic ~70/30 split; variants land on either side, so the
    # increment both merges into old clusters and forms new ones
    side = F.abs(F.xxhash64(F.col("record_id").cast("string"))) % 10
    base = files_df.where(side < 7)
    inc = files_df.where(side >= 7)
    assert 0 < inc.count() < files_df.count()
    pipe = P.ResolvePipeline(spark, P.files_pipeline_config())
    prev = pipe.run(base)
    out = pipe.run_incremental(prev, inc)
    # exact cluster equality with the full-corpus run (no oversized
    # blocks at this size, so the budget caveat does not bite)
    full = {(r["rid"], r["cluster_id"], r["cluster_size"])
            for r in run.clusters.collect()}
    got = {(r["rid"], r["cluster_id"], r["cluster_size"])
           for r in out.clusters.collect()}
    assert got == full
    # edge sets agree too — old-old edges reused, increment edges fresh
    fe = {(r["id_a"], r["id_b"]) for r in run.edges.select("id_a", "id_b").collect()}
    ge = {(r["id_a"], r["id_b"]) for r in out.edges.select("id_a", "id_b").collect()}
    assert ge == fe
    # the increment scored strictly fewer pairs than the full run
    assert 0 < out.counters["pairs_scored"] < run.pairs.count()
    assert out.counters["new_records"] == inc.count()


def test_incremental_prev_blocked_shortcut(spark, files_df):
    side = F.abs(F.xxhash64(F.col("record_id").cast("string"))) % 10
    base, inc = files_df.where(side < 7), files_df.where(side >= 7)
    pipe = P.ResolvePipeline(spark, P.files_pipeline_config())
    prev = pipe.run(base)
    pb = pipe.blocked(prev.normalized).select("record_id", "block_keys")
    a = pipe.run_incremental(prev, inc)
    b = pipe.run_incremental(prev, inc, prev_blocked=pb)
    assert a.clusters.subtract(b.clusters).count() == 0
    assert b.clusters.subtract(a.clusters).count() == 0
    # releasing a superseded run drops every cached block it pinned
    # (long-lived increment loops would otherwise accumulate them)
    a.unpersist()
    for df in (a.pairs, a.edges, a.clusters):
        assert not df.storageLevel.useMemory
    # the internal pins (the increment's cached new_norm) release too —
    # the leak unpersist() exists to prevent
    assert a.pinned
    for df in a.pinned:
        assert not df.storageLevel.useMemory
    # the survivor is untouched and still queryable
    assert b.clusters.count() > 0
