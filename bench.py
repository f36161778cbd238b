"""Benchmark harness.

Default mode (driver contract): runs the headline queries + the ER
pipeline at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode: runs the pairwise-scoring workload (the BASELINE
metric: candidate-pairs-scored/sec) in fresh JVMs at local[2]/[8]/[32]
on identical input with constant partitioning and reports throughput
plus N->4N scaling efficiency (sandbox stand-in for executor scaling,
per BASELINE.md / BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


SF_DIR_DEFAULT = "/root/testdata/sf0.1"
BENCH_QUERIES = [
    "q01_normalize_text",
    "q04_levenshtein_pairs",
    "q05_jaccard_pairs",
    "q10_topk_per_group",
    "q12_connected_components",
    "q13_embedding_topk",
    "q18_token_signature",
    "q19_minhash_bands",
    "q20_name_similarity",
    "q40_windowed_events",
    "q42_user_sessions",
    "q43_decontamination",
    "q46_address_similarity",
    "q50_vector_blend",
    "q45_quota_sample",
    "q56_gopher_quality",
    "q58_chunk_documents",
    "q60_repeated_ngrams",
    "q65_minhash_join",
    "q66_source_overlap",
    "q67_tfidf_dedup_pairs",
    "q68_semantic_decontamination",
    "q69_bm25_topk",
    "q72_phonetic_blocking",
    "q73_bpe_merges",
    "q74_containment_pairs",
    "q77_semantic_dedup",
    "q81_fs_params",
    "q82_cluster_metrics",
    "q83_tf_weights",
    "q84_fs_posterior",
    "q85_fs_levels",
    "q86_fuse_clusters",
    "q87_bridge_prune",
    "q88_monge_elkan",
    "q89_bcubed",
    "q90_uncertainty_sample",
    "q91_meta_blocking",
    "q93_numeric_temporal",
    "q94_pprl_clk",
    "q95_match_tiers",
    "q96_link_features",
    "q97_blocking_sweep",
    "q98_cluster_stability",
    "q99_fusion_conflicts",
    "q100_budget_ledger",
    "q101_wjaccard_icws",
    "q102_mutual_best",
    "q103_greedy_linkage",
    "q104_wjaccard_join",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def run_pipeline_bench(spark, sf: float, n_base: int | None = None) -> dict:
    """End-to-end ER pipeline on the deterministic synthetic files table,
    sized with sf (or an explicit record count). Reports
    candidate-pairs-scored/sec (BASELINE metric)."""
    import tempfile

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P

    if n_base is None:
        n_base = max(2000, int(200_000 * sf))
    files = datagen.with_record_id(datagen.synth_files(spark, n_base=n_base, dup_rate=0.2))
    files.persist()
    n_records = files.count()

    pipe = P.ResolvePipeline(
        spark, P.files_pipeline_config(), checkpoint_dir=tempfile.mkdtemp()
    )
    t0 = time.time()
    run = pipe.run(files)
    n_clusters = run.clusters.where("cluster_size > 1").count()
    wall = time.time() - t0
    n_pairs = run.counters.get("pairs_generated", 0)
    files.unpersist()
    return {
        "records": n_records,
        "pairs_scored": n_pairs,
        "clusters_nontrivial": n_clusters,
        "pipeline_sec": round(wall, 3),
        "pairs_scored_per_sec": round(n_pairs / wall, 1) if wall else 0.0,
    }


def run_queries_bench(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def main_bench(cpus: int, sf_dir: str, pipeline_only: bool,
               n_base: int | None = None) -> dict:
    from resolve_spark.session import build_session

    spark = build_session(
        app_name=f"resolve_bench_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    sf = sf_of(sf_dir)
    t0 = time.time()
    pipe_stats = run_pipeline_bench(spark, sf, n_base=n_base)
    queries = {} if pipeline_only else run_queries_bench(spark, sf_dir)
    total = time.time() - t0
    result = {
        "metric": "e2e_bench_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"pipeline": pipe_stats["pipeline_sec"], **queries},
        "sf": sf,
        "cpus": cpus,
        **pipe_stats,
    }
    spark.stop()
    return result


def _build_wide_workload(spark, n_base: int):
    """The deterministic scoring workload: candidate pairs with both
    sides' field columns attached (the exact input of the scoring
    stage), 64 partitions."""
    from pyspark.sql import functions as F

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P
    from resolve_spark.operators.scoring import attach_pair_sides

    files = datagen.with_record_id(datagen.synth_files(spark, n_base=n_base, dup_rate=0.2))
    cfg = P.files_pipeline_config()
    pipe = P.ResolvePipeline(spark, cfg)
    ents = pipe.normalized(files).persist()
    a = ents.select(F.col("record_id").alias("id_a"), F.col("uid").alias("ua"))
    b = ents.select(F.col("record_id").alias("id_b"), F.col("uid").alias("ub"))
    pairs = (
        a.join(b, (F.col("ub") > F.col("ua")) & (F.col("ub") - F.col("ua") <= 25))
        .select("id_a", "id_b")
        .repartition(64)
        .persist()
    )
    wide = attach_pair_sides(pairs, ents, "record_id",
                             [s.column for s in cfg.specs])
    return wide, pairs, cfg


def prep_score_workload(path: str, n_base: int = 150_000) -> dict:
    """Materialize the scoring workload to parquet ONCE at full
    parallelism, so each pinned scaling leg reads it instead of paying
    the datagen + normalize + pair-join setup at leg parallelism
    (~20 min at 2 pinned cores). 64 equal parquet files; the legs scan
    them with identical splits regardless of task-slot count."""
    from resolve_spark.session import build_session

    spark = build_session(app_name="resolve_scoreprep", shuffle_partitions=64)
    wide, pairs, _cfg = _build_wide_workload(spark, n_base)
    wide.write.mode("overwrite").parquet(path)
    n = pairs.count()
    spark.stop()
    return {"path": path, "pairs": n}


def run_score_bench(cpus: int, n_base: int = 50_000, pin: bool = False,
                    wide_path: str | None = None) -> dict:
    """Pairwise-scoring throughput (the BASELINE metric:
    candidate-pairs-scored/sec) on a fixed deterministic workload with
    the full kernel stack (no prefilter).

    With ``wide_path`` the pre-staged workload parquet is scanned (file
    splits are a pure function of the file listing, so the timed job's
    partitioning is identical at every parallelism level); otherwise the
    workload is derived in-session at leg parallelism."""
    from pyspark.sql import functions as F

    from resolve_spark.plans import pipeline as P
    from resolve_spark.operators.scoring import score_pairs
    from resolve_spark.session import build_session

    # partitioning is held CONSTANT across parallelism levels — only the
    # number of task slots varies, as executor count would on a cluster
    spark = build_session(
        app_name=f"resolve_scorebench_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            # one scan split per staged file (64 x ~equal) — holds the
            # timed job's partitioning constant across legs
            "spark.sql.files.maxPartitionBytes": "33554432",
            "spark.sql.files.openCostInBytes": "33554432",
        },
    )
    if wide_path:
        cfg = P.files_pipeline_config()
        wide = spark.read.parquet(wide_path)
        n = wide.count()  # parquet metadata count: cheap, warms the listing
    else:
        wide, pairs, cfg = _build_wide_workload(spark, n_base)
        n = pairs.count()
    # wide is consumed exactly once per action: persisting it (GBs of
    # token arrays) just causes storage-eviction skew at low parallelism.
    # warm the python workers so startup isn't in the measurement
    score_pairs(wide.limit(1000), list(cfg.specs), threshold=None, prefilter=False).count()
    t0 = time.time()
    scored = score_pairs(wide, list(cfg.specs), threshold=None, prefilter=False)
    scored.agg(F.sum((F.col("score") >= 0.85).cast("long"))).collect()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "pairs": n, "score_sec": round(wall, 2),
            "pairs_scored_per_sec": round(n / wall, 1)}


def main_scaling(sf_dir: str, n_base: int | None = None,
                 samples: int = 3) -> dict:
    """Pinned strong-scaling evidence (north rule N->4N): the scoring
    job at 2 vs 8 DEDICATED cores (taskset), fresh JVM each, constant
    partitioning (64), tmpfs shuffle scratch.

    Pinning matters: since the round-2 vectorization the job is no
    longer python-compute-bound, so an unpinned local[2] JVM leaks
    shuffle/codegen/GC work onto the box's 30 idle cores and inflates
    the N-level baseline — taskset makes "N task slots" mean N cores,
    which is what an N-executor cluster gives you. local[32] (whole box,
    unpinned) is reported for context; at 32 slots every pandas-UDF task
    needs a JVM thread AND a python worker, which oversubscribes a
    single box in a way a multi-executor cluster does not.

    Sampling: the box throttle-degrades under sustained load (measured
    4x on the last leg of a back-to-back composite run), so legs are
    INTERLEAVED round-robin (2, 8, 32, 2, 8, 32, ...) for ``samples``
    rounds and each leg reports its MEDIAN — drift hits every leg
    equally instead of whichever ran last, and the committed artifact
    matches what standalone legs measure.
    """
    import shutil as _shutil
    import statistics

    # sized so fixed stage costs are noise: at 150k records (3.9M pairs)
    # the 8-core leg is tail-bound (64 tasks / 8 slots) and measures
    # 0.77-0.79; at 300k (7.9M pairs) the same job measures 0.89-0.93
    n_base = n_base or 300_000
    have_taskset = _shutil.which("taskset") is not None
    import tempfile

    # stage the workload ONCE at full parallelism; every leg then scans
    # the same 64 parquet files (identical splits at any slot count)
    import shutil

    tmp_root = tempfile.mkdtemp(prefix="scorewide_")
    wide_dir = os.path.join(tmp_root, "wide")
    legs = ((2, "0,1"), (8, "0-7"), (32, None))
    runs: dict[int, list[dict]] = {c: [] for c, _ in legs}
    try:
        prep = prep_score_workload(wide_dir, n_base=n_base)
        for _round in range(samples):
            for cpus, cores in legs:
                cmd = [sys.executable, __file__, "--score-bench",
                       "--cpus", str(cpus), "--wide", wide_dir]
                if cores is not None and have_taskset:
                    cmd = ["taskset", "-c", cores] + cmd
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      check=True)
                runs[cpus].append(json.loads(proc.stdout.strip().splitlines()[-1]))
        assert all(r["pairs"] == prep["pairs"]
                   for rs in runs.values() for r in rs), runs
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)  # multi-GB staging dir
    med = {c: statistics.median(r["score_sec"] for r in rs)
           for c, rs in runs.items()}
    eff_2_8 = (med[2] / med[8]) / 4.0
    eff_8_32 = (med[8] / med[32]) / 4.0
    return {
        "metric": "scaling_efficiency_2_to_8",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "pinned": have_taskset,
        "records": n_base,
        "samples": samples,
        "sampling": "interleaved round-robin legs, median per leg",
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "pairs": prep["pairs"],
        "throughput": {
            str(c): round(prep["pairs"] / med[c], 1) for c in med
        },
        "score_sec": {str(c): round(med[c], 2) for c in med},
        "score_sec_samples": {
            str(c): [r["score_sec"] for r in rs] for c, rs in runs.items()
        },
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--score-bench", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--records", type=int, default=None,
                    help="explicit base-record count for the pipeline bench "
                         "(e.g. 770000 for the ~1M-record run)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT))
    ap.add_argument("--wide", default=None,
                    help="pre-staged scoring-workload parquet (see --prep-score)")
    ap.add_argument("--prep-score", default=None, metavar="PATH",
                    help="materialize the scoring workload parquet to PATH and exit")
    ap.add_argument("--samples", type=int, default=3,
                    help="interleaved rounds per scaling leg (median reported)")
    args = ap.parse_args()
    if args.prep_score:
        out = prep_score_workload(args.prep_score, n_base=args.records or 150_000)
    elif args.scaling:
        out = main_scaling(args.sf_dir, n_base=args.records,
                           samples=args.samples)
    elif args.score_bench:
        out = run_score_bench(args.cpus, n_base=args.records or 50_000,
                              wide_path=args.wide)
    else:
        out = main_bench(args.cpus, args.sf_dir, args.pipeline_only,
                         n_base=args.records)
    print(json.dumps(out))
