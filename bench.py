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
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def run_pipeline_bench(spark, sf: float) -> dict:
    """End-to-end ER pipeline on the deterministic synthetic files table,
    sized with sf. Reports candidate-pairs-scored/sec (BASELINE metric)."""
    import tempfile

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P

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


def main_bench(cpus: int, sf_dir: str, pipeline_only: bool) -> dict:
    from resolve_spark.session import build_session

    spark = build_session(
        app_name=f"resolve_bench_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    sf = sf_of(sf_dir)
    t0 = time.time()
    pipe_stats = run_pipeline_bench(spark, sf)
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


def run_score_bench(cpus: int) -> dict:
    """Pairwise-scoring throughput (the BASELINE metric:
    candidate-pairs-scored/sec) on a fixed deterministic 1.31M-pair
    workload with the full kernel stack (no prefilter)."""
    from pyspark.sql import functions as F

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P
    from resolve_spark.operators.scoring import attach_pair_sides, score_pairs
    from resolve_spark.session import build_session

    # partitioning is held CONSTANT across parallelism levels — only the
    # number of task slots varies, as executor count would on a cluster
    spark = build_session(
        app_name=f"resolve_scorebench_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
    )
    files = datagen.with_record_id(datagen.synth_files(spark, n_base=50_000, dup_rate=0.2))
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
    n = pairs.count()
    # wide is consumed exactly once per action: persisting it (GBs of
    # token arrays) just causes storage-eviction skew at low parallelism
    wide = attach_pair_sides(pairs, ents, "record_id",
                             [s.column for s in cfg.specs])
    # warm the python workers so startup isn't in the measurement
    score_pairs(wide.limit(1000), list(cfg.specs), threshold=None, prefilter=False).count()
    t0 = time.time()
    scored = score_pairs(wide, list(cfg.specs), threshold=None, prefilter=False)
    scored.agg(F.sum((F.col("score") >= 0.85).cast("long"))).collect()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "pairs": n, "score_sec": round(wall, 2),
            "pairs_scored_per_sec": round(n / wall, 1)}


def main_scaling(sf_dir: str) -> dict:
    """Scoring throughput at local[2] / local[8] / local[32]; fresh JVM
    each. The 2->8 pair is the clean N->4N evidence (each task slot gets
    dedicated hardware); 8->32 oversubscribes this 32-logical-core box
    (every pandas-UDF task needs a JVM thread AND a python worker), which
    a real multi-executor cluster does not."""
    results = {}
    for cpus in (2, 8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--score-bench", "--cpus", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    eff_2_8 = (results[2]["score_sec"] / results[8]["score_sec"]) / 4.0
    eff_8_32 = (results[8]["score_sec"] / results[32]["score_sec"]) / 4.0
    return {
        "metric": "scaling_efficiency_2_to_8",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "pairs": results[2]["pairs"],
        "throughput": {str(c): results[c]["pairs_scored_per_sec"] for c in results},
        "score_sec": {str(c): results[c]["score_sec"] for c in results},
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--score-bench", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT))
    args = ap.parse_args()
    if args.scaling:
        out = main_scaling(args.sf_dir)
    elif args.score_bench:
        out = run_score_bench(args.cpus)
    else:
        out = main_bench(args.cpus, args.sf_dir, args.pipeline_only)
    print(json.dumps(out))
