"""Data-scale evidence run: the full ER pipeline + the BASELINE.json F1
gate at an arbitrary record count (the BENCH.md scale-growth table rows).

Runs exactly what tests/test_pipeline.py::test_pairwise_f1_gate runs —
datagen.synth_files -> ResolvePipeline.run -> pairwise_f1 over labeled
pairs at the shared blocking key — just bigger, and prints one JSON line.

Usage: python tools/scale_f1.py [--records N] [--cpus C]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=4_000_000,
                    help="n_base for datagen.synth_files (output is ~n_base incl. duplicates)")
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--skip-f1", action="store_true",
                    help="time the pipeline only (no F1/invariant evaluation)")
    ap.add_argument("--fp-analysis", action="store_true",
                    help="band false-edge scores vs the true-edge margin "
                         "(diagnoses whether fp growth is threshold-"
                         "adjacent and a bump would trade no recall)")
    ap.add_argument("--materialize-input", action="store_true",
                    help="write the synthetic input to a temp parquet dir "
                         "and read it back instead of persist()-ing it in "
                         "the driver JVM. REQUIRED above ~12M rows on this "
                         "box: the in-heap block cache for the input alone "
                         "is tens of GB and the single local-mode JVM gets "
                         "OOM-killed (measured: 16M base / 20.8M rows died "
                         "at both 96g and 72g heaps). Also the honest "
                         "shape — real input arrives from storage.")
    args = ap.parse_args()

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P
    from resolve_spark.session import build_session

    # big notches: shuffle scratch on DISK, not the session default
    # /dev/shm — tmpfs spill is RAM, and at >= ~10M rows it competes
    # with the driver JVM for physical memory (measured: the 20.8M-row
    # notch OOM-killed the JVM twice with tmpfs scratch at 96g and 72g
    # heaps). The tmpfs default stays right for bench.py-scale runs
    # where spill is a tiny fraction of RAM.
    local_dir = None
    if args.records >= 4_000_000 and "SPARK_GRAFT_LOCAL_DIR" not in os.environ:
        local_dir = tempfile.mkdtemp(prefix="scale_local_")
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = local_dir

    spark = build_session(
        app_name=f"resolve_scale_{args.records}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 32),
    )
    files = datagen.with_record_id(
        datagen.synth_files(spark, n_base=args.records, dup_rate=0.2)
    )
    input_dir = None
    if args.materialize_input:
        input_dir = tempfile.mkdtemp(prefix="scale_in_")
        files.write.mode("overwrite").parquet(input_dir)
        files = spark.read.parquet(input_dir)
    else:
        files = files.persist()
    n_records = files.count()

    ckdir = tempfile.mkdtemp(prefix="scale_ck_")
    pipe = P.ResolvePipeline(
        spark, P.files_pipeline_config(), checkpoint_dir=ckdir
    )
    t0 = time.time()
    run = pipe.run(files)
    run.clusters.where("cluster_size > 1").count()
    wall = time.time() - t0

    out = {
        "metric": "scale_pipeline",
        "records": n_records,
        "pipeline_sec": round(wall, 1),
        "pairs_scored": run.counters.get("pairs_generated", 0),
        "cpus": args.cpus,
    }
    if not args.skip_f1:
        labeled = datagen.labeled_pairs(files)
        m = P.pairwise_f1(run.clusters, labeled, run.pairs)
        out.update(
            f1=round(m["f1"], 6), precision=round(m["precision"], 6),
            recall=round(m["recall"], 6), tp=m["tp"], fp=m["fp"], fn=m["fn"],
            blocking_recall=round(m["blocking_recall"], 6),
        )
        checked = P.assert_sha256_invariant(run, files, "record_id")
        out["sha256_rows_checked"] = checked
        if args.fp_analysis:
            from pyspark.sql import functions as F
            edges = run.edges.select("id_a", "id_b", "score")
            truth = labeled.where("is_match").select("id_a", "id_b")
            false_e = edges.join(truth, ["id_a", "id_b"], "left_anti")
            true_e = edges.join(truth, ["id_a", "id_b"], "left_semi")
            band = (
                F.when(F.col("score") < 0.87, "0.85-0.87")
                .when(F.col("score") < 0.90, "0.87-0.90")
                .when(F.col("score") < 0.95, "0.90-0.95")
                .otherwise("0.95+")
            )
            out["false_edge_bands"] = {
                r["b"]: r["count"]
                for r in false_e.groupBy(band.alias("b")).count().collect()
            }
            q = true_e.agg(
                F.min("score").alias("mn"),
                F.expr("percentile_approx(score, 0.001)").alias("p001"),
                F.expr("percentile_approx(score, 0.01)").alias("p01"),
            ).first()
            out["true_edge_min"] = round(q["mn"], 6) if q["mn"] is not None else None
            out["true_edge_p001"] = round(q["p001"], 6) if q["p001"] is not None else None
            out["true_edge_p01"] = round(q["p01"], 6) if q["p01"] is not None else None
    print(json.dumps(out))
    spark.stop()
    # a 10M-record run leaves a ~16 GB stage-checkpoint tree; repeated
    # notches filled the box once — always reclaim it
    import shutil
    shutil.rmtree(ckdir, ignore_errors=True)
    if input_dir:
        shutil.rmtree(input_dir, ignore_errors=True)
    if local_dir:
        shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
