"""spark-submit entry point for the full ER pipeline (north rule: the
job is submitted via `spark-submit --py-files resolve_spark.zip`).

Unlike `python -m resolve_spark`, this script builds NO session config
of its own beyond app defaults — master / executor count / memory all
come from spark-submit, exactly as on a real cluster:

    spark-submit --master local[8] \
        --py-files dist/resolve_spark.zip tools/submit_pipeline.py \
        --records 20000 --evaluate

    spark-submit --master yarn --num-executors 200 \
        --py-files dist/resolve_spark.zip tools/submit_pipeline.py \
        --input hdfs://.../files.parquet --out hdfs://.../clusters

Prints one JSON line with counters (and F1/sha256 gate results when
--evaluate is set on synthetic input).

Checkpointing: when --checkpoint is omitted the pipeline runs
UNCHECKPOINTED (single-pass, no resume) — the only mode that is correct
on every master. A --checkpoint value must name a filesystem SHARED by
the driver and all executors (NFS, or a local path under local[*]):
stage parquet is written by executors but read back — and its lineage
sidecar maintained — by driver-local file I/O (CheckpointManager), so a
driver-only temp dir under --deploy-mode cluster would silently lose
executor-written stage data. hdfs:// / s3:// URIs are rejected for the
same reason.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

# resolve_spark resolves from the --py-files zip on executors AND the
# driver; no repo checkout is assumed.
from resolve_spark import datagen
from resolve_spark.plans import pipeline as P


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet of (repo,path,commit,lang,content) rows")
    ap.add_argument("--records", type=int, default=5000,
                    help="synthesize this many records when --input is absent")
    ap.add_argument("--out", help="write clusters parquet here")
    ap.add_argument("--checkpoint",
                    help="resumable stage-checkpoint dir; MUST be a "
                         "driver+executor-shared filesystem path (see "
                         "module docstring). Omitted -> no checkpointing.")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--evaluate", action="store_true",
                    help="score pairwise F1 + sha256 invariant (synthetic input only)")
    args = ap.parse_args()
    if args.evaluate and args.input:
        # reject BEFORE any Spark work: discovering this after a
        # multi-hour cluster run would waste the whole job
        raise SystemExit("--evaluate needs the synthetic ground truth "
                         "(omit --input)")
    if args.checkpoint and "://" in args.checkpoint and not (
        args.checkpoint.startswith("file://")
    ):
        # CheckpointManager does driver-local open()/os.walk for lineage
        # and read-back; an object-store URI would checkpoint nothing
        raise SystemExit(
            "--checkpoint must be a driver+executor-shared FILESYSTEM "
            f"path, not {args.checkpoint.split('://', 1)[0]}:// "
            "(run uncheckpointed or mount a shared fs)"
        )

    spark = (
        SparkSession.builder.appName("resolve_submit")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    if args.input:
        files = datagen.with_record_id(spark.read.parquet(args.input))
    else:
        files = datagen.with_record_id(
            datagen.synth_files(spark, n_base=args.records, dup_rate=0.2)
        )
    files.persist()
    n = files.count()

    cfg = (P.files_pipeline_config(args.threshold) if args.threshold is not None
           else P.files_pipeline_config())
    # default: UNCHECKPOINTED — a driver-local mkdtemp would lose
    # executor-written stage data under --deploy-mode cluster
    pipe = P.ResolvePipeline(spark, cfg, checkpoint_dir=args.checkpoint or None)
    t0 = time.time()
    run = pipe.run(files)
    if args.out:
        run.clusters.write.mode("overwrite").parquet(args.out)
    n_clusters = run.clusters.where("cluster_size > 1").count()
    out = {
        "records": n,
        "clusters_nontrivial": n_clusters,
        "pairs_scored": run.counters.get("pairs_generated", 0),
        "wall_sec": round(time.time() - t0, 2),
        "master": spark.sparkContext.master,
    }
    if args.evaluate:
        m = P.pairwise_f1(run.clusters, datagen.labeled_pairs(files), run.pairs)
        out.update(f1=round(m["f1"], 6), blocking_recall=round(m["blocking_recall"], 6))
        out["sha256_rows_checked"] = P.assert_sha256_invariant(run, files, "record_id")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
