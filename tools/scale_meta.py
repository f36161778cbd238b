"""Pinned strong-scaling probe for the meta-blocking operator family
(north-rule methodology, same as bench.py --scaling): stage a
replicated (id, block_keys) workload ONCE at full parallelism, then
run meta_block_prune at taskset-pinned 2 vs 8 dedicated cores with
constant partitioning (64 staged files), interleaved round-robin
samples, median per leg, efficiency = (t2/t8)/4.

Replication salts every key with the replica number, so each replica
reproduces the SAME blocking-graph structure over a disjoint key
space — total work scales linearly in K and no cross-replica edges
exist.

Usage: python tools/scale_meta.py [--sf-dir D] [--k 8] [--samples 3]
       python tools/scale_meta.py --leg --cpus N --path P   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

MAX_BLOCK = 600  # keeps nation+bucket blocks, purges segment (sf0.1 %4 sizes)


def stage(sf_dir: str, k: int, path: str) -> int:
    from resolve_spark.session import build_session

    spark = build_session(app_name="scale_meta_stage", shuffle_partitions=64)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 4 == 0
    )
    reps = spark.range(k).select(F.col("id").alias("rep"))
    r = F.col("rep").cast("string")
    recs = c.crossJoin(reps).select(
        (F.col("c_custkey") * k + F.col("rep")).alias("id"),
        F.array(
            F.concat(F.lit("n:"), r, F.lit(":"), F.col("c_nationkey").cast("string")),
            F.concat(F.lit("s:"), r, F.lit(":"), F.col("c_mktsegment")),
            F.concat(
                F.lit("b:"), r, F.lit(":"),
                F.floor(F.col("c_acctbal") / 1000).cast("string"),
            ),
        ).alias("block_keys"),
    )
    recs.repartition(64).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def leg(cpus: int, path: str) -> None:
    from resolve_spark.operators.meta_blocking import meta_block_prune
    from resolve_spark.session import build_session

    spark = build_session(
        app_name=f"scale_meta_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.files.openCostInBytes": "4194304",
            # constant partitioning across legs (bench.py --scaling
            # methodology): AQE coalescing would shrink the small
            # shuffles below 8-way parallelism and charge the loss to
            # the 8-core leg
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    recs = spark.read.parquet(path)
    recs.limit(100).count()  # warm the scan
    t0 = time.monotonic()
    kept = meta_block_prune(
        recs, "id", weight="cbs", scheme="wnp", max_block_size=MAX_BLOCK
    ).count()
    wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"cpus": cpus, "wall_s": round(wall, 2), "kept": kept}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--leg", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--path")
    args = ap.parse_args()
    if args.leg:
        leg(args.cpus, args.path)
        return

    have_taskset = shutil.which("taskset") is not None
    tmp = tempfile.mkdtemp(prefix="scale_meta_")
    path = os.path.join(tmp, "recs")
    legs = ((2, "0,1"), (8, "0-7"))
    runs: dict[int, list[dict]] = {c: [] for c, _ in legs}
    try:
        n = stage(args.sf_dir, args.k, path)
        for _ in range(args.samples):
            for cpus, cores in legs:
                cmd = [sys.executable, __file__, "--leg",
                       "--cpus", str(cpus), "--path", path]
                if cores and have_taskset:
                    cmd = ["taskset", "-c", cores] + cmd
                p = subprocess.run(cmd, capture_output=True, text=True, check=True)
                runs[cpus].append(json.loads(p.stdout.strip().splitlines()[-1]))
        kept = {r["kept"] for rs in runs.values() for r in rs}
        assert len(kept) == 1, kept  # identical output at every parallelism
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    med = {c: statistics.median(r["wall_s"] for r in rs) for c, rs in runs.items()}
    print(json.dumps({
        "metric": "meta_blocking_scaling_efficiency_2_to_8",
        "value": round((med[2] / med[8]) / 4.0, 3),
        "records": n,
        "kept_edges": kept.pop(),
        "pinned": have_taskset,
        "samples": args.samples,
        "wall_s": {str(c): med[c] for c in med},
        "wall_s_samples": {str(c): [r["wall_s"] for r in rs] for c, rs in runs.items()},
    }))


if __name__ == "__main__":
    main()
