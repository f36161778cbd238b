"""Pinned strong-scaling probe for the round-6 operators
(north-rule methodology — same as bench.py --scaling and
tools/scale_meta.py): taskset-pinned 2 vs 8 dedicated cores, constant
partitioning, interleaved samples, median per leg,
efficiency = (t2/t8)/4.

Two probes:

- **greedy**: greedy_one_to_one over a K-replicated brand-blocked
  Levenshtein pair workload. Replication offsets ids per replica, so
  each replica reproduces the SAME matching structure over disjoint
  ids — total work scales linearly in K and the fixpoint round count
  stays that of the base graph (the interesting scaling question for
  an iterative driver-loop operator: do the shrinking tail rounds eat
  the parallel speedup?).
- **icws**: the ICWS weighted-MinHash sketch stage (band-key explode +
  count) over K-replicated documents — expected near-linear, it is
  pure Arrow-batched map work.

Usage: python tools/scale_assign.py [--sf-dir D] [--k 48] [--samples 3]
       python tools/scale_assign.py --leg greedy --cpus N --path P  (internal)
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


def stage(sf_dir: str, k: int, pairs_path: str, docs_path: str) -> dict:
    import __spark_entry__ as entrymod
    from resolve_spark.session import build_session

    spark = build_session(app_name="scale_assign_stage", shuffle_partitions=64)
    # the CANONICAL q04 workload (the q102/q103 input), not a copy — if
    # the entry workload changes, the probe keeps measuring it
    base = entrymod._q04_levenshtein_pairs(spark, sf_dir).withColumnRenamed(
        "lev_sim", "score"
    )
    reps = spark.range(k).select(F.col("id").alias("rep"))
    off = F.col("rep") * F.lit(1_000_000_000)
    pairs = base.crossJoin(reps).select(
        (F.col("id_a") + off).alias("id_a"),
        (F.col("id_b") + off).alias("id_b"),
        "score",
    )
    pairs.repartition(64).write.mode("overwrite").parquet(pairs_path)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = d.crossJoin(reps).select(
        (F.col("doc_id") + off).alias("doc_id"), "text"
    )
    docs.repartition(64).write.mode("overwrite").parquet(docs_path)
    out = {
        "pairs": spark.read.parquet(pairs_path).count(),
        "docs": spark.read.parquet(docs_path).count(),
    }
    spark.stop()
    return out


def _leg_session(cpus: int):
    from resolve_spark.session import build_session

    return build_session(
        app_name=f"scale_assign_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.files.openCostInBytes": "4194304",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )


def leg_greedy(cpus: int, path: str) -> None:
    from resolve_spark.operators.assignment import greedy_one_to_one

    spark = _leg_session(cpus)
    pairs = spark.read.parquet(path)
    pairs.limit(100).count()
    t0 = time.monotonic()
    n = greedy_one_to_one(pairs).count()
    wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"cpus": cpus, "wall_s": round(wall, 2), "out": n}))


def leg_icws(cpus: int, path: str) -> None:
    from resolve_spark.functions import similarity as S
    from resolve_spark.functions.icws import icws_band_keys_udf

    spark = _leg_session(cpus)
    d = spark.read.parquet(path)
    d.limit(100).count()
    t0 = time.monotonic()
    toks = d.select(
        "doc_id", S.tokens(F.col("text")).alias("t")
    ).select(
        "doc_id",
        F.transform("t", lambda x: F.lit(1).cast("long")).alias("w"),
        "t",
    )
    wk = icws_band_keys_udf(64, 32)
    n = toks.select(F.explode(wk(F.col("t"), F.col("w"))).alias("bk")).count()
    wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"cpus": cpus, "wall_s": round(wall, 2), "out": n}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=48)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--leg", choices=["greedy", "icws"])
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--path")
    args = ap.parse_args()
    if args.leg:
        (leg_greedy if args.leg == "greedy" else leg_icws)(args.cpus, args.path)
        return

    have_taskset = shutil.which("taskset") is not None
    tmp = tempfile.mkdtemp(prefix="scale_assign_")
    pairs_path = os.path.join(tmp, "pairs")
    docs_path = os.path.join(tmp, "docs")
    legs = ((2, "0,1"), (8, "0-7"))
    results = {}
    try:
        staged = stage(args.sf_dir, args.k, pairs_path, docs_path)
        for probe, path in (("greedy", pairs_path), ("icws", docs_path)):
            runs: dict[int, list[dict]] = {c: [] for c, _ in legs}
            for _ in range(args.samples):
                for cpus, cores in legs:
                    cmd = [sys.executable, __file__, "--leg", probe,
                           "--cpus", str(cpus), "--path", path]
                    if cores and have_taskset:
                        cmd = ["taskset", "-c", cores] + cmd
                    p = subprocess.run(cmd, capture_output=True, text=True,
                                       check=True)
                    runs[cpus].append(
                        json.loads(p.stdout.strip().splitlines()[-1])
                    )
            outs = {r["out"] for rs in runs.values() for r in rs}
            assert len(outs) == 1, (probe, outs)  # identical at every leg
            med = {
                c: statistics.median(r["wall_s"] for r in rs)
                for c, rs in runs.items()
            }
            results[probe] = {
                "efficiency_2_to_8": round((med[2] / med[8]) / 4.0, 3),
                "out_rows": outs.pop(),
                "wall_s": {str(c): med[c] for c in med},
                "wall_s_samples": {
                    str(c): [r["wall_s"] for r in rs] for c, rs in runs.items()
                },
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "round6_ops_scaling_2_to_8",
        "pinned": have_taskset,
        "samples": args.samples,
        "staged": staged,
        **results,
    }))


if __name__ == "__main__":
    main()
