"""Incremental-pipeline benchmark: wall of merging a small batch into a
resolved corpus vs re-resolving the full corpus from scratch.

Prints one JSON line:
  {"records": N, "inc_records": m, "wall_full_s": ..., "wall_base_s": ...,
   "wall_inc_s": ..., "inc_speedup_vs_full": ..., "clusters_equal": true}

`clusters_equal` asserts the incremental result is IDENTICAL to the
full recompute (exact while no touched block key is oversized — see
ResolvePipeline.run_incremental).

Usage: python tools/bench_incremental.py [--records 300000]
       [--inc-frac 0.1] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=300_000)
    ap.add_argument("--inc-frac", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from resolve_spark import datagen
    from resolve_spark.plans import pipeline as P
    from resolve_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]",
                          app_name="bench_incremental")
    n_base = int(args.records / 1.25)  # dup_rate 0.25 -> ~records total
    allrows = datagen.with_record_id(
        datagen.synth_files(spark, n_base=n_base, dup_rate=0.25)
    ).persist()
    n_all = allrows.count()
    cut = int(100 * (1 - args.inc_frac))
    side = F.abs(F.xxhash64(F.col("record_id").cast("string"))) % 100
    base = allrows.where(side < cut).persist()
    inc = allrows.where(side >= cut).persist()
    n_inc = inc.count()
    base.count()

    pipe = P.ResolvePipeline(spark, P.files_pipeline_config())

    t0 = time.monotonic()
    full = pipe.run(allrows)
    n_cl_full = full.clusters.count()
    wall_full = time.monotonic() - t0

    t0 = time.monotonic()
    prev = pipe.run(base)
    prev.clusters.count()
    wall_base = time.monotonic() - t0

    t0 = time.monotonic()
    out = pipe.run_incremental(prev, inc)
    n_cl_inc = out.clusters.count()
    wall_inc = time.monotonic() - t0

    equal = (
        n_cl_full == n_cl_inc
        and out.clusters.subtract(full.clusters).count() == 0
        and full.clusters.subtract(out.clusters).count() == 0
    )
    print(json.dumps({
        "records": n_all,
        "inc_records": n_inc,
        "cpus": args.cpus,
        "wall_full_s": round(wall_full, 1),
        "wall_base_s": round(wall_base, 1),
        "wall_inc_s": round(wall_inc, 1),
        "inc_speedup_vs_full": round(wall_full / wall_inc, 2),
        "pairs_scored_inc": out.counters.get("pairs_scored"),
        "clusters_equal": equal,
    }))


if __name__ == "__main__":
    main()
