"""Round-7 optimization instrumentation. bench.py is FROZEN for
measurement; this file adds per-query timing / plan capture / noop-sink
isolation (guide §1.1/§1.4/§1.5) without touching the driver contract.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries q84_fs_posterior,q90_uncertainty_sample \
      [--explain plans/r07 --suffix before] [--noop] [--repeat 1]

Timing methodology matches bench.py exactly (same session build, same
.count() action) unless --noop is given, which uses the noop sink to
force every column (guide §1.4).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names, or 'all'")
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>_<suffix>.txt explain files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="noop sink instead of count()")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from resolve_spark.session import build_session

    spark = build_session(
        app_name=f"resolve_bench_extra_{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = list(qs) if args.queries == "all" else args.queries.split(",")
    out: dict[str, object] = {}
    for name in names:
        if name not in qs:
            raise SystemExit(f"unknown query {name!r}")
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [extra]")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples[0] if args.repeat == 1 else samples
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "noop": args.noop,
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
