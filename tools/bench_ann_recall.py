"""ANN quality harness: recall@k of lsh_topk / ivf_topk against the
brute_force_topk exactness baseline, with wall-clock, at two notches:

- the driver's sf embeddings table (sf0.1: 2,000 x dim-64), and
- a synthesized clustered notch (default 100k vectors, dim 64, 200
  planted clusters) generated with NATIVE deterministic expressions
  (xxhash64-derived centroids + noise) — no external data, same shape
  as testdata/embeddings (which is itself label-clustered).

Records the recall-vs-cost curve VERDICT r5 item #3 asked for; the
summary table lands in BENCH.md. Usage:

    python tools/bench_ann_recall.py [sf_dir] [--n N] [--k K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from resolve_spark.session import build_session  # noqa: E402
from resolve_spark.operators import ann  # noqa: E402


def synth_embeddings(spark, n: int, dim: int = 64, clusters: int = 200):
    """n clustered unit-scale vectors, fully native + deterministic:
    v[i] = centroid(cluster, i) + 0.12 * noise(vec_id, i), every term a
    hash-derived uniform in [-1, 1]. Distributed generation via
    spark.range — no driver-side materialization."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    df = df.withColumn("label", (F.col("vec_id") % clusters).cast("int"))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def u(h):  # uint-ish hash -> [-1, 1)
        return (F.pmod(h, F.lit(100000)) / F.lit(50000.0)) - F.lit(1.0)

    emb = F.transform(
        dims,
        lambda i: (
            u(F.xxhash64(F.lit("c"), F.col("label"), i))
            + F.lit(0.12) * u(F.xxhash64(F.lit("n"), F.col("vec_id"), i))
        ).cast("float"),
    )
    return df.withColumn("embedding", emb)


def topk_sets(df, k):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def recall_at_k(exact: dict, approx: dict) -> float:
    num = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    den = sum(len(exact[q]) for q in exact)
    return num / den if den else float("nan")


def run(name, fn, exact=None, k=10):
    t0 = time.monotonic()
    df = fn()
    sets = topk_sets(df, k)
    wall = time.monotonic() - t0
    rec = recall_at_k(exact, sets) if exact is not None else 1.0
    print(
        json.dumps(
            {"method": name, "wall_sec": round(wall, 2), "recall_at_k": round(rec, 4)}
        ),
        flush=True,
    )
    return sets, wall, rec


def bench_notch(spark, emb, label, k, query_mod):
    q = emb.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), "embedding")
    q.persist().count()
    c.persist()
    nc = c.count()
    print(f"== notch {label}: {nc} candidates, {q.count()} queries, k={k}")
    exact, bf_wall, _ = run(
        f"{label}/brute_force", lambda: ann.brute_force_topk(q, c, k=k), None, k
    )
    rows = [("brute_force", "exact", bf_wall, 1.0)]
    for planes, tables in [(12, 4), (10, 4), (10, 8), (8, 8)]:
        _, w, r = run(
            f"{label}/lsh p{planes} t{tables}",
            lambda: ann.lsh_topk(q, c, k=k, planes=planes, tables=tables),
            exact, k,
        )
        rows.append((f"lsh planes={planes} tables={tables}", "approx", w, r))
    for ncells, nprobe in [(16, 4), (32, 8), (64, 8), (64, 16)]:
        _, w, r = run(
            f"{label}/ivf c{ncells} p{nprobe}",
            lambda: ann.ivf_topk(q, c, k=k, ncells=ncells, nprobe=nprobe),
            exact, k,
        )
        rows.append((f"ivf ncells={ncells} nprobe={nprobe}", "approx", w, r))
    q.unpersist()
    c.unpersist()
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session(master=f"local[{cpus}]")

    all_rows = []
    sf_emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    all_rows.append((os.path.basename(args.sf_dir), bench_notch(
        spark, sf_emb, os.path.basename(args.sf_dir), args.k, 50)))
    big = synth_embeddings(spark, args.n)
    all_rows.append((f"synth{args.n//1000}k", bench_notch(
        spark, big, f"synth{args.n//1000}k", args.k, max(args.n // 100, 1))))

    print("\n| notch | method | recall@%d | wall (s) |" % args.k)
    print("|---|---|---|---|")
    for notch, rows in all_rows:
        for meth, kind, w, r in rows:
            print(f"| {notch} | {meth} | {r:.3f} | {w:.1f} |")


if __name__ == "__main__":
    main()
