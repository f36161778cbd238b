"""Linearity probe for the round-5 corpus operators
(minhash_join / source_overlap / tfidf_weighted_jaccard_pairs).

Replicates the sf0.1 documents table xK with salted tokens (every token
carries the replica number), so each replica reproduces the SAME
internal near-dup/overlap structure with disjoint vocabulary: result
sizes and work both scale ~linearly in K — any superlinear wall growth
is an operator hot spot, not data structure.

Prints one JSON line per (op, k) leg with wall seconds and output rows.

Usage: python tools/scale_newops.py [--sf-dir D] [--ks 1,8,32]
       [--cores 8] [--ops join,overlap,tfidf]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, k: int, tmp: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    if k > 1:
        reps = spark.range(k).select(F.col("id").alias("rep"))
        d = (
            d.crossJoin(reps)
            .select(
                (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
                # salt every token: replica vocabularies are disjoint
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+)"),
                    F.concat(F.lit(r"$1x"), F.col("rep")),
                ).alias("text"),
                F.concat(F.col("source"), F.lit("_"), F.col("rep") % 4)
                .alias("source"),
            )
        )
    # materialize to split parquet: a single-file source serializes the
    # map stage and fakes low efficiency (memory: scale_spans lesson)
    path = os.path.join(tmp, f"corpus_x{k}")
    d.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="1,8,32")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--ops", default="join,overlap,tfidf")
    ap.add_argument("--tmp", default="/tmp/scale_newops")
    args = ap.parse_args()

    from resolve_spark.operators import dedup as DD
    from resolve_spark.operators.decontaminate import source_overlap
    from resolve_spark.session import build_session

    spark = build_session(master=f"local[{args.cores}]", app_name="scale_newops")
    ops = set(args.ops.split(","))
    for k in (int(x) for x in args.ks.split(",")):
        d = build_corpus(spark, args.sf_dir, k, args.tmp)
        legs = {}
        if "join" in ops:
            # split on the ORIGINAL doc id (doc_id = orig*k + rep), so
            # near-dup counterparts land on opposite sides in every
            # replica — doc_id%2 would split by replica parity instead
            # and the salted vocabularies would never meet
            orig_even = (F.floor(F.col("doc_id") / k) % 2 == 0)
            legs["minhash_join"] = lambda d=d, p=orig_even: DD.minhash_join(
                d.where(p), d.where(~p),
                "doc_id", "doc_id", jaccard_threshold=0.7,
            )
        if "overlap" in ops:
            legs["source_overlap"] = lambda d=d: source_overlap(
                d, "text", "source", n=4, max_groups_per_fingerprint=64
            )
        if "tfidf" in ops:
            legs["tfidf_pairs"] = lambda d=d: DD.tfidf_weighted_jaccard_pairs(
                d, "doc_id", "text", threshold=0.6
            )
        for name, fn in legs.items():
            t0 = time.monotonic()
            rows = fn().count()
            wall = time.monotonic() - t0
            print(json.dumps({
                "op": name, "k": k, "cores": args.cores,
                "wall_s": round(wall, 2), "rows_out": rows,
            }), flush=True)


if __name__ == "__main__":
    main()
