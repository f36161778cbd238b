"""Scale probe for the span-duplication operators (q60/q63).

Replicates the sf0.1 documents table xK with distinct doc_ids in two
regimes and times repeated_ngram_stats / remove_repeated_spans:

- ``dup``: verbatim replicas — every interior window is shared by all
  K copies, the adversarial dup-heavy case (the shared-hash set is as
  large as the window set).
- ``uniq``: every token is salted with the replica number — no window
  recurs across replicas, the dup-light case (shared set stays small
  while the corpus grows xK).

Results are printed as one JSON line per (regime, k, cores) leg; sums
over the computed columns force the full plan (a bare count() could
let Catalyst eliminate the final left join against the unique-keyed
per-doc aggregate).

Usage: python tools/scale_spans.py [--sf-dir D] [--ks 1,10,40]
       [--cores 8] [--regimes dup,uniq] [--op both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, k: int, regime: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if k == 1:
        return d
    reps = spark.range(k).select(F.col("id").alias("rep"))
    joined = d.crossJoin(reps)
    if regime == "dup":
        text = F.col("text")
    else:  # uniq: salt every token with the replica number
        text = F.concat_ws(
            " ",
            F.transform(
                F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
                lambda t: F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("_"), t),
            ),
        )
    return joined.select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"), text.alias("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="1,10,40")
    ap.add_argument("--cores", default="8")
    ap.add_argument("--regimes", default="dup,uniq")
    ap.add_argument("--op", default="both", choices=["stats", "remove", "both"])
    args = ap.parse_args()

    from resolve_spark.operators.dedup import remove_repeated_spans, repeated_ngram_stats
    from resolve_spark.session import build_session

    for cores in [int(c) for c in args.cores.split(",")]:
        spark = build_session(master=f"local[{cores}]")
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        for regime in args.regimes.split(","):
            for k in [int(x) for x in args.ks.split(",")]:
                # Materialize the xK corpus to disk parquet before
                # timing: the sf0.1 table is ONE file, so the crossJoin
                # generator is a ~serial stage that would otherwise be
                # re-executed INSIDE every timed run and poison the
                # scaling legs (a 100-TB input arrives as thousands of
                # pre-split files; model that, don't bench the
                # single-file generator).
                import shutil
                import tempfile

                gen = build_corpus(spark, args.sf_dir, k, regime).repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions"))
                )
                tmp = tempfile.mkdtemp(prefix="scale_spans_")
                path = os.path.join(tmp, "corpus.parquet")
                gen.write.mode("overwrite").parquet(path)
                corpus = spark.read.parquet(path)
                n_docs = corpus.count()
                legs = {}
                if args.op in ("stats", "both"):
                    t0 = time.time()
                    r = repeated_ngram_stats(corpus, "doc_id", "text").agg(
                        F.sum("n_windows").alias("w"), F.sum("n_dup_windows").alias("d")
                    ).collect()[0]
                    legs["stats"] = {
                        "sec": round(time.time() - t0, 2),
                        "windows": r["w"], "dup_windows": r["d"],
                    }
                if args.op in ("remove", "both"):
                    t0 = time.time()
                    r = remove_repeated_spans(corpus, "doc_id", "text").agg(
                        F.sum("n_removed").alias("rm"),
                        F.sum(F.length("clean_text")).alias("chars"),
                    ).collect()[0]
                    legs["remove"] = {
                        "sec": round(time.time() - t0, 2),
                        "removed": r["rm"], "clean_chars": r["chars"],
                    }
                print(json.dumps({
                    "regime": regime, "k": k, "cores": cores,
                    "docs": n_docs, **legs,
                }), flush=True)
                shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
