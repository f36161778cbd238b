"""Quantify SemDeDup's documented cross-cluster miss class
(VERDICT r5 item #7): planted near-dup twins, half interior to a
k-means cell, half straddling cell boundaries; measure what fraction
of TRUE near-dup pairs (exact brute-force ground truth) each operator
removes at the SAME cosine threshold.

- `semantic_dedup` only compares points inside one k-means cell, so a
  twin pair split across cells is structurally invisible to it — the
  paper's own tradeoff (Abbas et al. 2023 §3).
- `embedding_duplicates` (SRP-LSH bucketed all-corpus pairs + exact
  verify + CC) covers that class.

Usage: python tools/probe_semdedup.py [--n 2000] [--k 8]
Prints one JSON line; tests/test_semdedup_probe.py asserts the same
construction's behavior at fixture scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_probe(n_per_kind: int, dim: int = 16, n_centroids: int = 8,
                seed: int = 7):
    """Deterministic probe corpus: for i in range(n_per_kind), one
    INTERIOR base point (on centroid j = i % C, + noise 0.05) and one
    BOUNDARY base point (midpoint of centroids j and j+1, + noise
    0.05), each with a near-identical twin (+ noise 0.005, cosine
    > 0.999). Returns (rows, true_pairs) where rows are
    (vec_id, kind, embedding) and true_pairs the planted twin id pairs
    keyed by kind."""
    rng = np.random.RandomState(seed)
    cents = np.zeros((n_centroids, dim))
    for j in range(n_centroids):
        cents[j, j % dim] = 10.0
        cents[j, (j + 3) % dim] = 4.0 * ((-1) ** j)
    rows, pairs = [], {"interior": [], "boundary": []}
    vid = 0
    # boundary pairs must be RARE (4% of corpus): if straddle points
    # carry real mass, k-means plants a centroid ON the midpoint lobe
    # and the pair becomes interior to that new cell. Rarity mirrors
    # reality — near-dups across semantic clusters are the tail, which
    # is exactly why SemDeDup accepts losing them.
    n_boundary = 3 * n_centroids
    for i in range(n_per_kind):
        j = i % n_centroids
        base_int = cents[j] + rng.normal(scale=0.05, size=dim)
        twin_int = base_int + rng.normal(scale=0.005, size=dim)
        rows.append((vid, "interior", [float(x) for x in base_int]))
        rows.append((vid + 1, "interior", [float(x) for x in twin_int]))
        pairs["interior"].append((vid, vid + 1))
        vid += 2
    for i in range(n_boundary):
        j = i % n_centroids
        # candidate STRADDLE pair: +-0.2 along the inter-centroid
        # direction (separation 0.4, cosine ~ 1 - 0.4^2/(2*117) =
        # 0.99932 — a true near-dup at any threshold <= 0.999), with
        # midpoints SWEPT along that axis around the ideal mid-plane.
        # The FITTED Voronoi boundary drifts from the ideal one (init,
        # iteration count, the straddle mass itself), so rather than
        # guessing its position, the sweep guarantees some pairs
        # bracket it wherever it lands; run_probe classifies each pair
        # by the operator's own fitted cells.
        # 3 sweep positions per axis at >= 1.2 spacing (any two points
        # closer than ~0.68 are near-dups at 0.998, so closer sweep
        # positions would chain into one dup component and confound the
        # pairwise analysis), plus a per-axis jitter so the 8 axes
        # probe 8 different offsets relative to wherever the fitted
        # boundary lands
        t = (-1.2 + 1.2 * (i // n_centroids)) + 0.05 * (j - 3.5)
        d = cents[(j + 1) % n_centroids] - cents[j]
        d = d / np.linalg.norm(d)
        mid = (cents[j] + cents[(j + 1) % n_centroids]) / 2.0 + t * d \
            + rng.normal(scale=0.02, size=dim)
        base_bnd = mid - 0.2 * d
        twin_bnd = mid + 0.2 * d
        rows.append((vid, "boundary", [float(x) for x in base_bnd]))
        rows.append((vid + 1, "boundary", [float(x) for x in twin_bnd]))
        pairs["boundary"].append((vid, vid + 1))
        vid += 2
    return rows, pairs


def run_probe(spark, n_per_kind: int, k: int, threshold: float = 0.998,
              iters: int = 4):
    """Returns per-kind miss counts for both operators, plus the
    structural decomposition: semantic_dedup's misses are EXACTLY the
    true pairs split across its own fitted k-means cells (asserted by
    the test). The fitted cells come from the same deterministic
    kmeans_assign the operator runs, so the classification is the
    operator's own partition, not the planted one."""
    from resolve_spark.operators.ann import kmeans_assign
    from resolve_spark.operators.dedup import (
        embedding_duplicates,
        semantic_dedup,
    )

    rows, true_pairs = build_probe(n_per_kind)
    df = spark.createDataFrame(
        rows, "vec_id long, kind string, embedding array<double>"
    ).persist()

    sd = semantic_dedup(df, "vec_id", "embedding", k=k, iters=iters,
                        cosine_threshold=threshold)
    kept = {r["vec_id"] for r in sd.where(F_col_kept()).collect()}
    cell = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, "vec_id", "embedding", k=k,
                               iters=iters).collect()
    }
    # planes=8: at separation 0.4 / norm ~10.8 the SRP per-plane
    # agreement is ~0.988, so 8 planes keep single-table bucket recall
    # ~0.91 where 16 would drop it to ~0.83 on the swept pairs
    ed = embedding_duplicates(df, "vec_id", "embedding",
                              cosine_threshold=threshold, planes=8)
    cl = {r["rid"]: r["cluster_id"] for r in ed.collect()}

    # brute-force isolation check: a planted pair is ISOLATED when
    # neither endpoint has any OTHER true near-dup neighbor (chained
    # components would let an endpoint be dropped by a third point,
    # breaking the pairwise missed<->cross-cell correspondence)
    vecs = np.array([r[2] for r in rows])
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -1.0)
    n_true_neighbors = (sims >= threshold).sum(axis=1)

    out = {}
    for kind, ps in true_pairs.items():
        sd_missed = {(a, b) for a, b in ps if a in kept and b in kept}
        cross = {(a, b) for a, b in ps if cell[a] != cell[b]}
        iso = {
            (a, b) for a, b in ps
            if n_true_neighbors[a] == 1 and n_true_neighbors[b] == 1
        }
        ed_miss = sum(1 for a, b in ps if cl.get(a) != cl.get(b))
        out[kind] = {
            "pairs": len(ps),
            "isolated_pairs": len(iso),
            "cross_cell_pairs": len(cross),
            "semdedup_missed": len(sd_missed),
            "semdedup_miss_rate": round(len(sd_missed) / len(ps), 4),
            # the structural claim, both directions, on isolated pairs:
            # missed ⊆ cross-cell and cross-cell∩isolated ⊆ missed
            "missed_subset_of_cross_cell": sd_missed <= cross,
            "cross_cell_isolated_all_missed": (cross & iso) <= sd_missed,
            "lsh_missed": ed_miss,
            "lsh_miss_rate": round(ed_miss / len(ps), 4),
        }
    df.unpersist()
    return out


def F_col_kept():
    from pyspark.sql import functions as F
    return F.col("kept") == 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000,
                    help="planted twin pairs PER KIND (interior/boundary)")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    from resolve_spark.session import build_session
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session(master=f"local[{cpus}]")
    res = run_probe(spark, args.n, args.k)
    print(json.dumps({"n_per_kind": args.n, "k": args.k, **res}))


if __name__ == "__main__":
    main()
