"""Transitive match groups (SURVEY.md §2.8, G1-G5) at cluster scale.

The reference runs a per-seed BFS with one ANN round-trip per dequeued
node (group.go:162-263). Globally that is exactly connected components
over the thresholded match-edge set, so we compute ALL groups at once
with the **alternating large-star / small-star algorithm** (Kiveris et
al., "Connected Components in MapReduce and Beyond", SOCC'14):

    large-star: attach every neighbor larger than u to min(Γ(u) ∪ {u})
    small-star: attach u and its smaller neighbors to that minimum

Both steps are a groupBy + join (2 shuffles); the pair converges in
O(log n) rounds. Lineage is truncated every round via localCheckpoint
(SURVEY.md §4 custom-device #2 / hard-part #5); convergence is detected
by a (count, xxhash-sum) fingerprint of the edge set.

Strategy parity (group.go):
- "transitive" == CC over edges at threshold t.
- "direct"     == the 1-hop neighborhood of a seed (trivial filter).
- "hybrid"     == CC over edges>=0.9 plus edges>=t that touch a >=0.9
  component (two-threshold simplification, SURVEY.md §7 decision #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resolve_spark.config import HYBRID_DIRECT_THRESHOLD


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent, overflow-free under ANSI mode
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("m", F.least(F.col("src"), F.col("mn")))
    return (
        sym.join(mins.select("src", "m"), "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    attached = (
        e.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return attached.unionByName(self_edges).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(src,dst) edge list -> (rid, cluster_id) with cluster_id = min
    member id of the component. Only nodes appearing in edges are
    returned; callers union isolated nodes as singleton clusters."""
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    prev_fp = None
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
    # converged: edges are (node -> root). Roots map to themselves.
    members = cur.select(F.col("src").alias("rid"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("rid"), F.col("dst").alias("cluster_id")).distinct()
    return members.unionByName(roots).distinct()


def assign_clusters(
    entities: DataFrame, edges: DataFrame, id_col: str
) -> DataFrame:
    """All entities -> (rid, cluster_id, cluster_size); non-matched
    entities become singletons (cluster_id = own id)."""
    cc = connected_components(edges)
    assigned = (
        entities.select(F.col(id_col).alias("rid"))
        .join(cc, "rid", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "rid"))
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return assigned.join(sizes, "cluster_id").select("rid", "cluster_id", "cluster_size")


def hybrid_edges(scored_edges: DataFrame, threshold: float) -> DataFrame:
    """G4 — two-threshold hybrid: high-confidence core (>= max(t, 0.9),
    group.go:272-274) plus threshold edges touching a core node."""
    hi_t = max(threshold, HYBRID_DIRECT_THRESHOLD)
    hi = scored_edges.where(F.col("score") >= hi_t)
    core_nodes = (
        hi.select(F.col("id_a").alias("n"))
        .unionByName(hi.select(F.col("id_b").alias("n")))
        .distinct()
    )
    lo = scored_edges.where(F.col("score") >= threshold)
    touching = lo.join(
        core_nodes, (lo.id_a == core_nodes.n) | (lo.id_b == core_nodes.n), "left_semi"
    )
    return hi.unionByName(touching).dropDuplicates(["id_a", "id_b"])


def direct_group(scored_edges: DataFrame, seed_id: str, limit: int | None = None) -> DataFrame:
    """G2 — 1-hop neighborhood of a seed, score-descending."""
    out = (
        scored_edges.where((F.col("id_a") == seed_id) | (F.col("id_b") == seed_id))
        .select(
            F.when(F.col("id_a") == seed_id, F.col("id_b")).otherwise(F.col("id_a")).alias("rid"),
            "score",
        )
        .orderBy(F.desc("score"))
    )
    return out.limit(limit) if limit else out


def group_statistics(
    clusters: DataFrame,
    entities: DataFrame,
    scored_edges: DataFrame,
    id_col: str,
    stat_fields: list[str],
) -> DataFrame:
    """G5 — per-cluster stats (group.go:340-407), all-native.

    avg_score: mean score of intra-cluster edges (the batch analog of
    averaging member match-scores). Per field: the modal non-empty value,
    agreement = mode count / cluster size, confidence = agreement *
    avg_score (group.go:403). Mode ties break to the smallest value
    (the reference inherits Go map iteration order — nondeterministic;
    we pick deterministically).
    """
    edge_scores = (
        scored_edges.join(
            clusters.select(F.col("rid").alias("id_a"), "cluster_id"), "id_a"
        )
        .groupBy("cluster_id")
        .agg(F.avg("score").alias("avg_score"))
    )
    base = clusters.join(edge_scores, "cluster_id", "left").withColumn(
        "avg_score", F.coalesce("avg_score", F.lit(1.0))
    )
    ent = entities.select(F.col(id_col).alias("rid"), *stat_fields).join(
        base.select("rid", "cluster_id", "cluster_size", "avg_score"), "rid"
    )
    stack_expr = "stack({}, {}) as (field, value)".format(
        len(stat_fields), ", ".join(f"'{f}', {f}" for f in stat_fields)
    )
    long = ent.selectExpr("cluster_id", "cluster_size", "avg_score", stack_expr).where(
        (F.col("value").isNotNull()) & (F.col("value") != "")
    )
    counted = long.groupBy("cluster_id", "cluster_size", "avg_score", "field", "value").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("cluster_id", "field").orderBy(F.desc("cnt"), F.asc("value"))
    top = counted.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return top.select(
        "cluster_id",
        F.col("cluster_size").alias("size"),
        "avg_score",
        "field",
        F.col("value").alias("mode_value"),
        (F.col("cnt") / F.col("cluster_size")).alias("agreement"),
        (F.col("cnt") / F.col("cluster_size") * F.col("avg_score")).alias("confidence"),
    )
