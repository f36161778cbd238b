"""Survivorship fusion: collapse each resolved cluster to ONE golden
record (the post-clustering step every production ER deployment runs;
Christen "Data Matching" ch. 10 data fusion; the reference stops at
group statistics — group.go:340-407 — so this extends it to an actual
canonical-record writer).

Per-field survivorship rules:

- ``mode``     most frequent non-empty value; ties break to the
               smallest value (same tie discipline as
               clustering.group_statistics — deterministic where Go
               map iteration was not).
- ``longest``  longest non-empty value; ties break to the
               lexicographically smallest.
- ``min`` / ``max``  natural aggregate (numeric or lexicographic).
- ``first``    the value carried by the cluster's canonical record
               (smallest id) — "primary record wins".

Output: one row per cluster: cluster_id, cluster_size, canonical_id
(min member id), then one column per rule.

Determinism: every rule has a total tie order, so output is unique
given input — oracle-safe with no rounding at all.

Scale plan (100 TB): agg rules (min/max/first) fuse in ONE map-side-
combinable groupBy(cluster_id); each mode/longest rule adds one
groupBy + window on (cluster_id[, value]) — all keyed on cluster_id,
so every shuffle is the same partitioning and AQE coalesces; no
windows over the full corpus, no collects, cluster count rows out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RULES = ("mode", "longest", "min", "max", "first")


def fuse_clusters(
    entities: DataFrame,
    assignments: DataFrame,
    rules: dict[str, str],
    id_col: str = "id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One golden record per cluster under per-field ``rules``
    (column -> one of mode|longest|min|max|first). Unassigned entities
    are ignored; clusters with no non-empty value for a
    mode/longest/min/max field get NULL there (min/max skip NULLs and
    empty strings like mode/longest do — "" sorts before every real
    value, so a single blank scrape artifact would otherwise blank the
    fused field). ``first`` is provenance-based (the min-id record's
    value, verbatim) and intentionally does NOT skip empties."""
    bad = {c: r for c, r in rules.items() if r not in _RULES}
    if bad:
        raise ValueError(f"unknown survivorship rule(s): {bad}")
    asg = assignments.select(
        F.col(id_col).alias("_fid"), F.col(cluster_col).alias(cluster_col)
    )
    long = entities.withColumnRenamed(id_col, "_fid").join(asg, "_fid")

    aggs = [
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("_fid").alias("canonical_id"),
    ]
    for col, rule in rules.items():
        if rule in ("min", "max"):
            nz = F.when(
                F.col(col).isNotNull() & (F.col(col).cast("string") != ""),
                F.col(col),
            )
            aggs.append((F.min(nz) if rule == "min" else F.max(nz)).alias(col))
        elif rule == "first":
            aggs.append(F.min_by(col, F.col("_fid")).alias(col))
    out = long.groupBy(cluster_col).agg(*aggs)

    for col, rule in rules.items():
        if rule not in ("mode", "longest"):
            continue
        vals = long.select(cluster_col, F.col(col).alias("_v")).where(
            F.col("_v").isNotNull() & (F.col("_v").cast("string") != "")
        )
        if rule == "mode":
            counted = vals.groupBy(cluster_col, "_v").agg(
                F.count(F.lit(1)).alias("_cnt")
            )
            w = Window.partitionBy(cluster_col).orderBy(
                F.desc("_cnt"), F.asc("_v")
            )
        else:  # longest
            counted = vals.distinct().withColumn("_len", F.length("_v"))
            w = Window.partitionBy(cluster_col).orderBy(
                F.desc("_len"), F.asc("_v")
            )
        top = (
            counted.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(cluster_col, F.col("_v").alias(col))
        )
        out = out.join(top, cluster_col, "left")

    return out.select(
        cluster_col, "cluster_size", "canonical_id", *rules.keys()
    )


def fusion_conflicts(
    entities: DataFrame,
    assignments: DataFrame,
    fields: list[str],
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    only_conflicted: bool = True,
) -> DataFrame:
    """The data-steward conflict queue behind :func:`fuse_clusters`:
    per cluster, how many distinct non-null values each survivorship
    field carries ("<field>_distinct") and how many fields disagree
    (``n_conflict_fields``). A fused golden record silently picks a
    winner for every conflicted field — this is the report of exactly
    where that happened, for review or rule tuning.

    ``only_conflicted=True`` keeps clusters with >= 1 disagreeing
    field. NULLs don't count as values (count DISTINCT semantics in
    both engines), so a field that is null everywhere conflicts with
    nothing.

    Scale plan (100 TB): ONE groupBy(cluster) with countDistinct per
    field (partial-aggregated map-side), keyed the same as the fusion
    itself; output rows = clusters, never records."""
    if not fields:
        raise ValueError(
            "fusion_conflicts: fields must be non-empty (nothing to "
            "report conflicts on)"
        )
    j = entities.join(
        assignments.select(
            F.col(id_col).alias(id_col), cluster_col
        ),
        id_col,
    )
    aggs = [F.count(F.lit(1)).alias("cluster_size")] + [
        F.countDistinct(f).alias(f"{f}_distinct") for f in fields
    ]
    out = j.groupBy(cluster_col).agg(*aggs)
    n_conf = None
    for f in fields:
        c = (F.col(f"{f}_distinct") > 1).cast("int")
        n_conf = c if n_conf is None else n_conf + c
    out = out.withColumn("n_conflict_fields", n_conf)
    if only_conflicted:
        out = out.where(F.col("n_conflict_fields") >= 1)
    return out
