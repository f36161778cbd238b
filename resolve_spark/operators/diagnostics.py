"""Blocking-quality diagnostics: the standard record-linkage metrics
for evaluating a blocking scheme BEFORE paying for pairwise scoring
(Christen, "Data Matching", ch. 7 — reduction ratio / pairs
completeness / pairs quality).

Given the (id, block_key) assignment a blocking pass produces (multiple
rows per id for multi-pass schemes — namespace the key strings) and a
labeled set of true-match pairs, one row of corpus-level metrics:

- ``comparisons``      sum over keys of C(c, 2): candidate comparisons
  the scheme generates (counted per key, the work actually done —
  cross-key duplicate candidates are deduplicated later by pair-gen).
- ``reduction_ratio``  1 - comparisons / C(n_records, 2): fraction of
  the naive all-pairs work the blocking avoids.
- ``pairs_completeness``  fraction of true pairs sharing >= 1 key —
  the recall ceiling any downstream matcher inherits.
- ``pairs_quality``    covered true pairs / comparisons — how dense
  real matches are in the candidate stream (an upper bound on
  match-stage precision-per-comparison).

Everything is computed from exact longs; the two ratios are single
divisions of exact longs (deterministic across engines, oracle-safe).

Scale plan (100 TB): nothing quadratic and no pair materialization —
comparisons come from one map-side-combinable groupBy(key) count;
truth coverage joins the labeled pairs (small by definition: humans
labeled them) against the per-id key lists twice on (id, key); the
result is ONE row. The naive C(N, 2) appears only as arithmetic on a
count, never as dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_quality(
    blocks: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    key_col: str = "block_key",
    id_a_col: str = "id_a",
    id_b_col: str = "id_b",
) -> DataFrame:
    """One-row DataFrame: (n_records, n_block_keys, comparisons,
    total_pairs, reduction_ratio, truth_pairs, covered_pairs,
    pairs_completeness, pairs_quality). ``truth`` pairs are normalized
    to (least, greatest) and deduplicated; self-pairs are dropped."""
    base = blocks.agg(
        F.countDistinct(id_col).alias("n_records"),
        F.countDistinct(key_col).alias("n_block_keys"),
    )
    comp = (
        blocks.groupBy(key_col)
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("comparisons"))
        .select(F.coalesce("comparisons", F.lit(0)).alias("comparisons"))
    )
    tnorm = (
        truth.select(
            F.least(id_a_col, id_b_col).alias("_ta"),
            F.greatest(id_a_col, id_b_col).alias("_tb"),
        )
        .where(F.col("_ta") != F.col("_tb"))
        .distinct()
    )
    tcount = tnorm.agg(F.count("*").alias("truth_pairs"))
    ka = blocks.select(F.col(id_col).alias("_ta"), F.col(key_col).alias("_k"))
    kb = blocks.select(F.col(id_col).alias("_tb"), F.col(key_col).alias("_k"))
    covered = (
        tnorm.join(ka, "_ta")
        .join(kb, ["_tb", "_k"])
        .select("_ta", "_tb")
        .distinct()
        .agg(F.count("*").alias("covered_pairs"))
    )
    row = base.crossJoin(comp).crossJoin(tcount).crossJoin(covered)
    total = F.expr("n_records * (n_records - 1) DIV 2")
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return row.select(
        "n_records",
        "n_block_keys",
        "comparisons",
        total.alias("total_pairs"),
        ratio(total - F.col("comparisons"), total).alias("reduction_ratio"),
        "truth_pairs",
        "covered_pairs",
        ratio(F.col("covered_pairs"), F.col("truth_pairs")).alias(
            "pairs_completeness"
        ),
        ratio(F.col("covered_pairs"), F.col("comparisons")).alias(
            "pairs_quality"
        ),
    )
