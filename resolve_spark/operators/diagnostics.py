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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resolve_spark.operators.pairs import comb2_exact


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
        .agg(F.sum(comb2_exact(F.col("c"))).alias("comparisons"))
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
    total = comb2_exact(F.col("n_records"))
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


def match_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_a_col: str = "id_a",
    id_b_col: str = "id_b",
    score_col: str | None = None,
    thresholds=None,
) -> DataFrame:
    """Match-stage evaluation against labeled pairs — the scoring-side
    complement of :func:`blocking_quality`.

    Without ``thresholds``: one row (tp, fp, fn, precision, recall,
    f1) treating every ``pred`` pair as a predicted match. With
    ``thresholds`` (requires ``score_col``): one row per threshold,
    predicted = score >= t — the PR curve a threshold-tuning pass reads
    (the engine's own 0.87 default came from exactly this sweep).

    Both inputs are normalized to (least, greatest) pairs and
    deduplicated; duplicate scored pairs keep their MAX score (a pair
    found by several blocking passes matches at its best score). A
    pred pair whose score is NULL still counts as predicted in the
    no-thresholds mode; in a sweep it can never clear a numeric
    threshold (a true pair with only a NULL score reads as fn).
    f1 is computed as 2*tp / (2*tp + fp + fn) — a SINGLE division of
    exact longs, like precision and recall, so every ratio is
    deterministic across engines (oracle-safe).

    Scale plan: one full-outer join of the two (deduplicated) pair
    sets on the pair key, then conditional counts — for a sweep, the
    joined stream is exploded by the literal threshold list (a handful
    of rows each) and aggregated map-side-combinably to |thresholds|
    rows. Nothing quadratic; the labeled set is small by definition.
    """
    if thresholds is not None and score_col is None:
        raise ValueError("thresholds sweep requires score_col")
    key = [
        F.least(id_a_col, id_b_col).alias("_pa"),
        F.greatest(id_a_col, id_b_col).alias("_pb"),
    ]
    tnorm = (
        truth.select(*key)
        .where(F.col("_pa") != F.col("_pb"))
        .distinct()
        .withColumn("_t", F.lit(1))
    )
    if score_col is None:
        pnorm = (
            pred.select(*key)
            .where(F.col("_pa") != F.col("_pb"))
            .distinct()
            .withColumn("_s", F.lit(1.0))
        )
    else:
        pnorm = (
            pred.select(*key, F.col(score_col).cast("double").alias("_sc"))
            .where(F.col("_pa") != F.col("_pb"))
            .groupBy("_pa", "_pb")
            .agg(F.max("_sc").alias("_s"))
        )
    # _p marks pred-side presence independently of the score value: a
    # NULL score would otherwise make a predicted pair look identical
    # to a truth-only row after the full-outer join
    pnorm = pnorm.withColumn("_p", F.lit(1))
    joined = pnorm.join(tnorm, ["_pa", "_pb"], "full_outer").select(
        F.col("_s"),
        F.coalesce("_p", F.lit(0)).alias("_p"),
        F.coalesce("_t", F.lit(0)).alias("_t"),
    )
    if thresholds is None:
        # every pred pair counts as predicted (docstring contract) —
        # -inf, not 1.0: with score_col set, a 1.0 gate would silently
        # drop every pair scored below 1.0 from tp/fp. NULL-scored pred
        # pairs count too: their score coalesces to -inf, which clears
        # the -inf gate (in a thresholds sweep, by contrast, a NULL
        # score can never clear a numeric threshold — documented).
        rows = joined.select(
            F.lit(float("-inf")).alias("threshold"),
            F.when(
                F.col("_p") == 1, F.coalesce("_s", F.lit(float("-inf")))
            ).alias("_s"),
            "_t",
        )
    else:
        ts = sorted(float(t) for t in thresholds)
        if not ts:
            raise ValueError("thresholds must be non-empty")
        rows = joined.select(
            F.explode(F.array(*[F.lit(t) for t in ts])).alias("threshold"),
            "_s",
            "_t",
        )
    hit = F.col("_s").isNotNull() & (F.col("_s") >= F.col("threshold"))
    agg = rows.groupBy("threshold").agg(
        F.sum((hit & (F.col("_t") == 1)).cast("long")).alias("tp"),
        F.sum((hit & (F.col("_t") == 0)).cast("long")).alias("fp"),
        F.sum((~hit & (F.col("_t") == 1)).cast("long")).alias("fn"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    out = agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        ratio(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")).alias("f1"),
    )
    if thresholds is None:
        return out.drop("threshold")
    return out


def block_skew_profile(
    blocks: DataFrame, id_col: str = "id", key_col: str = "block_key"
) -> DataFrame:
    """Per-pass block-size distribution — the skew diagnostic read
    BEFORE launching pair generation at scale (hot keys, not totals,
    decide whether a blocking pass survives 100x data).

    Input is the multi-pass (id, key) assignment with namespaced keys
    (``c:``/``t:``/``p:``/``q:``/``m<band>:`` — blocking.py); the pass
    is everything before the first ':' (keys without ':' form their own
    pass). One output row per pass:

    - ``n_keys`` / ``n_assignments`` / ``max_block``
    - ``p50_block`` / ``p90_block`` / ``p99_block`` — EXACT percentiles:
      the size at rank ceil(q * n_keys) of the sizes sorted ascending
      (integer rank arithmetic, no interpolation — any rank's value is
      unique even under ties, so engines cannot disagree)
    - ``candidate_pairs`` — sum over keys of C(c, 2): the work this
      pass feeds pair generation
    - ``top1_pairs_share`` — the hottest key's fraction of that work:
      the number the pair budget / salting machinery (pairs.py) exists
      to cap. > ~0.5 means one key dominates the stage.

    Scale plan: one map-side-combinable groupBy(pass, key) count, then
    a window over the KEY-size table (vocabulary-of-keys sized, far
    smaller than the corpus) partitioned by pass; output is |passes|
    rows. Nothing touches record pairs.
    """
    sizes = (
        blocks.select(
            F.substring_index(F.col(key_col), ":", 1).alias("pass"),
            F.col(key_col).alias("_k"),
        )
        .groupBy("pass", "_k")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("pass")
    ranked = sizes.select(
        "pass",
        "c",
        F.row_number()
        .over(Window.partitionBy("pass").orderBy(F.asc("c"), F.asc("_k")))
        .alias("rn"),
        F.count("*").over(w).alias("nk"),
    )
    pct = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"({q} * nk + 99) DIV 100"), F.col("c"))
    ).alias(f"p{q}_block")
    agg = ranked.groupBy("pass").agg(
        F.max("nk").alias("n_keys"),
        F.sum("c").alias("n_assignments"),
        F.max("c").alias("max_block"),
        pct(50),
        pct(90),
        pct(99),
        F.sum(comb2_exact(F.col("c"))).alias("candidate_pairs"),
    )
    top1 = comb2_exact(F.col("max_block"))
    return agg.select(
        "pass",
        "n_keys",
        "n_assignments",
        "max_block",
        "p50_block",
        "p90_block",
        "p99_block",
        "candidate_pairs",
        F.when(
            F.col("candidate_pairs") > 0,
            F.round(top1.cast("double") / F.col("candidate_pairs"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top1_pairs_share"),
    )


def bcubed(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
) -> DataFrame:
    """BCubed extrinsic clustering evaluation (Bagga & Baldwin 1998;
    Amigo et al. 2009 showed it's the pairwise-free metric satisfying
    all four clustering-evaluation constraints): per RECORD r with
    predicted cluster C and truth class T,

        precision(r) = |C ∩ T| / |C|,   recall(r) = |C ∩ T| / |T|,

    averaged over records; f1 is their harmonic mean. Unlike pairwise
    P/R (match_metrics), BCubed weights records not pairs, so one
    giant over-merged cluster can't dominate the score quadratically.

    Records present in only one of ``pred``/``truth`` are excluded
    (inner join) — evaluate coverage separately.

    Determinism: every set size is an exact long from a groupBy; the
    two averages are sums of per-record exact-ratio doubles (the only
    order-unpinned float op — callers round, q89 uses 6 dp).

    Scale plan (100 TB): three map-side-combinable groupBys (|C|, |T|,
    |C ∩ T|) + three joins back, all keyed on cluster/class ids; ONE
    output row, no pair materialization (BCubed is exactly the metric
    you can afford when pairwise evaluation is quadratically out of
    reach)."""
    j = pred.select(F.col(id_col).alias("_r"), F.col(pred_col).alias("_c")).join(
        truth.select(F.col(id_col).alias("_r"), F.col(truth_col).alias("_t")),
        "_r",
    )
    csize = j.groupBy("_c").agg(F.count(F.lit(1)).alias("_nc"))
    tsize = j.groupBy("_t").agg(F.count(F.lit(1)).alias("_nt"))
    osize = j.groupBy("_c", "_t").agg(F.count(F.lit(1)).alias("_no"))
    per = j.join(csize, "_c").join(tsize, "_t").join(osize, ["_c", "_t"])
    agg = per.agg(
        F.count(F.lit(1)).alias("n_records"),
        (F.sum(F.col("_no") / F.col("_nc")) / F.count(F.lit(1))).alias("_p"),
        (F.sum(F.col("_no") / F.col("_nt")) / F.count(F.lit(1))).alias("_r2"),
    )
    f1 = F.when(
        F.col("_p") + F.col("_r2") > 0,
        2 * F.col("_p") * F.col("_r2") / (F.col("_p") + F.col("_r2")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_records",
        F.col("_p").alias("bcubed_precision"),
        F.col("_r2").alias("bcubed_recall"),
        f1.alias("bcubed_f1"),
    )


def adjusted_rand_index(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) — the chance-corrected
    pair-counting complement to :func:`bcubed`: 1.0 = identical
    clusterings, ~0 = what random assignment with the same marginals
    would score, negative = worse than chance.

    Computed ENTIRELY from the (pred, truth) contingency table, never
    from materialized pairs:

        index    = SUM_ij C(n_ij, 2)
        expected = SUM_i C(a_i, 2) * SUM_j C(b_j, 2) / C(n, 2)
        max      = (SUM_i C(a_i, 2) + SUM_j C(b_j, 2)) / 2
        ari      = (index - expected) / (max - expected)

    Records present in only one input are excluded (inner join), like
    bcubed. Degenerate case (max == expected: both sides all-singleton
    or all-one-cluster) returns ari = 1.0 when index == expected (the
    clusterings agree trivially), else 0.0.

    Determinism: every C(x, 2) and sum is an exact long (comb counts
    stay < 2^63 to ~4.3e9 records per side); the final ratio is ONE
    double division — oracle-hash-safe after rounding (q92 uses 6 dp).

    Scale plan (100 TB): three map-side-combinable groupBys (the same
    shape as bcubed) reduced to ONE row each, then pure arithmetic; no
    pair materialization anywhere, so the metric costs O(contingency
    table), not O(n^2)."""
    j = pred.select(F.col(id_col).alias("_r"), F.col(pred_col).alias("_c")).join(
        truth.select(F.col(id_col).alias("_r"), F.col(truth_col).alias("_t")),
        "_r",
    )

    # comb2_exact halves the even factor BEFORE the product, so every
    # C(x, 2) stays an exact long to ~4.29e9 records per side (a naive
    # x*(x-1) intermediate would wrap at ~3.04e9; double division would
    # round above 2^53)
    _comb2 = comb2_exact

    cells = j.groupBy("_c", "_t").agg(F.count(F.lit(1)).alias("_n"))
    idx = cells.agg(
        F.sum(_comb2(F.col("_n"))).alias("_index"),
        F.sum("_n").alias("n_records"),
    )
    rows = (
        j.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(_comb2(F.col("_n"))).alias("_rows"))
    )
    cols = (
        j.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(_comb2(F.col("_n"))).alias("_cols"))
    )
    one = idx.join(F.broadcast(rows)).join(F.broadcast(cols))
    n = F.col("n_records")
    total = _comb2(n)
    # _rows * _cols would overflow int64 (each comb-sum alone can reach
    # ~9.2e18); expected is fractional anyway, so go double first
    expected = F.col("_rows").cast("double") * F.col("_cols").cast("double") / total
    # same overflow class as `expected`: the long+long sum can exceed
    # int64 before the double division, so add as doubles
    mx = (F.col("_rows").cast("double") + F.col("_cols").cast("double")) / F.lit(2.0)
    # n=1 first: C(1,2)=0 makes `expected` a division by zero (NULL in
    # Spark), which would otherwise NULL-propagate into the 0.0 branch —
    # a single shared record is a trivially identical clustering -> 1.0
    ari = F.when(total == 0, F.lit(1.0)).when(
        mx - expected != 0, (F.col("_index") - expected) / (mx - expected)
    ).otherwise(
        F.when(F.col("_index") == expected, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return one.select("n_records", ari.alias("ari"))


def blocking_quality_by_pass(
    blocks: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    key_col: str = "block_key",
    id_a_col: str = "id_a",
    id_b_col: str = "id_b",
) -> DataFrame:
    """Per-PASS sweep of :func:`blocking_quality` for a multi-pass
    scheme (key namespace = the prefix before ':', the repo-wide
    convention): one row per pass with the same exact-long counts and
    single-division ratios, so passes can be compared and the weakest
    dropped — the measurement behind "which blocking pass pays for
    itself" tuning. ``reduction_ratio`` uses the GLOBAL record count
    (all ids in ``blocks``) so rows are comparable across passes.

    Scale plan: identical to blocking_quality with one extra groupBy
    key — all aggregations stay map-side combinable, truth joins stay
    bounded by the labeled set; output rows = number of passes."""
    b2 = blocks.withColumn("_pass", F.split(F.col(key_col), ":").getItem(0))
    base = b2.groupBy("_pass").agg(
        F.countDistinct(id_col).alias("pass_records"),
        F.countDistinct(key_col).alias("n_block_keys"),
    )
    comp = (
        b2.groupBy("_pass", key_col)
        .agg(F.count("*").alias("c"))
        .groupBy("_pass")
        .agg(F.sum(comb2_exact(F.col("c"))).alias("comparisons"))
    )
    tnorm = (
        truth.select(
            F.least(id_a_col, id_b_col).alias("_ta"),
            F.greatest(id_a_col, id_b_col).alias("_tb"),
        )
        .where(F.col("_ta") != F.col("_tb"))
        .distinct()
    )
    n_truth = tnorm.agg(F.count("*").alias("truth_pairs"))
    n_all = blocks.agg(F.countDistinct(id_col).alias("n_records"))
    ka = b2.select(F.col(id_col).alias("_ta"), F.col(key_col).alias("_k"), "_pass")
    kb = b2.select(F.col(id_col).alias("_tb"), F.col(key_col).alias("_k"), "_pass")
    covered = (
        tnorm.join(ka, "_ta")
        .join(kb, ["_tb", "_k", "_pass"])
        .select("_ta", "_tb", "_pass")
        .distinct()
        .groupBy("_pass")
        .agg(F.count("*").alias("covered_pairs"))
    )
    row = (
        base.join(comp, "_pass", "left")
        .join(covered, "_pass", "left")
        .crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_all))
    )
    total = comb2_exact(F.col("n_records"))
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    comparisons = F.coalesce("comparisons", F.lit(0))
    covered_c = F.coalesce("covered_pairs", F.lit(0))
    return row.select(
        F.col("_pass").alias("pass"),
        "pass_records",
        "n_block_keys",
        comparisons.alias("comparisons"),
        ratio(total - comparisons, total).alias("reduction_ratio"),
        "truth_pairs",
        covered_c.alias("covered_pairs"),
        ratio(covered_c, F.col("truth_pairs")).alias("pairs_completeness"),
        ratio(covered_c, comparisons).alias("pairs_quality"),
    )
