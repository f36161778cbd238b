"""blocking_quality: hand-computed metrics on a toy blocking scheme."""

import pytest
from pyspark.sql import functions as F

from resolve_spark.operators.diagnostics import blocking_quality


def test_blocking_quality_exact(spark):
    # 6 records; pass A groups {1,2,3} and {4,5}; pass B groups {3,4}
    blocks = spark.createDataFrame(
        [(1, "a:x"), (2, "a:x"), (3, "a:x"), (4, "a:y"), (5, "a:y"),
         (6, "a:z"), (3, "b:p"), (4, "b:p")],
        "id bigint, block_key string",
    )
    # truth: (1,2) covered by a:x, (3,4) covered ONLY by pass B,
    # (5,6) not covered; (2,1) is a duplicate after normalization and
    # (6,6) is a self-pair -> both dropped
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 1), (6, 6)],
        "id_a bigint, id_b bigint",
    )
    row = blocking_quality(blocks, truth).collect()[0]
    assert row["n_records"] == 6
    assert row["n_block_keys"] == 4
    # C(3,2) + C(2,2->1) + C(1,2->0) + C(2,2->1) = 3 + 1 + 0 + 1
    assert row["comparisons"] == 5
    assert row["total_pairs"] == 15
    assert row["reduction_ratio"] == round((15 - 5) / 15, 6)
    assert row["truth_pairs"] == 3
    assert row["covered_pairs"] == 2
    assert row["pairs_completeness"] == round(2 / 3, 6)
    assert row["pairs_quality"] == round(2 / 5, 6)


def test_blocking_quality_empty_truth_and_singletons(spark):
    blocks = spark.createDataFrame(
        [(1, "k1"), (2, "k2")], "id bigint, block_key string"
    )
    truth = spark.createDataFrame([], "id_a bigint, id_b bigint")
    row = blocking_quality(blocks, truth).collect()[0]
    # all-singleton blocking: zero comparisons, full reduction
    assert row["comparisons"] == 0
    assert row["reduction_ratio"] == 1.0
    assert row["truth_pairs"] == 0 and row["covered_pairs"] == 0
    # guarded ratios report 0.0, not NULL/NaN
    assert row["pairs_completeness"] == 0.0
    assert row["pairs_quality"] == 0.0


def test_match_metrics_single(spark):
    from resolve_spark.operators.diagnostics import match_metrics

    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 1), (7, 7)],  # dup + self-pair dropped
        "id_a bigint, id_b bigint",
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (8, 9)], "id_a bigint, id_b bigint"
    )
    row = match_metrics(pred, truth).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 1)
    assert row["precision"] == round(2 / 3, 6)
    assert row["recall"] == round(2 / 3, 6)
    assert row["f1"] == round(4 / 6, 6)
    assert "threshold" not in row.asDict()


def test_match_metrics_sweep(spark):
    import pytest as _pytest

    from resolve_spark.operators.diagnostics import match_metrics

    # duplicate pair (1,2)/(2,1): max score 0.9 must win
    pred = spark.createDataFrame(
        [(1, 2, 0.4), (2, 1, 0.9), (3, 4, 0.6), (5, 6, 0.8)],
        "id_a bigint, id_b bigint, score double",
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (8, 9)], "id_a bigint, id_b bigint"
    )
    rows = {
        r["threshold"]: r
        for r in match_metrics(
            pred, truth, score_col="score", thresholds=[0.5, 0.7]
        ).collect()
    }
    assert set(rows) == {0.5, 0.7}
    # t=0.5: hits {12:.9, 34:.6, 56:.8} -> tp=2 fp=1 fn=1
    assert (rows[0.5]["tp"], rows[0.5]["fp"], rows[0.5]["fn"]) == (2, 1, 1)
    # t=0.7: hits {12:.9, 56:.8} -> tp=1 fp=1 fn=2
    assert (rows[0.7]["tp"], rows[0.7]["fp"], rows[0.7]["fn"]) == (1, 1, 2)
    assert rows[0.7]["f1"] == round(2 / 5, 6)
    with _pytest.raises(ValueError):
        match_metrics(pred, truth, thresholds=[0.5])
    with _pytest.raises(ValueError):
        match_metrics(pred, truth, score_col="score", thresholds=[])


def test_block_skew_profile_exact(spark):
    from resolve_spark.operators.diagnostics import block_skew_profile

    rows = (
        [(i, "c:hot") for i in range(4)]          # one hot key, C(4,2)=6 pairs
        + [(10, "c:k1"), (11, "c:k1")]            # C(2,2)=1
        + [(12, "c:k2")]                          # singleton
        + [(i, f"p:{i}") for i in range(5)]       # balanced pass: all singletons
    )
    df = spark.createDataFrame(rows, ["id", "block_key"])
    got = {r["pass"]: r.asDict() for r in block_skew_profile(df).collect()}
    c = got["c"]
    # sizes for pass c sorted asc: [1, 2, 4] -> p50 = rank ceil(1.5)=2 -> 2
    assert (c["n_keys"], c["n_assignments"], c["max_block"]) == (3, 7, 4)
    assert (c["p50_block"], c["p90_block"], c["p99_block"]) == (2, 4, 4)
    assert c["candidate_pairs"] == 7 and c["top1_pairs_share"] == round(6 / 7, 6)
    p = got["p"]
    assert (p["n_keys"], p["max_block"], p["candidate_pairs"]) == (5, 1, 0)
    assert p["top1_pairs_share"] == 0.0


def test_match_metrics_score_col_without_thresholds(spark):
    """With score_col but NO sweep, every pred pair counts as predicted
    (regression: a 1.0 gate silently zeroed tp/fp for scores < 1.0)."""
    from resolve_spark.operators.diagnostics import match_metrics

    pred = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.6), (5, 6, 0.4)], ["id_a", "id_b", "score"]
    )
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], ["id_a", "id_b"])
    row = match_metrics(pred, truth, score_col="score").collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 1)


def test_match_metrics_null_score_counts_as_predicted(spark):
    """A pred pair whose score is NULL is still PREDICTED in the
    no-thresholds mode (the full-outer join must not make it look like
    a truth-only row); in a sweep it can never clear a numeric
    threshold, so a true pair with only a NULL score reads as fn."""
    from resolve_spark.operators.diagnostics import match_metrics

    pred = spark.createDataFrame(
        [(1, 2, None), (3, 4, 0.9), (5, 6, None)],
        "id_a bigint, id_b bigint, score double",
    )
    truth = spark.createDataFrame([(1, 2), (3, 4)], ["id_a", "id_b"])
    row = match_metrics(pred, truth, score_col="score").collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 0)
    sweep = {
        r["threshold"]: r
        for r in match_metrics(
            pred, truth, score_col="score", thresholds=[0.5]
        ).collect()
    }
    assert (sweep[0.5]["tp"], sweep[0.5]["fp"], sweep[0.5]["fn"]) == (1, 0, 1)


def test_comb2_exact_no_intermediate_overflow(spark):
    """C(c, 2) must stay an exact long for counts whose naive c*(c-1)
    intermediate wraps int64 (c > ~3.04e9)."""
    import math

    from resolve_spark.operators.pairs import comb2_exact

    cs = [0, 1, 2, 3, 4, 5, 1000, 3_100_000_000, 4_200_000_000]
    df = spark.createDataFrame([(c,) for c in cs], "c bigint")
    got = {r["c"]: r["k"] for r in df.select("c", comb2_exact(F.col("c")).alias("k")).collect()}
    for c in cs:
        assert got[c] == math.comb(c, 2), c


def test_adjusted_rand_large_single_cluster_no_overflow(spark):
    """100k records all in ONE cluster on both sides: the comb-sums are
    ~5e9 each, so their int64 product would wrap (~2.5e19 > 2^63) —
    expected must go through doubles and ari must still read 1.0."""
    from resolve_spark.operators.diagnostics import adjusted_rand_index

    n = 100_000
    base = spark.range(n).select(F.col("id").cast("string").alias("id"))
    pred = base.withColumn("cluster_id", F.lit("x"))
    truth = base.withColumn("truth_id", F.lit("y"))
    row = adjusted_rand_index(pred, truth).collect()[0]
    assert row.n_records == n
    assert row.ari == 1.0


def test_bcubed_hand_computed(spark):
    from resolve_spark.operators.diagnostics import bcubed
    truth = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y"), (4, "Y")], "id bigint, truth_id string"
    )
    # over-merge: everything in one predicted cluster
    pred_merged = spark.createDataFrame(
        [(i, "c") for i in (1, 2, 3, 4)], "id bigint, cluster_id string"
    )
    r = bcubed(pred_merged, truth).collect()[0]
    assert r["n_records"] == 4
    assert r["bcubed_precision"] == 0.5      # |C∩T|/|C| = 2/4 per record
    assert r["bcubed_recall"] == 1.0
    assert abs(r["bcubed_f1"] - 2 / 3) < 1e-12
    # perfect clustering
    r2 = bcubed(truth.withColumnRenamed("truth_id", "cluster_id"), truth).collect()[0]
    assert (r2["bcubed_precision"], r2["bcubed_recall"], r2["bcubed_f1"]) == (1.0, 1.0, 1.0)
    # record 9 only in pred -> excluded by the inner join
    pred_extra = pred_merged.union(
        spark.createDataFrame([(9, "c")], "id bigint, cluster_id string"))
    assert bcubed(pred_extra, truth).collect()[0]["n_records"] == 4


def test_adjusted_rand_hand_computed(spark):
    from resolve_spark.operators.diagnostics import adjusted_rand_index

    # classic example: pred {a,b}{c,d,e}, truth {a,b,c}{d,e}
    pred = spark.createDataFrame(
        [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p2"), ("e", "p2")],
        "id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t1"), ("d", "t2"), ("e", "t2")],
        "id string, truth_id string",
    )
    row = adjusted_rand_index(pred, truth).collect()[0]
    # contingency: n11=2, n21=1, n22=2 -> index = 1+0+1 = 2
    # rows: C(2,2)+C(3,2) = 4; cols: C(3,2)+C(2,2) = 4; total C(5,2)=10
    # expected = 16/10 = 1.6; max = 4; ari = (2-1.6)/(4-1.6) = 1/6
    assert row.n_records == 5
    assert abs(row.ari - 1 / 6) < 1e-12


def test_adjusted_rand_perfect_and_degenerate(spark):
    from resolve_spark.operators.diagnostics import adjusted_rand_index

    pred = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "id string, cluster_id string"
    )
    same = pred.withColumnRenamed("cluster_id", "truth_id")
    assert adjusted_rand_index(pred, same).collect()[0].ari == 1.0
    # all-singletons on both sides: max == expected == index == 0 -> 1.0
    p1 = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "id string, cluster_id string"
    )
    t1 = p1.withColumnRenamed("cluster_id", "truth_id")
    assert adjusted_rand_index(p1, t1).collect()[0].ari == 1.0
    # n=1: C(1,2)=0 divides expected by zero; the trivially identical
    # single-record clustering must read 1.0, not NULL-propagate to 0
    pn = spark.createDataFrame([("a", "x")], "id string, cluster_id string")
    tn = pn.withColumnRenamed("cluster_id", "truth_id")
    assert adjusted_rand_index(pn, tn).collect()[0].ari == 1.0


def test_blocking_quality_by_pass(spark):
    from resolve_spark.operators.diagnostics import blocking_quality_by_pass

    blocks = spark.createDataFrame(
        [
            ("a", "p1:k1"), ("b", "p1:k1"), ("c", "p1:k2"),
            ("a", "p2:x"), ("b", "p2:y"), ("c", "p2:x"), ("d", "p2:x"),
        ],
        "id string, block_key string",
    )
    truth = spark.createDataFrame(
        [("a", "b"), ("c", "a")], "id_a string, id_b string"
    )
    rows = {r["pass"]: r for r in blocking_quality_by_pass(blocks, truth).collect()}
    # pass p1: keys k1 (a,b), k2 (c) -> comparisons 1; covers (a,b) only
    p1 = rows["p1"]
    assert p1.pass_records == 3 and p1.n_block_keys == 2
    assert p1.comparisons == 1 and p1.covered_pairs == 1
    assert p1.truth_pairs == 2 and p1.pairs_completeness == 0.5
    assert p1.pairs_quality == 1.0
    # pass p2: x = {a,c,d} (3 comparisons), y = {b} -> covers (a,c) only
    p2 = rows["p2"]
    assert p2.pass_records == 4 and p2.comparisons == 3
    assert p2.covered_pairs == 1 and p2.pairs_quality == pytest.approx(1 / 3)
    # reduction ratio against GLOBAL n_records=4 -> total 6
    assert p1.reduction_ratio == pytest.approx(round(5 / 6, 6))
    assert p2.reduction_ratio == pytest.approx(0.5)
