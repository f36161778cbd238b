"""Fellegi-Sunter EM estimation and cluster graph metrics.

FS: a planted two-population pair set (matches agree on most fields,
non-matches rarely) must recover m >> u per field, a lambda near the
planted match rate, and a near-1 posterior for the all-agree pattern.
Cluster metrics: hand-computed counts on a toy graph (triangle, path,
singleton, cross-cluster edge).
"""

import pytest

from resolve_spark.operators.clustering import cluster_graph_metrics
from resolve_spark.operators.fellegi_sunter import (
    estimate_fs,
    fs_match_probability,
    fs_params_df,
    fs_pattern_df,
)


def _planted_pairs(spark):
    # 200 matches: g1 always, g2 90% (18/20 per block of 20), g3 80%
    # 1800 non-matches: g1 10%, g2 5%, g3 20% — deterministic via modulo
    rows = []
    for i in range(200):
        rows.append((1, 1 if i % 10 != 0 else 0, 1 if i % 5 != 0 else 0))
    for i in range(1800):
        rows.append((1 if i % 10 == 0 else 0,
                     1 if i % 20 == 0 else 0,
                     1 if i % 5 == 0 else 0))
    return spark.createDataFrame(rows, "g1 int, g2 int, g3 int")


def test_estimate_fs_recovers_planted_structure(spark):
    pairs = _planted_pairs(spark)
    params = estimate_fs(pairs, ["g1", "g2", "g3"], iterations=30)
    assert params.fields == ("g1", "g2", "g3")
    # match class found at roughly the planted 10% rate
    assert 0.05 < params.lam < 0.25
    for f in range(3):
        assert params.m[f] > params.u[f] + 0.3, (params.m, params.u)
    # all-agree pattern is near-certainly a match, all-disagree is not
    assert params.posterior((1, 1, 1)) > 0.95
    assert params.posterior((0, 0, 0)) < 0.05


def test_estimate_fs_deterministic(spark):
    pairs = _planted_pairs(spark)
    a = estimate_fs(pairs, ["g1", "g2", "g3"], iterations=7)
    b = estimate_fs(pairs, ["g1", "g2", "g3"], iterations=7)
    assert a == b  # bit-identical floats: fixed pattern + field order


def test_fs_params_and_pattern_dfs(spark):
    pairs = _planted_pairs(spark)
    params = estimate_fs(pairs, ["g1", "g2", "g3"], iterations=10)
    pdf = fs_params_df(spark, params).collect()
    assert [r["field"] for r in pdf] == ["g1", "g2", "g3"]
    for r in pdf:
        # agreement is match evidence -> positive log2(m/u); disagree <0
        assert r["agree_weight"] > 0 > r["disagree_weight"]
        assert r["lam"] == pytest.approx(params.lam)
    patt = fs_pattern_df(spark, params)
    rows = {tuple(r[:3]): r["match_probability"] for r in patt.collect()}
    assert len(rows) == 8
    assert rows[(1, 1, 1)] == pytest.approx(params.posterior((1, 1, 1)))


def test_fs_match_probability_column_is_native_and_exact(spark):
    pairs = _planted_pairs(spark)
    params = estimate_fs(pairs, ["g1", "g2", "g3"], iterations=5)
    scored = pairs.withColumn("p", fs_match_probability(params))
    # literal CASE chain: no python workers in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    for r in scored.distinct().collect():
        g = (r["g1"], r["g2"], r["g3"])
        assert r["p"] == pytest.approx(params.posterior(g), abs=0)


def test_estimate_fs_degenerate_field_clipped(spark):
    # g2 agrees on EVERY pair -> m and u both clip toward 1-1e-6 and
    # the field carries ~zero evidence either way
    pairs = spark.createDataFrame(
        [(1, 1), (1, 1), (0, 1), (0, 1)] * 25, "g1 int, g2 int"
    )
    params = estimate_fs(pairs, ["g1", "g2"], iterations=10)
    assert 0 < params.m[1] < 1 and 0 < params.u[1] < 1
    assert abs(params.posterior((1, 1)) - params.posterior((1, 0))) >= 0
    with pytest.raises(ValueError):
        estimate_fs(pairs.where("g1 > 5"), ["g1", "g2"])


def test_cluster_graph_metrics_hand_computed(spark):
    # cluster A: triangle 1-2-3 (+duplicate/reversed edge noise)
    # cluster B: path 4-5-6 (two bridge edges)
    # cluster C: singleton 7
    # cross-cluster edge (1, 4) must be dropped
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (4, 5), (5, 6), (1, 4)],
        "id_a bigint, id_b bigint",
    )
    asg = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "B"), (7, "C")],
        "id bigint, cluster_id string",
    )
    out = {r["cluster_id"]: r for r in cluster_graph_metrics(edges, asg).collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a["n_nodes"], a["n_edges"], a["n_triangles"], a["n_bridges"]) == (3, 3, 1, 0)
    assert a["density"] == 1.0 and a["avg_degree"] == 2.0
    assert (b["n_nodes"], b["n_edges"], b["n_triangles"], b["n_bridges"]) == (3, 2, 0, 2)
    assert b["density"] == round(2 * 2 / 6, 6)
    assert (c["n_nodes"], c["n_edges"], c["density"], c["n_bridges"]) == (1, 0, 0.0, 0)


def test_cluster_graph_metrics_two_node_cluster_not_bridge(spark):
    # a 2-node cluster's only edge has no common neighbor but n<3 -> 0
    edges = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    asg = spark.createDataFrame([(1, "X"), (2, "X")], "id bigint, cluster_id string")
    r = cluster_graph_metrics(edges, asg).collect()[0]
    assert (r["n_edges"], r["n_bridges"], r["density"]) == (1, 0, 1.0)


def test_tf_adjusted_weights(spark):
    from resolve_spark.operators.fellegi_sunter import tf_adjusted_weights
    import math
    # value shares: x 6/10, y 3/10, z 1/10; NULL and '' excluded
    recs = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [("z",)] + [(None,), ("",)],
        "v string",
    )
    out = {r["value"]: r for r in tf_adjusted_weights(recs, "v", m=0.9).collect()}
    assert set(out) == {"x", "y", "z"}
    assert out["x"]["share"] == 0.6 and out["z"]["n_records"] == 1
    # rare value -> much stronger agreement evidence
    assert out["z"]["agree_weight"] > out["x"]["agree_weight"] + 2.0
    assert out["z"]["agree_weight"] == pytest.approx(math.log2(0.9 / 0.1))
    assert all(r["field"] == "v" for r in out.values())


def test_fs_posterior_edges(spark):
    from resolve_spark.operators.fellegi_sunter import fs_posterior_edges
    # 40 strong pairs (both fields ~1.0), 160 weak; one row with a
    # missing map key (treated as 0.0 via coalesce)
    rows = []
    for i in range(40):
        rows.append((i, 1000 + i, {"name": 0.95, "zip": 1.0}))
    for i in range(160):
        rows.append((i, 2000 + i, {"name": 0.3, "zip": 0.0 if i % 4 else 1.0}))
    rows.append((99, 3000, {"zip": 1.0}))  # no "name" key
    edges = spark.createDataFrame(
        rows, "id_a bigint, id_b bigint, field_scores map<string,double>"
    )
    scored, params = fs_posterior_edges(
        edges, ["name", "zip"], agree_at=0.9, iterations=25
    )
    assert set(["g_name", "g_zip", "match_probability"]) <= set(scored.columns)
    got = {(r["g_name"], r["g_zip"]): r["match_probability"]
           for r in scored.select("g_name", "g_zip", "match_probability")
           .distinct().collect()}
    assert got[(1, 1)] > 0.9 > got[(0, 0)]
    assert got[(1, 1)] == pytest.approx(params.posterior((1, 1)))
    # the keyless row binarized to (0, 1)
    missing = scored.where("id_b = 3000").collect()[0]
    assert (missing["g_name"], missing["g_zip"]) == (0, 1)


def test_estimate_fs_levels_recovers_bands(spark):
    from resolve_spark.operators.fellegi_sunter import estimate_fs_levels
    rows = []
    # 150 matches: name mostly level 2; zip level 2 with a 30% NULL
    # level (3) planted INDEPENDENTLY at the same rate in both classes
    for i in range(150):
        rows.append((2 if i % 20 else 0, 3 if i % 10 < 3 else 2))
    # 1350 non-matches: name mostly level 0
    for i in range(1350):
        rows.append((1 if i % 20 == 0 else 0, 3 if i % 10 < 3 else 0))
    pairs = spark.createDataFrame(rows, "g_name int, g_zip int")
    params = estimate_fs_levels(
        pairs, [("g_name", 3), ("g_zip", 4)], iterations=30
    )
    assert 0.05 < params.lam < 0.2
    # level 2 is match evidence, level 0 is non-match evidence
    assert params.m[0][2] > params.u[0][2]
    assert params.m[0][0] < params.u[0][0]
    assert params.posterior((2, 2)) > 0.9 > params.posterior((0, 0))
    # the NULL level (3) appears at the SAME rate in both classes ->
    # far weaker evidence than the informative level 2 (the Splink
    # null-level property; unsupervised EM leaves ~1-bit finite-sample
    # drift, so compare against the informative weight, not zero)
    import math
    null_w = math.log2(params.m[1][3] / params.u[1][3])
    info_w = math.log2(params.m[1][2] / params.u[1][2])
    assert abs(null_w) < 1.5 < info_w / 2
    # per-class level distributions stay distributions (pre-clip sums)
    assert sum(params.m[0]) == pytest.approx(1.0, abs=1e-4)
    assert sum(params.u[1]) == pytest.approx(1.0, abs=1e-4)


def test_estimate_fs_levels_validates_range(spark):
    from resolve_spark.operators.fellegi_sunter import estimate_fs_levels
    pairs = spark.createDataFrame([(0,), (1,), (2,)], "g int")
    with pytest.raises(ValueError):
        estimate_fs_levels(pairs, [("g", 2)], iterations=2)


def test_fs_level_params_df_shape(spark):
    from resolve_spark.operators.fellegi_sunter import (
        estimate_fs_levels, fs_level_params_df)
    pairs = spark.createDataFrame(
        [(0, 0)] * 50 + [(1, 2)] * 10 + [(2, 1)] * 5, "ga int, gb int"
    )
    params = estimate_fs_levels(pairs, [("ga", 3), ("gb", 3)], iterations=5)
    rows = fs_level_params_df(spark, params).collect()
    assert len(rows) == 6
    assert {(r["field"], r["level"]) for r in rows} == {
        ("ga", 0), ("ga", 1), ("ga", 2), ("gb", 0), ("gb", 1), ("gb", 2)}


def test_prune_bridge_edges(spark):
    from resolve_spark.operators.clustering import (
        connected_components, prune_bridge_edges)
    # cluster A: triangle 1-2-3 + bridge 3-4 + triangle 4-5-6 -> the
    # bridge (no common neighbor) must go, splitting A in two;
    # cluster B: pair 7-8 (n<3 -> its only edge survives)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 8)],
        "id_a bigint, id_b bigint",
    )
    asg = spark.createDataFrame(
        [(i, "A") for i in range(1, 7)] + [(7, "B"), (8, "B")],
        "id bigint, cluster_id string",
    )
    kept = prune_bridge_edges(edges, asg)
    kept_pairs = {(r["id_a"], r["id_b"]) for r in kept.collect()}
    assert (3, 4) not in kept_pairs
    assert (7, 8) in kept_pairs and len(kept_pairs) == 7
    cc = {r["rid"]: r["cluster_id"] for r in
          connected_components(kept).collect()}
    assert cc[1] == cc[2] == cc[3]
    assert cc[4] == cc[5] == cc[6]
    assert cc[3] != cc[4]  # the over-merge is repaired
    assert cc[7] == cc[8]


def test_estimate_fs_rejects_null_indicators(spark):
    pairs = spark.createDataFrame(
        [(1, 1), (None, 0), (0, 1)], "g1 int, g2 int"
    )
    with pytest.raises(ValueError, match="NULL"):
        estimate_fs(pairs, ["g1", "g2"], iterations=2)


def test_estimate_fs_levels_rejects_null_levels(spark):
    """Same guard as estimate_fs: a NULL comparison level (a ladder
    that passed NULLs through) must raise a clear ValueError, not die
    in int(None)."""
    from resolve_spark.operators.fellegi_sunter import estimate_fs_levels

    pairs = spark.createDataFrame(
        [(1, 1), (None, 0), (0, 1)], "g1 int, g2 int"
    )
    with pytest.raises(ValueError, match="NULL"):
        estimate_fs_levels(pairs, [("g1", 2), ("g2", 2)], iterations=2)


def test_uncertainty_sample(spark):
    from resolve_spark.operators.sampling import uncertainty_sample
    rows = [(i, 100 + i, p) for i, p in enumerate(
        [0.01, 0.49, 0.52, 0.98, 0.5, 0.6, 0.35, 0.95, None])]
    scored = spark.createDataFrame(
        rows, "id_a bigint, id_b bigint, match_probability double"
    )
    top3 = uncertainty_sample(scored, 3)
    got = [(r["id_a"], r["match_probability"]) for r in top3.collect()]
    # the NULL-probability row (id_a=8) must NOT occupy a queue slot:
    # Spark sorts NULLs first ascending, so unfiltered it would rank
    # ahead of every genuinely uncertain pair
    assert got == [(4, 0.5), (1, 0.49), (2, 0.52)]
    # top-k heap + merge, never a global sort
    plan = top3._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Sort " not in plan
