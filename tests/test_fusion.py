"""Survivorship fusion: hand-computed golden records."""

import pytest

from resolve_spark.operators.fusion import fuse_clusters


def _data(spark):
    ents = spark.createDataFrame(
        [
            (1, "ACME", "a@x.com", 10.0),
            (2, "ACME", "bb@x.com", 30.0),
            (3, "Acme Corporation", "", 20.0),
            (5, "Zed", None, 5.0),
            (9, None, "z@y.org", None),
        ],
        "id bigint, name string, email string, bal double",
    )
    asg = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c1"), (5, "c2"), (9, "c2"), (99, "c3")],
        "id bigint, cluster_id string",
    )
    return ents, asg


def test_fuse_clusters_rules(spark):
    ents, asg = _data(spark)
    out = {
        r["cluster_id"]: r
        for r in fuse_clusters(
            ents,
            asg,
            {"name": "mode", "email": "longest", "bal": "max"},
        ).collect()
    }
    c1, c2 = out["c1"], out["c2"]
    # unassigned-entity-free cluster c3 has no member rows -> absent
    assert "c3" not in out
    assert (c1["cluster_size"], c1["canonical_id"]) == (3, 1)
    assert c1["name"] == "ACME"  # 2-vote mode beats the long variant
    assert c1["email"] == "bb@x.com"  # longest non-empty
    assert c1["bal"] == 30.0
    assert c2["name"] == "Zed"  # NULL excluded from mode
    assert c2["email"] == "z@y.org"
    assert c2["bal"] == 5.0


def test_fuse_clusters_first_min_and_ties(spark):
    ents, asg = _data(spark)
    out = {
        r["cluster_id"]: r
        for r in fuse_clusters(
            ents, asg, {"email": "first", "bal": "min", "name": "mode"}
        ).collect()
    }
    # 'first' = the min-id member's value, even if another is longer
    assert out["c1"]["email"] == "a@x.com"
    assert out["c1"]["bal"] == 10.0
    # c2 min-id member is 5 whose email is NULL -> first keeps NULL
    assert out["c2"]["email"] is None
    # mode tie (1 vote each in c2 after NULL-drop) -> smallest value
    two = spark.createDataFrame(
        [(1, "b"), (2, "a")], "id bigint, v string"
    )
    a2 = spark.createDataFrame([(1, "x"), (2, "x")], "id bigint, cluster_id string")
    r = fuse_clusters(two, a2, {"v": "mode"}).collect()[0]
    assert r["v"] == "a"


def test_fuse_clusters_bad_rule(spark):
    ents, asg = _data(spark)
    with pytest.raises(ValueError):
        fuse_clusters(ents, asg, {"name": "median"})


def test_fuse_clusters_min_max_skip_empty_strings(spark):
    """min/max must not crown "" ('' sorts before every real value —
    one blank scrape artifact would blank the fused field); a cluster
    with ONLY empty/NULL values fuses to NULL."""
    ents = spark.createDataFrame(
        [(1, "", 3.0), (2, "Austin", 1.0), (3, None, 2.0), (4, "", None),
         (5, "", None), (6, None, 7.0)],
        "id bigint, city string, bal double",
    )
    asg = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c1"), (4, "c2"), (5, "c2"), (6, "c2")],
        "id bigint, cluster_id string",
    )
    out = {
        r["cluster_id"]: r
        for r in fuse_clusters(ents, asg, {"city": "min", "bal": "max"}).collect()
    }
    assert out["c1"]["city"] == "Austin"   # not ""
    assert out["c1"]["bal"] == 3.0         # numerics unaffected
    assert out["c2"]["city"] is None       # only ""/NULL -> NULL
    assert out["c2"]["bal"] == 7.0


def test_fusion_conflicts_requires_fields(spark):
    from resolve_spark.operators.fusion import fusion_conflicts

    ents, asg = _data(spark)
    with pytest.raises(ValueError, match="non-empty"):
        fusion_conflicts(ents, asg, fields=[])


def test_fusion_conflicts_hand_computed(spark):
    from resolve_spark.operators.fusion import fusion_conflicts

    ents = spark.createDataFrame(
        [
            ("a", "ACME", "NY", 1.0),
            ("b", "ACME", "NJ", 1.0),   # state conflicts in c1
            ("c", "Zed", None, 2.0),    # singleton-ish, no conflict
            ("d", "Zed", None, 2.0),
        ],
        "id string, name string, state string, bal double",
    )
    asg = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2")],
        "id string, cluster_id string",
    )
    out = fusion_conflicts(ents, asg, ["name", "state", "bal"])
    rows = {r.cluster_id: r for r in out.collect()}
    assert set(rows) == {"c1"}  # c2 has zero conflicts (NULLs don't count)
    c1 = rows["c1"]
    assert c1.cluster_size == 2 and c1.state_distinct == 2
    assert c1.name_distinct == 1 and c1.n_conflict_fields == 1
    full = fusion_conflicts(ents, asg, ["name"], only_conflicted=False)
    assert full.count() == 2
