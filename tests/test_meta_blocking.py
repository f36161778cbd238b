"""meta_blocking: blocking-graph construction + WEP/WNP pruning,
checked against hand-computed graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.operators.meta_blocking import (
    blocking_graph_edges,
    meta_block_prune,
)


def _recs(spark, rows):
    return spark.createDataFrame(rows, "id string, block_keys array<string>")


def test_edges_cbs_and_purging(spark):
    # k1 = {a,b,c}, k2 = {a,b}, k3 = {c,d}, khot = everyone (purged at 3)
    rows = [
        ("a", ["k1", "k2", "khot"]),
        ("b", ["k1", "k2", "khot"]),
        ("c", ["k1", "k3", "khot"]),
        ("d", ["k3", "khot"]),
    ]
    edges = blocking_graph_edges(_recs(spark, rows), "id", max_block_size=3)
    got = {(r.id_a, r.id_b): r.cbs for r in edges.collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1, ("c", "d"): 1}


def test_wnp_keeps_strong_edges(spark):
    rows = [
        ("a", ["k1", "k2", "khot"]),
        ("b", ["k1", "k2", "khot"]),
        ("c", ["k1", "k3", "khot"]),
        ("d", ["k3", "khot"]),
    ]
    # node means: a (2+1)/2=1.5, b 1.5, c (1+1+1)/3=1, d 1
    # ab: 2 >= 1.5 keep; ac: 1 >= 1 (c's mean) keep; bc keep; cd keep
    kept = meta_block_prune(
        _recs(spark, rows), "id", scheme="wnp", max_block_size=3
    )
    got = {(r.id_a, r.id_b) for r in kept.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}


def test_wep_global_mean(spark):
    rows = [
        ("a", ["k1", "k2"]),
        ("b", ["k1", "k2"]),
        ("c", ["k1"]),
    ]
    # edges: ab cbs 2, ac 1, bc 1 -> global mean 4/3 -> only ab survives
    kept = meta_block_prune(_recs(spark, rows), "id", scheme="wep")
    got = {(r.id_a, r.id_b) for r in kept.collect()}
    assert got == {("a", "b")}


def test_js_weight(spark):
    rows = [
        ("a", ["k1", "k2"]),
        ("b", ["k1", "k2"]),
        ("c", ["k1", "k3"]),
    ]
    edges = meta_block_prune(
        _recs(spark, rows), "id", weight="js", scheme="wnp"
    ).collect()
    w = {(r.id_a, r.id_b): r.weight for r in edges}
    # ab: cbs 2, |B|=2 each -> 2/(2+2-2)=1.0; ac: 1/(2+2-1)=1/3
    assert w[("a", "b")] == pytest.approx(1.0)
    # ac survives via c's endpoint mean (both of c's edges weigh 1/3)
    assert w[("a", "c")] == pytest.approx(1 / 3)


def test_bad_args(spark):
    df = _recs(spark, [("a", ["k1"])])
    with pytest.raises(ValueError):
        meta_block_prune(df, "id", weight="nope")
    with pytest.raises(ValueError):
        meta_block_prune(df, "id", scheme="nope")


def test_cnp_topk_per_node(spark):
    rows = [
        ("a", ["k1", "k2", "k3"]),
        ("b", ["k1", "k2", "k3"]),
        ("c", ["k1", "k4"]),
        ("d", ["k4", "k5"]),
        ("e", ["k4", "k5"]),
    ]
    # edges: ab cbs 3; ac/bc 1; cd/ce 1; de 2
    kept = meta_block_prune(_recs(spark, rows), "id", scheme="cnp", k=1)
    got = {(r.id_a, r.id_b) for r in kept.collect()}
    # per-node top-1 (ties by id_a, id_b): a->ab, b->ab, c->ac, d->de, e->de
    assert got == {("a", "b"), ("a", "c"), ("d", "e")}
