"""PPRL CLK encodings: determinism, Dice behavior, hash parity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from resolve_spark.functions.pprl import clk_dice, clk_positions


def _enc(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.p for r in df.select(clk_positions(F.col("s"), **kw).alias("p")).collect()]


def test_identical_strings_identical_encodings(spark):
    a, b = _enc(spark, ["john smith", "john smith"], hash_impl="portable")
    assert a == b and len(a) > 0
    assert a == sorted(set(a))  # sorted, distinct


def test_positions_match_python_replica(spark):
    (got,) = _enc(spark, ["ab"], m=512, k=4, q=2, hash_impl="portable")
    pad = "_ab_"
    grams = [pad[i : i + 2] for i in range(len(pad) - 1)]
    want = sorted(
        {
            int(hashlib.md5(f"{seed}:{g}".encode()).hexdigest()[:15], 16) % 512
            for g in grams
            for seed in range(4)
        }
    )
    assert got == want


def test_dice_orders_by_similarity(spark):
    df = spark.createDataFrame(
        [("john smith", "john smith"), ("john smith", "jon smith"), ("john smith", "xqzvy")],
        "a string, b string",
    )
    enc = df.select(
        clk_positions(F.col("a"), hash_impl="portable").alias("pa"),
        clk_positions(F.col("b"), hash_impl="portable").alias("pb"),
    )
    d = [r.d for r in enc.select(clk_dice("pa", "pb").alias("d")).collect()]
    assert d[0] == pytest.approx(1.0)
    assert d[0] > d[1] > d[2]


def test_null_encodes_as_empty(spark):
    a, b = _enc(spark, [None, ""], hash_impl="portable")
    assert a == b and 1 <= len(a) <= 4  # one '__' gram x k=4 hashes


def test_fast_impl_runs(spark):
    (got,) = _enc(spark, ["john"], hash_impl="fast")
    assert len(got) > 0
    with pytest.raises(ValueError):
        _enc(spark, ["john"], hash_impl="nope")


def test_clk_dice_properties_batch(spark):
    """Dice bounds/symmetry/identity over a randomized ASCII batch in
    ONE Spark job (the property-parity pattern)."""
    import random
    import string

    from pyspark.sql import functions as F

    rng = random.Random(42)
    alpha = string.ascii_lowercase + " .-"
    vals = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 24)))
        for _ in range(120)
    ]
    pairs = [(vals[i], vals[(i * 7 + 3) % len(vals)]) for i in range(len(vals))]
    df = spark.createDataFrame(pairs, "a string, b string")
    enc = df.select(
        "a", "b",
        clk_positions(F.col("a"), hash_impl="portable").alias("pa"),
        clk_positions(F.col("b"), hash_impl="portable").alias("pb"),
    )
    got = enc.select(
        "a", "b",
        clk_dice("pa", "pb").alias("dab"),
        clk_dice("pb", "pa").alias("dba"),
        clk_dice("pa", "pa").alias("self_"),
    ).collect()
    for r in got:
        assert 0.0 <= r.dab <= 1.0
        assert r.dab == r.dba  # symmetric
        assert r.self_ == pytest.approx(1.0)
        if r.a == r.b:
            assert r.dab == pytest.approx(1.0)
