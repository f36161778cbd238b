"""Text-analysis operator tests (lang-ID, quality, tokens, fingerprints,
SimHash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.functions import text as TX


def _one(spark, fn, value):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(fn(F.col("x")).alias("y")).collect()[0]["y"]


def test_lang_id(spark):
    cases = {
        "the cat sat on the mat and it was happy for the day": "en",
        "der hund ist nicht mit der katze und das ist gut": "de",
        "le chat est dans la maison et les oiseaux sont pas la": "fr",
        "el perro es una mascota que vive con la familia por la casa": "es",
        "这是一个中文文档的例子 包含很多汉字": "zh",
        "xyzzy plugh qwark blorp": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], ["x"])
    got = [r["y"] for r in df.select(TX.lang_id(F.col("x")).alias("y")).collect()]
    assert got == list(cases.values())


def test_quality_score_ordering(spark):
    good = ("This is a well formed document with reasonable sentences. "
            "It has the usual structure that a quality filter likes to see "
            "and it was written for the reader in plain language.")
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    short = "hi"
    df = spark.createDataFrame([(good,), (junk,), (short,)], ["x"])
    scores = [r["y"] for r in df.select(TX.quality_score(F.col("x")).alias("y")).collect()]
    assert scores[0] > scores[1]
    assert scores[0] > scores[2]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_token_counts(spark):
    assert _one(spark, TX.token_count, "one two  three\n four") == 4
    assert _one(spark, TX.token_count, "") == 0
    est = _one(spark, TX.subword_count_estimate, "internationalization rocks!")
    # 20-char word -> 5 pieces, 'rocks' -> 2, '!' -> 1
    assert est == 8


def test_content_fingerprint_whitespace_invariant(spark):
    a = _one(spark, TX.content_fingerprint, "Hello   World\n")
    b = _one(spark, TX.content_fingerprint, "hello world")
    c = _one(spark, TX.content_fingerprint, "hello worlds")
    assert a == b and a != c


def test_rolling_window_fingerprints(spark):
    text = "x" * 50 + "THE-MIDDLE-PART " * 20 + "y" * 50
    variant = "z" * 50 + "THE-MIDDLE-PART " * 20 + "w" * 50
    df = spark.createDataFrame([(text,), (variant,)], ["x"])
    rows = df.select(TX.rolling_window_fingerprints(F.col("x")).alias("f")).collect()
    shared = set(rows[0]["f"]) & set(rows[1]["f"])
    assert shared, "shared chunk must produce shared window fingerprints"


def test_simhash_near_duplicates(spark):
    base = " ".join(f"token{i}" for i in range(100))
    near = base.replace("token50", "changed50")
    far = " ".join(f"other{i}" for i in range(100))
    df = spark.createDataFrame([(base,), (near,), (far,), ("",)], ["x"])
    sims = [r["s"] for r in df.select(TX.simhash64(F.col("x")).alias("s")).collect()]
    d_near = bin(sims[0] ^ sims[1]).count("1")
    d_far = bin(sims[0] ^ sims[2]).count("1")
    assert d_near <= 6
    assert d_far > 15
    assert sims[3] == 0


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], ["a", "b"])
    got = df.select(TX.hamming64(F.col("a"), F.col("b")).alias("h")).collect()[0]["h"]
    assert got == 2
