"""Decomposed composite scoring (scoring.score_pairs fast path) vs the
scalar parity kernels: same scores to float precision on adversarial
inputs (legal suffixes, street types, house numbers, empties, punct)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from resolve_spark.functions import kernels as K
from resolve_spark.functions import fields as FD
from resolve_spark.functions import similarity as SIM
from resolve_spark.operators.scoring import FieldSpec, score_pairs

NAMES = [
    "", "Acme Corp", "acme corporation", "ACME, Inc.", "Vertex Analytics LLC",
    "vertex analytics", "Quantum Dynamics Ltd", "quantum dynamics limited",
    "###", "$$$", "A", "AB Inc.",
]
ADDRS = [
    "", "123 Main Street", "123 Main St", "124 Main Street",
    "123 N Main St Apt 4", "123 North Main Street", "456 Oak Avenue",
    "456 oak ave", "src/lib/module.py", "src/lib/module_v2.py", "!!!", "12",
]


def _wide(spark, col, values):
    rng = random.Random(99)
    pairs = [(i, rng.choice(values), rng.choice(values)) for i in range(200)]
    df = spark.createDataFrame(pairs, ["pid", f"{col}_a", f"{col}_b"])
    kind = "name" if col == "repo" else "address"
    pre_udf = FD.preprocess_udf(kind)
    for side in ("a", "b"):
        df = df.withColumn(f"{col}_pre_{side}", pre_udf(F.col(f"{col}_{side}")))
        df = df.withColumn(
            f"{col}_pre_tokens_{side}",
            F.transform(SIM.tokens(F.col(f"{col}_pre_{side}")),
                        lambda t: F.xxhash64(t)),
        )
    return df, pairs


def test_decomposed_name_parity(spark):
    df, pairs = _wide(spark, "repo", NAMES)
    out = score_pairs(df, [FieldSpec("repo", "repo", "name")],
                      threshold=None, prefilter=False)
    got = {r["pid"]: r["score_repo"] for r in out.collect()}
    for pid, a, b in pairs:
        want = K.name_similarity(a, b)
        assert math.isclose(got[pid], want, abs_tol=1e-9), (a, b, got[pid], want)


def test_decomposed_address_parity(spark):
    df, pairs = _wide(spark, "path", ADDRS)
    out = score_pairs(df, [FieldSpec("path", "path", "address")],
                      threshold=None, prefilter=False)
    got = {r["pid"]: r["score_path"] for r in out.collect()}
    for pid, a, b in pairs:
        want = K.address_similarity(a, b)
        assert math.isclose(got[pid], want, abs_tol=1e-9), (a, b, got[pid], want)


def test_fallback_without_pre_columns(spark):
    """No _pre companions -> the plain fused composite path, same scores."""
    rng = random.Random(5)
    pairs = [(i, rng.choice(NAMES), rng.choice(NAMES)) for i in range(60)]
    df = spark.createDataFrame(pairs, ["pid", "repo_a", "repo_b"])
    out = score_pairs(df, [FieldSpec("repo", "repo", "name")],
                      threshold=None, prefilter=False)
    got = {r["pid"]: r["score_repo"] for r in out.collect()}
    for pid, a, b in pairs:
        assert math.isclose(got[pid], K.name_similarity(a, b), abs_tol=1e-9)


ADVERSARIAL_NAMES = [
    # 0/1-char
    "", " ", "a", "Z", ".", "0",
    # all-stopword names (normalize_text strips every token)
    "the and of", "The A An", "is was were be been",
    # numeric-only
    "123", "123 456", "00000",
    # unicode + control chars
    "\x00", "ü", "中文 text", "a\tb\nc",
    # > _MAX_VECTOR_LEN (2048): forces the scalar JW fallback row
    "q" * 3000, "q" * 2999 + "z", ("word " * 600).strip(),
]
ADVERSARIAL_ADDRS = [
    "", " ", "1", "5 ", "n",
    # numeric-only addresses (house-number penalty edge)
    "123", "124", "123 456", "0 0 0",
    # stopword-only / unit-only
    "the", "apt 4", "suite 100",
    "9" * 2500,  # scalar-fallback length
    "123 " + "main " * 500,  # long but shared house number
]


def _score_pairs_all(spark, col, values, kind):
    """Score EVERY ordered pair of ``values`` through the decomposed
    fast path (pre-columns present) in one Spark job."""
    pairs = [
        (i * len(values) + j, a, b)
        for i, a in enumerate(values)
        for j, b in enumerate(values)
    ]
    df = spark.createDataFrame(pairs, ["pid", f"{col}_a", f"{col}_b"])
    pre_udf = FD.preprocess_udf(kind)
    for side in ("a", "b"):
        df = df.withColumn(f"{col}_pre_{side}", pre_udf(F.col(f"{col}_{side}")))
        df = df.withColumn(
            f"{col}_pre_tokens_{side}",
            F.transform(SIM.tokens(F.col(f"{col}_pre_{side}")),
                        lambda t: F.xxhash64(t)),
        )
    out = score_pairs(df, [FieldSpec(col, col, kind)],
                      threshold=None, prefilter=False)
    return {r["pid"]: r[f"score_{col}"] for r in out.collect()}, pairs


def test_decomposed_name_parity_adversarial(spark):
    """VERDICT r2 #10: 0/1-char, all-stopword, numeric-only and
    >2048-char (scalar-fallback) inputs through the DECOMPOSED scorer
    must match the scalar composite exactly."""
    got, pairs = _score_pairs_all(spark, "repo", ADVERSARIAL_NAMES, "name")
    for pid, a, b in pairs:
        want = K.name_similarity(a, b)
        assert math.isclose(got[pid], want, abs_tol=1e-9), (repr(a), repr(b), got[pid], want)


def test_decomposed_address_parity_adversarial(spark):
    got, pairs = _score_pairs_all(spark, "path", ADVERSARIAL_ADDRS, "address")
    for pid, a, b in pairs:
        want = K.address_similarity(a, b)
        assert math.isclose(got[pid], want, abs_tol=1e-9), (repr(a), repr(b), got[pid], want)


def test_decomposed_parity_hypothesis_pool(spark):
    """Hypothesis-generated pool (generate once, one Spark job): random
    short ASCII/unicode strings with stopword/digit bias."""
    from hypothesis import strategies as st

    pool_strategy = st.lists(
        st.one_of(
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
                    max_size=8),
            st.sampled_from(["the", "and", "123", "", "inc", "apt 4", "a"]),
        ),
        min_size=12, max_size=12, unique=True,
    )
    values = pool_strategy.example()  # deterministic enough: parity must hold for ANY pool
    got, pairs = _score_pairs_all(spark, "repo", values, "name")
    for pid, a, b in pairs:
        want = K.name_similarity(a, b)
        assert math.isclose(got[pid], want, abs_tol=1e-9), (repr(a), repr(b), got[pid], want)
