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
