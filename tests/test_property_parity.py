"""Property-based parity: native Column kernels == pure-Python kernels
on randomized ASCII inputs (hypothesis generates, one Spark job checks a
whole batch at once to keep runtime sane)."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from resolve_spark.functions import kernels
from resolve_spark.functions import similarity as S
from resolve_spark.functions.embedding import mock_embedding_udf

ASCII = string.ascii_letters + string.digits + " .,-@#()/+"
text_strategy = st.text(alphabet=ASCII, min_size=0, max_size=24)

KERNEL_PAIRS = [
    ("exact", S.exact_match, kernels.exact_match),
    ("ci", S.case_insensitive_match, kernels.case_insensitive_match),
    ("lev", S.levenshtein_similarity, kernels.levenshtein_similarity),
    ("jac", S.jaccard, kernels.jaccard),
    ("con", S.contained_in, kernels.contained_in),
    ("phone", S.phone_similarity, kernels.phone_similarity),
    ("zip", S.zip_similarity, kernels.zip_similarity),
]


@pytest.fixture(scope="module")
def batch_checker(spark):
    def check(pairs: list[tuple[str, str]]):
        df = spark.createDataFrame(pairs, ["a", "b"])
        cols = [
            native(F.col("a"), F.col("b")).alias(name)
            for name, native, _ in KERNEL_PAIRS
        ]
        for row in df.select("a", "b", *cols).collect():
            for name, _, py in KERNEL_PAIRS:
                want = py(row["a"], row["b"])
                got = row[name]
                assert got == pytest.approx(want, abs=1e-9), (
                    name, row["a"], row["b"], got, want,
                )
    return check


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(text_strategy, text_strategy), min_size=8, max_size=16))
def test_native_kernels_parity_random(batch_checker, pairs):
    batch_checker(pairs)


def test_mock_embedding_formula_parity(spark):
    """E4 parity: emb[i] = byte(text[i]) / 255 for i < min(dim, len)."""
    texts = ["", "a", "hello world", "x" * 40]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select("t", mock_embedding_udf(16)(F.col("t")).alias("v")).collect()
    for r in rows:
        raw = r["t"].encode()
        want = [raw[i] / 255.0 if i < len(raw) else 0.0 for i in range(16)]
        assert r["v"] == pytest.approx(want, abs=1e-6)
