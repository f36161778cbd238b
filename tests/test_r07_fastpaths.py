"""Round-7 optimization equivalence tests.

Every r7 fast path must be output-identical to the generic path it
bypasses; these tests force both paths over the same input and compare
full rows (not just counts).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from resolve_spark.operators import dedup as DD
from resolve_spark.operators.ann import brute_force_topk, cosine_topk_matmul
from resolve_spark.operators.dedup import containment_pairs, tfidf_weighted_jaccard_pairs
from resolve_spark.operators.fellegi_sunter import (
    estimate_fs,
    estimate_fs_from_counts,
)


VOCAB_SMALL = [f"tok{i}" for i in range(31)]
VOCAB_BIG = [f"tok{i}" for i in range(80)]


def _docs(spark, vocab, n_docs=120, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        k = rng.randint(1, min(12, len(vocab)))
        words = rng.sample(vocab, k)
        # repeats + shuffled order so token-set identity is exercised
        text = " ".join(words + rng.sample(words, min(3, k)))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestContainmentSmallVocab:
    def test_fast_matches_generic(self, spark):
        d = _docs(spark, VOCAB_SMALL)
        fast = containment_pairs(d, "doc_id", "text", threshold_pct=70)
        # max_token_df high enough to drop nothing => generic path,
        # identical semantics
        generic = containment_pairs(
            d, "doc_id", "text", threshold_pct=70, max_token_df=10**9
        )
        assert _rows(fast) == _rows(generic)
        assert len(_rows(fast)) > 0

    def test_big_vocab_declines_fast_path(self, spark):
        d = _docs(spark, VOCAB_BIG, n_docs=60)
        toks = d.select(
            F.col("doc_id").alias("rid"),
            F.array_distinct(F.split(F.col("text"), " ")).alias("t"),
        )
        assert DD._containment_pairs_small_vocab(toks, 70) is None
        out = containment_pairs(d, "doc_id", "text", threshold_pct=70)
        assert out.columns == [
            "id_a", "id_b", "overlap", "n_a", "n_b", "containment"
        ]

    def test_budget_declines_fast_path(self, spark, monkeypatch):
        monkeypatch.setattr(DD, "_CONTAIN_SET_PAIR_BUDGET", 1)
        d = _docs(spark, VOCAB_SMALL, n_docs=40)
        fast_off = containment_pairs(d, "doc_id", "text", threshold_pct=70)
        monkeypatch.undo()
        fast_on = containment_pairs(d, "doc_id", "text", threshold_pct=70)
        assert _rows(fast_off) == _rows(fast_on)


class TestWJaccardSmallVocab:
    def test_fast_matches_generic_self(self, spark, monkeypatch):
        d = _docs(spark, VOCAB_SMALL)
        fast = tfidf_weighted_jaccard_pairs(
            d, "doc_id", "text", threshold=0.5, hash_impl="portable"
        )
        monkeypatch.setattr(DD, "_small_vocab_wjaccard", lambda *a, **k: None)
        generic = tfidf_weighted_jaccard_pairs(
            d, "doc_id", "text", threshold=0.5, hash_impl="portable"
        )
        assert _rows(fast) == _rows(generic)
        assert len(_rows(fast)) > 0

    def test_fast_matches_generic_join(self, spark, monkeypatch):
        d = _docs(spark, VOCAB_SMALL)
        left = d.where(F.col("doc_id") % 2 == 0)
        right = d.where(F.col("doc_id") % 2 == 1)
        fast = DD.wjaccard_join(left, right, "doc_id", "doc_id", threshold=0.5)
        monkeypatch.setattr(DD, "_small_vocab_wjaccard", lambda *a, **k: None)
        generic = DD.wjaccard_join(
            left, right, "doc_id", "doc_id", threshold=0.5
        )
        assert _rows(fast) == _rows(generic)
        assert len(_rows(fast)) > 0

    def test_big_vocab_declines(self, spark):
        d = _docs(spark, VOCAB_BIG, n_docs=60)
        out = tfidf_weighted_jaccard_pairs(
            d, "doc_id", "text", threshold=0.5, hash_impl="portable"
        )
        assert out.columns == ["id_a", "id_b", "wjaccard"]


class TestCosineTopkMatmul:
    def test_matches_brute_force(self, spark):
        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)
        ]
        rows.append((50, [0.0] * 8))  # zero vector: scores 0.0
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = df.where(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        c = df.select(F.col("vec_id").alias("cand_id"), "embedding")
        bf = brute_force_topk(q, c, k=4)
        mm = cosine_topk_matmul(q, c, k=4)
        b = {(r["query_id"], r["cand_id"]): (r["cos"], r["rk"]) for r in bf.collect()}
        m = {(r["query_id"], r["cand_id"]): (r["cos"], r["rk"]) for r in mm.collect()}
        assert set(b) == set(m)
        for k2 in b:
            assert b[k2][1] == m[k2][1]
            assert abs(b[k2][0] - m[k2][0]) < 1e-9

    def test_rounded_partial_topk_ties(self, spark):
        # many exact-duplicate vectors => heavy ties at the rounded
        # boundary; tie order must be (cos desc, cand_id asc)
        base = [1.0, 2.0, 3.0, 4.0]
        rows = [(i, base) for i in range(30)]
        rows += [(100 + i, [4.0, 3.0, 2.0, 1.0]) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        c = df.select(F.col("vec_id").alias("cand_id"), "embedding")
        out = cosine_topk_matmul(
            q, c, k=3, round_to=4, exclude_self=True, parallelism=4
        ).collect()
        got = sorted((r["rk"], r["cand_id"], r["cos"]) for r in out)
        assert got == [(1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0)]


def test_estimate_fs_from_counts_matches(spark):
    rows = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)
            for _ in range((a + 1) * (b + 2) * (c + 3))]
    pairs = spark.createDataFrame(rows, "g_x int, g_y int, g_z int")
    p1 = estimate_fs(pairs, ["g_x", "g_y", "g_z"], iterations=3)
    counts = pairs.groupBy("g_x", "g_y", "g_z").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    p2 = estimate_fs_from_counts(counts, ["g_x", "g_y", "g_z"],
                                 count_col="n", iterations=3)
    assert p1 == p2
