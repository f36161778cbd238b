"""Engine-portable hash family (functions/hashing.py): cross-engine
parity (Spark native / python / DuckDB) plus semantics preservation of
the portable variants of MinHash / SimHash / SRP-LSH / IVF — the
variants the driver's DuckDB oracles check (q19, q27, q28, q30, q32)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_spark.functions import hashing as H
from resolve_spark.operators import ann, dedup


STRINGS = ["", "hello world", "a", "Ünïcode tëst", "w0 w1 w2 w3", "123|456"]


def test_portable_hash60_three_engine_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", H.portable_hash60(F.col("s")).alias("h")).collect()
    }
    for s in STRINGS:
        expect = H.portable_hash60_py(s)
        assert got[s] == expect, s
        duck = duckdb.sql(
            "SELECT " + H.portable_hash60_sql("?"), params=[s]
        ).fetchone()[0]
        assert duck == expect, s
        assert 0 <= expect < (1 << 60)


def test_universal_hash_split30_parity():
    a = H.portable_hash60_py("mh:a:42:0") + 1
    b = H.portable_hash60_py("mh:b:42:0")
    xs = np.array(
        [0, 1, (1 << 60) - 1, H.portable_hash60_py("some shingle")], dtype=np.int64
    )
    ours = H.universal_hash_split30_py(a, b, xs)
    for x, h in zip(xs, ours):
        duck = duckdb.sql(
            "SELECT "
            + H.universal_hash_split30_sql(str(a), str(b), str(int(x)))
        ).fetchone()[0]
        assert int(h) == duck
        assert 0 <= int(h) < H.P61


@pytest.fixture(scope="module")
def docs(spark):
    base = " ".join(f"w{i}" for i in range(60))
    rows = [
        ("d1", base),
        ("d2", base + "  "),
        ("d3", base.replace("w30", "x30")),
        ("d4", " ".join(f"q{i}" for i in range(60))),
        ("d5", "short text"),
    ]
    df = spark.createDataFrame(rows, ["rid", "content"])
    df.persist()
    return df


def _clusters(df):
    return {r["rid"]: r["cluster_id"] for r in df.collect()}


def test_minhash_portable_same_semantics(spark, docs):
    got = _clusters(
        dedup.minhash_duplicates(docs, "rid", "content", hash_impl="portable")
    )
    assert got["d1"] == got["d2"] == got["d3"]
    assert got["d4"] != got["d1"]
    assert got["d5"] != got["d1"]


def test_simhash_portable_same_semantics(spark, docs):
    got = _clusters(
        dedup.simhash_duplicates(docs, "rid", "content", hash_impl="portable")
    )
    assert got["d1"] == got["d2"] == got["d3"]
    assert got["d4"] != got["d1"]


def test_portable_simhash_matches_native_spark_expr(spark):
    """The Spark-native portable simhash equals a pure-python replica
    (the same arithmetic the DuckDB oracle runs)."""
    from resolve_spark.functions import text as TX

    texts = ["the quick brown fox", "one two three four five six", "x"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = {
        r["t"]: r["sim"]
        for r in df.select(
            "t", TX.simhash64(F.col("t"), hash_impl="portable").alias("sim")
        ).collect()
    }
    import re

    for t in texts:
        toks = sorted({w for w in re.split(r"[^a-z0-9]+", t.lower()) if w})
        hs = [H.portable_hash60_py(w) for w in toks]
        sim = 0
        for b in range(63):
            cnt = sum((h >> b) & 1 for h in hs)
            if 2 * cnt > len(hs):
                sim |= 1 << b
        assert got[t] == sim, t


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.normal(size=(10, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x + 0.01 * j) for j, x in enumerate(v * 1.001)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    df.persist()
    return df


def test_lsh_topk_portable_recall(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = vectors.select(F.col("vec_id").alias("cand_id"), "embedding")
    exact = ann.brute_force_topk(queries, cands, k=2)
    approx = ann.lsh_topk(queries, cands, k=2, planes=8, tables=6,
                          hash_impl="portable")
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, (recall, e - a)


def test_ivf_topk_portable_deterministic(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = vectors.select(F.col("vec_id").alias("cand_id"), "embedding")
    runs = []
    for _ in range(2):
        top = ann.ivf_topk(queries, cands, k=2, ncells=4, nprobe=2,
                           hash_impl="portable")
        runs.append({(r["query_id"], r["rk"]): r["cand_id"] for r in top.collect()})
    assert runs[0] == runs[1]
    assert len(runs[0]) == 6


def test_portable_hyperplanes_are_integer_and_deterministic():
    h1 = ann._portable_hyperplanes(16, 8, 42)
    h2 = ann._portable_hyperplanes(16, 8, 42)
    assert (h1 == h2).all()
    assert h1.dtype == np.int64
    assert h1.min() >= -1000 and h1.max() <= 1000
    # spot-check one entry against the defining formula
    assert h1[3][7] == H.portable_hash60_py("hp:42:3:7") % 2001 - 1000


def test_bad_hash_impl_rejected(spark, docs):
    with pytest.raises(ValueError, match="hash_impl"):
        dedup.simhash_duplicates(docs, "rid", "content", hash_impl="nope")
