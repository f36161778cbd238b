"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query side is broadcast (queries are small); candidates stream.
- add_hyperplane_bucket / lsh_topk: random-hyperplane (SRP) LSH —
  the scale path. Each vector gets a ``planes``-bit signature; high
  cosine => equal signature with probability (1 - theta/pi)^planes.
  Multiple independent tables raise recall. Bucket join replaces the
  cross join: cost O(sum of bucket^2) instead of O(n*q).
- ivf_topk: IVF-style coarse quantization — k-means-lite centroids
  sampled deterministically, vectors assigned to nearest centroid,
  queries probe ``nprobe`` nearest centroid cells.

All vector math is native (zip_with/aggregate in doubles); the
hyperplane signatures use a vectorized numpy pandas UDF (one matrix
multiply per Arrow batch — the textbook good UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from resolve_spark.functions.embedding import cosine_similarity_native


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 10,
    query_id: str = "query_id", cand_id: str = "cand_id", vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, cand_id, cos, rk)."""
    q = F.broadcast(queries.select(F.col(query_id), F.col(vec).alias("_qv")))
    c = candidates.select(F.col(cand_id), F.col(vec).alias("_cv"))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(cand_id))
    return (
        q.crossJoin(c)
        .withColumn("cos", cosine_similarity_native(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, cand_id, "cos", "rk")
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(planes, dim)).astype(np.float64)


def signature_udf(planes: int = 16, seed: int = 42):
    """vector -> int64 SRP signature; one numpy matmul per Arrow batch.

    The hyperplane matrix is derived lazily (and deterministically) from
    (seed, vector dim) inside the UDF on first batch, so building the
    plan triggers NO Spark jobs — every executor regenerates the same
    planes from the same seed.
    """
    weights = (1 << np.arange(planes)).astype(np.int64)
    planes_cache: dict[int, np.ndarray] = {}

    @pandas_udf(LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        dim = m.shape[1]
        H = planes_cache.get(dim)
        if H is None:
            H = _hyperplanes(dim, planes, seed)
            planes_cache[dim] = H
        bits = (m @ H.T) > 0
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig


def add_hyperplane_bucket(
    df: DataFrame, vec_col: str, planes: int = 16, seed: int = 42,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Pure plan builder — no driver-side actions (no dim probe)."""
    return df.withColumn(bucket_col, signature_udf(planes, seed)(F.col(vec_col)))


def lsh_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 10,
    query_id: str = "query_id", cand_id: str = "cand_id", vec: str = "embedding",
    planes: int = 12, tables: int = 4, seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: union of ``tables`` independent SRP
    bucket joins, exact cosine re-rank inside the matched buckets."""
    out = None
    for t in range(tables):
        qb = add_hyperplane_bucket(queries, vec, planes, seed + 101 * t)
        cb = add_hyperplane_bucket(candidates, vec, planes, seed + 101 * t)
        j = qb.select(query_id, F.col(vec).alias("_qv"), "bucket").join(
            cb.select(cand_id, F.col(vec).alias("_cv"), "bucket"), "bucket"
        ).drop("bucket")
        out = j if out is None else out.unionByName(j)
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(cand_id))
    return (
        out.dropDuplicates([query_id, cand_id])
        .withColumn("cos", cosine_similarity_native(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, cand_id, "cos", "rk")
    )


def ivf_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 10,
    query_id: str = "query_id", cand_id: str = "cand_id", vec: str = "embedding",
    ncells: int = 16, nprobe: int = 4, seed: int = 42,
) -> DataFrame:
    """IVF coarse search: deterministic sampled centroids; candidates
    live in their nearest cell; queries probe the ``nprobe`` nearest
    cells and re-rank exactly within them."""
    # deterministic pseudo-random centroid pick. orderBy+limit compiles
    # to TakeOrderedAndProject (per-partition top-k heap + driver merge
    # of ncells rows per partition), NOT a global sort — scale-safe.
    cents = (
        candidates.select(F.col(cand_id).alias("_cid"), F.col(vec).alias("_cv"))
        .withColumn("_h", F.xxhash64(F.col("_cid")))
        .orderBy("_h")
        .limit(ncells)
        .withColumn("cell", F.monotonically_increasing_id())
        .select("cell", F.col("_cv").alias("_centroid"))
    )
    cents = F.broadcast(cents)

    def nearest_cells(side: DataFrame, id_col: str, n: int) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell"))
        return (
            side.crossJoin(cents)
            .withColumn("_csim", cosine_similarity_native(F.col(vec), F.col("_centroid")))
            .withColumn("_crk", F.row_number().over(w))
            .where(F.col("_crk") <= n)
            .drop("_centroid", "_csim", "_crk")
        )

    c_assigned = nearest_cells(
        candidates.select(cand_id, vec), cand_id, 1
    ).select("cell", cand_id, F.col(vec).alias("_cv"))
    q_assigned = nearest_cells(
        queries.select(query_id, vec), query_id, nprobe
    ).select("cell", query_id, F.col(vec).alias("_qv"))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(cand_id))
    return (
        q_assigned.join(c_assigned, "cell")
        .dropDuplicates([query_id, cand_id])
        .withColumn("cos", cosine_similarity_native(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id, cand_id, "cos", "rk")
    )
