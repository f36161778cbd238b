"""EntityStore: partition-pruned upsert/delete (reference point-update
semantics, weaviate.go:549-622) — untouched bucket partitions must keep
their files byte-identical; touched buckets rewrite correctly.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from resolve_spark.sources.tables import EntityStore


def _partition_state(path: str) -> dict[str, dict[str, tuple[float, str]]]:
    """bucket dir -> {file: (mtime, sha256)} for every parquet part."""
    out = {}
    for d in os.listdir(path):
        if not d.startswith("_bucket="):
            continue
        files = {}
        full = os.path.join(path, d)
        for f in os.listdir(full):
            if f.endswith(".parquet"):
                p = os.path.join(full, f)
                files[f] = (os.path.getmtime(p),
                            hashlib.sha256(open(p, "rb").read()).hexdigest())
        out[d] = files
    return out


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "store")
    store = EntityStore(spark, path, id_col="id", n_buckets=8)
    base = spark.createDataFrame(
        [(i, f"name{i}", float(i)) for i in range(200)], ["id", "name", "bal"]
    )
    store.init(base)
    before = _partition_state(path)
    assert len(before) > 4  # data spread over several buckets

    # update two ids + insert one new
    updates = spark.createDataFrame(
        [(7, "NEW7", 700.0), (13, "NEW13", 1300.0), (999, "n999", 9.0)],
        ["id", "name", "bal"],
    )
    store.upsert(updates)
    touched = {
        f"_bucket={r[0]}" for r in spark.createDataFrame(
            [(7,), (13,), (999,)], ["id"]
        ).select(F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(8))).collect()
    }
    after = _partition_state(path)
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched partition {d} was rewritten"
    # content correct
    got = {r["id"]: (r["name"], r["bal"]) for r in store.read().collect()}
    assert got[7] == ("NEW7", 700.0)
    assert got[13] == ("NEW13", 1300.0)
    assert got[999] == ("n999", 9.0)
    assert len(got) == 201


def test_delete_prunes_and_drops_empty_buckets(spark, tmp_path):
    path = str(tmp_path / "store")
    store = EntityStore(spark, path, id_col="id", n_buckets=4)
    base = spark.createDataFrame([(i, f"n{i}") for i in range(40)], ["id", "name"])
    store.init(base)
    before = _partition_state(path)

    store.delete(spark.createDataFrame([(5,), (6,)], ["id"]))
    got = {r["id"] for r in store.read().collect()}
    assert got == set(range(40)) - {5, 6}

    touched = {
        f"_bucket={r[0]}" for r in spark.createDataFrame([(5,), (6,)], ["id"])
        .select(F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(4))).collect()
    }
    after = _partition_state(path)
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched partition {d} was rewritten"

    # deleting EVERYTHING in one bucket drops its directory
    all_ids = spark.createDataFrame([(i,) for i in range(40)], ["id"])
    one_bucket = all_ids.where(
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(4)) == 0
    )
    store.delete(one_bucket)
    assert "_bucket=0" not in _partition_state(path)
    remaining = {r["id"] for r in store.read().collect()}
    kept = {r["id"] for r in spark.createDataFrame([(i,) for i in range(40)], ["id"])
            .where(F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(4)) != 0)
            .collect()}
    assert remaining == kept - {5, 6}
