"""Bucketed-table source: the shuffle-free co-located join property.

The point of sources/bucketed.py is a PLAN property, so the tests
assert on executedPlan: joining two same-bucketed tables produces no
Exchange at all; joining bucketed x plain shuffles ONLY the plain side;
re-attaching the spec in a cleared catalog restores the property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.sources import bucketed as BK


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _executed(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-adaptive "Initial Plan"; assert on
    # what actually ran
    return plan.split("== Initial Plan ==")[0]


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    left = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 13).alias("w")
    )
    lt = BK.save_bucketed(left, "bk_left", str(tmp_path / "l"), "id", buckets=8)
    rt = BK.save_bucketed(right, "bk_right", str(tmp_path / "r"), "id", buckets=8)
    joined = lt.join(rt, "id")
    plan = _executed(joined)
    assert "Exchange" not in plan          # neither side shuffles
    assert joined.count() == 20000

    # bucketed x plain: exactly the plain side shuffles
    plain = spark.range(0, 20000).select(F.col("id"), F.lit(1).alias("z"))
    plan2 = _executed(lt.join(plain, "id"))
    assert plan2.count("Exchange") == 1
    spark.sql("DROP TABLE bk_left")
    spark.sql("DROP TABLE bk_right")


def test_ensure_bucketed_table_reattaches_spec(spark, tmp_path, no_broadcast):
    df = spark.range(0, 5000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    ddl = BK._ddl_of(df)
    BK.save_bucketed(df, "bk_store", str(tmp_path / "s"), "id", buckets=4)
    spark.sql("DROP TABLE bk_store")  # external: files survive

    # without the spec the same files are a plain parquet dir -> shuffles
    raw = spark.read.parquet(str(tmp_path / "s"))
    assert "Exchange" in _executed(raw.join(raw, "id"))

    t = BK.ensure_bucketed_table(
        spark, "bk_store", str(tmp_path / "s"), "id", 4, ddl
    )
    assert t.count() == 5000
    assert set(t.columns) == {"id", "v"}
    plan = _executed(t.join(t.withColumnRenamed("v", "v2"), "id"))
    assert "Exchange" not in plan
    # idempotent re-ensure
    BK.ensure_bucketed_table(spark, "bk_store", str(tmp_path / "s"), "id", 4, ddl)
    spark.sql("DROP TABLE bk_store")
