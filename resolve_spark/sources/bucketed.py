"""Bucketed parquet tables: pre-shuffled storage for the big,
repeatedly-joined sides (an entity store joined by block_key on every
match request; a normalized corpus joined by id on every scoring run).

Spark's ``bucketBy`` hash-partitions rows into a fixed number of bucket
files at WRITE time and records the spec in the catalog; a subsequent
equi-join on the bucket key reads the files co-located and skips the
Exchange (and with ``sortBy``, the Sort) on the bucketed side. At
100 TB that converts the dominant per-run shuffle of the stored corpus
into a plain columnar scan — the increment/query side is the only
thing that still moves.

Catalog caveat (why ``ensure_bucketed_table`` exists): the bucket spec
lives in the session catalog, not in the parquet footers. The FILES
survive a restart (bucket id is encoded in the file names), but a fresh
session must re-attach the spec by re-issuing the external-table DDL —
otherwise Spark reads the same files as an ordinary parquet directory
and re-shuffles. On a deployment with a persistent metastore the DDL
survives instead and ``ensure_bucketed_table`` is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _ddl_of(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def save_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as an external bucketed (and by default sorted)
    parquet table at ``path``, registered as ``name``. Returns the
    table-backed DataFrame (reads carry the bucket spec).

    Pick ``buckets`` for the 100x target, not today's size: buckets set
    join parallelism and can't change without a rewrite (~2-4x total
    executor cores of the cluster that will JOIN this table).
    """
    w = (
        df.write.format("parquet")
        .option("path", path)
        .mode(mode)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def ensure_bucketed_table(
    spark: SparkSession,
    name: str,
    path: str,
    key: str,
    buckets: int,
    schema_ddl: str,
    sort: bool = True,
) -> DataFrame:
    """Re-attach the bucket spec to existing bucket files in a fresh
    session (see module docstring). ``schema_ddl`` is the column list
    (``save_bucketed`` writers can capture it via ``_ddl_of``)."""
    if not spark.catalog.tableExists(name):
        sorted_by = f"SORTED BY (`{key}`) " if sort else ""
        spark.sql(
            f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
            f"CLUSTERED BY (`{key}`) {sorted_by}INTO {buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
    return spark.table(name)
