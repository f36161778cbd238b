"""Training-data layout operators: context-window chunking and
token-budget shard packing.

No reference analog (the reference is an entity-resolution engine);
these are the standard last-mile ops of a pretraining data pipeline —
split documents into fixed-token context windows with overlap, then
pack documents into shards of ~N tokens for the trainer.

Scale notes (100 TB):
- ``chunk_documents`` is a pure map + explode — no shuffle; chunk
  arrays are built with native sequence/slice/array_join inside
  whole-stage codegen.
- ``pack_shards`` needs a GLOBAL running token total. A naive
  ``Window.orderBy(...)`` collapses to one partition, so it is
  implemented as the classic distributed prefix sum instead:
  range-partition by the order key, cumsum WITHIN each partition
  (parallel window), then add broadcast per-partition offsets computed
  from partition subtotals (one tiny collect, bounded by the partition
  count — thousands of rows, never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_tokens`` tokens starting every ``stride`` tokens
    (overlap = chunk_tokens - stride). Output: (id, chunk_idx,
    chunk_text, n_tokens). Empty/whitespace-only documents produce one
    empty chunk (chunk_idx 0) so no document silently disappears.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # NULL text folds into the empty-document case (one empty chunk);
    # without the coalesce every downstream column would be NULL and
    # pack_shards' token sums would silently skip the rows
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    # start offsets 0, stride, 2*stride, ... strictly below n (>= 1 start)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(toks, s + 1, chunk_tokens), " "),
    )
    out = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.size(F.filter(F.split(F.col("chunk_text"), r"\s+"), lambda t: t != ""))
        .alias("n_tokens"),
    )


def pack_shards(
    df: DataFrame,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    tokens_per_shard: int = 100_000,
    num_partitions: int | None = None,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each row a ``shard_id`` so consecutive rows (in
    ``order_col`` order) accumulate ~``tokens_per_shard`` tokens per
    shard: shard_id = floor(tokens_before_this_row / tokens_per_shard).
    Rows are never split — a row starting inside shard k belongs to k
    even if it overruns the budget (standard greedy packing).

    Distributed prefix sum, not a global-order window: range-partition
    on ``order_col``, per-partition cumsum (parallel), then add each
    partition's broadcast starting offset. Adds columns
    ``tokens_before`` and ``shard_id``.

    The cumsum uses an explicit ROWS frame, so rows with EQUAL order
    keys still get an exclusive running prefix (the default RANGE frame
    would hand every tied row the whole peer group's total, breaking
    the packing — e.g. chunk_documents output, many rows per doc_id).
    Pass ``tiebreak_cols`` (e.g. ``("chunk_idx",)``) to make the order
    among ties — and therefore the exact shard assignment — fully
    deterministic; without it, tied rows get a valid greedy packing
    whose within-tie order is partition-arbitrary.

    The range-partitioned intermediate is persisted (MEMORY_AND_DISK)
    and materialized before offsets are read, so the offset map and the
    returned DataFrame are guaranteed to see the SAME partition cut
    (RangePartitioner re-samples per job otherwise). The persist lives
    until Spark's LRU evicts it; callers packing huge corpora should
    write the result and `spark.catalog.clearCache()` if memory is
    tight.
    """
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = df.repartitionByRange(int(parts), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persist BEFORE the subtotals action: repartitionByRange samples
    # range boundaries per job, so without pinning the partitioning the
    # offsets (computed in job 1) could be applied to a differently-cut
    # re-evaluation (job 2 — the caller's materialization), silently
    # mis-assigning boundary-adjacent rows. The collect below
    # materializes every partition, freezing the cut both jobs see.
    from pyspark import StorageLevel

    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    # partition subtotals: tiny (one row per partition) -> driver -> map
    subtotals = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(token_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid] or 0
    offset_expr = F.element_at(
        F.create_map(
            *[x for pid in sorted(offsets) for x in (F.lit(pid), F.lit(offsets[pid]))]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = (F.sum(token_col).over(w) - F.col(token_col)).cast("bigint")
    out = ranged.withColumn(
        "tokens_before", (within + offset_expr).cast("bigint")
    ).withColumn(
        "shard_id", F.floor(F.col("tokens_before") / tokens_per_shard).cast("bigint")
    )
    return out.drop("_pid")
