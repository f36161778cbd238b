"""Training-data layout ops: context chunking + shard packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.operators.sharding import chunk_documents, pack_shards


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "")], ["doc_id", "text"])
    rows = chunk_documents(df, "text", "doc_id", chunk_tokens=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"]) for r in rows}
    # starts 0,3,6,9 over 10 tokens
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)  # 1-token overlap
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(1, 3)] == ("w9", 1)           # tail fragment
    # empty doc -> exactly one empty chunk, not zero rows
    assert got[(2, 0)] == ("", 0)
    assert len(got) == 5

    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_pack_shards_distributed_prefix_sum(spark):
    # tokens: 5,7,3,10,2,6 in id order -> exclusive prefix 0,5,12,15,25,27
    toks = [5, 7, 3, 10, 2, 6]
    df = spark.createDataFrame(list(enumerate(toks)), ["doc_id", "n_tokens"])
    out = pack_shards(df, tokens_per_shard=10, num_partitions=3)
    got = {r["doc_id"]: (r["tokens_before"], r["shard_id"]) for r in out.collect()}
    assert got == {0: (0, 0), 1: (5, 0), 2: (12, 1), 3: (15, 1),
                   4: (25, 2), 5: (27, 2)}
    # the multi-partition path must agree with a single partition
    got1 = {r["doc_id"]: (r["tokens_before"], r["shard_id"])
            for r in pack_shards(df, tokens_per_shard=10, num_partitions=1).collect()}
    assert got1 == got
    # rows are never split: a shard may overrun its budget (doc 3 is 10
    # tokens starting at 15) but every row has exactly one shard
    assert len(got) == len(toks)

    with pytest.raises(ValueError):
        pack_shards(df, tokens_per_shard=0)


def test_pack_shards_duplicate_order_keys_rows_frame(spark):
    """Tied order keys must still get an EXCLUSIVE running prefix (the
    default RANGE frame hands every tied row the peer-group total):
    chunk-style input, many rows per doc_id."""
    from resolve_spark.operators.sharding import pack_shards

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 10), (1, 2, 10), (2, 0, 5)],
        ["doc_id", "chunk_idx", "n_tokens"],
    )
    out = pack_shards(
        df, order_col="doc_id", tokens_per_shard=20,
        tiebreak_cols=("chunk_idx",),
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["tokens_before"], r["shard_id"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (0, 0), (1, 1): (10, 0), (1, 2): (20, 1), (2, 0): (30, 1)
    }


def test_chunk_documents_null_text_single_empty_chunk(spark):
    from resolve_spark.operators.sharding import chunk_documents

    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in chunk_documents(df, chunk_tokens=4).collect()}
    assert (got[1]["chunk_idx"], got[1]["chunk_text"], got[1]["n_tokens"]) == (0, "", 0)
    assert got[2]["n_tokens"] == 2
