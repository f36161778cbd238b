"""Privacy-preserving record linkage (PPRL): CLK q-gram encodings.

Beyond-reference family (the reference matches plaintext fields only):
Schnell, Bachteler & Reiher's Cryptographic Long-term Key — encode each
record's padded q-grams into a fixed-size bit domain with k independent
hash functions, then compare encodings with Dice similarity. Two
parties can link records sharing only the encodings; q-gram collisions
give the encoding its (deliberate) fuzziness, and Dice over the bit
sets tracks plaintext q-gram Dice closely.

Representation: instead of packed bit words we keep the SET of set bit
positions as a sorted distinct int array — semantically identical
(Dice over position sets == Dice over bit vectors, collisions
included), stays fully native (array_intersect / size, zero UDFs), and
hash-oracles cleanly. A packed-uint64 variant would only matter for
storage, not semantics.

Determinism: with ``hash_impl="portable"`` every position is an
md5-derived integer computable bit-identically in Spark and DuckDB
(functions/hashing.py), so the whole encode -> Dice dataflow is
SQL-checkable (q94). ``"fast"`` uses xxhash64 for production.

Scale plan (100 TB): encoding is a per-row projection (no shuffle);
typical m=512/1024 keeps encodings ~KB-scale per record; comparisons
ride whatever candidate generation the caller uses (blocked join /
meta-blocking), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from resolve_spark.functions.hashing import check_hash_impl, portable_hash60


def clk_positions(
    col: Column,
    m: int = 512,
    k: int = 4,
    q: int = 2,
    hash_impl: str = "fast",
) -> Column:
    """Sorted distinct bit positions of the CLK encoding of a string:
    pad with '_', lowercase, extract q-grams, hash each gram with k
    seeded functions into [0, m). NULL encodes like the empty string
    (two padding chars -> one '__' gram), so every record gets a
    non-empty encoding and Dice never divides by zero."""
    check_hash_impl(hash_impl)
    padded = F.concat(F.lit("_"), F.lower(F.coalesce(col, F.lit(""))), F.lit("_"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(padded) - q + 1, F.lit(1))),
        lambda i: F.substring(padded, i, q),
    )

    def _pos(g: Column, seed: int) -> Column:
        key = F.concat(F.lit(f"{seed}:"), g)
        h = portable_hash60(key) if hash_impl == "portable" else F.xxhash64(key)
        return F.pmod(h, F.lit(m))

    return F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(grams, lambda g: F.array(*[_pos(g, i) for i in range(k)]))
            )
        )
    )


def clk_dice(a: Column, b: Column) -> Column:
    """Dice coefficient of two CLK position sets:
    2|A ∩ B| / (|A| + |B|). Both sides non-empty by construction
    (clk_positions encodes NULL/empty as the '__' gram)."""
    inter = F.size(F.array_intersect(a, b))
    return (F.lit(2) * inter) / (F.size(a) + F.size(b))
