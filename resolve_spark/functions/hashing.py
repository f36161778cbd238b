"""Engine-portable hashing for oracle-checkable randomized operators.

The MinHash / SimHash / LSH family needs a hash function. The FAST
default everywhere is Spark's ``xxhash64`` (JVM-side, codegen) — but
xxhash64 exists only in Spark, so any operator built on it can never be
cross-checked by an independent SQL engine. Each such operator therefore
takes ``hash_impl``:

- ``"fast"``      — xxhash64 / numpy siphash (production default)
- ``"portable"``  — the first 15 hex chars of md5 as a 60-bit integer,
  computable bit-identically in Spark (``conv(substring(md5(x),1,15),
  16,10)``), Python (``int(md5(x).hexdigest()[:15],16)``) and DuckDB
  (``('0x' || substr(md5(x),1,15))::BIGINT``), which is what the
  driver's DuckDB correctness oracle runs.

15 hex chars (not 16) keep the value under 2^60, well inside a signed
64-bit integer in every engine (no unsigned-overflow divergence).

``universal_hash_split30`` is the matching overflow-free universal hash
family h_i(x) = (a_lo*x_lo + a_hi*x_hi + b) mod (2^61-1) with the
operands split at 30 bits: every intermediate stays < 2^62, so int64 /
BIGINT arithmetic is exact and identical across engines (a plain
(a*x+b) mod p would overflow 64 bits and engines disagree on wraparound
— DuckDB raises, numpy wraps).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^61 - 1 (Mersenne prime) — the universal-hash modulus
P61 = (1 << 61) - 1
#: low-30-bit mask for the overflow-free split multiply
M30 = (1 << 30) - 1

HASH_IMPLS = ("fast", "portable")


def check_hash_impl(hash_impl: str) -> str:
    if hash_impl not in HASH_IMPLS:
        raise ValueError(f"hash_impl must be one of {HASH_IMPLS}: {hash_impl!r}")
    return hash_impl


def portable_hash60(col: Column) -> Column:
    """Native Spark column: 60-bit md5-prefix hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_py(s: str) -> int:
    """Driver/numpy-side replica of :func:`portable_hash60`."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def portable_hash60_sql(expr: str) -> str:
    """DuckDB replica of :func:`portable_hash60` over a SQL expression."""
    return f"('0x' || substr(md5({expr}),1,15))::BIGINT"


def universal_hash_split30_py(a: int, b: int, x):
    """h(x) = (a_lo*x_lo + a_hi*x_hi + b) mod P61, exact in int64.

    ``x`` may be an int or a numpy int64 array; ``a``/``b`` come from
    :func:`portable_hash60_py` (< 2^60), so every term is < 2^60 and the
    sum < 2^62 — no 64-bit overflow anywhere.
    """
    a_lo, a_hi = a & M30, a >> 30
    return (a_lo * (x & M30) + a_hi * (x >> 30) + b) % P61


def universal_hash_split30_sql(a_expr: str, b_expr: str, x_expr: str) -> str:
    """DuckDB replica of :func:`universal_hash_split30_py`."""
    return (
        f"((({a_expr}) & {M30}) * (({x_expr}) & {M30}) "
        f"+ (({a_expr}) >> 30) * (({x_expr}) >> 30) + ({b_expr})) % {P61}"
    )
