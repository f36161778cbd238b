"""Field-level composite scorers (SURVEY.md §2.4, F1-F8).

The JW-bearing composites (name/address/email/text/cosine) have no Spark
builtin, so they run as **Arrow-batched pandas UDFs** over the pure-Python
parity kernels (resolve_spark.functions.kernels). Everything else
(exact/case/levenshtein/jaccard/contains/phone/zip) resolves to native
Column expressions from resolve_spark.functions.similarity.

Scale design:
- ``fused_scores_udf`` evaluates ALL pandas-UDF kernels for a pair batch
  in ONE Arrow crossing (SURVEY.md §4 custom-device #3), with a per-batch
  memo — duplicate (a,b) pairs are scored once per batch.
- The plan should apply cheap native filters (blocking, ladders) BEFORE
  any pandas UDF; Catalyst will not reorder predicates through a UDF.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StringType

from resolve_spark.functions import kernels, similarity, vectorized

# Kernels expressible as native Column expressions (the JVM fast path).
NATIVE_BUILDERS: dict[str, Callable[[Column, Column], Column]] = {
    "exact": similarity.exact_match,
    "exactmatch": similarity.exact_match,
    "case": similarity.case_insensitive_match,
    "caseinsensitive": similarity.case_insensitive_match,
    "caseinsensitivematch": similarity.case_insensitive_match,
    "levenshtein": similarity.levenshtein_similarity,
    "editdistance": similarity.levenshtein_similarity,
    "jaccard": similarity.jaccard,
    "token": similarity.jaccard,
    "jaccard_tokens": similarity.jaccard_token_arrays,  # pre-tokenized arrays
    "contains": similarity.contained_in,
    "containedin": similarity.contained_in,
    "phone": similarity.phone_similarity,
    "phonesimilarity": similarity.phone_similarity,
    "phonenumber": similarity.phone_similarity,
    "zipcode": similarity.zip_similarity,
    "postalcode": similarity.zip_similarity,
    "zip": similarity.zip_similarity,
}


def _batch_apply(kernel, a: pd.Series, b: pd.Series):
    """Apply a python kernel over a batch.

    JW-bearing kernels dispatch to the numpy-batched implementations in
    resolve_spark.functions.vectorized (distinct pairs only — the Arrow
    batch fast path); anything unvectorized falls back to a memoized
    scalar loop.
    """
    xa = ["" if x is None else x for x in a]
    xb = ["" if y is None else y for y in b]
    batch_fn = vectorized.BATCH_KERNELS.get(kernel)
    if batch_fn is not None:
        return vectorized.apply_distinct(batch_fn, xa, xb)
    memo: dict[tuple[str, str], float] = {}
    out = []
    for x, y in zip(xa, xb):
        key = (x, y)
        v = memo.get(key)
        if v is None:
            v = kernel(x, y)
            memo[key] = v
        out.append(v)
    return out


def pair_scorer_udf(kernel_name: str):
    """A (col_a, col_b) -> double pandas UDF for one named kernel.

    Registry dispatch parity: registry.go:50-83 aliases.
    """
    kernel = kernels.get_kernel_by_name(kernel_name)

    @pandas_udf(DoubleType())
    def scorer(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(_batch_apply(kernel, a, b), dtype="float64")

    # the kernel IS deterministic; the marker stops Catalyst from pushing
    # threshold filters through the projection and re-evaluating the UDF
    # in a second ArrowEvalPython node (observed double-eval otherwise)
    return scorer.asNondeterministic()


def fused_scores_udf(kernel_names: list[str]):
    """One pandas UDF computing N kernels over N column-pairs at once.

    Returns array<double> (one element per kernel) so the Arrow boundary
    is crossed exactly once per pair batch regardless of field count.
    Call as ``fused(a1, b1, a2, b2, ...)``.
    """
    kerns = [kernels.get_kernel_by_name(k) for k in kernel_names]

    @pandas_udf(ArrayType(DoubleType()))
    def fused(*cols: pd.Series) -> pd.Series:
        per_kernel = [
            _batch_apply(k, cols[2 * i], cols[2 * i + 1])
            for i, k in enumerate(kerns)
        ]
        return pd.Series([list(row) for row in zip(*per_kernel)])

    # see pair_scorer_udf: prevents optimizer-duplicated evaluation
    return fused.asNondeterministic()


# Composites that decompose into native column math + a JW-only pUDF
# when record-level preprocessed companions exist (see scoring.score_pairs
# and plans.pipeline.normalized): only Jaro-Winkler stays in Python.
DECOMPOSABLE_KERNELS = ("name", "namesimilarity", "address", "addresssimilarity")


def preprocess_udf(kind: str):
    """Record-level preprocess (fields.go:36-60 name, :121-193 address):
    runs ONCE PER RECORD in the normalized stage instead of once per
    candidate pair side — the regex cost drops from O(pairs) to O(records).
    """
    fn = (kernels._name_preprocess if kind.startswith("name")
          else kernels._address_preprocess)

    @pandas_udf(StringType())
    def pre(col: pd.Series) -> pd.Series:
        vals = ["" if v is None else v for v in col]
        return pd.Series(vectorized._preprocess_many(fn, vals))

    return pre.asNondeterministic()


def similarity_column(kernel_name: str, a: Column, b: Column) -> Column:
    """F6/F7 — resolve a kernel alias to a scoring Column.

    Native expression when possible, single-kernel pandas UDF otherwise.
    Unknown aliases fall back to text similarity (Jaro-Winkler), matching
    registry.go:79-82.
    """
    builder = NATIVE_BUILDERS.get(kernel_name.lower())
    if builder is not None:
        return builder(a, b)
    return pair_scorer_udf(kernel_name)(a, b)


def infer_kernel_name(field_name: str) -> str:
    """F8 — field-name heuristics (match.go:388-423)."""
    return kernels.infer_kernel_name(field_name)


def weighted_score_column(
    field_score_cols: dict[str, Column], weights: dict[str, float]
) -> Column:
    """M4 — Σ(w_i * s_i) / Σ(w_i); missing weights default to 1.0
    (match.go:471-492). Pure Column arithmetic."""
    if not field_score_cols:
        return F.lit(0.0)
    num = None
    denom = 0.0
    for name, col in field_score_cols.items():
        w = float(weights.get(name, 1.0))
        term = col * F.lit(w)
        num = term if num is None else num + term
    denom = sum(float(weights.get(n, 1.0)) for n in field_score_cols)
    if denom == 0:
        return F.lit(0.0)
    return num / F.lit(denom)


def explanation_column(score: Column, matched_on: Column) -> Column:
    """M9 — confidence bands + formatted string (match.go:643-653)."""
    confidence = (
        F.when(score >= 0.9, F.lit("high"))
        .when(score < 0.7, F.lit("low"))
        .otherwise(F.lit("medium"))
    )
    return F.format_string(
        "Matched with %s confidence (%.2f) on fields: %s",
        confidence,
        score,
        F.array_join(matched_on, ", "),
    )


def monge_elkan_udf():
    """(col_a, col_b) -> double pandas UDF for the symmetric
    Monge-Elkan compound kernel (vectorized.monge_elkan_batch: one
    jaro_winkler_batch call per Arrow batch over all token pairs)."""

    @pandas_udf(DoubleType())
    def scorer(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            vectorized.monge_elkan_batch(a.tolist(), b.tolist()),
            dtype="float64",
        )

    return scorer.asNondeterministic()
