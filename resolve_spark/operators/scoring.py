"""Pairwise scoring (SURVEY.md §2.7, M1-M5) over candidate pairs.

The reference scores one query against ANN hits (match.go:170-264); the
batch equivalent scores every candidate pair:

    pairs (id_a,id_b,block_key)
      JOIN entities twice (a-side, b-side)
      -> per-field scores: native Column kernels where possible, ONE
         fused Arrow crossing for the pandas-UDF kernels
      -> weighted_score = Σ(w_i s_i)/Σw_i              (match.go:471-492)
      -> score = (vec_score + weighted_score)/2 when vectors participate
                 (match.go:378-384), else weighted_score
      -> threshold filter                               (match.go:237-240)

Plan-order note: the threshold is applied AFTER the pUDF (scores depend
on it), but blocking has already bounded the pair count; cheap native
exact-match short-circuits are folded into each kernel, not separate
passes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resolve_spark.functions import fields as FD
from resolve_spark.functions.embedding import cosine_similarity_udf


@dataclass(frozen=True)
class FieldSpec:
    """One scored field: entity column + kernel alias + weight."""

    name: str            # logical field name (weights / field_scores key)
    column: str          # column in the entity table
    kernel: str          # registry alias (registry.go:50-83)
    weight: float = 1.0

    @staticmethod
    def infer(name: str, column: str | None = None, weight: float = 1.0) -> "FieldSpec":
        """F8 — kernel inferred from the field name (match.go:388-423)."""
        return FieldSpec(name, column or name, FD.infer_kernel_name(name), weight)


def specs_from_options(
    fields: list[str],
    field_type_mappings: dict[str, str] | None = None,
    force_exact_match_fields: list[str] | None = None,
    field_weights: dict[str, float] | None = None,
) -> list[FieldSpec]:
    """Reference Options semantics (match.go:48-57, 288-385): kernel from
    FieldTypeMappings (F7) else inferred from the field name (F8);
    ForceExactMatchFields overrides to exact (match.go:312-318); weights
    default to 1.0 (match.go:478-480)."""
    mappings = field_type_mappings or {}
    force = set(force_exact_match_fields or [])
    weights = field_weights or {}
    specs = []
    for f in fields:
        if f in force:
            kernel = "exact"
        elif f in mappings:
            kernel = mappings[f]
        else:
            kernel = FD.infer_kernel_name(f)
        specs.append(FieldSpec(f, f, kernel, float(weights.get(f, 1.0))))
    return specs


def attach_pair_sides(
    pairs: DataFrame, entities: DataFrame, id_col: str, side_cols: list[str]
) -> DataFrame:
    """pairs(id_a,id_b,...) x entities -> wide pair rows with _a/_b columns."""
    str_cols = {f.name for f in entities.schema.fields if f.dataType.simpleString() == "string"}

    def side(c: str) -> Column:
        # strings: null -> '' (kernel empty-string conventions); others as-is
        return F.coalesce(F.col(c), F.lit("")) if c in str_cols else F.col(c)

    a = entities.select(
        F.col(id_col).alias("id_a"),
        *[side(c).alias(f"{c}_a") for c in side_cols],
    )
    b = entities.select(
        F.col(id_col).alias("id_b"),
        *[side(c).alias(f"{c}_b") for c in side_cols],
    )
    return pairs.join(a, "id_a").join(b, "id_b")


def score_pairs(
    wide_pairs: DataFrame,
    specs: list[FieldSpec],
    threshold: float | None = None,
    vector_col: str | None = None,
    blend_with_vector: bool | None = None,
    prefilter: bool = True,
    threshold_on: str = "final",
) -> DataFrame:
    """Score _a/_b wide pair rows. Adds per-field ``score_<name>``,
    ``field_scores`` map, ``matched_on``, ``weighted_score``,
    optional ``vec_score``, and final ``score``; filters by threshold.

    ``threshold_on``: which score the threshold filters (needs
    ``vector_col`` for "vector"). "final" (engine default) filters the
    returned ``score``; "vector" reproduces the reference exactly —
    match.go:237-240 thresholds on the VECTOR similarity before field
    scoring, so a blended final score below the threshold can still be
    returned when its vec_score clears it (and vice versa).

    ``prefilter``: before invoking any pandas UDF, evaluate the NATIVE
    kernels and drop pairs whose score upper bound (native scores +
    1.0 for every not-yet-computed kernel, vec_score <= 1.0) cannot
    reach the threshold. Catalyst cannot reorder predicates through a
    Python UDF, so this cheap-before-expensive ordering must be encoded
    in the plan (SURVEY.md §4, "early threshold filter" device).
    """
    if threshold_on not in ("final", "vector"):
        raise ValueError(f"threshold_on must be 'final' or 'vector', got {threshold_on!r}")
    if threshold_on == "vector" and vector_col is None:
        raise ValueError("threshold_on='vector' requires vector_col")
    native = [s for s in specs if s.kernel.lower() in FD.NATIVE_BUILDERS]
    fused = [s for s in specs if s.kernel.lower() not in FD.NATIVE_BUILDERS]

    df = wide_pairs
    for s in native:
        df = df.withColumn(
            f"score_{s.name}",
            FD.NATIVE_BUILDERS[s.kernel.lower()](
                F.col(f"{s.column}_a"), F.col(f"{s.column}_b")
            ),
        )
    # vector-only scoring (blend_with_vector=False) and vector
    # thresholding (threshold_on="vector"): the thresholded score is the
    # cosine similarity alone, so a field-score upper bound is NOT a
    # bound on it — skip the prefilter entirely
    vector_only = vector_col is not None and (
        blend_with_vector is False or threshold_on == "vector"
    )
    if prefilter and threshold is not None and native and not vector_only:
        total_w = sum(s.weight for s in specs) or 1.0
        ub_num = None
        for s in specs:
            term = (
                F.col(f"score_{s.name}") * F.lit(s.weight)
                if s in native or s.kernel.lower() in FD.NATIVE_BUILDERS
                else F.lit(float(s.weight))
            )
            ub_num = term if ub_num is None else ub_num + term
        ub = ub_num / F.lit(total_w)
        if vector_col is not None:
            ub = (F.lit(1.0) + ub) / 2
        df = df.where(ub >= threshold)
    # decomposed composites: when the wide rows carry record-level
    # preprocessed companions (<col>_pre, <col>_pre_tokens — produced
    # once per RECORD in pipeline.normalized), the name/address
    # composites split into native column math (jaccard over token-hash
    # arrays, containment, house-number penalty, equality ladder) plus a
    # JW-only fused pUDF. Exact same scores as the scalar kernels
    # (fields.go:8-87, :89-256) — parity-tested — but the Python side
    # shrinks to Jaro-Winkler over distinct preprocessed pairs.
    decomposed = [
        s for s in fused
        if s.kernel.lower() in FD.DECOMPOSABLE_KERNELS
        and f"{s.column}_pre_a" in df.columns
        and f"{s.column}_pre_tokens_a" in df.columns
    ]
    plain = [s for s in fused if s not in decomposed]
    if decomposed:
        from resolve_spark.functions import similarity as SIM

        jw_udf = FD.fused_scores_udf(["jaro"] * len(decomposed))
        jw_args = []
        for s in decomposed:
            jw_args.extend([F.col(f"{s.column}_pre_a"), F.col(f"{s.column}_pre_b")])
        df = df.withColumn("_jw", jw_udf(*jw_args))
        for i, s in enumerate(decomposed):
            raw_a, raw_b = F.col(f"{s.column}_a"), F.col(f"{s.column}_b")
            pre_a, pre_b = F.col(f"{s.column}_pre_a"), F.col(f"{s.column}_pre_b")
            jw = F.col("_jw")[i]
            ta = F.col(f"{s.column}_pre_tokens_a")
            tb = F.col(f"{s.column}_pre_tokens_b")
            # scalar-kernel parity: both sides NONEMPTY strings with zero
            # tokens is union==0 -> 0.0 (kernels.jaccard), not the
            # empty-array 1.0 convention
            jacc = F.when(
                (F.size(ta) == 0) & (F.size(tb) == 0), F.lit(0.0)
            ).otherwise(SIM.jaccard_token_arrays(ta, tb))
            cont = SIM.contained_in(pre_a, pre_b)
            if s.kernel.lower().startswith("name"):
                combined = jw * 0.6 + jacc * 0.3 + cont * 0.1
            else:  # address: house-number penalty x0.3 (fields.go:195)
                num_a = F.regexp_extract(pre_a, "[0-9]+", 0)
                num_b = F.regexp_extract(pre_b, "[0-9]+", 0)
                penalty = F.when(
                    (num_a != "") & (num_b != "") & (num_a != num_b), F.lit(0.3)
                ).otherwise(F.lit(1.0))
                combined = (jacc * 0.5 + jw * 0.2 + cont * 0.3) * penalty
            score = (
                F.when(raw_a == raw_b, F.lit(1.0))
                .when((raw_a == "") | (raw_b == ""), F.lit(0.0))
                .when(pre_a == pre_b, F.lit(1.0))
                .otherwise(combined)
            )
            df = df.withColumn(f"score_{s.name}", score)
        df = df.drop("_jw")
    if plain:
        udf = FD.fused_scores_udf([s.kernel for s in plain])
        args = []
        for s in plain:
            args.extend([F.col(f"{s.column}_a"), F.col(f"{s.column}_b")])
        df = df.withColumn("_fused", udf(*args))
        for i, s in enumerate(plain):
            df = df.withColumn(f"score_{s.name}", F.col("_fused")[i])
        df = df.drop("_fused")

    score_cols = {s.name: F.col(f"score_{s.name}") for s in specs}
    weights = {s.name: s.weight for s in specs}
    df = df.withColumn(
        "field_scores",
        F.create_map(*[x for s in specs for x in (F.lit(s.name), F.col(f"score_{s.name}"))]),
    )
    # matched_on: fields non-empty on both sides (match.go:632-640 analog)
    array_sides = {
        f.name for f in df.schema.fields if f.dataType.simpleString().startswith("array")
    }

    def _present(col: str) -> Column:
        if f"{col}_a" in array_sides:
            return (F.size(F.col(f"{col}_a")) > 0) & (F.size(F.col(f"{col}_b")) > 0)
        return (F.col(f"{col}_a") != "") & (F.col(f"{col}_b") != "")

    df = df.withColumn(
        "matched_on",
        F.filter(
            F.array(*[F.when(_present(s.column), F.lit(s.name)) for s in specs]),
            lambda x: x.isNotNull(),
        ),
    )
    df = df.withColumn("weighted_score", FD.weighted_score_column(score_cols, weights))

    if vector_col is not None:
        df = df.withColumn(
            "vec_score",
            cosine_similarity_udf(F.col(f"{vector_col}_a"), F.col(f"{vector_col}_b")),
        )
        blend = True if blend_with_vector is None else blend_with_vector
        final = (
            (F.col("vec_score") + F.col("weighted_score")) / 2
            if blend
            else F.col("vec_score")
        )
    else:
        final = F.col("weighted_score")
    df = df.withColumn("score", final)
    if threshold is not None:
        gate = F.col("vec_score") if threshold_on == "vector" else F.col("score")
        df = df.where(gate >= threshold)
    return df


def scored_edges_projection(df: DataFrame, extra: list[str] | None = None) -> DataFrame:
    """Checkpoint-table shape (FIXTURES.md §4 scored_edges)."""
    cols = ["id_a", "id_b", "block_key", "field_scores", "weighted_score",
            "score", "matched_on"]
    if "vec_score" in df.columns:
        cols.insert(3, "vec_score")
    return df.select(*cols, *(extra or []))
