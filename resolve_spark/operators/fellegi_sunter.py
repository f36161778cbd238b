"""Fellegi–Sunter match-weight estimation via EM (unsupervised).

The classic probabilistic record-linkage model (Fellegi & Sunter 1969;
the approach behind Splink and most production linkers): for candidate
pairs with binary per-field agreement indicators g_f, estimate

- ``lam``  P(pair is a match) among the candidate pairs,
- ``m_f``  P(field f agrees | match),
- ``u_f``  P(field f agrees | non-match),

by EM, assuming conditional independence of fields given match status.
The derived log2(m/u) / log2((1-m)/(1-u)) agreement weights are the
interpretable per-field evidence scores users tune thresholds against,
and the per-pattern posterior P(match | g) is a drop-in pair score for
corpora with no labeled truth (the supervised path is match_metrics in
diagnostics.py).

The reference engine has no unsupervised weight learning — its field
weights are user-supplied (SURVEY.md §2.7 M4, match.go:378-384); this
operator LEARNS them from the candidate-pair distribution itself and
is part of the beyond-the-reference training-data toolkit.

Scale plan (100 TB): EM never iterates over pairs. Binary agreement
vectors take at most 2^F distinct values (F = #fields, so <= 1024 rows
for F = 10), and both EM steps depend on the data only through the
pattern contingency table, so the operator does ONE map-side-combinable
groupBy over the pair stream, collects the <= 2^F (pattern, count)
rows, and runs EM driver-side in plain Python — O(2^F * iterations)
arithmetic, independent of corpus size. Scoring rejoins the learned
per-pattern posterior as a chained literal CASE expression (broadcast
of nothing; whole-stage codegen, no shuffle).

Determinism: pattern counts are exact longs; EM arithmetic is IEEE
doubles evaluated in a fixed field order and a fixed pattern order
(sorted by agreement tuple), so repeated runs are bit-identical. The
DuckDB oracle (q81) unrolls the same fixed-iteration EM in SQL; sums
over the <= 2^F pattern rows are the only order-unpinned float ops,
and results are rounded to 6 dp before comparison.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FSParams:
    """Learned model: field order is the estimation order (fixed)."""

    fields: tuple[str, ...]
    lam: float
    m: tuple[float, ...]
    u: tuple[float, ...]
    iterations: int

    def posterior(self, pattern: tuple[int, ...]) -> float:
        """P(match | agreement pattern), the E-step formula."""
        a, b = self.lam, 1.0 - self.lam
        for g, m_f, u_f in zip(pattern, self.m, self.u):
            a = a * (m_f if g else 1.0 - m_f)
            b = b * (u_f if g else 1.0 - u_f)
        return a / (a + b) if a + b > 0 else 0.0


def _clip(x: float, lo: float = 1e-6, hi: float = 1.0 - 1e-6) -> float:
    return lo if x < lo else hi if x > hi else x


def estimate_fs(
    pairs: DataFrame,
    agreement_cols: list[str],
    iterations: int = 20,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> FSParams:
    """Fit the FS model over candidate ``pairs`` whose ``agreement_cols``
    are 0/1 ints (build them with native expressions — exact equality,
    normalized-field equality, band membership — so the pair stream
    stays codegen'd).

    One Spark job (the pattern groupBy); EM runs on the collected
    contingency table. m/u are clipped to (1e-6, 1-1e-6) so degenerate
    all-agree / never-agree fields cannot produce 0/0 or log(0)."""
    counts = (
        pairs.groupBy(*agreement_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return estimate_fs_from_counts(
        counts, agreement_cols, count_col="cnt", iterations=iterations,
        init_lambda=init_lambda, init_m=init_m, init_u=init_u,
    )


def estimate_fs_from_counts(
    counts,
    agreement_cols: list[str],
    count_col: str = "cnt",
    iterations: int = 20,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> FSParams:
    """EM over an ALREADY-AGGREGATED pattern contingency table (a list
    of Rows/dicts with the agreement columns + ``count_col``). Lets a
    caller that also needs the pattern table as OUTPUT aggregate the
    pair stream exactly once (one map-side-combinable groupBy) instead
    of once for EM and once for the result. Arithmetic is identical to
    :func:`estimate_fs` (same sorted-pattern order, same clips)."""
    for r in counts:
        for c in agreement_cols:
            if r[c] is None:
                raise ValueError(
                    f"estimate_fs: NULL in agreement column {c!r} — "
                    "coalesce indicators to 0/1 (or a dedicated level) "
                    "before fitting"
                )
    # fixed pattern order => deterministic float accumulation
    patt = sorted(
        (tuple(int(r[c]) for c in agreement_cols), int(r[count_col]))
        for r in counts
    )
    total = sum(c for _, c in patt)
    if total == 0:
        raise ValueError("estimate_fs: empty pair set")
    nf = len(agreement_cols)
    lam = init_lambda
    m = [init_m] * nf
    u = [init_u] * nf
    for _ in range(iterations):
        # E-step per pattern, in sorted-pattern order
        sp = 0.0  # sum cnt * p
        sq = 0.0  # sum cnt * (1-p) — spelled as the SQL oracle spells it
        sm = [0.0] * nf  # sum cnt * p * g_f
        su = [0.0] * nf  # sum cnt * (1-p) * g_f
        for g, cnt in patt:
            a, b = lam, 1.0 - lam
            for f in range(nf):
                a = a * (m[f] if g[f] else 1.0 - m[f])
                b = b * (u[f] if g[f] else 1.0 - u[f])
            p = a / (a + b) if a + b > 0 else 0.0
            sp += cnt * p
            sq += cnt * (1.0 - p)
            for f in range(nf):
                if g[f]:
                    sm[f] += cnt * p
                    su[f] += cnt * (1.0 - p)
        # M-step
        lam = _clip(sp / total)
        m = [_clip(sm[f] / sp) if sp > 0 else init_m for f in range(nf)]
        u = [_clip(su[f] / sq) if sq > 0 else init_u for f in range(nf)]
    return FSParams(
        fields=tuple(agreement_cols),
        lam=lam,
        m=tuple(m),
        u=tuple(u),
        iterations=iterations,
    )


def fs_params_df(spark, params: FSParams) -> DataFrame:
    """(field, m, u, agree_weight, disagree_weight, lam) — one row per
    field in estimation order. Weights are the classic log2 evidence
    scores: agree = log2(m/u) (>0: agreement is match evidence),
    disagree = log2((1-m)/(1-u)) (<0)."""
    rows = [
        (
            f,
            params.m[i],
            params.u[i],
            math.log2(params.m[i] / params.u[i]),
            math.log2((1.0 - params.m[i]) / (1.0 - params.u[i])),
            params.lam,
        )
        for i, f in enumerate(params.fields)
    ]
    return spark.createDataFrame(
        rows, "field string, m double, u double, agree_weight double, "
        "disagree_weight double, lam double"
    )


def fs_pattern_df(spark, params: FSParams) -> DataFrame:
    """(g_<field>..., match_probability) for every 2^F pattern — the
    learned scoring table, inspectable and joinable."""
    nf = len(params.fields)
    rows = []
    for i in range(2**nf):
        g = tuple((i >> (nf - 1 - f)) & 1 for f in range(nf))
        rows.append((*g, params.posterior(g)))
    schema = (
        ", ".join(f"g_{f} int" for f in params.fields)
        + ", match_probability double"
    )
    return spark.createDataFrame(rows, schema)


def fs_match_probability(params: FSParams) -> F.Column:
    """A literal Column computing P(match | pattern) from the
    agreement columns — a chained CASE over at most 2^F branches, fully
    whole-stage-codegen (no join, no UDF, no shuffle). Attach with
    ``pairs.withColumn('match_probability', fs_match_probability(p))``.

    Guarded at 12 fields (4096 branches): beyond that the literal plan
    bloats — join fs_pattern_df instead."""
    nf = len(params.fields)
    if nf > 12:
        raise ValueError(
            "fs_match_probability: >12 fields enumerates >4096 CASE "
            "branches; broadcast-join fs_pattern_df instead"
        )
    expr = F.lit(None).cast("double")
    for i in range(2**nf):
        g = tuple((i >> (nf - 1 - f)) & 1 for f in range(nf))
        cond = None
        for f, col in enumerate(params.fields):
            c = F.col(col) == F.lit(g[f])
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(params.posterior(g))).otherwise(expr)
    return expr


def tf_adjusted_weights(
    records: DataFrame,
    value_col: str,
    m: float,
    field: str | None = None,
    min_share: float = 1e-9,
) -> DataFrame:
    """Term-frequency-adjusted agreement weights (Winkler's TF
    adjustment, the formulation Splink documents): agreement on a RARE
    value is much stronger match evidence than agreement on a common
    one, so for an agreeing pair with value v the u-probability is
    replaced by v's record share s_v, giving

        agree_weight(v) = log2(m_f / s_v)

    (the global weight log2(m/u) plus the adjustment log2(u/s_v)).
    ``m`` comes from estimate_fs (or a prior); NULL/empty values are
    excluded from the share denominator and get no row.

    Output: (field, value, n_records, share, agree_weight) — one row
    per distinct value, sized by the field's vocabulary. Attach to a
    pair stream with a broadcast join on the agreeing value (the
    vocabulary table is small by construction for blocking-grade
    fields; for free-text-sized vocabularies attach the share at
    record level BEFORE pairing instead).

    Determinism: share is one division of exact longs; the weight is
    log2 of one division — oracle-safe at 6 dp.

    Scale plan (100 TB): ONE map-side-combinable groupBy over the
    record table; no pair-stream pass at all.
    """
    fname = field or value_col
    vals = records.select(F.col(value_col).alias("value")).where(
        F.col("value").isNotNull() & (F.col("value").cast("string") != "")
    )
    counts = vals.groupBy("value").agg(F.count(F.lit(1)).alias("n_records"))
    total = counts.agg(F.sum("n_records").alias("_t"))
    out = counts.crossJoin(F.broadcast(total))
    share = F.col("n_records") / F.col("_t")
    return out.select(
        F.lit(fname).alias("field"),
        F.col("value").cast("string").alias("value"),
        "n_records",
        share.alias("share"),
        F.log2(F.lit(m) / F.greatest(share, F.lit(min_share))).alias(
            "agree_weight"
        ),
    )


def fs_posterior_edges(
    edges: DataFrame,
    fields: list[str],
    agree_at: float = 0.9,
    iterations: int = 20,
    scores_col: str = "field_scores",
) -> tuple[DataFrame, FSParams]:
    """Unsupervised posterior for a SCORED pair stream (the pipeline's
    edges stage): binarize each per-field similarity into an agreement
    indicator (field_scores[f] >= agree_at), fit the FS model by EM,
    and attach P(match | pattern) as a native literal CASE column.

    Returns (edges + g_<field> indicators + match_probability, params).
    The posterior is calibrated purely from the candidate-pair
    distribution — no labels — so it gives the weighted-sum score an
    unsupervised probabilistic companion: rank/threshold on
    ``match_probability`` when no tuning set exists.

    Scale plan: one extra groupBy over the edges (the EM contingency
    collect, <= 2^F rows) + a codegen'd projection. Nothing else.
    """
    g_cols = [f"g_{f}" for f in fields]
    with_g = edges.select(
        "*",
        *[
            (F.coalesce(F.col(scores_col).getItem(f), F.lit(0.0)) >= agree_at)
            .cast("int")
            .alias(g)
            for f, g in zip(fields, g_cols)
        ],
    )
    params = estimate_fs(with_g, g_cols, iterations=iterations)
    return (
        with_g.withColumn("match_probability", fs_match_probability(params)),
        params,
    )


@dataclass(frozen=True)
class FSLevelParams:
    """Multi-level model: per field f, m[f][l] = P(gamma_f = l | match)
    and u[f][l] likewise, l in 0..levels[f]-1 (higher = more similar)."""

    fields: tuple[str, ...]
    levels: tuple[int, ...]
    lam: float
    m: tuple[tuple[float, ...], ...]
    u: tuple[tuple[float, ...], ...]
    iterations: int

    def posterior(self, pattern: tuple[int, ...]) -> float:
        a, b = self.lam, 1.0 - self.lam
        for f, l in enumerate(pattern):
            a = a * self.m[f][l]
            b = b * self.u[f][l]
        return a / (a + b) if a + b > 0 else 0.0


def fs_level_inits(n_levels: int) -> tuple[list[float], list[float]]:
    """Deterministic EM inits for an L-level field: m puts geometric
    mass on HIGH levels (2^(l+1) weights), u the mirror image — both
    exactly reproducible as SQL double literals."""
    tot = float(2 ** (n_levels + 1) - 2)
    m0 = [2.0 ** (l + 1) / tot for l in range(n_levels)]
    u0 = [2.0 ** (n_levels - l) / tot for l in range(n_levels)]
    return m0, u0


def estimate_fs_levels(
    pairs: DataFrame,
    level_cols: list[tuple[str, int]],
    iterations: int = 20,
    init_lambda: float = 0.1,
) -> FSLevelParams:
    """Fellegi-Sunter with MULTI-LEVEL comparison vectors (the Splink
    'comparison levels' model): each field's column holds an int level
    0..L-1 (0 = most dissimilar), and EM estimates the per-level m/u
    distributions instead of a single agree probability. NULL-aware
    comparisons fit naturally: dedicate a level to 'either side NULL'
    so missingness stops counting as disagreement.

    Same scale shape as estimate_fs: ONE groupBy, prod(L_f) collected
    pattern rows, driver-side EM; per-level probabilities are clipped
    to [1e-6, 1-1e-6] (no renormalization after clipping — the clip
    only engages for degenerate levels; documented divergence from
    renormalizing implementations, mirrored exactly by the SQL oracle).
    """
    fields = [f for f, _ in level_cols]
    levels = [n for _, n in level_cols]
    counts = pairs.groupBy(*fields).agg(F.count(F.lit(1)).alias("cnt")).collect()
    for r in counts:
        for c in fields:
            if r[c] is None:
                raise ValueError(
                    f"estimate_fs_levels: NULL in level column {c!r} — "
                    "comparison-level ladders must coalesce NULL inputs "
                    "to a level (e.g. 0) before estimation"
                )
    patt = sorted(
        (tuple(int(r[c]) for c in fields), int(r["cnt"])) for r in counts
    )
    total = sum(c for _, c in patt)
    if total == 0:
        raise ValueError("estimate_fs_levels: empty pair set")
    for g, _ in patt:
        for f, l in enumerate(g):
            if not (0 <= l < levels[f]):
                raise ValueError(
                    f"level {l} out of range for field {fields[f]} "
                    f"(expected 0..{levels[f] - 1})"
                )
    nf = len(fields)
    lam = init_lambda
    m = []
    u = []
    for L in levels:
        m0, u0 = fs_level_inits(L)
        m.append(m0)
        u.append(u0)
    for _ in range(iterations):
        sp = 0.0
        sq = 0.0
        sm = [[0.0] * L for L in levels]
        su = [[0.0] * L for L in levels]
        for g, cnt in patt:
            a, b = lam, 1.0 - lam
            for f in range(nf):
                a = a * m[f][g[f]]
                b = b * u[f][g[f]]
            p = a / (a + b) if a + b > 0 else 0.0
            sp += cnt * p
            sq += cnt * (1.0 - p)
            for f in range(nf):
                sm[f][g[f]] += cnt * p
                su[f][g[f]] += cnt * (1.0 - p)
        lam = _clip(sp / total)
        m = [
            [_clip(sm[f][l] / sp) if sp > 0 else m[f][l] for l in range(levels[f])]
            for f in range(nf)
        ]
        u = [
            [_clip(su[f][l] / sq) if sq > 0 else u[f][l] for l in range(levels[f])]
            for f in range(nf)
        ]
    return FSLevelParams(
        fields=tuple(fields),
        levels=tuple(levels),
        lam=lam,
        m=tuple(tuple(v) for v in m),
        u=tuple(tuple(v) for v in u),
        iterations=iterations,
    )


def fs_level_params_df(spark, params: FSLevelParams) -> DataFrame:
    """(field, level, m, u, weight, lam) long-form params table;
    weight = log2(m/u) per level (positive = evidence FOR a match)."""
    rows = []
    for f, name in enumerate(params.fields):
        for l in range(params.levels[f]):
            rows.append(
                (
                    name,
                    l,
                    params.m[f][l],
                    params.u[f][l],
                    math.log2(params.m[f][l] / params.u[f][l]),
                    params.lam,
                )
            )
    return spark.createDataFrame(
        rows,
        "field string, level int, m double, u double, weight double, lam double",
    )
