"""Deterministic sampling operators for training-data pipelines.

Training-set curation needs samples that are (a) reproducible across
runs and engines — no ``rand()`` — and (b) cheap at 100 TB. Both
operators key off a hash of the record id, so the sample is a pure
function of the data:

- :func:`stratified_sample` — keep a per-stratum FRACTION via a hash
  threshold. A pure filter: no shuffle, no sort, pushes down to the
  scan, trivially parallel at any scale.
- :func:`quota_sample` — keep an exact per-stratum COUNT (the n
  hash-smallest rows of each stratum).
- :func:`prototype_prune` — SSL-prototype pruning: per-k-means-cluster
  rank by cosine to the centroid, keep the hardest (or easiest) n
- :func:`hash_split` — deterministic train/val/test labeling via
  cumulative hash-coin cutoffs (every row gets exactly one label)
- :func:`mixture_sample` — down-sample to a target DOMAIN MIXTURE
  (waterfill: the largest total hitting the target shares without
  upsampling any stratum), then the same hash-threshold filter. Two-phase at scale: a hash
  cutoff prefilter shrinks each stratum to ~margin*n expected rows
  BEFORE the per-stratum window sort, so the sort never sees the full
  stratum; strata the prefilter undershoots (rare, bounded by the
  margin) are re-ranked exactly from the full input.

``hash_impl="portable"`` (functions/hashing.py) makes both operators
bit-reproducible in DuckDB/numpy for the correctness oracle;
``"fast"`` (xxhash64) is the production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from resolve_spark.functions.hashing import check_hash_impl, portable_hash60

#: hash-threshold resolution: fractions are quantized to 1/SCALE
FRACTION_SCALE = 1_000_000


def _sample_hash(id_col: Column, salt: str, hash_impl: str) -> Column:
    """Non-negative int64 hash of (salt, id) — the sampling coin."""
    tagged = F.concat(F.lit(salt + ":"), id_col.cast("string"))
    if check_hash_impl(hash_impl) == "portable":
        return portable_hash60(tagged)
    return F.abs(F.xxhash64(tagged))


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    return int(round(fraction * FRACTION_SCALE))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: float | dict[str, float],
    strata_col: str | None = None,
    salt: str = "ss",
    hash_impl: str = "fast",
) -> DataFrame:
    """Deterministic hash-threshold sample: keep a row iff
    ``hash(salt, id) % SCALE < fraction * SCALE``.

    ``fractions`` is a single fraction, or a per-stratum dict over
    ``strata_col`` values (strata absent from the dict are dropped —
    quota-style curation: "20% of en, 100% of fr, none of the rest").

    Scale: a pure filter over native expressions — zero shuffle, zero
    state; the same rows are kept regardless of partitioning, executor
    count, or input order.
    """
    coin = _sample_hash(F.col(id_col), salt, hash_impl) % FRACTION_SCALE
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        cut: Column = F.lit(-1)
        for value, frac in sorted(fractions.items()):
            cut = F.when(F.col(strata_col) == value, F.lit(_threshold(frac))).otherwise(cut)
    else:
        cut = F.lit(_threshold(float(fractions)))
    return df.where(coin < cut)


def quota_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n: int,
    salt: str = "qs",
    hash_impl: str = "fast",
    margin: float = 4.0,
) -> DataFrame:
    """Exactly the ``n`` hash-smallest rows of every stratum (all rows
    of strata smaller than ``n``) — a deterministic per-stratum quota.

    The result is a pure function of the data: the n winners per
    stratum are fixed by ``hash(salt, id)`` (ties broken by id), never
    by partition layout or timing.

    Scale plan: ranking a whole stratum at 100 TB is a giant sort, so
    the window only ever runs on a prefiltered slice. Phase 1 counts
    each stratum (one map-side-combinable agg of tiny data) and derives
    a hash cutoff admitting ~margin*n expected rows; phase 2 ranks the
    survivors. Strata where the prefilter admitted fewer than ``n``
    rows (probability bounded by the margin; Chernoff < 1e-9 at
    margin=4, n>=32) are re-ranked from the full input — correctness
    never depends on the margin.
    """
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    coin = _sample_hash(F.col(id_col), salt, hash_impl).alias("_coin")
    hashed = df.select("*", coin)
    counts = hashed.groupBy(strata_col).agg(F.count("*").alias("_stratum_n"))

    # phase 1: hash cutoff that admits ~margin*n of each stratum.
    # hashes are ~uniform on [0, 2^60) (portable) / [0, 2^63) (fast);
    # estimate the range from the observed max to stay impl-agnostic.
    hash_span = float(2**60 if hash_impl == "portable" else 2**63)
    cutoff = F.least(
        F.lit(hash_span),
        F.lit(margin * n) / F.col("_stratum_n") * F.lit(hash_span),
    ).alias("_cutoff")
    # every internal join is NULL-SAFE on the stratum key (eqNullSafe):
    # a NULL stratum is a real stratum (groupBy/window already treat it
    # as one) and plain equi-joins would silently drop all its rows
    sk = F.col(strata_col).eqNullSafe(F.col("_sc"))
    cnt = counts.select(F.col(strata_col).alias("_sc"), cutoff)
    pre = hashed.join(F.broadcast(cnt), sk).drop("_sc")
    survivors = pre.where((F.col("_coin") < F.col("_cutoff")) | (F.col("_cutoff") >= hash_span))

    w_rank = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(F.col("_coin"), F.col(id_col))
    )
    ranked = survivors.withColumn("_rk", w_rank)

    # strata the prefilter undershot: admitted < n although the stratum
    # itself has >= n rows — re-rank those from the full input
    admitted = ranked.groupBy(strata_col).agg(F.max("_rk").alias("_adm")) \
        .withColumnRenamed(strata_col, "_sc")
    short = (
        counts.join(admitted, sk, "left")  # left: a stratum may have 0 survivors
        .withColumn("_adm", F.coalesce("_adm", F.lit(0)))
        .where((F.col("_adm") < n) & (F.col("_stratum_n") > F.col("_adm")))
        .select(F.col(strata_col).alias("_sc"))
    )
    # fully lazy (no plan-build collect): `short` is bounded by the
    # stratum count, so both corrective joins broadcast; the rescue
    # window re-ranks ONLY the semi-joined (short) strata
    out = ranked.where(F.col("_rk") <= n).join(F.broadcast(short), sk, "left_anti")
    rescued = (
        hashed.join(F.broadcast(short), sk, "left_semi")
        .withColumn("_rk", w_rank)
        .where(F.col("_rk") <= n)
    )
    return out.unionByName(rescued, allowMissingColumns=True).select(*df.columns)


def _mixture_cuts(
    counts: dict[str, int], targets: dict[str, float], t_max: float
) -> dict[str, int]:
    """Per-stratum ppm keep-cuts for :func:`mixture_sample`. The binding
    stratum (count/share == t_max — the SAME float division that
    produced t_max, so the equality is exact) gets the full-scale cut
    outright: the float round-trip share * (cnt/share) / cnt can land a
    hair below 1.0 (e.g. share 0.1, cnt 3 -> 0.9999999999999999) and
    floor() would then shave ~1ppm off the stratum mixture_sample
    promises to keep whole. Mirrored verbatim in the q62 oracle SQL."""
    import math

    return {
        s: (
            FRACTION_SCALE
            if counts[s] / targets[s] == t_max
            else math.floor(float(FRACTION_SCALE) * targets[s] * t_max / counts[s])
        )
        for s in targets
    }


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    targets: dict[str, float],
    salt: str = "mx",
    hash_impl: str = "fast",
    total: int | None = None,
) -> DataFrame:
    """Down-sample to a target domain mixture (waterfill): given target
    shares per stratum (e.g. the Pile/LLaMA-style corpus weights), find
    the largest total size T achievable WITHOUT upsampling any stratum
    — T = min over s of count_s / share_s — and keep each stratum at
    rate share_s * T / count_s via the deterministic hash coin. The
    binding stratum is kept whole; the rest are thinned to proportion.
    ``total`` optionally caps T below the waterfill maximum.

    Strata absent from ``targets`` are dropped (curation semantics,
    as in :func:`stratified_sample`); a target stratum absent from the
    data is an error — the requested mixture is unreachable.

    Scale plan: pass 1 is one map-side-combinable count per stratum
    (#strata rows — domain labels, small by construction — collected
    to the driver to fix the rates); pass 2 is the same zero-shuffle
    hash-threshold filter as stratified_sample. The kept set is a pure
    function of (data, targets, salt) — reproducible across runs,
    partitionings, and engines.
    """
    import math

    if not targets:
        raise ValueError("targets must be non-empty")
    for s, share in targets.items():
        if share <= 0:
            raise ValueError(f"target share must be positive: {s}={share}")
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(strata_col).isin(list(targets)))
        .groupBy(strata_col)
        .count()
        .collect()
    }
    missing = sorted(set(targets) - set(counts))
    if missing:
        raise ValueError(f"target strata absent from data: {missing}")
    # float literal order matters for the DuckDB oracle replica: keep
    # exactly  min(cnt / share)  then  floor(1e6 * share * T / cnt)
    t_max = min(counts[s] / targets[s] for s in targets)
    if total is not None:
        t_max = min(t_max, float(total))
    cuts = _mixture_cuts(counts, targets, t_max)
    coin = _sample_hash(F.col(id_col), salt, hash_impl) % FRACTION_SCALE
    cut: Column = F.lit(-1)
    for value, ppm in sorted(cuts.items()):
        cut = F.when(F.col(strata_col) == value, F.lit(ppm)).otherwise(cut)
    return df.where(coin < cut)


def prototype_prune(
    df: DataFrame, id_col: str, vec_col: str,
    k: int = 8, iters: int = 2, keep_per_cluster: int = 20,
    keep: str = "hard", quant: int = 6,
) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al. 2022,
    arXiv:2206.14486): score each example by cosine to its k-means
    centroid, then keep ``keep_per_cluster`` examples per cluster —
    ``keep="hard"`` keeps the LEAST prototypical (farthest from the
    centroid; the paper's prescription when data is abundant),
    ``keep="easy"`` the most prototypical (best when data is scarce).
    Returns (id_col, cluster, rank, kept) with kept as 0/1.

    Deterministic: the ranking orders on kmeans_assign's round-6
    quantized cosine with the id as tiebreak (planted exact dups have
    identical vectors, hence identical cosines — the id breaks them),
    so a SQL oracle reproduces every rank.

    Scale: kmeans_assign's cost plus ONE shuffle by cluster for the
    per-cluster window rank. Cluster population is n/k — the same knob
    as semantic_dedup (k grows with the corpus); AQE skew handling
    covers stragglers. The full ranking ships with a kept flag instead
    of filtering so callers can re-cut without re-clustering.
    """
    from resolve_spark.operators.ann import kmeans_assign

    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy': {keep}")
    assign = kmeans_assign(df, id_col, vec_col, k=k, iters=iters, quant=quant)
    order = F.col("cos").asc() if keep == "hard" else F.col("cos").desc()
    w = Window.partitionBy("cluster").orderBy(order, F.col(id_col).asc())
    return assign.select(
        F.col(id_col),
        "cluster",
        F.row_number().over(w).alias("rank"),
    ).withColumn(
        "kept",
        F.when(F.col("rank") <= keep_per_cluster, F.lit(1)).otherwise(F.lit(0)),
    )


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float] | None = None,
    salt: str = "split", split_col: str = "split", hash_impl: str = "fast",
) -> DataFrame:
    """Deterministic train/val/test split: the (salt, id) hash coin
    lands each row in exactly one named bucket. Boundaries are
    cumulative ppm cutoffs in the given dict order and the LAST split
    absorbs the rounding remainder, so every row is labeled. The split
    is a pure function of the data — reproducible across runs, engines
    and cluster sizes, order-independent, and rows keep their label
    when the corpus grows (no global count, sort or shuffle: the label
    is one projected expression, scan-speed at any scale).

    Weights must sum to 1 (+-1e-9). Returns df plus ``split_col``.
    """
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    if len(weights) < 2:
        raise ValueError("hash_split needs at least two splits")
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1: {weights}")
    coin = _sample_hash(F.col(id_col), salt, hash_impl) % FRACTION_SCALE
    names = list(weights)
    expr = None
    cum = 0
    for name in names[:-1]:
        cum += _threshold(weights[name])
        cond = coin < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def uncertainty_sample(
    scored: DataFrame,
    k: int,
    prob_col: str = "match_probability",
    tiebreak_cols: tuple[str, ...] = ("id_a", "id_b"),
) -> DataFrame:
    """Active-learning pair selection for clerical review: the k pairs
    whose match probability sits closest to 0.5 — the rows where a
    human label buys the most model improvement (uncertainty sampling;
    pairs with posterior ~0 or ~1 teach nothing). Feed the labels to
    match_metrics or as estimate_fs priors.

    Deterministic: the order key is (|p - 0.5|, *tiebreak_cols) — a
    total order, so the same k rows come back every run. Rows with a
    NULL probability are excluded up front: Spark sorts NULLs FIRST
    ascending, so without the filter unscored rows would fill the queue
    ahead of every genuinely uncertain pair.

    Scale plan: Catalyst compiles orderBy(...).limit(k) to
    TakeOrderedAndProject — a per-partition top-k heap + single merge,
    never a global sort (plan-asserted in tests). The |p - 0.5| key is
    materialized as a column BEFORE the orderBy (r7): the top-k heap's
    comparator evaluates its ordering expressions per comparison, so
    sorting on the raw |CASE...| expression re-ran the posterior CASE
    ~once per heap probe (measured 14.2s -> 4.4s over 50M rows at
    sf1.0); on a bound column it is one field read."""
    key = F.abs(F.col(prob_col) - F.lit(0.5))
    return (
        scored.where(F.col(prob_col).isNotNull())
        .withColumn("_u_key", key)
        .orderBy(F.asc("_u_key"), *[F.asc(c) for c in tiebreak_cols])
        .limit(k)
        .drop("_u_key")
    )
