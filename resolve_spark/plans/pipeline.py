"""The end-to-end entity-resolution pipeline (SURVEY.md §3, Spark plans).

    files/entities
      -> normalize (§2.2)                         [stage: normalized]
      -> multi-pass blocking keys (§2.6)          [stage: blocked]
      -> budgeted candidate pairs                  [stage: pairs]
      -> fused pairwise scoring + threshold (§2.7) [stage: edges]
      -> connected components (§2.8)               [stage: clusters]
      -> group statistics (G5)                     [stage: stats]

Each stage checkpoints to an Iceberg-layout table with lineage; a rerun
resumes from the first stage whose fingerprint changed. The per-row
invariant sha256(content) is stamped at ingest and carried through to
the cluster output so it can be asserted end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resolve_spark.config import BlockingConfig, MatchConfig
from resolve_spark.functions import normalize as N
from resolve_spark.functions.embedding import combine_fields, embed_dedup
from resolve_spark.operators import blocking as B
from resolve_spark.operators import clustering as C
from resolve_spark.operators.pairs import candidate_pairs
from resolve_spark.operators.scoring import FieldSpec, attach_pair_sides, score_pairs, scored_edges_projection
from resolve_spark.sources.checkpoint import CheckpointManager, fingerprint


@dataclass(frozen=True)
class PipelineConfig:
    """Field mapping + match semantics for one input-table shape."""

    id_col: str
    specs: tuple[FieldSpec, ...]
    blocking: BlockingConfig
    threshold: float = 0.85
    normalize_types: dict[str, str] = dc_field(default_factory=dict)
    derived_columns: dict[str, str] = dc_field(default_factory=dict)  # name -> SQL expr
    use_vectors: bool = False
    embedding_dim: int = 16
    # pluggable embedder: list[str] -> list of embedding_dim vectors
    # (embed.go:66-197 batch semantics); None = reference mock formula
    embed_fn: object | None = None
    content_col: str | None = None  # sha256-invariant column
    cluster_strategy: str = "transitive"  # transitive | hybrid
    stat_fields: tuple[str, ...] = ()
    # drop candidate pairs whose content-length ratio
    # least(len)/greatest(len) falls below this BEFORE scoring — a
    # native prefilter (needs content_col). None = off.
    length_ratio_gate: float | None = None


def files_pipeline_config(threshold: float = 0.87) -> PipelineConfig:
    """Default config for the graft input shape (BASELINE.json):
    (repo, path, commit, lang, content).

    Threshold 0.87 (was 0.85): fp-band analysis at 4M records (BENCH.md
    round 4) shows every true edge scores >= 0.8867 across 1.23M true
    pairs (the planted-variant transformations bound the score from
    below, independent of scale) while false edges concentrate just
    above 0.85 and COMPOUND with data density — 0.87 removes ~55% of
    them at zero measured recall cost (fn = 0 before and after,
    verified at 4M). The ENTITY config keeps the reference's 0.85
    (parity); this is the tuning knob for the north-rule files job.
    """
    return PipelineConfig(
        id_col="record_id",
        specs=(
            FieldSpec("repo", "repo", "name", weight=0.4),
            FieldSpec("path", "path", "address", weight=0.2),
            FieldSpec("lang", "lang", "exact", weight=0.05),
            # content is tokenized ONCE per record in the normalized
            # stage; pairs intersect the arrays (O(pairs*tokens), not
            # O(pairs*doc_len) re-tokenization)
            FieldSpec("content", "content_tokens", "jaccard_tokens", weight=0.3),
        ),
        blocking=BlockingConfig(
            enable_canopy=False,  # 3-char prefixes are non-discriminative on repo paths
            token_columns=("repo", "path"),
            # q-grams over repo|path: path entropy keeps gram blocks
            # discriminative; oversized gram blocks are purged (see
            # BlockingConfig.purge_passes)
            qgram_column="repo_path",
            minhash_column="content",
            max_block_size=200,
            neighborhood_window=10,
        ),
        threshold=threshold,
        derived_columns={"repo_path": "concat(repo, '|', path)"},
        content_col="content",
        stat_fields=("repo", "lang"),
        # measured at 1M records (BENCH.md round 4): every true edge has
        # content-length ratio >= 0.9279 (p05 0.984) while surviving
        # false edges sit at median 0.71 — 0.9 kills nearly all residual
        # fp at zero recall cost AND skips the scoring kernels for
        # length-mismatched pairs
        length_ratio_gate=0.9,
    )


def entities_pipeline_config(threshold: float = 0.85) -> PipelineConfig:
    """Reference-shaped entity tables (name/address/city/.../email),
    reference defaults: canopy on (name, zip) (config.go:164), default
    field weights (config.go:132-140)."""
    return PipelineConfig(
        id_col="id",
        specs=(
            FieldSpec("name", "name", "name", weight=0.4),
            FieldSpec("address", "address", "address", weight=0.2),
            # city/state have no family match in F8 inference -> text (JW)
            FieldSpec("city", "city", "jaro", weight=0.1),
            FieldSpec("state", "state_normalized", "jaro", weight=0.05),
            FieldSpec("zip", "zip", "zipcode", weight=0.05),
            FieldSpec("phone", "phone", "phone", weight=0.1),
            FieldSpec("email", "email", "email", weight=0.1),
        ),
        blocking=BlockingConfig(fields=("name", "zip"), enable_canopy=True),
        threshold=threshold,
        normalize_types={c: c for c in ("name", "address", "phone", "email", "state", "zip", "city")},
        use_vectors=True,
        stat_fields=("name", "city", "state"),
    )


def raw_input_columns(cfg: PipelineConfig) -> tuple[str, ...]:
    """The raw input columns a config's ``normalized`` stage consumes —
    used to pad a partial query row (e.g. a parsed text match) with ''
    so it can run the exact normalize/embed/block stages the store was
    ingested with."""
    cols: set[str] = set(cfg.normalize_types)
    if cfg.content_col:
        cols.add(cfg.content_col)
    for s in cfg.specs:
        base = s.column
        for suffix in ("_tokens", "_pre", "_normalized"):
            base = base.removesuffix(suffix)
        if base not in cfg.derived_columns:
            cols.add(base)
    return tuple(sorted(cols))


@dataclass
class PipelineRun:
    normalized: DataFrame
    pairs: DataFrame
    edges: DataFrame
    clusters: DataFrame
    stats: DataFrame
    counters: dict
    # cached intermediates the run pinned but does not expose (the
    # checkpoint-less blocked stage; an increment's new_norm) — released
    # by unpersist() alongside the public frames
    pinned: tuple = ()

    def unpersist(self) -> None:
        """Release every cached DataFrame this run pinned — the public
        frames AND the internal ``pinned`` intermediates. Call when the
        run is superseded (e.g. after merging an increment into it with
        ``run_incremental``) — a long-lived session applying increments
        in a loop otherwise accumulates pinned blocks without bound.
        unpersist() on a checkpoint-backed (never persisted) frame is a
        harmless no-op, so this is safe in both stage modes."""
        for df in (self.normalized, self.pairs, self.edges,
                   self.clusters, self.stats, *self.pinned):
            if df is not None:
                df.unpersist()


class ResolvePipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig,
                 checkpoint_dir: str | None = None):
        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(spark, checkpoint_dir) if checkpoint_dir else None

    # -- stages ------------------------------------------------------------

    def normalized(self, df: DataFrame) -> DataFrame:
        cfg = self.cfg
        for name, expr in cfg.derived_columns.items():
            df = df.withColumn(name, F.expr(expr))
        if cfg.normalize_types:
            df = N.normalize_entity(df, cfg.normalize_types)
        if cfg.content_col:
            df = df.withColumn("content_sha256", F.sha2(F.col(cfg.content_col), 256))
        # pre-tokenize for jaccard_tokens specs (tokenize once per record)
        # and store xxhash64 TOKEN HASHES, not strings: per-pair
        # array_intersect compares/hashes int64s instead of strings
        # (~3x cheaper) and the shuffled rows are much smaller. Jaccard
        # over distinct hashes == jaccard over distinct tokens up to
        # xxhash64 collisions (~n^2/2^64 — negligible at any scale here).
        from resolve_spark.functions import fields as FD
        from resolve_spark.functions import similarity as SIM
        for s in cfg.specs:
            if s.kernel == "jaccard_tokens" and s.column not in df.columns:
                src = s.column.removesuffix("_tokens")
                df = df.withColumn(
                    s.column,
                    F.transform(SIM.tokens(F.col(src)), lambda t: F.xxhash64(t)),
                )
            # name/address composites: preprocess ONCE PER RECORD (not per
            # pair side) and pre-tokenize, so scoring decomposes into
            # native math + a JW-only pUDF (scoring.score_pairs)
            if s.kernel.lower() in FD.DECOMPOSABLE_KERNELS:
                pre = f"{s.column}_pre"
                if pre not in df.columns:
                    df = df.withColumn(
                        pre,
                        FD.preprocess_udf(s.kernel.lower())(
                            F.coalesce(F.col(s.column), F.lit(""))
                        ),
                    )
                    df = df.withColumn(
                        f"{pre}_tokens",
                        F.transform(SIM.tokens(F.col(pre)), lambda t: F.xxhash64(t)),
                    )
        if cfg.use_vectors:
            combined = combine_fields(
                [F.col(f"{s.column}") for s in cfg.specs]
            )
            df = df.withColumn("combined_text", combined)
            df = embed_dedup(df, "combined_text", "vector", cfg.embedding_dim,
                             embed_fn=cfg.embed_fn)
        return df

    def blocked(self, df: DataFrame) -> DataFrame:
        return B.add_blocking_keys(df, self.cfg.blocking)

    def score(self, pairs: DataFrame, entities: DataFrame) -> DataFrame:
        cfg = self.cfg
        side_cols = [s.column for s in cfg.specs]
        # preprocessed companions enable the decomposed scoring path
        for s in cfg.specs:
            for extra in (f"{s.column}_pre", f"{s.column}_pre_tokens"):
                if extra in entities.columns:
                    side_cols.append(extra)
        if cfg.use_vectors:
            side_cols = side_cols + ["vector"]
        if cfg.length_ratio_gate and cfg.content_col:
            entities = entities.withColumn(
                "_clen", F.length(F.col(cfg.content_col))
            )
            side_cols = side_cols + ["_clen"]
        wide = attach_pair_sides(pairs, entities, cfg.id_col, side_cols)
        if cfg.length_ratio_gate and cfg.content_col:
            # native filter ahead of every scoring kernel (incl. the JW
            # pUDF): grossly length-mismatched pairs can't be the same
            # record — see files_pipeline_config for the measured margin
            wide = wide.where(
                F.least("_clen_a", "_clen_b")
                / F.greatest("_clen_a", "_clen_b")
                >= cfg.length_ratio_gate
            )
        scored = score_pairs(
            wide,
            list(cfg.specs),
            threshold=cfg.threshold,
            vector_col="vector" if cfg.use_vectors else None,
        )
        return scored_edges_projection(scored)

    def cluster_edges(self, edges: DataFrame) -> DataFrame:
        if self.cfg.cluster_strategy == "hybrid":
            return C.hybrid_edges(edges, self.cfg.threshold)
        return edges

    # -- driver ------------------------------------------------------------

    def run(self, raw: DataFrame, input_fp: str = "input") -> PipelineRun:
        cfg = self.cfg
        counters: dict = {}
        cfg_fp = fingerprint(cfg.specs, cfg.blocking, cfg.threshold,
                             cfg.use_vectors, cfg.cluster_strategy,
                             getattr(cfg.embed_fn, "__qualname__", None),
                             cfg.length_ratio_gate)

        def stage(name, fp, compute, stage_counters=None, partition_by=None):
            if self.ckpt is None:
                # persist: downstream stages must not re-execute upstream
                # lineage (pairs/edges/clusters each consume prior stages
                # more than once)
                df = compute().persist()
                if stage_counters:
                    counters.update(stage_counters() if callable(stage_counters) else stage_counters)
                return df, fp
            res = self.ckpt.run_stage(name, fp, compute, counters=stage_counters,
                                      partition_by=partition_by)
            counters.update(res.counters)
            return res.df, fp

        fp0 = fingerprint(input_fp, cfg_fp)
        normalized, fp1 = stage("normalized", fp0, lambda: self.normalized(raw))

        def compute_blocked():
            # the ONLY downstream consumer of this stage is
            # candidate_pairs, which reads (id, block_keys) — projecting
            # here keeps ~1.5KB/record of content columns out of the
            # stage checkpoint/persist (at 10.4M records the full-width
            # blocked stage wrote ~15 GB to re-read ~2% of it; scoring
            # re-attaches sides from `normalized`)
            b = self.blocked(normalized)
            keep = [cfg.id_col, "block_keys"]
            if "block_key" in b.columns:
                keep.append("block_key")
            return b.select(*keep)

        blocked, fp2 = stage("blocked", fingerprint(fp1, "blocked-slim"),
                             compute_blocked)

        pair_stats: dict = {}

        def compute_pairs():
            # count_pairs=False: the stage materialization right below is
            # the count (checkpoint footer lineage / persisted count) —
            # an eager count here would execute pair generation twice
            pairs, stats = candidate_pairs(blocked, cfg.id_col, cfg.blocking,
                                           count_pairs=False)
            if stats:
                pair_stats.update(
                    n_block_keys=stats.n_block_keys,
                    n_oversized_keys=stats.n_oversized_keys,
                    n_pruned_keys=stats.n_pruned_keys,
                    pairs_generated=stats.pairs_generated,
                    pairs_dropped_estimate=stats.pairs_dropped_estimate,
                )
            return pairs

        pairs, fp3 = stage("pairs", fingerprint(fp2, "pairs"), compute_pairs,
                           stage_counters=lambda: pair_stats)
        if counters.get("pairs_generated", 0) is None or counters.get("pairs_generated", 0) < 0:
            # exact count from the materialization, not a second execution
            if self.ckpt is not None:
                counters["pairs_generated"] = self.ckpt.lineage("pairs")["rows_out"]
            else:
                counters["pairs_generated"] = pairs.count()  # persisted above
        edges, fp4 = stage("edges", fingerprint(fp3, "edges"),
                           lambda: self.score(pairs, normalized))
        cluster_input = self.cluster_edges(edges)
        clusters, fp5 = stage(
            "clusters", fingerprint(fp4, cfg.cluster_strategy),
            lambda: C.assign_clusters(normalized, cluster_input, cfg.id_col),
        )
        stats_df = None
        if cfg.stat_fields:
            stats_df, _ = stage(
                "stats", fingerprint(fp5, cfg.stat_fields),
                lambda: C.group_statistics(
                    clusters, normalized, edges, cfg.id_col, list(cfg.stat_fields)
                ),
            )
        return PipelineRun(
            normalized, pairs, edges, clusters, stats_df, counters,
            pinned=(blocked,) if self.ckpt is None else (),
        )

    def run_incremental(
        self,
        prev: PipelineRun,
        new_raw: DataFrame,
        prev_blocked: DataFrame | None = None,
    ) -> PipelineRun:
        """Merge a new batch into an existing resolved state WITHOUT
        re-scoring the old corpus — the daily-crawl-increment path.

        Only pairs touching the increment are generated and scored:
        old-old edges are reused verbatim from ``prev.edges`` (pairwise
        scores don't change when records are added), and clusters can
        only merge under new transitive evidence, never split, so one
        connected-components pass over (old ∪ new) edges reproduces the
        full-recompute clustering. Equality with ``run(old ∪ new)`` is
        EXACT while every touched blocking key stays under
        ``max_block_size``; on oversized keys the sorted-neighborhood
        positions shift as new ids interleave, so hot-key recall differs
        within the same documented pair budget as the full run.

        Scale plan (increment m << corpus N):
        - normalize/embed/block run on the m new rows only;
        - the old side is pruned to records sharing >= 1 blocking key
          with the increment BEFORE pair generation — one semi-join on
          the exploded key stream (AQE broadcasts the increment's key
          set when small); pass ``prev_blocked`` (the persisted blocked
          stage: id + block_keys) to skip even the map-side re-blocking
          of the old corpus;
        - pair generation runs under the SAME budget/sorted-neighborhood
          machinery as the batch path, over touched-old ∪ new only, and
          both-old pairs are dropped before any scoring kernel;
        - CC cost is driven by edge count, which this path doesn't
          inflate: old-old edges enter once, as stored longs.

        Caller contract: ids are unique across batches (re-submitting an
        existing id is an update, which belongs to the store API path).
        The returned run persists its pairs/edges/clusters; when looping
        increments in one session, release each superseded run with
        ``prev.unpersist()`` after this call returns.
        """
        cfg = self.cfg
        counters: dict = {}
        new_norm = self.normalized(new_raw).persist()
        counters["new_records"] = new_norm.count()
        new_blocked = self.blocked(new_norm).select(cfg.id_col, "block_keys")
        if prev_blocked is None:
            prev_blocked = self.blocked(prev.normalized).select(
                cfg.id_col, "block_keys"
            )
        inc_keys = (
            new_blocked.select(F.explode("block_keys").alias("key")).distinct()
        )
        touched_old = (
            prev_blocked.select(
                F.col(cfg.id_col), F.explode("block_keys").alias("key")
            )
            .join(inc_keys, "key", "left_semi")
            .groupBy(cfg.id_col)
            .agg(F.collect_list("key").alias("block_keys"))
        )
        population = touched_old.unionByName(new_blocked).persist()
        pairs, pair_stats = candidate_pairs(
            population, cfg.id_col, cfg.blocking, count_pairs=False
        )
        if pair_stats:
            counters["touched_old_records"] = pair_stats.n_records - counters["new_records"]
            counters["pairs_dropped_estimate"] = pair_stats.pairs_dropped_estimate
        # keep only pairs with a new side; both-old pairs were scored in
        # a previous run (hits stay edges, misses stay misses)
        new_ids = new_norm.select(F.col(cfg.id_col).alias("_nid")).distinct()
        pairs = (
            pairs.join(
                new_ids.withColumn("_new_a", F.lit(True)),
                pairs.id_a == F.col("_nid"), "left",
            ).drop("_nid")
            .join(
                new_ids.withColumn("_new_b", F.lit(True)),
                F.col("id_b") == F.col("_nid"), "left",
            ).drop("_nid")
            .where(F.coalesce("_new_a", F.lit(False)) | F.coalesce("_new_b", F.lit(False)))
            .drop("_new_a", "_new_b")
            .persist()
        )
        counters["pairs_scored"] = pairs.count()
        # pairs is materialized now; the blocked population union was
        # only ever an input to pair generation — release it (the other
        # persists back DataFrames the returned PipelineRun exposes;
        # callers release a superseded run via PipelineRun.unpersist())
        population.unpersist()
        union_norm = prev.normalized.unionByName(
            new_norm, allowMissingColumns=True
        )
        new_edges = self.score(pairs, union_norm)
        edges = prev.edges.unionByName(new_edges, allowMissingColumns=True).persist()
        clusters = C.assign_clusters(
            union_norm, self.cluster_edges(edges), cfg.id_col
        ).persist()
        stats_df = None
        if cfg.stat_fields:
            stats_df = C.group_statistics(
                clusters, union_norm, edges, cfg.id_col, list(cfg.stat_fields)
            )
        return PipelineRun(
            union_norm, pairs, edges, clusters, stats_df, counters,
            # union_norm is lazy over the cached new_norm; expose the
            # persist through pinned so unpersist() releases it
            pinned=(new_norm,),
        )


# ---------------------------------------------------------------------------
# Evaluation — pairwise F1 at the shared blocking key (BASELINE.json metric)
# ---------------------------------------------------------------------------


def pairwise_f1(
    clusters: DataFrame, labeled: DataFrame, scope_pairs: DataFrame
) -> dict:
    """F1 of same-cluster decisions over the in-scope pair universe.

    scope = candidate pairs (pairs sharing >=1 blocking key, the
    BASELINE.json evaluation scope). ``labeled`` carries the true pairs
    (id_a < id_b, is_match). Returns precision/recall/f1 plus blocking
    recall (share of true pairs that made it into scope at all).
    """
    truth = labeled.where("is_match").select("id_a", "id_b")
    scope = scope_pairs.select("id_a", "id_b")
    ca = clusters.select(F.col("rid").alias("id_a"), F.col("cluster_id").alias("cl_a"))
    cb = clusters.select(F.col("rid").alias("id_b"), F.col("cluster_id").alias("cl_b"))
    decided = (
        scope.join(ca, "id_a").join(cb, "id_b")
        .withColumn("pred", F.col("cl_a") == F.col("cl_b"))
    )
    truth_in_scope = decided.join(truth, ["id_a", "id_b"], "left_semi")
    tp = truth_in_scope.where("pred").count()
    fn = truth_in_scope.where(~F.col("pred")).count()
    pred_pos = decided.where("pred")
    fp = pred_pos.join(truth, ["id_a", "id_b"], "left_anti").count()
    n_truth = truth.count()
    n_truth_in_scope = truth_in_scope.count()
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": precision, "recall": recall, "f1": f1,
        "blocking_recall": n_truth_in_scope / n_truth if n_truth else 1.0,
    }


def assert_sha256_invariant(run: PipelineRun, raw: DataFrame, id_col: str,
                            content_col: str = "content") -> int:
    """Per-row invariant: sha256(content) at ingest == sha256 carried to
    the cluster output, for every record. Returns rows checked."""
    src = raw.select(
        F.col(id_col).alias("rid"), F.sha2(F.col(content_col), 256).alias("sha_src")
    )
    out = run.normalized.select(
        F.col(id_col).alias("rid"), F.col("content_sha256").alias("sha_out")
    ).join(run.clusters, "rid")
    joined = src.join(out, "rid")
    bad = joined.where(F.col("sha_src") != F.col("sha_out")).count()
    assert bad == 0, f"{bad} rows violate the sha256(content) invariant"
    return joined.count()
