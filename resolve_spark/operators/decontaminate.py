"""Benchmark decontamination: flag training documents that share long
token n-grams with an evaluation/benchmark set.

The standard pretraining-hygiene operator (cf. GPT-3 appx. C / Dolma /
RedPajama): a training doc is contaminated when a sufficient share of
its token n-grams also occur anywhere in the benchmark corpus.

Dataflow (Spark-first):

1. tokenize both sides once (native ``split``/``filter``),
2. per-doc DISTINCT n-gram hashes (native ``transform(sequence)`` over
   the token array — no Python, no explode yet),
3. the benchmark's global distinct n-gram set — SMALL (eval sets are
   thousands of docs), so it broadcasts,
4. explode corpus n-grams → broadcast-semi-join against the benchmark
   set → count hits per doc. The only shuffle is the per-doc hit count
   (map-side combinable longs); the corpus is never self-joined and
   nothing quadratic exists at any scale.

``hash_impl="portable"`` makes the n-gram hashing reproducible in
DuckDB for the correctness oracle (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resolve_spark.functions.embedding import cosine_similarity_native
from resolve_spark.functions.hashing import check_hash_impl, portable_hash60

#: decontamination tokenizer: lowercase alnum runs (ASCII class — eval
#: overlap checks run on normalized text; swap for \p{L}\p{N} corpora)
TOKEN_RE = r"[^a-z0-9]+"


def _ngram_hashes(text: Column, n: int, hash_impl: str) -> Column:
    """array<long>: distinct hashes of the ``n``-token shingles of ``text``.
    Docs with fewer than ``n`` tokens contribute a single all-token gram
    (same convention as blocking.py's minhash shingles)."""
    toks = F.filter(F.split(F.lower(text), TOKEN_RE), lambda t: t != "")
    k = F.size(toks)
    grams = (
        F.when(k == 0, F.array().cast("array<string>"))
        .when(k < n, F.array(F.array_join(toks, " ")))
        .otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            )
        )
    )
    if check_hash_impl(hash_impl) == "portable":
        return F.transform(grams, lambda g: portable_hash60(g))
    return F.transform(grams, lambda g: F.xxhash64(g))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hash_impl: str = "fast",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-doc contamination stats against ``benchmark``:
    (id, n_ngrams, n_hit, contamination = n_hit / n_ngrams).

    Docs with no n-grams (empty text) report contamination 0.0.
    Threshold downstream (e.g. ``.where("contamination > 0.2")``) or
    anti-join the flagged ids to produce the clean corpus.

    ``broadcast_benchmark=True`` (default) is the eval-set case: the
    distinct benchmark grams ship to every executor and the corpus
    never shuffles. Set it False when the "benchmark" is ANOTHER LARGE
    CORPUS (cross-crawl decontamination) — the hit count becomes a
    hash-partitioned semi-join on the gram hash, and AQE still demotes
    it to a broadcast at runtime if the side turns out small. Results
    are identical either way; only the shuffle strategy differs.
    """
    bench_set = (
        benchmark.select(F.explode(_ngram_hashes(F.col(text_col), n, hash_impl)).alias("g"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)
    doc_grams = corpus.select(
        F.col(id_col), _ngram_hashes(F.col(text_col), n, hash_impl).alias("grams")
    )
    hits = (
        doc_grams.select(id_col, F.explode("grams").alias("g"))
        .join(bench_set, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        doc_grams.select(id_col, F.size("grams").cast("bigint").alias("n_ngrams"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.when(F.col("n_ngrams") > 0,
                   F.round(F.coalesce("n_hit", F.lit(0)) / F.col("n_ngrams"), 6))
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str,
    group_col: str,
    n: int = 8,
    hash_impl: str = "fast",
    max_groups_per_fingerprint: int | None = None,
) -> DataFrame:
    """Pairwise content-overlap matrix between corpus partitions
    (sources / domains / crawl snapshots) — the provenance check run
    before mixing corpora into a training set: for each unordered pair
    of groups, how many distinct token n-gram fingerprints they share.

    Returns (source_a, source_b, shared, ngrams_a, ngrams_b,
    containment_a, containment_b, jaccard) with ``source_a < source_b``
    lexicographically; pairs with zero shared fingerprints are omitted
    (a full matrix over thousands of domains would be mostly-zero S²
    rows — absent pair means overlap 0).

    Scale plan: the exploded (group, fingerprint) stream is shuffled
    ONCE, by fingerprint, into `collect_set(group)` — the set dedups,
    so no separate distinct pass, and partial aggregation dedups
    map-side before the shuffle. The set per fingerprint is bounded by
    the number of groups (not documents), so a hot fingerprint never
    concentrates its documents on one task the way a self-join on the
    fingerprint would (S² pairs per fp vs D² rows). Per-group totals
    fall out of the same deduped sets (a second, already-small
    shuffle) and broadcast back as S rows. Nothing is quadratic in
    documents, and the raw explode crosses the network exactly once —
    the totals branch consumes the SAME exchange as the pair branch
    (verified: the executed plan shows ReusedExchange, not a recompute).

    The remaining quadratic-in-GROUPS hazard: a corpus-wide boilerplate
    fingerprint present in s groups emits s(s-1)/2 pair rows. With tens
    of groups that's nothing; at group_col=domain (thousands), set
    ``max_groups_per_fingerprint`` to drop fingerprints above the cap
    from PAIR COUNTING (same budget philosophy as pairs.py; an
    everywhere-fingerprint carries no provenance signal — cf. idf).
    ``shared`` becomes a lower bound; denominators still count every
    fingerprint, so containment/jaccard stay comparable across pairs.
    """
    grouped = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(_ngram_hashes(F.col(text_col), n, hash_impl)).alias("h"),
        )
        .groupBy("h")
        .agg(F.array_sort(F.collect_set("g")).alias("srcs"))
    )
    totals = (
        grouped.select(F.explode("srcs").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("ng"))
    )
    pairable = grouped.where(F.size("srcs") >= 2)
    if max_groups_per_fingerprint is not None:
        pairable = pairable.where(
            F.size("srcs") <= max_groups_per_fingerprint
        )
    pair = (
        pairable
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("srcs"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("srcs"), i + 2,
                                F.size(F.col("srcs")),
                            ),
                            lambda b: F.struct(
                                a.alias("source_a"), b.alias("source_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        pair.join(
            F.broadcast(totals.select(F.col("g").alias("source_a"),
                                      F.col("ng").alias("ngrams_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("g").alias("source_b"),
                                      F.col("ng").alias("ngrams_b"))),
            "source_b",
        )
        .select(
            "source_a", "source_b", "shared", "ngrams_a", "ngrams_b",
            F.round(F.col("shared") / F.col("ngrams_a"), 6).alias("containment_a"),
            F.round(F.col("shared") / F.col("ngrams_b"), 6).alias("containment_b"),
            F.round(
                F.col("shared")
                / (F.col("ngrams_a") + F.col("ngrams_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bench_vec_col: str | None = None,
    prefilter_planes: int | None = None,
    prefilter_tables: int = 4,
    seed: int = 42,
    hash_impl: str = "fast",
) -> DataFrame:
    """Embedding-space contamination: per corpus doc, the max cosine
    similarity to ANY benchmark embedding — the semantic complement of
    :func:`ngram_contamination` for paraphrased/translated benchmark
    leakage that shares no exact n-gram (cf. the embedding-dedup
    arm of SemDeDup-style pipelines, applied corpus-vs-benchmark).

    Returns (id, max_cos, n_hits, contaminated):
    ``n_hits`` = benchmark vectors at cosine >= ``threshold``,
    ``contaminated`` = n_hits > 0. Zero-norm vectors score 0 against
    everything (the cosine kernel's convention).

    Scale plan: the benchmark is an EVAL SET — thousands to ~1M small
    vectors — so its (dedup'd) vectors broadcast and the corpus streams
    past them map-side: one broadcast nested-loop join + one combinable
    per-doc agg, no corpus shuffle beyond the agg, nothing quadratic in
    the corpus. For benchmarks too large for |corpus| x |bench| exact
    cosines, set ``prefilter_planes``: both sides are SRP-bucketed
    (``prefilter_tables`` independent tables, OR'd) and exact cosine
    runs only inside shared buckets. That mode is a LOWER BOUND on
    max_cos (LSH recall < 1); near-identical leaks (cos -> 1) collide
    in every table and are still caught.
    """
    bvc = bench_vec_col or vec_col
    bench = benchmark.select(F.col(bvc).cast("array<double>").alias("_bv")).distinct()
    left = corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_cv"))
    if prefilter_planes is None:
        joined = left.join(F.broadcast(bench), F.lit(True))
    else:
        from resolve_spark.operators.ann import add_hyperplane_bucket

        # dedup across the OR'd tables on the (id, bench-vector) pair;
        # xxhash64 hashes the array directly, no stringification
        bench = bench.withColumn("_bid", F.xxhash64("_bv"))
        joined = None
        for t in range(prefilter_tables):
            s = seed + 101 * t
            cb = add_hyperplane_bucket(
                left.withColumnRenamed("_cv", "_v"), "_v", prefilter_planes,
                s, hash_impl=hash_impl,
            ).withColumnRenamed("_v", "_cv")
            bb = add_hyperplane_bucket(
                bench.withColumnRenamed("_bv", "_v"), "_v", prefilter_planes,
                s, hash_impl=hash_impl,
            ).withColumnRenamed("_v", "_bv")
            j = cb.join(bb, "bucket").drop("bucket")
            joined = j if joined is None else joined.unionByName(j)
        joined = joined.dropDuplicates([id_col, "_bid"]).drop("_bid")
    cos = cosine_similarity_native(F.col("_cv"), F.col("_bv"))
    stats = (
        joined.select(id_col, cos.alias("_cos"))
        .groupBy(id_col)
        .agg(
            F.max("_cos").alias("max_cos"),
            F.sum(F.when(F.col("_cos") >= threshold, 1).otherwise(0)).alias("n_hits"),
        )
    )
    return (
        corpus.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("max_cos", F.lit(0.0)).alias("max_cos"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    **kwargs,
) -> DataFrame:
    """The semantically clean corpus: drop docs with any benchmark
    embedding at cosine >= ``threshold``. Kwargs forward to
    :func:`semantic_contamination` (prefilter, bench_vec_col, ...)."""
    flagged = (
        semantic_contamination(corpus, benchmark, id_col, vec_col,
                               threshold=threshold, **kwargs)
        .where("contaminated")
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_contamination: float = 0.0,
    hash_impl: str = "fast",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The clean corpus: drop docs whose contamination exceeds
    ``max_contamination`` (default: any shared n-gram drops the doc)."""
    flagged = (
        ngram_contamination(corpus, benchmark, id_col, text_col, n, hash_impl,
                            broadcast_benchmark=broadcast_benchmark)
        .where(F.col("contamination") > max_contamination)
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")
