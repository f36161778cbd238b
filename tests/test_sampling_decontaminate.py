"""Sampling + decontamination operators (training-data curation).

- stratified_sample: deterministic, order/partitioning-independent,
  per-stratum fractions honored, strata absent from the dict dropped
- quota_sample: EXACTLY the n hash-smallest rows per stratum — verified
  against a brute-force full ranking, including with a sabotaged
  prefilter margin (the rescue path must keep the result identical)
- ngram_contamination / decontaminate: planted benchmark overlap is
  flagged, clean docs are not, empty docs report 0.0
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from resolve_spark.operators import decontaminate as DC
from resolve_spark.operators import sampling as SM


@pytest.fixture(scope="module")
def docs(spark):
    langs = ["en", "de", "fr", "zh", "es"]
    rows = [
        (i, f"word{i % 37} alpha beta gamma delta token{i % 11} epsilon zeta",
         langs[i % 5])
        for i in range(1000)
    ]
    return spark.createDataFrame(rows, "id bigint, text string, lang string").persist()


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_deterministic_and_order_independent(docs):
    a = SM.stratified_sample(docs, "id", 0.3, salt="t", hash_impl="portable")
    b = SM.stratified_sample(
        docs.orderBy(F.desc("id")).repartition(7), "id", 0.3, salt="t",
        hash_impl="portable",
    )
    assert sorted(r.id for r in a.collect()) == sorted(r.id for r in b.collect())
    # ~binomial(1000, .3): far from the mean is a hash-quality failure
    assert 230 <= a.count() <= 370


def test_stratified_per_stratum_fractions(docs):
    out = SM.stratified_sample(
        docs, "id", {"en": 1.0, "de": 0.5, "fr": 0.0}, strata_col="lang",
        hash_impl="fast",
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got["en"] == 200          # fraction 1.0 keeps every row
    assert "fr" not in got           # fraction 0.0
    assert "zh" not in got           # absent from the dict -> dropped
    assert 60 <= got.get("de", 0) <= 140

    with pytest.raises(ValueError):
        SM.stratified_sample(docs, "id", {"en": 0.5})  # dict needs strata_col
    with pytest.raises(ValueError):
        SM.stratified_sample(docs, "id", 1.5)


def test_stratified_salt_changes_sample(docs):
    a = {r.id for r in SM.stratified_sample(docs, "id", 0.3, salt="s1").collect()}
    b = {r.id for r in SM.stratified_sample(docs, "id", 0.3, salt="s2").collect()}
    assert a != b


# ---------------------------------------------------------------------------
# quota_sample
# ---------------------------------------------------------------------------

def _brute_quota(docs, n, salt, hash_impl):
    coin = SM._sample_hash(F.col("id"), salt, hash_impl)
    w = Window.partitionBy("lang").orderBy(coin, F.col("id"))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n).select("id")
    )


@pytest.mark.parametrize("hash_impl", ["fast", "portable"])
def test_quota_exactness(docs, hash_impl):
    out = SM.quota_sample(docs, "id", "lang", 30, hash_impl=hash_impl)
    assert all(r["count"] == 30 for r in out.groupBy("lang").count().collect())
    brute = _brute_quota(docs, 30, "qs", hash_impl)
    assert out.select("id").subtract(brute).count() == 0
    assert brute.subtract(out.select("id")).count() == 0
    assert out.columns == docs.columns  # helper columns dropped


def test_quota_rescue_path_is_still_exact(docs):
    """margin so small the prefilter undershoots every stratum — the
    full-rank rescue must reproduce the exact answer anyway."""
    out = SM.quota_sample(docs, "id", "lang", 50, margin=0.01)
    brute = _brute_quota(docs, 50, "qs", "fast")
    assert out.count() == 250
    assert out.select("id").subtract(brute).count() == 0
    assert brute.subtract(out.select("id")).count() == 0


def test_quota_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(40)] + [(100 + i, "tiny") for i in range(3)],
        "id bigint, lang string",
    )
    out = SM.quota_sample(df, "id", "lang", 10)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {"big": 10, "tiny": 3}
    with pytest.raises(ValueError):
        SM.quota_sample(df, "id", "lang", 0)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"


@pytest.mark.parametrize("hash_impl", ["fast", "portable"])
def test_contamination_planted(spark, hash_impl):
    bench = spark.createDataFrame([(0, BENCH_SENT)], "id bigint, text string")
    corpus = spark.createDataFrame(
        [
            (1, "intro words then " + BENCH_SENT + " and a tail"),  # planted
            (2, "completely unrelated set of distinct vocabulary items here"),
            (3, ""),                                                # empty
            (4, BENCH_SENT),                                        # verbatim copy
        ],
        "id bigint, text string",
    )
    out = {
        r["id"]: r
        for r in DC.ngram_contamination(
            corpus, bench, "id", "text", n=5, hash_impl=hash_impl
        ).collect()
    }
    assert out[1]["n_hit"] > 0 and out[1]["contamination"] > 0.3
    assert out[2]["n_hit"] == 0 and out[2]["contamination"] == 0.0
    assert out[3]["n_ngrams"] == 0 and out[3]["contamination"] == 0.0
    assert out[4]["contamination"] == 1.0

    clean = DC.decontaminate(corpus, bench, "id", "text", n=5,
                             max_contamination=0.0, hash_impl=hash_impl)
    assert sorted(r.id for r in clean.collect()) == [2, 3]


def test_contamination_short_doc_single_gram(spark):
    """docs shorter than n tokens fall back to one all-token gram."""
    bench = spark.createDataFrame([(0, "alpha beta")], "id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "id bigint, text string"
    )
    out = {r["id"]: r for r in
           DC.ngram_contamination(corpus, bench, "id", "text", n=8).collect()}
    assert out[1]["n_ngrams"] == 1 and out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 0.0


def test_contamination_plan_broadcasts_benchmark(spark):
    """the benchmark n-gram set must join as a broadcast (no full shuffle
    of the corpus n-grams against it)."""
    bench = spark.range(10).select(F.col("id"), F.lit(BENCH_SENT).alias("text"))
    corpus = spark.range(100).select(
        F.col("id"), F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("text")
    )
    plan = DC.ngram_contamination(corpus, bench, "id", "text", n=3)._jdf \
        .queryExecution().executedPlan().toString()
    # the benchmark n-gram set must actually broadcast (a SortMergeJoin
    # here means a full shuffle of the corpus n-grams at scale)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_quota_null_stratum_is_a_real_stratum(spark):
    """NULL strata must be sampled like any other (equi-joins would
    silently drop them; the operator joins null-safely)."""
    df = spark.createDataFrame(
        [(i, "en") for i in range(30)] + [(100 + i, None) for i in range(30)],
        "id bigint, lang string",
    )
    out = SM.quota_sample(df, "id", "lang", 10)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {"en": 10, None: 10}
    # and exactness holds for the NULL stratum too
    brute = _brute_quota(df, 10, "qs", "fast")
    assert out.select("id").subtract(brute).count() == 0
    assert brute.subtract(out.select("id")).count() == 0


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------

def _brute_mixture(docs, targets, salt):
    """Exact Python replica of mixture_sample's kept-id set."""
    import math
    from resolve_spark.functions.hashing import portable_hash60_py

    rows = docs.select("id", "lang").collect()
    counts = {}
    for r in rows:
        if r["lang"] in targets:
            counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    t_max = min(counts[s] / targets[s] for s in targets)
    cuts = {s: math.floor(1000000.0 * targets[s] * t_max / counts[s])
            for s in targets}
    return {
        r["id"] for r in rows
        if r["lang"] in targets
        and portable_hash60_py(f"{salt}:{r['id']}") % 1_000_000 < cuts[r["lang"]]
    }


def test_mixture_sample_waterfill_exact(docs):
    """kept set == the brute-force replica; the binding stratum (en at
    share 0.5 over a uniform 200/200/... distribution) is kept whole."""
    targets = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}
    out = SM.mixture_sample(docs, "id", "lang", targets,
                            salt="mt", hash_impl="portable")
    got = {r["id"] for r in out.select("id").collect()}
    assert got == _brute_mixture(docs, targets, "mt")
    kept = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert kept["en"] == 200          # binding stratum: rate 1.0, kept whole
    # T = 400; thinned strata land near share*T (hash coin is ~uniform)
    assert abs(kept["de"] - 80) <= 20 and abs(kept["zh"] - 20) <= 12


def test_mixture_sample_order_independent(docs):
    targets = {"en": 0.4, "de": 0.6}
    a = SM.mixture_sample(docs, "id", "lang", targets, hash_impl="portable")
    b = SM.mixture_sample(docs.orderBy(F.desc("id")).repartition(7),
                          "id", "lang", targets, hash_impl="portable")
    assert a.select("id").subtract(b.select("id")).count() == 0
    assert b.select("id").subtract(a.select("id")).count() == 0
    # strata outside the target mixture are dropped entirely
    assert a.where(F.col("lang").isin("fr", "es", "zh")).count() == 0


def test_mixture_sample_total_cap(docs):
    """cap 100 < waterfill T=400: every stratum is thinned to rate
    share*100/count (25%), exactly reproducing the brute replica."""
    import math
    from resolve_spark.functions.hashing import portable_hash60_py

    targets = {"en": 0.5, "de": 0.5}
    capped = SM.mixture_sample(docs, "id", "lang", targets,
                               total=100, hash_impl="portable")
    cut = math.floor(1000000.0 * 0.5 * 100.0 / 200)   # 250000 ppm
    expect = {
        r["id"] for r in docs.select("id", "lang").collect()
        if r["lang"] in targets
        and portable_hash60_py(f"mx:{r['id']}") % 1_000_000 < cut
    }
    assert {r["id"] for r in capped.select("id").collect()} == expect
    # strictly fewer rows than the uncapped waterfill keeps
    full = SM.mixture_sample(docs, "id", "lang", targets, hash_impl="portable")
    assert capped.count() < full.count()


def test_mixture_sample_errors(docs):
    with pytest.raises(ValueError, match="absent from data"):
        SM.mixture_sample(docs, "id", "lang", {"en": 0.5, "xx": 0.5})
    with pytest.raises(ValueError, match="positive"):
        SM.mixture_sample(docs, "id", "lang", {"en": 1.0, "de": 0.0})
    with pytest.raises(ValueError, match="non-empty"):
        SM.mixture_sample(docs, "id", "lang", {})


# ---------------------------------------------------------------------------
# source_overlap
# ---------------------------------------------------------------------------

def test_source_overlap_matrix(spark):
    # sA and sB share exactly the 5-token run "a b c d e" (two 4-grams);
    # sC is disjoint from both; sD repeats sA's text verbatim (full overlap)
    rows = [
        (1, "a b c d e p q r", "sA"),
        (2, "a b c d e x y z", "sB"),
        (3, "m n o aa bb cc dd", "sC"),
        (4, "a b c d e p q r", "sD"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string, src string")
    out = DC.source_overlap(df, "text", "src", n=4)
    got = {(r["source_a"], r["source_b"]): r for r in out.collect()}
    # each doc has 5 distinct 4-grams; "a b c d"/"b c d e" are shared
    assert set(got) == {("sA", "sB"), ("sA", "sD"), ("sB", "sD")}
    ab = got[("sA", "sB")]
    assert (ab["shared"], ab["ngrams_a"], ab["ngrams_b"]) == (2, 5, 5)
    assert ab["containment_a"] == 0.4 and ab["jaccard"] == 0.25
    ad = got[("sA", "sD")]
    assert ad["shared"] == 5 and ad["jaccard"] == 1.0
    # zero-overlap pairs are omitted, and sC appears nowhere
    assert all("sC" not in p for p in got)


def test_source_overlap_hash_impls_agree(spark):
    rows = [(i, f"tok{i % 7} alpha beta gamma delta tok{i % 3} end",
             f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, text string, src string")
    fast = DC.source_overlap(df, "text", "src", n=4, hash_impl="fast")
    port = DC.source_overlap(df, "text", "src", n=4, hash_impl="portable")
    assert fast.subtract(port).count() == 0 and port.subtract(fast).count() == 0


def test_source_overlap_fingerprint_cap(spark):
    # "x y z w" is in all 4 sources (boilerplate); each pair also shares
    # one pair-specific 4-gram through doc overlap
    rows = [
        ("1", "x y z w only1 a b c", "s1"),
        ("2", "x y z w only1 a b c", "s2"),
        ("3", "x y z w other2 d e f", "s3"),
        ("4", "x y z w other3 g h i", "s4"),
    ]
    df = spark.createDataFrame(rows, "id string, text string, src string")
    full = DC.source_overlap(df, "text", "src", n=4)
    capped = DC.source_overlap(
        df, "text", "src", n=4, max_groups_per_fingerprint=3
    )
    f = {(r["source_a"], r["source_b"]): r["shared"] for r in full.collect()}
    c = {(r["source_a"], r["source_b"]): r["shared"] for r in capped.collect()}
    # the one universal gram ("x y z w") no longer counted anywhere
    assert all(c[k] == f[k] - 1 for k in c)
    # pairs whose ONLY overlap was boilerplate drop out entirely
    assert ("s3", "s4") in f and ("s3", "s4") not in c
    # s1/s2 share doc-level content beyond the boilerplate -> survive
    assert c[("s1", "s2")] >= 1


def _sem_fixture(spark):
    # 4-dim toy embeddings: d1 == benchmark b1 (cos 1.0), d2 is a noisy
    # near-copy, d3 orthogonal to both benchmarks, d4 zero-norm
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 2.0, 0.0]),
            (2, [1.0, 0.1, 2.0, 0.0]),
            (3, [0.0, 3.0, 0.0, 1.0]),
            (4, [0.0, 0.0, 0.0, 0.0]),
        ],
        "id bigint, vec array<double>",
    )
    bench = spark.createDataFrame(
        [(101, [1.0, 0.0, 2.0, 0.0]), (102, [2.0, 0.0, 4.0, 0.1])],
        "id bigint, vec array<double>",
    )
    return corpus, bench


def test_semantic_contamination_exact(spark):
    import numpy as np

    corpus, bench = _sem_fixture(spark)
    out = {
        r["id"]: r
        for r in DC.semantic_contamination(
            corpus, bench, "id", "vec", threshold=0.99
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    cvecs = {r["id"]: np.array(r["vec"]) for r in corpus.collect()}
    bvecs = [np.array(r["vec"]) for r in bench.collect()]

    def mc(v):
        n = np.linalg.norm(v)
        if n == 0:
            return 0.0
        return max(float(v @ b / (n * np.linalg.norm(b))) for b in bvecs)

    for i in (1, 2, 3):
        assert out[i]["max_cos"] == pytest.approx(mc(cvecs[i]), abs=1e-12)
    assert out[1]["contaminated"] and out[1]["n_hits"] == 2  # b2 ~ 2*b1
    assert out[2]["contaminated"]  # noisy copy still > 0.99
    assert not out[3]["contaminated"] and out[3]["n_hits"] == 0
    # zero-norm doc: cosine convention scores 0 vs everything
    assert out[4]["max_cos"] == 0.0 and not out[4]["contaminated"]
    # eval-set path must broadcast, never shuffle the corpus side
    plan = DC.semantic_contamination(
        corpus, bench, "id", "vec"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_semantic_contamination_prefilter_and_decontaminate(spark):
    corpus, bench = _sem_fixture(spark)
    pre = {
        r["id"]: r
        for r in DC.semantic_contamination(
            corpus, bench, "id", "vec", threshold=0.99,
            prefilter_planes=6, prefilter_tables=4,
        ).collect()
    }
    # every corpus doc still reports a row; the exact-duplicate leak
    # shares every bucket with its benchmark twin, so it MUST be caught
    assert set(pre) == {1, 2, 3, 4}
    assert pre[1]["contaminated"] and pre[1]["max_cos"] == pytest.approx(1.0)
    # LSH mode is a lower bound: no score may EXCEED the exact one
    exact = {
        r["id"]: r["max_cos"]
        for r in DC.semantic_contamination(
            corpus, bench, "id", "vec", threshold=0.99
        ).collect()
    }
    for i, r in pre.items():
        assert r["max_cos"] <= exact[i] + 1e-12

    clean = DC.semantic_decontaminate(corpus, bench, "id", "vec", threshold=0.99)
    kept = {r["id"] for r in clean.collect()}
    assert kept == {3, 4}
    assert clean.columns == corpus.columns


def test_contamination_shuffle_mode_identical(spark):
    # cross-crawl decontamination: benchmark too big to broadcast ->
    # broadcast_benchmark=False must produce IDENTICAL stats via a
    # shuffle semi-join
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 9} x{i % 4} y z q") for i in range(300)],
        "id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 9} x0 y z q") for i in range(50)],
        "id bigint, text string",
    )
    a = DC.ngram_contamination(corpus, bench, "id", "text", n=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b = DC.ngram_contamination(
            corpus, bench, "id", "text", n=4, broadcast_benchmark=False
        )
        assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
        # materialize b itself so the AQE plan is final, then check the
        # semi-join really shuffled (keys sit between the node name and
        # the join type, e.g. "SortMergeJoin [g#22L], [g#12L], LeftSemi")
        b.count()
        plan = b._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin) \[[^\]]*\], \[[^\]]*\], LeftSemi", plan), plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mixture_cuts_binding_stratum_kept_whole():
    """Regression: share 0.65 / count 2 makes the float round-trip
    share * (cnt/share) / cnt land a hair below 1.0 — a bare floor()
    gives 999_999 ppm and shaves the stratum the docstring promises to
    keep whole. The binding stratum must get the full-scale cut."""
    from resolve_spark.operators.sampling import FRACTION_SCALE, _mixture_cuts

    counts, targets = {"a": 2, "b": 1000}, {"a": 0.65, "b": 0.35}
    t_max = min(counts[s] / targets[s] for s in targets)  # binding: a
    cuts = _mixture_cuts(counts, targets, t_max)
    assert cuts["a"] == FRACTION_SCALE
    assert 0 < cuts["b"] < FRACTION_SCALE
    # the shave this guards against is real: the naive floor is 1 low
    import math
    assert math.floor(1000000.0 * targets["a"] * t_max / counts["a"]) == 999_999


def test_mixture_cuts_track_fraction_scale(monkeypatch):
    """Non-binding cuts must scale by FRACTION_SCALE, not a hardcoded
    1e6 — a resolution bump would otherwise sample every non-binding
    stratum at a fraction of its intended rate."""
    from resolve_spark.operators import sampling

    counts, targets = {"a": 100, "b": 1000}, {"a": 0.5, "b": 0.5}
    t_max = min(counts[s] / targets[s] for s in targets)
    base = sampling._mixture_cuts(counts, targets, t_max)
    monkeypatch.setattr(sampling, "FRACTION_SCALE", 10_000_000)
    scaled = sampling._mixture_cuts(counts, targets, t_max)
    assert scaled["a"] == 10_000_000  # binding stratum: full new scale
    assert scaled["b"] == base["b"] * 10  # non-binding follows the scale


def test_prototype_prune_hard_and_easy(spark):
    """Two blobs, k=2. In blob A (ids 1/3/5) the post-update cosine
    order is id3 (0.925) < id1 (0.981) < id5 (0.996): hard keeps the
    farthest-from-centroid, easy the closest."""
    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
        (3, [0.6, 0.4, 0.0]), (4, [0.0, 0.9, 0.1]),
        (5, [0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["rid", "vec"])
    hard = SM.prototype_prune(df, "rid", "vec", k=2, iters=2,
                              keep_per_cluster=1, keep="hard")
    got = {r["rid"]: (r["cluster"], r["rank"], r["kept"]) for r in hard.collect()}
    assert got[3] == (0, 1, 1) and got[1][2] == 0 and got[5][2] == 0
    assert got[3][0] == got[1][0] == got[5][0] == 0
    easy = SM.prototype_prune(df, "rid", "vec", k=2, iters=2,
                              keep_per_cluster=1, keep="easy")
    egot = {r["rid"]: r["kept"] for r in easy.collect()}
    assert egot[5] == 1 and egot[3] == 0 and egot[1] == 0


def test_prototype_prune_tiebreak_on_id(spark):
    """Exact duplicate vectors share a cosine; the id breaks the tie."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]),
            (3, [1.0, 0.0]), (4, [1.0, 0.0])]
    df = spark.createDataFrame(rows, ["rid", "vec"])
    out = SM.prototype_prune(df, "rid", "vec", k=2, iters=2,
                             keep_per_cluster=2, keep="hard")
    got = {r["rid"]: (r["rank"], r["kept"]) for r in out.collect()}
    assert got[1] == (1, 1) and got[3] == (2, 1) and got[4] == (3, 0)
    with pytest.raises(ValueError):
        SM.prototype_prune(df, "rid", "vec", keep="random")


def test_hash_split_exhaustive_and_deterministic(docs):
    out = SM.hash_split(docs, "id",
                        {"train": 0.8, "val": 0.1, "test": 0.1}, salt="t")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # every row labeled once
    assert set(counts) == {"train", "val", "test"}
    # hash-uniform coin: 80/10/10 within a loose band
    total = sum(counts.values())
    assert 0.7 < counts["train"] / total < 0.9
    again = {r["id"]: r["split"] for r in
             SM.hash_split(docs, "id",
                           {"train": 0.8, "val": 0.1, "test": 0.1},
                           salt="t").collect()}
    first = {r["id"]: r["split"] for r in out.collect()}
    assert again == first


def test_hash_split_validation(docs):
    with pytest.raises(ValueError):
        SM.hash_split(docs, "id", {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        SM.hash_split(docs, "id", {"all": 1.0})
