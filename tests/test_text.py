"""Text-analysis operator tests (lang-ID, quality, tokens, fingerprints,
SimHash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.functions import text as TX


def _one(spark, fn, value):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(fn(F.col("x")).alias("y")).collect()[0]["y"]


def test_lang_id(spark):
    cases = {
        "the cat sat on the mat and it was happy for the day": "en",
        "der hund ist nicht mit der katze und das ist gut": "de",
        "le chat est dans la maison et les oiseaux sont pas la": "fr",
        "el perro es una mascota que vive con la familia por la casa": "es",
        "这是一个中文文档的例子 包含很多汉字": "zh",
        "xyzzy plugh qwark blorp": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], ["x"])
    got = [r["y"] for r in df.select(TX.lang_id(F.col("x")).alias("y")).collect()]
    assert got == list(cases.values())


def test_quality_score_ordering(spark):
    good = ("This is a well formed document with reasonable sentences. "
            "It has the usual structure that a quality filter likes to see "
            "and it was written for the reader in plain language.")
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    short = "hi"
    df = spark.createDataFrame([(good,), (junk,), (short,)], ["x"])
    scores = [r["y"] for r in df.select(TX.quality_score(F.col("x")).alias("y")).collect()]
    assert scores[0] > scores[1]
    assert scores[0] > scores[2]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_token_counts(spark):
    assert _one(spark, TX.token_count, "one two  three\n four") == 4
    assert _one(spark, TX.token_count, "") == 0
    est = _one(spark, TX.subword_count_estimate, "internationalization rocks!")
    # 20-char word -> 5 pieces, 'rocks' -> 2, '!' -> 1
    assert est == 8


def test_content_fingerprint_whitespace_invariant(spark):
    a = _one(spark, TX.content_fingerprint, "Hello   World\n")
    b = _one(spark, TX.content_fingerprint, "hello world")
    c = _one(spark, TX.content_fingerprint, "hello worlds")
    assert a == b and a != c


def test_rolling_window_fingerprints(spark):
    text = "x" * 50 + "THE-MIDDLE-PART " * 20 + "y" * 50
    variant = "z" * 50 + "THE-MIDDLE-PART " * 20 + "w" * 50
    df = spark.createDataFrame([(text,), (variant,)], ["x"])
    rows = df.select(TX.rolling_window_fingerprints(F.col("x")).alias("f")).collect()
    shared = set(rows[0]["f"]) & set(rows[1]["f"])
    assert shared, "shared chunk must produce shared window fingerprints"


def test_simhash_near_duplicates(spark):
    base = " ".join(f"token{i}" for i in range(100))
    near = base.replace("token50", "changed50")
    far = " ".join(f"other{i}" for i in range(100))
    df = spark.createDataFrame([(base,), (near,), (far,), ("",)], ["x"])
    sims = [r["s"] for r in df.select(TX.simhash64(F.col("x")).alias("s")).collect()]
    d_near = bin(sims[0] ^ sims[1]).count("1")
    d_far = bin(sims[0] ^ sims[2]).count("1")
    assert d_near <= 6
    assert d_far > 15
    assert sims[3] == 0


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], ["a", "b"])
    got = df.select(TX.hamming64(F.col("a"), F.col("b")).alias("h")).collect()[0]["h"]
    assert got == 2


def test_gopher_quality_flags(spark):
    """Gopher rules (Rae et al. 2021 §A1.1): the repeated-line doc and
    the all-bullets doc fail, a normal multi-line doc passes, and each
    stat is hand-checkable."""
    good = "the quick brown fox jumps over the lazy dog tonight\nsecond line here\nthird line done"
    dup = "same line of words here\nsame line of words here\nunique tail line"
    bullets = "- point one here\n- point two here\n- point three here"
    symbols = "lots of hash### marks ### everywhere ### here\nand more..."
    df = spark.createDataFrame(
        [("good", good), ("dup", dup), ("bullets", bullets), ("sym", symbols)],
        ["k", "x"])
    rows = {r["k"]: r["g"].asDict() for r in df.select(
        "k", TX.gopher_quality_flags(F.col("x"), min_words=5).alias("g")
    ).collect()}
    assert rows["good"]["passes"] is True
    assert rows["dup"]["passes"] is False
    assert rows["dup"]["dup_line_frac"] == pytest.approx(1 / 3)
    assert rows["bullets"]["passes"] is False
    assert rows["bullets"]["bullet_frac"] == pytest.approx(1.0)
    assert rows["sym"]["passes"] is False
    assert rows["sym"]["symbol_ratio"] > 0.1
    # dup_word_frac: 'the' and 'line' each repeat once in 16 words
    assert rows["good"]["dup_word_frac"] == pytest.approx(2 / 16)


def test_pii_redaction_and_counts(spark):
    """Each category redacts to its typed token, most-specific first:
    the SSN and the IPv4 are never double-counted as phones."""
    text = ("reach me at jane.doe+spam@corp.example.org or on "
            "+1 (555) 010-4242, server 192.168.0.1, ssn 123-45-6789 done")
    df = spark.createDataFrame([(text,)], ["x"])
    row = df.select(
        TX.pii_counts(F.col("x")).alias("c"),
        TX.redact_pii(F.col("x")).alias("r"),
    ).collect()[0]
    c = row["c"].asDict()
    assert c == {"email": 1, "ipv4": 1, "ssn": 1, "phone": 1}
    r = row["r"]
    assert "[EMAIL]" in r and "[IP]" in r and "[SSN]" in r and "[PHONE]" in r
    assert "jane.doe" not in r and "192.168" not in r
    assert "123-45-6789" not in r and "555" not in r
    # clean text is untouched
    clean = "no personal data in this sentence at all"
    got = spark.createDataFrame([(clean,)], ["x"]).select(
        TX.redact_pii(F.col("x")).alias("r")).collect()[0]["r"]
    assert got == clean


# ---------------------------------------------------------------------------
# corpus_stats: unigram log-probability scoring
# ---------------------------------------------------------------------------

def test_unigram_logprob_exact(spark):
    import math
    from resolve_spark.operators.corpus_stats import token_frequencies, unigram_logprob

    df = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "a c"), ("d3", "")], ["rid", "text"]
    )
    freqs = {r["token"]: r["cnt"] for r in token_frequencies(df).collect()}
    assert freqs == {"a": 3, "b": 1, "c": 1}
    got = {r["rid"]: r for r in unigram_logprob(df, "rid").collect()}
    total = 5.0
    # d1: tokens a a b -> mean -ln(cnt/total) over (3,3,1)
    exp1 = math.log(total) - (2 * math.log(3) + math.log(1)) / 3
    exp2 = math.log(total) - (math.log(3) + math.log(1)) / 2
    assert got["d1"]["n_toks"] == 3 and abs(got["d1"]["avg_neg_logp"] - exp1) < 1e-6
    assert got["d2"]["n_toks"] == 2 and abs(got["d2"]["avg_neg_logp"] - exp2) < 1e-6
    # empty doc: no evidence, scores 0
    assert got["d3"]["n_toks"] == 0 and got["d3"]["avg_neg_logp"] == 0.0
    # the rare-token doc reads as more surprising than the common-token one
    assert got["d2"]["avg_neg_logp"] > got["d1"]["avg_neg_logp"]


def test_unigram_logprob_case_folded(spark):
    from resolve_spark.operators.corpus_stats import token_frequencies

    df = spark.createDataFrame([("d1", "The THE the")], ["rid", "text"])
    assert token_frequencies(df).collect()[0]["cnt"] == 3


def test_bm25_scores_exact(spark):
    import math

    from resolve_spark.operators.corpus_stats import bm25_scores, bm25_topk

    docs = [
        (1, "spark hash spark window join"),
        (2, "hash table scan scan scan filter sort group"),
        (3, "window window window spark"),
        (4, "the quick brown fox"),  # matches nothing
    ]
    df = spark.createDataFrame(docs, "rid bigint, text string")
    terms = ["spark", "window", "hash"]

    # pure-python Okapi BM25 reference
    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / N
    k1, b, scale = 1.2, 0.75, 1_000_000

    def ref(i):
        dl = len(toks[i])
        s, m = 0, 0
        for t in terms:
            tf = toks[i].count(t)
            if tf == 0:
                continue
            dft = sum(1 for v in toks.values() if t in v)
            idf6 = math.floor(0.5 + scale * math.log(1 + (N - dft + 0.5) / (dft + 0.5)))
            m += 1
            s += math.floor(0.5 + idf6 * ((tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))))
        return m, s

    got = {r["rid"]: r for r in bm25_scores(df, "rid", terms).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 matches no term -> no row
    for i in (1, 2, 3):
        m, s = ref(i)
        assert got[i]["n_matched"] == m
        assert got[i]["score_scaled"] == s  # exact long equality
        assert got[i]["score"] == s / scale
    # rarer terms outscore common ones: doc 1 (2x spark + window + hash,
    # short) must beat doc 2 (hash only, long)
    assert got[1]["score_scaled"] > got[2]["score_scaled"]

    top = bm25_topk(df, "rid", terms, k=2).collect()
    assert [r["rank"] for r in top] == [1, 2]
    ordered = sorted(got, key=lambda i: (-got[i]["score_scaled"], i))
    assert [r["rid"] for r in top] == ordered[:2]
    # global top-k must be TakeOrdered, not a full sort shuffle
    plan = bm25_topk(df, "rid", terms, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_case_fold_and_errors(spark):
    import pytest as _pytest

    from resolve_spark.operators.corpus_stats import bm25_scores

    df = spark.createDataFrame([(1, "Spark SPARK spark")], "rid bigint, text string")
    got = bm25_scores(df, "rid", ["SPARK"]).collect()
    assert len(got) == 1 and got[0]["n_matched"] == 1
    with _pytest.raises(ValueError):
        bm25_scores(df, "rid", [])


# corpus_stats: BPE merge-candidate table


def test_bpe_merge_candidates_exact(spark):
    from resolve_spark.operators.corpus_stats import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c B C"), (3, "x")], ["rid", "text"]
    )
    # adjacent pairs (case-folded): doc1 {a b, b a, a b, b c};
    # doc2 {b c, c b, b c}; doc3 none
    got = [tuple(r) for r in bpe_merge_candidates(df, top_k=10).collect()]
    assert got == [("b c", 3), ("a b", 2)]  # min_count=2 drops the singletons


def test_bpe_merge_candidates_topk_tiebreak(spark):
    from resolve_spark.operators.corpus_stats import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "z y z y"), (2, "a b a b")], ["rid", "text"]
    )
    # 'a b' and 'z y' both count 2; the pair-ASC tiebreak makes the
    # k=1 cut deterministic
    got = [tuple(r) for r in bpe_merge_candidates(df, top_k=1).collect()]
    assert got == [("a b", 2)]


def test_dedup_lines_keep_first(spark):
    from resolve_spark.functions.text import dedup_lines
    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\n\n\nx\ny"), (3, "solo")],
        ["rid", "t"],
    )
    got = {r["rid"]: r["d"] for r in
           df.select("rid", dedup_lines(F.col("t")).alias("d")).collect()}
    assert got[1] == "a\nb\nc"
    assert got[2] == "x\n\ny"   # second blank and repeated x removed
    assert got[3] == "solo"
