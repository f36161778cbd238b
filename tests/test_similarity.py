"""Similarity kernel tests.

Two layers:
1. Pure-Python kernels (resolve_spark.functions.kernels) against
   hand-computed values + the reference's own unit cases
   (fields_test.go, match_test.go).
2. Native Column implementations against the Python kernels over a
   string grid (cross-implementation parity).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from resolve_spark.functions import fields, kernels
from resolve_spark.functions import similarity as S

# ---------------------------------------------------------------------------
# Layer 1: python kernels
# ---------------------------------------------------------------------------


def test_jaro_winkler_known_values():
    # classic published values for the reference algorithm family
    assert kernels.jaro_winkler("", "") == 1.0
    assert kernels.jaro_winkler("abc", "") == 0.0
    assert kernels.jaro_winkler("abc", "abc") == 1.0
    # MARTHA/MARHTA: jaro=0.944..., prefix=3 -> 0.9611...
    assert kernels.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111, abs=1e-6)
    # DIXON/DICKSONX: jaro=0.76666, prefix=2 -> 0.81333
    assert kernels.jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333, abs=1e-6)
    # boost applies unconditionally (no 0.7 gate) — similarity.go:86
    lo = kernels.jaro("abcdefgh", "abmnopqr")
    assert kernels.jaro_winkler("abcdefgh", "abmnopqr") == pytest.approx(
        lo + 2 * 0.1 * (1 - lo)
    )


def test_levenshtein_similarity_known_values():
    assert kernels.levenshtein_similarity("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert kernels.levenshtein_similarity("", "") == 1.0
    assert kernels.levenshtein_similarity("a", "") == 0.0


def test_jaccard_and_cosine():
    assert kernels.jaccard("the quick fox", "the quick dog") == pytest.approx(2 / 4)
    assert kernels.jaccard("Hello, World!", "hello world") == 1.0
    assert kernels.cosine_tf("a a b", "a b b") == pytest.approx(4 / 5)
    assert kernels.cosine_tf("xyz", "abc") == 0.0


def test_contained_in():
    assert kernels.contained_in("main st", "123 main st") == pytest.approx(7 / 11)
    assert kernels.contained_in("abc", "xyz") == 0.0
    assert kernels.contained_in("ABC", "abcdef") == pytest.approx(0.5)


def test_phone_similarity_reference_cases():
    # fields_test.go:5-20
    assert kernels.phone_similarity("123-456-7890", "(123)456-7890") >= 1.0
    assert kernels.phone_similarity("1234567", "123-4567") >= 0.9
    assert kernels.phone_similarity("555-1234", "999-8888") == 0.0


def test_zip_similarity_ladder():
    assert kernels.zip_similarity("12345", "12345-6789") == 0.95  # digits differ, prefix 5
    assert kernels.zip_similarity("12345", "12345") == 1.0
    assert kernels.zip_similarity("12345", "12399") == 0.8
    assert kernels.zip_similarity("12345", "19999") == 0.5
    assert kernels.zip_similarity("12345", "99999") == 0.0


def test_name_similarity_semantics():
    assert kernels.name_similarity("Acme Inc.", "ACME INC.") == 1.0  # ci after preprocess
    assert kernels.name_similarity("Acme Corporation", "Acme Corp.") == 1.0  # both strip to "acme"
    s = kernels.name_similarity("Acme Widgets", "Acme Widget Co")
    jw = kernels.jaro_winkler("acme widgets", "acme widget co")
    jac = kernels.jaccard("acme widgets", "acme widget co")
    con = kernels.contained_in("acme widgets", "acme widget co")
    assert s == pytest.approx(0.6 * jw + 0.3 * jac + 0.1 * con)


def test_address_similarity_house_number_penalty():
    a, b = "123 Main Street", "456 Main Street"
    s = kernels.address_similarity(a, b)
    pa, pb = kernels._address_preprocess(a), kernels._address_preprocess(b)
    expected = (
        0.5 * kernels.jaccard(pa, pb)
        + 0.2 * kernels.jaro_winkler(pa, pb)
        + 0.3 * kernels.contained_in(pa, pb)
    ) * 0.3
    assert s == pytest.approx(expected)
    assert kernels.address_similarity("123 Main Street", "123 Main St") == 1.0


def test_email_similarity_semantics():
    assert kernels.email_similarity("a@b.com", "a@b.com") == 1.0
    assert kernels.email_similarity("A@b.com", "a@B.COM") == 0.99
    assert kernels.email_similarity("john@x.com", "john@y.com") == 0.0  # domain mismatch * 0.3
    s = kernels.email_similarity("john.doe@x.com", "jon.doe@x.com")
    assert s == pytest.approx(0.4 * kernels.jaro_winkler("john.doe", "jon.doe") + 0.6)


def test_weighted_score_reference_case():
    # match_test.go:30-44
    got = kernels.weighted_score({"name": 0.8, "phone": 0.5}, {"name": 0.6, "phone": 0.4})
    assert got == pytest.approx(0.8 * 0.6 + 0.5 * 0.4)


def test_parse_query_fields_reference_cases():
    # match_test.go:5-28
    assert kernels.parse_query_fields("name=Acme") == {"name": "Acme"}
    assert kernels.parse_query_fields("name=Acme;city=NY") == {"name": "Acme", "city": "NY"}
    assert kernels.parse_query_fields("name=Acme,address=123 St") == {
        "name": "Acme", "address": "123 St",
    }
    assert kernels.parse_query_fields("noequals") == {}
    assert kernels.parse_query_fields("a=1;b=2;c=3") == {"a": "1", "b": "2", "c": "3"}


def test_explanation_bands():
    assert "high" in kernels.explanation(0.95, ["name"])
    assert "medium" in kernels.explanation(0.8, ["name"])
    assert "low" in kernels.explanation(0.5, ["name"])


def test_registry_dispatch():
    assert kernels.get_kernel_by_name("editdistance") is kernels.levenshtein_similarity
    assert kernels.get_kernel_by_name("unknown-xyz") is kernels.jaro_winkler
    assert kernels.get_kernel_by_field_type("business_name") is kernels.name_similarity
    assert kernels.infer_kernel_name("customer_name") == "name"
    assert kernels.infer_kernel_name("mobile_no") == "phone"
    assert kernels.infer_kernel_name("notes") == "text"


# ---------------------------------------------------------------------------
# Layer 2: native Column kernels == python kernels on a string grid
# ---------------------------------------------------------------------------

GRID = [
    "", "a", "abc", "abcd", "acme", "acme inc", "Acme Inc.", "ACME",
    "123 main st", "123 Main Street", "456 main st", "main", "12345",
    "12345-6789", "555-123-4567", "(555) 123-4567", "999 888 7777",
    "john@example.com", "JOHN@EXAMPLE.COM", "jon@example.org",
    "the quick brown fox", "quick fox", "hello world", "Hello, World!",
]

NATIVE_VS_PY = [
    (S.exact_match, kernels.exact_match),
    (S.case_insensitive_match, kernels.case_insensitive_match),
    (S.levenshtein_similarity, kernels.levenshtein_similarity),
    (S.jaccard, kernels.jaccard),
    (S.contained_in, kernels.contained_in),
    (S.phone_similarity, kernels.phone_similarity),
    (S.zip_similarity, kernels.zip_similarity),
]


def test_native_kernels_match_python_kernels(spark):
    pairs = list(itertools.product(GRID, GRID))
    df = spark.createDataFrame(pairs, ["a", "b"])
    cols = [
        native(F.col("a"), F.col("b")).alias(f"k{i}")
        for i, (native, _) in enumerate(NATIVE_VS_PY)
    ]
    rows = df.select("a", "b", *cols).collect()
    for row in rows:
        for i, (_, py) in enumerate(NATIVE_VS_PY):
            expected = py(row["a"], row["b"])
            got = row[f"k{i}"]
            assert got == pytest.approx(expected, abs=1e-9), (
                f"kernel {i} mismatch on ({row['a']!r}, {row['b']!r}): "
                f"native={got} python={expected}"
            )


def test_pandas_udf_scorers_match_python(spark):
    pairs = [(a, b) for a, b in itertools.product(GRID[:14], GRID[:14])]
    df = spark.createDataFrame(pairs, ["a", "b"])
    for name in ["jarowinkler", "name", "address", "email", "cosine"]:
        udf_col = fields.pair_scorer_udf(name)(F.col("a"), F.col("b"))
        rows = df.select("a", "b", udf_col.alias("s")).collect()
        py = kernels.get_kernel_by_name(name)
        for row in rows:
            assert row["s"] == pytest.approx(py(row["a"], row["b"]), abs=1e-12)


def test_fused_scores_udf(spark):
    df = spark.createDataFrame(
        [("Acme Inc.", "Acme Corp", "12345", "12399")], ["na", "nb", "za", "zb"]
    )
    fused = fields.fused_scores_udf(["name", "zipcode"])
    row = df.select(
        fused(F.col("na"), F.col("nb"), F.col("za"), F.col("zb")).alias("s")
    ).collect()[0]
    assert row["s"][0] == pytest.approx(kernels.name_similarity("Acme Inc.", "Acme Corp"))
    assert row["s"][1] == pytest.approx(kernels.zip_similarity("12345", "12399"))


def test_similarity_column_dispatch(spark):
    df = spark.createDataFrame([("abc", "abd")], ["a", "b"])
    got = df.select(
        fields.similarity_column("levenshtein", F.col("a"), F.col("b")).alias("lev"),
        fields.similarity_column("jaro", F.col("a"), F.col("b")).alias("jw"),
    ).collect()[0]
    assert got["lev"] == pytest.approx(kernels.levenshtein_similarity("abc", "abd"))
    assert got["jw"] == pytest.approx(kernels.jaro_winkler("abc", "abd"))


def test_numeric_similarity_ladder(spark):
    from resolve_spark.functions.similarity import numeric_similarity

    df = spark.createDataFrame(
        [
            (100.0, 100.0),  # exact -> 1.0
            (100.0, 100.5),  # 0.5% -> 0.9
            (100.0, 108.0),  # 8% (of 108) -> 0.7
            (100.0, 150.0),  # far -> 0.0
            (0.0, 0.0),      # both zero -> 1.0
            (None, 100.0),   # null -> 0.0
        ],
        "a double, b double",
    )
    got = [
        r.s for r in df.select(
            numeric_similarity(df.a, df.b).alias("s")
        ).collect()
    ]
    assert got == [1.0, 0.9, 0.7, 0.0, 1.0, 0.0]


def test_temporal_similarity_ladder(spark):
    import datetime as dt

    from resolve_spark.functions.similarity import temporal_similarity

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (t0, t0),                                  # same -> 1.0
            (t0, t0 + dt.timedelta(minutes=30)),       # <=1h -> 0.9
            (t0, t0 + dt.timedelta(hours=5)),          # <=1d -> 0.7
            (t0, t0 + dt.timedelta(days=3)),           # <=1w -> 0.4
            (t0, t0 + dt.timedelta(days=30)),          # far -> 0.0
            # sub-second resolution: 900ms apart is NOT "same instant"
            # (whole-second truncation would score these 1.0) ...
            (t0, t0 + dt.timedelta(milliseconds=900)), # <=1h -> 0.9
            # ... and exactly-equal sub-second instants still hit level 0
            (t0 + dt.timedelta(milliseconds=250),
             t0 + dt.timedelta(milliseconds=250)),     # same -> 1.0
            # boundary stays exact in microseconds: 1h on the nose
            (t0, t0 + dt.timedelta(hours=1)),          # <=1h -> 0.9
            (t0, t0 + dt.timedelta(hours=1, microseconds=1)),  # -> 0.7
        ],
        "a timestamp, b timestamp",
    )
    got = [
        r.s for r in df.select(
            temporal_similarity(df.a, df.b).alias("s")
        ).collect()
    ]
    assert got == [1.0, 0.9, 0.7, 0.4, 0.0, 0.9, 1.0, 0.9, 0.7]


def test_ladder_kernels_properties_batch(spark):
    """Ladders emit only their configured literals, are symmetric, and
    are monotone in closeness — one randomized batch, one Spark job."""
    import random

    from pyspark.sql import functions as F

    from resolve_spark.functions.similarity import numeric_similarity

    rng = random.Random(7)
    pairs = [
        (rng.uniform(-1000, 1000), rng.uniform(-1000, 1000))
        for _ in range(200)
    ] + [(0.0, 0.0), (5.0, 5.0), (-3.0, 3.0)]
    df = spark.createDataFrame(pairs, "a double, b double")
    got = df.select(
        "a", "b",
        numeric_similarity(F.col("a"), F.col("b")).alias("s"),
        numeric_similarity(F.col("b"), F.col("a")).alias("s2"),
    ).collect()
    for r in got:
        assert r.s in (0.0, 0.7, 0.9, 1.0)
        assert r.s == r.s2
        if r.a == r.b:
            assert r.s == 1.0
