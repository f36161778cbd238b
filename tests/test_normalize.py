"""Normalization parity tests.

Ports the reference's own unit cases (normalize_test.go:20-44) plus
edge cases for every operator N1-N7.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark.functions import normalize as N


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(fn(F.col("x")).alias("y")).collect()]


# --- N1 NormalizeText (normalize_test.go:20-27) ---------------------------

def test_normalize_text_reference_case(spark):
    assert _run(spark, N.normalize_text, ["  The quick  brown fox  "]) == [
        "quick brown fox"
    ]


def test_normalize_text_stopwords_and_ws(spark):
    got = _run(
        spark,
        N.normalize_text,
        ["", "THE AND OF", "Hello   World", "a view FROM the bridge"],
    )
    assert got == ["", "", "hello world", "view bridge"]


# --- N2 NormalizeName (normalize_test.go:29-37) ----------------------------

def test_normalize_name_reference_cases(spark):
    got = _run(spark, N.normalize_name, ["ACME INC.", "J. D. Salinger"])
    assert got == ["acme", "j d salinger"]


@pytest.mark.parametrize(
    "raw,want",
    [
        ("Acme Corporation", "acme"),  # "corporation" is a legal suffix
        ("Acme Corp.", "acme"),
        ("Widget Factory LLC", "widget factory"),
        ("Smith & Sons, Ltd.", "smith & sons,"),  # suffix needs \s+ before it
        ("", ""),
    ],
)
def test_normalize_name_suffixes(spark, raw, want):
    assert _run(spark, N.normalize_name, [raw]) == [want]


# --- N3 NormalizeAddress ----------------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("123 Main Street", "123 main st"),
        ("123 Main St", "123 main st"),
        ("500 Oak Avenue Apt 4B", "500 oak ave"),
        ("500 Oak Ave. Suite 210", "500 oak ave."),  # map keys are full words only
        ("77 Sunset Boulevard", "77 sunset blvd"),
        ("9 Elm Road Unit 7", "9 elm rd"),
    ],
)
def test_normalize_address(spark, raw, want):
    assert _run(spark, N.normalize_address, [raw]) == [want]


# --- N4 NormalizePhone ------------------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("555-123-4567", "+15551234567"),
        ("(555) 123-4567", "+15551234567"),
        ("5551234567", "+15551234567"),
        ("+15551234567", "+15551234567"),  # already E.164 passthrough
        ("44 20 7946 0958", "44 20 7946 0958"),  # no match -> original
        ("not-a-phone", "not-a-phone"),
        ("", ""),
    ],
)
def test_normalize_phone(spark, raw, want):
    assert _run(spark, N.normalize_phone, [raw]) == [want]


# --- N5 NormalizeEmail ------------------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("John.Doe@EXAMPLE.COM", "John.Doe@example.com"),  # local case kept
        ("invalid-email", "invalid-email"),
        ("a@b", "a@b"),  # fails validity regex -> original
        ("user+tag@Mail.Example.ORG", "user+tag@mail.example.org"),
        ("", ""),
    ],
)
def test_normalize_email(spark, raw, want):
    assert _run(spark, N.normalize_email, [raw]) == [want]


# --- N6 NormalizeState ------------------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("California", "CA"),
        ("new york", "NY"),
        ("tx", "TX"),
        ("TX", "TX"),
        ("Ontario", "Ontario"),  # unknown -> original
        ("", ""),
    ],
)
def test_normalize_state(spark, raw, want):
    assert _run(spark, N.normalize_state, [raw]) == [want]


# --- N7 NormalizeZip (normalize_test.go:39-44) ------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("12345-6789", "12345"),
        ("12345", "12345"),
        ("1234", "1234"),
        ("SW1A 1AA", "SW1A1AA"),  # letter-led stays whole
        ("", ""),
    ],
)
def test_normalize_zip(spark, raw, want):
    assert _run(spark, N.normalize_zip, [raw]) == [want]


# --- N8 NormalizeEntity -----------------------------------------------------

def test_normalize_entity_adds_companions(spark):
    df = spark.createDataFrame(
        [("Acme Inc.", "123 Main Street", "555-123-4567", "A@B.COM", "Texas", "12345-6789", "New York")],
        ["name", "address", "phone", "email", "state", "zip", "city"],
    )
    out = N.normalize_entity(df).collect()[0]
    assert out["name_normalized"] == "acme"
    assert out["address_normalized"] == "123 main st"
    assert out["phone_normalized"] == "+15551234567"
    assert out["email_normalized"] == "A@b.com"
    assert out["state_normalized"] == "TX"
    assert out["zip_normalized"] == "12345"
    assert out["city_normalized"] == "new york"


# --- phonetic blocking key (engine extension) ------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("Robert", "R163"),
        ("Rupert", "R163"),          # classic Soundex collision pair
        ("Tymczak", "T522"),
        ("Jackson", "J250"),
        ("Smith", "S530"),
        ("SMYTHE", "S530"),          # case + misspelling share the key
        ("Pfister", "P236"),         # adjacent same-code first letters collapse
        ("Honeyman", "H555"),
        # simplified-variant divergence from American Soundex (A261):
        # H/W break runs like vowels do
        ("Ashcraft", "A226"),
        ("", ""),
        ("123-456", ""),             # letterless -> no key
        ("a" * 73 + "b", "A000"),    # 64-letter prefix: trailing b ignored
    ],
)
def test_phonetic_key(spark, raw, want):
    assert _run(spark, N.phonetic_key, [raw]) == [want]


def test_phonetic_key_null(spark):
    df = spark.createDataFrame([(None,)], "x string")
    assert df.select(N.phonetic_key(F.col("x")).alias("y")).collect()[0][0] == ""
