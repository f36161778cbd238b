"""Blocking + candidate-pair tests: canopy parity vs a pure-Python
reimplementation of cluster.go, multi-pass key behavior, pair budget."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from resolve_spark.config import BlockingConfig
from resolve_spark.operators import blocking as B
from resolve_spark.operators.pairs import candidate_pairs


def py_canopy_key(fields: dict[str, str], configured: tuple[str, ...]) -> str:
    """Reference algorithm, cluster.go:57-156, reimplemented for tests."""
    present = sorted(f for f in configured if f in fields or f"{f}_normalized" in fields)
    if not present:
        return "default"
    key = ""
    for f in present:
        v = fields.get(f"{f}_normalized", "") or fields.get(f, "") or ""
        if f == "name":
            comp = v[:3]
        elif f == "zip":
            comp = v[:5]
        elif f == "phone":
            digits = "".join(ch for ch in v if ch.isdigit())
            comp = digits[-4:] if len(digits) >= 4 else digits
        elif f == "email":
            parts = v.split("@")
            comp = parts[1] if len(parts) == 2 else v
        else:
            comp = v[:3]
        if comp:
            key += comp + "|"
    if key in ("", "|"):
        return "default"
    return hashlib.md5(key.encode()).hexdigest()[:16]


def test_canopy_key_parity(spark):
    rows = [
        {"name": "Acme Corporation", "zip": "12345"},
        {"name": "acme corp", "zip": "12345-6789"},
        {"name": "", "zip": ""},
        {"name": "Al", "zip": "99"},
        {"name": "Beta LLC", "zip": None},
        {"name": None, "zip": None},
    ]
    df = spark.createDataFrame(
        [(r["name"], r["zip"]) for r in rows], ["name", "zip"]
    )
    got = [
        r[0]
        for r in df.select(B.canopy_key(df.columns, ("name", "zip")).alias("k")).collect()
    ]
    want = [
        py_canopy_key({k: v or "" for k, v in r.items()}, ("name", "zip"))
        for r in rows
    ]
    assert got == want


def test_canopy_key_prefers_normalized(spark):
    df = spark.createDataFrame(
        [("ACME INC.", "acme", "12345-6789", "12345")],
        ["name", "name_normalized", "zip", "zip_normalized"],
    )
    got = df.select(B.canopy_key(df.columns, ("name", "zip")).alias("k")).collect()[0][0]
    want = py_canopy_key(
        {"name": "ACME INC.", "name_normalized": "acme",
         "zip": "12345-6789", "zip_normalized": "12345"},
        ("name", "zip"),
    )
    assert got == want
    # and the key equals the one built from the normalized values directly
    assert got == py_canopy_key({"name": "acme", "zip": "12345"}, ("name", "zip"))


def test_canopy_key_phone_email_components(spark):
    df = spark.createDataFrame(
        [("555-123-4567", "John.Doe@Example.com")], ["phone", "email"]
    )
    got = df.select(
        B.canopy_key(df.columns, ("phone", "email")).alias("k")
    ).collect()[0][0]
    want = py_canopy_key(
        {"phone": "555-123-4567", "email": "John.Doe@Example.com"},
        ("phone", "email"),
    )
    assert got == want


def test_qgram_keys_share_blocks_on_typos(spark):
    df = spark.createDataFrame(
        [("widget-factory",), ("widget-factoryy",), ("zzzzzz",)], ["s"]
    )
    rows = df.select(B.qgram_keys(F.col("s"), 3, 4).alias("k")).collect()
    a, b, c = (set(r["k"]) for r in rows)
    assert a & b, "near-duplicate strings must share a q-gram key"
    assert not (a & c)
    assert all(len(k) <= 4 for k in (a, b, c))


def test_minhash_band_keys_similarity(spark):
    base = " ".join(f"token{i}" for i in range(60))
    t1 = base + " ending alpha"
    t2 = base + " ending beta"  # shingle-jaccard ~0.95 vs t1
    t3 = "completely different text about entity resolution in spark engines"
    df = spark.createDataFrame([(t1,), (t2,), (t3,), ("",)], ["text"])
    mh = B.minhash_band_keys_udf(num_hashes=64, bands=16)
    rows = df.select(mh(F.col("text")).alias("k")).collect()
    k1, k2, k3, kempty = (set(r["k"]) for r in rows)
    assert len(k1) == 16
    assert k1 & k2, "high-jaccard texts must collide in some band"
    assert not (k1 & k3)
    assert kempty == set()


def test_add_blocking_keys_multi_pass(spark):
    df = spark.createDataFrame(
        [("r1", "Acme Corp", "12345", "acme corp text body"),
         ("r2", "Acme Corporation", "12345", "acme corp text body")],
        ["rid", "name", "zip", "content"],
    )
    cfg = BlockingConfig(fields=("name", "zip"), qgram_column="name", minhash_column="content")
    out = B.add_blocking_keys(df, cfg)
    rows = out.collect()
    for r in rows:
        assert r["block_key"] != "default"
        kinds = {k.split(":")[0][0] for k in r["block_keys"]}
        assert kinds == {"c", "q", "m"}


def test_candidate_pairs_dedup_and_budget(spark):
    # 30 records share one hot key; 3 records share a small key
    hot = [(f"h{i:03d}", ["c:hot"]) for i in range(30)]
    small = [(f"s{i}", ["c:small", "q:x"]) for i in range(3)]
    df = spark.createDataFrame(hot + small, ["rid", "block_keys"])
    cfg = BlockingConfig(max_block_size=10, neighborhood_window=5)
    pairs, stats = candidate_pairs(df, "rid", cfg)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # small block: all 3 pairs, deduped across its two passes
    assert ("s0", "s1") in got and ("s0", "s2") in got and ("s1", "s2") in got
    # hot block: sorted-neighborhood — adjacent ids pair, far ids don't
    assert ("h000", "h001") in got
    assert ("h000", "h005") in got
    assert ("h000", "h029") not in got
    assert all(a < b for a, b in got)
    assert stats.n_oversized_keys == 1
    assert stats.pairs_dropped_estimate > 0
    assert stats.pairs_generated == len(got)


def test_candidate_pairs_full_small_blocks(spark):
    df = spark.createDataFrame(
        [(f"r{i}", ["c:k"]) for i in range(6)], ["rid", "block_keys"]
    )
    cfg = BlockingConfig(max_block_size=10)
    pairs, stats = candidate_pairs(df, "rid", cfg)
    assert pairs.count() == 15  # C(6,2)
    assert stats.n_oversized_keys == 0
    assert stats.pairs_dropped_estimate == 0


def test_phonetic_pass_blocks_misspellings(spark):
    """'Jon Smith' vs 'John Smyth': canopy prefix ('jon'/'joh') and token
    signature both break, but the p: phonetic pass keys both to J525."""
    from resolve_spark.config import BlockingConfig

    df = spark.createDataFrame(
        [("a", "Jon Smith"), ("b", "John Smyth"), ("c", "Garcia")],
        ["id", "name"],
    )
    cfg = BlockingConfig(
        enable_canopy=True, fields=("name",), token_columns=("name",),
        phonetic_columns=("name",),
    )
    out = {r["id"]: r["block_keys"] for r in B.add_blocking_keys(df, cfg).collect()}
    pa = {k for k in out["a"] if k.startswith("p:")}
    pb = {k for k in out["b"] if k.startswith("p:")}
    pc = {k for k in out["c"] if k.startswith("p:")}
    assert pa == pb == {"p:J525"}
    assert pc == {"p:G620"}
    # the other passes disagree on this pair (that is WHY the pass exists)
    assert not ({k for k in out["a"] if not k.startswith("p:")}
                & {k for k in out["b"] if not k.startswith("p:")})


def test_phonetic_pass_distinct_keys_per_record(spark):
    """Two phonetic columns coding to the SAME key ('Smith'/'Smyth' ->
    S530) must emit ONE p: key, not two: candidate_pairs skips the
    (rid, key) dedup because every pass is duplicate-free per record —
    a duplicate would inflate block counts and let the windowed path
    emit (x, x) self-pairs."""
    from resolve_spark.config import BlockingConfig

    df = spark.createDataFrame(
        [("a", "Smith", "Smyth"), ("b", "Smith", "Garcia")],
        ["id", "first_name", "last_name"],
    )
    cfg = BlockingConfig(
        enable_canopy=False, phonetic_columns=("first_name", "last_name"),
    )
    out = {r["id"]: r["block_keys"] for r in B.add_blocking_keys(df, cfg).collect()}
    assert out["a"] == ["p:S530"]
    assert sorted(out["b"]) == ["p:G620", "p:S530"]


def test_pair_budget_accounting_ledger(spark):
    from pyspark.sql import functions as F

    from resolve_spark.config import BlockingConfig
    from resolve_spark.operators.pairs import pair_budget_accounting

    # pass a: one block of 3 (full); pass q (purgeable): block of 3
    # (> redundant 2 -> purged); pass w: block of 5 (> max 4 -> windowed)
    df = spark.createDataFrame(
        [
            (1, ["a:k", "q:z", "w:v"]),
            (2, ["a:k", "q:z", "w:v"]),
            (3, ["a:k", "q:z", "w:v"]),
            (4, ["w:v"]),
            (5, ["w:v"]),
        ],
        "id int, block_keys array<string>",
    )
    cfg = BlockingConfig(
        max_block_size=4, prune_block_size=100, redundant_block_size=2,
        purge_passes=("q",), neighborhood_window=2,
    )
    got = {r["pass"]: r for r in pair_budget_accounting(df, "id", cfg).collect()}
    a = got["a"]
    assert (a.n_full, a.pairs_full, a.pairs_dropped_est) == (1, 3, 0)
    q = got["q"]
    assert (q.n_purged, q.pairs_dropped_est) == (1, 3)  # C(3,2) all dropped
    w = got["w"]
    # C(5,2)=10 possible, window cap min(10, 5*2)=10 -> nothing dropped
    assert (w.n_windowed, w.pairs_windowed_est, w.pairs_dropped_est) == (1, 10, 0)
