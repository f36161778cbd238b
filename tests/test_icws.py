"""ICWS weighted-MinHash (functions/icws.py): differential tests
against a pure-Python Ioffe-2010 model, a statistical collision-rate
check, and the planted high-wjaccard/low-raw-Jaccard pair that the
unweighted banding pass structurally misses."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from resolve_spark.functions.icws import (
    band_keys_from_samples,
    icws_samples_np,
    splitmix64_py,
    token_hash64,
    uniform_py,
    _splitmix64_np,
)


# ---------------------------------------------------------------- model
def icws_samples_model(tokens, weights, num_hashes, seed=42):
    """Straight-line pure-Python Ioffe 2010 Algorithm 1 — independent
    of the vectorized path (loops + scalar draws vs numpy matrices).
    np.log on scalars keeps libm rounding identical to the engine; the
    structure under test is the draw derivation, the formulas, and the
    argmin/banding, not libm."""
    ths = [token_hash64(t, seed) for t in tokens]
    ks, ts = [], []
    for i in range(num_hashes):
        best_k, best_lna, best_t = -1, math.inf, 0.0
        for k, (th, w) in enumerate(zip(ths, weights)):
            u = [uniform_py(th, i, j) for j in range(5)]
            r = -float(np.log(u[0] * u[1]))
            c = -float(np.log(u[2] * u[3]))
            b = u[4]
            t = float(np.floor(float(np.log(float(w))) / r + b))
            lny = r * (t - b)
            lna = float(np.log(c)) - lny - r
            if lna < best_lna:
                best_k, best_lna, best_t = k, lna, t
        ks.append(best_k)
        ts.append(best_t)
    return np.array(ks), np.array(ts)


def weighted_jaccard(wa: dict, wb: dict) -> float:
    keys = set(wa) | set(wb)
    num = sum(min(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    den = sum(max(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    return num / den


# ---------------------------------------------------------- unit twins
def test_splitmix64_twins_bit_identical():
    zs = [0, 1, 42, 2**31, 2**63 - 1, 2**64 - 1, 0x9E3779B97F4A7C15]
    got = _splitmix64_np(np.array(zs, dtype=np.uint64))
    want = [splitmix64_py(z) for z in zs]
    assert [int(v) for v in got] == want


tok_strategy = st.text(
    alphabet="abcdefghij0123456789", min_size=1, max_size=8
)


@given(
    toks=st.lists(tok_strategy, min_size=1, max_size=12, unique=True),
    ws=st.lists(st.integers(min_value=1, max_value=10**9), min_size=12, max_size=12),
)
@settings(max_examples=25, deadline=None)
def test_icws_samples_match_pure_python_model(toks, ws):
    ws = ws[: len(toks)]
    th = np.array([token_hash64(t, 42) for t in toks], dtype=np.uint64)
    k_np, t_np = icws_samples_np(th, np.array(ws, dtype=np.float64), 16)
    k_py, t_py = icws_samples_model(toks, ws, 16)
    assert list(k_np) == list(k_py)
    assert list(t_np) == list(t_py)


def test_band_keys_deterministic_and_distinct():
    toks = ["alpha", "beta", "gamma"]
    th = np.array([token_hash64(t, 42) for t in toks], dtype=np.uint64)
    k, t = icws_samples_np(th, np.array([5.0, 1.0, 2.0]), 16)
    keys1 = band_keys_from_samples(toks, k, t, 8)
    keys2 = band_keys_from_samples(toks, k, t, 8)
    assert keys1 == keys2
    assert len(keys1) == 8
    assert len(set(keys1)) == 8  # band index is folded into the digest


# ------------------------------------------------- collision statistics
def test_collision_rate_estimates_weighted_jaccard():
    """P[sample_A(i) == sample_B(i)] = J_w — estimate over 512 hashes
    on sets with J_w ~ 0.60 and ~0.11; binomial sd ~ 0.022, assert 4sd."""
    H = 512
    wa = {f"t{i}": float(1 + (i * 7) % 13) for i in range(30)}
    wb = dict(wa)
    for i in range(0, 30, 3):  # perturb a third of the mass
        wb[f"t{i}"] = wa[f"t{i}"] * 0.2
    for i in range(5):
        wb[f"x{i}"] = 9.0
    for name, other in (("near", wb), ("far", {f"y{i}": 7.0 for i in range(20)} | {f"t{i}": wa[f"t{i}"] for i in range(6)})):
        jw = weighted_jaccard(wa, other)
        ta, wsa = list(wa), np.array([wa[t] for t in wa])
        tb, wsb = list(other), np.array([other[t] for t in other])
        ka, taa = icws_samples_np(
            np.array([token_hash64(t, 42) for t in ta], dtype=np.uint64), wsa, H
        )
        kb, tbb = icws_samples_np(
            np.array([token_hash64(t, 42) for t in tb], dtype=np.uint64), wsb, H
        )
        hits = sum(
            1
            for i in range(H)
            if ta[int(ka[i])] == tb[int(kb[i])] and taa[i] == tbb[i]
        )
        est = hits / H
        sd = math.sqrt(jw * (1 - jw) / H)
        assert abs(est - jw) <= 4 * sd + 1e-9, (name, jw, est)


# ------------------------------------------------------- the Spark path
TEMPLATE_A = " ".join(f"boilera{i}" for i in range(40))
TEMPLATE_B = " ".join(f"boilerb{i}" for i in range(40))
RARE_CORE = " ".join(f"rarecore{i}" for i in range(20))


@pytest.fixture(scope="module")
def planted_corpus(spark):
    """200 docs. Docs 2..199 carry BOTH templates + 3 unique filler
    tokens, so template tokens have df=199-200 (idf ln(1+N/df) ~ 0.70)
    while the rare core has df=2 (idf ~ 4.62). Doc 0 = template A +
    rare core, doc 1 = template B + rare core: shared idf mass 92.3 vs
    per-doc total 120.3 -> wjaccard ~ 0.623 >= 0.6, but raw Jaccard is
    only 20/100 = 0.20, below the unweighted 64/16 banding knee
    (P[any band fires] ~ 2.5%) — the exact pair class the ICWS pass
    exists to recover."""
    rows = [(0, TEMPLATE_A + " " + RARE_CORE), (1, TEMPLATE_B + " " + RARE_CORE)]
    for i in range(2, 200):
        rows.append(
            (i, TEMPLATE_A + " " + TEMPLATE_B + f" filler{i}a filler{i}b filler{i}c")
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_pair_missed_without_icws_found_with(spark, planted_corpus):
    from resolve_spark.operators.dedup import tfidf_weighted_jaccard_pairs

    base = tfidf_weighted_jaccard_pairs(
        planted_corpus, "doc_id", "text", threshold=0.6
    )
    base_pairs = {(r["id_a"], r["id_b"]) for r in base.collect()}
    # non-vacuity: the pair really is out of reach of unweighted banding
    assert (0, 1) not in base_pairs

    icws = tfidf_weighted_jaccard_pairs(
        planted_corpus, "doc_id", "text", threshold=0.6, icws_hashes=64
    )
    rows = icws.collect()
    got = {(r["id_a"], r["id_b"]): r["wjaccard"] for r in rows}
    assert (0, 1) in got
    # one-sided guarantee intact: every emitted pair verified exactly
    assert all(v >= 0.6 for v in got.values())
    # and the ICWS pass only ADDS candidates — verify is unchanged
    assert base_pairs <= set(got)


def test_wjaccard_join_finds_planted_cross_corpus_pair(spark, planted_corpus):
    """Cross-corpus twin: doc 0 (template A + rare core) on the even
    side, doc 1 (template B + rare core) on the odd side — found by the
    ICWS-banded join, with every emitted pair exact-verified."""
    from pyspark.sql import functions as F

    from resolve_spark.operators.dedup import wjaccard_join

    out = wjaccard_join(
        planted_corpus.where(F.col("doc_id") % 2 == 0),
        planted_corpus.where(F.col("doc_id") % 2 == 1),
        "doc_id", "doc_id", threshold=0.6,
    )
    got = {(r["id_a"], r["id_b"]): r["wjaccard"] for r in out.collect()}
    assert (0, 1) in got
    assert all(v >= 0.6 for v in got.values())


words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
     "theta", "iota", "kappa", "lam", "mu"]
)
doc_strategy = st.lists(words, min_size=1, max_size=8).map(" ".join)


@pytest.mark.slow
@given(
    left=st.lists(doc_strategy, min_size=1, max_size=5),
    right=st.lists(doc_strategy, min_size=1, max_size=5),
)
@settings(max_examples=10, deadline=None)
def test_wjaccard_join_matches_pure_python_model(spark, left, right):
    """Differential: wjaccard_join vs a direct Python implementation of
    union-idf weighted Jaccard. Threshold 0.9 makes the ICWS banding
    miss probability ~(1 - 0.81)^32 ~ 1e-23, so the operator's result
    is exact in practice; pairs within 2e-6 of the cutoff are excluded
    from the strict set comparison (libm ln rounding can differ by an
    ulp between engines on the idf weights)."""
    import math

    from resolve_spark.operators.dedup import wjaccard_join

    def toks(s):
        out, seen = [], set()
        for t in s.lower().split():
            if t and t not in seen:
                seen.add(t)
                out.append(t)
        return out

    docs = [("L", i, t) for i, t in enumerate(left)] + [
        ("R", i, t) for i, t in enumerate(right)
    ]
    n = len(docs)
    df_count = {}
    for _, _, t in docs:
        for tok in toks(t):
            df_count[tok] = df_count.get(tok, 0) + 1
    w = {
        tok: round(1_000_000 * math.log(1 + n / d))
        for tok, d in df_count.items()
    }
    want, near = set(), set()
    for i, lt in enumerate(left):
        for j, rt in enumerate(right):
            a, b = set(toks(lt)), set(toks(rt))
            iw = sum(w[t] for t in a & b)
            if iw == 0:
                continue
            wa, wb = sum(w[t] for t in a), sum(w[t] for t in b)
            wj = round(iw / (wa + wb - iw), 6)
            if abs(wj - 0.9) <= 2e-6:
                near.add((i, j))
            elif wj >= 0.9:
                want.add((i, j))

    ldf = spark.createDataFrame(
        [(i, t) for _, i, t in docs if _ == "L"], "id long, text string"
    )
    rdf = spark.createDataFrame(
        [(i, t) for _, i, t in docs if _ == "R"], "id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in wjaccard_join(ldf, rdf, "id", "id", threshold=0.9).collect()
    }
    assert want <= got <= (want | near), (sorted(want), sorted(got))


def test_icws_pass_is_deterministic_across_runs(spark, planted_corpus):
    from resolve_spark.operators.dedup import tfidf_weighted_jaccard_pairs

    def run():
        df = tfidf_weighted_jaccard_pairs(
            planted_corpus.repartition(7), "doc_id", "text",
            threshold=0.6, icws_hashes=64,
        )
        return sorted((r["id_a"], r["id_b"], r["wjaccard"]) for r in df.collect())

    assert run() == run()
