"""Parity: numpy-batched kernels (functions.vectorized) vs the scalar
parity kernels (functions.kernels). The scalar kernels are the
semantics oracle (similarity.go/fields.go); the batch path must agree
to float precision on every input.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from resolve_spark.functions import kernels as K
from resolve_spark.functions import vectorized as V

short_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=24
)
namey = st.one_of(
    short_text,
    st.sampled_from([
        "", "Acme Corp", "acme corporation", "ACME, Inc.", "Vertex Analytics LLC",
        "Quantum Dynamics Ltd", "north main street", "123 N Main St Apt 4",
        "124 North Main Street", "a@b.com", "A@B.COM", "user.name@example.org",
        "user.nane@example.org", "user@other.org", "not-an-email", "@", "x@",
        "aaaa", "aaab", "\x00weird\x00", "ü è ñ 中文 text",
    ]),
)


def _assert_close(batch: np.ndarray, scalar: list[float]):
    for got, want in zip(batch, scalar):
        assert math.isclose(float(got), want, rel_tol=1e-12, abs_tol=1e-12), (
            float(got), want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(namey, namey), min_size=1, max_size=64))
def test_jaro_winkler_batch_parity(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    _assert_close(V.jaro_winkler_batch(a, b), [K.jaro_winkler(x, y) for x, y in pairs])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(namey, namey), min_size=1, max_size=48))
def test_composite_batch_parity(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    for batch_fn, scalar_fn in [
        (V.name_similarity_batch, K.name_similarity),
        (V.address_similarity_batch, K.address_similarity),
        (V.email_similarity_batch, K.email_similarity),
        (V.cosine_tf_batch, K.cosine_tf),
    ]:
        _assert_close(batch_fn(a, b), [scalar_fn(x, y) for x, y in pairs])


def test_batch_forces_vector_path():
    """A batch big enough to clear _MIN_VECTOR_ROWS in one length bucket
    must still agree exactly (guards the bucketing/encoding path, which
    tiny hypothesis batches can miss via the scalar fallback)."""
    rng = np.random.default_rng(7)
    alphabet = list("abcdefgh ")
    a = ["".join(rng.choice(alphabet, size=12)) for _ in range(500)]
    b = ["".join(rng.choice(alphabet, size=13)) for _ in range(500)]
    _assert_close(V.jaro_winkler_batch(a, b), [K.jaro_winkler(x, y) for x, y in zip(a, b)])


def test_mixed_length_buckets():
    a = ["ab" * k for k in range(1, 40)] + ["q" * 3000]  # forces scalar fallback row
    b = ["ba" * k for k in range(1, 40)] + ["q" * 2999 + "z"]
    _assert_close(V.jaro_winkler_batch(a, b), [K.jaro_winkler(x, y) for x, y in zip(a, b)])


def test_apply_distinct_gathers_correctly():
    a = ["acme corp", "acme corp", "beta llc", "acme corp"]
    b = ["acme corporation", "acme corporation", "beta l.l.c", "beta llc"]
    got = V.apply_distinct(V.name_similarity_batch, a, b)
    want = [K.name_similarity(x, y) for x, y in zip(a, b)]
    _assert_close(got, want)
    assert got[0] == got[1]


@pytest.mark.parametrize(
    "kernel_name", ["name", "address", "email", "text", "cosine", "mongeelkan"]
)
def test_batch_kernels_cover_all_fused_kernels(kernel_name):
    # mongeelkan included: a FieldSpec with that kernel must ride the
    # one-Arrow-batch path, not the O(pairs x tokens^2) memo loop
    fn = K.get_kernel_by_name(kernel_name)
    assert fn in V.BATCH_KERNELS


def test_throughput_sanity():
    """The vector path must beat the scalar loop on a realistic batch
    (regression guard for the 'vectorization silently disabled' case)."""
    import time

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "main", "north", "corp", "data"]
    a = [" ".join(rng.choice(words, size=3)) for _ in range(20_000)]
    b = [" ".join(rng.choice(words, size=3)) for _ in range(20_000)]
    t0 = time.time()
    V.apply_distinct(V.name_similarity_batch, a, b)
    fast = time.time() - t0
    t0 = time.time()
    for x, y in zip(a[:2000], b[:2000]):
        K.name_similarity(x, y)
    slow_per_pair = (time.time() - t0) / 2000
    assert fast / 20_000 < slow_per_pair, (fast / 20_000, slow_per_pair)


def test_monge_elkan_batch_matches_scalar():
    from resolve_spark.functions.kernels import monge_elkan
    from resolve_spark.functions.vectorized import monge_elkan_batch
    cases = [
        ("acme corp intl", "intl acme corporation"),
        ("goldenrod lavender spring", "lavender goldenrod spring"),
        ("one", "one"),
        ("", ""),
        ("left side", ""),
        ("", "right"),
        ("exact same words", "exact same words"),
        ("alpha beta", "gamma delta epsilon"),
    ]
    got = monge_elkan_batch([a for a, _ in cases], [b for _, b in cases])
    for (a, b), g in zip(cases, got):
        assert g == monge_elkan(a, b), (a, b)
    # word reorder keeps ME high where whole-string JW collapses
    from resolve_spark.functions.kernels import jaro_winkler
    assert got[1] > 0.95 > jaro_winkler(*cases[1])
    assert got[3] == 1.0 and got[4] == 0.0 and got[5] == 0.0
