"""Numpy-batched similarity kernels — the Arrow-batch fast path.

Exact-parity vectorizations of the pure-Python parity kernels in
resolve_spark.functions.kernels (which mirror the reference
internal/similarity/{similarity.go,fields.go}). The per-pair
Jaro-Winkler matching loop — the dominant per-pair cost of every
JW-bearing composite (F1 name, F2 address, F4 email, text default) —
runs here as numpy array ops across the whole Arrow batch:

- pairs are reduced to np.unique-distinct (a, b) tuples first, so a
  batch full of repeated values (common after blocking) is scored once
  per distinct pair;
- strings are bucketed by the longer side's length (so one long string
  doesn't pad the whole batch) and encoded as UCS4 code-point matrices;
- the greedy Jaro matching runs as a (position x window) loop of
  vectorized boolean ops over all rows in the bucket at once — the
  per-CHARACTER Python interpreter cost is gone; tiny buckets fall back
  to the scalar kernel where numpy overhead would dominate.

Parity is property-tested against the scalar kernels in
tests/test_vectorized.py (hypothesis) — semantics still trace to
similarity.go:48-157 / fields.go via kernels.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from resolve_spark.functions import kernels

# Buckets smaller than this run the scalar kernel: per-op numpy overhead
# (~1us) beats the interpreter only when amortized over enough rows.
_MIN_VECTOR_ROWS = 8
# Strings longer than this run scalar (window loop would be huge and
# such rows are rare in entity fields).
_MAX_VECTOR_LEN = 2048


def _lens(strs: list[str]) -> np.ndarray:
    return np.fromiter((len(s) for s in strs), np.int64, count=len(strs))


def _codes(strs: list[str], width: int) -> np.ndarray:
    """UCS4 code-point matrix (n, width); rows padded with 0.

    Masking is always positional (j < len), so embedded NULs are safe.
    """
    n = len(strs)
    if width == 0 or n == 0:
        return np.zeros((n, width), np.uint32)
    arr = np.array(strs, dtype=f"U{width}")
    return arr.view(np.uint32).reshape(n, width)


def _jaro_core(A: np.ndarray, La: np.ndarray, B: np.ndarray, Lb: np.ndarray) -> np.ndarray:
    """Batched Jaro over code matrices; A is the per-row SHORTER side
    (same deterministic swap rule as kernels.jaro). All rows nonempty
    and a != b.

    Layout: matrices are processed TRANSPOSED ((maxlen, n), C-order) so
    every per-character op touches one contiguous n-vector, and codes
    downcast to uint8 when the bucket is pure latin-1 — both are pure
    memory-traffic wins, no semantic effect.
    """
    n, maxa = A.shape
    maxb = B.shape[1]
    AT = np.ascontiguousarray(A.T)
    BT = np.ascontiguousarray(B.T)
    if AT.size and int(AT.max()) < 256 and int(BT.max()) < 256:
        AT = AT.astype(np.uint8)
        BT = BT.astype(np.uint8)
    md = np.maximum(Lb // 2 - 1, 0)
    md_max = int(md.max())
    md_min = int(md.min())
    matched_a = np.zeros((maxa, n), bool)
    # avail_b[j] = "position j of b exists and is not yet matched"
    avail_b = np.empty((maxb, n), bool)
    for j in range(maxb):
        np.greater(Lb, j, out=avail_b[j])
    for i in range(maxa):
        rem = La > i  # active and not yet found a match for a[i]
        if not rem.any():
            break
        ca = AT[i]
        j_lo = max(0, i - md_max)
        j_hi = min(maxb, i + md_max + 1)
        for j in range(j_lo, j_hi):
            cand = rem & avail_b[j] & (BT[j] == ca)
            # per-row window check only needed when md varies in-bucket
            # and (i, j) is outside the narrowest window
            if abs(i - j) > md_min:
                cand &= md >= abs(i - j)
            if cand.any():
                avail_b[j, cand] = False
                matched_a[i, cand] = True
                rem = rem & ~cand
                if not rem.any():
                    break
    m = matched_a.sum(axis=0)
    maxm = int(m.max()) if n else 0
    if maxm == 0:
        return np.zeros(n, np.float64)
    # compact matched chars preserving order (manual row loop: numpy's
    # axis-0 cumsum and 2-D nonzero are scalar-looped and dominate here)
    a_comp = np.zeros((maxm, n), AT.dtype)
    b_comp = np.zeros((maxm, n), BT.dtype)
    acc = np.zeros(n, np.int64)
    for i in range(maxa):
        cols = matched_a[i].nonzero()[0]
        if len(cols):
            a_comp[acc[cols], cols] = AT[i, cols]
            acc[cols] += 1
    acc.fill(0)
    for j in range(maxb):
        # matched_b[j] == position existed but is no longer available
        cols = ((Lb > j) & ~avail_b[j]).nonzero()[0]
        if len(cols):
            b_comp[acc[cols], cols] = BT[j, cols]
            acc[cols] += 1
    k = np.arange(maxm, dtype=np.int64)[:, None]
    trans = ((a_comp != b_comp) & (k < m[None, :])).sum(axis=0)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (mf / La + mf / Lb + (mf - trans / 2.0) / np.maximum(mf, 1)) / 3.0
    j[m == 0] = 0.0
    return j


def _common_prefix(a: list[str], b: list[str], la: np.ndarray, lb: np.ndarray,
                   prefix_length: int) -> np.ndarray:
    P = prefix_length
    A = _codes([s[:P] for s in a], P)
    B = _codes([s[:P] for s in b], P)
    pref = np.zeros(len(a), np.int64)
    live = np.ones(len(a), bool)
    for i in range(P):
        live = live & (i < la) & (i < lb) & (A[:, i] == B[:, i])
        pref += live
    return pref


def _jw_nontrivial(a: list[str], b: list[str], prefix_scale: float,
                   prefix_length: int) -> np.ndarray:
    """JW for pairs already known nonempty and a != b."""
    n = len(a)
    la, lb = _lens(a), _lens(b)
    # deterministic swap parity with kernels.jaro: shorter side outer,
    # original order kept on ties
    swap = la > lb
    S = [b[i] if swap[i] else a[i] for i in range(n)]
    L = [a[i] if swap[i] else b[i] for i in range(n)]
    Ls = np.where(swap, lb, la)
    Ll = np.where(swap, la, lb)
    jaro = np.empty(n, np.float64)
    order = np.argsort(Ll, kind="stable")
    sorted_ll = Ll[order]
    pos = 0
    while pos < n:
        cap = max(16, 1 << int(np.ceil(np.log2(max(int(sorted_ll[pos]), 1)))))
        end = int(np.searchsorted(sorted_ll, cap, side="right"))
        end = max(end, pos + 1)
        idx = order[pos:end]
        bs = [S[i] for i in idx]
        bl = [L[i] for i in idx]
        if len(idx) < _MIN_VECTOR_ROWS or sorted_ll[end - 1] > _MAX_VECTOR_LEN:
            jaro[idx] = [kernels.jaro(x, y) for x, y in zip(bs, bl)]
        else:
            jaro[idx] = _jaro_core(
                _codes(bs, int(Ls[idx].max())), Ls[idx],
                _codes(bl, int(Ll[idx].max())), Ll[idx],
            )
        pos = end
    pref = _common_prefix(a, b, la, lb, prefix_length)
    return jaro + pref * prefix_scale * (1.0 - jaro)


def jaro_winkler_batch(a: list[str], b: list[str], prefix_scale: float = 0.1,
                       prefix_length: int = 4) -> np.ndarray:
    """Batch kernels.jaro_winkler (similarity.go:48-157 parity)."""
    n = len(a)
    out = np.zeros(n, np.float64)
    todo: list[int] = []
    for i in range(n):
        x, y = a[i], b[i]
        if x == y:
            out[i] = 1.0
        elif x == "" or y == "":
            out[i] = 0.0
        else:
            todo.append(i)
    if todo:
        out[todo] = _jw_nontrivial([a[i] for i in todo], [b[i] for i in todo],
                                   prefix_scale, prefix_length)
    return out


def _jaccard_many(a: list[str], b: list[str]) -> np.ndarray:
    """kernels.jaccard over a batch with per-unique-string token caching."""
    cache: dict[str, frozenset] = {}

    def toks(s: str) -> frozenset:
        t = cache.get(s)
        if t is None:
            t = frozenset(kernels.tokenize(s))
            cache[s] = t
        return t

    out = np.empty(len(a), np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x == "" and y == "":
            out[i] = 1.0
        elif x == "" or y == "":
            out[i] = 0.0
        else:
            sa, sb = toks(x), toks(y)
            if len(sa) > len(sb):
                sa, sb = sb, sa
            inter = len(sa & sb)
            u = len(sa) + len(sb) - inter
            out[i] = (inter / u) if u else 0.0
    return out


def _contained_many(a: list[str], b: list[str]) -> np.ndarray:
    out = np.empty(len(a), np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        out[i] = kernels.contained_in(x, y)
    return out


def _preprocess_many(fn, strs: list[str]) -> list[str]:
    cache: dict[str, str] = {}
    out = []
    for s in strs:
        v = cache.get(s)
        if v is None:
            v = fn(s)
            cache[s] = v
        out.append(v)
    return out


def name_similarity_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batch F1 (fields.go:8-87): 0.6*JW + 0.3*Jaccard + 0.1*ContainedIn."""
    n = len(a)
    out = np.zeros(n, np.float64)
    rest: list[int] = []
    for i in range(n):
        if a[i] == b[i]:
            out[i] = 1.0
        elif a[i] == "" or b[i] == "":
            out[i] = 0.0
        else:
            rest.append(i)
    if not rest:
        return out
    pa = _preprocess_many(kernels._name_preprocess, [a[i] for i in rest])
    pb = _preprocess_many(kernels._name_preprocess, [b[i] for i in rest])
    eq2 = np.fromiter((x == y for x, y in zip(pa, pb)), bool, count=len(rest))
    comb = (0.6 * jaro_winkler_batch(pa, pb)
            + 0.3 * _jaccard_many(pa, pb)
            + 0.1 * _contained_many(pa, pb))
    out[rest] = np.where(eq2, 1.0, comb)
    return out


def address_similarity_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batch F2 (fields.go:89-256) incl. the x0.3 house-number penalty."""
    n = len(a)
    out = np.zeros(n, np.float64)
    rest: list[int] = []
    for i in range(n):
        if a[i] == b[i]:
            out[i] = 1.0
        elif a[i] == "" or b[i] == "":
            out[i] = 0.0
        else:
            rest.append(i)
    if not rest:
        return out
    pa = _preprocess_many(kernels._address_preprocess, [a[i] for i in rest])
    pb = _preprocess_many(kernels._address_preprocess, [b[i] for i in rest])
    eq2 = np.fromiter((x == y for x, y in zip(pa, pb)), bool, count=len(rest))
    num_cache: dict[str, str | None] = {}

    def first_num(s: str) -> str | None:
        if s not in num_cache:
            m = kernels._NUMERIC_RE.search(s)
            num_cache[s] = m.group(0) if m else None
        return num_cache[s]

    penalty = np.fromiter(
        (0.3 if (first_num(x) is not None and first_num(y) is not None
                 and first_num(x) != first_num(y)) else 1.0
         for x, y in zip(pa, pb)),
        np.float64, count=len(rest),
    )
    comb = (0.5 * _jaccard_many(pa, pb)
            + 0.2 * jaro_winkler_batch(pa, pb)
            + 0.3 * _contained_many(pa, pb))
    out[rest] = np.where(eq2, 1.0, comb * penalty)
    return out


def email_similarity_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batch F4 (fields.go:335-406)."""
    n = len(a)
    out = np.zeros(n, np.float64)
    jw_full: list[int] = []   # unparseable -> jw(a, b)
    jw_user: list[int] = []   # same domain -> 0.4*jw(users) + 0.6
    users: dict[int, tuple[str, str]] = {}
    for i in range(n):
        x, y = a[i], b[i]
        if x == y:
            out[i] = 1.0
        elif x == "" or y == "":
            out[i] = 0.0
        elif x.lower() == y.lower():
            out[i] = 0.99
        else:
            ma = kernels._EMAIL_PARTS_RE.match(x)
            mb = kernels._EMAIL_PARTS_RE.match(y)
            if ma is None or mb is None:
                jw_full.append(i)
            elif ma.group(2).lower() != mb.group(2).lower():
                out[i] = 0.0  # fields.go:394 domain mismatch -> 0 * 0.3
            else:
                jw_user.append(i)
                users[i] = (ma.group(1), mb.group(1))
    if jw_full:
        out[jw_full] = jaro_winkler_batch([a[i] for i in jw_full],
                                          [b[i] for i in jw_full])
    if jw_user:
        out[jw_user] = 0.4 * jaro_winkler_batch([users[i][0] for i in jw_user],
                                                [users[i][1] for i in jw_user]) + 0.6
    return out


def cosine_tf_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batch K6 (similarity.go:222-327) with per-unique-string TF caching."""
    from collections import Counter

    cache: dict[str, tuple[Counter, float]] = {}

    def tf(s: str) -> tuple[Counter, float]:
        v = cache.get(s)
        if v is None:
            c = Counter(kernels.tokenize(s))
            mag = sum(x * x for x in c.values()) ** 0.5
            v = (c, mag)
            cache[s] = v
        return v

    out = np.empty(len(a), np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x == "" and y == "":
            out[i] = 1.0
        elif x == "" or y == "":
            out[i] = 0.0
        else:
            ca, ma = tf(x)
            cb, mb = tf(y)
            if ma == 0 or mb == 0:
                out[i] = 0.0
            else:
                small, big = (ca, cb) if len(ca) <= len(cb) else (cb, ca)
                dot = sum(c * big[t] for t, c in small.items() if t in big)
                out[i] = dot / (ma * mb)
    return out


# scalar-kernel function -> batch implementation (fields._batch_apply
# dispatches through this; anything absent falls back to the memo loop)
BATCH_KERNELS = {
    kernels.jaro_winkler: jaro_winkler_batch,
    kernels.name_similarity: name_similarity_batch,
    kernels.address_similarity: address_similarity_batch,
    kernels.email_similarity: email_similarity_batch,
    kernels.cosine_tf: cosine_tf_batch,
}




def apply_distinct(batch_fn, a: list[str], b: list[str]) -> np.ndarray:
    """Score only the np.unique-distinct (a, b) pairs, then gather.

    Sides factorize separately (C string hashing), the pair becomes one
    int64 code — no per-row python tuples.

    NUL guard: pandas' string hash table is C-string based, so a NUL
    byte TRUNCATES the key ('\\x00' factorizes equal to '') and the
    gather would return the wrong pair's score. NUL-bearing batches
    (vanishingly rare in real text) skip the dedup and score directly.
    """
    if any("\x00" in s for s in a) or any("\x00" in s for s in b):
        return np.asarray(batch_fn(a, b), np.float64)
    ca, ua = pd.factorize(pd.Series(a, dtype=object))
    cb, ub = pd.factorize(pd.Series(b, dtype=object))
    combo = ca.astype(np.int64) * len(ub) + cb
    uniq, inv = np.unique(combo, return_inverse=True)
    ia = (uniq // len(ub)).astype(np.int64)
    ib = (uniq % len(ub)).astype(np.int64)
    ua_list = ua.tolist()
    ub_list = ub.tolist()
    vals = batch_fn([ua_list[i] for i in ia], [ub_list[i] for i in ib])
    return np.asarray(vals, np.float64)[inv]


def monge_elkan_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Symmetric Monge-Elkan over an Arrow batch: all token pairs of
    all rows flatten into ONE jaro_winkler_batch call (which itself
    dedups to distinct pairs and buckets by length), then per-row
    best-match maxima reduce vectorized; only the tiny per-row mean
    (<= tokens-per-field values) runs in the interpreter — summed
    sequentially to stay bit-identical to kernels.monge_elkan."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    ta = [kernels.tokenize(x or "") for x in a]
    tb = [kernels.tokenize(x or "") for x in b]
    flat_a: list[str] = []
    flat_b: list[str] = []
    rows: list[int] = []
    for r in range(n):
        if not ta[r] and not tb[r]:
            out[r] = 1.0
        elif ta[r] and tb[r]:
            rows.append(r)
            for t in ta[r]:
                for u in tb[r]:
                    flat_a.append(t)
                    flat_b.append(u)
    if not rows:
        return out
    jw = jaro_winkler_batch(flat_a, flat_b)
    pos = 0
    for r in rows:
        na, nb = len(ta[r]), len(tb[r])
        m = jw[pos: pos + na * nb].reshape(na, nb)
        pos += na * nb
        ab = sum(float(x) for x in m.max(axis=1)) / na
        ba = sum(float(x) for x in m.max(axis=0)) / nb
        out[r] = (ab + ba) / 2.0
    return out


# registered after definition so FieldSpec(kernel="mongeelkan") rides the
# one-Arrow-batch path through fields._batch_apply instead of the
# O(pairs x tokens^2) per-pair memo loop
BATCH_KERNELS[kernels.monge_elkan] = monge_elkan_batch
