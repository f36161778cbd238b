"""Improved Consistent Weighted Sampling (ICWS) — weighted-MinHash
sketches whose band-key collision probability equals the *weighted*
Jaccard  J_w(A, B) = sum_t min(w_A(t), w_B(t)) / sum_t max(w_A(t), w_B(t))
(Ioffe, "Improved Consistent Weighted Sampling, Weighted Minwise Hashing
and L1 Sketching", ICDM 2010).

Why this exists: `tfidf_weighted_jaccard_pairs` (operators/dedup.py)
verifies an IDF-weighted Jaccard, but its default candidates come from
UNWEIGHTED MinHash banding — a pair whose similarity is carried almost
entirely by rare tokens (identical rare content buried under two
DIFFERENT large boilerplate templates: high wjaccard, low raw Jaccard)
never reaches the verify step. ICWS banding keys on the same weighted
measure the verify scores, closing that recall gap. Because our weights
are global IDF values, a token present in both docs carries the SAME
weight on both sides, so min/max weighted Jaccard over the union equals
the implemented iw / (wa + wb - iw) exactly — the sketch is matched to
the verifier, not an approximation of it.

Determinism: every random draw derives from a splitmix64 finalizer over
(md5-prefix token hash, hash index, channel). No RNG state, no numpy
Generator — the same (token, seed) yields the same Gamma(2,1)/Uniform
draws in the vectorized pandas UDF, in the pure-Python reference model
(tests/test_icws.py), and on every executor, so band keys are stable
across partitionings and retries. Gamma(2,1) is sampled as
-ln(u1 * u2) (sum of two exponentials) — closed-form, portable,
no rejection loop.

Scale plan (100 TB): cost is O(tokens_per_doc x num_hashes) float work
per document inside one Arrow batch — embarrassingly parallel, no
shuffle until the banded equi-self-join, which is the same budgeted
join class as unweighted MinHash banding (operators/blocking.py). The
per-token draw matrix is recomputed from hashes (pure arithmetic), so
there is no vocabulary-sized cache to blow up on an unbounded corpus;
only the md5 token->uint64 map is cached, bounded at _HASH_CACHE_MAX.

Reference parity note: TFMV/resolve has no weighted-sketch analog
(its blocking is token/q-gram/minhash over unweighted sets,
internal/block/block.go); this operator extends the family for
template-heavy corpora per the redundant-blocking guidance in the
reference's own design doc (art/deep-dive.md:41-49).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_U64 = np.uint64
_MASK64 = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB

# md5 token->uint64 cache: tokens recur heavily across docs (that is
# what IDF weighting is about), but the vocabulary of a 100 TB corpus
# is unbounded — cap and reset rather than grow forever.
_HASH_CACHE_MAX = 1 << 20


def token_hash64(token: str, seed: int) -> int:
    """Portable uint64 token hash: first 8 bytes of
    md5("icws:{seed}:" + token), big-endian. Pure-Python recomputable."""
    h = hashlib.md5(f"icws:{seed}:{token}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _splitmix64_np(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping mul)."""
    z = (z ^ (z >> _U64(30))) * _U64(_MIX1)
    z = (z ^ (z >> _U64(27))) * _U64(_MIX2)
    return z ^ (z >> _U64(31))


def splitmix64_py(z: int) -> int:
    """Pure-Python splitmix64 finalizer (the reference-model twin of
    :func:`_splitmix64_np`; tests assert they agree bit-for-bit)."""
    z = ((z ^ (z >> 30)) * _MIX1) & _MASK64
    z = ((z ^ (z >> 27)) * _MIX2) & _MASK64
    return z ^ (z >> 31)


def _uniforms_np(th: np.ndarray, num_hashes: int) -> np.ndarray:
    """(n_tokens, num_hashes, 5) uniforms in (0,1) from token hashes.

    Channel index c = 5*i + j (hash i, draw j) is folded in via the
    golden-ratio stride BEFORE the finalizer — the same derivation the
    pure-Python model uses, so draws match exactly.
    """
    n = th.shape[0]
    c = np.arange(1, 5 * num_hashes + 1, dtype=np.uint64)  # (H*5,)
    with np.errstate(over="ignore"):
        z = th[:, None] + _U64(_GOLDEN) * c[None, :]  # wraps mod 2^64
        z = _splitmix64_np(z)
    u = ((z >> _U64(11)).astype(np.float64) + 0.5) * (2.0 ** -53)
    return u.reshape(n, num_hashes, 5)


def uniform_py(th: int, hash_idx: int, channel: int) -> float:
    """Pure-Python twin of one cell of :func:`_uniforms_np`."""
    c = 5 * hash_idx + channel + 1
    z = (th + _GOLDEN * c) & _MASK64
    z = splitmix64_py(z)
    return ((z >> 11) + 0.5) * (2.0 ** -53)


def icws_samples_np(
    th: np.ndarray, weights: np.ndarray, num_hashes: int
) -> tuple[np.ndarray, np.ndarray]:
    """ICWS samples for ONE weighted set.

    th: (n,) uint64 token hashes; weights: (n,) positive floats.
    Returns (argmin token index per hash (H,), t* per hash (H,)).

    Ioffe 2010, Algorithm 1: r,c ~ Gamma(2,1), b ~ U(0,1) per (k, i);
      t_k  = floor(ln S_k / r_k + b_k)
      ln y = r_k (t_k - b_k)
      ln a = ln c_k - ln y_k - r_k
    sample = argmin_k ln a_k.
    """
    u = _uniforms_np(th, num_hashes)  # (n, H, 5)
    r = -np.log(u[:, :, 0] * u[:, :, 1])  # Gamma(2,1)
    c = -np.log(u[:, :, 2] * u[:, :, 3])  # Gamma(2,1)
    b = u[:, :, 4]
    lnw = np.log(weights.astype(np.float64))[:, None]  # (n, 1)
    t = np.floor(lnw / r + b)
    lny = r * (t - b)
    lna = np.log(c) - lny - r
    kstar = np.argmin(lna, axis=0)  # (H,)
    tstar = t[kstar, np.arange(num_hashes)]
    return kstar, tstar


def band_keys_from_samples(
    tokens: list, kstar: np.ndarray, tstar: np.ndarray, bands: int
) -> list:
    """md5-digest band keys over (token, t*) sample tuples — the
    weighted twin of the unweighted band-key digests in blocking.py."""
    num_hashes = kstar.shape[0]
    rows = num_hashes // bands
    keys = []
    for band in range(bands):
        sl = slice(band * rows, (band + 1) * rows)
        payload = f"{band}|" + "|".join(
            f"{tokens[int(k)]}:{int(t)}"
            for k, t in zip(kstar[sl], tstar[sl])
        )
        digest = hashlib.md5(payload.encode()).hexdigest()[:12]
        keys.append(f"w{band}:{digest}")
    return keys


def icws_band_keys_udf(num_hashes: int = 64, bands: int = 32, seed: int = 42):
    """(tokens array<string>, weights array<long>) -> array<string> of
    ICWS band keys. Two docs share a band key with probability
    ~ 1 - (1 - J_w^r)^1 per band (r = num_hashes // bands rows), so the
    OR over bands gives the usual S-curve — but on the WEIGHTED Jaccard.

    Callers must supply STRICTLY POSITIVE weights for the
    collision-probability == weighted-Jaccard guarantee: nonpositive /
    NULL weights are coerced to 1.0 inside the sketch (ln needs w > 0),
    while an exact verifier uses the true weights — the sketch and the
    verified measure silently diverge for such inputs (ADVICE r6).
    In-repo callers always produce w >= round(1e6*ln 2).

    Default bands=32 (r=2): knee near (1/32)^(1/2) ~ 0.18 with a steep
    rise — at J_w = 0.6 a pair misses ALL 32 bands with probability
    (1 - 0.36)^32 ~ 6e-7, which is what lets an exact all-pairs oracle
    attest full recall at test scale.
    """
    assert num_hashes % bands == 0
    hash_cache: dict[str, int] = {}
    hcols = np.arange(num_hashes)

    @pandas_udf(ArrayType(StringType()))
    def keys(tokens: pd.Series, weights: pd.Series) -> pd.Series:
        # One draw matrix per UNIQUE token in the Arrow batch: tokens
        # recur heavily across documents (that is what IDF weighting
        # is about), and the r/c/b draws depend only on (token, seed),
        # so per-doc recomputation would redo the same splitmix64 +
        # log work uniq-to-total-ratio times over.
        uniq: dict[str, int] = {}
        for toks in tokens:
            if toks is None:
                continue
            for t in toks:
                if t not in uniq:
                    uniq[t] = len(uniq)
        if uniq:
            if len(hash_cache) > _HASH_CACHE_MAX:
                hash_cache.clear()
            th = np.empty(len(uniq), dtype=np.uint64)
            for t, i in uniq.items():
                hv = hash_cache.get(t)
                if hv is None:
                    hv = token_hash64(t, seed)
                    hash_cache[t] = hv
                th[i] = hv
            u = _uniforms_np(th, num_hashes)  # (n_uniq, H, 5)
            r = -np.log(u[:, :, 0] * u[:, :, 1])
            lnc = np.log(-np.log(u[:, :, 2] * u[:, :, 3]))
            b = u[:, :, 4]

        out = []
        for toks, ws in zip(tokens, weights):
            if toks is None or len(toks) == 0:
                out.append([])
                continue
            toks = list(toks)
            idx = np.fromiter(
                (uniq[t] for t in toks), dtype=np.int64, count=len(toks)
            )
            w = np.asarray(ws, dtype=np.float64)
            # weights must be positive for ln; guard 0/NULL to 1
            w = np.where(np.isfinite(w) & (w > 0), w, 1.0)
            ri, bi = r[idx], b[idx]
            t_mat = np.floor(np.log(w)[:, None] / ri + bi)
            lna = lnc[idx] - ri * (t_mat - bi) - ri
            kstar = np.argmin(lna, axis=0)
            tstar = t_mat[kstar, hcols]
            out.append(band_keys_from_samples(toks, kstar, tstar, bands))
        return pd.Series(out)

    # guide §4.4: stop the optimizer duplicating the sketch below a
    # pushed-down filter (see blocking.minhash_band_keys_udf)
    return keys.asNondeterministic()
