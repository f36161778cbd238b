"""Text-analysis operators for large-scale training-data pipelines.

All native Column expressions (whole-stage codegen) unless noted:
- language-ID: stopword-hit-rate heuristic over small per-language
  function-word sets (the classic n-gram-free baseline)
- quality scoring: length / punctuation / stopword-ratio features
  blended to one [0,1] score
- token counting: whitespace tokens + a BPE-ish subword estimate
- document fingerprinting: rolling/content hashes for exact and
  near-exact dedup keys
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small function-word profiles (top function words per language).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "pas", "une", "dans", "que"),
    "es": ("el", "la", "los", "de", "que", "es", "una", "por", "con", "para"),
    "zh": (),  # han-script detection below, not word lists
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def lang_id(col: Column) -> Column:
    """Best-guess language code by function-word hit rate; 'zh' when han
    characters dominate; 'und' when nothing scores."""
    toks = _tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    def _hits(wordset: Column) -> Column:
        # closure, NOT a default-arg lambda: pyspark reads lambda arity,
        # and a second parameter turns it into an (element, index) lambda
        return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))

    for lang, words in LANG_PROFILES.items():
        if not words:
            continue
        wordset = F.array(*[F.lit(w) for w in words])
        scores.append((lang, _hits(wordset) / n))
    han = F.length(F.regexp_replace(col, r"[^\p{IsHan}]", ""))
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return (
        F.when(han / F.greatest(F.length(col), F.lit(1)) > 0.25, F.lit("zh"))
        .when(best_score > 0.02, best)
        .otherwise(F.lit("und"))
    )


def quality_score(col: Column) -> Column:
    """[0,1] document-quality heuristic: reasonable length, sane mean
    word length, low punctuation density, some stopword mass."""
    n_chars = F.length(col)
    toks = _tokens(col)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    mean_word_len = n_chars / n_toks
    punct = F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))) / n_toks
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    word_len_score = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.3)
    punct_score = F.when(punct_ratio < 0.2, 1.0).otherwise(F.lit(1.0) - punct_ratio)
    stop_score = F.least(stop_ratio * 5, F.lit(1.0))
    return (0.3 * len_score + 0.25 * word_len_score + 0.25 * punct_score
            + 0.2 * stop_score)


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


def subword_count_estimate(col: Column) -> Column:
    """BPE-ish token estimate: word pieces of <=4 chars, digits and
    punctuation runs as single tokens (ceil(len/4) per word +
    punct runs) — the standard chars/4 heuristic, word-aware."""
    toks = _tokens(col)
    word_pieces = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int")
    )
    punct_runs = F.size(
        F.filter(F.split(col, r"[\p{L}\p{N}\s]+"), lambda t: t != "")
    )
    return word_pieces + punct_runs


def content_fingerprint(col: Column, bits: int = 64) -> Column:
    """Exact-dedup fingerprint: xxhash64 of whitespace-normalized,
    case-folded content (cheap, collision-safe at table scale)."""
    # collapse first: Spark trim() strips spaces only, not \n/\t
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.xxhash64(normalized)


def rolling_window_fingerprints(col: Column, window: int = 64, stride: int = 32) -> Column:
    """Array of window fingerprints over the normalized text — the
    content-defined-chunking analog for near-exact containment dedup
    (shared window hash => shared chunk). Native expressions only."""
    # collapse first: Spark trim() strips spaces only, not \n/\t
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    n = F.length(normalized)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - window + 1, F.lit(1)),
        F.lit(stride),
    )
    return F.transform(starts, lambda i: F.xxhash64(F.substring(normalized, i, window)))


def simhash64(col: Column, hash_impl: str = "fast") -> Column:
    """64-bit SimHash over per-token hashes — native implementation.

    For each bit b: sum over tokens of (+1 if bit set else -1); the
    sign vector packs into one long. Expressed as an aggregate over the
    token array per bit, folded with bit arithmetic (no Python).

    ``hash_impl``: "fast" = xxhash64 (production default); "portable" =
    the md5-prefix hash (functions/hashing.py) that a DuckDB oracle can
    recompute bit-identically (60 effective bits; bits 60-62 are then
    always 0 on both sides — a slightly narrower but still-valid
    fingerprint).
    """
    from resolve_spark.functions.hashing import check_hash_impl, portable_hash60

    check_hash_impl(hash_impl)
    token_hash = F.xxhash64 if hash_impl == "fast" else portable_hash60
    toks = F.array_distinct(_tokens(col))
    hashes = F.transform(toks, lambda t: token_hash(t))
    bits = F.sequence(F.lit(0), F.lit(62))  # bit 63 kept 0 (sign-safe under ANSI)
    # ONE aggregate with an array accumulator: per-bit set-bit counts.
    # (63 independent per-bit aggregates would re-embed the hash subtree
    # 63x and blow the codegen method limit.)
    bitcounts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 63),
        lambda acc, h: F.zip_with(
            acc, bits, lambda a, b: a + F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)).cast("int")
        ),
    )
    n = F.size(hashes)
    packed = F.aggregate(
        F.zip_with(
            bitcounts,
            bits,
            lambda c, b: F.when(c * 2 > n, F.call_function("shiftleft", F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(toks) == 0, F.lit(0).cast("long")).otherwise(packed)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
