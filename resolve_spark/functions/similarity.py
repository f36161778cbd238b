"""Native-Column similarity kernels (SURVEY.md §2.3, K1-K8).

Every function here compiles to whole-stage-codegen'd JVM expressions —
the fast path. Kernels with no Spark builtin (Jaro-Winkler, TF-cosine and
the composite scorers that embed them) live in
``resolve_spark.functions.fields`` as Arrow-batched pandas UDFs.

Parity target: /root/reference/internal/similarity/similarity.go and the
phone/zip ladders of fields.go (fully expressible as when-ladders).
Empty-string conventions follow the reference exactly: ``("","") -> 1.0``,
one-empty ``-> 0.0``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Go tokenizer: unicode letter/digit runs, lowercased (similarity.go:362-388)
TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"


def _empty_guard(a: Column, b: Column, body: Column) -> Column:
    """(""/"")->1.0, one-empty->0.0 — the shared preamble of every kernel."""
    return (
        F.when((a == "") & (b == ""), F.lit(1.0))
        .when((a == "") | (b == ""), F.lit(0.0))
        .otherwise(body)
    )


def exact_match(a: Column, b: Column) -> Column:
    """K1 — similarity.go:19-30."""
    return (a == b).cast("double")


def case_insensitive_match(a: Column, b: Column) -> Column:
    """K2 — similarity.go:33-44."""
    return (F.lower(a) == F.lower(b)).cast("double")


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """K4 — 1 - dist/max(len) (similarity.go:161-218).

    Spark's builtin levenshtein is character-based like the Go rune DP.
    """
    body = F.lit(1.0) - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))
    return _empty_guard(a, b, body)


def tokens(s: Column) -> Column:
    """K8 — distinct lowercase letter/digit-run tokens (similarity.go:362-388)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(s), TOKEN_SPLIT_RE), lambda x: x != "")
    )


def jaccard_token_arrays(ta: Column, tb: Column) -> Column:
    """K5 over PRE-TOKENIZED distinct-token arrays.

    At scale, tokenizing long text per pair side is O(pairs * doc_len);
    tokenize once per record (see tokens()) and intersect arrays here.
    Empty-array conventions mirror the kernel's empty-string ones
    (both empty -> 1.0, one empty -> 0.0; Go's 0/0 NaN case -> 1.0).
    """
    # inputs are DISTINCT arrays, so |A∪B| = |A|+|B|-|A∩B| — this avoids
    # materializing a second (union) array per pair, which halves the
    # per-pair array work on wide token arrays
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(ta) + F.size(tb) - inter
    return (
        F.when((F.size(ta) == 0) & (F.size(tb) == 0), F.lit(1.0))
        .when((F.size(ta) == 0) | (F.size(tb) == 0), F.lit(0.0))
        .otherwise(inter / union)
    )


def jaccard(a: Column, b: Column) -> Column:
    """K5 — |A∩B| / |A∪B| over token sets (similarity.go:222-266)."""
    ta, tb = tokens(a), tokens(b)
    union = F.size(F.array_union(ta, tb))
    body = F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(ta, tb)) / union
    )
    return _empty_guard(a, b, body)


def contained_in(a: Column, b: Column, ignore_case: bool = True) -> Column:
    """K7 — substring either way -> min(len)/max(len) (similarity.go:330-359)."""
    la, lb = (F.lower(a), F.lower(b)) if ignore_case else (a, b)
    body = F.when(
        la.contains(lb) | lb.contains(la),
        F.least(F.length(a), F.length(b))
        / F.greatest(F.length(a), F.length(b)).cast("double"),
    ).otherwise(F.lit(0.0))
    return _empty_guard(a, b, body)


def _digits(c: Column) -> Column:
    return F.regexp_replace(c, r"[^0-9]", "")


def _common_prefix_len(a: Column, b: Column, upto: int) -> Column:
    """Length of common prefix of a,b capped at ``upto``.

    Prefix equality is monotone, so break-at-first-mismatch == the count
    of i with equal i-prefixes. One lambda over a sequence keeps the
    expression tree small (an unrolled when-ladder duplicates the digit
    expressions ~20x and blows the 64KB whole-stage-codegen method
    limit, forcing interpreted eval)."""
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(upto)),
            lambda i: (F.length(a) >= i)
            & (F.length(b) >= i)
            & (F.substring(a, F.lit(1), i) == F.substring(b, F.lit(1), i)),
        )
    )


def phone_similarity(a: Column, b: Column) -> Column:
    """F3 — trailing-digit ladder of the last 10 digits (fields.go:258-333).

    >=10 matching -> 1.0, >=7 -> 0.9, >=4 -> 0.7, else n/10. Fully native.
    """
    da, db = _digits(a), _digits(b)
    ra, rb = F.reverse(F.right(da, F.lit(10))), F.reverse(F.right(db, F.lit(10)))
    m = _common_prefix_len(ra, rb, 10)
    ladder = (
        F.when(da == db, F.lit(1.0))
        .when(m >= 10, F.lit(1.0))
        .when(m >= 7, F.lit(0.9))
        .when(m >= 4, F.lit(0.7))
        .otherwise(m.cast("double") / 10.0)
    )
    digit_guard = (
        F.when((da == "") & (db == ""), F.lit(1.0))
        .when((da == "") | (db == ""), F.lit(0.0))
        .otherwise(ladder)
    )
    return _empty_guard(a, b, digit_guard)


def zip_similarity(a: Column, b: Column) -> Column:
    """F5 — leading-digit ladder (fields.go:408-485).

    equal digits -> 1.0; prefix >=5 -> 0.95, >=3 -> 0.8, >=1 -> 0.5, else 0.
    """
    da, db = _digits(a), _digits(b)
    m = _common_prefix_len(da, db, 5)
    ladder = (
        F.when(da == db, F.lit(1.0))
        .when(m >= 5, F.lit(0.95))
        .when(m >= 3, F.lit(0.8))
        .when(m >= 1, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    digit_guard = (
        F.when((da == "") & (db == ""), F.lit(1.0))
        .when((da == "") | (db == ""), F.lit(0.0))
        .otherwise(ladder)
    )
    return _empty_guard(a, b, digit_guard)


def numeric_similarity(
    a: Column,
    b: Column,
    rel_levels: tuple[float, ...] = (0.0, 0.01, 0.1),
    sims: tuple[float, ...] = (1.0, 0.9, 0.7),
) -> Column:
    """Relative-difference ladder for numeric fields — the Splink-style
    comparison-level pattern (exact -> within 1% -> within 10% -> 0)
    the reference lacks (its kernels are all string-typed,
    similarity.go). Beyond-reference, needed for amounts/quantities in
    real ER schemas.

    Level i matches when |a-b| <= rel_levels[i] * max(|a|,|b|) and
    scores sims[i]; the first (tightest) matching level wins; no level
    -> 0.0. NULL on either side -> 0.0; both exactly equal (incl. 0,0)
    -> sims[0]. Pure codegen arithmetic, no UDF."""
    if len(rel_levels) != len(sims):
        raise ValueError("rel_levels and sims must have equal length")
    diff = F.abs(a - b)
    mag = F.greatest(F.abs(a), F.abs(b))
    out = F.lit(0.0)
    for lvl, s in reversed(list(zip(rel_levels, sims))):
        out = F.when(diff <= F.lit(lvl) * mag, F.lit(s)).otherwise(out)
    out = F.when(a == b, F.lit(sims[0])).otherwise(out)
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(out)


def temporal_similarity(
    a: Column,
    b: Column,
    windows_s: tuple[int, ...] = (0, 3600, 86400, 7 * 86400),
    sims: tuple[float, ...] = (1.0, 0.9, 0.7, 0.4),
) -> Column:
    """Absolute-difference ladder for timestamps: same instant -> 1.0,
    within an hour -> 0.9, a day -> 0.7, a week -> 0.4, else 0
    (defaults; both ladders configurable). Timestamps compare via
    unix MICROseconds (exact long arithmetic, timezone-free) — whole-
    second truncation would score two instants 900ms apart as "same
    instant" and shift every window boundary by up to ~1s. Pure
    codegen."""
    if len(windows_s) != len(sims):
        raise ValueError("windows_s and sims must have equal length")
    # cast("timestamp") admits TIMESTAMP_NTZ inputs (unix_micros alone
    # rejects them). For NTZ values the cast interprets both sides in
    # the SESSION timezone: under a fixed-offset zone the shifts cancel
    # exactly; under a DST zone two NTZ values straddling a transition
    # would shift by the DST gap. build_session pins
    # spark.sql.session.timeZone=UTC, so engine sessions are always in
    # the fixed-offset case — keep it that way for NTZ data.
    diff = F.abs(
        F.unix_micros(a.cast("timestamp")) - F.unix_micros(b.cast("timestamp"))
    )
    out = F.lit(0.0)
    for w, s in reversed(list(zip(windows_s, sims))):
        # round, not int(): fractional windows (0.5s) are meaningful at
        # microsecond resolution and int() would truncate them to 0
        out = F.when(
            diff <= F.lit(int(round(w * 1_000_000))), F.lit(s)
        ).otherwise(out)
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(out)
