"""SemDeDup cross-cluster miss-class quantification (VERDICT r5 #7):
the planted-straddle probe in tools/probe_semdedup.py, asserted at
fixture scale. semantic_dedup's documented tradeoff — near-dup pairs
split across its own k-means cells are structurally invisible — is
pinned in BOTH directions: every missed pair is cross-cell, and every
isolated cross-cell pair is missed; embedding_duplicates (all-corpus
LSH) covers the same pairs statistically. The measured rates live in
BENCH.md (round 6)."""

from __future__ import annotations

from tools.probe_semdedup import run_probe


def test_semdedup_misses_exactly_the_cross_cell_class(spark):
    res = run_probe(spark, n_per_kind=200, k=8)

    interior, boundary = res["interior"], res["boundary"]
    # in-cell near-dups are fully removed
    assert interior["semdedup_missed"] == 0
    # non-vacuity: the sweep really bracketed a fitted cell boundary
    assert boundary["cross_cell_pairs"] >= 1
    # the structural identity, both directions, on isolated pairs
    assert boundary["missed_subset_of_cross_cell"]
    assert boundary["cross_cell_isolated_all_missed"]
    assert boundary["semdedup_missed"] >= 1
    # the comparison operator sees the class (statistically, not
    # structurally): it may miss a few swept pairs to SRP bucketing,
    # but never the majority
    assert boundary["lsh_missed"] <= boundary["pairs"] // 4
