"""Property-based differential tests for the pair-budget machinery and
shard packing: hypothesis generates adversarial mini-corpora (hot keys,
purgeable passes, ties) and a pure-Python reference model recomputes the
expected output exactly. These guard the machinery the whole blocking
stage stands on — the budget fates (_key_fates), sorted-neighborhood
windowing, cross-pass dedup, and the distributed prefix sum."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from resolve_spark.config import BlockingConfig


# --- reference model of candidate_pairs ---------------------------------

CFG = BlockingConfig(
    max_block_size=3,
    prune_block_size=6,
    redundant_block_size=2,
    purge_passes=("q",),
    neighborhood_window=2,
)


def _model_pairs(records: dict[int, frozenset[str]], cfg: BlockingConfig):
    """Pure-Python candidate_pairs: same fates, same windowing, same
    cross-pass dedup with min-key attribution."""
    by_key: dict[str, list[int]] = {}
    for rid, keys in records.items():
        for k in keys:
            by_key.setdefault(k, []).append(rid)
    out: dict[tuple[int, int], str] = {}
    for k, rids in by_key.items():
        c = len(rids)
        purgeable = k.split(":")[0].startswith("q")
        oversized = c > (
            cfg.redundant_block_size if purgeable else cfg.max_block_size
        )
        dead = (oversized and purgeable) or c > cfg.prune_block_size
        windowed = oversized and not purgeable and c <= cfg.prune_block_size
        if dead:
            continue
        rids = sorted(rids)
        if windowed:
            w = cfg.neighborhood_window
            pairs = [
                (rids[i], rids[j])
                for i in range(len(rids))
                for j in range(i + 1, min(i + w, len(rids) - 1) + 1)
            ]
        else:
            pairs = [
                (rids[i], rids[j])
                for i in range(len(rids))
                for j in range(i + 1, len(rids))
            ]
        for a, b in pairs:
            key = (min(a, b), max(a, b))
            out[key] = min(out[key], k) if key in out else k
    return out


corpus_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=40),
    values=st.frozensets(
        st.sampled_from(
            # three passes: 'a' (normal), 'q' (purgeable), 'w' (normal);
            # few distinct keys so hot blocks cross every threshold
            [f"{p}:{i}" for p in ("a", "q", "w") for i in range(3)]
        ),
        min_size=1,
        max_size=4,
    ),
    min_size=2,
    max_size=24,
)


@pytest.mark.slow
@given(corpus=corpus_strategy)
@settings(max_examples=10, deadline=None)
def test_candidate_pairs_matches_reference_model(spark, corpus):
    from resolve_spark.operators.pairs import candidate_pairs

    df = spark.createDataFrame(
        [(rid, sorted(keys)) for rid, keys in corpus.items()],
        "id int, block_keys array<string>",
    )
    got_df, stats = candidate_pairs(df, "id", CFG)
    got = {
        (r["id_a"], r["id_b"]): r["block_key"] for r in got_df.collect()
    }
    want = _model_pairs(corpus, CFG)
    assert got == want
    # ledger consistency: the stats' key fates match the model's census
    by_key: dict[str, int] = {}
    for keys in corpus.values():
        for k in keys:
            by_key[k] = by_key.get(k, 0) + 1
    n_dead = n_win = 0
    for k, c in by_key.items():
        purgeable = k.startswith("q")
        oversized = c > (
            CFG.redundant_block_size if purgeable else CFG.max_block_size
        )
        if (oversized and purgeable) or c > CFG.prune_block_size:
            n_dead += 1
        elif oversized:
            n_win += 1
    assert stats.n_block_keys == len(by_key)
    assert stats.n_pruned_keys == n_dead
    assert stats.n_oversized_keys == n_win
    assert stats.pairs_dropped_estimate >= 0


# --- reference model of pack_shards -------------------------------------

chunk_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # order key (ties likely)
        st.integers(min_value=0, max_value=50),  # token count
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow
@given(chunks=chunk_strategy, parts=st.integers(min_value=1, max_value=5))
@settings(max_examples=10, deadline=None)
def test_pack_shards_matches_prefix_sum_model(spark, chunks, parts):
    """tokens_before must be the exclusive prefix sum in (order, idx)
    order — regardless of partition count, duplicate order keys, or
    zero-token rows — and shard_id its floor-quotient."""
    from resolve_spark.operators.sharding import pack_shards

    rows = [(order, i, n) for i, (order, n) in enumerate(chunks)]
    df = spark.createDataFrame(rows, "doc_id int, chunk_idx int, n_tokens int")
    out = pack_shards(
        df,
        order_col="doc_id",
        tokens_per_shard=37,
        num_partitions=parts,
        tiebreak_cols=("chunk_idx",),
    ).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["tokens_before"], r["shard_id"])
        for r in out
    }
    acc = 0
    for order, idx, n in sorted(rows, key=lambda r: (r[0], r[1])):
        assert got[(order, idx)] == (acc, acc // 37), (order, idx, acc)
        acc += n
    assert len(got) == len(rows)


# --- product_within_budget: exact at counts the raw product overflows ---

count_strategy = st.one_of(
    st.integers(min_value=1, max_value=20),
    # the overflow regime: counts near 2^31..2^33 whose raw product
    # wraps int64 (ANSI: errors); and budget-boundary neighbors
    st.integers(min_value=(1 << 31) - 3, max_value=(1 << 33) + 3),
    st.integers(min_value=(1 << 62), max_value=(1 << 63) - 1),
)


@pytest.mark.slow
@given(
    ca=count_strategy,
    cb=count_strategy,
    budget=st.one_of(
        st.integers(min_value=1, max_value=1_000_000),
        st.integers(min_value=(1 << 62), max_value=(1 << 63) - 1),
    ),
)
@settings(max_examples=15, deadline=None)
def test_product_within_budget_matches_bigint_model(spark, ca, cb, budget):
    """minhash_join's per-band-key pair budget must decide ca*cb <= B
    with Python-bigint exactness even where the raw int64 product wraps
    (~3e9 per side) — including exact budget boundaries — and must not
    raise under ANSI mode (Spark 4's default)."""
    from resolve_spark.operators.pairs import product_within_budget

    import pyspark.sql.functions as SF

    rows = [(ca, cb), (ca, max(cb - 1, 1)), (max(ca - 1, 1), cb)]
    df = spark.createDataFrame(rows, "ca long, cb long")
    got = [
        r["ok"]
        for r in df.select(
            product_within_budget(SF.col("ca"), SF.col("cb"), budget).alias("ok")
        ).collect()
    ]
    want = [a * b <= budget for a, b in rows]  # Python ints never overflow
    assert got == want, (rows, budget)


# --- reference model of meta-blocking (cbs weights, all schemes) --------


def _model_meta(records: dict[int, frozenset[str]], max_block_size, scheme, k=2):
    by_key: dict[str, list[int]] = {}
    for rid, keys in records.items():
        for key in keys:
            by_key.setdefault(key, []).append(rid)
    live = {key for key, rids in by_key.items() if len(rids) <= max_block_size}
    cbs: dict[tuple[int, int], int] = {}
    for key in live:
        rids = sorted(by_key[key])
        for i in range(len(rids)):
            for j in range(i + 1, len(rids)):
                cbs[(rids[i], rids[j])] = cbs.get((rids[i], rids[j]), 0) + 1
    edges = {e: float(w) for e, w in cbs.items()}
    if not edges:
        return set()
    if scheme == "wep":
        thr = sum(edges.values()) / len(edges)
        return {e for e, w in edges.items() if w >= thr}
    incident: dict[int, list[float]] = {}
    for (a, b), w in edges.items():
        incident.setdefault(a, []).append(w)
        incident.setdefault(b, []).append(w)
    navg = {n: sum(ws) / len(ws) for n, ws in incident.items()}
    if scheme == "wnp":
        return {
            (a, b)
            for (a, b), w in edges.items()
            if w >= navg[a] or w >= navg[b]
        }
    # cnp: per-node top-k under (-weight, id_a, id_b); either end retains
    kept: set[tuple[int, int]] = set()
    for n in incident:
        mine = sorted(
            (e for e in edges if n in e),
            key=lambda e: (-edges[e], e[0], e[1]),
        )
        kept.update(mine[:k])
    return kept


@pytest.mark.slow
@given(
    corpus=corpus_strategy,
    scheme=st.sampled_from(["wep", "wnp", "cnp"]),
)
@settings(max_examples=9, deadline=None)
def test_meta_block_prune_matches_reference_model(spark, corpus, scheme):
    """CBS weights are small ints held exactly in doubles and both
    engines compute sum-then-one-division, so the surviving edge set is
    exactly reproducible — checked against an independent model across
    purging, weighting, and all three pruning schemes."""
    from resolve_spark.operators.meta_blocking import meta_block_prune

    df = spark.createDataFrame(
        [(rid, sorted(keys)) for rid, keys in corpus.items()],
        "id int, block_keys array<string>",
    )
    out = meta_block_prune(
        df, "id", weight="cbs", scheme=scheme, max_block_size=3, k=2
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    want = _model_meta(corpus, max_block_size=3, scheme=scheme, k=2)
    assert got == want


# --- reference model of survivorship fusion -----------------------------


def _model_fuse(ents, asg, rules):
    """ents: {id: {field: value}}, asg: {id: cluster}. Mirrors
    fuse_clusters' documented semantics including tie orders and the
    NULL/empty-skip discipline (min/max/mode/longest skip; first does
    not)."""
    clusters: dict[str, list[int]] = {}
    for rid, cl in asg.items():
        if rid in ents:
            clusters.setdefault(cl, []).append(rid)
    out = {}
    for cl, rids in clusters.items():
        row = {"cluster_size": len(rids), "canonical_id": min(rids)}
        for field, rule in rules.items():
            vals = [ents[r][field] for r in sorted(rids)]
            nz = [v for v in vals if v is not None and str(v) != ""]
            if rule == "min":
                row[field] = min(nz) if nz else None
            elif rule == "max":
                row[field] = max(nz) if nz else None
            elif rule == "first":
                row[field] = ents[min(rids)][field]
            elif rule == "mode":
                if not nz:
                    row[field] = None
                else:
                    counts: dict = {}
                    for v in nz:
                        counts[v] = counts.get(v, 0) + 1
                    row[field] = sorted(
                        counts, key=lambda v: (-counts[v], v)
                    )[0]
            elif rule == "longest":
                if not nz:
                    row[field] = None
                else:
                    row[field] = sorted(
                        set(nz), key=lambda v: (-len(v), v)
                    )[0]
        out[cl] = row
    return out


fusion_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=20),
    values=st.tuples(
        st.sampled_from([None, "", "a", "b", "bb", "ccc", "cc"]),
        st.sampled_from([None, "", "x", "yy", "yy", "zzz"]),
    ),
    min_size=1,
    max_size=15,
)


@pytest.mark.slow
@given(
    ents_raw=fusion_strategy,
    rule1=st.sampled_from(["mode", "longest", "min", "max", "first"]),
    rule2=st.sampled_from(["mode", "longest", "min", "max", "first"]),
)
@settings(max_examples=10, deadline=None)
def test_fuse_clusters_matches_reference_model(spark, ents_raw, rule1, rule2):
    from resolve_spark.operators.fusion import fuse_clusters

    ents = {rid: {"f1": v1, "f2": v2} for rid, (v1, v2) in ents_raw.items()}
    asg = {rid: f"c{rid % 3}" for rid in ents}
    edf = spark.createDataFrame(
        [(r, v["f1"], v["f2"]) for r, v in ents.items()],
        "id int, f1 string, f2 string",
    )
    adf = spark.createDataFrame(
        list(asg.items()), "id int, cluster_id string"
    )
    rules = {"f1": rule1, "f2": rule2}
    got = {
        r["cluster_id"]: {
            "cluster_size": r["cluster_size"],
            "canonical_id": r["canonical_id"],
            "f1": r["f1"],
            "f2": r["f2"],
        }
        for r in fuse_clusters(edf, adf, rules).collect()
    }
    want = _model_fuse(ents, asg, rules)
    assert got == want


# --- reference models of the evaluation metrics -------------------------


def _model_bcubed(pred: dict[int, str], truth: dict[int, str]):
    shared = sorted(set(pred) & set(truth))
    if not shared:
        return None
    csize: dict = {}
    tsize: dict = {}
    osize: dict = {}
    for r in shared:
        csize[pred[r]] = csize.get(pred[r], 0) + 1
        tsize[truth[r]] = tsize.get(truth[r], 0) + 1
        key = (pred[r], truth[r])
        osize[key] = osize.get(key, 0) + 1
    n = len(shared)
    p = sum(osize[(pred[r], truth[r])] / csize[pred[r]] for r in shared) / n
    rec = sum(osize[(pred[r], truth[r])] / tsize[truth[r]] for r in shared) / n
    f1 = 2 * p * rec / (p + rec) if p + rec > 0 else 0.0
    return n, p, rec, f1


def _model_ari(pred: dict[int, str], truth: dict[int, str]):
    shared = sorted(set(pred) & set(truth))
    cells: dict = {}
    rows: dict = {}
    cols: dict = {}
    for r in shared:
        cells[(pred[r], truth[r])] = cells.get((pred[r], truth[r]), 0) + 1
        rows[pred[r]] = rows.get(pred[r], 0) + 1
        cols[truth[r]] = cols.get(truth[r], 0) + 1

    def c2(x):
        return x * (x - 1) // 2

    n = len(shared)
    index = sum(c2(v) for v in cells.values())
    rsum = sum(c2(v) for v in rows.values())
    csum = sum(c2(v) for v in cols.values())
    total = c2(n)
    if total == 0:
        return 1.0
    expected = rsum * csum / total
    mx = (rsum + csum) / 2.0
    if mx - expected != 0:
        return (index - expected) / (mx - expected)
    return 1.0 if index == expected else 0.0


clustering_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=25),
    values=st.sampled_from(["a", "b", "c", "d"]),
    min_size=1,
    max_size=20,
)


@pytest.mark.slow
@given(pred=clustering_strategy, truth=clustering_strategy)
@settings(max_examples=10, deadline=None)
def test_bcubed_and_ari_match_reference_models(spark, pred, truth):
    from resolve_spark.operators.diagnostics import adjusted_rand_index, bcubed

    if not set(pred) & set(truth):
        return  # inner join empty: operators return zero rows
    pdf = spark.createDataFrame(list(pred.items()), "id int, cluster_id string")
    tdf = spark.createDataFrame(list(truth.items()), "id int, truth_id string")
    b = bcubed(pdf, tdf).collect()[0]
    n, p, rec, f1 = _model_bcubed(pred, truth)
    assert b["n_records"] == n
    assert b["bcubed_precision"] == pytest.approx(p, abs=1e-12)
    assert b["bcubed_recall"] == pytest.approx(rec, abs=1e-12)
    assert b["bcubed_f1"] == pytest.approx(f1, abs=1e-12)
    a = adjusted_rand_index(pdf, tdf).collect()[0]
    assert a["ari"] == pytest.approx(_model_ari(pred, truth), abs=1e-12)


def _model_match_metrics(pred_rows, truth_rows, threshold=None):
    """pred_rows: (id_a, id_b, score|None); threshold None = the
    no-thresholds mode (every pred pair predicted, NULL score incl.)."""
    pnorm: dict = {}
    for a, b, s in pred_rows:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in pnorm:
            prev = pnorm[key]
            pnorm[key] = s if prev is None else (
                prev if s is None else max(prev, s)
            )
        else:
            pnorm[key] = s
    tset = {(min(a, b), max(a, b)) for a, b in truth_rows if a != b}
    tp = fp = fn = 0
    for key, s in pnorm.items():
        hit = True if threshold is None else (s is not None and s >= threshold)
        if hit and key in tset:
            tp += 1
        elif hit:
            fp += 1
        elif key in tset:
            fn += 1
    fn += len(tset - set(pnorm))
    return tp, fp, fn


pair_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
        st.sampled_from([None, 0.1, 0.5, 0.5, 0.9]),
    ),
    min_size=1,
    max_size=25,
)
truth_pair_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=15,
)


@pytest.mark.slow
@given(pred=pair_strategy, truth=truth_pair_strategy)
@settings(max_examples=10, deadline=None)
def test_match_metrics_matches_reference_model(spark, pred, truth):
    """Pair normalization (least/greatest), self-pair drop, max-score
    dedup, NULL-score handling in both modes — vs an independent
    model."""
    from resolve_spark.operators.diagnostics import match_metrics

    if all(a == b for a, b, _ in pred) or all(a == b for a, b in truth):
        return  # degenerate: one side empty after self-pair drop
    pdf = spark.createDataFrame(pred, "id_a int, id_b int, score double")
    tdf = spark.createDataFrame(truth, "id_a int, id_b int")
    row = match_metrics(pdf, tdf, score_col="score").collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == _model_match_metrics(pred, truth)
    sweep = match_metrics(
        pdf, tdf, score_col="score", thresholds=[0.5]
    ).collect()
    srow = {r["threshold"]: r for r in sweep}[0.5]
    want = _model_match_metrics(pred, truth, threshold=0.5)
    assert (srow["tp"], srow["fp"], srow["fn"]) == want


# --- FS posterior CASE wiring vs the E-step formula ---------------------


@pytest.mark.slow
@given(
    nf=st.integers(min_value=1, max_value=4),
    lam=st.floats(min_value=0.01, max_value=0.99),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=10, deadline=None)
def test_fs_match_probability_case_matches_posterior(spark, nf, lam, seed):
    """fs_match_probability compiles the posterior into a 2^F-branch
    literal CASE; the branch<->pattern bit-order wiring must hand every
    agreement pattern exactly FSParams.posterior(pattern)."""
    import random

    from resolve_spark.operators.fellegi_sunter import (
        FSParams,
        fs_match_probability,
    )

    rng = random.Random(seed)
    fields = [f"g{i}" for i in range(nf)]
    params = FSParams(
        fields=tuple(fields),
        lam=lam,
        m=tuple(rng.uniform(0.5, 0.999) for _ in fields),
        u=tuple(rng.uniform(0.001, 0.5) for _ in fields),
        iterations=1,
    )
    patterns = [
        tuple((i >> (nf - 1 - f)) & 1 for f in range(nf))
        for i in range(2**nf)
    ]
    df = spark.createDataFrame(
        patterns, ", ".join(f"{f} int" for f in fields)
    )
    got = df.select(*fields, fs_match_probability(params).alias("p")).collect()
    for r in got:
        pattern = tuple(r[f] for f in fields)
        assert r["p"] == params.posterior(pattern), pattern


# --- reference model of BM25 --------------------------------------------


def _model_bm25(docs: dict[int, str], terms, k1=1.2, b=0.75, scale=1_000_000):
    import math as m

    terms = sorted({t.lower() for t in terms})
    toks = {rid: [t for t in text.lower().split() if t] for rid, text in docs.items()}
    n_docs = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    idf6 = {
        t: m.floor(
            0.5 + scale * m.log(
                1 + (n_docs - df + 0.5) / (df + 0.5)
            )
        )
        for t in terms
        for df in [sum(1 for ts in toks.values() if t in ts)]
    }
    out = {}
    for rid, ts in toks.items():
        matched = [t for t in terms if t in ts]
        if not matched:
            continue
        dl = len(ts)
        scaled = 0
        for t in matched:
            tf = sum(1 for x in ts if x == t)
            den = tf + k1 * ((1 - b) + b * (dl / avgdl))
            scaled += m.floor(idf6[t] * ((tf * (k1 + 1)) / den) + 0.5)
        out[rid] = (len(matched), scaled)
    return out


WORDS = ["alpha", "beta", "gamma", "delta", "alpha", "nu"]

doc_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=12),
    values=st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=10,
)


@pytest.mark.slow
@given(
    docs=doc_strategy,
    terms=st.frozensets(st.sampled_from(WORDS), min_size=1, max_size=3),
)
@settings(max_examples=10, deadline=None)
def test_bm25_scores_match_reference_model(spark, docs, terms):
    """score_scaled is an exact long by construction, so the Spark
    result must equal a pure-Python BM25 with the same HALF_UP
    integerization — term by term, document by document."""
    from resolve_spark.operators.corpus_stats import bm25_scores

    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["rid"]: (r["n_matched"], r["score_scaled"])
        for r in bm25_scores(df, "doc_id", sorted(terms)).collect()
    }
    assert got == _model_bm25(docs, terms)


# --- reference model of exact-substring span removal --------------------


def _model_remove_spans(docs: dict[str, str | None], n: int, min_docs: int):
    toks = {
        rid: [t for t in (text or "").split() if t]
        for rid, text in docs.items()
    }
    # window text (case-folded) -> set of docs containing it
    wdocs: dict[tuple, set] = {}
    for rid, ts in toks.items():
        low = [t.lower() for t in ts]
        for i in range(len(low) - n + 1):
            wdocs.setdefault(tuple(low[i:i + n]), set()).add(rid)
    shared = {w for w, ds in wdocs.items() if len(ds) >= min_docs}
    out = {}
    for rid, ts in toks.items():
        low = [t.lower() for t in ts]
        covered = set()
        for i in range(len(low) - n + 1):
            if tuple(low[i:i + n]) in shared:
                covered.update(range(i, i + n))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[rid] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


span_doc_strategy = st.dictionaries(
    keys=st.sampled_from([f"d{i}" for i in range(8)]),
    values=st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(["Foo", "bar", "BAZ", "qux", "foo"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
    ),
    min_size=2,
    max_size=8,
)


@pytest.mark.slow
@given(docs=span_doc_strategy, n=st.integers(min_value=2, max_value=4))
@settings(max_examples=10, deadline=None)
def test_remove_repeated_spans_matches_reference_model(spark, docs, n):
    """Window coverage, case-folded dup detection with case-preserving
    output, NULL text, and short-doc handling — vs an independent
    positional model (window-hash equality == window-text equality up
    to negligible xxhash64 collisions)."""
    from resolve_spark.operators import dedup

    df = spark.createDataFrame(
        list(docs.items()), "rid string, content string"
    )
    got = {
        r["rid"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.remove_repeated_spans(
            df, "rid", "content", n=n, min_docs=2
        ).collect()
    }
    assert got == _model_remove_spans(docs, n, min_docs=2)
