"""Synthesize a driver-shaped scale-factor directory for LOCAL perf
measurement (the driver generates its own data for the official run).

The model is reverse-engineered from /root/testdata/sf{0.001,0.01,0.1}
(see OPTIMIZATION_r07.md "Measurement data"): row counts scale linearly
with sf (documents/embeddings floored at 500), all per-column
distributions are sf-invariant:

  documents : doc_id 0..n-1; text = L~U{10..100} i.i.d. tokens from a
              30-word uniform vocab; 5%% of docs are a copy of a random
              earlier doc with one ' dup' token inserted; lang
              {en:~41%%, de/zh/fr/es ~15%%}; source src0..src19 uniform;
              n_chars = len(text)
  embeddings: 64-dim float32, unit-normalized, label U{0..9}
  customer  : Customer#%%09d, nationkey U{0..24}, acctbal U[-1000,10000],
              mktsegment 5 uniform
  part      : p_name = color(8) x noun(8), brand Brand#1..25, type 6,
              size U{1..50}, retailprice = 900 + (key %% 1000)/10
  supplier  : Supplier#%%09d, nationkey, acctbal
  orders    : custkey uniform, status O/F/P, totalprice U[1000,500000],
              date U[1995-01-01, 2001-08-01], priority 5
  lineitem  : orderkey uniform over orders, partkey/suppkey uniform,
              linenumber U{1..7}, qty U{1..50}, discount/tax steps,
              shipdate = orderdate + U{1..95} days
  events    : ts = sorted U over [2024-01-01, +30d), user_id U{0..n/66.7},
              type 5 uniform, value Exp(mean 50), props {"k": U{0..99}}

Usage: python tools/make_sf.py --sf 1.0 [--out /root/testdata/sf1.0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
COLORS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["LARGE", "STANDARD", "ECONOMY", "MEDIUM", "SMALL", "PROMO"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "AUTOMOBILE", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(name, table.num_rows)


def gen(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)

    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_cust = max(150, int(150_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_ord = max(1500, int(1_500_000 * sf))
    n_li = max(6000, int(6_000_000 * sf))
    n_ev = max(1000, int(1_000_000 * sf))

    # documents
    lens = rng.randint(10, 101, n_doc)
    toks = [list(rng.choice(VOCAB, L)) for L in lens]
    is_dup = rng.rand(n_doc) < 0.05
    texts = [None] * n_doc
    for i in range(n_doc):
        if is_dup[i] and i > 0:
            donor = rng.randint(0, i)
            t = list(toks[donor])
            t.insert(rng.randint(0, len(t) + 1), "dup")
            texts[i] = " ".join(t)
        else:
            texts[i] = " ".join(toks[i])
    langs = rng.choice(LANGS, n_doc, p=LANG_P)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in rng.permutation(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    v = rng.randn(n_emb, 64).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb), pa.int32()),
    }))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int64()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }))

    keys = np.arange(n_part)
    write(out, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": [f"{rng.choice(COLORS)} {rng.choice(NOUNS)}" for _ in range(n_part)],
        "p_brand": [f"Brand#{b}" for b in rng.randint(1, 26, n_part)],
        "p_type": rng.choice(TYPES, n_part),
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int64()),
        "p_retailprice": 900.0 + (keys % 1000) / 10.0,
    }))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int64()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int64()),
    }))
    write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int64()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))

    odate = (np.datetime64("1995-01-01")
             + rng.randint(0, 2405, n_ord).astype("timedelta64[D]"))
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))

    lok = rng.randint(0, n_ord, n_li)
    sdate = (odate[lok]
             + rng.randint(1, 96, n_li).astype("timedelta64[D]"))
    qty = rng.randint(1, 51, n_li).astype(np.float64)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]"),
                               pa.timestamp("us")),
    }))

    span = 30 * 86400.0
    ts = np.sort(rng.uniform(0, span, n_ev))
    base = np.datetime64("2024-01-01T00:00:00")
    n_user = max(15, int(n_ev * 0.0015))
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(base + (ts * 1e6).astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_user, n_ev), pa.int64()),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.randint(0, 100, n_ev)],
    }))
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write("")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/root/testdata/sf{args.sf:g}"
    gen(args.sf, out)
