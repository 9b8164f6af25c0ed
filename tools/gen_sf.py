#!/usr/bin/env python3
"""Generate a scaled testdata set matching the driver tables' schemas and
distribution SHAPES — for scale drills past the provided sf0.1 (the
provided testdata is read-only and tops out at sf0.1; BASELINE.md's 10×
deltas need a measured sf1.0 point, not an extrapolation).

Shapes mirrored from profiling /root/testdata/sf0.1 (see BASELINE.md
round-14 scale-drill section): 30-word uniform vocabulary documents with
uniform 10–100-word lengths and a ~0.16% planted-dup tail, unit-normalized
64-dim gaussian embeddings with uniform labels, a fixed 30-day event window
whose density and user count scale with sf, and TPC-H-ish tables at the
standard per-sf row counts. NOT bit-compatible with the driver generator
(seed/stream unknown) — intended for THROUGHPUT measurement, where the
plan shapes and cardinalities are what matter.

Usage: tools/gen_sf.py --sf 1.0 [--out target/sfgen/sf1.0] [--seed 42]
"""
import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast row the agg key query a scan batch").split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.412, 0.140, 0.149, 0.148, 0.151]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
DAY_US = 86400_000_000


def gen_documents(rng, n, out):
    lens = rng.integers(10, 101, n)
    langs = rng.choice(LANGS, n, p=LANG_P)
    sources = [f"src{i}" for i in rng.integers(0, 20, n)]
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens]
    # planted exact-dup tail (~0.16% of docs copy an earlier doc, with the
    # sf0.1 marker token so dup families are identifiable)
    for i in rng.choice(np.arange(n // 10, n), max(2, n // 625), replace=False):
        texts[i] = texts[int(i) // 2] + " dup"
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, f"{out}/documents.parquet")


def gen_embeddings(rng, n, out):
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32), pa.int32()),
    })
    pq.write_table(t, f"{out}/embeddings.parquet")


def gen_events(rng, n, n_users, out):
    base = np.datetime64("2024-01-01T00:00:00.000000")
    ts = base + np.sort(rng.integers(0, 30 * DAY_US, n)).astype("timedelta64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n).tolist(), pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, n).clip(0, 560.21), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 101, n)],
                          pa.string()),
    })
    pq.write_table(t, f"{out}/events.parquet")


def gen_tpch(rng, sf10, out, whales=0, whale_frac=0.05):
    """sf10 = multiples of the sf0.1 row counts.

    whales > 0 plants a power-law basket tail: `whales` customers (ids
    0..whales-1) receive `whale_frac` of all orders between them, so each
    whale's distinct-supplier basket far exceeds the engine's 256-per-
    customer quota (at sf0.1 counts, 5 whales x 5% = 1500 orders x ~4
    lineitems ~ 6000 supplier draws from 1000 -> ~full vocabulary). This is
    the corpus where the q136/q143 basket cap BINDS, certifying the capped
    oracle replay end-to-end (round-16 task #1)."""
    n_cust, n_supp, n_part = 15000 * sf10, 1000 * sf10, 20000 * sf10
    n_ord, n_li = 150000 * sf10, 600000 * sf10
    day0 = np.datetime64("1995-01-01")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int64()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"]),
    }), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int64()),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int64()),
    }), f"{out}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(segs, n_cust).tolist()),
    }), f"{out}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }), f"{out}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i % 50}" for i in range(n_part)]),
        "p_type": pa.array([f"TYPE {i % 150}" for i in range(n_part)]),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, n_part), 2)),
    }), f"{out}/part.parquet")
    odate = day0 + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
    o_cust = rng.integers(0, n_cust, n_ord)
    if whales > 0:
        n_whale_orders = int(n_ord * whale_frac)
        idx = rng.choice(n_ord, n_whale_orders, replace=False)
        o_cust[idx] = rng.integers(0, whales, n_whale_orders)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(o_cust, pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord,
                                             p=[0.49, 0.49, 0.02]).tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(850, 560000, n_ord), 2)),
        "o_orderdate": pa.array(odate.astype("datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(
            rng.choice([f"{i}-P" for i in range(1, 6)], n_ord).tolist()),
    }), f"{out}/orders.parquet")
    lo = np.sort(rng.integers(0, n_ord, n_li))
    # linenumber = position within the order
    ln = np.ones(n_li, dtype=np.int32)
    same = np.concatenate([[False], lo[1:] == lo[:-1]])
    run = 1
    for i in range(1, n_li):
        run = run + 1 if same[i] else 1
        ln[i] = run
    sdate = day0 + rng.integers(1, 2500, n_li).astype("timedelta64[D]")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["N", "R", "A"], n_li,
                                            p=[0.5, 0.25, 0.25]).tolist()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li).tolist()),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]"),
                               pa.timestamp("us")),
    }), f"{out}/lineitem.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--whales", type=int, default=0,
                    help="plant N whale customers whose baskets exceed the "
                         "256-supplier quota (cap-binding corpus)")
    ap.add_argument("--whale-frac", type=float, default=0.05,
                    help="fraction of all orders assigned to the whales")
    args = ap.parse_args()
    sf10 = max(1, round(args.sf / 0.1))
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "target", "sfgen", f"sf{args.sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    gen_documents(rng, 5000 * sf10, out)
    gen_embeddings(rng, 2000 * sf10, out)
    gen_events(rng, 100000 * sf10, 1500 * sf10, out)
    gen_tpch(rng, sf10, out, whales=args.whales, whale_frac=args.whale_frac)
    meta = {"sf": args.sf, "seed": args.seed,
            "whales": args.whales, "whale_frac": args.whale_frac,
            "rows": {"documents": 5000 * sf10, "embeddings": 2000 * sf10,
                     "events": 100000 * sf10, "lineitem": 600000 * sf10}}
    with open(f"{out}/_GEN.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
