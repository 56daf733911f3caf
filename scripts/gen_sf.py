#!/usr/bin/env python
"""Measurement-only synthetic data generator mimicking /root/testdata/sf*.

The driver generates its own scale factors; this script exists so
optimization rounds can measure at sf1.0 locally (the driver's r8
measurement escalated to sf1.0, ~6M lineitem rows / 50k docs).  Schemas,
key ranges, value formats and distributions are matched to the committed
sf0.1 tables (see TESTDATA.md).  Deterministic (numpy seed per table).

Usage: python scripts/gen_sf.py --sf 1.0 --out /root/testdata_gen/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "vector join shuffle cache plan"
).split()

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETFLAGS = ["N", "A", "R"]
LINESTATUS = ["O", "F"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
PADJ = ["large", "hot", "blue", "red", "small", "green", "dark", "light"]
PNOUN = ["ring", "bolt", "case", "drum", "pipe", "disk", "cone", "tube"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(out, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/testdata_gen/sf1.0")
    args = ap.parse_args()
    sf = args.sf
    out = args.out
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_user = max(100, int(15_000 * sf))

    rng = np.random.default_rng(42)

    write(out, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS})
    write(out, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

    write(out, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)})

    write(out, "customer", {
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]})

    write(out, "part", {
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{PADJ[a]} {PNOUN[b]}" for a, b in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(n_part) % 1000 * 0.1, 2)})

    day = np.timedelta64(86_400_000_000, "us")
    base95 = np.datetime64("1995-01-01T00:00:00", "us")
    odates = base95 + rng.integers(0, 2404, n_ord) * day
    write(out, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in
                          rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])],
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]})

    sdates = base95 + rng.integers(1, 2500, n_li) * day
    write(out, "lineitem", {
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("f8"),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [RETFLAGS[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [LINESTATUS[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdates, pa.timestamp("us"))})

    base24 = np.datetime64("2024-01-01T00:00:00", "us")
    ets = base24 + np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    write(out, "events", {
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in
                       rng.choice(5, n_ev, p=[0.4, 0.3, 0.1, 0.1, 0.1])],
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]})

    # documents: random small-vocab texts, en-heavy langs, 0.2% exact dups
    langs = ["en", "zh", "es", "fr", "de"]
    lang_p = [0.42, 0.15, 0.15, 0.14, 0.14]
    n_src = max(20, int(20 * sf * 10) if sf > 0.1 else 20)
    wc = rng.integers(8, 93, n_doc)
    words = rng.integers(0, len(VOCAB), int(wc.sum()))
    texts, pos = [], 0
    for c in wc:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + c]))
        pos += c
    # exact duplicate pairs (~0.2%)
    for i in range(0, n_doc // 500):
        texts[(i * 997 + 13) % n_doc] = texts[(i * 499 + 7) % n_doc]
    write(out, "documents", {
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [langs[i] for i in rng.choice(5, n_doc, p=lang_p)],
        "source": [f"src{i}" for i in rng.integers(0, n_src, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})

    # noise sigma calibrated against the committed sf0.1 embeddings:
    # background pairwise cosines must cap ~0.42 (p99 ~0.28) — tighter
    # clusters inflate every LSH/ANN candidate volume unrealistically
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels] + rng.normal(0, 1.5, (n_emb, 64))).astype("f4")
    write(out, "embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})

    print(json.dumps({"out": out, "sf": sf, "lineitem": n_li, "docs": n_doc}))


if __name__ == "__main__":
    main()
