"""Generate a LOCAL measurement mirror of the driver's synthetic tables at
an arbitrary scale (default 10x sf0.1 ~ sf1.0) so heavy-query behavior can
be profiled at the driver's escalation scale without the driver's own data.

Mirrors the observable sf0.1 distributions (TESTDATA.md: deterministic,
seed=42): documents = 10..100 tokens uniform over the same 31-word vocab;
embeddings = unit-norm 64-dim float vectors over 10 labels; events = 5
event types, zipf-less uniform users, 30-day timestamp span. NOT the
driver's bit-exact data — used only for relative performance measurement
(bench_extra / profile runs). Never read by queries(), oracle_sql() or
bench.py.

Usage: python tools/gen_sf_mirror.py [--out /tmp/sfmirror1.0] [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ETYPES = ["signup", "purchase", "view", "click", "error"]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    ntok = rng.integers(10, 101, n)
    texts = [" ".join(rng.choice(VOCAB, k)) for k in ntok]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(LANGS, n, p=LANG_P), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.normal(size=(n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span = 30 * 24 * 3600 * 1_000_000  # 30 days in micros
    ts = base + np.sort(rng.integers(0, span, n)).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 1500 * max(1, n // 100000), n), pa.int64()),
        "event_type": pa.array(rng.choice(ETYPES, n), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 200, n), 2), pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)], pa.string()),
    })


def _dates(rng, n, lo="1995-01-01", hi="2001-11-01"):
    a, b = np.datetime64(lo), np.datetime64(hi)
    span = int((b - a) / np.timedelta64(1, "D"))
    return (a + rng.integers(0, span, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen_lineitem(n: int, n_orders: int, rng: np.random.Generator) -> pa.Table:
    return pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n // 30, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, max(1, n // 600), n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 100000, n), 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2), pa.float64()),
        "l_returnflag": pa.array(rng.choice(["N", "A", "R"], n, p=[0.5, 0.25, 0.25]), pa.string()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n), pa.string()),
        "l_shipdate": pa.array(_dates(rng, n), pa.timestamp("us")),
    })


def gen_orders(n: int, n_cust: int, rng: np.random.Generator) -> pa.Table:
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n), pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n), 2), pa.float64()),
        "o_orderdate": pa.array(_dates(rng, n, "1995-01-01", "1998-08-01"), pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(prio, n), pa.string()),
    })


def gen_customer(n: int, rng: np.random.Generator) -> pa.Table:
    seg = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
    return pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n), 2), pa.float64()),
        "c_mktsegment": pa.array(rng.choice(seg, n), pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sfmirror1.0")
    ap.add_argument("--mult", type=int, default=10,
                    help="multiple of sf0.1 row counts (10 ~ sf1.0)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(5000 * args.mult, rng),
                   os.path.join(args.out, "documents.parquet"))
    pq.write_table(gen_embeddings(2000 * args.mult, rng),
                   os.path.join(args.out, "embeddings.parquet"))
    pq.write_table(gen_events(100000 * args.mult, rng),
                   os.path.join(args.out, "events.parquet"))
    n_orders = 150000 * args.mult
    pq.write_table(gen_lineitem(600000 * args.mult, n_orders, rng),
                   os.path.join(args.out, "lineitem.parquet"))
    pq.write_table(gen_orders(n_orders, 15000 * args.mult, rng),
                   os.path.join(args.out, "orders.parquet"))
    pq.write_table(gen_customer(15000 * args.mult, rng),
                   os.path.join(args.out, "customer.parquet"))
    # fixed-size dimension tables: copy the sf0.1 originals verbatim
    import shutil
    for t in ("nation", "region", "part", "supplier"):
        shutil.copy(f"/root/testdata/sf0.1/{t}.parquet",
                    os.path.join(args.out, f"{t}.parquet"))
    print(f"wrote full table mirror x{args.mult} to {args.out}")


if __name__ == "__main__":
    main()
