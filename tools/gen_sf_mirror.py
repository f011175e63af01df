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
    print(f"wrote documents/embeddings/events x{args.mult} to {args.out}")


if __name__ == "__main__":
    main()
