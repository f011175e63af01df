"""Extra benchmarks for optimization work (guide §1.4): isolate individual
registered queries with the noop sink so the computation is timed, not the
sink, without touching the frozen ``bench.py``.

Usage:
    python bench_extra.py [--sf-dir DIR] [--reps N] [--explain-dir DIR]
                          [--suffix before|after] [query ...]

Prints one JSON line: {"sf_dir": ..., "reps": N, "queries": {name: [secs...]},
"min": {name: sec}}. With --explain-dir, also writes
``<dir>/<query>_<suffix>.txt`` with the formatted physical plan.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_bqloader_spark.plans import QUERIES  # noqa: E402
from go_bqloader_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=[])
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="only capture plans")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="bench_extra", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    names = args.queries or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

    out = {"sf_dir": args.sf_dir, "reps": args.reps, "queries": {}, "min": {}}
    if not args.no_time:
        # same untimed warmup as bench.py so rep 1 doesn't absorb JVM startup
        from go_bqloader_spark.plans.queries import load as _load

        for t in ("documents", "embeddings", "events"):
            _load(spark, args.sf_dir, t).count()
        for name in names:
            samples = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                QUERIES[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            out["queries"][name] = samples
            out["min"][name] = min(samples)
            print(f"# {name}: {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
