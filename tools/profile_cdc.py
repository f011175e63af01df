"""Per-phase profile of the bench cdc_apply merge path (guide §1).

Patches the Spark action boundaries inside LakeTable.merge — the bucketed
write job, the narrow stats read-back collect, fs metadata calls and the
manifest commit — with wall timers, then replays the exact bench workload
(staged feed, N batches, fresh table per rep) and prints a per-phase
breakdown. Diagnostic only; never imported by bench/queries.

Usage: python tools/profile_cdc.py [--events N] [--batches N] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_bqloader_spark.lake import LakeTable  # noqa: E402
from go_bqloader_spark.lake import table as table_mod  # noqa: E402
from go_bqloader_spark.session import build_session  # noqa: E402
from go_bqloader_spark.sources import CHANGE_SCHEMA, gen_changes  # noqa: E402

PAGE_COLS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.time() - t0
            PHASES[name] = PHASES.get(name, 0.0) + dt
            COUNTS[name] = COUNTS.get(name, 0) + 1
    return wrap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2000000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="profile_cdc", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)

    # --- patch the action boundaries -----------------------------------
    orig_finish = LakeTable._finish_merge
    orig_align = LakeTable._align_changes
    orig_manifest = LakeTable.manifest
    orig_write_manifest = LakeTable._write_manifest

    import pyspark.sql.readwriter as rw
    orig_save = rw.DataFrameWriter.parquet
    rw.DataFrameWriter.parquet = timed("write_job", orig_save)
    from pyspark.sql import DataFrame
    orig_collect = DataFrame.collect
    DataFrame.collect = timed("collect_readback", orig_collect)
    LakeTable._align_changes = timed("align", orig_align)
    LakeTable.manifest = timed("manifest_read", orig_manifest)
    LakeTable._write_manifest = timed("manifest_commit", orig_write_manifest)
    orig_listdir = table_mod.LocalFS.listdir
    table_mod.LocalFS.listdir = timed("fs_listdir", orig_listdir)

    feed_work = tempfile.mkdtemp(prefix="prof_cdc_feed_")
    try:
        feed_dir = os.path.join(feed_work, "feed")
        gen_changes(
            spark, args.events, n_urls=max(1000, args.events // 5), n_hosts=200,
            seed=42, partitions=spark.sparkContext.defaultParallelism * 2,
        ).withColumn("batch", F.pmod(F.col("seq"), args.batches)).write.partitionBy(
            "batch").mode("overwrite").parquet(feed_dir)

        for rep in range(args.reps):
            PHASES.clear()
            COUNTS.clear()
            work = tempfile.mkdtemp(prefix="prof_cdc_")
            try:
                table = LakeTable.create(
                    spark, os.path.join(work, "pages"), PAGE_COLS,
                    key=["url", "warc_ts"], n_buckets=2 * cpus,
                )
                t0 = time.time()
                per_batch = []
                for i in range(args.batches):
                    tb = time.time()
                    batch = spark.read.schema(CHANGE_SCHEMA).parquet(
                        f"{feed_dir}/batch={i}")
                    table.merge(batch, batch_key=("bench", i))
                    per_batch.append(round(time.time() - tb, 3))
                wall = time.time() - t0
                accounted = sum(PHASES.values())
                print(json.dumps({
                    "rep": rep, "wall": round(wall, 3),
                    "per_batch": per_batch,
                    "phases": {k: round(v, 3) for k, v in sorted(
                        PHASES.items(), key=lambda kv: -kv[1])},
                    "counts": COUNTS,
                    "accounted": round(accounted, 3),
                    "other_driver": round(wall - accounted, 3),
                }))
            finally:
                shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(feed_work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
