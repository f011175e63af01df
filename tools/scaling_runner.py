"""One scaling-bench leg: apply a pre-staged change feed into a fresh lake
table at the parallelism of the ambient Spark master. Launched via
spark-submit (the production path); prints one JSON line.

Args: <feed_dir> <n_batches> <n_buckets> <work_dir>
"""

import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession

from go_bqloader_spark.functions.webtext import project_page_batch
from go_bqloader_spark.lake import LakeTable
from go_bqloader_spark.sources.datagen import CHANGE_SCHEMA

feed_dir, n_batches, n_buckets, work = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism

table = LakeTable.create(
    spark,
    f"{work}/pages_{cores}",
    [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
        ("n_tokens", "int"),
        ("stop_ratio", "double"),
    ],
    key=["url", "warc_ts"],
    n_buckets=n_buckets,
)
t0 = time.time()
n_events = 0
for i in range(n_batches):
    batch = spark.read.schema(CHANGE_SCHEMA).parquet(f"{feed_dir}/batch={i}")
    # full ingest pipeline: project (decode/extract/normalize/fingerprint —
    # the reference's Projector stage + document fingerprinting) THEN merge
    stats = table.merge(project_page_batch(batch), batch_key=("scale", i))
    n_events += stats.rows_upserted + stats.rows_deleted
wall = time.time() - t0
# executor CPU/run/GC totals via the REST API: CPU-seconds are robust to
# hypervisor noise (steal/frequency hits wall, not guest thread CPU), so
# cpu_per_event across levels measures the ENGINE's parallel overhead.
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete"))
cpu = sum(st["executorCpuTime"] for st in stages) / 1e9
run = sum(st["executorRunTime"] for st in stages) / 1e3
gc = sum(st["jvmGcTime"] for st in stages) / 1e3
final_rows = table.read().count()
print(
    json.dumps(
        {
            "cores": cores,
            "wall_sec": round(wall, 3),
            "applied_winners": n_events,
            "final_rows": final_rows,
            "executor_cpu_sec": round(cpu, 1),
            "executor_run_sec": round(run, 1),
            "gc_sec": round(gc, 1),
        }
    )
)
