"""One scaling-bench leg: apply a pre-staged change feed into a fresh lake
table at the parallelism of the ambient Spark master. Launched via
spark-submit (the production path); prints one JSON line.

Args: <feed_dir> <n_batches> <n_buckets> <work_dir>
"""

import json
import sys
import time

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
        ("fingerprint", "bigint"),
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
    stats = table.merge(project_page_batch(batch, with_fingerprint=True), batch_key=("scale", i))
    n_events += stats.rows_upserted + stats.rows_deleted
wall = time.time() - t0
final_rows = table.read().count()
print(
    json.dumps(
        {
            "cores": cores,
            "wall_sec": round(wall, 3),
            "applied_winners": n_events,
            "final_rows": final_rows,
        }
    )
)
