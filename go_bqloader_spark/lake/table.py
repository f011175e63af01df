"""Snapshot-versioned lake table: the engine's Iceberg-compatible sink.

The north-star sink is an Iceberg table (``MERGE INTO`` + snapshot commits).
This container has no Iceberg runtime jar, so the engine ships a
parquet-backed table format with the same guarantees behind the same
interface (SURVEY.md §7 names this exact fallback):

- **Atomic snapshot commits** — every mutation writes new immutable data
  files plus a new JSON manifest, then atomically swaps a ``LATEST`` pointer
  (``os.replace``). Readers see either the old or the new snapshot, never a
  mix. Time travel = read any retained manifest version.
- **Bucket partitioning + pruning** — rows are hash-bucketed on ``url``
  (``pmod(xxhash64(url), n_buckets)``, the Iceberg ``bucket(N, url)``
  transform). A MERGE rewrites only the buckets its change batch touches;
  untouched buckets carry over by manifest reference — the copy-on-write
  analog of Iceberg file-level pruning. At 10^10 rows with n_buckets=4096 a
  batch touching 3 domains rewrites a handful of buckets, not the table.
- **Exactly-once offset ledger** — the manifest embeds the set of applied
  ``(query_id, batch_id)`` keys; a MERGE whose batch key is already present
  is a no-op. Because the ledger entry and the data rewrite land in ONE
  atomic pointer swap, redelivered batches (Spark ``foreachBatch`` is
  at-least-once) cannot double-apply. The reference has no such protection
  (duplicate event ⇒ duplicate rows, ``/root/reference/loader.go:33-60``).
- **Schema evolution** — fields carry stable ids (Iceberg-style); add /
  rename are manifest-only commits; old data files are reconciled on read
  by id→current-name mapping with NULL fill.
- **Lineage metrics** — every commit appends per-bucket applied-offset
  watermarks and row counts to ``_metrics/`` (the Notifier analog,
  ``/root/reference/notifier.go:17-19``); resumable replay = max applied
  seq per bucket.

MERGE itself is shuffle-minimal: changes are reduced to one winner per key
by a salted two-phase LWW dedup (operators.merge), then the surviving
target rows are computed by ONE window over (existing ∪ winners) within the
affected buckets — no join, one shuffle on the change key. Delete = winner
with op='D' drops the key; insert/update = winner row becomes the row.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_bqloader_spark.operators.merge import lww_dedup, salted_lww_dedup

SEQ_COL = "_seq"
DELETED_COL = "_deleted"
_MANIFESTS = "_manifests"
_LATEST = "LATEST"

_DDL_TO_SPARK = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _spark_type(ddl: str) -> T.DataType:
    return _DDL_TO_SPARK[ddl]


@dataclass
class MergeStats:
    version: int
    skipped: bool
    affected_buckets: list[int]
    rows_upserted: int
    rows_deleted: int
    max_seq: int | None


class LakeTable:
    """A snapshot-versioned, bucket-partitioned upsert table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- create
    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        columns: list[tuple[str, str]],
        key: list[str] | None = None,
        n_buckets: int = 32,
        bucket_col: str = "url",
    ) -> "LakeTable":
        """Create an empty table. ``columns`` = [(name, ddl_type), ...].

        The engine column ``_seq`` (last applied change seq per row) is
        always appended — it is both the LWW tiebreaker on merge and the
        per-row lineage watermark.
        """
        key = key or ["url", "warc_ts"]
        os.makedirs(os.path.join(path, _MANIFESTS), exist_ok=True)
        fields = [
            {"id": i + 1, "name": n, "type": t} for i, (n, t) in enumerate(columns)
        ]
        fields.append({"id": 0, "name": SEQ_COL, "type": "bigint"})
        # tombstone marker: deletes persist as hidden rows so that a
        # late-replayed OLDER insert/update cannot resurrect a deleted key
        # (the CDC tombstone problem; read() hides them, compaction expires
        # them once the replay watermark has passed their seq)
        fields.append({"id": -1, "name": DELETED_COL, "type": "boolean"})
        manifest = {
            "format_version": 1,
            "version": 0,
            "parent": None,
            "schema_version": 0,
            "schemas": {"0": fields},
            "key": key,
            "bucket_col": bucket_col,
            "n_buckets": n_buckets,
            "buckets": {},
            "ledger": {},
            "summary": {"operation": "create"},
        }
        t = LakeTable(spark, path)
        t._write_manifest(manifest, expected_parent=None)
        return t

    # ---------------------------------------------------------- manifests
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFESTS, f"v{version:08d}.json")

    def current_version(self) -> int:
        with open(os.path.join(self.path, _MANIFESTS, _LATEST)) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            version = self.current_version()
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict[str, Any]]:
        out = []
        v = self.current_version()
        while v is not None:
            m = self.manifest(v)
            out.append({"version": m["version"], "summary": m["summary"]})
            v = m["parent"]
        return list(reversed(out))

    def _write_manifest(self, manifest: dict[str, Any], expected_parent: int | None) -> None:
        """Commit a manifest with optimistic concurrency + atomic swap."""
        latest = os.path.join(self.path, _MANIFESTS, _LATEST)
        if expected_parent is not None:
            current = self.current_version()
            if current != expected_parent:
                raise RuntimeError(
                    f"concurrent commit detected: expected parent {expected_parent}, "
                    f"found {current}"
                )
        mpath = self._manifest_path(manifest["version"])
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        tmp = latest + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(manifest["version"]))
        os.replace(tmp, latest)  # atomic on POSIX — the snapshot commit point

    # -------------------------------------------------------------- schema
    def schema_fields(self, m: dict[str, Any] | None = None) -> list[dict[str, Any]]:
        m = m or self.manifest()
        return m["schemas"][str(m["schema_version"])]

    def spark_schema(self, m: dict[str, Any] | None = None) -> T.StructType:
        return T.StructType(
            [T.StructField(f["name"], _spark_type(f["type"])) for f in self.schema_fields(m)]
        )

    def add_column(self, name: str, ddl_type: str) -> None:
        m = self.manifest()
        fields = [dict(f) for f in self.schema_fields(m)]
        if any(f["name"] == name for f in fields):
            raise ValueError(f"column {name} exists")
        new_id = max(f["id"] for f in fields) + 1
        # keep the engine columns (_seq, _deleted) last
        fields.insert(len(fields) - 2, {"id": new_id, "name": name, "type": ddl_type})
        self._commit_schema(m, fields, f"add column {name} {ddl_type}")

    def rename_column(self, old: str, new: str) -> None:
        m = self.manifest()
        fields = [dict(f) for f in self.schema_fields(m)]
        for f in fields:
            if f["name"] == old:
                f["name"] = new
                break
        else:
            raise ValueError(f"no column {old}")
        self._commit_schema(m, fields, f"rename {old} -> {new}")

    def _commit_schema(self, m: dict[str, Any], fields: list[dict], op: str) -> None:
        sv = m["schema_version"] + 1
        m2 = dict(m)
        m2["schemas"] = dict(m["schemas"], **{str(sv): fields})
        m2["schema_version"] = sv
        m2["parent"] = m["version"]
        m2["version"] = m["version"] + 1
        m2["summary"] = {"operation": op}
        self._write_manifest(m2, expected_parent=m["version"])

    # ---------------------------------------------------------------- read
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Read a snapshot, reconciling old-schema files by field id.

        Tombstone rows (``_deleted``) are hidden unless requested.
        """
        m = self.manifest(version)
        current = self.schema_fields(m)
        groups: dict[str, list[str]] = {}
        for b, entries in m["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            for e in entries:
                groups.setdefault(str(e["schema_version"]), []).append(
                    os.path.join(self.path, e["path"])
                )
        if not groups:
            empty = self.spark.createDataFrame([], self.spark_schema(m))
            return empty if include_deleted else empty.drop(DELETED_COL)
        parts = []
        for sv, paths in groups.items():
            file_fields = {f["id"]: f for f in m["schemas"][sv]}
            df = self.spark.read.parquet(*paths)
            cols = []
            for f in current:
                old = file_fields.get(f["id"])
                if old is not None:
                    cols.append(F.col(old["name"]).alias(f["name"]))
                else:
                    cols.append(F.lit(None).cast(_spark_type(f["type"])).alias(f["name"]))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if not include_deleted:
            out = out.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(
                DELETED_COL
            )
        return out

    # --------------------------------------------------------------- merge
    def _bucket_expr(self, m: dict[str, Any]) -> F.Column:
        return F.pmod(F.xxhash64(F.col(m["bucket_col"])), F.lit(m["n_buckets"])).cast("int")

    def committed(self, query_id: str, batch_id: int) -> bool:
        return str(batch_id) in self.manifest()["ledger"].get(query_id, {})

    def merge(
        self,
        changes: DataFrame,
        batch_key: tuple[str, int] | None = None,
        salted: bool = True,
        n_salts: int = 16,
    ) -> MergeStats:
        """Apply a change batch: LWW upsert + delete, exactly-once.

        ``changes`` columns: ``op ('I'|'U'|'D'), seq`` + the table's data
        columns (missing data columns are treated as NULL — this is how a
        pre-evolution replay writes a post-evolution schema).
        """
        m = self.manifest()
        version = m["version"]
        if batch_key is not None:
            qid, bid = batch_key
            if str(bid) in m["ledger"].get(qid, {}):
                return MergeStats(version, True, [], 0, 0, None)

        key = m["key"]
        fields = self.schema_fields(m)
        engine_cols = (SEQ_COL, DELETED_COL)
        data_cols = [f["name"] for f in fields if f["name"] not in engine_cols]

        # normalize change columns to the current schema (NULL-fill absent)
        proj = [F.col("op"), F.col("seq")]
        for f in fields:
            if f["name"] in engine_cols:
                continue
            if f["name"] in changes.columns:
                proj.append(F.col(f["name"]))
            else:
                proj.append(F.lit(None).cast(_spark_type(f["type"])).alias(f["name"]))
        changes = changes.select(*proj)

        if salted:
            winners = salted_lww_dedup(changes, key=key, order_col="seq", n_salts=n_salts)
        else:
            winners = lww_dedup(changes, key=key, order_col="seq")
        winners = winners.withColumn("__b", self._bucket_expr(m)).persist()

        affected = sorted(
            r["__b"] for r in winners.select("__b").distinct().collect()
        )
        if not affected:
            winners.unpersist()
            return self._commit_noop(m, batch_key)

        existing = self.read(buckets=affected, include_deleted=True).withColumn(
            "__b", self._bucket_expr(m)
        )
        # existing rows join the race as op='E' (live) or op='D' (tombstone)
        # with their stored _seq; one window decides every key's survivor.
        # A winning 'D' persists as a tombstone so a late-replayed older
        # update cannot resurrect the key.
        ex = existing.select(
            F.when(F.col(DELETED_COL), F.lit("D")).otherwise(F.lit("E")).alias("op"),
            F.col(SEQ_COL).alias("seq"),
            *data_cols,
            "__b",
        )
        all_rows = ex.unionByName(winners.select("op", "seq", *data_cols, "__b"))
        w = W.partitionBy(*key).orderBy(F.col("seq").desc(), F.col("op").asc())
        survivors = (
            all_rows.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                *data_cols,
                F.col("seq").alias(SEQ_COL),
                (F.col("op") == "D").alias(DELETED_COL),
                F.col("__b").alias("b"),
            )
        )

        commit_id = uuid.uuid4().hex[:12]
        rel = os.path.join("data", f"c{m['version'] + 1:08d}_{commit_id}")
        out_dir = os.path.join(self.path, rel)
        (
            survivors.repartition(max(len(affected), 1), F.col("b"))
            .write.partitionBy("b")
            .mode("overwrite")
            .parquet(out_dir)
        )

        # ---- lineage metrics (Notifier analog): per-bucket applied offsets
        stats_rows = (
            winners.groupBy("__b")
            .agg(
                F.max("seq").alias("applied_max_seq"),
                F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("rows_upserted"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_deleted"),
            )
            .collect()
        )
        winners.unpersist()
        rows_upserted = sum(r["rows_upserted"] for r in stats_rows)
        rows_deleted = sum(r["rows_deleted"] for r in stats_rows)
        max_seq = max((r["applied_max_seq"] for r in stats_rows), default=None)
        self._write_metrics(m["version"] + 1, batch_key, stats_rows)

        # ---- new manifest: replace affected buckets, carry the rest over
        new_buckets = {
            b: entries for b, entries in m["buckets"].items() if int(b) not in affected
        }
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(out_dir)
            if d.startswith("b=")
        }
        for b in sorted(written):
            new_buckets[str(b)] = [
                {"path": os.path.join(rel, f"b={b}"), "schema_version": m["schema_version"]}
            ]
        for b in affected:
            if b not in written:
                new_buckets.pop(str(b), None)  # bucket fully deleted

        ledger = {q: dict(v) for q, v in m["ledger"].items()}
        if batch_key is not None:
            ledger.setdefault(batch_key[0], {})[str(batch_key[1])] = max_seq
        m2 = dict(
            m,
            version=m["version"] + 1,
            parent=m["version"],
            buckets=new_buckets,
            ledger=ledger,
            summary={
                "operation": "merge",
                "affected_buckets": affected,
                "rows_upserted": rows_upserted,
                "rows_deleted": rows_deleted,
                "max_seq": max_seq,
            },
        )
        self._write_manifest(m2, expected_parent=version)
        return MergeStats(
            m2["version"], False, affected, rows_upserted, rows_deleted, max_seq
        )

    def _commit_noop(self, m: dict[str, Any], batch_key: tuple[str, int] | None) -> MergeStats:
        ledger = {q: dict(v) for q, v in m["ledger"].items()}
        if batch_key is not None:
            ledger.setdefault(batch_key[0], {})[str(batch_key[1])] = None
        m2 = dict(
            m,
            version=m["version"] + 1,
            parent=m["version"],
            ledger=ledger,
            summary={"operation": "merge", "affected_buckets": [], "rows_upserted": 0, "rows_deleted": 0},
        )
        self._write_manifest(m2, expected_parent=m["version"])
        return MergeStats(m2["version"], False, [], 0, 0, None)

    # -------------------------------------------------------------- metrics
    def _write_metrics(
        self,
        version: int,
        batch_key: tuple[str, int] | None,
        stats_rows: list,
    ) -> None:
        if not stats_rows:
            return
        qid, bid = batch_key if batch_key else ("", -1)
        schema = T.StructType(
            [
                T.StructField("commit_version", T.LongType()),
                T.StructField("query_id", T.StringType()),
                T.StructField("batch_id", T.LongType()),
                T.StructField("bucket", T.IntegerType()),
                T.StructField("applied_max_seq", T.LongType()),
                T.StructField("rows_upserted", T.LongType()),
                T.StructField("rows_deleted", T.LongType()),
            ]
        )
        rows = [
            (version, qid, bid, int(r["__b"]), r["applied_max_seq"], r["rows_upserted"], r["rows_deleted"])
            for r in stats_rows
        ]
        (
            self.spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(self.path, "_metrics"))
        )

    def metrics(self) -> DataFrame:
        p = os.path.join(self.path, "_metrics")
        if not os.path.exists(p):
            return self.spark.createDataFrame(
                [], "commit_version bigint, query_id string, batch_id bigint, "
                "bucket int, applied_max_seq bigint, rows_upserted bigint, rows_deleted bigint"
            )
        return self.spark.read.parquet(p)

    def resume_watermarks(self) -> dict[int, int]:
        """Per-bucket max applied seq — the resumable-replay watermark."""
        rows = (
            self.metrics()
            .groupBy("bucket")
            .agg(F.max("applied_max_seq").alias("w"))
            .collect()
        )
        return {r["bucket"]: r["w"] for r in rows}
