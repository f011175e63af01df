"""Streaming ingest-time dedup for the change feed.

A crawl binlog redelivers pages: verbatim redeliveries (same url+warc_ts,
same seq) are already absorbed by the MERGE ledger/LWW, but *content*
duplicates under DIFFERENT change keys (mirror hosts, url variants) reach
the table unless filtered at ingest. This module drops them in-stream,
before the merge pays for them.

Built-in operators only (no custom state loop — the brief's rule:
Structured Streaming's own dedup operator beats hand-rolled state here):

- fingerprint: ``md5(lower(trim(text)))`` for exact-content dedup, or the
  shuffle-free :func:`~go_bqloader_spark.functions.webtext.simhash_expr`
  for near-dup-tolerant dedup — both pure Catalyst expressions.
- ``dropDuplicatesWithinWatermark([fp])``: keeps the FIRST arrival per
  fingerprint inside the watermark horizon, expires state with the
  watermark — state size is O(distinct fingerprints per horizon), not
  O(stream) (the unbounded ``dropDuplicates`` trap at 10^10 events).

At scale the dedup state shuffles only ``(fingerprint, ts)`` — the wide
page payload stays on the pre-shuffle side of the first-arrival filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def content_fingerprint(text_col: str = "text") -> Column:
    """Exact-content fingerprint: md5 of normalized text (the same
    expression the ``doc_fingerprint`` query verifies against DuckDB)."""
    return F.md5(F.lower(F.trim(F.col(text_col))))


def dedup_stream(
    changes: DataFrame,
    fingerprint: Column | None = None,
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins content dedup on a streaming change feed.

    ``changes`` is the streaming DataFrame of CDC rows (op/seq + page
    columns). Delete events (NULL text) pass through untouched — a
    tombstone must reach the merge even if its content was a duplicate.
    Returns a stream with the same schema; feed it to
    ``start_cdc_stream`` as usual.
    """
    fp = fingerprint if fingerprint is not None else content_fingerprint()
    wm = changes.withWatermark(ts_col, watermark)
    dedupable = (
        wm.filter(F.col("text").isNotNull())
        .withColumn("__fp", fp)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
    passthrough = wm.filter(F.col("text").isNull())
    return dedupable.unionByName(passthrough)
