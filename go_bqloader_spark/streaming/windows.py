"""Watermarked event-time windowed aggregation over the change stream.

The reference has no streaming operators (SURVEY.md §2.4); the engine adds
the standard set for pipeline observability: tumbling-window ingest metrics
with a watermark bounding state for late events. Late rows inside the
watermark still update their window; rows later than the watermark are
dropped FROM THE METRICS ONLY — the MERGE path never drops late data (LWW
converges instead), which is why metrics and apply are separate sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_metrics(
    changes: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "5 minutes",
    time_col: str = "commit_ts",
) -> DataFrame:
    """Per-(event-time window, op) ingest rates: counts, distinct-key
    estimate, and offset watermarks. Works on a stream (bounded state via
    the watermark) and identically on a batch DataFrame (for replay
    backfills of the metrics table)."""
    win = F.window(time_col, window, slide) if slide else F.window(time_col, window)
    src = changes
    if changes.isStreaming:
        src = changes.withWatermark(time_col, watermark)
    return (
        src.groupBy(win.alias("win"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("url").alias("approx_keys"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "approx_keys",
            "min_seq",
            "max_seq",
        )
    )
