"""Session windows + custom stateful operators over the change stream.

Two complementary surfaces (the reference has no streaming operators at
all — SURVEY.md §2.4 — these complete the engine's streaming set):

- :func:`session_window_metrics` — built-in ``F.session_window`` (dynamic
  gap-based windows, state bounded by the watermark). Stays fully
  JVM-side; use it whenever "session" means activity separated by a gap.
- :func:`stateful_host_progress` — ``applyInPandasWithState``: the escape
  hatch for custom per-key streaming state Spark's built-ins can't
  express. Demonstrated here as per-host replay progress (running max
  applied seq + event count, emitted every micro-batch) — the streaming
  twin of the lake table's ``resume_watermarks()``. State is one tiny row
  per key; Arrow moves grouped batches, never row-at-a-time Python.

At 100 TB both operators shuffle only ``(key, small aggregates)`` — the
wide html/text payload is projected away before the stateful exchange.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_metrics(
    changes: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "commit_ts",
    key_col: str = "url",
) -> DataFrame:
    """Per-key session activity: a silence of ``gap`` closes the session.

    Works identically on a stream (append-mode emission once the watermark
    passes a session's end; state bounded) and on a batch DataFrame (the
    replay/backfill path — same ``session_window`` expression)."""
    src = changes
    if changes.isStreaming:
        src = changes.withWatermark(time_col, watermark)
    return (
        src.groupBy(F.session_window(time_col, gap).alias("sw"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
            "max_seq",
        )
    )


_PROGRESS_OUT = "host string, max_seq bigint, n_events bigint, n_batches int"
_PROGRESS_STATE = "max_seq bigint, n_events bigint, n_batches int"


def _progress_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_seq, n_events, n_batches = state.get
    else:
        max_seq, n_events, n_batches = -1, 0, 0
    for pdf in pdfs:
        if len(pdf):
            max_seq = max(max_seq, int(pdf["seq"].max()))
            n_events += len(pdf)
    n_batches += 1
    state.update((max_seq, n_events, n_batches))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "max_seq": [max_seq],
            "n_events": [n_events],
            "n_batches": [n_batches],
        }
    )


def stateful_host_progress(
    changes: DataFrame,
    host_col: Any = None,
) -> DataFrame:
    """Custom stateful operator: per-host running replay progress.

    ``applyInPandasWithState`` keeps one tiny state row per host and emits
    the updated progress each micro-batch (update output mode). The input
    is projected to ``(host, seq)`` FIRST so only 16-byte rows reach the
    stateful shuffle — never the page payload."""
    host = (
        host_col
        if host_col is not None
        # no trailing slash in the pattern: bare-host URLs
        # (https://example.com) must extract the host too, not collapse
        # into one empty-host state group
        else F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    )
    narrow = changes.select(host.alias("host"), F.col("seq"))
    return narrow.groupBy("host").applyInPandasWithState(
        _progress_fn,
        outputStructType=_PROGRESS_OUT,
        stateStructType=_PROGRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
