"""Ingest-time corpus hygiene for the CDC stream.

Two projector factories for ``start_cdc_stream(projector=...)`` — they
run per micro-batch inside ``foreachBatch``, upstream of the merge, so a
page that fails the filters never reaches the table (vs
``lake.maintenance.quality_rewrite``, the corpus-level pass that removes
offenders retroactively through tombstones). The split mirrors the rest
of the pipeline: ingest-time passes are per-document (no corpus state),
maintenance passes see the whole table.

Design rules:
- **tombstones always pass** — a delete must never be dropped by a
  content filter (the r4 ADVICE lesson from ``streaming/dedup.py``);
- **the text byte-invariant survives scrubbing**: ``pii_scrub_projector``
  redacts the HTML payload and RE-DERIVES ``text = extract_text(html)``,
  so ``text == extract_text(html)`` holds by construction after the
  projector (redaction tokens are bracket-free so the tag stripper
  cannot eat them);
- per-document only: the repetition filter is the Gopher-style
  within-doc pass from ``operators/textpipeline.py`` keyed by ``seq``
  (unique per change event), one narrow anti-join per micro-batch —
  the wide payload never enters the verdict aggregation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from go_bqloader_spark.functions.webtext import extract_text
from go_bqloader_spark.operators.textpipeline import (
    EMAIL_RE,
    PHONE_RE,
    repetition_stats,
)


def quality_filter_projector(
    dup_ratio_max_e6: int = 300_000,
    top_bigram_max_e6: int = 180_000,
    text_col: str = "text",
) -> Callable[[DataFrame], DataFrame]:
    """Drop low-quality upserts at ingest (Gopher-style repetition
    filters); deletes and NULL/short-text rows pass through untouched.

    The verdict side carries only ``(seq, n-gram counts)`` — the page
    payload stays on the main branch and meets the verdicts in one
    LEFT ANTI join on ``seq``."""

    def project(batch: DataFrame) -> DataFrame:
        candidates = batch.where(
            (F.col("op") != "D") & F.col(text_col).isNotNull()
        )
        flagged = (
            repetition_stats(
                candidates,
                id_col="seq",
                text_col=text_col,
                dup_ratio_max_e6=dup_ratio_max_e6,
                top_bigram_max_e6=top_bigram_max_e6,
            )
            .where("low_quality")
            .select("seq")
        )
        return batch.join(flagged, "seq", "left_anti")

    return project


def pii_scrub_projector(
    email_token: str = "xEMAILx",
    phone_token: str = "xPHONEx",
    html_col: str = "html",
    text_col: str = "text",
) -> Callable[[DataFrame], DataFrame]:
    """Redact emails/phones from the page payload at ingest.

    The HTML bytes are redacted (decode → regex replace → re-encode) and
    ``text`` is RE-DERIVED as ``extract_text(html)``, so the engine's
    ``text == extract_text(html)`` byte-invariant holds by construction
    on every scrubbed row. Rows with a NULL payload get their ``text``
    redacted directly (nothing to re-derive from). Tokens default to
    bracket-free markers because ``extract_text``'s tag stripper would
    swallow ``<EMAIL>``-style tokens.

    Pure projection — zero shuffles, zero state; safe at any rate."""

    def scrub(col: F.Column) -> F.Column:
        return F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, email_token),
            PHONE_RE,
            phone_token,
        )

    def project(batch: DataFrame) -> DataFrame:
        html = F.col(html_col)
        new_html = F.when(
            html.isNotNull(),
            F.encode(scrub(F.decode(html, "UTF-8")), "UTF-8"),
        )
        out = batch.withColumn(html_col, new_html)
        new_text = (
            F.when(F.col(html_col).isNotNull(), extract_text(html_col))
            .otherwise(scrub(F.col(text_col)))
        )
        return out.withColumn(
            text_col,
            F.when(F.col(text_col).isNotNull(), new_text),
        )

    return project


def domain_quota_projector(
    max_per_domain: int = 1000,
    url_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
) -> Callable[[DataFrame], DataFrame]:
    """Per-site politeness/diversity cap at ingest: keep at most
    ``max_per_domain`` upserts per registrable ("eTLD+1") domain per
    micro-batch, lowest ``seq`` first — the standard guard against a
    single hot site (or a crawler trap) flooding a corpus snapshot.
    Deletes always pass (they retract state; capping them would strand
    live rows).

    Deterministic: the winner set depends only on ``(domain, seq)``, so
    a replayed micro-batch keeps the same rows and the exactly-once
    ledger semantics hold end to end.

    Scale shape: the rank runs on a narrow ``(seq, domain)`` projection
    (``row_number`` under ``partitionBy(domain) orderBy(seq)`` — state
    is one counter per domain, and with a WindowGroupLimit-style early
    stop the heavy tail is bounded); the page payload stays on the main
    branch and meets the verdicts in one LEFT SEMI join on ``seq``,
    exactly like :func:`quality_filter_projector`.
    """
    from go_bqloader_spark.functions.urlnorm import host_of, registrable_domain

    from pyspark.sql import Window as W

    def project(batch: DataFrame) -> DataFrame:
        upserts = batch.where(F.col(op_col) != "D")
        w = W.partitionBy("__dom").orderBy(seq_col)
        winners = (
            upserts.select(
                seq_col, registrable_domain(host_of(url_col)).alias("__dom")
            )
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_per_domain)
            .select(seq_col)
        )
        kept = upserts.join(winners, seq_col, "leftsemi")
        return kept.unionByName(batch.where(F.col(op_col) == "D"))

    return project
