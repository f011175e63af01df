"""Deterministic synthetic binlog/WAL change feed for Common-Crawl-style pages.

Per BASELINE.json ``input_hint`` the engine's input is an Iceberg-shaped
table of web pages ``(url, warc_ts, html binary, text, lang)``; the change
feed adds ``(op, seq, commit_ts)``. The reference's event source is one
storage-object-finalize event per file (``/root/reference/event.go:12-19``,
at-least-once from Cloud Functions); this generator produces the
generalization: a totally-ordered change log with

- **Zipf-skewed hot domains** (a few hosts receive most updates — the skew
  the salted repartition must absorb),
- **duplicate deliveries** (same ``seq`` re-emitted verbatim, mirroring the
  reference's at-least-once redelivery),
- **late / out-of-order events** (``commit_ts`` lags ``seq`` order),
- a **schema-evolution point** (``lang`` is NULL before ``evolve_at``).

Everything is a pure function of ``seq`` via ``xxhash64`` — fully
distributed (``spark.range``), seeded, wall-clock-free, so any two runs (or
the oracle) regenerate byte-identical data at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_bqloader_spark.functions.webtext import extract_text, make_html

CHANGE_SCHEMA = (
    "op string, seq bigint, commit_ts timestamp, url string, "
    "warc_ts timestamp, html binary, text string, lang string"
)

_BASE_TS = "2024-01-01 00:00:00"
_LANGS = ["en", "ja", "de", "fr", "es", "zh", "ru", "pt"]


def _u(seed: int, tag: str, col: Column) -> Column:
    """Deterministic uniform in [0, 1) derived from (seed, tag, col)."""
    h = F.xxhash64(F.lit(seed), F.lit(tag), col)
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def _h(seed: int, tag: str, col: Column, mod: int) -> Column:
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), col), F.lit(mod))


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    n_hosts: int = 100,
    seed: int = 42,
    dup_pct: int = 5,
    late_pct: int = 5,
    skew: float = 3.0,
    evolve_at: int | None = None,
    partitions: int | None = None,
    fill_repeat: int = 8,
) -> DataFrame:
    """Generate ``n_events`` change events (including ~dup_pct% duplicates).

    A duplicate is a verbatim redelivery: two rows with the same ``seq`` are
    identical in every column because every column is a function of ``seq``.
    """
    if n_urls is None:
        n_urls = max(10, n_events // 4)
    if evolve_at is None:
        evolve_at = (2 * n_events) // 3

    rng = spark.range(0, n_events, 1, partitions) if partitions else spark.range(n_events)
    rid = F.col("id")

    # ~dup_pct% of rows redeliver an earlier seq (never negative).
    is_dup = (_h(seed, "dup", rid, 100) < dup_pct) & (rid > 50)
    seq = F.when(is_dup, rid - (_h(seed, "dupoff", rid, 50) + 1)).otherwise(rid)

    # key selection: u^skew concentrates mass near 0 → hot keys/domains
    u_key = _u(seed, "key", seq)
    key_id = F.least(
        F.floor(F.pow(u_key, F.lit(skew)) * n_urls).cast("bigint"), F.lit(n_urls - 1)
    )
    u_host = _u(seed, "host", key_id)
    host_id = F.least(
        F.floor(F.pow(u_host, F.lit(2.0)) * n_hosts).cast("bigint"), F.lit(n_hosts - 1)
    )
    url = F.concat(
        F.lit("https://host"),
        host_id.cast("string"),
        F.lit(".example.com/p/"),
        key_id.cast("string"),
    )

    # few captures per url; (url, warc_ts) is the change key
    capture = _h(seed, "cap", seq, 3)
    warc_ts = F.to_timestamp(F.lit(_BASE_TS)) + F.make_interval(
        hours=(key_id % 240).cast("int"), mins=(capture * 17).cast("int")
    )

    # op mix: 60% I, 30% U, 10% D
    opr = _h(seed, "op", seq, 100)
    op = F.when(opr < 60, "I").when(opr < 90, "U").otherwise("D")

    # commit time mostly follows seq order; ~late_pct% arrive very late
    late = _h(seed, "late", seq, 100) < late_pct
    late_by = F.when(late, _h(seed, "lateoff", seq, 3600)).otherwise(F.lit(0))
    commit_ts = F.to_timestamp(F.lit(_BASE_TS)) + F.make_interval(
        secs=(seq - late_by).cast("double")
    )

    title = F.concat(F.lit("Page "), key_id.cast("string"))
    body = F.concat(
        F.lit("content of page "),
        key_id.cast("string"),
        F.lit(" revision "),
        seq.cast("string"),
        F.lit(" "),
        F.repeat(F.concat(F.lit("w"), _h(seed, "fill", seq, 10).cast("string")), fill_repeat),
    )
    html = make_html(title, body)
    lang = F.when(
        seq >= evolve_at,
        F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (_h(seed, "lang", key_id, len(_LANGS)) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    df = rng.select(
        op.alias("op"),
        seq.alias("seq"),
        commit_ts.alias("commit_ts"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.when(op == "D", F.lit(None).cast("binary")).otherwise(html).alias("html"),
        lang.alias("lang"),
    )
    # text is by construction the deterministic extraction of html
    return df.select(
        "op",
        "seq",
        "commit_ts",
        "url",
        "warc_ts",
        "html",
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .otherwise(extract_text(F.col("html")))
        .alias("text"),
        "lang",
    )


def expected_final_state(changes: DataFrame) -> DataFrame:
    """Replay oracle: last-writer-wins per (url, warc_ts) by seq; drop 'D'.

    This is the semantic contract the MERGE engine must converge to for ANY
    batch split / ordering / redelivery of ``changes`` — the analog of the
    reference's golden end-to-end matrices (``bqloader_test.go:13-77``).
    Expressed as one window rank so it is also DuckDB-checkable.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("url", "warc_ts").orderBy(F.col("seq").desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select("url", "warc_ts", "html", "text", "lang", F.col("seq").alias("_seq"))
    )
