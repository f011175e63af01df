"""Reference-parity vectorized transforms (the ``Projector`` library).

Each function here reproduces, column-vectorized and JVM-side, one of the
per-row Go projector behaviors catalogued in SURVEY.md §2.2 (T1-T10). The
reference applies these row-at-a-time inside goroutine batches
(``/root/reference/handler.go:141-186``); here they are plain Catalyst
column expressions, so they stay inside whole-stage codegen — no Python in
the hot path at all.

All functions take and return ``pyspark.sql.Column`` so they compose into a
single projection (one ``select``), exactly like the reference composes
projector closures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_number(col: Column | str) -> Column:
    """T5 — CleanNumber (``/root/reference/contrib/handlers/handlers.go:36-51``).

    Keep digits and ``.``; keep ``-`` only when it is the first character of
    the original string; a result of exactly ``-`` becomes ``""``.
    Golden cases (``handlers_test.go:80-90``): ``¥12345-`` → ``12345``,
    ``-12,345`` → ``-12345``, ``306.4800USD`` → ``306.4800``, ``-`` → ``""``.

    Implemented without lookahead so an identical RE2-safe formulation runs
    in the DuckDB oracle: strip everything outside ``[0-9.]``, then re-apply
    a leading ``-`` if the original started with one.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^0-9.]", "")
    signed = F.when(c.startswith("-"), F.concat(F.lit("-"), stripped)).otherwise(
        stripped
    )
    return F.when(signed == "-", F.lit("")).otherwise(signed)


def normalize_date(col: Column | str, fmt: str = "yyyy/MM/dd") -> Column:
    """T1 — date normalize ``yyyy/MM/dd`` → ``yyyy-MM-dd``.

    Reference: ``/root/reference/contrib/handlers/sbi_sumishin_net_bank.go:16-21``
    (Go ``time.Parse("2006/01/02")`` then ISO format). Unparseable input
    yields NULL (the Go version aborts the load; the engine surfaces NULLs
    to a quarantine filter instead — see operators.merge).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.try_to_date(c, fmt), "yyyy-MM-dd")


def normalize_date_compact(col: Column | str) -> Column:
    """T2 — ``yyyyMMdd`` → ``yyyy-MM-dd``
    (``/root/reference/contrib/handlers/rakuten_bank.go:16-21``)."""
    return normalize_date(col, "yyyyMMdd")


def normalize_date_kanji(col: Column | str) -> Column:
    """T3 — Japanese-locale ``2006年01月02日`` → ``yyyy-MM-dd``
    (``/root/reference/contrib/handlers/sony_bank.go:16-21``).

    DateTimeFormatter accepts quoted literal text, so the kanji delimiters
    are matched directly — still a JVM-side expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.try_to_date(c, "yyyy'年'MM'月'dd'日'"), "yyyy-MM-dd")


# Era bases from /root/reference/contrib/handlers/smbc.go:24-31:
# Heisei N -> 1988+N, Reiwa N -> 2018+N. Showa is explicitly unsupported.
_ERA_BASE = {"H": 1988, "R": 2018}


def parse_era_date(col: Column | str) -> Column:
    """T4 — wareki (era) date parse
    (``/root/reference/contrib/handlers/smbc.go:15-41``).

    Accepts non-padded Gregorian ``yyyy/M/d`` OR the 9-char era form
    ``[HR]NN.MM.DD`` (H=Heisei base 1988, R=Reiwa base 2018). Anything else
    (including Showa ``S``) is NULL, mirroring the reference's error path.
    Returns ``yyyy-MM-dd`` strings. Pure Catalyst expression: regex branch +
    ``make_date``.
    """
    c = F.col(col) if isinstance(col, str) else col
    gregorian = F.date_format(F.try_to_date(c, "yyyy/M/d"), "yyyy-MM-dd")
    era_letter = F.substring(c, 1, 1)
    era_year = F.substring(c, 2, 2).cast("int")
    era_month = F.substring(c, 5, 2).cast("int")
    era_day = F.substring(c, 8, 2).cast("int")
    era_base = (
        F.when(era_letter == "H", F.lit(_ERA_BASE["H"]))
        .when(era_letter == "R", F.lit(_ERA_BASE["R"]))
        .otherwise(F.lit(None).cast("int"))
    )
    # build the Gregorian string then try_to_date, so out-of-range month/day
    # degrades to NULL (ANSI-safe) exactly like Go's time.Parse error path
    era = F.date_format(
        F.try_to_date(
            F.concat_ws(
                "-",
                (era_base + era_year).cast("string"),
                era_month.cast("string"),
                era_day.cast("string"),
            ),
            "yyyy-M-d",
        ),
        "yyyy-MM-dd",
    )
    return (
        F.when(c.rlike(r"^\d{4}/\d{1,2}/\d{1,2}$"), gregorian)
        .when(c.rlike(r"^[HR]\d{2}\.\d{2}\.\d{2}$"), era)
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_timestamp(
    col: Column | str,
    fmt: str = "yyyy/MM/dd HH:mm:ss",
    assume_tz: str = "Asia/Tokyo",
) -> Column:
    """Timezone-aware timestamp normalization (north-star invariant).

    The reference's inputs are Japanese bank exports whose timestamps are
    implicitly JST wall-clock; BigQuery coerces the projected strings
    server-side. The engine makes the conversion explicit and lossless:
    parse the wall-clock string with ``fmt``, interpret it in ``assume_tz``
    (strings carrying an explicit offset pattern in ``fmt`` win), and
    return a UTC timestamp. Unparseable input → NULL (ANSI-safe).
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.try_to_timestamp(c, F.lit(fmt))
    # session TZ is UTC (session.py), so try_to_timestamp yields the
    # wall-clock instant AS IF UTC; reinterpret it as assume_tz wall time
    return F.to_utc_timestamp(parsed, assume_tz)


def payment_month_from_path(
    path_col: Column | str,
    pattern: str = r"/(\d{6})\.csv$",
    fmt: str = "yyyyMM",
) -> Column:
    """T7/O6 — preprocessor-derived column: payment month from the file name
    (``/root/reference/contrib/handlers/smbc_card.go:46-58``).

    The reference stashes the month in ``context.Context`` per file and
    appends it per row; here it is a derived column from the path —
    a month token in the name becomes a ``yyyy-MM-01`` date string.
    ``pattern``/``fmt`` vary per handler: smbc_card ``/(\\d{6})\\.csv$`` +
    ``yyyyMM``; amex_csv ``/(\\d{4}-\\d{2})\\.csv$`` + ``yyyy-MM``
    (``amex_csv.go:16-30``); rakuten_card ``enavi(\\d{6})\\(`` + ``yyyyMM``
    (``rakuten_card.go:20-32``).
    """
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    ym = F.regexp_extract(p, pattern, 1)
    out = F.date_format(F.try_to_date(ym, fmt), "yyyy-MM-dd")
    return F.when(ym == "", F.lit(None).cast("string")).otherwise(out)
